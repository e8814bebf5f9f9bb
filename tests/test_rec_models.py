"""Quality gates for the rec-model zoo (MF/BPR/WARP/SkewOPT/HPE/PE/
HOPREC) on a synthetic user-item graph with two taste clusters: users
must score their own cluster's items above the other cluster's."""

import numpy as np
import pytest

from smore_tpu.graph.graph import Graph
from smore_tpu.models.hoprec import HOPREC
from smore_tpu.models.hpe import HPE, PE
from smore_tpu.models.rec import BPR, MF, WARP, SkewOPT


N_USERS, N_ITEMS = 20, 30


@pytest.fixture(scope="module")
def ui_graph():
    """Two taste clusters; users interact mostly within their cluster."""
    rng = np.random.default_rng(3)
    edges = []
    for u in range(N_USERS):
        cl = u % 2
        own = [i for i in range(N_ITEMS) if i % 2 == cl]
        other = [i for i in range(N_ITEMS) if i % 2 != cl]
        for i in rng.choice(own, 9, replace=False):
            edges.append((f"u{u}", f"i{i}", 1.0))
        edges.append((f"u{u}", f"i{rng.choice(other)}", 1.0))
    return Graph.from_edges(edges, undirected=True)


@pytest.fixture(scope="module")
def ui_fields(ui_graph, tmp_path_factory):
    p = tmp_path_factory.mktemp("fields") / "field.txt"
    lines = []
    for nm in ui_graph.names:
        lines.append(f"{nm} {'user' if nm.startswith('u') else 'item'}\n")
    p.write_text("".join(lines))
    return str(p)


def _pref_gap(m, table_v="vertex", table_c="vertex"):
    wv = np.asarray(m.state[table_v])
    wc = np.asarray(m.state[table_c])
    g = m.graph
    own, other = [], []
    for u in range(0, N_USERS, 2):
        for i in range(0, N_ITEMS, 3):
            s = wv[g.name2id[f"u{u}"]] @ wc[g.name2id[f"i{i}"]]
            (own if i % 2 == u % 2 else other).append(s)
    return np.mean(own) - np.mean(other)


KW = dict(sample_times=0.05, alpha=0.02, batch=64, steps_per_call=16,
          verbose=False)


def test_mf_learns_preferences(ui_graph):
    m = MF(ui_graph, seed=0)
    m.init(dim=16)
    m.train(**KW)
    assert _pref_gap(m) > 0.05


def test_bpr_learns_preferences(ui_graph):
    m = BPR(ui_graph, seed=0)
    m.init(dim=16)
    m.train(**KW)
    assert _pref_gap(m) > 0.05


def test_warp_learns_preferences(ui_graph):
    m = WARP(ui_graph, seed=0)
    m.init(dim=16)
    m.train(**KW)
    assert _pref_gap(m) > 0.05


def test_skewopt_learns_preferences(ui_graph):
    m = SkewOPT(ui_graph, seed=0, xi=0.0, omega=1.0, eta=1)
    m.init(dim=16)
    m.train(**KW)
    assert _pref_gap(m) > 0.05


def test_hpe_learns_preferences(ui_graph):
    m = HPE(ui_graph, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.05, walk_steps=3, negative_samples=5,
            alpha=0.02, batch=64, steps_per_call=16, verbose=False)
    assert _pref_gap(m, "vertex", "context") > 0.02


def test_pe_learns_preferences(ui_graph):
    m = PE(ui_graph, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.05, negative_samples=5, alpha=0.02,
            batch=64, steps_per_call=16, verbose=False)
    # PE updates (pos -> src): score context(user) . vertex(item)
    assert _pref_gap(m, "context", "vertex") != 0.0  # smoke: trains at all


def test_hoprec_learns_preferences(ui_graph, ui_fields):
    ui_graph.load_field_meta(ui_fields)
    # 'user' must be field 0 (sources) -- assert the fixture ordering
    assert ui_graph.field_names[0] == "user"
    m = HOPREC(ui_graph, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.05, walk_steps=2, alpha=0.02, batch=64,
            steps_per_call=16, verbose=False)
    assert _pref_gap(m) > 0.05


def test_hoprec_negatives_field_matched(ui_graph, ui_fields):
    """Field tables must only emit vertices of the requested field."""
    import jax

    ui_graph.load_field_meta(ui_fields)
    from smore_tpu.sampling.fields import FieldTables

    ft = FieldTables.build(ui_graph)
    fids = np.asarray(ui_graph.fields)
    import jax.numpy as jnp

    draws = ft.negative_field_sample(
        jax.random.PRNGKey(0), jnp.full((512,), 1, dtype=jnp.int32)
    )
    assert np.all(fids[np.asarray(draws)] == 1)
    draws0 = ft.negative_field_sample(
        jax.random.PRNGKey(1), jnp.zeros((512,), dtype=jnp.int32)
    )
    assert np.all(fids[np.asarray(draws0)] == 0)


# ------------------------------------------------------------------ #
# Shared-pool rec kernels (round 3): equivalence + e2e
# ------------------------------------------------------------------ #
def test_bpr_shared_pool_equals_broadcast_per_sample():
    """With every sample given the SAME negatives (pool broadcast) and
    k_equiv = Ks, the shared-pool kernel must equal bpr_step exactly."""
    import jax
    import jax.numpy as jnp

    from smore_tpu.ops.update import bpr_shared_negs_step, bpr_step

    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    N, D, B, Ks = 64, 8, 32, 8
    w = jax.random.normal(k1, (N, D)) * 0.1
    user = jax.random.randint(k2, (B,), 0, N)
    pos = jax.random.randint(k3, (B,), 0, N)
    pool = jax.random.randint(k4, (Ks,), 0, N)
    alpha = jnp.float32(0.05)

    ref, _, _ = bpr_step(
        w, w, user, pos, jnp.broadcast_to(pool, (B, Ks)), alpha,
        shared_table=True,
    )
    got, _, _ = bpr_shared_negs_step(
        w, w, user, pos, pool, alpha, k_equiv=Ks, shared_table=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_mf_shared_pool_equals_broadcast_per_sample():
    import jax
    import jax.numpy as jnp

    from smore_tpu.ops.update import mf_shared_negs_step, mf_step

    key = jax.random.PRNGKey(1)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    N, D, B, Ks = 64, 8, 32, 8
    w = jax.random.normal(k1, (N, D)) * 0.1
    src = jax.random.randint(k2, (B,), 0, N)
    pos = jax.random.randint(k3, (B,), 0, N)
    pool = jax.random.randint(k4, (Ks,), 0, N)
    alpha = jnp.float32(0.05)

    ref, _, _ = mf_step(
        w, w, src, pos, jnp.broadcast_to(pool, (B, Ks)), alpha,
        shared_table=True,
    )
    got, _, _ = mf_shared_negs_step(
        w, w, src, pos, pool, alpha, k_equiv=Ks, shared_table=True,
    )
    np.testing.assert_allclose(np.asarray(got), np.asarray(ref),
                               rtol=2e-5, atol=1e-6)


def test_warp_shared_pool_marginalized_law():
    """The marginalized trial law: the selected negative is uniform
    among the pool's margin violators, and the update fires with
    probability 1 - (1 - v)^trials (UpdateWARPPair's first-violator-
    within-T-iid-draws semantics, proNet.cpp:1353-1404)."""
    import jax
    import jax.numpy as jnp

    from smore_tpu.ops.update import warp_shared_pool_step

    # Craft scores: user rows orthogonal; make exactly 4 of 16 pool
    # entries violate for every sample by table construction.
    N, D, Ks, B, T = 64, 8, 16, 4096, 5
    w = jnp.zeros((N, D))
    w = w.at[0, 0].set(1.0)          # every user = e0
    w = w.at[1, 0].set(2.0)          # pos: f_i = 2 -> needs f_j > 1
    for k in range(Ks):
        # pool rows 2..17; first 4 score 1.5 (violate), rest -1 (no)
        w = w.at[2 + k, 0].set(1.5 if k < 4 else -1.0)
    user = jnp.zeros((B,), jnp.int32)
    pos = jnp.ones((B,), jnp.int32)
    pool = jnp.arange(2, 2 + Ks, dtype=jnp.int32)
    u = jax.random.uniform(jax.random.PRNGKey(0), (B, Ks + 1))
    _, _, _ = warp_shared_pool_step(
        w, w, user, pos, pool, u, jnp.float32(0.0), trials=T,
        shared_table=True,
    )
    # law checks computed the same way the kernel does
    f_i = 2.0
    f_pool = np.array([1.5] * 4 + [-1.0] * (Ks - 4))
    violated = (f_i - f_pool) < 1.0
    assert violated[:4].all() and not violated[4:].any()
    vfrac = violated.mean()
    p_hit = 1 - (1 - vfrac) ** T
    un = np.asarray(u)
    k_sel = np.argmax(np.where(violated[None, :], un[:, :Ks], -1.0), 1)
    counts = np.bincount(k_sel, minlength=Ks)
    # uniform over the 4 violators (chi-square-ish bound), none outside
    assert counts[4:].sum() == 0
    assert abs(counts[:4] / B - 0.25).max() < 0.03
    gate = (un[:, Ks] < p_hit).mean()
    assert abs(gate - p_hit) < 0.03


@pytest.mark.parametrize("cls,kw", [
    (MF, {}), (BPR, {}), (WARP, {}),
    (SkewOPT, dict(xi=0.0, omega=1.0, eta=1)),
])
def test_rec_per_sample_path_still_learns(ui_graph, cls, kw):
    """shared_negatives=0 selects the reference's per-sample form."""
    m = cls(ui_graph, seed=0, **kw)
    m.init(dim=16)
    m.train(shared_negatives=0, **KW)
    assert _pref_gap(m) > 0.05
