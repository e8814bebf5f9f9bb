"""Fused banded SGNS Pallas kernel (ops/pallas_sgns_banded.py) vs the
unfused banded step on identical indices (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smore_tpu.graph.graph import Graph
from smore_tpu.models.line import LINE
from smore_tpu.ops.update import sgns_shared_negs_step_banded

BAND = 64


@pytest.fixture(scope="module")
def comm_graph():
    rng = np.random.default_rng(7)
    edges = []
    for _ in range(3000):
        c = rng.integers(0, 4)
        if rng.random() < 0.9:
            a, b = rng.integers(0, 50, 2) + 50 * c
        else:
            a, b = rng.integers(0, 200, 2)
        if a != b:
            edges.append((f"v{a}", f"v{b}", float(rng.integers(1, 4))))
    return Graph.from_edges(edges, undirected=True)


def test_fused_equals_unfused_banded_step(comm_graph):
    g = comm_graph
    n_pad = -(-g.n_vertices // BAND) * BAND
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    D, B, Ks = 64, 128, 16
    wv = jax.random.normal(k1, (n_pad, D)) * 0.1
    wc = jax.random.normal(k2, (n_pad, D)) * 0.1
    sb, db = jnp.int32(1 * BAND), jnp.int32(2 * BAND)
    src = jax.random.randint(k3, (B,), BAND, 2 * BAND)
    pos = jax.random.randint(k4, (B,), 2 * BAND, 3 * BAND)
    negs = jax.random.randint(k5, (Ks,), 0, g.n_vertices)
    alpha = jnp.float32(0.05)

    rv, rc, rloss = sgns_shared_negs_step_banded(
        wv, wc, db, BAND, src, pos, negs, alpha, src_band_start=sb,
    )
    gv, gc, gloss = sgns_shared_negs_step_banded(
        wv, wc, db, BAND, src, pos, negs, alpha, src_band_start=sb,
        fused=True,
    )
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(rc),
                               rtol=2e-5, atol=1e-6)
    # loss conventions differ (fused = mean over ALL B; unfused = mean
    # over the first min(1024, B)); at B=128 both cover the whole batch
    np.testing.assert_allclose(float(gloss), float(rloss), rtol=1e-4)


def test_line_banded_fused_e2e_quality(comm_graph):
    """LINE o2 trained with the fused kernel (interpret mode) matches
    the unfused banded path's structure quality."""
    g = comm_graph
    kw = dict(sample_times=0.2, negative_samples=5, alpha=0.025,
              batch=128, group=1, steps_per_call=32, hoist=2,
              verbose=False)
    m = LINE(g, seed=0)
    m.init(dim=16, order=2)
    m.train(banded=True, band_size=BAND, use_pallas=True, **kw)
    assert m.state["vertex"].shape == (g.n_vertices, 16)
    assert np.isfinite(np.asarray(m.state["vertex"])).all()

    def _auc(m):
        wv = np.asarray(m.state["vertex"])
        wv = wv / (np.linalg.norm(wv, axis=1, keepdims=True) + 1e-9)
        src = np.repeat(np.arange(g.n_vertices), np.diff(g.indptr))
        pos_s = (wv[src] * wv[g.indices]).sum(1)
        rng = np.random.default_rng(0)
        a = rng.integers(0, g.n_vertices, 500)
        b = rng.integers(0, g.n_vertices, 500)
        neg_s = (wv[a] * wv[b]).sum(1)
        return (pos_s[:, None] > neg_s[None, :]).mean()

    auc_fused = _auc(m)
    m2 = LINE(g, seed=0)
    m2.init(dim=16, order=2)
    m2.train(banded=True, band_size=BAND, use_pallas=False, **kw)
    auc_plain = _auc(m2)
    assert auc_fused > 0.8
    assert abs(auc_fused - auc_plain) < 0.08, (auc_fused, auc_plain)


def test_multiblock_equals_sequential_fused_steps(comm_graph):
    """sgns_banded_multiblock (S band pairs, one pallas_call) == S
    sequential fused banded steps on identical draws, including a
    REVISITED band pair (write-back -> re-fetch ordering). Negatives are
    out-of-band and disjoint per step so the deferred d_neg application
    commutes exactly."""
    import jax.numpy as jnp

    from smore_tpu.ops.pallas_sgns_banded import sgns_banded_multiblock
    from smore_tpu.ops.update import sgns_shared_negs_step_banded

    g = comm_graph
    n_pad = -(-g.n_vertices // BAND) * BAND  # >= 4 bands for 200 verts
    assert n_pad // BAND >= 3
    key = jax.random.PRNGKey(5)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    D, B, Ks, S = 64, 128, 8, 4
    wv = jax.random.normal(k1, (n_pad, D)) * 0.1
    wc = jax.random.normal(k2, (n_pad, D)) * 0.1
    # step band pairs (src band, dst band): step 2 REVISITS step 0's
    # pair; step 3 has sb == db (the slab-merge write-back path)
    sb_idx = jnp.asarray([1, 2, 1, 2], jnp.int32)
    db_idx = jnp.asarray([2, 1, 2, 2], jnp.int32)
    src_l = jax.random.randint(k3, (S, B), 0, BAND)
    pos_l = jax.random.randint(k4, (S, B), 0, BAND)
    # negatives: band 0 rows (outside all active bands), disjoint per step
    negs = jnp.arange(S * Ks, dtype=jnp.int32).reshape(S, Ks)
    assert int(negs.max()) < BAND
    alphas = jnp.float32([0.05, 0.04, 0.03, 0.03])

    from smore_tpu.ops.pallas_sgns_banded import fold_table, unfold_table

    cn = wc[negs.reshape(-1)].reshape(S, Ks, D)
    wvf2, wcf2, d_neg, _ = sgns_banded_multiblock(
        fold_table(wv), fold_table(wc), sb_idx, db_idx, src_l, pos_l,
        cn, alphas, band_size=BAND, interpret=True,
    )
    gv, gc = unfold_table(wvf2), unfold_table(wcf2)
    gc = gc.at[negs.reshape(-1)].add(d_neg.reshape(-1, D))

    rv, rc = wv, wc
    for t in range(S):
        rv, rc, _ = sgns_shared_negs_step_banded(
            rv, rc, db_idx[t] * BAND, BAND,
            src_l[t] + sb_idx[t] * BAND, pos_l[t] + db_idx[t] * BAND,
            negs[t], alphas[t],
            src_band_start=sb_idx[t] * BAND, fused=True,
        )
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(rc),
                               rtol=2e-5, atol=1e-6)


def test_multiblock_db_pipeline_bit_identical():
    """The double-buffered pipeline (round 5) is BIT-identical to the
    simple single-bank kernel on identical inputs, including adjacent
    band conflicts on both sides (the lazy-fetch path) and runs of
    repeated strata."""
    from smore_tpu.ops.pallas_sgns_banded import (
        fold_table,
        sgns_banded_multiblock,
    )

    rng = np.random.default_rng(3)
    S, B, BAND_L, Ks, D, NB = 8, 128, 64, 16, 64, 5
    n_pad = NB * BAND_L
    wv = rng.standard_normal((n_pad, D)).astype(np.float32) * 0.1
    wc = rng.standard_normal((n_pad, D)).astype(np.float32) * 0.1
    # adjacent conflicts: src side at 2, ctx side at 4, triple run at 5-7
    sb = np.asarray([0, 1, 1, 2, 3, 4, 4, 4], np.int32)
    db = np.asarray([1, 2, 3, 0, 0, 2, 2, 2], np.int32)
    src = rng.integers(0, BAND_L, (S, B)).astype(np.int32)
    pos = rng.integers(0, BAND_L, (S, B)).astype(np.int32)
    cn = rng.standard_normal((S, Ks, D)).astype(np.float32) * 0.1
    alphas = np.linspace(0.05, 0.03, S).astype(np.float32)

    outs = {}
    for pipe in ("simple", "db"):
        outs[pipe] = sgns_banded_multiblock(
            fold_table(jnp.asarray(wv)), fold_table(jnp.asarray(wc)),
            jnp.asarray(sb), jnp.asarray(db), jnp.asarray(src),
            jnp.asarray(pos), jnp.asarray(cn), jnp.asarray(alphas),
            band_size=BAND_L, interpret=True, pipeline=pipe,
        )
    for a, b, nm in zip(outs["simple"], outs["db"],
                        ("wvf", "wcf", "d_neg", "loss")):
        assert np.array_equal(np.asarray(a), np.asarray(b)), nm


def test_multiblock_banded_negatives_equals_sequential(comm_graph):
    """sgns_banded_multiblock_nb (in-kernel banded negative pools,
    round 5) == S sequential fused banded steps whose negatives are the
    same band-local rows lifted to global ids, including steps where
    the negative band IS the context band (ninc path) and adjacent
    band conflicts (lazy-fetch path)."""
    from smore_tpu.ops.pallas_sgns_banded import (
        fold_table,
        sgns_banded_multiblock_nb,
        unfold_table,
    )
    from smore_tpu.ops.update import sgns_shared_negs_step_banded

    g = comm_graph
    n_pad = -(-g.n_vertices // BAND) * BAND
    key = jax.random.PRNGKey(11)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    D, B, Ks, S = 64, 128, 128, 6
    wv = jax.random.normal(k1, (n_pad, D)) * 0.1
    wc = jax.random.normal(k2, (n_pad, D)) * 0.1
    # band pairs: step 1 shares sb with 0 (conf), step 3's neg window
    # lies inside its own db band (ninc, nonzero offset), step 4's
    # window was inside step 3's db band (confn), step 5 revisits.
    # Negative windows are NB2=16 rows (finer than the 64-row bands);
    # window w lives in band w // 4.
    NB2 = 16
    sb_idx = jnp.asarray([1, 1, 2, 0, 2, 1], jnp.int32)
    db_idx = jnp.asarray([2, 0, 1, 2, 0, 2], jnp.int32)
    #            band:    0  1  0  2   2   1      (window // 4)
    nb_idx = jnp.asarray([1, 4, 3, 11, 10, 6], jnp.int32)
    src_l = jax.random.randint(k3, (S, B), 0, BAND)
    pos_l = jax.random.randint(k4, (S, B), 0, BAND)
    negs_l = jax.random.randint(k5, (S, Ks), 0, NB2)
    alphas = jnp.linspace(0.05, 0.03, S).astype(jnp.float32)

    gvf, gcf, gloss = sgns_banded_multiblock_nb(
        fold_table(wv), fold_table(wc), sb_idx, db_idx, nb_idx,
        src_l, pos_l, negs_l, alphas, band_size=BAND, nb2=NB2,
        interpret=True,
    )
    gv, gc = unfold_table(gvf), unfold_table(gcf)

    rv, rc = wv, wc
    for t in range(S):
        rv, rc, _ = sgns_shared_negs_step_banded(
            rv, rc, db_idx[t] * BAND, BAND,
            src_l[t] + sb_idx[t] * BAND, pos_l[t] + db_idx[t] * BAND,
            negs_l[t] + nb_idx[t] * NB2, alphas[t],
            src_band_start=sb_idx[t] * BAND, fused=True,
        )
    np.testing.assert_allclose(np.asarray(gv), np.asarray(rv),
                               rtol=2e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(gc), np.asarray(rc),
                               rtol=2e-5, atol=1e-6)
