"""Shared-pool community kernels (round 5) vs their per-sample forms.

At B=1 with Kp == K and identical negative draws the pool transform is
the identity (scale k_equiv/Kp == 1, one instance per pool row), so the
shared kernels must match the per-sample kernels EXACTLY; e2e model
runs check the pooled defaults still learn structure.
"""

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.ops.community import (
    cbow_step,
    cbow_step_shared_negs,
    choice_softmax_step,
    choice_softmax_step_shared_negs,
    dchoice_step,
    dchoice_step_shared_negs,
)


def _w(n=64, d=16, seed=0):
    return jax.random.normal(jax.random.PRNGKey(seed), (n, d)) * 0.1


def test_cbow_shared_equals_per_sample_at_b1():
    w = _w()
    key = jax.random.PRNGKey(1)
    S, K = 3, 4
    vctx = jax.random.randint(key, (1, S), 0, 64)
    cctx = jax.random.randint(jax.random.fold_in(key, 1), (1, S), 0, 64)
    negs = jax.random.randint(jax.random.fold_in(key, 2), (1, K, S), 0, 64)
    alpha = jnp.float32(0.05)
    w1, l1 = cbow_step(w, vctx, cctx, negs, alpha, reg=0.01)
    w2, l2 = cbow_step_shared_negs(
        w, vctx, cctx, negs[0], alpha, k_equiv=K, reg=0.01
    )
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_dchoice_shared_equals_per_sample_at_b1():
    w = _w()
    key = jax.random.PRNGKey(2)
    K = 5
    v = jax.random.randint(key, (1,), 0, 64)
    c1 = jax.random.randint(jax.random.fold_in(key, 1), (1,), 0, 64)
    c2 = jax.random.randint(jax.random.fold_in(key, 2), (1,), 0, 64)
    negs = jax.random.randint(jax.random.fold_in(key, 3), (1, K), 0, 64)
    alpha = jnp.float32(0.05)
    w1, l1 = dchoice_step(w, v, c1, c2, negs, alpha, reg=0.01)
    w2, l2 = dchoice_step_shared_negs(
        w, v, c1, c2, negs[0], alpha, k_equiv=K, reg=0.01
    )
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def test_choice_softmax_shared_equals_per_sample_at_b1():
    w = _w()
    key = jax.random.PRNGKey(3)
    K = 5
    v = jax.random.randint(key, (1,), 0, 64)
    pos = jax.random.randint(jax.random.fold_in(key, 1), (1,), 0, 64)
    negs = jax.random.randint(jax.random.fold_in(key, 2), (1, K), 0, 64)
    alpha = jnp.float32(0.05)
    w1, l1 = choice_softmax_step(w, v, pos, negs, alpha, reg=0.01)
    w2, l2 = choice_softmax_step_shared_negs(
        w, v, pos, negs[0], alpha, k_equiv=K, reg=0.01
    )
    np.testing.assert_allclose(np.asarray(w1), np.asarray(w2),
                               rtol=1e-5, atol=1e-7)
    np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)


def _bipartite_graph(seed=4):
    from smore_tpu.graph.graph import Graph

    rng = np.random.default_rng(seed)
    edges = []
    for u in range(120):
        c = u % 3
        for _ in range(10):
            i = 120 + c * 40 + rng.integers(0, 40)
            edges.append((f"u{u}", f"i{i}", 1.0))
    return Graph.from_edges(edges, undirected=True)


def test_eco_shared_pool_learns_structure():
    from smore_tpu.models.eco import ECO

    g = _bipartite_graph()
    m = ECO(g, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.12, batch=64, shared_negatives=16,
            steps_per_call=16, verbose=False)
    wv = np.asarray(m.state["vertex"])
    assert np.isfinite(wv).all()
    x = wv / (np.linalg.norm(wv, axis=1, keepdims=True) + 1e-9)
    rng = np.random.default_rng(0)
    a = rng.integers(0, 120, 800)
    b = rng.integers(0, 120, 800)
    va = np.array([g.name2id[f"u{i}"] for i in a])
    vb = np.array([g.name2id[f"u{i}"] for i in b])
    s = (x[va] * x[vb]).sum(1)
    same = (a % 3) == (b % 3)
    assert s[same].mean() > s[~same].mean() + 0.05


def test_gcn_shared_pool_learns_structure():
    from smore_tpu.models.gcn import GCN

    g = _bipartite_graph()
    m = GCN(g, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.1, batch=16, walk_steps=3, alpha=0.01,
            shared_negatives=16, steps_per_call=16, verbose=False)
    wv = np.asarray(m.state["vertex"])
    assert np.isfinite(wv).all()


def test_field_community_shared_equals_per_sample_at_b1():
    """B=1, S=1, Kp=K, every field's pool = the sample's drawn negs:
    the per-field pool transform reduces to the per-sample kernel
    exactly (only the (c_fid, v_fid) block selects; scale == 1)."""
    from smore_tpu.ops.community import (
        field_community_step,
        field_community_step_shared_negs,
    )

    F, N, D, K = 2, 20, 16, 4
    wv = _w(N * F, D, seed=7)
    wc = _w(N * F, D, seed=8)
    fields_of = jnp.asarray([i % F for i in range(N)], jnp.int32)
    vertex = jnp.asarray([3])
    walk = jnp.asarray([[6]])
    mask = jnp.ones((1, 1), jnp.float32)
    negs = jnp.asarray([[[2, 8, 10, 4]]])  # (1,1,K)
    alpha = jnp.float32(0.05)
    for ms in (False, True):
        v1, c1_, l1 = field_community_step(
            wv, wc, vertex, walk, mask, negs, fields_of, F, alpha,
            reg=0.01, ms_variant=ms,
        )
        pool = jnp.broadcast_to(negs[0], (F, K))  # same vids every field
        v2, c2_, l2 = field_community_step_shared_negs(
            wv, wc, vertex, walk, mask, pool, fields_of, F, alpha,
            k_equiv=K, reg=0.01, ms_variant=ms,
        )
        np.testing.assert_allclose(np.asarray(v1), np.asarray(v2),
                                   rtol=1e-5, atol=1e-7, err_msg=f"ms={ms}")
        np.testing.assert_allclose(np.asarray(c1_), np.asarray(c2_),
                                   rtol=1e-5, atol=1e-7, err_msg=f"ms={ms}")
        np.testing.assert_allclose(float(l1), float(l2), rtol=1e-5)
