"""Kernel parity tests: fused update kernels vs straightforward numpy
per-pair reference implementations (mirroring proNet::Opt_* math,
/root/reference/src/proNet.cpp:991-1351)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smore_tpu.ops.update import (
    bpr_step,
    fbpr_step,
    mf_step,
    sgns_step,
    sgns_step_shared,
    skewbpr_step,
    warp_step,
)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


def np_sgns_reference(wv, wc, src, pos, negs, alpha):
    """Per-pair SGNS applied against the batch-start snapshot (the batched
    semantics): accumulate all deltas, then add."""
    wv0, wc0 = wv.copy(), wc.copy()
    dv = np.zeros_like(wv)
    dc = np.zeros_like(wc)
    for b in range(len(src)):
        v = wv0[src[b]]
        # positive, label 1
        g = (1.0 - sigmoid(v @ wc0[pos[b]])) * alpha
        dv[src[b]] += g * wc0[pos[b]]
        dc[pos[b]] += g * v
        for k in range(negs.shape[1]):
            n = negs[b, k]
            g = (0.0 - sigmoid(v @ wc0[n])) * alpha
            dv[src[b]] += g * wc0[n]
            dc[n] += g * v
    return wv0 + dv, wc0 + dc


@pytest.fixture
def small_tables(rng):
    N, D = 12, 8
    wv = rng.normal(size=(N, D)).astype(np.float32) * 0.1
    wc = rng.normal(size=(N, D)).astype(np.float32) * 0.1
    return wv, wc


def test_sgns_matches_numpy(small_tables, rng):
    wv, wc = small_tables
    B, K = 6, 3
    src = rng.integers(0, 12, B)
    pos = rng.integers(0, 12, B)
    negs = rng.integers(0, 12, (B, K))
    alpha = 0.05

    ref_v, ref_c = np_sgns_reference(wv, wc, src, pos, negs, alpha)
    out_v, out_c, loss = sgns_step(
        jnp.asarray(wv), jnp.asarray(wc),
        jnp.asarray(src), jnp.asarray(pos), jnp.asarray(negs),
        jnp.float32(alpha), collision="sum",
    )
    np.testing.assert_allclose(np.asarray(out_v), ref_v, rtol=1e-4, atol=1e-6)
    np.testing.assert_allclose(np.asarray(out_c), ref_c, rtol=1e-4, atol=1e-6)
    assert np.isfinite(float(loss))


def test_sgns_shared_collision_sums(small_tables, rng):
    """Duplicate indices within a batch must sum their contributions
    (segment-sum semantics, SURVEY.md 7.3)."""
    wv, _ = small_tables
    src = np.array([3, 3, 3])
    pos = np.array([5, 5, 7])
    negs = np.array([[1], [1], [2]])
    w0 = jnp.asarray(wv)
    out, _ = sgns_step_shared(
        w0, jnp.asarray(src), jnp.asarray(pos), jnp.asarray(negs),
        jnp.float32(0.1), collision="sum",
    )
    # numpy reference with shared table
    wv0 = wv.copy()
    d = np.zeros_like(wv)
    for b in range(3):
        v = wv0[src[b]]
        g = (1.0 - sigmoid(v @ wv0[pos[b]])) * 0.1
        d[src[b]] += g * wv0[pos[b]]
        d[pos[b]] += g * v
        n = negs[b, 0]
        g = -sigmoid(v @ wv0[n]) * 0.1
        d[src[b]] += g * wv0[n]
        d[n] += g * v
    np.testing.assert_allclose(np.asarray(out), wv0 + d, rtol=1e-4, atol=1e-6)


def test_sgns_mask_zeroes_updates(small_tables):
    wv, wc = small_tables
    src = jnp.array([0, 1])
    pos = jnp.array([2, 3])
    negs = jnp.array([[4], [5]])
    mask = jnp.array([0.0, 0.0])
    out_v, out_c, _ = sgns_step(
        jnp.asarray(wv), jnp.asarray(wc), src, pos, negs,
        jnp.float32(0.1), mask=mask,
    )
    np.testing.assert_allclose(np.asarray(out_v), wv, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_c), wc, atol=1e-7)


def test_freeze_pair_vertex_untouched(small_tables):
    """update_vertex=False = reference UpdateFreezePair (proNet.cpp:1584)."""
    wv, wc = small_tables
    out_v, out_c, _ = sgns_step(
        jnp.asarray(wv), jnp.asarray(wc),
        jnp.array([0]), jnp.array([1]), jnp.array([[2]]),
        jnp.float32(0.1), update_vertex=False,
    )
    np.testing.assert_allclose(np.asarray(out_v), wv)
    assert not np.allclose(np.asarray(out_c), wc)


def test_bpr_direction(small_tables, rng):
    """BPR must raise the positive score relative to the negative."""
    wv, wc = small_tables
    user = jnp.array([0] * 4)
    pos = jnp.array([1] * 4)
    negs = jnp.asarray(rng.integers(2, 12, (4, 5)))
    v0, c0 = jnp.asarray(wv), jnp.asarray(wc)

    def score(wv_, wc_):
        return float(wv_[0] @ wc_[1])

    s_before = score(v0, c0)
    out_v, out_c, loss = bpr_step(v0, c0, user, pos, negs, jnp.float32(0.1))
    assert score(out_v, out_c) > s_before


def test_warp_updates_only_on_violation(small_tables):
    wv, wc = small_tables
    # make positive score huge -> no violation -> no update
    wv = wv.copy()
    wc = wc.copy()
    wv[0] = 1.0
    wc[1] = 10.0
    wc[2] = -10.0
    out_v, out_c, _ = warp_step(
        jnp.asarray(wv), jnp.asarray(wc),
        jnp.array([0]), jnp.array([1]), jnp.array([[2, 2, 2]]),
        jnp.float32(0.1),
    )
    np.testing.assert_allclose(np.asarray(out_v), wv, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_c), wc, atol=1e-7)


def test_warp_picks_first_violator(small_tables, rng):
    wv, wc = small_tables
    out_v, out_c, loss = warp_step(
        jnp.asarray(wv), jnp.asarray(wc),
        jnp.array([0]), jnp.array([1]),
        jnp.asarray(rng.integers(0, 12, (1, 8))),
        jnp.float32(0.1),
    )
    # with tiny random embeddings everything violates margin 1 -> update
    assert not np.allclose(np.asarray(out_v), wv)


def test_mf_converges_toward_label(small_tables, rng):
    wv, wc = small_tables
    v0, c0 = jnp.asarray(wv), jnp.asarray(wc)
    user = jnp.array([0] * 8)
    pos = jnp.array([1] * 8)
    negs = jnp.asarray(rng.integers(2, 12, (8, 1)))
    for _ in range(50):
        v0, c0, loss = mf_step(v0, c0, user, pos, negs, jnp.float32(0.05))
    f = float(v0[0] @ c0[1])
    assert abs(f - 1.0) < 0.3  # pulled toward label 1


def test_skewbpr_runs_and_improves(small_tables, rng):
    wv, wc = small_tables
    v0, c0 = jnp.asarray(wv), jnp.asarray(wc)
    user = jnp.array([0] * 4)
    pos = jnp.array([1] * 4)
    negs = jnp.asarray(rng.integers(2, 12, (4, 16)))
    s_before = float(v0[0] @ c0[1])
    v0, c0, _ = skewbpr_step(
        v0, c0, user, pos, negs, jnp.float32(0.1), xi=0.0, omega=1.0, eta=1
    )
    assert float(v0[0] @ c0[1]) > s_before


def test_fbpr_margin_skip(small_tables):
    wv = wv0 = np.zeros((4, 4), dtype=np.float32)
    wc = np.zeros((4, 4), dtype=np.float32)
    wv = wv.copy()
    wv[0] = 1.0
    wc[1] = 5.0
    wc[2] = -5.0  # f = v.(ci-cj) = 40 > margin -> skip
    out_v, out_c, _ = fbpr_step(
        jnp.asarray(wv), jnp.asarray(wc),
        jnp.array([0]), jnp.array([1]), jnp.array([[2]]),
        jnp.float32(0.1), jnp.float32(1.0),
        reg_ctx=0.0, reg_vtx=0.0,
    )
    np.testing.assert_allclose(np.asarray(out_v), wv, atol=1e-7)
    np.testing.assert_allclose(np.asarray(out_c), wc, atol=1e-7)


def test_skewbpr_reference_semantics_oracle():
    """NumPy oracle for UpdateSBPRPair semantics (proNet.cpp:1517-1566):
    per-round success gating (t > 2 skips the round entirely, incl. reg),
    per-successful-round alpha*0.01 shrink of ci and cj, the vertex
    delta AVERAGED over successful rounds with one shrink iff any
    succeeded, and ci EVOLVING in place across rounds (each round's
    x = v.(ci-cj) sees the previous rounds' ci updates)."""
    rng = np.random.default_rng(42)
    n, d, R = 8, 4, 3
    wv = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    wc = rng.normal(0, 0.3, (n, d)).astype(np.float32)
    user, pos = 0, 1
    negs = np.array([[2, 3, 4]])
    alpha, xi, omega, eta, reg = 0.1, 0.5, 1.0, 3, 0.01

    v, ci = wv[user], wc[pos].astype(np.float64)
    ev = np.zeros(d)
    dwc = {}
    n_succ = 0
    for r in range(R):
        cj = wc[negs[0, r]]
        x = float(v @ (ci - cj))
        t = (x - xi) / omega
        if t > 2.0:
            continue
        t = max(t, -2.0)
        g = 1.0 / (1.0 + np.exp(t**eta)) * t ** (eta - 1) / omega * alpha
        n_succ += 1
        ev += g * (ci - cj)
        ci = ci - alpha * reg * ci + g * v  # in-place ci evolution
        dwc[negs[0, r]] = (
            dwc.get(negs[0, r], np.zeros(d)) - alpha * reg * cj - g * v
        )
    dwc[pos] = dwc.get(pos, np.zeros(d)) + (ci - wc[pos])
    exp_v = wv.copy()
    if n_succ:
        exp_v[user] += ev / n_succ - alpha * reg * v
    exp_c = wc.copy()
    for k, dv in dwc.items():
        exp_c[k] += dv

    out_v, out_c, _ = skewbpr_step(
        jnp.asarray(wv), jnp.asarray(wc), jnp.array([user]),
        jnp.array([pos]), jnp.asarray(negs), jnp.float32(alpha),
        xi=xi, omega=omega, eta=eta, reg=reg,
    )
    assert n_succ > 0  # the fixture must exercise the live branch
    np.testing.assert_allclose(np.asarray(out_v), exp_v, atol=1e-5)
    np.testing.assert_allclose(np.asarray(out_c), exp_c, atol=1e-5)
