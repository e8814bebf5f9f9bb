"""Parity tests for the long-tail reference kernels: PU variants, cosine,
length, grouping, and the ECO choice family -- each checked against a
direct per-pair numpy transcription of the reference math
(/root/reference/src/proNet.cpp:1033-1351, 1635-1885, 1887-2589)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smore_tpu.ops.community import (
    choice_softmax_step,
    choice_step,
    raw_choice_step,
)
from smore_tpu.ops.update import (
    cosine_step,
    grouping_step,
    length_step,
    pu_bpr_step,
    pu_sgd_step,
    pu_sigmoid_step,
)


def sigmoid(x):
    return 1.0 / (1.0 + np.exp(-x))


@pytest.fixture
def tables(rng):
    N, D = 14, 6
    wv = rng.normal(size=(N, D)).astype(np.float32) * 0.3
    wc = rng.normal(size=(N, D)).astype(np.float32) * 0.3
    return wv, wc


def assert_close(a, b, tol=1e-4):
    np.testing.assert_allclose(np.asarray(a), b, rtol=tol, atol=1e-5)


# ---------------------------------------------------------------- PU --- #
def test_pu_sgd_matches_numpy(tables, rng):
    wv, wc = tables
    B, alpha, reg = 5, 0.05, 0.01
    src = rng.integers(0, 14, B)
    ctx = rng.integers(0, 14, B)
    labels = rng.integers(0, 2, B).astype(np.float64)

    dv, dc = np.zeros_like(wv), np.zeros_like(wc)
    for b in range(B):
        v, c = wv[src[b]], wc[ctx[b]]
        g = labels[b] - v @ c
        if labels[b] == 1.0:
            dv[src[b]] += alpha * ((alpha * g + 1.0) * c - reg * v)
            dc[ctx[b]] += alpha * ((alpha * g + 1.0) * v - reg * c)
        else:
            dv[src[b]] += alpha * (g * c - reg * v)
            dc[ctx[b]] += alpha * (g * v - reg * c)

    out_v, out_c, loss = pu_sgd_step(
        jnp.asarray(wv), jnp.asarray(wc), jnp.asarray(src), jnp.asarray(ctx),
        jnp.asarray(labels, dtype=jnp.float32), jnp.float32(alpha), reg=reg,
    )
    assert_close(out_v, wv + dv)
    assert_close(out_c, wc + dc)
    assert np.isfinite(float(loss))


def test_pu_sigmoid_matches_numpy(tables, rng):
    wv, wc = tables
    B, alpha, reg = 5, 0.05, 0.0025
    src = rng.integers(0, 14, B)
    ctx = rng.integers(0, 14, B)
    labels = rng.integers(0, 2, B).astype(np.float64)

    dv, dc = np.zeros_like(wv), np.zeros_like(wc)
    for b in range(B):
        v, c = wv[src[b]], wc[ctx[b]]
        f = v @ c
        if labels[b] == 1.0:
            s = sigmoid(-f)
            dv[src[b]] += alpha * (s + alpha * 2) * c - alpha * reg * v
            dc[ctx[b]] += alpha * s * v - alpha * reg * c
        else:
            s = sigmoid(f)
            dv[src[b]] -= alpha * (s * c + reg * v)
            dc[ctx[b]] -= alpha * (s * v + reg * c)

    out_v, out_c, _ = pu_sigmoid_step(
        jnp.asarray(wv), jnp.asarray(wc), jnp.asarray(src), jnp.asarray(ctx),
        jnp.asarray(labels, dtype=jnp.float32), jnp.float32(alpha), reg=reg,
    )
    assert_close(out_v, wv + dv)
    assert_close(out_c, wc + dc)


def test_pu_bpr_matches_plain_bpr_no_reg(tables, rng):
    """Opt_PUBPRSGD's live branch == Opt_BPRSGD with zero L2."""
    wv, wc = tables
    B, R, alpha = 4, 2, 0.05
    user = rng.integers(0, 14, B)
    pos = rng.integers(0, 14, B)
    negs = rng.integers(0, 14, (B, R))

    dv, dc = np.zeros_like(wv), np.zeros_like(wc)
    for b in range(B):
        for r in range(R):
            v, ci, cj = wv[user[b]], wc[pos[b]], wc[negs[b, r]]
            g = sigmoid(-(v @ (ci - cj))) * alpha
            dv[user[b]] += g * (ci - cj)
            dc[pos[b]] += g * v
            dc[negs[b, r]] -= g * v

    out_v, out_c, _ = pu_bpr_step(
        jnp.asarray(wv), jnp.asarray(wc), jnp.asarray(user),
        jnp.asarray(pos), jnp.asarray(negs), jnp.float32(alpha),
    )
    assert_close(out_v, wv + dv)
    assert_close(out_c, wc + dc)


# ----------------------------------------------------- cosine/length --- #
def test_cosine_matches_numpy(tables, rng):
    wv, wc = tables
    B, K, alpha = 4, 2, 0.05
    src = rng.integers(0, 14, B)
    pos = rng.integers(0, 14, B)
    negs = rng.integers(0, 14, (B, K))

    eps = 1e-8
    dv, dc = np.zeros_like(wv), np.zeros_like(wc)
    for b in range(B):
        v = wv[src[b]]
        for c_idx, label in [(pos[b], 1.0)] + [(negs[b, k], -1.0) for k in range(K)]:
            c = wc[c_idx]
            vl = np.linalg.norm(v) + eps
            cl = np.linalg.norm(c) + eps
            f = (v @ c) / (vl * cl)
            err = (label - f) * alpha
            dv[src[b]] += err * (c / (vl * cl) - v * f / vl**2)
            dc[c_idx] += err * (v / (vl * cl) - c * f / cl**2)

    out_v, out_c, _ = cosine_step(
        jnp.asarray(wv), jnp.asarray(wc), jnp.asarray(src),
        jnp.asarray(pos), jnp.asarray(negs), jnp.float32(alpha),
    )
    assert_close(out_v, wv + dv)
    assert_close(out_c, wc + dc)


def test_length_matches_numpy(tables, rng):
    wv, wc = tables
    B, K, alpha = 4, 2, 0.02
    src = rng.integers(0, 14, B)
    pos = rng.integers(0, 14, B)
    negs = rng.integers(0, 14, (B, K))

    eps = 1e-8
    dv, dc = np.zeros_like(wv), np.zeros_like(wc)
    for b in range(B):
        v = wv[src[b]]
        for c_idx, label in [(pos[b], 1.0)] + [(negs[b, k], 0.0) for k in range(K)]:
            c = wc[c_idx]
            vl = np.linalg.norm(v) + eps
            cl = np.linalg.norm(c) + eps
            vc = vl * cl
            dv[src[b]] -= alpha * 2 * v * cl * (vc - label) / vl
            dc[c_idx] -= alpha * 2 * c * vl * (vc - label) / cl

    out_v, out_c, _ = length_step(
        jnp.asarray(wv), jnp.asarray(wc), jnp.asarray(src),
        jnp.asarray(pos), jnp.asarray(negs), jnp.float32(alpha),
    )
    assert_close(out_v, wv + dv)
    assert_close(out_c, wc + dc)


# ---------------------------------------------------------- grouping --- #
def test_grouping_matches_numpy(tables, rng):
    wv, wc = tables
    B, Gv, Gc, alpha, reg = 3, 3, 1, 0.05, 0.01
    vgroup = rng.integers(0, 14, (B, Gv))
    cgroup = rng.integers(0, 14, (B, Gc))
    labels = np.ones(B)

    dv, dc = np.zeros_like(wv), np.zeros_like(wc)
    for b in range(B):
        v_sum = wv[vgroup[b]].sum(axis=0)
        c_sum = wc[cgroup[b]].sum(axis=0)
        g = (labels[b] - v_sum @ c_sum) * alpha
        bv = g * c_sum - alpha * reg * v_sum
        bc = g * v_sum - alpha * reg * c_sum
        for i in vgroup[b]:
            dv[i] += bv
        for i in cgroup[b]:
            dc[i] += bc

    out_v, out_c, _ = grouping_step(
        jnp.asarray(wv), jnp.asarray(wc), jnp.asarray(vgroup),
        jnp.asarray(cgroup), jnp.asarray(labels, dtype=jnp.float32),
        jnp.float32(alpha), reg=reg,
    )
    assert_close(out_v, wv + dv)
    assert_close(out_c, wc + dc)


# ------------------------------------------------------ choice family --- #
def test_choice_softmax_matches_numpy(tables, rng):
    wv, _ = tables
    B, K, alpha, reg = 4, 3, 0.05, 0.01
    vertex = rng.integers(0, 14, B)
    pos = rng.integers(0, 14, B)
    negs = rng.integers(0, 14, (B, K))

    dw = np.zeros_like(wv)
    for b in range(B):
        u, c = wv[vertex[b]], wv[pos[b]]
        n = wv[negs[b]]
        e_pos = np.exp(u @ c)
        e_neg = np.exp(n @ u)
        z = e_pos + e_neg.sum()
        dev = c * e_pos + (e_neg[:, None] * n).sum(axis=0)
        dw[vertex[b]] += alpha * (c - dev / z - reg * u)
        dw[pos[b]] += alpha * (u - u * e_pos / z - reg * c)
        for k in range(K):
            dw[negs[b, k]] -= alpha * (u * e_neg[k] / z + reg * n[k])

    out, loss = choice_softmax_step(
        jnp.asarray(wv), jnp.asarray(vertex), jnp.asarray(pos),
        jnp.asarray(negs), jnp.float32(alpha), reg=reg,
    )
    assert_close(out, wv + dw)
    assert float(loss) > 0


def test_raw_choice_matches_numpy(tables, rng):
    wv, wc = tables
    B, K, alpha, reg = 4, 3, 0.05, 0.01
    vertex = rng.integers(0, 14, B)
    pos = rng.integers(0, 14, B)
    negs = rng.integers(0, 14, (B, K))

    dv, dc = np.zeros_like(wv), np.zeros_like(wc)
    for b in range(B):
        u, c = wv[vertex[b]], wc[pos[b]]
        n = wc[negs[b]]
        s_pos = sigmoid(-(u @ c))
        s_neg = sigmoid(-(n @ u))
        z = s_pos + s_neg.sum()
        dev = c * s_pos + (s_neg[:, None] * n).sum(axis=0)
        dv[vertex[b]] += alpha * (c * s_pos - dev - reg * u)
        dc[pos[b]] += alpha * (u * s_pos - u * z - reg * c)
        for k in range(K):
            dc[negs[b, k]] -= alpha * (u * z + reg * n[k])

    out_v, out_c, _ = raw_choice_step(
        jnp.asarray(wv), jnp.asarray(wc), jnp.asarray(vertex),
        jnp.asarray(pos), jnp.asarray(negs), jnp.float32(alpha), reg=reg,
    )
    assert_close(out_v, wv + dv)
    assert_close(out_c, wc + dc)


def test_choice_two_phase_matches_numpy(tables, rng):
    wv, wig = tables
    B, R1, K, K2, alpha, reg = 3, 2, 3, 2, 0.05, 0.01
    vertex = rng.integers(0, 14, B)
    pos2 = rng.integers(0, 14, B)
    negs1 = rng.integers(0, 14, (B, R1, K))
    negs2 = rng.integers(0, 14, (B, K2))

    dv, dig = np.zeros_like(wv), np.zeros_like(wig)
    for b in range(B):
        u, ig = wv[vertex[b]], wig[vertex[b]]
        back_v = np.zeros_like(u)
        # phase 1
        for r in range(R1):
            n = wv[negs1[b, r]]
            e_pos = np.exp(u @ ig)
            e_neg = np.exp(n @ u)
            z = e_pos + e_neg.sum()
            dev = ig * e_pos + (e_neg[:, None] * n).sum(axis=0)
            back_v += alpha * (ig - dev / z - reg * u)
            dig[vertex[b]] += alpha * (u - u * e_pos / z - reg * ig)
            for k in range(K):
                dv[negs1[b, r, k]] -= alpha * (u * e_neg[k] / z + reg * n[k])
        # phase 2
        c2, n2 = wv[pos2[b]], wv[negs2[b]]
        e_pos = np.exp(u @ c2)
        e_neg = np.exp(n2 @ u)
        e_ig = np.exp(u @ ig)
        z = e_pos + e_neg.sum() + e_ig
        dev = c2 * e_pos + (e_neg[:, None] * n2).sum(axis=0) + ig * e_ig
        back_v += alpha * (c2 - dev / z - reg * u)
        dv[pos2[b]] += alpha * (u - u * e_pos / z - reg * c2)
        for k in range(K2):
            dv[negs2[b, k]] -= alpha * (u * e_neg[k] / z + reg * n2[k])
        dig[vertex[b]] -= alpha * (u * e_ig / z + reg * ig)
        dv[vertex[b]] += back_v

    out_v, out_ig, _ = choice_step(
        jnp.asarray(wv), jnp.asarray(wig), jnp.asarray(vertex),
        jnp.asarray(pos2), jnp.asarray(negs1), jnp.asarray(negs2),
        jnp.float32(alpha), reg=reg,
    )
    assert_close(out_v, wv + dv)
    assert_close(out_ig, wig + dig)
