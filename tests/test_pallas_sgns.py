"""Pallas fused SGNS-grads kernel vs the plain-XLA math (interpret mode,
so it runs on the CPU test backend; the TPU-compiled path is exercised by
experiments/perf_sgns.py variant "edge_pallas")."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smore_tpu.ops.pallas_sgns import sgns_shared_grads_pallas


@pytest.mark.parametrize("B,Ks,D", [(2048, 128, 64), (1024, 64, 32)])
def test_pallas_grads_match_xla(rng, B, Ks, D):
    K = 5
    v = jnp.asarray(rng.normal(size=(B, D)), jnp.float32) * 0.3
    cp = jnp.asarray(rng.normal(size=(B, D)), jnp.float32) * 0.3
    cn = jnp.asarray(rng.normal(size=(Ks, D)), jnp.float32) * 0.3
    alpha = 0.025

    d_src, d_pos, d_neg = sgns_shared_grads_pallas(
        v, cp, cn, alpha, k_equiv=K, interpret=True
    )

    g_pos = (1.0 - jax.nn.sigmoid(jnp.einsum("bd,bd->b", v, cp))) * alpha
    g_neg = -jax.nn.sigmoid(v @ cn.T) * (alpha * K / Ks)
    np.testing.assert_allclose(
        np.asarray(d_src), np.asarray(g_pos[:, None] * cp + g_neg @ cn),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(d_pos), np.asarray(g_pos[:, None] * v),
        rtol=1e-5, atol=1e-7,
    )
    np.testing.assert_allclose(
        np.asarray(d_neg), np.asarray(g_neg.T @ v), rtol=1e-5, atol=1e-6
    )
