"""Pallas TPU kernel: fused SGNS gradient math (shared-negative form).

Fuses the compute core of ops.update.sgns_shared_negs_step -- positive
dots, the (B, Ks) negative-score matmul, sigmoids, and the three delta
matmuls -- into ONE kernel so the (B, Ks) logits and per-sample scalars
never round-trip HBM. Gathers and scatter-adds stay in XLA (its native
gather/scatter engine beats per-row DMA for 256-byte rows; measured in
experiments/perf_sgns.py).

Math (reference UpdatePair semantics, /root/reference/src/proNet.cpp:
1784-1809, negatives shared across the batch with K/Ks scaling):

    g_pos = (1 - sigmoid(v . cp)) * alpha                 (B,)
    g_neg = -sigmoid(v @ cn^T) * alpha * (K / Ks)         (B, Ks)
    d_src = g_pos * cp + g_neg @ cn                       (B, D)
    d_pos = g_pos * v                                     (B, D)
    d_neg = g_neg^T @ v                                   (Ks, D)

The d_neg accumulation lives in a VMEM scratch across the batch-tile grid
and is flushed on the last tile.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(v_ref, cp_ref, cn_ref, alpha_ref, d_src_ref, d_pos_ref,
            d_neg_ref, acc_ref):
    i = pl.program_id(0)
    n_i = pl.num_programs(0)
    alpha = alpha_ref[0]
    scale = alpha_ref[1]  # alpha * k_equiv / Ks

    v = v_ref[:]  # (TB, D)
    cp = cp_ref[:]  # (TB, D)
    cn = cn_ref[:]  # (Ks, D)

    f_pos = jnp.sum(v * cp, axis=1, keepdims=True)  # (TB, 1) VPU
    g_pos = (1.0 - jax.nn.sigmoid(f_pos)) * alpha

    f_neg = jnp.dot(v, cn.T, preferred_element_type=jnp.float32)  # MXU
    g_neg = jax.nn.sigmoid(f_neg) * (-scale)  # (TB, Ks)

    d_src_ref[:] = g_pos * cp + jnp.dot(
        g_neg, cn, preferred_element_type=jnp.float32
    )
    d_pos_ref[:] = g_pos * v

    @pl.when(i == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jnp.dot(g_neg.T, v, preferred_element_type=jnp.float32)

    @pl.when(i == n_i - 1)
    def _():
        d_neg_ref[:] = acc_ref[:]


@functools.partial(jax.jit, static_argnames=("k_equiv", "interpret"))
def sgns_shared_grads_pallas(
    v: jnp.ndarray,  # (B, D) gathered source rows, float32
    cp: jnp.ndarray,  # (B, D) gathered positive-context rows
    cn: jnp.ndarray,  # (Ks, D) gathered shared-negative rows
    alpha: jnp.ndarray,  # scalar
    k_equiv: int = 5,
    interpret: bool = False,
):
    """Returns (d_src (B,D), d_pos (B,D), d_neg (Ks,D)). B must be a
    multiple of the 1024-row tile; Ks and D should be multiples of 8."""
    B, D = v.shape
    Ks = cn.shape[0]
    TB = min(1024, B)
    assert B % TB == 0, f"batch {B} not a multiple of tile {TB}"
    grid = (B // TB,)

    alpha = jnp.asarray(alpha, jnp.float32)
    params = jnp.stack([alpha, alpha * (k_equiv / Ks)])

    return pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((TB, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ks, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=[
            pl.BlockSpec((TB, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((Ks, D), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((B, D), jnp.float32),
            jax.ShapeDtypeStruct((Ks, D), jnp.float32),
        ],
        scratch_shapes=[pltpu.VMEM((Ks, D), jnp.float32)],
        interpret=interpret,
    )(v.astype(jnp.float32), cp.astype(jnp.float32),
      cn.astype(jnp.float32), params)
