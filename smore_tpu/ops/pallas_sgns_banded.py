"""Pallas TPU kernel: FULLY fused banded SGNS micro-step.

The banded SGNS step's cost is dominated by per-row memory engine ops:
two gathers (source rows, positive-context rows) and two scatter-adds
(their deltas) of 256-byte rows, ~6-10 ns/row each through XLA's
gather/scatter engine, plus the HBM round-trips of the gathered/delta
matrices between those ops (4 x 8.4 MB per micro-step at batch 32768).
This kernel keeps BOTH band slices resident in VMEM for the whole batch
and performs gather -> SGNS gradient math -> scatter-add in ONE pass:
per-row ops become VMEM dynamic slices (~2-6 ns) and the intermediate
matrices never touch HBM.

Semantics = ops.update.sgns_shared_negs_step_banded's compute core on
identical indices (verified in tests/test_pallas_sgns_banded.py):

    g_pos = (1 - sigmoid(v . cp)) * alpha                 (B,)
    g_neg = -sigmoid(v @ cn^T) * alpha * (k_equiv / Ks)   (B, Ks)
    dsv[src] += g_pos * cp + g_neg @ cn    (serial RMW, duplicates sum)
    ds[pos]  += g_pos * v                  (serial RMW)
    d_neg    = g_neg^T @ v                 (returned; applied by caller)

VMEM budget: two (band_size, D) bands + two (TB, D) scratch tiles + the
(Ks, D) negative pool/accumulator. At the fused-path band size 16392
(sampling.banded.FUSED_BAND_SIZE) and D=64 that is ~9.5 MB -- inside the
~16 MB/core budget; the regular banded path's 32776 band would not fit
twice, which is why the fused path uses its own band size.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_U = 8  # serial-loop unroll (Mosaic fori_loop supports unroll=1 only)


def _make_kernel(mode: str):
    """mode: "full" (production), or an ablation for the perf breakdown
    (experiments/fused_breakdown.py): "no_gather" skips the serial
    gather loop, "no_scatter" skips the serial scatter loop, "mem_only"
    skips the gradient math."""

    def _kernel(src_ref, pos_ref, params_ref, dsv_in, ds_in, cn_ref,
                dsv_ref, ds_ref, dneg_ref, loss_ref, v_s, cp_s, acc,
                lsum):
        i = pl.program_id(0)
        n_i = pl.num_programs(0)
        alpha = params_ref[0]
        scale = params_ref[1]  # alpha * k_equiv / Ks
        kscale = params_ref[2]  # k_equiv / Ks
        tb = v_s.shape[0]
        base = i * tb

        # ---- gather: band rows -> scratch tiles (serial VMEM reads) ----
        def gbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = src_ref[base + j0 + k]
                v_s[pl.ds(j0 + k, 1), :] = dsv_ref[pl.ds(r, 1), :]
                r2 = pos_ref[base + j0 + k]
                cp_s[pl.ds(j0 + k, 1), :] = ds_ref[pl.ds(r2, 1), :]
            return 0

        if mode != "no_gather":
            jax.lax.fori_loop(0, tb // _U, gbody, 0, unroll=1)

        @pl.when(i == 0)
        def _():
            acc[:] = jnp.zeros_like(acc)
            lsum[0, 0] = 0.0

        if mode != "mem_only":
            # ---- fused SGNS gradient math (VPU + MXU) ----
            v = v_s[:]
            cp = cp_s[:]
            cn = cn_ref[:]
            s_pos = jax.nn.sigmoid(jnp.sum(v * cp, axis=1, keepdims=True))
            g_pos = (1.0 - s_pos) * alpha
            s_neg = jax.nn.sigmoid(
                jnp.dot(v, cn.T, preferred_element_type=jnp.float32)
            )
            g_neg = s_neg * (-scale)

            eps = 1e-7
            lsum[0, 0] += jnp.sum(-jnp.log(s_pos + eps)) - kscale * jnp.sum(
                jnp.log(1.0 - s_neg + eps)
            )
            acc[:] += jnp.dot(g_neg.T, v, preferred_element_type=jnp.float32)

            # overwrite scratch with the deltas (originals no longer needed)
            cp_s[:] = g_pos * cp + jnp.dot(
                g_neg, cn, preferred_element_type=jnp.float32
            )  # d_src
            v_s[:] = g_pos * v  # d_pos

        # ---- scatter: serial RMW back into the bands ----
        def sbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = src_ref[base + j0 + k]
                dsv_ref[pl.ds(r, 1), :] = (
                    dsv_ref[pl.ds(r, 1), :] + cp_s[pl.ds(j0 + k, 1), :]
                )
                r2 = pos_ref[base + j0 + k]
                ds_ref[pl.ds(r2, 1), :] = (
                    ds_ref[pl.ds(r2, 1), :] + v_s[pl.ds(j0 + k, 1), :]
                )
            return 0

        if mode != "no_scatter":
            jax.lax.fori_loop(0, tb // _U, sbody, 0, unroll=1)

        @pl.when(i == n_i - 1)
        def _():
            dneg_ref[:] = acc[:]
            loss_ref[0, 0] = lsum[0, 0]

    return _kernel


def _make_multi_kernel(band_size: int, D: int):
    """Multi-band variant: grid (S,); micro-step s works band pair
    (sb_idx[s], db_idx[s]). The two tables live CONCATENATED along
    features -- wvc = [w_vertex | w_context], (N_pad, 2D) -- in
    compiler-chosen (HBM) memory; the kernel DMAs each step's two band
    SLABS (full 2D-wide rows, so the HBM slice is 128-lane aligned at
    D=64) into VMEM scratch, computes the fused SGNS update on static
    half-slices, and DMAs the slabs back. This replaces the round-3
    BlockSpec grid pipeline, whose Mosaic staging allocated ~16
    band-block buffers (in+out of both tables, double-buffered) and
    scoped-VMEM-OOMed at every band size (PERF_NOTES round-3 closing):
    manual DMA needs exactly TWO slab buffers.

    The write-back wait at the end of each grid step makes band
    revisits (step s+1 drawing the same stratum) correct by
    construction: the next fetch cannot start before this step's
    write-back completed. When a step's OWN band pair coincides
    (sb == db), the vertex-half updates of slab A are merged into slab
    B and only B is written back."""

    def _kernel(sb_ref, db_ref, src_ref, pos_ref, params_ref,
                wvc_in, cn_ref,
                wvc_ref, dneg_ref, loss_ref,
                slab_v, slab_c, v_s, cp_s, lsum, sems):
        s = pl.program_id(0)
        i = pl.program_id(1)  # inner tile of the micro-step's batch
        n_s = pl.num_programs(0)
        n_i = pl.num_programs(1)
        alpha = params_ref[s, 0]
        scale = params_ref[s, 1]
        kscale = params_ref[s, 2]
        TB = v_s.shape[0]
        base = (s * n_i + i) * TB
        off_v = sb_ref[s] * band_size
        off_c = db_ref[s] * band_size
        same = off_v == off_c

        @pl.when(i == 0)
        def _():
            in_v = pltpu.make_async_copy(
                wvc_ref.at[pl.ds(off_v, band_size), :], slab_v,
                sems.at[0]
            )
            in_c = pltpu.make_async_copy(
                wvc_ref.at[pl.ds(off_c, band_size), :], slab_c,
                sems.at[1]
            )
            in_v.start()
            in_c.start()
            in_v.wait()
            in_c.wait()

        @pl.when(jnp.logical_and(s == 0, i == 0))
        def _():
            lsum[0, 0] = 0.0

        # ---- gather: band rows -> scratch tiles (serial VMEM reads).
        # FULL 2D-wide rows are copied (no lane slicing inside the
        # serial loop -- dynamic-sublane + static-lane slices cost ~2.5x
        # per op); the halves are separated vectorized afterwards.
        def gbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = src_ref[base + j0 + k]
                v_s[pl.ds(j0 + k, 1), :] = slab_v[pl.ds(r, 1), :]
                r2 = pos_ref[base + j0 + k]
                cp_s[pl.ds(j0 + k, 1), :] = slab_c[pl.ds(r2, 1), :]
            return 0

        jax.lax.fori_loop(0, TB // _U, gbody, 0, unroll=1)

        # ---- fused SGNS gradient math (VPU + MXU) ----
        # vertex rows live in the LEFT half of slab_v rows; positive
        # context rows in the RIGHT half of slab_c rows
        v = v_s[:, 0:D]
        cp = cp_s[:, D:2 * D]
        cn = cn_ref[0]
        s_pos = jax.nn.sigmoid(jnp.sum(v * cp, axis=1, keepdims=True))
        g_pos = (1.0 - s_pos) * alpha
        s_neg = jax.nn.sigmoid(
            jnp.dot(v, cn.T, preferred_element_type=jnp.float32)
        )
        g_neg = s_neg * (-scale)

        eps = 1e-7
        lsum[0, 0] += jnp.sum(-jnp.log(s_pos + eps)) - kscale * jnp.sum(
            jnp.log(1.0 - s_neg + eps)
        )

        @pl.when(i == 0)
        def _():
            dneg_ref[0] = jnp.zeros_like(dneg_ref[0])

        dneg_ref[0] += jnp.dot(
            g_neg.T, v, preferred_element_type=jnp.float32
        )

        # overwrite scratch with FULL-row deltas whose inactive half is
        # zero, so the serial scatter is a plain full-row RMW (adding
        # zero to the untouched half) with no lane slicing
        zeros = jnp.zeros((v.shape[0], D), jnp.float32)
        d_src = g_pos * cp + jnp.dot(
            g_neg, cn, preferred_element_type=jnp.float32
        )
        d_pos = g_pos * v
        v_s[:] = jnp.concatenate([d_src, zeros], axis=1)
        cp_s[:] = jnp.concatenate([zeros, d_pos], axis=1)

        # ---- scatter: serial full-row RMW into the VMEM slabs ----
        def sbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = src_ref[base + j0 + k]
                slab_v[pl.ds(r, 1), :] = (
                    slab_v[pl.ds(r, 1), :] + v_s[pl.ds(j0 + k, 1), :]
                )
                r2 = pos_ref[base + j0 + k]
                slab_c[pl.ds(r2, 1), :] = (
                    slab_c[pl.ds(r2, 1), :] + cp_s[pl.ds(j0 + k, 1), :]
                )
            return 0

        jax.lax.fori_loop(0, TB // _U, sbody, 0, unroll=1)

        # ---- write-back (last inner tile only). sb == db: both slabs
        # are copies of the same rows (vertex deltas landed in slab_v,
        # context deltas in slab_c); merge the vertex half into slab_c
        # and write only it.
        @pl.when(jnp.logical_and(i == n_i - 1, same))
        def _():
            slab_c[:, 0:D] = slab_v[:, 0:D]

        @pl.when(jnp.logical_and(i == n_i - 1, jnp.logical_not(same)))
        def _():
            out_v = pltpu.make_async_copy(
                slab_v, wvc_ref.at[pl.ds(off_v, band_size), :],
                sems.at[2]
            )
            out_v.start()
            out_v.wait()

        @pl.when(i == n_i - 1)
        def _():
            out_c = pltpu.make_async_copy(
                slab_c, wvc_ref.at[pl.ds(off_c, band_size), :],
                sems.at[3]
            )
            out_c.start()
            out_c.wait()

        @pl.when(jnp.logical_and(s == n_s - 1, i == n_i - 1))
        def _():
            loss_ref[0, 0] = lsum[0, 0]

    return _kernel


@functools.partial(
    jax.jit, static_argnames=("band_size", "k_equiv", "interpret")
)
def sgns_banded_multiblock(
    wvc: jnp.ndarray,  # (Np, 2D) FULL padded CONCAT table [wv | wc]
    sb_idx: jnp.ndarray,  # (S,) i32 source BAND INDICES per micro-step
    db_idx: jnp.ndarray,  # (S,) i32 context band indices
    src_l: jnp.ndarray,  # (S, B) i32 band-LOCAL source rows
    pos_l: jnp.ndarray,  # (S, B) i32 band-LOCAL positive rows
    cn: jnp.ndarray,  # (S, Ks, D) f32 shared-negative rows (pre-call
    # snapshot; d_neg is returned and applied by the caller)
    alpha: jnp.ndarray,  # (S,) per-micro-step learning rates
    band_size: int,
    k_equiv: int = 5,
    interpret: bool = False,
):
    """S micro-steps, each on its OWN band pair, in one pallas_call:
    the concat table stays in HBM and each step's band pair is staged
    through two VMEM slab buffers by in-kernel DMA (_make_multi_kernel).
    The concat layout makes every HBM slice 2D = 128 lanes wide at the
    flagship D=64 (Mosaic requires 128-aligned HBM slices). Table
    donated. Returns (wvc', d_neg (S, Ks, D), loss_sum ())."""
    S, B = src_l.shape
    D2 = wvc.shape[1]
    D = D2 // 2
    Ks = cn.shape[1]
    TB = min(2048, B)  # inner tile: the (TB, D2) gather/delta scratch
    # tiles must fit beside the two band slabs
    assert B % TB == 0 and TB % _U == 0, (B, TB)
    assert D2 % 128 == 0 or interpret, (
        "multiblock kernel needs concat rows that are a multiple of 128 "
        "lanes (D multiple of 64)"
    )

    alphas = jnp.asarray(alpha, jnp.float32).reshape(S)
    params = jnp.stack(
        [alphas, alphas * (k_equiv / Ks),
         jnp.full((S,), k_equiv / Ks, jnp.float32)], axis=1
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(S, B // TB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Ks, D), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Ks, D), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda s, i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((band_size, D2), jnp.float32),  # source slab
            pltpu.VMEM((band_size, D2), jnp.float32),  # context slab
            pltpu.VMEM((TB, D2), jnp.float32),  # gathered full src rows
            pltpu.VMEM((TB, D2), jnp.float32),  # gathered full ctx rows
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
    )
    wvc2, d_neg, loss = pl.pallas_call(
        _make_multi_kernel(band_size, D),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(wvc.shape, jnp.float32),
            jax.ShapeDtypeStruct((S, Ks, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        # operand numbering includes the 5 scalar-prefetch args
        input_output_aliases={5: 0},
        interpret=interpret,
    )(sb_idx.astype(jnp.int32), db_idx.astype(jnp.int32),
      src_l.reshape(-1).astype(jnp.int32),
      pos_l.reshape(-1).astype(jnp.int32), params,
      wvc, cn)
    return wvc2, d_neg, loss[0, 0]


@functools.partial(
    jax.jit, static_argnames=("k_equiv", "interpret", "mode")
)
def sgns_banded_fused(
    dsv: jnp.ndarray,  # (Nb, D) f32 source band slice
    ds: jnp.ndarray,  # (Nb, D) f32 context band slice
    src_l: jnp.ndarray,  # (B,) i32 band-LOCAL source rows
    pos_l: jnp.ndarray,  # (B,) i32 band-LOCAL positive rows
    cn: jnp.ndarray,  # (Ks, D) f32 shared-negative rows
    alpha: jnp.ndarray,  # scalar
    k_equiv: int = 5,
    interpret: bool = False,
    mode: str = "full",
):
    """Returns (dsv', ds', d_neg (Ks, D), loss_sum ()). Both bands are
    donated (aliased outputs). B must tile by 2048 (or be < 2048 and a
    multiple of 8)."""
    B, D = src_l.shape[0], dsv.shape[1]
    Ks = cn.shape[0]
    Nb = dsv.shape[0]
    TB = min(2048, B)
    assert B % TB == 0 and TB % _U == 0, (B, TB)

    alpha = jnp.asarray(alpha, jnp.float32)
    params = jnp.stack(
        [alpha, alpha * (k_equiv / Ks), jnp.float32(k_equiv / Ks)]
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec((Nb, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nb, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ks, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((Nb, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Nb, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((Ks, D), lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((TB, D), jnp.float32),
            pltpu.VMEM((TB, D), jnp.float32),
            pltpu.VMEM((Ks, D), jnp.float32),
            pltpu.SMEM((1, 1), jnp.float32),
        ],
    )
    dsv2, ds2, d_neg, loss = pl.pallas_call(
        _make_kernel(mode),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((Nb, D), jnp.float32),
            jax.ShapeDtypeStruct((Nb, D), jnp.float32),
            jax.ShapeDtypeStruct((Ks, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        # operand numbering includes the 3 scalar-prefetch args
        input_output_aliases={3: 0, 4: 1},
        interpret=interpret,
    )(src_l.astype(jnp.int32), pos_l.astype(jnp.int32), params,
      dsv, ds, cn)
    return dsv2, ds2, d_neg, loss[0, 0]
