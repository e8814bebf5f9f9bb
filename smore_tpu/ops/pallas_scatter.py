"""Pallas TPU kernel: serial in-VMEM row scatter-add into a band.

XLA's scatter engine costs ~15ns/row for random 256-byte rows regardless
of conflicts (measured: iotascat == random scatter, PERF_NOTES.md) -- at
B=32768 that is ~0.5 ms per scatter, the dominant cost of the banded
SGNS step once draws are hoisted. This kernel keeps the WHOLE band
resident in VMEM (8.4 MB at the default 32776x64 f32 band -- fits the
~16 MB budget only because the output is aliased with the input) and
accumulates delta rows with a serial read-modify-write loop on the VPU;
duplicates accumulate exactly (serial order; float-sum rounding only).

Use: the two in-band scatters of ops.update.sgns_shared_negs_step_banded
(d_pos into the context band, d_src into the source band). Gathers stay
in XLA.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(idx_ref, band_ref, delta_ref, out_ref):
    """One grid step accumulates a (TB, D) delta tile into the band.

    band_ref/out_ref are the SAME VMEM buffer (input_output_aliases) with
    a constant index map, so the band stays resident across the grid.
    idx_ref is scalar-prefetched SMEM holding ALL B local row ids.
    """
    i = pl.program_id(0)
    tb = delta_ref.shape[0]
    base = i * tb
    U = 8  # manual unroll: Mosaic's fori_loop supports only unroll=1
    # or full unroll, so the body performs U serial RMWs per iteration

    def body(j, _):
        j0 = base + j * U
        for k in range(U):
            r = idx_ref[j0 + k]
            out_ref[pl.ds(r, 1), :] = (
                out_ref[pl.ds(r, 1), :] + delta_ref[pl.ds(j * U + k, 1), :]
            )
        return 0

    jax.lax.fori_loop(0, tb // U, body, 0, unroll=1)


def band_scatter_add(
    band: jnp.ndarray,  # (Nb, D) float32 -- the VMEM-resident band
    idx: jnp.ndarray,  # (B,) int32 LOCAL row ids in [0, Nb)
    delta: jnp.ndarray,  # (B, D) float32 rows to accumulate
    interpret: bool = False,
) -> jnp.ndarray:
    """band.at[idx].add(delta) with duplicate accumulation, Pallas TPU.

    The band is donated into the kernel (aliased output); B must be a
    multiple of the 2048-row delta tile."""
    B, D = delta.shape
    TB = min(2048, B)
    assert B % TB == 0, f"batch {B} not a multiple of tile {TB}"
    assert TB % 8 == 0, f"tile {TB} not a multiple of the unroll factor 8"

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(B // TB,),
        in_specs=[
            pl.BlockSpec(band.shape, lambda i, *_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TB, D), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(band.shape, lambda i, *_: (0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct(band.shape, band.dtype),
        input_output_aliases={1: 0},  # band input (after the scalar arg)
        interpret=interpret,
    )(idx.astype(jnp.int32), band, delta)
