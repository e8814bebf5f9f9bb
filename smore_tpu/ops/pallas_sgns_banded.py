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
    """Multi-band variant: grid (S, B//TB); micro-step s works band
    pair (sb_idx[s], db_idx[s]). Each table lives 2-ROW-FOLDED --
    (N_pad/2, 2D) f32, logical row r at folded row r>>1, half r&1 -- in
    compiler-chosen (HBM) memory. The fold makes every HBM band slice
    128-lane aligned at the flagship D=64 (Mosaic requires 128-lane
    slices; a (band, 64) slice cannot be expressed) at HALF the DMA
    bytes of the round-4 concat-slab design, which is what lets the
    quality-proven band 16392 (per-stratum concentration 0.125,
    PERF_NOTES round-3 "stratum-VISIT size") fit the VMEM budget:
    2 x (band/2, 128) slabs = 8.4 MB.

    Serial loops copy FULL 128-wide folded rows (dynamic-sublane +
    static-lane slices cost ~2.5x per op); the half selection and the
    half-placed delta construction are vectorized between the loops,
    driven by parity vectors read from VMEM-blocked src/pos inputs
    (scalar-prefetch arrays carry the pre-shifted folded row ids for
    the serial loops).

    This replaces the round-3 BlockSpec grid pipeline, whose Mosaic
    staging allocated ~16 band-block buffers and scoped-VMEM-OOMed at
    every band size. Band revisits are correct by construction: the
    write-back wait at the end of each micro-step precedes the next
    fetch. The two tables are separate arrays, so sb == db needs no
    special case."""

    H = band_size // 2

    def _kernel(sb_ref, db_ref, fsrc_ref, fpos_ref, params_ref,
                wvf_in, wcf_in, cn_ref, srcv_ref, posv_ref,
                wvf_ref, wcf_ref, dneg_ref, loss_ref,
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
        off_v = sb_ref[s] * H
        off_c = db_ref[s] * H

        @pl.when(i == 0)
        def _():
            in_v = pltpu.make_async_copy(
                wvf_ref.at[pl.ds(off_v, H), :], slab_v, sems.at[0]
            )
            in_c = pltpu.make_async_copy(
                wcf_ref.at[pl.ds(off_c, H), :], slab_c, sems.at[1]
            )
            in_v.start()
            in_c.start()
            in_v.wait()
            in_c.wait()

        @pl.when(jnp.logical_and(s == 0, i == 0))
        def _():
            lsum[0, 0] = 0.0

        # ---- gather: full folded rows -> scratch (serial VMEM reads)
        def gbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = fsrc_ref[base + j0 + k]
                v_s[pl.ds(j0 + k, 1), :] = slab_v[pl.ds(r, 1), :]
                r2 = fpos_ref[base + j0 + k]
                cp_s[pl.ds(j0 + k, 1), :] = slab_c[pl.ds(r2, 1), :]
            return 0

        jax.lax.fori_loop(0, TB // _U, gbody, 0, unroll=1)

        # ---- vectorized half selection by parity (src/pos arrive as
        # (1, B//128, 128) VMEM blocks -- Mosaic block shapes need the
        # last two dims (8, 128)-divisible; tile i's TB ids are TB//128
        # consecutive rows, sliced at the REF level since value-level
        # dynamic_slice has no Mosaic lowering) ----
        tr = TB // 128
        par_s = (srcv_ref[0, pl.ds(i * tr, tr), :].reshape(TB)
                 & 1)[:, None]
        par_p = (posv_ref[0, pl.ds(i * tr, tr), :].reshape(TB)
                 & 1)[:, None]
        v = jnp.where(par_s == 1, v_s[:, D:2 * D], v_s[:, 0:D])
        cp = jnp.where(par_p == 1, cp_s[:, D:2 * D], cp_s[:, 0:D])
        cn = cn_ref[0]

        # ---- fused SGNS gradient math (VPU + MXU) ----
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

        # overwrite scratch with FULL folded-row deltas whose inactive
        # half is zero, parity-placed, so the serial scatter is a plain
        # full-row RMW
        d_src = g_pos * cp + jnp.dot(
            g_neg, cn, preferred_element_type=jnp.float32
        )
        d_pos = g_pos * v
        zeros = jnp.zeros((TB, D), jnp.float32)
        v_s[:] = jnp.where(
            par_s == 1,
            jnp.concatenate([zeros, d_src], axis=1),
            jnp.concatenate([d_src, zeros], axis=1),
        )
        cp_s[:] = jnp.where(
            par_p == 1,
            jnp.concatenate([zeros, d_pos], axis=1),
            jnp.concatenate([d_pos, zeros], axis=1),
        )

        # ---- scatter: serial full-row RMW into the slabs ----
        def sbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = fsrc_ref[base + j0 + k]
                slab_v[pl.ds(r, 1), :] = (
                    slab_v[pl.ds(r, 1), :] + v_s[pl.ds(j0 + k, 1), :]
                )
                r2 = fpos_ref[base + j0 + k]
                slab_c[pl.ds(r2, 1), :] = (
                    slab_c[pl.ds(r2, 1), :] + cp_s[pl.ds(j0 + k, 1), :]
                )
            return 0

        jax.lax.fori_loop(0, TB // _U, sbody, 0, unroll=1)

        # ---- write-back (last inner tile only) ----
        @pl.when(i == n_i - 1)
        def _():
            out_v = pltpu.make_async_copy(
                slab_v, wvf_ref.at[pl.ds(off_v, H), :], sems.at[2]
            )
            out_c = pltpu.make_async_copy(
                slab_c, wcf_ref.at[pl.ds(off_c, H), :], sems.at[3]
            )
            out_v.start()
            out_c.start()
            out_v.wait()
            out_c.wait()

        @pl.when(jnp.logical_and(s == n_s - 1, i == n_i - 1))
        def _():
            loss_ref[0, 0] = lsum[0, 0]

    return _kernel


def _make_multi_kernel_db(band_size: int, D: int):
    """Double-buffered variant of _make_multi_kernel (round 5): two slab
    BANKS per table so micro-step s+1's band fetch overlaps micro-step
    s's compute, and s's write-back overlaps s+1's compute. Same math,
    same update order, same data -> bit-identical results to the simple
    kernel on identical inputs (tested).

    Schedule (bank = s % 2, obank = 1 - bank; SYNC = tile 1):
      i == 0:   s == 0 -> issue fetch(0) into bank (cold start)
                conf[s] -> wait wb(s-1)[obank], issue fetch(s) (lazy)
                wait fetch(s)[bank]
      i == SYNC: ~conf[s] & s > 0 -> wait wb(s-1)[obank]
                 ~conf[s+1] & s+1 < S -> issue fetch(s+1) into obank
      i == n_i-1: issue wb(s) from bank; s == S-1 -> wait wb(s)
    conf[s] (host-computed prefetch scalar) = step s shares a source or
    context band with step s-1: the prefetch of fetch(s) during step
    s-1 would race write-back(s-1) on the same HBM band slice, so those
    steps fetch lazily after the wb wait -- which is exactly the simple
    kernel's (correct) serial order. Every wb is waited exactly once:
    at step s+1 (i==0 if conf[s+1], else SYNC), or at exit for wb(S-1).

    VMEM: 4 slabs (2 banks x 2 tables) = 2 * band_size * 2D * 4 B --
    16.8 MB at band 16400 / D=64. The TPU v5e's physical VMEM is far
    larger than Mosaic's 16 MB default budget (128 MB; probed: 120 MB
    scratch compiles and runs), so the caller raises
    vmem_limit_bytes."""

    H = band_size // 2

    def _kernel(sb_ref, db_ref, conf_ref, fsrc_ref, fpos_ref, params_ref,
                wvf_in, wcf_in, cn_ref, srcv_ref, posv_ref,
                wvf_ref, wcf_ref, dneg_ref, loss_ref,
                slab_v, slab_c, v_s, cp_s, lsum, fsems, wsems):
        s = pl.program_id(0)
        i = pl.program_id(1)  # inner tile of the micro-step's batch
        n_s = pl.num_programs(0)
        n_i = pl.num_programs(1)
        alpha = params_ref[s, 0]
        scale = params_ref[s, 1]
        kscale = params_ref[s, 2]
        TB = v_s.shape[0]
        base = (s * n_i + i) * TB
        bank = jax.lax.rem(s, 2)
        obank = 1 - bank
        SYNC = min(1, n_i - 1)

        def fetch(step, slot):
            return (
                pltpu.make_async_copy(
                    wvf_ref.at[pl.ds(sb_ref[step] * H, H), :],
                    slab_v.at[slot], fsems.at[slot, 0]),
                pltpu.make_async_copy(
                    wcf_ref.at[pl.ds(db_ref[step] * H, H), :],
                    slab_c.at[slot], fsems.at[slot, 1]),
            )

        def wback(step, slot):
            return (
                pltpu.make_async_copy(
                    slab_v.at[slot],
                    wvf_ref.at[pl.ds(sb_ref[step] * H, H), :],
                    wsems.at[slot, 0]),
                pltpu.make_async_copy(
                    slab_c.at[slot],
                    wcf_ref.at[pl.ds(db_ref[step] * H, H), :],
                    wsems.at[slot, 1]),
            )

        @pl.when(i == 0)
        def _():
            @pl.when(s == 0)
            def _():
                fv, fc = fetch(0, bank)
                fv.start()
                fc.start()

            @pl.when(jnp.logical_and(s > 0, conf_ref[s] == 1))
            def _():
                wv, wc = wback(s - 1, obank)
                wv.wait()
                wc.wait()
                fv, fc = fetch(s, bank)
                fv.start()
                fc.start()

            fv, fc = fetch(s, bank)
            fv.wait()
            fc.wait()

        @pl.when(jnp.logical_and(s == 0, i == 0))
        def _():
            lsum[0, 0] = 0.0

        @pl.when(i == SYNC)
        def _():
            @pl.when(jnp.logical_and(s > 0, conf_ref[s] == 0))
            def _():
                wv, wc = wback(s - 1, obank)
                wv.wait()
                wc.wait()

            @pl.when(jnp.logical_and(s + 1 < n_s,
                                     conf_ref[jnp.minimum(s + 1, n_s - 1)]
                                     == 0))
            def _():
                fv, fc = fetch(jnp.minimum(s + 1, n_s - 1), obank)
                fv.start()
                fc.start()

        # ---- gather: full folded rows -> scratch (serial VMEM reads)
        sv = slab_v.at[bank]
        sc = slab_c.at[bank]

        def gbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = fsrc_ref[base + j0 + k]
                v_s[pl.ds(j0 + k, 1), :] = sv[pl.ds(r, 1), :]
                r2 = fpos_ref[base + j0 + k]
                cp_s[pl.ds(j0 + k, 1), :] = sc[pl.ds(r2, 1), :]
            return 0

        jax.lax.fori_loop(0, TB // _U, gbody, 0, unroll=1)

        # ---- vectorized half selection by parity (see _make_multi_kernel)
        tr = TB // 128
        par_s = (srcv_ref[0, pl.ds(i * tr, tr), :].reshape(TB)
                 & 1)[:, None]
        par_p = (posv_ref[0, pl.ds(i * tr, tr), :].reshape(TB)
                 & 1)[:, None]
        v = jnp.where(par_s == 1, v_s[:, D:2 * D], v_s[:, 0:D])
        cp = jnp.where(par_p == 1, cp_s[:, D:2 * D], cp_s[:, 0:D])
        cn = cn_ref[0]

        # ---- fused SGNS gradient math (VPU + MXU) ----
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

        d_src = g_pos * cp + jnp.dot(
            g_neg, cn, preferred_element_type=jnp.float32
        )
        d_pos = g_pos * v
        zeros = jnp.zeros((TB, D), jnp.float32)
        v_s[:] = jnp.where(
            par_s == 1,
            jnp.concatenate([zeros, d_src], axis=1),
            jnp.concatenate([d_src, zeros], axis=1),
        )
        cp_s[:] = jnp.where(
            par_p == 1,
            jnp.concatenate([zeros, d_pos], axis=1),
            jnp.concatenate([d_pos, zeros], axis=1),
        )

        # ---- scatter: serial full-row RMW into the slabs ----
        def sbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = fsrc_ref[base + j0 + k]
                sv[pl.ds(r, 1), :] = (
                    sv[pl.ds(r, 1), :] + v_s[pl.ds(j0 + k, 1), :]
                )
                r2 = fpos_ref[base + j0 + k]
                sc[pl.ds(r2, 1), :] = (
                    sc[pl.ds(r2, 1), :] + cp_s[pl.ds(j0 + k, 1), :]
                )
            return 0

        jax.lax.fori_loop(0, TB // _U, sbody, 0, unroll=1)

        # ---- write-back (async; waited at step s+1 or at exit) ----
        @pl.when(i == n_i - 1)
        def _():
            wv, wc = wback(s, bank)
            wv.start()
            wc.start()

            @pl.when(s == n_s - 1)
            def _():
                wv2, wc2 = wback(s, bank)
                wv2.wait()
                wc2.wait()
                loss_ref[0, 0] = lsum[0, 0]

    return _kernel


def _make_multi_kernel_nb(band_size: int, D: int, Ks: int, nb2: int):
    """Double-buffered multiblock kernel with IN-KERNEL banded
    negatives (round 5): each micro-step's shared-negative pool lives
    in its own nb2-row context-table WINDOW (drawn by the exact
    stratified negative law, BandedTables.build_neg_bands), staged
    through a third -- tiny -- slab stream (nb2=400 -> 0.1 MB vs the
    4.2 MB full-band variant that measured 29.4 vs 34.9 M/s). The
    negative rows are gathered from the slab at tile 0 and their
    accumulated deltas are scattered back at the last tile -- so the
    whole-table cn gather and the deferred d_neg scatter-apply (11.7
    us/micro-step of XLA time, experiments/multiblock_breakdown2.py)
    disappear, and negative rows are FRESH per micro-step instead of
    per-superstep.

    nb2 divides band_size, so a negative window sits inside EXACTLY
    one context band. Extra scheduling state vs _make_multi_kernel_db
    (all host-computed prefetch scalars):
      nb[s]    negative window index (granularity nb2)
      ninc[s]  the window lies inside THIS step's context band -- use
               slab_c directly at folded offset noff[s] (two slab
               copies of overlapping HBM rows would lose updates at
               write-back)
      noff[s]  nb*nb2/2 - db*band/2 (valid when ninc)
      confn[s] ~ninc and the window collides with step s-1's context-
               table write-backs (inside band db[s-1], or == window
               nb[s-1]) -> fetch_n lazily
      wbi[s]   wb_n issued at step s (= ~ninc[s])
    conf[s] additionally covers nb[s-1]'s window lying inside band
    db[s] (wb_n is a context-table write)."""

    H = band_size // 2
    Hn = nb2 // 2

    def _kernel(sb_ref, db_ref, nb_ref, conf_ref, confn_ref, ninc_ref,
                noff_ref, wbi_ref, fsrc_ref, fpos_ref, fneg_ref,
                params_ref,
                wvf_in, wcf_in, srcv_ref, posv_ref, negp_ref,
                wvf_ref, wcf_ref, loss_ref,
                slab_v, slab_c, slab_n, v_s, cp_s, cn_s, cn_u, acc,
                lsum, fsems, wsems):
        s = pl.program_id(0)
        i = pl.program_id(1)
        n_s = pl.num_programs(0)
        n_i = pl.num_programs(1)
        alpha = params_ref[s, 0]
        scale = params_ref[s, 1]
        kscale = params_ref[s, 2]
        TB = v_s.shape[0]
        base = (s * n_i + i) * TB
        nbase = s * Ks
        bank = jax.lax.rem(s, 2)
        obank = 1 - bank
        SYNC = min(1, n_i - 1)

        def fetch(step, slot, which):
            band_ref, tbl, h = {
                0: (sb_ref, wvf_ref, H), 1: (db_ref, wcf_ref, H),
                2: (nb_ref, wcf_ref, Hn),
            }[which]
            slab = (slab_v, slab_c, slab_n)[which]
            return pltpu.make_async_copy(
                tbl.at[pl.ds(band_ref[step] * h, h), :],
                slab.at[slot], fsems.at[slot, which])

        def wback(step, slot, which):
            band_ref, tbl, h = {
                0: (sb_ref, wvf_ref, H), 1: (db_ref, wcf_ref, H),
                2: (nb_ref, wcf_ref, Hn),
            }[which]
            slab = (slab_v, slab_c, slab_n)[which]
            return pltpu.make_async_copy(
                slab.at[slot], tbl.at[pl.ds(band_ref[step] * h, h), :],
                wsems.at[slot, which])

        def wait_prev_wbs():
            wback(s - 1, obank, 0).wait()
            wback(s - 1, obank, 1).wait()

            @pl.when(wbi_ref[jnp.maximum(s - 1, 0)] == 1)
            def _():
                wback(s - 1, obank, 2).wait()

        @pl.when(i == 0)
        def _():
            @pl.when(s == 0)
            def _():
                fetch(0, bank, 0).start()
                fetch(0, bank, 1).start()

                @pl.when(ninc_ref[0] == 0)
                def _():
                    fetch(0, bank, 2).start()

            lazy = jnp.logical_and(
                s > 0,
                jnp.logical_or(conf_ref[s] == 1, confn_ref[s] == 1),
            )

            @pl.when(lazy)
            def _():
                wait_prev_wbs()

                @pl.when(conf_ref[s] == 1)
                def _():
                    fetch(s, bank, 0).start()
                    fetch(s, bank, 1).start()

                @pl.when(jnp.logical_and(confn_ref[s] == 1,
                                         ninc_ref[s] == 0))
                def _():
                    fetch(s, bank, 2).start()

            fetch(s, bank, 0).wait()
            fetch(s, bank, 1).wait()

            @pl.when(ninc_ref[s] == 0)
            def _():
                fetch(s, bank, 2).wait()

            # ---- negative rows: slab -> cn_s (serial, Ks rows) ----
            acc[:] = jnp.zeros_like(acc)

            def ngather(slab, off):
                def body(j, _):
                    j0 = j * _U
                    for k in range(_U):
                        r = off + fneg_ref[nbase + j0 + k]
                        cn_s[pl.ds(j0 + k, 1), :] = slab[pl.ds(r, 1), :]
                    return 0

                jax.lax.fori_loop(0, Ks // _U, body, 0, unroll=1)

            @pl.when(ninc_ref[s] == 1)
            def _():
                ngather(slab_c.at[bank], noff_ref[s])

            @pl.when(ninc_ref[s] == 0)
            def _():
                ngather(slab_n.at[bank], 0)

            parD = negp_ref[0]  # (Ks, D) f32 parity mask
            cn_u[:] = (cn_s[:, 0:D] * (1.0 - parD)
                       + cn_s[:, D:2 * D] * parD)

        @pl.when(jnp.logical_and(s == 0, i == 0))
        def _():
            lsum[0, 0] = 0.0

        @pl.when(i == SYNC)
        def _():
            @pl.when(jnp.logical_and(
                s > 0,
                jnp.logical_and(conf_ref[s] == 0, confn_ref[s] == 0),
            ))
            def _():
                wait_prev_wbs()

            nxt = jnp.minimum(s + 1, n_s - 1)

            @pl.when(jnp.logical_and(s + 1 < n_s, conf_ref[nxt] == 0))
            def _():
                fetch(nxt, obank, 0).start()
                fetch(nxt, obank, 1).start()

            @pl.when(jnp.logical_and(
                s + 1 < n_s,
                jnp.logical_and(confn_ref[nxt] == 0, ninc_ref[nxt] == 0),
            ))
            def _():
                fetch(nxt, obank, 2).start()

        # ---- gather: full folded rows -> scratch (serial VMEM reads)
        sv = slab_v.at[bank]
        sc = slab_c.at[bank]

        def gbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = fsrc_ref[base + j0 + k]
                v_s[pl.ds(j0 + k, 1), :] = sv[pl.ds(r, 1), :]
                r2 = fpos_ref[base + j0 + k]
                cp_s[pl.ds(j0 + k, 1), :] = sc[pl.ds(r2, 1), :]
            return 0

        jax.lax.fori_loop(0, TB // _U, gbody, 0, unroll=1)

        # ---- vectorized half selection by parity ----
        tr = TB // 128
        par_s = (srcv_ref[0, pl.ds(i * tr, tr), :].reshape(TB)
                 & 1)[:, None]
        par_p = (posv_ref[0, pl.ds(i * tr, tr), :].reshape(TB)
                 & 1)[:, None]
        v = jnp.where(par_s == 1, v_s[:, D:2 * D], v_s[:, 0:D])
        cp = jnp.where(par_p == 1, cp_s[:, D:2 * D], cp_s[:, 0:D])
        cn = cn_u[:]

        # ---- fused SGNS gradient math (VPU + MXU) ----
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

        d_src = g_pos * cp + jnp.dot(
            g_neg, cn, preferred_element_type=jnp.float32
        )
        d_pos = g_pos * v
        zeros = jnp.zeros((TB, D), jnp.float32)
        v_s[:] = jnp.where(
            par_s == 1,
            jnp.concatenate([zeros, d_src], axis=1),
            jnp.concatenate([d_src, zeros], axis=1),
        )
        cp_s[:] = jnp.where(
            par_p == 1,
            jnp.concatenate([zeros, d_pos], axis=1),
            jnp.concatenate([d_pos, zeros], axis=1),
        )

        # ---- scatter: serial full-row RMW into the slabs ----
        def sbody(j, _):
            j0 = j * _U
            for k in range(_U):
                r = fsrc_ref[base + j0 + k]
                sv[pl.ds(r, 1), :] = (
                    sv[pl.ds(r, 1), :] + v_s[pl.ds(j0 + k, 1), :]
                )
                r2 = fpos_ref[base + j0 + k]
                sc[pl.ds(r2, 1), :] = (
                    sc[pl.ds(r2, 1), :] + cp_s[pl.ds(j0 + k, 1), :]
                )
            return 0

        jax.lax.fori_loop(0, TB // _U, sbody, 0, unroll=1)

        # ---- negative delta scatter + write-back (last tile) ----
        @pl.when(i == n_i - 1)
        def _():
            parD = negp_ref[0]  # (Ks, D) f32 parity mask
            a = acc[:]
            cn_s[:] = jnp.concatenate(
                [a * (1.0 - parD), a * parD], axis=1
            )

            def nscatter(slab, off):
                def body(j, _):
                    j0 = j * _U
                    for k in range(_U):
                        r = off + fneg_ref[nbase + j0 + k]
                        slab[pl.ds(r, 1), :] = (
                            slab[pl.ds(r, 1), :]
                            + cn_s[pl.ds(j0 + k, 1), :]
                        )
                    return 0

                jax.lax.fori_loop(0, Ks // _U, body, 0, unroll=1)

            @pl.when(ninc_ref[s] == 1)
            def _():
                nscatter(slab_c.at[bank], noff_ref[s])

            @pl.when(ninc_ref[s] == 0)
            def _():
                nscatter(slab_n.at[bank], 0)

            wback(s, bank, 0).start()
            wback(s, bank, 1).start()

            @pl.when(wbi_ref[s] == 1)
            def _():
                wback(s, bank, 2).start()

            @pl.when(s == n_s - 1)
            def _():
                wback(s, bank, 0).wait()
                wback(s, bank, 1).wait()

                @pl.when(wbi_ref[s] == 1)
                def _():
                    wback(s, bank, 2).wait()

                loss_ref[0, 0] = lsum[0, 0]

    return _kernel


def fold_table(w: jnp.ndarray) -> jnp.ndarray:
    """(N, D) -> (N/2, 2D) 2-row fold (row-major preserving reshape)."""
    n, d = w.shape
    return w.reshape(n // 2, 2 * d)


def unfold_table(wf: jnp.ndarray) -> jnp.ndarray:
    """(N/2, 2D) -> (N, D)."""
    h, d2 = wf.shape
    return wf.reshape(2 * h, d2 // 2)


@functools.partial(
    jax.jit, static_argnames=("band_size", "nb2", "k_equiv", "interpret")
)
def sgns_banded_multiblock_nb(
    wvf: jnp.ndarray,  # (Np/2, 2D) 2-row-FOLDED padded vertex table
    wcf: jnp.ndarray,  # (Np/2, 2D) folded context table
    sb_idx: jnp.ndarray,  # (S,) i32 source band indices per micro-step
    db_idx: jnp.ndarray,  # (S,) i32 context band indices
    nb_idx: jnp.ndarray,  # (S,) i32 NEGATIVE WINDOW indices (nb2 rows)
    src_l: jnp.ndarray,  # (S, B) i32 band-LOCAL source rows (unfolded)
    pos_l: jnp.ndarray,  # (S, B) i32 band-LOCAL positive rows
    negs_l: jnp.ndarray,  # (S, Ks) i32 WINDOW-LOCAL negative rows
    alpha: jnp.ndarray,  # (S,) per-micro-step learning rates
    band_size: int,
    nb2: int = 400,
    k_equiv: int = 5,
    interpret: bool = False,
):
    """Multiblock superstep with IN-KERNEL banded negatives
    (_make_multi_kernel_nb): negatives are drawn per-step from their
    own nb2-row window (exact stratified negative law), gathered from
    and applied into a third -- tiny -- DMA-staged slab stream. No cn
    snapshot, no deferred d_neg -- the caller does nothing after this
    call. Returns (wvf', wcf', loss_sum ())."""
    S, B = src_l.shape
    D2 = wvf.shape[1]
    D = D2 // 2
    Ks = negs_l.shape[1]
    TB = min(1024, B)
    assert B % TB == 0 and TB % _U == 0, (B, TB)
    assert B % 128 == 0, B
    assert Ks % _U == 0, Ks
    assert band_size % 16 == 0, band_size
    assert band_size % nb2 == 0 and nb2 % 16 == 0, (band_size, nb2)
    assert D2 % 128 == 0 or interpret, (
        "multiblock kernel needs folded rows that are a multiple of "
        "128 lanes (D multiple of 64)"
    )

    alphas = jnp.asarray(alpha, jnp.float32).reshape(S)
    params = jnp.stack(
        [alphas, alphas * (k_equiv / Ks),
         jnp.full((S,), k_equiv / Ks, jnp.float32)], axis=1
    )
    sb_idx = sb_idx.astype(jnp.int32)
    db_idx = db_idx.astype(jnp.int32)
    nb_idx = nb_idx.astype(jnp.int32)
    src_l = src_l.astype(jnp.int32)
    pos_l = pos_l.astype(jnp.int32)
    negs_l = negs_l.astype(jnp.int32)

    ratio = band_size // nb2  # windows per band
    nb_band = nb_idx // ratio  # context band containing each window
    ninc = (nb_band == db_idx).astype(jnp.int32)
    # folded offset of the window inside the context slab (valid when
    # ninc): window row 0 = global nb*nb2 = band db*band_size + delta
    noff = (nb_idx * (nb2 // 2) - db_idx * (band_size // 2)) * ninc
    z1 = jnp.zeros((1,), jnp.int32)
    prev_db, prev_nb, prev_nbb = db_idx[:-1], nb_idx[:-1], nb_band[:-1]
    conf = jnp.concatenate([z1, (
        (sb_idx[1:] == sb_idx[:-1])
        | (db_idx[1:] == prev_db) | (db_idx[1:] == prev_nbb)
    ).astype(jnp.int32)])
    confn = jnp.concatenate([z1, (
        (nb_band[1:] == prev_db) | (nb_idx[1:] == prev_nb)
    ).astype(jnp.int32)]) * (1 - ninc)
    wbi = 1 - ninc

    prefetch = [sb_idx, db_idx, nb_idx, conf, confn, ninc, noff, wbi,
                (src_l >> 1).reshape(-1), (pos_l >> 1).reshape(-1),
                (negs_l >> 1).reshape(-1), params]
    npre = len(prefetch)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npre,
        grid=(S, B // TB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, B // 128, 128), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B // 128, 128), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, Ks, D), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, 1), lambda s, i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((2, band_size // 2, D2), jnp.float32),  # v banks
            pltpu.VMEM((2, band_size // 2, D2), jnp.float32),  # c banks
            pltpu.VMEM((2, nb2 // 2, D2), jnp.float32),  # neg banks
            pltpu.VMEM((TB, D2), jnp.float32),
            pltpu.VMEM((TB, D2), jnp.float32),
            pltpu.VMEM((Ks, D2), jnp.float32),  # gathered neg rows
            pltpu.VMEM((Ks, D), jnp.float32),   # unfolded negatives
            pltpu.VMEM((Ks, D), jnp.float32),   # d_neg accumulator
            pltpu.SMEM((1, 1), jnp.float32),
            pltpu.SemaphoreType.DMA((2, 3)),
            pltpu.SemaphoreType.DMA((2, 3)),
        ],
    )
    _call = pl.pallas_call(
        _make_multi_kernel_nb(band_size, D, Ks, nb2),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(wvf.shape, jnp.float32),
            jax.ShapeDtypeStruct(wcf.shape, jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        input_output_aliases={npre: 0, npre + 1: 1},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        interpret=interpret,
    )
    negp = jnp.broadcast_to(
        (negs_l & 1).astype(jnp.float32)[:, :, None], (S, Ks, D)
    )
    wvf2, wcf2, loss = _call(*prefetch,
      wvf, wcf, src_l.reshape(S, B // 128, 128),
      pos_l.reshape(S, B // 128, 128),
      negp)
    return wvf2, wcf2, loss[0, 0]


@functools.partial(
    jax.jit, static_argnames=("band_size", "k_equiv", "interpret",
                              "pipeline")
)
def sgns_banded_multiblock(
    wvf: jnp.ndarray,  # (Np/2, 2D) 2-row-FOLDED padded vertex table
    wcf: jnp.ndarray,  # (Np/2, 2D) folded context table
    sb_idx: jnp.ndarray,  # (S,) i32 source BAND INDICES per micro-step
    db_idx: jnp.ndarray,  # (S,) i32 context band indices
    src_l: jnp.ndarray,  # (S, B) i32 band-LOCAL source rows (unfolded)
    pos_l: jnp.ndarray,  # (S, B) i32 band-LOCAL positive rows
    cn: jnp.ndarray,  # (S, Ks, D) f32 shared-negative rows (pre-call
    # snapshot; d_neg is returned and applied by the caller)
    alpha: jnp.ndarray,  # (S,) per-micro-step learning rates
    band_size: int,
    k_equiv: int = 5,
    interpret: bool = False,
    pipeline: str = "db",
):
    """S micro-steps, each on its OWN band pair, in one pallas_call:
    the folded tables stay in HBM and each step's band pair is staged
    through VMEM slabs by in-kernel DMA. pipeline="db" (production,
    round 5): double-buffered slab banks -- the next step's band fetch
    and the previous step's write-back overlap compute
    (_make_multi_kernel_db; bit-identical results to "simple").
    pipeline="simple": the round-4 single-bank kernel (fetch -> compute
    -> write-back serialized per micro-step). Both tables donated.
    Returns (wvf', wcf', d_neg (S, Ks, D), loss_sum ())."""
    S, B = src_l.shape
    D2 = wvf.shape[1]
    D = D2 // 2
    Ks = cn.shape[1]
    TB = min(1024, B)  # two tiles per micro-step so the SYNC point
    # (tile 1) lands mid-step: the wb(s-1) wait and fetch(s+1) issue
    # overlap tile 0's compute on the "db" pipeline. Measured (round
    # 5): TB=2048 (one tile, no overlap window) reads 32.4-32.9 vs
    # 37-38 M/s. TB=512 does NOT compile: the per-tile parity reshape
    # (tr, 128) -> (TB,) only lowers for tr in {1, 8} in this Mosaic
    # (same gap as the Ks=256 negv reshape, fixed there by a float
    # mask) -- so TB is pinned at 1024 (tr=8) / B when B < 1024.
    assert B % TB == 0 and TB % _U == 0, (B, TB)
    assert B % 128 == 0, B  # parity inputs ship as (S, B//128, 128)
    # folded slab height band_size/2 must be sublane-aligned (multiple
    # of 8): misaligned slab DMA offsets FAULT the TPU worker
    assert band_size % 16 == 0, band_size
    assert D2 % 128 == 0 or interpret, (
        "multiblock kernel needs folded rows that are a multiple of "
        "128 lanes (D multiple of 64)"
    )
    assert pipeline in ("db", "simple"), pipeline

    alphas = jnp.asarray(alpha, jnp.float32).reshape(S)
    params = jnp.stack(
        [alphas, alphas * (k_equiv / Ks),
         jnp.full((S,), k_equiv / Ks, jnp.float32)], axis=1
    )
    sb_idx = sb_idx.astype(jnp.int32)
    db_idx = db_idx.astype(jnp.int32)
    db_pipe = pipeline == "db"
    if db_pipe:
        # conflict flags: step s shares a band (either side) with step
        # s-1 -> its fetch cannot be prefetched during step s-1 (it
        # would race that step's write-back on the same HBM slice);
        # the kernel fetches those steps lazily after the wb wait
        conf = jnp.concatenate([
            jnp.zeros((1,), jnp.int32),
            ((sb_idx[1:] == sb_idx[:-1])
             | (db_idx[1:] == db_idx[:-1])).astype(jnp.int32),
        ])
        prefetch = [sb_idx, db_idx, conf]
        n_banks = 2
    else:
        prefetch = [sb_idx, db_idx]
        n_banks = 1
    npre = len(prefetch) + 3

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=npre,
        grid=(S, B // TB),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Ks, D), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B // 128, 128), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, B // 128, 128), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((1, Ks, D), lambda s, i, *_: (s, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1), lambda s, i, *_: (0, 0),
                         memory_space=pltpu.SMEM),
        ],
        scratch_shapes=(
            [
                pltpu.VMEM((n_banks, band_size // 2, D2), jnp.float32),
                pltpu.VMEM((n_banks, band_size // 2, D2), jnp.float32),
            ] if db_pipe else [
                pltpu.VMEM((band_size // 2, D2), jnp.float32),
                pltpu.VMEM((band_size // 2, D2), jnp.float32),
            ]
        ) + [
            pltpu.VMEM((TB, D2), jnp.float32),  # gathered folded rows
            pltpu.VMEM((TB, D2), jnp.float32),  # gathered folded rows
            pltpu.SMEM((1, 1), jnp.float32),
        ] + (
            [pltpu.SemaphoreType.DMA((2, 2)),
             pltpu.SemaphoreType.DMA((2, 2))] if db_pipe
            else [pltpu.SemaphoreType.DMA((4,))]
        ),
    )
    src_l = src_l.astype(jnp.int32)
    pos_l = pos_l.astype(jnp.int32)
    kern = (_make_multi_kernel_db(band_size, D) if db_pipe
            else _make_multi_kernel(band_size, D))
    wvf2, wcf2, d_neg, loss = pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(wvf.shape, jnp.float32),
            jax.ShapeDtypeStruct(wcf.shape, jnp.float32),
            jax.ShapeDtypeStruct((S, Ks, D), jnp.float32),
            jax.ShapeDtypeStruct((1, 1), jnp.float32),
        ],
        # operand numbering includes the scalar-prefetch args
        input_output_aliases={npre: 0, npre + 1: 1},
        compiler_params=pltpu.CompilerParams(
            # the v5e's physical VMEM (128 MB) far exceeds Mosaic's
            # default scoped budget; the db pipeline's 4 slab banks
            # need ~17 MB at band 16400 plus tiles/blocks
            vmem_limit_bytes=100 * 1024 * 1024,
        ) if db_pipe else None,
        interpret=interpret,
    )(*prefetch,
      (src_l >> 1).reshape(-1), (pos_l >> 1).reshape(-1), params,
      wvf, wcf, cn, src_l.reshape(S, B // 128, 128),
      pos_l.reshape(S, B // 128, 128))
    return wvf2, wcf2, d_neg, loss[0, 0]


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
