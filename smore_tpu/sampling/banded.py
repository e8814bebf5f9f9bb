"""Band-stratified edge sampling: the large-table TPU fast path.

Motivation (measured, experiments/probes/band_probe.py): an XLA scatter-add of B
random rows costs ~0.5 ms/step while the target table is <= 131k rows and
~5x that above 262k rows -- the per-row cost is table-size-bound, not
byte- or locality-bound (bf16 rows and unique-index hints don't help).
At Youtube scale (~1M vertices) the context-table scatter therefore
dominates the SGNS step (PERF_NOTES.md "3.6x cliff").

Design: partition the context-table row space into BANDS of `band_size`
rows. Each training step first draws a band b with probability equal to
the band's share of the edge-sample mass, then draws its whole batch of
(src, pos) pairs CONDITIONED on pos being in band b. The step's positive
scatter then touches only rows [b*band, (b+1)*band), so the kernel
dynamic-slices that band out of the big table, scatters at small-table
cost, and writes the band back (~0.15 ms of extra copy traffic).

Law exactness: P(band) * P(src, pos | band) telescopes to the unbanded
joint edge law P_v(src) * w^0.75 / Z_src (SamplerTables.edge_pa law) --
the mixture over steps is EXACTLY the reference's two-stage sampling law
(proNet::SourceSample + TargetSample(vid), proNet.cpp:623-683). The same
holds per-pair under grouped draws: marginalizing the band out of
(extra context | src, band) recovers w^0.75 / Z_src. Stratification only
changes WHICH samples share a step (within-step correlation), as grouped
draws already do; quality is gated by the community-AUC parity runs.

Memory: the banded edge table stores both the slot edge and its alias
edge inline -- a (E, 8) f32 row (32 B) so ONE gather serves the whole
ungrouped draw (the draw's dominant cost, experiments/fused_breakdown.py);
the (segment offset, length) pointers for grouped context draws live in
a separate (E, 4) table gathered only when group > 1.

Two flavors (build(two_d=...)):
  1D (two_d=False): strata = dst band only. The source side is handled
     by grouped draws (src gather/scatter shrink by the group factor).
     Used by LINE order-1, where source rows share the context table.
  2D (two_d=True, default): strata = (src band, dst band) pairs -- BOTH
     tables' scatters ride a band slice, so group=1 (the reference's
     exact per-sample source diversity) keeps full speed. Measured: at
     a 40M budget on the Youtube-scale graph, group=8 lags the
     reference's convergence (AUC 0.568 vs 0.611) while banded group=1
     matches it (0.614) -- grouping, not banding, was the gap.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.graph.graph import Graph
from smore_tpu.sampling.alias import build_alias, build_alias_segmented
from smore_tpu.sampling.tables import SamplerTables, _vertex_distribution

# edge_pa column layout (slot edge | alias edge):
#   0 prob | 1 src 2 dst | 3 asrc 4 adst   (5..7 zero pad)
# Segment data for GROUPED draws lives in the separate edge_seg table
# ((E, 4): seg_off, seg_deg, aseg_off, aseg_deg) so the ungrouped
# production draw gathers 32-byte rows instead of 64 -- the slot gather
# is the draw's dominant cost (experiments/fused_breakdown.py).
_EDGE_COLS = 8

# Default band size: ~32k rows (8 MB of f32x64 -- comfortably inside the
# measured small-scatter regime), a multiple of 8 (f32 sublane tile), but
# NOT divisible by a large power of two: full-table random scatters are
# pathologically slow when the table's row count has a large 2-adic
# factor (measured: a 4k-row scatter into 950,272 = 29*2^15 rows costs
# ~2 ms vs ~0.35 ms into 921,878; pure 2^19 = 524,288 is the worst case
# -- experiments/probes/banded_debug3.py / band_probe.py). Since banding pads
# the table to n_bands * band_size, the band size must carry the
# de-aliasing: 32776 = 8 * 17 * 241.
DEFAULT_BAND_SIZE = 32776

# Band size for the FUSED Pallas path (ops/pallas_sgns_banded.py): both
# bands live in VMEM simultaneously (~16 MB/core), so each must fit in
# ~4.2 MB at D=64 f32. Same de-aliasing requirement as above:
# 16392 = 8 * 3 * 683 (2-adic factor only 2^3). Smaller bands only
# refine the stratification -- the per-sample law is band-size-invariant
# (the telescoping argument above holds for any partition) and each
# vertex participates in n_bands strata per side, so per-vertex update
# mass is unchanged.
FUSED_BAND_SIZE = 16392

# Band size for the MULTI-band DMA-staged kernel (sgns_banded_multiblock,
# round 4): each table lives 2-ROW-FOLDED ((N_pad/2, 2D)) and the kernel
# DMAs each micro-step's two half-height band SLABS into two VMEM
# scratch buffers itself (the round-3 grid-pipeline variant OOMed at
# every band size because Mosaic staged ~16 band-block buffers). VMEM
# cost = 2 * (band/2) * 2D * 4 B = band * 512 B at D=64, so a band at
# the quality-PROVEN 16392-grade concentration (the 0.618-gate /
# exact-400M-parity ratio at visit 2048 -- round-4 ablation measured
# 0.599 at band 8200) fits: 8.4 MB of slabs. The folded HALF-height
# must be sublane-aligned (multiple of 8; a 8196-row slab DMA faults
# the TPU worker), so band % 16 == 0: 16400 = 2^4 * 5^2 * 41 (2-adic
# factor 2^4 only -- the de-aliasing rule fears LARGE powers of two).
MULTI_BAND_SIZE = 16400


@jax.tree_util.register_pytree_node_class
@dataclass
class BandedTables:
    """Device-resident band-stratified edge sampler.

    band_pa:   (n_bands, 2) f32 [prob, alias] -- band mass alias table
    band_meta: (n_bands, 2) i32 [slot offset, slot count]
    edge_pa:   (E, 8) f32, banded slot layout (see module docstring)
    edge_seg:  (E, 4) f32 [seg_off, seg_deg, aseg_off, aseg_deg] --
               (src, band)-segment pointers, gathered only by GROUPED
               draws (group > 1)
    ctx_pa:    (E, 4) f32 [prob, dst, alias_dst, 0] -- within-(src,band)
               segment context alias table, aligned with edge_pa slots
    neg_pa:    (N, 2) f32 -- the global negative table (shared with the
               base SamplerTables; the negative law is NOT banded)
    """

    band_pa: jnp.ndarray
    band_meta: jnp.ndarray
    edge_pa: jnp.ndarray
    edge_seg: jnp.ndarray
    ctx_pa: jnp.ndarray
    neg_pa: jnp.ndarray
    band_size: int
    n_rows_padded: int
    n_bands: int
    two_d: bool
    # optional pre-sampled edge STREAM (build_stream): per stratum, a
    # contiguous run of iid pre-drawn (src, pos) pairs packed band-local
    # as (src_l << 16) | pos_l. stream_meta: (n_strata, 2) i32
    # [offset, length]. None when not built.
    stream: jnp.ndarray | None = None
    stream_meta: jnp.ndarray | None = None
    # optional BANDED-negative alias tables (build_neg_bands): the
    # global negative law stratified by WINDOWS of nb2 rows (a finer
    # granularity than the edge bands -- nb2 divides band_size, so a
    # negative window always sits inside exactly one context band) so
    # the in-kernel banded negative pool can draw window-local
    # negatives and stage a tiny (nb2/2, 2D) slab. neg_band_pa:
    # (Np/nb2, 2) f32 window-level alias by within-window deg^0.75
    # mass; neg_local_pa: (Np, 2) f32 [prob, LOCAL alias] per-window
    # alias over its nb2 slots (padded slots carry zero mass).
    neg_band_pa: jnp.ndarray | None = None
    neg_local_pa: jnp.ndarray | None = None
    nb2: int = 0

    def tree_flatten(self):
        children = (self.band_pa, self.band_meta, self.edge_pa,
                    self.edge_seg, self.ctx_pa, self.neg_pa,
                    self.stream, self.stream_meta,
                    self.neg_band_pa, self.neg_local_pa)
        return children, (self.band_size, self.n_rows_padded,
                          self.n_bands, self.two_d, self.nb2)

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children[:6], band_size=aux[0], n_rows_padded=aux[1],
                   n_bands=aux[2], two_d=aux[3], stream=children[6],
                   stream_meta=children[7], neg_band_pa=children[8],
                   neg_local_pa=children[9],
                   nb2=aux[4] if len(aux) > 4 else 0)

    # ------------------------------------------------------------------ #
    @staticmethod
    def build(
        g: Graph,
        band_size: int = DEFAULT_BAND_SIZE,
        vertex_method: str = "out_degrees",
        power: float = 0.75,
        base: SamplerTables | None = None,
        two_d: bool = True,
    ) -> "BandedTables":
        n, e = g.n_vertices, g.n_edges
        if e == 0 or e >= (1 << 24) or n >= (1 << 24):
            raise ValueError(
                "banded tables need 0 < edges < 2^24 and vertices < 2^24 "
                "(float32-exact vids); fall back to SamplerTables"
            )
        n_bands = -(-n // band_size)
        n_pad = n_bands * band_size

        src = np.repeat(np.arange(n, dtype=np.int64), np.diff(g.indptr))
        dst = np.asarray(g.indices, dtype=np.int64)
        w = np.asarray(g.weights, dtype=np.float64)
        # stratum of an edge: dst band (1D) or (src band, dst band) (2D)
        if two_d:
            strat_of = (src // band_size) * n_bands + dst // band_size
            n_strata = n_bands * n_bands
        else:
            strat_of = dst // band_size
            n_strata = n_bands

        # sort slots by (stratum, src): strata contiguous, (src, stratum)
        # segments contiguous within each stratum
        order = np.lexsort((src, strat_of))
        bsrc, bdst, bw = src[order], dst[order], w[order]
        bstrat = strat_of[order]

        # joint edge-sample mass per slot: P_v(src) * w^0.75 / Z_src
        # (identical law to SamplerTables.edge_pa, tables.py:167-183)
        vmass = _vertex_distribution(g, vertex_method).astype(np.float64)
        vmass = np.where(vmass > 0, vmass**power, 0.0)
        w_pow = np.where(bw > 0, bw**power, 0.0)
        z = np.zeros(n, dtype=np.float64)
        np.add.at(z, bsrc, w_pow)
        jw = (vmass[bsrc] / max(vmass.sum(), 1e-300)) * (
            w_pow / np.maximum(z[bsrc], 1e-300)
        )

        strat_off = np.searchsorted(bstrat, np.arange(n_strata))
        strat_cnt = np.diff(np.append(strat_off, e)).astype(np.int64)

        # stratum mass alias table
        mass = np.zeros(n_strata, dtype=np.float64)
        np.add.at(mass, bstrat, jw)
        bp, ba = build_alias(mass, power=1.0)
        ba = np.where(ba < 0, np.arange(n_strata), ba)

        # per-stratum edge alias tables (flat, local alias -> global slot)
        strat_indptr = np.append(strat_off, e).astype(np.int64)
        ep, ea_local = build_alias_segmented(jw, strat_indptr, power=1.0)
        slot = np.arange(e, dtype=np.int64)
        ea = np.where(ea_local >= 0, strat_off[bstrat] + ea_local, slot)

        # (src, stratum) segments: runs of equal src within a stratum
        change = np.empty(e, dtype=bool)
        change[0] = True
        change[1:] = (bsrc[1:] != bsrc[:-1]) | (bstrat[1:] != bstrat[:-1])
        seg_start_idx = np.flatnonzero(change)
        seg_id_of_slot = np.cumsum(change) - 1
        seg_off = seg_start_idx[seg_id_of_slot]
        seg_indptr = np.append(seg_start_idx, e).astype(np.int64)
        seg_deg = np.diff(seg_indptr)[seg_id_of_slot]

        # within-segment context alias (extra grouped draws)
        cp, ca_local = build_alias_segmented(bw, seg_indptr, power=power)
        ca = np.where(ca_local >= 0, seg_off + ca_local, slot)

        edge_pa = np.zeros((e, _EDGE_COLS), dtype=np.float32)
        edge_pa[:, 0] = ep
        edge_pa[:, 1] = bsrc
        edge_pa[:, 2] = bdst
        edge_pa[:, 3] = bsrc[ea]
        edge_pa[:, 4] = bdst[ea]
        edge_seg = np.zeros((e, 4), dtype=np.float32)
        edge_seg[:, 0] = seg_off
        edge_seg[:, 1] = seg_deg
        edge_seg[:, 2] = seg_off[ea]
        edge_seg[:, 3] = seg_deg[ea]

        ctx_pa = np.zeros((e, 4), dtype=np.float32)
        ctx_pa[:, 0] = cp
        ctx_pa[:, 1] = bdst
        ctx_pa[:, 2] = bdst[ca]

        if base is None:
            # only the negative law is needed -- don't build (or keep)
            # the full sampler's HBM tables at exactly the scales where
            # banding engages
            neg_pa = SamplerTables.build_negative_table(g)
        else:
            neg_pa = base.neg_pa
        return BandedTables(
            band_pa=jnp.asarray(np.stack([bp, ba], 1), jnp.float32),
            band_meta=jnp.asarray(np.stack([strat_off, strat_cnt], 1),
                                  jnp.int32),
            edge_pa=jnp.asarray(edge_pa),
            edge_seg=jnp.asarray(edge_seg),
            ctx_pa=jnp.asarray(ctx_pa),
            neg_pa=neg_pa,
            band_size=band_size,
            n_rows_padded=n_pad,
            n_bands=n_bands,
            two_d=two_d,
        )

    # ------------------------------------------------------------------ #
    def build_stream(self, mult: int = 4, min_len: int = 4096,
                     seed: int = 0) -> "BandedTables":
        """Pre-sample per-stratum edge STREAMS on the host.

        Measured motivation (experiments/draw_decomp.py, round 4): the
        hoisted banded draw is 100% bound by the per-sample random 32-B
        edge-row gather (437 of 439 us at batch 32768; RNG is 13 us).
        This replaces the per-sample gather with ONE contiguous window
        read: for each stratum, draw max(mult * cnt_s, min_len) iid
        samples from the exact within-stratum alias law ONCE at build
        time (vectorized numpy); a training micro-step then reads a
        random contiguous window of its stratum's stream.

        Law: every stream entry is an iid draw from the stratum's edge
        law, so the per-sample marginal of ANY window is exactly the
        alias law; the window choice only selects WHICH iid pre-draws
        get used (bootstrap-style reuse across the run). What changes
        vs fresh draws is sample-diversity over the whole run (entries
        can repeat, the multiset is finite) -- a variance effect gated
        by the 40M/400M community-AUC parity runs like every banded
        config. Entries are packed band-local as (src_l << 16) | pos_l
        (requires band_size < 32768 for signed-shift safety).
        """
        if self.band_size >= (1 << 15):
            raise ValueError("edge stream needs band_size < 32768")
        rng = np.random.default_rng(seed)
        meta = np.asarray(self.band_meta, np.int64)
        off, cnt = meta[:, 0], meta[:, 1]
        ns = len(cnt)
        ep = np.asarray(self.edge_pa, np.float64)
        prob, esrc, edst = ep[:, 0], ep[:, 1], ep[:, 2]
        asrc, adst = ep[:, 3], ep[:, 4]

        L = np.where(cnt > 0, np.maximum(mult * cnt, min_len), 0)
        soff = np.concatenate([[0], np.cumsum(L)])[:-1]
        total = int(L.sum())
        sid = np.repeat(np.arange(ns), L)
        u1 = rng.random(total)
        u2 = rng.random(total)
        r = (u1 * cnt[sid]).astype(np.int64)
        slot = off[sid] + np.minimum(r, np.maximum(cnt[sid] - 1, 0))
        take = u2 < prob[slot]
        src = np.where(take, esrc[slot], asrc[slot]).astype(np.int64)
        pos = np.where(take, edst[slot], adst[slot]).astype(np.int64)
        if self.two_d:
            sb = (sid // self.n_bands) * self.band_size
            db = (sid % self.n_bands) * self.band_size
        else:
            sb = np.zeros(total, np.int64)
            db = sid * self.band_size
        packed = ((src - sb) << 16) | (pos - db)
        self.stream = jnp.asarray(packed, jnp.int32)
        self.stream_meta = jnp.asarray(
            np.stack([soff, L], 1), jnp.int32)
        return self

    def build_neg_bands(self, g: Graph, negative_method: str = "degrees",
                        power: float = 0.75, nb2: int = 400,
                        ) -> "BandedTables":
        """Stratify the global negative law by nb2-row WINDOWS (round 5).

        P(neg = v) = deg(v)^0.75 / Z telescopes as P(window) *
        P(v | window) with P(window) = the window's deg^0.75 mass share
        -- the same exactness argument as the edge-law banding (module
        docstring). Lets the multiblock kernel draw each micro-step's
        shared-negative pool from ONE window and apply the negative
        updates in-slab, removing the whole-table gather/apply from the
        step (the measured 11.7 us/micro-step left on the XLA side,
        multiblock_breakdown2). nb2 must divide band_size (a window
        then sits inside exactly one context band -- the kernel's
        containment case) and keep the folded slab sublane-aligned
        (nb2 % 16 == 0); at 400 rows the slab DMA is ~0.1 MB/step --
        negligible, unlike a full-band negative slab (measured 29.4 vs
        34.9 M/s: a 4.2 MB third slab stream LOSES). Deviation vs the
        global pool: a step's Ks negatives share a window (within-step
        correlation only; the per-sample marginal is exact) --
        quality-gated like every banded config."""
        from smore_tpu.sampling.tables import _negative_distribution

        if self.band_size % nb2 or nb2 % 16:
            raise ValueError(f"nb2 {nb2} must divide band_size "
                             f"{self.band_size} and be a multiple of 16")
        mass = _negative_distribution(g, negative_method).astype(np.float64)
        mass = np.where(mass > 0, mass**power, 0.0)
        pad = np.zeros(self.n_rows_padded, dtype=np.float64)
        pad[: len(mass)] = mass
        n_win = self.n_rows_padded // nb2
        win_mass = pad.reshape(n_win, nb2).sum(1)
        bp, ba = build_alias(win_mass, power=1.0)
        ba = np.where(ba < 0, np.arange(n_win), ba)
        indptr = np.arange(n_win + 1, dtype=np.int64) * nb2
        lp, la = build_alias_segmented(pad, indptr, power=1.0)
        slot_local = np.arange(self.n_rows_padded, dtype=np.int64) % nb2
        la = np.where(la >= 0, la, slot_local)  # local alias ids
        self.neg_band_pa = jnp.asarray(np.stack([bp, ba], 1), jnp.float32)
        self.neg_local_pa = jnp.asarray(np.stack([lp, la], 1), jnp.float32)
        self.nb2 = nb2
        return self

    def draw_neg_banded(self, key: jax.Array, n_negs: int, steps: int):
        """Per micro-step: a negative WINDOW by its deg^0.75 mass share,
        then n_negs iid within-window draws from the conditional law
        (build_neg_bands). Returns (nb (steps,) window indices,
        negs_l (steps, n_negs) window-LOCAL row ids)."""
        kb, kl = jax.random.split(key)
        nbnd = self.neg_band_pa.shape[0]
        ub = jax.random.uniform(kb, (steps, 2))
        i = jnp.minimum((ub[:, 0] * nbnd).astype(jnp.int32), nbnd - 1)
        brow = self.neg_band_pa.at[i].get(mode="promise_in_bounds")
        nb = jnp.where(ub[:, 1] < brow[:, 0], i,
                       brow[:, 1].astype(jnp.int32))
        ul = jax.random.uniform(kl, (steps, n_negs, 2))
        r = jnp.minimum((ul[:, :, 0] * self.nb2).astype(jnp.int32),
                        self.nb2 - 1)
        rows = self.neg_local_pa.at[
            (nb[:, None] * self.nb2 + r).reshape(-1)
        ].get(mode="promise_in_bounds").reshape(steps, n_negs, 2)
        negs_l = jnp.where(ul[:, :, 1] < rows[:, :, 0], r,
                           rows[:, :, 1].astype(jnp.int32))
        return nb, negs_l

    def draw_banded_stream(
        self, key: jax.Array, batch: int, n_negs: int, steps: int,
        with_negs: bool = True,
    ):
        """Stream-backed hoisted draw: per micro-step, one stratum
        alias draw + one contiguous window of its pre-sampled stream
        (build_stream). Returns (sb, db, src_l, pos_l, negs) with
        src/pos BAND-LOCAL, shapes as draw_banded_batches_hoisted.
        with_negs=False skips the global negative draw (negs=None) --
        the banded-negative kernel draws its own via draw_neg_banded."""
        kb, ko, kn = jax.random.split(key, 3)

        ub = jax.random.uniform(kb, (steps, 2))
        ns = self.band_pa.shape[0]
        i = jnp.minimum((ub[:, 0] * ns).astype(jnp.int32), ns - 1)
        brow = self.band_pa.at[i].get(mode="promise_in_bounds")
        s = jnp.where(ub[:, 1] < brow[:, 0], i,
                      brow[:, 1].astype(jnp.int32))
        meta = self.stream_meta.at[s].get(mode="promise_in_bounds")
        soff, slen = meta[:, 0], meta[:, 1]
        if self.two_d:
            sb = (s // self.n_bands) * self.band_size
            db = (s % self.n_bands) * self.band_size
        else:
            sb = jnp.zeros((steps,), jnp.int32)
            db = s * self.band_size

        uo = jax.random.uniform(ko, (steps,))
        start = soff + (
            uo * jnp.maximum(slen - batch + 1, 1).astype(jnp.float32)
        ).astype(jnp.int32)
        # CONTIGUOUS window reads must be lax.dynamic_slice, not a
        # gather: XLA's gather engine pays its per-ELEMENT issue cost
        # (~13 ns) regardless of element size, which would cost as much
        # as the 32-B edge-row gathers this path exists to remove
        # (measured: stream-by-gather 17.0 M/s < hoisted 20.6 M/s;
        # stream-by-slice removes the draw from the critical path).
        # steps is small and static, so the unrolled slice loop is fine.
        packed = jnp.stack([
            jax.lax.dynamic_slice(self.stream, (start[t],), (batch,))
            for t in range(steps)
        ])
        src_l = packed >> 16
        pos_l = packed & 0xFFFF

        if not with_negs:
            return sb, db, src_l, pos_l, None

        un = jax.random.uniform(kn, (steps, n_negs, 2))
        n = self.neg_pa.shape[0]
        j = jnp.minimum((un[:, :, 0] * n).astype(jnp.int32), n - 1)
        nrow = self.neg_pa.at[j.reshape(-1)].get(
            mode="promise_in_bounds"
        ).reshape(steps, n_negs, -1)
        negs = jnp.where(un[:, :, 1] < nrow[:, :, 0], j,
                         nrow[:, :, 1].astype(jnp.int32))
        return sb, db, src_l, pos_l, negs

    # ------------------------------------------------------------------ #
    def draw_banded_batch(
        self, key: jax.Array, batch: int, group: int, n_negs: int
    ):
        """One stratified step draw.

        Returns (src_band_start, dst_band_start, src, pos, negs):
          src_band_start: () i32, first row of the sources' band (always
               0 for 1D tables -- sources are then unconstrained)
          dst_band_start: () i32, first row of the contexts' band
          src: (batch,) i32 in repeat layout (group consecutive samples
               per source; group=1 for ungrouped)
          pos: (batch,) i32 GLOBAL vids, all within the dst band
          negs: (n_negs,) i32 global shared negatives (unbanded law)
        """
        bg = batch // group
        kb, ku, kn = jax.random.split(key, 3)

        # stratum draw (one alias draw over n_strata)
        ub = jax.random.uniform(kb, (2,))
        ns = self.band_pa.shape[0]
        i = jnp.minimum((ub[0] * ns).astype(jnp.int32), ns - 1)
        brow = self.band_pa[i]
        s = jnp.where(ub[1] < brow[0], i, brow[1].astype(jnp.int32))
        meta = self.band_meta[s]
        off, cnt = meta[0], meta[1]
        if self.two_d:
            src_band_start = (s // self.n_bands) * self.band_size
            dst_band_start = (s % self.n_bands) * self.band_size
        else:
            src_band_start = jnp.int32(0)
            dst_band_start = s * self.band_size

        u = jax.random.uniform(ku, (batch, 2 if group == 1 else 4))
        # slot edge draw within the band
        r = (u[:bg, 0] * cnt).astype(jnp.int32)
        slot = off + jnp.minimum(r, jnp.maximum(cnt - 1, 0))
        row = self.edge_pa.at[slot].get(mode="promise_in_bounds")
        take = (u[:bg, 1] < row[:, 0])[:, None]
        picked = jnp.where(take, row[:, 1:3], row[:, 3:5])
        src_small = picked[:, 0].astype(jnp.int32)
        pos0 = picked[:, 1].astype(jnp.int32)

        if group == 1:
            src, pos = src_small, pos0
        else:
            seg = self.edge_seg.at[slot].get(mode="promise_in_bounds")
            segp = jnp.where(take, seg[:, 0:2], seg[:, 2:4])
            seg_off = segp[:, 0].astype(jnp.int32)
            seg_deg = segp[:, 1].astype(jnp.int32)
            src = jnp.repeat(src_small, group)
            so = jnp.repeat(seg_off, group)
            sd = jnp.repeat(seg_deg, group)
            rr = (u[:, 2] * sd).astype(jnp.int32)
            cslot = so + jnp.minimum(rr, jnp.maximum(sd - 1, 0))
            crow = self.ctx_pa.at[cslot].get(mode="promise_in_bounds")
            pos = jnp.where(u[:, 3] < crow[:, 0], crow[:, 1], crow[:, 2])
            pos = pos.astype(jnp.int32).at[::group].set(pos0)

        # global shared negatives (law unchanged, tables.py:228-239)
        un = jax.random.uniform(kn, (n_negs, 2))
        n = self.neg_pa.shape[0]
        j = jnp.minimum((un[:, 0] * n).astype(jnp.int32), n - 1)
        nrow = self.neg_pa.at[j].get(mode="promise_in_bounds")
        negs = jnp.where(un[:, 1] < nrow[:, 0], j,
                         nrow[:, 1].astype(jnp.int32))
        return src_band_start, dst_band_start, src, pos, negs

    def draw_banded_batches_hoisted(
        self, key: jax.Array, batch: int, group: int, n_negs: int,
        steps: int,
    ):
        """``steps`` consecutive draw_banded_batch draws in ONE shot.

        Identical in law to ``steps`` independent per-step draws: the
        band alias, within-band slot, grouped-context, and negative
        draws are all state-independent, so hoisting them out of the
        update scan changes nothing about the sampling distribution
        (same transform as SamplerTables.draw_edge_batches_hoisted,
        tables.py). Amortizing the per-gather fixed costs lifts the
        Youtube-scale banded step 16.7 -> 19.6 M samples/s
        (experiments/banded_hoist.py, saturates at steps=8).

        Returns (sb, db, src, pos, negs) shaped (steps,), (steps,),
        (steps, batch), (steps, batch), (steps, n_negs); row i is step
        i's draw, same layout as draw_banded_batch."""
        bg = batch // group
        kb, ku, kn = jax.random.split(key, 3)

        ub = jax.random.uniform(kb, (steps, 2))
        ns = self.band_pa.shape[0]
        i = jnp.minimum((ub[:, 0] * ns).astype(jnp.int32), ns - 1)
        brow = self.band_pa.at[i].get(mode="promise_in_bounds")
        s = jnp.where(ub[:, 1] < brow[:, 0], i,
                      brow[:, 1].astype(jnp.int32))
        meta = self.band_meta.at[s].get(mode="promise_in_bounds")
        off, cnt = meta[:, 0], meta[:, 1]
        if self.two_d:
            sb = (s // self.n_bands) * self.band_size
            db = (s % self.n_bands) * self.band_size
        else:
            sb = jnp.zeros((steps,), jnp.int32)
            db = s * self.band_size

        u = jax.random.uniform(
            ku, (steps, batch, 2 if group == 1 else 4)
        )
        r = (u[:, :bg, 0] * cnt[:, None].astype(jnp.float32)).astype(
            jnp.int32
        )
        slot = off[:, None] + jnp.minimum(
            r, jnp.maximum(cnt[:, None] - 1, 0)
        )
        row = self.edge_pa.at[slot.reshape(-1)].get(
            mode="promise_in_bounds"
        ).reshape(steps, bg, -1)
        take = (u[:, :bg, 1] < row[:, :, 0])[:, :, None]
        picked = jnp.where(take, row[:, :, 1:3], row[:, :, 3:5])
        src_small = picked[:, :, 0].astype(jnp.int32)
        pos0 = picked[:, :, 1].astype(jnp.int32)

        if group == 1:
            src, pos = src_small, pos0
        else:
            seg = self.edge_seg.at[slot.reshape(-1)].get(
                mode="promise_in_bounds"
            ).reshape(steps, bg, -1)
            segp = jnp.where(take, seg[:, :, 0:2], seg[:, :, 2:4])
            seg_off = segp[:, :, 0].astype(jnp.int32)
            seg_deg = segp[:, :, 1].astype(jnp.int32)
            src = jnp.repeat(src_small, group, axis=1)
            so = jnp.repeat(seg_off, group, axis=1)
            sd = jnp.repeat(seg_deg, group, axis=1)
            rr = (u[:, :, 2] * sd.astype(jnp.float32)).astype(jnp.int32)
            cslot = so + jnp.minimum(rr, jnp.maximum(sd - 1, 0))
            crow = self.ctx_pa.at[cslot.reshape(-1)].get(
                mode="promise_in_bounds"
            ).reshape(steps, batch, -1)
            pos = jnp.where(u[:, :, 3] < crow[:, :, 0], crow[:, :, 1],
                            crow[:, :, 2]).astype(jnp.int32)
            pos = pos.at[:, ::group].set(pos0)

        un = jax.random.uniform(kn, (steps, n_negs, 2))
        n = self.neg_pa.shape[0]
        j = jnp.minimum((un[:, :, 0] * n).astype(jnp.int32), n - 1)
        nrow = self.neg_pa.at[j.reshape(-1)].get(
            mode="promise_in_bounds"
        ).reshape(steps, n_negs, -1)
        negs = jnp.where(un[:, :, 1] < nrow[:, :, 0], j,
                         nrow[:, :, 1].astype(jnp.int32))
        return sb, db, src, pos, negs

    def draw_banded_block(
        self, key: jax.Array, batch: int, group: int, n_negs: int,
        steps: int,
    ):
        """Band-PERSISTENT block draw: ONE stratum for ``steps``
        consecutive micro-batches.

        Law: each sample's marginal is still P(stratum) * P(pair |
        stratum) = the exact unbanded joint edge law (the same
        telescoping argument as draw_banded_batch -- the stratum is
        drawn by its edge-sample mass). What changes vs per-step
        stratification is only WHICH samples share a stratum: steps *
        batch consecutive samples now do, so the per-stratum budget
        allocation over a run is a multinomial with total/(steps*batch)
        trials instead of total/batch -- a variance, not a bias. The
        update step amortizes the band slice/write-back over the whole
        block (the point of holding: ~33.5 MB/step of band copy traffic
        drops by the hold factor -- PERF_NOTES "Roofline accounting").
        Quality is gated at the 40M community-AUC parity budget like
        every banded config.

        Returns (sb, db, src, pos, negs) shaped (), (), (steps, batch),
        (steps, batch), (steps, n_negs): scalar band starts shared by
        every micro-batch; row i is micro-step i's draw."""
        bg = batch // group
        kb, ku, kn = jax.random.split(key, 3)

        ub = jax.random.uniform(kb, (2,))
        ns = self.band_pa.shape[0]
        i = jnp.minimum((ub[0] * ns).astype(jnp.int32), ns - 1)
        brow = self.band_pa[i]
        s = jnp.where(ub[1] < brow[0], i, brow[1].astype(jnp.int32))
        meta = self.band_meta[s]
        off, cnt = meta[0], meta[1]
        if self.two_d:
            sb = (s // self.n_bands) * self.band_size
            db = (s % self.n_bands) * self.band_size
        else:
            sb = jnp.int32(0)
            db = s * self.band_size

        u = jax.random.uniform(
            ku, (steps, batch, 2 if group == 1 else 4)
        )
        r = (u[:, :bg, 0] * cnt.astype(jnp.float32)).astype(jnp.int32)
        slot = off + jnp.minimum(r, jnp.maximum(cnt - 1, 0))
        row = self.edge_pa.at[slot.reshape(-1)].get(
            mode="promise_in_bounds"
        ).reshape(steps, bg, -1)
        take = (u[:, :bg, 1] < row[:, :, 0])[:, :, None]
        picked = jnp.where(take, row[:, :, 1:3], row[:, :, 3:5])
        src = picked[:, :, 0].astype(jnp.int32)
        pos0 = picked[:, :, 1].astype(jnp.int32)

        if group == 1:
            pos = pos0
        else:
            seg = self.edge_seg.at[slot.reshape(-1)].get(
                mode="promise_in_bounds"
            ).reshape(steps, bg, -1)
            segp = jnp.where(take, seg[:, :, 0:2], seg[:, :, 2:4])
            seg_off = segp[:, :, 0].astype(jnp.int32)
            seg_deg = segp[:, :, 1].astype(jnp.int32)
            src = jnp.repeat(src, group, axis=1)
            so = jnp.repeat(seg_off, group, axis=1)
            sd = jnp.repeat(seg_deg, group, axis=1)
            rr = (u[:, :, 2] * sd.astype(jnp.float32)).astype(jnp.int32)
            cslot = so + jnp.minimum(rr, jnp.maximum(sd - 1, 0))
            crow = self.ctx_pa.at[cslot.reshape(-1)].get(
                mode="promise_in_bounds"
            ).reshape(steps, batch, -1)
            pos = jnp.where(u[:, :, 3] < crow[:, :, 0], crow[:, :, 1],
                            crow[:, :, 2]).astype(jnp.int32)
            pos = pos.at[:, ::group].set(pos0)

        un = jax.random.uniform(kn, (steps, n_negs, 2))
        n = self.neg_pa.shape[0]
        j = jnp.minimum((un[:, :, 0] * n).astype(jnp.int32), n - 1)
        nrow = self.neg_pa.at[j.reshape(-1)].get(
            mode="promise_in_bounds"
        ).reshape(steps, n_negs, -1)
        negs = jnp.where(un[:, :, 1] < nrow[:, :, 0], j,
                         nrow[:, :, 1].astype(jnp.int32))
        return sb, db, src, pos, negs
