"""Round-5 phase breakdown of the production multiblock superstep.

Production config (b=2048, S=16, band=16400, Ks=128, stream draws,
double-buffered kernel). Variants accumulate phases:
  draw   stream draws only (sb/db/windows/negs)
  cng    + the cn negative-row gather from the folded context table
  kern   + the double-buffered multiblock kernel (no negative apply)
  full   the production step (deferred negative apply included)

Run on real TPU: python experiments/multiblock_breakdown2.py [pipeline]
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from bench import make_youtube_graph  # noqa: E402
from yt_scale_bench import YT  # noqa: E402

B, S, BAND, KS = 2048, 16, 16400, 128
STEPS_PER_CALL = 100  # supersteps per jit call
CALLS = 4
PIPELINE = sys.argv[1] if len(sys.argv) > 1 else "db"


def build():
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE
    from smore_tpu.ops.pallas_sgns_banded import fold_table
    from smore_tpu.sampling.banded import BandedTables

    g = Graph.load_edge_list(YT, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    bt = BandedTables.build(g, band_size=BAND, two_d=True)
    bt.build_stream(mult=32, seed=0)
    n_pad = bt.n_rows_padded
    n = g.n_vertices
    wvf = fold_table(jnp.pad(m.state["vertex"], ((0, n_pad - n), (0, 0))))
    wcf = fold_table(jnp.pad(m.state["context"], ((0, n_pad - n), (0, 0))))
    return bt, wvf, wcf


def make_run(variant):
    from smore_tpu.ops.pallas_sgns_banded import sgns_banded_multiblock

    def super_step(carry, key):
        # bt rides in the carry (a registered pytree) -- closing over it
        # would bake the ~1 GB stream into the program as a constant
        wvf, wcf, bt = carry
        sb, db, src_l, pos_l, negs = bt.draw_banded_stream(key, B, KS, S)
        if variant == "draw":
            probe = (jnp.sum(src_l[:, :64]) + jnp.sum(pos_l[:, :64])
                     + jnp.sum(sb) + jnp.sum(db)
                     + jnp.sum(negs)).astype(jnp.float32)
            return (wvf.at[0, 0].add(probe * 1e-30), wcf, bt), probe
        D = wvf.shape[1] // 2
        negs_flat = negs.reshape(-1)
        fn = negs_flat >> 1
        par = (negs_flat & 1)[:, None]
        rows = wcf.at[fn].get(mode="promise_in_bounds")
        cn = jnp.where(par == 1, rows[:, D:], rows[:, :D]).reshape(S, KS, D)
        if variant == "cng":
            probe = (jnp.sum(cn[:, 0, :]) + jnp.sum(src_l[:, :64])
                     ).astype(jnp.float32)
            return (wvf.at[0, 0].add(probe * 1e-30), wcf, bt), probe
        wvf, wcf, d_neg, loss = sgns_banded_multiblock(
            wvf, wcf, sb // BAND, db // BAND, src_l, pos_l, cn,
            jnp.full((S,), 0.025, jnp.float32), band_size=BAND,
            k_equiv=5, pipeline=PIPELINE,
        )
        if variant == "kern":
            return (wvf, wcf, bt), loss
        dd = d_neg.reshape(-1, D)
        z = jnp.zeros_like(dd)
        d_full = jnp.where(par == 1, jnp.concatenate([z, dd], axis=1),
                           jnp.concatenate([dd, z], axis=1))
        wcf = wcf.at[fn].add(d_full, mode="promise_in_bounds")
        return (wvf, wcf, bt), loss

    @jax.jit
    def run(wvf, wcf, bt, key):
        keys = jax.random.split(key, STEPS_PER_CALL)
        (wvf, wcf, bt), losses = jax.lax.scan(
            super_step, (wvf, wcf, bt), keys)
        return wvf, wcf, losses[-1]

    return run


def main():
    make_youtube_graph(YT)
    bt, wvf0, wcf0 = build()
    spc_samples = STEPS_PER_CALL * S * B
    print(f"pipeline={PIPELINE}  superstep={S}x{B}  "
          f"{spc_samples/1e6:.1f}M samples/call")
    for variant in ("draw", "cng", "kern", "full"):
        run = make_run(variant)
        wvf, wcf = wvf0, wcf0
        key = jax.random.PRNGKey(0)
        wvf, wcf, last = run(wvf, wcf, bt, key)  # compile+warm
        float(last)
        t0 = time.time()
        for c in range(CALLS):
            wvf, wcf, last = run(wvf, wcf, bt, jax.random.PRNGKey(c + 1))
        float(last)
        dt = time.time() - t0
        total = CALLS * spc_samples
        us_per_step = dt / (CALLS * STEPS_PER_CALL * S) * 1e6
        print(f"{variant:5s}: {total/dt/1e6:7.2f} M samples/s   "
              f"{us_per_step:6.1f} us/micro-step", flush=True)


if __name__ == "__main__":
    main()
