"""Component-cost breakdown of the banded SGNS micro-step at Youtube
scale — where does the ~1.4 ms/step actually go?

Variants (all batch=32768, group=1, hoist=8, band 16392, 2D strata):
  draw        hoisted banded draws only (sum outputs to defeat DCE)
  slice       draws + band dynamic-slice + write-back (no update math)
  kern_mem    draws + slices + fused kernel gather+scatter (no math)
  kern_nosc   draws + slices + fused kernel gather+math (no scatter)
  kern_full   draws + slices + full fused kernel (no negative apply)
  full        the production fused step (negatives included)

Run on real TPU: python experiments/fused_breakdown.py
"""

from __future__ import annotations

import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import make_youtube_graph  # noqa: E402
from yt_scale_bench import YT  # noqa: E402

BATCH = 32768
HOIST = 8
KS = 128
STEPS_PER_CALL = 200  # outer scan steps per jit call (x HOIST micro)
CALLS = 3


def build():
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE
    from smore_tpu.sampling.banded import FUSED_BAND_SIZE, BandedTables

    g = Graph.load_edge_list(YT, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    bt = BandedTables.build(g, band_size=FUSED_BAND_SIZE, two_d=True)
    n_pad = bt.n_rows_padded
    state = {
        k: jnp.pad(v, ((0, n_pad - g.n_vertices), (0, 0)))
        for k, v in m.state.items()
    }
    return bt, state


def make_step(band, variant):
    from smore_tpu.ops.pallas_sgns_banded import sgns_banded_fused

    def micro(state, x, alpha):
        sb, db, src, pos, negs = x
        wv, wc = state["vertex"], state["context"]
        if variant == "draw":
            probe = (jnp.sum(src[:64]) + jnp.sum(pos[:64])).astype(
                jnp.float32)
            wv = wv.at[0, 0].add(probe * 1e-30)
            return {"vertex": wv, "context": wc}, probe
        D = wc.shape[1]
        ds = jax.lax.dynamic_slice(wc, (db, 0), (band, D))
        dsv = jax.lax.dynamic_slice(wv, (sb, 0), (band, D))
        if variant == "slice":
            ds = ds.at[0, 0].add(1e-30 * jnp.sum(src[:8]))
            dsv = dsv.at[0, 0].add(1e-30 * jnp.sum(pos[:8]))
            loss = jnp.float32(0.0)
        else:
            mode = {"kern_mem": "mem_only", "kern_nosc": "no_scatter",
                    "kern_full": "full", "full": "full"}[variant]
            cn = wc.at[negs].get(mode="promise_in_bounds")
            dsv, ds, d_neg, loss = sgns_banded_fused(
                dsv, ds, src - sb, pos - db, cn, alpha, k_equiv=5,
                mode=mode)
            if variant == "full":
                negs_l = negs - db
                in_b = (negs_l >= 0) & (negs_l < band)
                ds = ds.at[jnp.where(in_b, negs_l, band)].add(
                    d_neg, mode="drop")
                wc = wc.at[jnp.where(in_b, wc.shape[0], negs)].add(
                    d_neg, mode="drop")
        wc = jax.lax.dynamic_update_slice(wc, ds, (db, 0))
        wv = jax.lax.dynamic_update_slice(wv, dsv, (sb, 0))
        return {"vertex": wv, "context": wc}, loss

    def outer(state, bt, key):
        xs = bt.draw_banded_batches_hoisted(key, BATCH, 1, KS, HOIST)
        alphas = jnp.full((HOIST,), 0.025, jnp.float32)
        state, losses = jax.lax.scan(
            lambda st, x: micro(st, x[:5], x[5]),
            state, tuple(xs) + (alphas,),
        )
        return state, jnp.sum(losses)

    @jax.jit
    def run_call(state, bt, key):
        keys = jax.random.split(key, STEPS_PER_CALL)
        state, losses = jax.lax.scan(
            lambda st, k: outer(st, bt, k), state, keys)
        return state, jnp.sum(losses)

    return run_call


def main():
    make_youtube_graph(YT)
    bt, state0 = build()
    micro_per_call = STEPS_PER_CALL * HOIST
    for variant in ["draw", "slice", "kern_mem", "kern_nosc",
                    "kern_full", "full"]:
        state = {k: v for k, v in state0.items()}
        step = make_step(bt.band_size, variant)
        state, s = step(state, bt, jax.random.PRNGKey(0))
        float(s)  # compile + warm
        t0 = time.time()
        for c in range(CALLS):
            state, s = step(state, bt, jax.random.PRNGKey(c + 1))
        float(s)
        dt = (time.time() - t0) / (CALLS * micro_per_call)
        print(f"{variant:10s} {dt*1e6:8.1f} us/micro-step "
              f"({BATCH/dt/1e6:7.2f} M samples/s)", flush=True)


if __name__ == "__main__":
    main()
