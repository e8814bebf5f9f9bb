"""Component breakdown of the DMA multiblock superstep at YT scale.

Variants (b=2048, S=16, band 8200, Ks=128):
  draw    hoisted banded draws only
  kern    draws + multiblock kernel with a zero cn (no gather, no apply)
  cng     draws + cn gather + kernel (no negative apply)
  full    production step (deferred negative apply included)

Run on real TPU: python experiments/multiblock_breakdown.py
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

B, S, BAND, KS = 2048, 16, 8200, 128
STEPS_PER_CALL = 64  # supersteps per jit call
CALLS = 3


def build():
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE
    from smore_tpu.sampling.banded import BandedTables

    g = Graph.load_edge_list(YT, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    bt = BandedTables.build(g, band_size=BAND, two_d=True)
    n_pad = bt.n_rows_padded
    wv = jnp.pad(m.state["vertex"],
                 ((0, n_pad - g.n_vertices), (0, 0)))
    wc = jnp.pad(m.state["context"],
                 ((0, n_pad - g.n_vertices), (0, 0)))
    wvc = jnp.concatenate([wv, wc], axis=1)
    return bt, wvc


def make_run(bt, variant):
    from smore_tpu.ops.pallas_sgns_banded import sgns_banded_multiblock

    def super_step(wvc, key):
        sb, db, src, pos, negs = bt.draw_banded_batches_hoisted(
            key, B, 1, KS, S
        )
        if variant == "draw":
            probe = (jnp.sum(src[:, :64]) + jnp.sum(pos[:, :64])
                     + jnp.sum(sb) + jnp.sum(db)).astype(jnp.float32)
            return wvc.at[0, 0].add(probe * 1e-30), probe
        D = wvc.shape[1] // 2
        negs_flat = negs.reshape(-1)
        if variant == "kern":
            cn = jnp.zeros((S, KS, D), jnp.float32)
        else:
            cn = wvc.at[negs_flat].get(
                mode="promise_in_bounds"
            )[:, D:].reshape(S, KS, D)
        alphas = jnp.full((S,), 0.025, jnp.float32)
        wvc, d_neg, loss = sgns_banded_multiblock(
            wvc, sb // BAND, db // BAND, src - sb[:, None],
            pos - db[:, None], cn, alphas, band_size=BAND, k_equiv=5,
        )
        if variant == "full":
            d = jnp.concatenate(
                [jnp.zeros((S * KS, D), wvc.dtype),
                 d_neg.reshape(-1, D)], axis=1
            )
            wvc = wvc.at[negs_flat].add(d, mode="promise_in_bounds")
        return wvc, loss

    @jax.jit
    def run(wvc, key):
        keys = jax.random.split(key, STEPS_PER_CALL)
        wvc, losses = jax.lax.scan(super_step, wvc, keys)
        return wvc, jnp.sum(losses)

    return run


def main():
    make_youtube_graph(YT)
    bt, wvc0 = build()
    micro_per_call = STEPS_PER_CALL * S
    for variant in ["draw", "kern", "cng", "full"]:
        wvc = wvc0
        run = make_run(bt, variant)
        wvc, s = run(wvc, jax.random.PRNGKey(0))
        float(s)
        t0 = time.time()
        for c in range(CALLS):
            wvc, s = run(wvc, jax.random.PRNGKey(c + 1))
        float(s)
        dt = (time.time() - t0) / (CALLS * micro_per_call)
        print(f"{variant:6s} {dt * 1e6:8.1f} us/micro-step "
              f"({B / dt / 1e6:6.1f} M samples/s)", flush=True)


if __name__ == "__main__":
    main()
