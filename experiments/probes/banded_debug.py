"""Locate the gap between band_probe's 1.29 ms full-step projection and
the production banded LINE step's measured ~4.4 ms (7.4 M samples/s).

Variants (one process, shared compile cache):
  draws      scan of draw_banded_batch alone (trivial consumer)
  synth      production banded step, draws replaced by randint
  prod       production banded step (draw_banded_batch + banded update)
  prod_nopad  prod but state tables NOT donated? (sanity)
Run: python experiments/banded_debug.py   (real TPU)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import make_youtube_graph
from smore_tpu.graph.graph import Graph
from smore_tpu.ops.update import sgns_shared_negs_step_banded
from smore_tpu.sampling.banded import BandedTables

YT = "/tmp/yt_faithful_net.txt"
B, D, Ks, G, S = 32768, 64, 128, 8, 30


def timed(name, call, state, *args):
    t0 = time.time()
    out = call(state, *args)
    float(out[-1])
    comp = time.time() - t0
    state = out[0]
    t0 = time.time()
    for _ in range(4):
        out = call(state, *args)
        state = out[0]
    float(out[-1])
    dt = (time.time() - t0) / (4 * S)
    print(f"{name:12s} {dt*1e3:8.3f} ms/step  {B/dt/1e6:7.2f} M/s"
          f"   ({comp:.0f}s compile)", flush=True)


def main():
    make_youtube_graph(YT)
    g = Graph.load_edge_list(YT, undirected=True)
    bt = BandedTables.build(g, band_size=32768)
    n_pad = bt.n_rows_padded
    band = bt.band_size
    print(f"n={g.n_vertices} e={g.n_edges} n_pad={n_pad} "
          f"bands={bt.n_bands}", flush=True)

    key = jax.random.PRNGKey(0)
    wv0 = jax.random.uniform(jax.random.PRNGKey(1), (n_pad, D)) * 0.01
    wc0 = jnp.zeros((n_pad, D))

    # (1) draws alone
    def draws_only(acc, bt, key):
        def body(carry, _):
            acc, key = carry
            key, sub = jax.random.split(key)
            bs, src, pos, negs = bt.draw_banded_batch(sub, B, G, Ks)
            return (acc + bs + src[0] + pos[0] + negs[0], key), None

        (acc, key), _ = jax.lax.scan(body, (acc, key), None, length=S)
        return acc, acc

    call = jax.jit(draws_only)
    timed("draws", call, jnp.int32(0), bt, key)

    # (2) production step with synthetic draws
    def synth(state, key):
        def body(carry, _):
            (wv, wc), key = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            bs = jax.random.randint(k1, (), 0, bt.n_bands) * band
            src = jnp.repeat(
                jax.random.randint(k2, (B // G,), 0, g.n_vertices), G
            )
            pos = bs + jax.random.randint(k3, (B,), 0, band)
            negs = jax.random.randint(k4, (Ks,), 0, g.n_vertices)
            wv, wc, loss = sgns_shared_negs_step_banded(
                wv, wc, bs, band, src, pos, negs, jnp.float32(0.025),
                src_group=G,
            )
            return ((wv, wc), key), loss

        (state, key), losses = jax.lax.scan(body, (state, key), None,
                                            length=S)
        return state, losses.sum()

    call = jax.jit(synth, donate_argnums=(0,))
    timed("synth", call, (wv0, wc0), key)

    # (3) full production step
    def prod(state, bt, key):
        def body(carry, _):
            (wv, wc), key = carry
            key, sub = jax.random.split(key)
            bs, src, pos, negs = bt.draw_banded_batch(sub, B, G, Ks)
            wv, wc, loss = sgns_shared_negs_step_banded(
                wv, wc, bs, band, src, pos, negs, jnp.float32(0.025),
                src_group=G,
            )
            return ((wv, wc), key), loss

        (state, key), losses = jax.lax.scan(body, (state, key), None,
                                            length=S)
        return state, losses.sum()

    call = jax.jit(prod, donate_argnums=(0,))
    wv1 = jax.random.uniform(jax.random.PRNGKey(2), (n_pad, D)) * 0.01
    timed("prod", call, (wv1, jnp.zeros((n_pad, D))), bt, key)


if __name__ == "__main__":
    main()
