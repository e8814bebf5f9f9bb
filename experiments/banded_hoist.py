"""Banded + hoisted draws at Youtube scale (real TPU).

The 50k-graph hoist (draws for S consecutive batches as ONE mega-draw
before an inner scan) bought 19.1 -> 27.8 M samples/s. The banded path's
draws are equally state-independent (band alias + within-band slot draws
+ global negatives), so the same transform applies: draw S strata and
S*batch slot rows in one shot, then scan the banded update over the S
pre-sliced batches with per-step band starts.

Run: python experiments/banded_hoist.py [S ...]   (default 1 8 16 32)
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from bench import YT_GRAPH_PATH, make_youtube_graph

B, D, Ks, NEGK = 32768, 64, 128, 5
CALL_STEPS = 960  # total inner update batches per timed call


def hoisted_banded_draw(bt, key, batch, group, n_negs, steps):
    """steps x draw_banded_batch in one shot; identical law (all draws
    are state-independent). Returns (sb, db, src, pos, negs) with a
    leading (steps,) axis."""
    bg = batch // group
    kb, ku, kn = jax.random.split(key, 3)

    ub = jax.random.uniform(kb, (steps, 2))
    ns = bt.band_pa.shape[0]
    i = jnp.minimum((ub[:, 0] * ns).astype(jnp.int32), ns - 1)
    brow = bt.band_pa.at[i].get(mode="promise_in_bounds")
    s = jnp.where(ub[:, 1] < brow[:, 0], i, brow[:, 1].astype(jnp.int32))
    meta = bt.band_meta.at[s].get(mode="promise_in_bounds")
    off, cnt = meta[:, 0], meta[:, 1]
    if bt.two_d:
        sb = (s // bt.n_bands) * bt.band_size
        db = (s % bt.n_bands) * bt.band_size
    else:
        sb = jnp.zeros((steps,), jnp.int32)
        db = s * bt.band_size

    u = jax.random.uniform(ku, (steps, batch, 4))
    r = (u[:, :bg, 0] * cnt[:, None].astype(jnp.float32)).astype(jnp.int32)
    slot = off[:, None] + jnp.minimum(r, jnp.maximum(cnt[:, None] - 1, 0))
    row = bt.edge_pa.at[slot.reshape(-1)].get(
        mode="promise_in_bounds"
    ).reshape(steps, bg, -1)
    take = (u[:, :bg, 1] < row[:, :, 0])[:, :, None]
    picked = jnp.where(take, row[:, :, 1:5], row[:, :, 5:9])
    src_small = picked[:, :, 0].astype(jnp.int32)
    pos0 = picked[:, :, 1].astype(jnp.int32)

    if group == 1:
        src, pos = src_small, pos0
    else:
        seg_off = picked[:, :, 2].astype(jnp.int32)
        seg_deg = picked[:, :, 3].astype(jnp.int32)
        src = jnp.repeat(src_small, group, axis=1)
        so = jnp.repeat(seg_off, group, axis=1)
        sd = jnp.repeat(seg_deg, group, axis=1)
        rr = (u[:, :, 2] * sd.astype(jnp.float32)).astype(jnp.int32)
        cslot = so + jnp.minimum(rr, jnp.maximum(sd - 1, 0))
        crow = bt.ctx_pa.at[cslot.reshape(-1)].get(
            mode="promise_in_bounds"
        ).reshape(steps, batch, -1)
        pos = jnp.where(u[:, :, 3] < crow[:, :, 0], crow[:, :, 1],
                        crow[:, :, 2]).astype(jnp.int32)
        pos = pos.at[:, ::group].set(pos0)

    un = jax.random.uniform(kn, (steps, n_negs, 2))
    n = bt.neg_pa.shape[0]
    j = jnp.minimum((un[:, :, 0] * n).astype(jnp.int32), n - 1)
    nrow = bt.neg_pa.at[j.reshape(-1)].get(
        mode="promise_in_bounds"
    ).reshape(steps, n_negs, -1)
    negs = jnp.where(un[:, :, 1] < nrow[:, :, 0], j,
                     nrow[:, :, 1].astype(jnp.int32))
    return sb, db, src, pos, negs


def make_call(bt, hoist, group, pallas_scatter=False):
    from smore_tpu.ops.update import sgns_shared_negs_step_banded

    band_size = bt.band_size
    two_d = bt.two_d
    S_outer = CALL_STEPS // hoist

    def inner(state, x, alpha):
        sb, db, src, pos, negs = x
        wv, wc, loss = sgns_shared_negs_step_banded(
            state["vertex"], state["context"], db, band_size,
            src, pos, negs, alpha, k_equiv=NEGK, src_group=group,
            src_band_start=sb if two_d else None,
            pallas_scatter=pallas_scatter,
        )
        return {"vertex": wv, "context": wc}, loss

    def call(state, bt, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            if hoist == 1:
                x = bt.draw_banded_batch(sub, B, group, Ks)
                state, loss = inner(state, x, 0.0125)
            else:
                xs = hoisted_banded_draw(bt, sub, B, group, Ks, hoist)

                def hbody(st, x):
                    return inner(st, x, 0.0125)

                state, losses = jax.lax.scan(hbody, state, xs)
                loss = jnp.mean(losses)
            return (state, key), loss

        (state, key), losses = jax.lax.scan(
            body, (state, key), None, length=S_outer
        )
        return state, jnp.mean(losses)

    return jax.jit(call, donate_argnums=(0,))


def main():
    # args: hoist counts; a "pN" arg adds a pallas-scatter arm at hoist N
    pallas_arms = [int(a[1:]) for a in sys.argv[1:] if a.startswith("p")]
    hoists = [int(a) for a in sys.argv[1:] if not a.startswith("p")] or (
        [] if pallas_arms else [1, 8, 16, 32]
    )
    make_youtube_graph(YT_GRAPH_PATH)
    from smore_tpu.graph.graph import Graph
    from smore_tpu.sampling.banded import BandedTables

    g = Graph.load_edge_list(YT_GRAPH_PATH, undirected=True)
    print(f"graph: {g.n_vertices} vertices, {g.n_edges} directed edges",
          flush=True)
    t0 = time.time()
    bt = BandedTables.build(g, two_d=True)
    print(f"banded build: {time.time() - t0:.1f}s "
          f"({bt.n_bands} bands, pad {bt.n_rows_padded})", flush=True)
    group = 1  # the production YT config (reference-exact source law)

    arms = [(h, False) for h in hoists] + [(h, True) for h in pallas_arms]
    for hoist, use_pallas in arms:
        key = jax.random.PRNGKey(0)
        state = {
            "vertex": jax.random.uniform(
                key, (bt.n_rows_padded, D), jnp.float32, -0.5 / D, 0.5 / D
            ),
            "context": jnp.zeros((bt.n_rows_padded, D), jnp.float32),
        }
        call = make_call(bt, hoist, group, use_pallas)
        t0 = time.time()
        state, loss = call(state, bt, key)
        float(loss)
        comp = time.time() - t0
        t0 = time.time()
        reps = 3
        for r in range(reps):
            state, loss = call(state, bt, jax.random.fold_in(key, r))
        float(loss)
        dt = (time.time() - t0) / reps
        rate = CALL_STEPS * B / dt
        tag = "+pallas_scat" if use_pallas else ""
        print(f"hoist={hoist:3d}{tag:13s} {dt / CALL_STEPS * 1e3:7.3f} "
              f"ms/step  {rate / 1e6:7.2f} M samples/s  "
              f"(compile {comp:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
