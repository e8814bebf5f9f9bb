"""One-process perf sweep over SGNS step variants (real TPU).

Every variant is ONE fresh XLA executable; batching them into a single
process amortizes the axon-tunnel compile latency (2-7 min each, cached
across reruns in ~/.cache/smore_tpu_xla). See PERF_NOTES.md for the
measured baseline breakdown this sweep attacks:

    draws 0.82ms + gathers 0.16ms + MXU 0.03ms + scatters 1.38ms = 2.39ms

Variants:
  baseline   : current production step (sgns_shared_negs_step)
  concat     : ONE scatter per table (pos+negs indices concatenated) --
               tests whether XLA serializes per-scatter-op or per-row
  bf16       : tables stored bfloat16 (half the scatter/gather bytes),
               f32 compute via preferred_element_type
  group4/8   : draw B/G sources, G contexts each (walk-style batching);
               source-side gather+scatter shrink by G via an in-register
               segment-sum. Same conditional context law, same source
               marginal -- only the per-step stratification changes.
  g4bf16     : group4 + bf16 tables
  draw1d     : alias draws via separate 1-D prob/alias gathers instead of
               packed (N,2)/(E,4) rows (lane-waste hypothesis, PERF_NOTES)
  u32draw    : ONE uint32 random word per alias draw (top 24 bits -> slot,
               hashed low bits -> 16-bit threshold) instead of 2 f32
               uniforms; halves RNG volume and uniform materialization
  nodraws    : indices derived from iota (no RNG, no alias gathers) --
               lower-bound: what the step costs if draws were free
  iotascat   : draws + math as baseline but scatters use disjoint iota
               indices with unique_indices hints -- scatter ceiling probe
  sortscat   : sort+dedup the pos scatter (argsort, cumsum segment totals,
               unique-index scatter); src/neg scatters unchanged
  edge_g8_hoist : draws for ALL S scan steps hoisted into ONE mega-draw
               before the scan (draws are state-independent, so the law is
               bit-identical); inside the scan the step runs at nodraws
               cost. Tests whether per-row gather cost amortizes at
               30x the batch.
  edge_g8_hm : hoist + meta-repeat: the grouped path's vert_meta gather
               runs at src_small (B/G rows) and is repeated, instead of
               gathering the repeated (B,) src (identical by function
               composition).
Run: python experiments/perf_sgns.py  (real TPU; ~10-30 min first time)
"""

from __future__ import annotations

import functools
import sys
import time

import jax
import jax.numpy as jnp

sys.path.insert(0, "/root/repo")

from bench import GRAPH_PATH, make_graph  # noqa: E402
from smore_tpu.graph.graph import Graph  # noqa: E402
from smore_tpu.sampling.tables import SamplerTables  # noqa: E402

B = int(__import__("os").environ.get("PERF_B", 32768))
D = 64
KS = int(__import__("os").environ.get("PERF_KS", 128))
K_EQUIV = 5
S = 30  # scan steps per timed call
ALPHA = 0.025


def sigmoid(x):
    return jax.nn.sigmoid(x)


def grads_shared(v, cp, cn, alpha):
    """Common math: shared-negative SGNS deltas (f32)."""
    s_pos = sigmoid(jnp.einsum("bd,bd->b", v, cp))
    f_neg = jnp.dot(v, cn.T, preferred_element_type=jnp.float32)
    s_neg = sigmoid(f_neg)
    g_pos = (1.0 - s_pos) * alpha
    g_neg = (0.0 - s_neg) * (alpha * (K_EQUIV / KS))
    d_src = g_pos[:, None] * cp + jnp.dot(g_neg, cn, preferred_element_type=jnp.float32)
    d_pos = g_pos[:, None] * v
    d_neg = jnp.dot(g_neg.T, v, preferred_element_type=jnp.float32)
    return d_src, d_pos, d_neg


def draws_1d(tables, key):
    """Alias draws via separate 1-D prob/alias arrays (no packed rows)."""
    u = jax.random.uniform(key, (B, 6))
    n = tables.vertex_prob.shape[0]

    def g(a, i):
        return a.at[i].get(mode="promise_in_bounds")

    i = jnp.minimum((u[:, 0] * n).astype(jnp.int32), n - 1)
    src = jnp.where(u[:, 1] < g(tables.vertex_prob, i), i, g(tables.vertex_alias, i))
    off = g(tables.indptr, src)
    deg = g(tables.degree, src)
    r = (u[:, 2] * deg).astype(jnp.int32)
    slot = off + jnp.minimum(r, jnp.maximum(deg - 1, 0))
    pos_v = jnp.where(
        u[:, 3] < g(tables.ctx_prob, slot),
        g(tables.ctx_vid, slot),
        g(tables.ctx_alias_vid, slot),
    )
    pos = jnp.where(deg > 0, pos_v, src)
    j = jnp.minimum((u[:KS, 4] * n).astype(jnp.int32), n - 1)
    negs = jnp.where(u[:KS, 5] < g(tables.neg_prob, j), j, g(tables.neg_alias, j))
    return src, pos, negs


def draws_u32(tables, key):
    """ONE uint32 word per alias draw: top 24 bits -> slot (exact in f32),
    knuth-hashed bits -> 16-bit bernoulli threshold."""
    r = jax.random.bits(key, (B, 3))
    n = tables.vertex_prob.shape[0]

    def g(a, i):
        return a.at[i].get(mode="promise_in_bounds")

    def thresh(w):  # decorrelated 16-bit uniform in [0,1)
        return ((w * jnp.uint32(2654435761)) >> 16).astype(jnp.float32) * (1.0 / 65536.0)

    def top24(w):  # uniform [0,1) from top 24 bits, exact in f32
        return (w >> 8).astype(jnp.float32) * (1.0 / (1 << 24))

    i = jnp.minimum((top24(r[:, 0]) * n).astype(jnp.int32), n - 1)
    src = jnp.where(
        thresh(r[:, 0]) < g(tables.vertex_prob, i), i, g(tables.vertex_alias, i)
    )
    off = g(tables.indptr, src)
    deg = g(tables.degree, src)
    slot = off + jnp.minimum(
        (top24(r[:, 1]) * deg).astype(jnp.int32), jnp.maximum(deg - 1, 0)
    )
    pos_v = jnp.where(
        thresh(r[:, 1]) < g(tables.ctx_prob, slot),
        g(tables.ctx_vid, slot),
        g(tables.ctx_alias_vid, slot),
    )
    pos = jnp.where(deg > 0, pos_v, src)
    j = jnp.minimum((top24(r[:KS, 2]) * n).astype(jnp.int32), n - 1)
    negs = jnp.where(
        thresh(r[:KS, 2]) < g(tables.neg_prob, j), j, g(tables.neg_alias, j)
    )
    return src, pos, negs


def draws_hash(key, n):
    """No-RNG-table draws: pure integer hash indices (floor probe)."""
    base = jax.random.bits(key, (3,))
    h = jnp.arange(B, dtype=jnp.uint32)[:, None] * jnp.uint32(2654435761) + base
    idx = (h % jnp.uint32(n)).astype(jnp.int32)
    return idx[:, 0], idx[:, 1], idx[:KS, 2]


def sorted_unique_scatter(w, idx, delta):
    """Sort -> run-total via cumsum -> scatter at unique ids only."""
    n = w.shape[0]
    Bn = idx.shape[0]
    order = jnp.argsort(idx)
    sp = idx.at[order].get(mode="promise_in_bounds")
    sd = delta.at[order].get(mode="promise_in_bounds")
    c = jnp.cumsum(sd, axis=0)
    change = sp[1:] != sp[:-1]
    is_end = jnp.concatenate([change, jnp.ones((1,), bool)])
    seg_start = jnp.concatenate([jnp.ones((1,), bool), change])
    iota = jnp.arange(Bn)
    run_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(seg_start, iota, -1)
    )
    prev = run_start - 1
    cprev = jnp.where(
        (prev >= 0)[:, None],
        c.at[jnp.maximum(prev, 0)].get(mode="promise_in_bounds"),
        0.0,
    )
    tot = jnp.where(is_end[:, None], c - cprev, 0.0).astype(w.dtype)
    ids = jnp.where(is_end, sp, n + iota)  # padding ids unique + OOB
    return w.at[ids].add(tot, mode="drop", unique_indices=True)


def draws_two_stage(tables, key):
    """The pre-edge-table production path (source -> context -> negs)."""
    u = jax.random.uniform(key, (B, 6))
    src = tables.source_sample(key, (B,), u2=u[:, 0:2])
    pos = tables.target_sample(key, src, u2=u[:, 2:4])
    negs = tables.negative_sample(key, (KS,), u2=u[:KS, 4:6])
    return src, pos, negs


def hoisted_grouped_draw(tables, key, total, G, n_negs, meta_small=False):
    """draw_edge_batch_grouped for ``total`` samples in one shot; with
    meta_small, the per-vertex meta gather runs at the src_small size and
    is repeated (identical: meta is a pure function of src)."""
    bg = total // G
    u = jax.random.uniform(key, (total, 4))
    src_small, pos0 = tables.edge_sample(key, (bg,), u2=u[:bg, 0:2])
    src = jnp.repeat(src_small, G)
    if meta_small:
        meta = tables.vert_meta.at[src_small].get(mode="promise_in_bounds")
        meta = jnp.repeat(meta, G, axis=0)
        off, deg = meta[:, 0], meta[:, 1]
        u2 = u[:, 2:4]
        r = (u2[:, 0] * deg).astype(jnp.int32)
        slot = off + jnp.minimum(r, jnp.maximum(deg - 1, 0))
        row = tables.ctx_pa.at[slot].get(mode="promise_in_bounds")
        out = jnp.where(u2[:, 1] < row[:, 0], row[:, 1], row[:, 2])
        pos = jnp.where(deg > 0, out.astype(jnp.int32), src)
    else:
        pos = tables.target_sample(key, src, u2=u[:, 2:4])
    pos = pos.at[::G].set(pos0)
    negs = tables.negative_sample(key, (n_negs,), u2=u[bg : bg + n_negs, 0:2])
    return src, pos, negs


def make_step(tables_outer, variant):
    def draws(tables, key):
        if variant.startswith("edge"):
            return tables.draw_edge_batch(key, B, KS)  # joint edge table
        return draws_two_stage(tables, key)

    n_v = tables_outer.vertex_prob.shape[0]

    G = {
        "group4": 4, "group8": 8, "g4bf16": 4,
        "edge_g8": 8, "edge_g16": 16, "edge_g32": 32, "edge_g8p": 8,
        "edge_g8_bf16": 8, "edge_g8_hoist": 8, "edge_g8_hm": 8,
    }.get(variant, 1)
    hoisted = variant in ("edge_g8_hoist", "edge_g8_hm")

    def step_t(state, tables, key, pre=None):
        wv, wc = state
        cast = functools.partial(jnp.asarray, dtype=wv.dtype)

        if pre is not None:
            src, pos, negs = pre
        elif variant.startswith("edge_g"):
            src, pos, negs = tables.draw_edge_batch_grouped(key, B, G, KS)
        elif G > 1:
            u = jax.random.uniform(key, (B, 6))
            src_small = tables.source_sample(key, (B // G,), u2=u[: B // G, 0:2])
            src = jnp.repeat(src_small, G)
            pos = tables.target_sample(key, src, u2=u[:, 2:4])
            negs = tables.negative_sample(key, (KS,), u2=u[:KS, 4:6])
        elif variant == "draw1d":
            src, pos, negs = draws_1d(tables, key)
        elif variant == "u32draw":
            src, pos, negs = draws_u32(tables, key)
        elif variant == "nodraws":
            src, pos, negs = draws_hash(key, n_v)
        else:
            src, pos, negs = draws(tables, key)

        v = wv.at[src].get(mode="promise_in_bounds").astype(jnp.float32)
        cp = wc.at[pos].get(mode="promise_in_bounds").astype(jnp.float32)
        cn = wc.at[negs].get(mode="promise_in_bounds").astype(jnp.float32)
        if variant in ("edge_pallas", "edge_g8p"):
            from smore_tpu.ops.pallas_sgns import sgns_shared_grads_pallas

            d_src, d_pos, d_neg = sgns_shared_grads_pallas(
                v, cp, cn, ALPHA, k_equiv=K_EQUIV
            )
        else:
            d_src, d_pos, d_neg = grads_shared(v, cp, cn, ALPHA)

        if variant == "iotascat":
            # scatter-CEILING probe: same math, but write to disjoint
            # unique rows (shifted iota) with the uniqueness hint
            off = jax.random.randint(key, (), 0, n_v)
            ui = (jnp.arange(B) + off) % n_v
            wc = wc.at[ui].add(cast(d_pos), unique_indices=True)
            wc = wc.at[(jnp.arange(KS) + off) % n_v].add(
                cast(d_neg), unique_indices=True
            )
            wv = wv.at[ui].add(cast(d_src), unique_indices=True)
        elif variant == "sortscat":
            wc = sorted_unique_scatter(wc, pos, d_pos)
            wc = wc.at[negs].add(cast(d_neg), mode="promise_in_bounds")
            wv = sorted_unique_scatter(wv, src, d_src)
        elif G > 1 or variant in ("concat", "bf16"):
            # ONE scatter per table
            ctx_idx = jnp.concatenate([pos, negs])
            ctx_delta = cast(jnp.concatenate([d_pos, d_neg], axis=0))
            wc = wc.at[ctx_idx].add(ctx_delta, mode="promise_in_bounds")
            if G > 1:
                d_src_small = cast(d_src.reshape(B // G, G, D).sum(axis=1))
                wv = wv.at[src[::G]].add(d_src_small, mode="promise_in_bounds")
            else:
                wv = wv.at[src].add(cast(d_src), mode="promise_in_bounds")
        else:  # baseline / draw variants: 3 separate scatters
            wc = wc.at[pos].add(cast(d_pos), mode="promise_in_bounds")
            wc = wc.at[negs].add(cast(d_neg), mode="promise_in_bounds")
            wv = wv.at[src].add(cast(d_src), mode="promise_in_bounds")
        return (wv, wc), jnp.sum(d_src[0])

    def call(state, tables, key):
        if hoisted:
            # ONE mega-draw for all S steps (draws are state-independent,
            # so hoisting preserves the law bit-for-bit); the scan body
            # then runs at nodraws cost over pre-sliced index rows.
            key, kd = jax.random.split(key)
            src_a, pos_a, negs_a = hoisted_grouped_draw(
                tables, kd, B * S, G, KS * S,
                meta_small=(variant == "edge_g8_hm"),
            )
            xs = (
                src_a.reshape(S, B),
                pos_a.reshape(S, B),
                negs_a.reshape(S, KS),
            )

            def body_h(carry, x):
                state, key = carry
                key, sub = jax.random.split(key)
                state, out = step_t(state, tables, sub, pre=x)
                return (state, key), out

            (state, key), outs = jax.lax.scan(body_h, (state, key), xs)
            return state, key, jnp.sum(outs)

        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            state, x = step_t(state, tables, sub)
            return (state, key), x

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, key, jnp.sum(xs)

    return jax.jit(call, donate_argnums=(0,))


def run_variant(name, tables, n, dtype):
    key = jax.random.PRNGKey(0)
    wv = jax.random.uniform(jax.random.PRNGKey(1), (n, D), dtype=jnp.float32) * 0.01
    state = (wv.astype(dtype), jnp.zeros((n, D), dtype=dtype))
    call = make_step(tables, name)
    t0 = time.time()
    state, key, x = call(state, tables, key)
    float(x)  # forces completion through the tunnel
    compile_s = time.time() - t0
    # timed: 4 calls, data-dependent chain via donated state
    t0 = time.time()
    for _ in range(4):
        state, key, x = call(state, tables, key)
    float(x)
    dt = (time.time() - t0) / (4 * S)
    rate = B / dt
    print(
        f"{name:10s}  {dt*1e3:7.3f} ms/step  {rate/1e6:7.2f} M samples/s"
        f"   (compile+warm {compile_s:.0f}s)",
        flush=True,
    )
    return rate


def main():
    # PERF_GRAPH overrides the workload graph (e.g. the 1.1M-vertex
    # /tmp/yt_scale_net.txt from experiments/microf1_scale.py) to probe
    # HBM-bound behavior at scale; default = the 50k bench graph.
    os_ = __import__("os")
    path = os_.environ.get("PERF_GRAPH", GRAPH_PATH)
    if path == GRAPH_PATH:
        make_graph(GRAPH_PATH)
    g = Graph.load_edge_list(path, undirected=True)
    if os_.environ.get("PERF_RELABEL"):
        from relabel_locality import relabel_by_degree

        g = relabel_by_degree(g)
        print("relabeled by degree (hot rows at low vids)")
    tables = SamplerTables.build(g)
    n = g.n_vertices
    print(f"graph: {n} vertices, {g.n_edges} edges; B={B} Ks={KS} D={D} S={S}")
    results = {}
    want = sys.argv[1:] or None
    for name, dtype in [
        ("edge", jnp.float32),
        ("edge_bf16", jnp.bfloat16),
        ("edge_g8", jnp.float32),
        ("edge_g8_hoist", jnp.float32),
        ("edge_g8_hm", jnp.float32),
        ("edge_g8_bf16", jnp.bfloat16),
        ("edge_g16", jnp.float32),
        ("edge_g32", jnp.float32),
        ("edge_g8p", jnp.float32),
        ("edge_pallas", jnp.float32),
        ("baseline", jnp.float32),
        ("nodraws", jnp.float32),
        ("iotascat", jnp.float32),
        ("draw1d", jnp.float32),
        ("u32draw", jnp.float32),
        ("sortscat", jnp.float32),
        ("concat", jnp.float32),
        ("bf16", jnp.bfloat16),
        ("group4", jnp.float32),
        ("group8", jnp.float32),
        ("g4bf16", jnp.bfloat16),
    ]:
        if want and name not in want:
            continue
        try:
            results[name] = run_variant(name, tables, n, dtype)
        except Exception as e:  # keep sweeping past a broken variant
            print(f"{name:10s}  FAILED: {type(e).__name__}: {e}", flush=True)
    if results:
        best = max(results, key=results.get)
        print(f"best: {best} at {results[best]/1e6:.2f} M samples/s")
    else:
        print("no variants ran (unknown name or all failed)")


if __name__ == "__main__":
    main()
