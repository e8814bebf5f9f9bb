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

B = 32768
D = 64
KS = 128
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


def make_step(tables, variant):
    def draws(key):
        return tables.draw_edge_batch(key, B, KS)

    G = {"group4": 4, "group8": 8, "g4bf16": 4}.get(variant, 1)

    def step(state, key):
        wv, wc = state
        cast = functools.partial(jnp.asarray, dtype=wv.dtype)

        if G > 1:
            u = jax.random.uniform(key, (B, 6))
            src_small = tables.source_sample(key, (B // G,), u2=u[: B // G, 0:2])
            src = jnp.repeat(src_small, G)
            pos = tables.target_sample(key, src, u2=u[:, 2:4])
            negs = tables.negative_sample(key, (KS,), u2=u[:KS, 4:6])
        else:
            src, pos, negs = draws(key)

        v = wv.at[src].get(mode="promise_in_bounds").astype(jnp.float32)
        cp = wc.at[pos].get(mode="promise_in_bounds").astype(jnp.float32)
        cn = wc.at[negs].get(mode="promise_in_bounds").astype(jnp.float32)
        d_src, d_pos, d_neg = grads_shared(v, cp, cn, ALPHA)

        if variant != "baseline":
            # ONE scatter per table
            ctx_idx = jnp.concatenate([pos, negs])
            ctx_delta = cast(jnp.concatenate([d_pos, d_neg], axis=0))
            wc = wc.at[ctx_idx].add(ctx_delta, mode="promise_in_bounds")
            if G > 1:
                d_src_small = cast(d_src.reshape(B // G, G, D).sum(axis=1))
                wv = wv.at[src[::G]].add(d_src_small, mode="promise_in_bounds")
            else:
                wv = wv.at[src].add(cast(d_src), mode="promise_in_bounds")
        else:  # baseline: 3 separate scatters
            wc = wc.at[pos].add(cast(d_pos), mode="promise_in_bounds")
            wc = wc.at[negs].add(cast(d_neg), mode="promise_in_bounds")
            wv = wv.at[src].add(cast(d_src), mode="promise_in_bounds")
        return (wv, wc), jnp.sum(d_src[0])

    def call(state, key):
        def body(carry, _):
            state, key = carry
            key, sub = jax.random.split(key)
            state, x = step(state, sub)
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
    state, key, x = call(state, key)
    float(x)  # forces completion through the tunnel
    compile_s = time.time() - t0
    # timed: 4 calls, data-dependent chain via donated state
    t0 = time.time()
    for _ in range(4):
        state, key, x = call(state, key)
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
    make_graph(GRAPH_PATH)
    g = Graph.load_edge_list(GRAPH_PATH, undirected=True)
    tables = SamplerTables.build(g)
    n = g.n_vertices
    print(f"graph: {n} vertices, {g.n_edges} edges; B={B} Ks={KS} D={D} S={S}")
    results = {}
    for name, dtype in [
        ("baseline", jnp.float32),
        ("concat", jnp.float32),
        ("bf16", jnp.bfloat16),
        ("group4", jnp.float32),
        ("group8", jnp.float32),
        ("g4bf16", jnp.bfloat16),
    ]:
        results[name] = run_variant(name, tables, n, dtype)
    best = max(results, key=results.get)
    print(f"best: {best} at {results[best]/1e6:.2f} M samples/s")


if __name__ == "__main__":
    main()
