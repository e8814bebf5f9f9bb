"""On-device batched walk generators.

Reference semantics (all in /root/reference/src/proNet.cpp unless noted):
  - RandomWalk (proNet.cpp:704-724): fixed-length walk; on a dead end
    (branch == 0) the cursor resets to the start vertex and continues, so
    the walk always has ``steps + 1`` entries unless the START itself is a
    dead end (then it has length 1 -> here: an all-start row that callers
    mask via ``row_mask``).
  - JumpingRandomWalk (proNet.cpp:685-702): walk until a geometric coin
    (stop prob = ``jump``) or a dead end; the dead-end vertex stays the
    final element. Here: a fixed-length NON-restarting walk (the cursor
    freezes on dead ends because TargetSample(v)=v for branch==0) plus a
    per-row geometric stop index -- endpoint = walk[row, stop].
  - node2vec biased 2nd-order walk (Go reference
    /root/reference/internal/models/node2vec/node2vec.go:82-175): next
    neighbor weighted by edge_weight * bias, bias = 1/p if returning to
    prev, 1 if candidate is a neighbor of prev, 1/q otherwise. The Go code
    scans the whole neighbor list per step (O(degree)); here we use alias
    draws + REJECTION sampling (accept prob = bias / max_bias), the
    standard O(1)-per-trial formulation for accelerators, with a capped
    trial count (the last candidate is taken if all trials reject -- a
    bounded bias toward the unbiased walk, vanishing with more trials).

All functions are shape-static and jit/scan-safe: walks come back as a
dense (B, steps+1) int32 matrix.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.sampling.tables import SamplerTables


def random_walk(
    tables: SamplerTables,
    key: jax.Array,
    starts: jnp.ndarray,  # (B,) int32
    steps: int,
    restart_on_deadend: bool = True,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched proNet::RandomWalk. Returns (walk (B, steps+1) int32,
    row_mask (B,) float32 -- 0 where the start vertex has no out-edges)."""
    deg0 = tables.vert_meta.at[starts].get(mode="promise_in_bounds")[..., 1]
    row_mask = (deg0 > 0).astype(jnp.float32)

    # One uniform tensor for the whole walk: (steps, B, 2).
    u = jax.random.uniform(key, (steps,) + tuple(starts.shape) + (2,))

    def body(cur, u_t):
        if restart_on_deadend:
            deg = tables.vert_meta.at[cur].get(mode="promise_in_bounds")[..., 1]
            cur = jnp.where(deg > 0, cur, starts)
        nxt = tables.target_sample(None, cur, u2=u_t)
        return nxt, nxt

    _, path = jax.lax.scan(body, starts, u)
    walk = jnp.concatenate([starts[None], path], axis=0)  # (steps+1, B)
    return jnp.swapaxes(walk, 0, 1), row_mask


def jumping_walk_endpoints(
    tables: SamplerTables,
    key: jax.Array,
    starts: jnp.ndarray,  # (B,)
    jump: float,
    max_steps: int = 64,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched proNet::JumpingRandomWalk reduced to what APP consumes:
    the (start, endpoint) pair (src/model/APP.cpp:100-101 uses only
    walk[0] and walk.back()). Returns (endpoints (B,), row_mask (B,))."""
    k_w, k_g = jax.random.split(key)
    walk, row_mask = random_walk(
        tables, k_w, starts, max_steps, restart_on_deadend=False
    )
    # stop index t = 1 + Geometric(jump) continuations, clamped to max_steps.
    # (The reference always takes >= 1 step before flipping the coin.)
    u = jnp.clip(jax.random.uniform(k_g, starts.shape), 1e-12, 1.0)
    cont = jnp.floor(jnp.log(u) / np.log(max(1.0 - jump, 1e-12)))
    t = jnp.clip(1 + cont.astype(jnp.int32), 1, max_steps)
    # Dead ends freeze the cursor, so walk[t] is already the dead-end
    # vertex whenever the walk died before t (matches walk.back()).
    end = jnp.take_along_axis(walk, t[:, None], axis=1)[:, 0]
    return end, row_mask


# --------------------------------------------------------------------- #
# node2vec second-order walk
# --------------------------------------------------------------------- #
@jax.tree_util.register_pytree_node_class
class NeighborIndex:
    """Sorted-adjacency membership index: is ``b`` a neighbor of ``a``?

    Answered on device with a fixed-iteration binary search over the
    per-row sorted neighbor slice (the Go reference's areNeighbors linear
    scan, node2vec.go:167-175)."""

    def __init__(self, indptr, sorted_nbrs, n_iters: int):
        self.indptr = indptr
        self.sorted_nbrs = sorted_nbrs
        self.n_iters = n_iters

    def tree_flatten(self):
        return (self.indptr, self.sorted_nbrs), self.n_iters

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(children[0], children[1], aux)

    @staticmethod
    def build(graph) -> "NeighborIndex":
        indptr = np.asarray(graph.indptr, dtype=np.int64)
        row_id = np.repeat(
            np.arange(graph.n_vertices, dtype=np.int64), np.diff(indptr)
        )
        order = np.lexsort((graph.indices, row_id))  # sort within each row
        sorted_nbrs = np.asarray(graph.indices)[order]
        max_deg = int(np.max(np.diff(indptr))) if len(indptr) > 1 else 1
        n_iters = max(1, int(np.ceil(np.log2(max(max_deg, 2)))) + 1)
        return NeighborIndex(
            jnp.asarray(indptr, dtype=jnp.int32),
            jnp.asarray(sorted_nbrs, dtype=jnp.int32),
            n_iters,
        )

    def contains(self, a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
        """Elementwise: b in neighbors(a). Shapes broadcast; returns bool."""
        lo = self.indptr.at[a].get(mode="promise_in_bounds")
        hi = self.indptr.at[a + 1].get(mode="promise_in_bounds")
        e = self.sorted_nbrs.shape[0]
        for _ in range(self.n_iters):
            mid = (lo + hi) // 2
            val = self.sorted_nbrs.at[jnp.minimum(mid, e - 1)].get(
                mode="promise_in_bounds"
            )
            go_right = (val < b) & (mid < hi)
            lo = jnp.where(go_right, mid + 1, lo)
            hi = jnp.where(go_right, hi, mid)
        val = self.sorted_nbrs.at[jnp.minimum(lo, e - 1)].get(
            mode="promise_in_bounds"
        )
        return (lo < self.indptr.at[a + 1].get(mode="promise_in_bounds")) & (
            val == b
        )


def node2vec_walk(
    tables: SamplerTables,
    nbr: NeighborIndex,
    key: jax.Array,
    starts: jnp.ndarray,  # (B,)
    steps: int,
    p: float = 1.0,
    q: float = 1.0,
    trials: int = 4,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Batched 2nd-order biased walk via alias-draw + rejection.

    Per step, per row: draw up to ``trials`` candidates from the
    first-order alias table; accept with prob bias/max_bias where bias is
    the node2vec factor. The first accepted candidate is kept (the last
    one if none accepts). p=q=1 reduces to random_walk exactly (every
    candidate accepts)."""
    inv_p, inv_q = 1.0 / p, 1.0 / q
    max_bias = max(inv_p, 1.0, inv_q)

    deg0 = tables.vert_meta.at[starts].get(mode="promise_in_bounds")[..., 1]
    row_mask = (deg0 > 0).astype(jnp.float32)

    B = starts.shape[0]
    u_first = jax.random.uniform(key, (B, 2))
    first = tables.target_sample(None, starts, u2=u_first)
    # (steps-1, B, trials, 3): per-trial (u_idx, u_alias, u_accept)
    u = jax.random.uniform(
        jax.random.fold_in(key, 1), (max(steps - 1, 0), B, trials, 3)
    )

    def body(carry, u_t):
        prev, cur = carry
        deg = tables.vert_meta.at[cur].get(mode="promise_in_bounds")[..., 1]
        cur_eff = jnp.where(deg > 0, cur, starts)  # restart like RandomWalk

        chosen = jnp.zeros((B,), dtype=jnp.int32)
        done = jnp.zeros((B,), dtype=bool)
        for t in range(trials):
            cand = tables.target_sample(None, cur_eff, u2=u_t[:, t, 0:2])
            bias = jnp.where(
                cand == prev,
                inv_p,
                jnp.where(nbr.contains(prev, cand), 1.0, inv_q),
            )
            accept = (u_t[:, t, 2] * max_bias < bias) | (t == trials - 1)
            take = accept & ~done
            chosen = jnp.where(take, cand, chosen)
            done = done | accept
        return (cur_eff, chosen), chosen

    if steps <= 1:
        walk = jnp.stack([starts, first], axis=1)[:, : steps + 1]
        return walk, row_mask

    (_, _), path = jax.lax.scan(body, (starts, first), u)
    walk = jnp.concatenate(
        [starts[None], first[None], path], axis=0
    )  # (steps+1, B)
    return jnp.swapaxes(walk, 0, 1), row_mask
