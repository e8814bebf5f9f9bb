"""Sampler tables: host-built alias tables packaged as device arrays,
with on-device batched draw functions.

Replaces the reference's per-sample O(1) CPU draws
(proNet::SourceSample/TargetSample/NegativeSample,
/root/reference/src/proNet.cpp:623-683) with batched gathers that run
inside the jitted training step on TPU. A draw is:

    i ~ U{0..n-1};  u ~ U[0,1);  out = where(u < prob[i], value[i], alias[i])

i.e. two gathers + a select, fully vectorized over the batch.

Method strings mirror the reference (proNet.cpp:456-510):
  vertex_method  in {"out_degrees", "no_degrees", "degrees"}
  negative_method in {"degrees", "in_degrees", "no_degrees"}
All tables are 0.75-power transformed (see smore_tpu/sampling/alias.py on
the reference's POWER_SAMPLE quirk).
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.graph.graph import Graph
from smore_tpu.sampling.alias import build_alias, build_alias_segmented


def _vertex_distribution(g: Graph, method: str) -> np.ndarray:
    if method == "out_degrees":
        return g.out_degree
    if method == "no_degrees":
        return (g.out_degree > 0).astype(np.float64)
    if method == "degrees":
        return g.out_degree + g.in_degree
    raise ValueError(f"unknown vertex_method {method!r}")


def _negative_distribution(g: Graph, method: str) -> np.ndarray:
    if method == "degrees":
        return g.out_degree + g.in_degree
    if method == "in_degrees":
        return g.in_degree
    if method == "no_degrees":
        return (g.in_degree > 0).astype(np.float64)
    raise ValueError(f"unknown negative_method {method!r}")


@jax.tree_util.register_pytree_node_class
@dataclass
class SamplerTables:
    """Device-resident alias tables for a weighted graph.

    Arrays (all jnp, device-resident):
      vertex_prob/vertex_alias : (N,)  source-vertex table
      neg_prob/neg_alias       : (N,)  negative table (deg^0.75)
      indptr                   : (N+1,) int32 CSR offsets
      degree                   : (N,) int32 out-branch count
      ctx_prob                 : (E,) per-vertex context sub-tables, flat
      ctx_vid                  : (E,) int32 vid at each context slot
      ctx_alias_vid            : (E,) int32 alias vid at each slot
                                 (pre-remapped, proNet.cpp:528-534 analog)
    """

    vertex_prob: jnp.ndarray
    vertex_alias: jnp.ndarray
    neg_prob: jnp.ndarray
    neg_alias: jnp.ndarray
    indptr: jnp.ndarray
    degree: jnp.ndarray
    ctx_prob: jnp.ndarray
    ctx_vid: jnp.ndarray
    ctx_alias_vid: jnp.ndarray

    # -- pytree protocol (so the tables can be closed over / passed to jit) --
    def tree_flatten(self):
        children = (
            self.vertex_prob,
            self.vertex_alias,
            self.neg_prob,
            self.neg_alias,
            self.indptr,
            self.degree,
            self.ctx_prob,
            self.ctx_vid,
            self.ctx_alias_vid,
        )
        return children, None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)

    @property
    def n_vertices(self) -> int:
        return self.vertex_prob.shape[0]

    @property
    def n_edges(self) -> int:
        return self.ctx_prob.shape[0]

    # ------------------------------------------------------------------ #
    @staticmethod
    def build(
        g: Graph,
        vertex_method: str = "out_degrees",
        negative_method: str = "degrees",
        power: float = 0.75,
    ) -> "SamplerTables":
        n = g.n_vertices

        vp, va = build_alias(_vertex_distribution(g, vertex_method), power=power)
        np_, na = build_alias(_negative_distribution(g, negative_method), power=power)

        # Per-vertex context sub-tables over outgoing edge weights.
        cp, ca_local = build_alias_segmented(g.weights, g.indptr, power=power)
        # Remap local alias slot -> vid (reference proNet.cpp:528-534);
        # -1 (prob==1) slots map to their own vid.
        seg_id = np.repeat(np.arange(n, dtype=np.int64), np.diff(g.indptr))
        base = g.indptr[seg_id]
        slot = np.arange(g.n_edges, dtype=np.int64)
        alias_slot = np.where(ca_local >= 0, base + ca_local, slot)
        ctx_alias_vid = g.indices[alias_slot]

        def dev(x, dt):
            return jnp.asarray(np.asarray(x, dtype=dt))

        idx = np.arange(n, dtype=np.int64)
        return SamplerTables(
            vertex_prob=dev(vp, np.float32),
            vertex_alias=dev(np.where(va < 0, idx, va), np.int32),
            neg_prob=dev(np_, np.float32),
            neg_alias=dev(np.where(na < 0, idx, na), np.int32),
            indptr=dev(g.indptr, np.int32),
            degree=dev(np.diff(g.indptr), np.int32),
            ctx_prob=dev(cp, np.float32),
            ctx_vid=dev(g.indices, np.int32),
            ctx_alias_vid=dev(ctx_alias_vid, np.int32),
        )

    # ------------------------------------------------------------------ #
    # On-device batched draws. All take a PRNG key and a static shape and
    # are safe to call inside jit / scan / shard_map.
    # ------------------------------------------------------------------ #
    def source_sample(self, key: jax.Array, shape) -> jnp.ndarray:
        """Batched proNet::SourceSample (proNet.cpp:647-657)."""
        k1, k2 = jax.random.split(key)
        n = self.vertex_prob.shape[0]
        i = jax.random.randint(k1, shape, 0, n, dtype=jnp.int32)
        u = jax.random.uniform(k2, shape)
        return jnp.where(u < self.vertex_prob[i], i, self.vertex_alias[i])

    def negative_sample(self, key: jax.Array, shape) -> jnp.ndarray:
        """Batched proNet::NegativeSample (proNet.cpp:623-633)."""
        k1, k2 = jax.random.split(key)
        n = self.neg_prob.shape[0]
        i = jax.random.randint(k1, shape, 0, n, dtype=jnp.int32)
        u = jax.random.uniform(k2, shape)
        return jnp.where(u < self.neg_prob[i], i, self.neg_alias[i])

    def target_sample(self, key: jax.Array, vids: jnp.ndarray) -> jnp.ndarray:
        """Batched proNet::TargetSample(vid) (proNet.cpp:671-683):
        draw one out-neighbor per vid, weighted by edge weight^0.75.

        Zero-degree vids return themselves (callers mask; the reference
        returns -1 and callers restart the walk)."""
        k1, k2 = jax.random.split(key)
        deg = self.degree[vids]
        r = jax.random.randint(k1, vids.shape, 0, jnp.maximum(deg, 1), dtype=jnp.int32)
        slot = self.indptr[vids] + r
        u = jax.random.uniform(k2, vids.shape)
        out = jnp.where(u < self.ctx_prob[slot], self.ctx_vid[slot], self.ctx_alias_vid[slot])
        return jnp.where(deg > 0, out, vids)

    def target_sample_global(self, key: jax.Array, shape) -> jnp.ndarray:
        """Batched proNet::TargetSample() over all edge slots
        (proNet.cpp:659-669): a context draw proportional to global edge
        weight^0.75 mass."""
        k1, k2 = jax.random.split(key)
        e = self.ctx_prob.shape[0]
        slot = jax.random.randint(k1, shape, 0, e, dtype=jnp.int32)
        u = jax.random.uniform(k2, shape)
        return jnp.where(u < self.ctx_prob[slot], self.ctx_vid[slot], self.ctx_alias_vid[slot])
