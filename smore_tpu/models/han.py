"""HAN: heterogeneous attention network (heuristic variant).

Reference: /root/reference/internal/models/han/han.go. Per node per
epoch (:249-385):
  - per metapath p: ``walk_times`` MetaPathWalk ENDPOINTS act as the
    typed neighborhood; node-level attention softmax over
    LeakyReLU(a_p . (W_p h_node + W_p h_nbr)) (:155-190); aggregate
    transformed neighbors (:203-216)
  - semantic attention over metapath aggregates: softmax of
    q . tanh(z_p) (:218-251)
  - heuristic update h_node += lr * sum_p beta_p z_p, then L2 normalize
    (:349-364). W_p init near-identity; the attention parameters are
    never themselves trained (faithfully preserved here).
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.graph.hetero import HeteroGraph, HeteroTables
from smore_tpu.io.embeddings import save_embeddings


class HAN:
    def __init__(self, hg: HeteroGraph, seed: int = 0):
        self.hg = hg
        self.seed = seed
        self.meta_paths: List[List[str]] = []
        self.state = {}
        self.dim = 0
        self.learning_rate = 0.01

    @classmethod
    def load_edge_list(cls, path: str, undirected: bool = True, **kw):
        return cls(HeteroGraph.load_edge_list(path, undirected), **kw)

    def add_meta_path(self, path: List[str]) -> None:
        for t in path:
            if t not in self.hg.type2id:
                raise ValueError(f"unknown node type in meta-path: {t}")
        self.meta_paths.append(path)

    def init(self, dim: int, learning_rate: float = 0.01) -> None:
        self.dim = dim
        self.learning_rate = learning_rate
        n = self.hg.n_vertices
        P = max(1, len(self.meta_paths))
        key = jax.random.PRNGKey(self.seed)
        k1, k2, k3, k4 = jax.random.split(key, 4)
        scale = 1.0 / dim
        self.state = {
            "embed": (jax.random.uniform(k1, (n, dim)) - 0.5) * scale,
            # near-identity transforms (han.go:111-123)
            "W": jnp.eye(dim)[None].repeat(P, 0)
            + (jax.random.uniform(k2, (P, dim, dim)) - 0.5) * scale
            * (1 - jnp.eye(dim))[None],
            "attn": (jax.random.uniform(k3, (P, dim)) - 0.5) * scale,
            "sem": (jax.random.uniform(k4, (dim,)) - 0.5) * scale,
        }

    def _make_ctx(self):
        hg = self.hg
        lmax = max(len(p) for p in self.meta_paths)
        pt = np.zeros((len(self.meta_paths), lmax), dtype=np.int32)
        pl = np.zeros(len(self.meta_paths), dtype=np.int32)
        for i, p in enumerate(self.meta_paths):
            pl[i] = len(p)
            for j, t in enumerate(p):
                pt[i, j] = hg.type2id[t]
        return (HeteroTables.build(hg), jnp.asarray(pt), jnp.asarray(pl))

    def _make_step(self, batch, walk_times, walk_steps, inner=32):
        """inner: group size of the INNER freshness passes. The
        sequential reference updates one node at a time, so each node's
        aggregation reads neighbors already updated this epoch; a
        whole-batch step reads an epoch-stale snapshot and propagates
        attention mass one epoch late (measured: 0.9214 vs oracle
        0.9672 at epochs=40, PERF_NOTES "HAN oracle-gap mechanism").
        Splitting the batch into groups of ``inner`` inside one jitted
        lax.scan gives group g the embeddings groups < g just wrote --
        the same inner-pass cure CTDNE / Metapath2Vec use (round 4) at
        one dispatch per batch."""
        P = len(self.meta_paths)
        lr = self.learning_rate
        n = self.hg.n_vertices
        G = max(1, batch // max(1, inner))
        bg = batch // G

        def step(state, ctx, key):
            tables, pt, pl = ctx
            W, attn, sem = state["W"], state["attn"], state["sem"]

            def inner_body(emb, kg):
                k1, k2 = jax.random.split(kg)
                nodes = jax.random.randint(
                    k1, (bg,), 0, n, dtype=jnp.int32
                )
                h_node = emb.at[nodes].get(mode="promise_in_bounds")

                z = []  # per-path aggregates (bg, D)
                z_ok = []  # (bg,)
                keys = jax.random.split(k2, P * walk_times).reshape(
                    P, walk_times, -1
                )
                for p in range(P):
                    ends = []
                    oks = []
                    for w in range(walk_times):
                        walk, valid = tables.metapath_walk(
                            keys[p, w], nodes, pt, pl,
                            jnp.full((bg,), p, dtype=jnp.int32),
                            walk_steps,
                        )
                        ends.append(walk[:, -1])  # frozen cursor
                        oks.append(valid[:, 1])  # walked >= one step
                    nbrs = jnp.stack(ends, 1)  # (bg, Wt)
                    okm = jnp.stack(oks, 1)  # (bg, Wt)

                    h_nb = emb.at[nbrs].get(mode="promise_in_bounds")
                    tn = h_node @ W[p].T  # (bg, D)
                    tb = jnp.einsum("bwd,ed->bwe", h_nb, W[p])
                    score = jnp.einsum(
                        "d,bwd->bw", attn[p], tn[:, None] + tb
                    )
                    score = jnp.where(score < 0, 0.01 * score, score)
                    score = jnp.where(okm > 0, score, -1e9)
                    a = jax.nn.softmax(score, axis=1)
                    agg = jnp.einsum("bw,bwe->be", a, tb)
                    ok_any = (okm.sum(1) > 0).astype(jnp.float32)
                    z.append(agg * ok_any[:, None])
                    z_ok.append(ok_any)

                zs = jnp.stack(z, 1)  # (bg, P, D)
                oks = jnp.stack(z_ok, 1)  # (bg, P)
                s_score = jnp.einsum("d,bpd->bp", sem, jnp.tanh(zs))
                s_score = jnp.where(oks > 0, s_score, -1e9)
                beta = jax.nn.softmax(s_score, axis=1)
                final = jnp.einsum("bp,bpd->bd", beta * oks, zs)

                new = h_node + lr * final
                new = new / jnp.maximum(
                    jnp.linalg.norm(new, axis=1, keepdims=True), 1e-12
                )
                return emb.at[nodes].set(new), jnp.float32(0.0)

            gkeys = jax.random.split(key, G)
            emb, _ = jax.lax.scan(inner_body, state["embed"], gkeys)
            return dict(state, embed=emb), jnp.float32(0.0)

        return jax.jit(step, donate_argnums=(0,))

    def train(self, walk_times: int = 5, walk_steps: int = 4,
              epochs: int = 5, batch: int = 512,
              verbose: bool = True, checkpoint: str = None,
              checkpoint_every: int = 1, resume: bool = True) -> None:
        if not self.meta_paths:
            raise ValueError("no meta-paths defined")
        step = self._make_step(batch, walk_times, walk_steps)
        ctx = self._make_ctx()
        key = jax.random.PRNGKey(self.seed + 3)
        n = self.hg.n_vertices
        steps_per_epoch = max(1, n // batch + 1)
        state = self.state
        start_ep = 0
        if checkpoint:
            from smore_tpu.utils.checkpoint import (
                checkpoint_exists, load_checkpoint, save_checkpoint)

            if resume and checkpoint_exists(checkpoint):
                loaded, done_ep, extra = load_checkpoint(checkpoint)
                state = jax.tree.map(jnp.asarray, loaded)
                if extra and "key" in extra:
                    key = jnp.asarray(
                        np.asarray(extra["key"]).astype(np.uint32))
                start_ep = min(int(done_ep), epochs)
        for ep in range(start_ep, epochs):
            for _ in range(steps_per_epoch):
                key, ks = jax.random.split(key)
                state, _ = step(state, ctx, ks)
            if verbose:
                print(f"\tepoch {ep + 1}/{epochs}", end="\r", flush=True)
            if checkpoint and (
                (ep + 1) % max(1, checkpoint_every) == 0
                or ep + 1 == epochs
            ):
                save_checkpoint(
                    checkpoint,
                    jax.device_get(state),
                    step=ep + 1,
                    extra={"key": np.asarray(key)},
                )
        if verbose:
            print()
        self.state = state

    def save_weights(self, path: str) -> None:
        save_embeddings(path, self.hg.names, np.asarray(self.state["embed"]))
