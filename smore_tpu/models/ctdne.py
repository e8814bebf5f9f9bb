"""CTDNE: continuous-time dynamic network embeddings.

Reference: /root/reference/internal/models/ctdne/ctdne.go -- per node per
walk_time: pick a random start time in the node's active range
(:148-174), run a time-increasing TemporalRandomWalk (temporal_graph.go
:225-251), then skip-gram SGNS with negatives drawn by node ACTIVITY^0.75
(:108-122). Walk positions after the walk dies are masked.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.graph.temporal import TemporalGraph, TemporalTables
from smore_tpu.io.embeddings import save_embeddings
from smore_tpu.models.base import (
    TrainDriver,
    freshness_policy,
    init_embedding,
    zeros_embedding,
)
from smore_tpu.ops.update import sgns_shared_negs_step
from smore_tpu.sampling.alias import AliasTable
from smore_tpu.sampling.mappers import skipgram_pairs


class CTDNE:
    def __init__(self, tg: TemporalGraph, seed: int = 0,
                 time_window: float = None):
        self.tg = tg
        self.seed = seed
        span = tg.max_time - tg.min_time
        self.time_window = time_window if time_window else max(span * 0.1, 1.0)
        self.state = {}
        self.dim = 0

    @classmethod
    def load_edge_list(cls, path: str, **kw):
        return cls(TemporalGraph.load_edge_list(path), **kw)

    def init(self, dim: int) -> None:
        self.dim = dim
        n = self.tg.n_vertices
        k1, _ = jax.random.split(jax.random.PRNGKey(self.seed))
        self.state = {
            "vertex": init_embedding(k1, n, dim),
            "context": zeros_embedding(n, dim),
        }

    def _make_ctx(self):
        tg = self.tg
        tables = TemporalTables.build(tg)
        # negatives ~ activity^0.75 (ctdne.go:111-121); activity = in+out
        deg = np.zeros(tg.n_vertices)
        np.add.at(deg, np.repeat(
            np.arange(tg.n_vertices), np.diff(tg.indptr)), 1.0)
        np.add.at(deg, tg.edge_dst, 1.0)
        deg[deg == 0] = 1.0
        at = AliasTable.from_weights(deg, power=0.75)
        return (
            tables,
            jnp.asarray(at.prob),
            jnp.asarray(at.alias),
        )

    def _make_step(self, batch_walks, walk_steps, window, negatives,
                   shared_negatives, collision):
        tw = self.time_window
        n = self.tg.n_vertices

        def step(state, ctx, key, alpha):
            tables, neg_prob, neg_alias = ctx
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            starts = jax.random.randint(
                k1, (batch_walks,), 0, n, dtype=jnp.int32
            )
            amin = tables.active_min.at[starts].get(mode="promise_in_bounds")
            amax = tables.active_max.at[starts].get(mode="promise_in_bounds")
            span = jnp.where(amax > amin, amax - amin, tw)
            t0 = amin + jax.random.uniform(k2, starts.shape) * span

            walk, valid = tables.temporal_walk(k3, starts, t0, walk_steps, tw)
            src, pos, mask = skipgram_pairs(walk, k4, window, valid=valid)

            u = jax.random.uniform(k5, (shared_negatives, 2))
            i = jnp.minimum((u[:, 0] * n).astype(jnp.int32), n - 1)
            negs = jnp.where(
                u[:, 1] < neg_prob.at[i].get(mode="promise_in_bounds"),
                i,
                neg_alias.at[i].get(mode="promise_in_bounds"),
            )
            wv, wc = state["vertex"], state["context"]
            # inner_passes > 1 (truncated-budget freshness policy, set in
            # train()): re-evaluate gradients at the updated tables on
            # the SAME samples, alpha split across passes -- restores the
            # reference's sequential per-pair bootstrap dynamics
            # (models/walk_base.py rationale; ctdne.go:176-211 updates
            # each pair against all previous writes)
            passes = int(getattr(self, "inner_passes", 1))
            for _ in range(passes):
                wv, wc, loss = sgns_shared_negs_step(
                    wv, wc, src, pos, negs, alpha / passes,
                    k_equiv=negatives, mask=mask, collision=collision,
                )
            return {"vertex": wv, "context": wc}, loss

        return step

    def train(
        self,
        walk_times: int = 10,
        walk_steps: int = 40,
        window_size: int = 5,
        negative_samples: int = 5,
        alpha: float = 0.025,
        batch_walks: int = 128,
        steps_per_call: int = 32,
        shared_negatives: int = 256,
        collision: str = "sum",
        verbose: bool = True,
        checkpoint: str = None,
        checkpoint_every: int = 1,
        resume: bool = True,
    ) -> None:
        total = walk_times * self.tg.n_vertices
        bw2, _ = freshness_policy(total, batch_walks, 1)
        if bw2 != batch_walks:
            # truncated-budget regime: shrink the per-update batch and
            # re-evaluate each batch inner_passes times (walk_base.py
            # policy, extended here per VERDICT r3 item 5 -- CTDNE sat
            # 0.967 vs its sequential oracle's 1.000 on batched-staleness)
            batch_walks = bw2
            if getattr(self, "inner_passes", 0) in (0, 1):
                self.inner_passes = 4
                alpha = alpha * 2.0
        driver = TrainDriver(
            self._make_step(batch_walks, walk_steps, window_size,
                            negative_samples, shared_negatives, collision),
            ctx=self._make_ctx(),
            samples_per_step=batch_walks,
            alpha=alpha,
            total_samples=total,
            steps_per_call=steps_per_call,
            checkpoint_path=checkpoint,
            checkpoint_every=checkpoint_every,
            resume=resume,
        )
        self.state = driver.train(
            self.state, jax.random.PRNGKey(self.seed), verbose=verbose
        )

    def save_weights(self, path: str) -> None:
        save_embeddings(path, self.tg.names, np.asarray(self.state["vertex"]))

    def compute_temporal_coherence(self, samples: int = 1000,
                                   seed: int = 0) -> float:
        """Mean cosine similarity over sampled temporally-connected pairs
        (reference ctdne.go:249-281)."""
        tg = self.tg
        if tg.n_edges == 0:
            return 0.0
        rng = np.random.default_rng(seed)
        idx = rng.integers(0, tg.n_edges, min(samples, tg.n_edges))
        src = np.repeat(np.arange(tg.n_vertices), np.diff(tg.indptr))[idx]
        dst = tg.edge_dst[idx]
        emb = np.asarray(self.state["vertex"])
        nemb = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-12)
        sims = np.sum(nemb[src] * nemb[dst], axis=1)
        sims = sims[np.isfinite(sims)]
        return float(sims.mean()) if len(sims) else 0.0
