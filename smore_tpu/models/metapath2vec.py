"""metapath2vec: type-constrained walks + skip-gram SGNS.

Reference: /root/reference/internal/models/metapath2vec/metapath2vec.go --
per node per walk_time: pick a RANDOM registered metapath (:180), run a
MetaPathWalk (hetero_graph.go:221-257), skip-gram with negatives from a
UNIFORM^0.75 alias table (:139-145). Walks shorter than 2 are skipped.
"""

from __future__ import annotations

from typing import List

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.graph.hetero import HeteroGraph, HeteroTables
from smore_tpu.io.embeddings import save_embeddings
from smore_tpu.models.base import (
    TrainDriver,
    freshness_policy,
    init_embedding,
    zeros_embedding,
)
from smore_tpu.ops.update import sgns_shared_negs_step
from smore_tpu.sampling.mappers import skipgram_pairs


class Metapath2Vec:
    def __init__(self, hg: HeteroGraph, seed: int = 0):
        self.hg = hg
        self.seed = seed
        self.meta_paths: List[List[str]] = []
        self.state = {}
        self.dim = 0

    @classmethod
    def load_edge_list(cls, path: str, undirected: bool = True, **kw):
        return cls(HeteroGraph.load_edge_list(path, undirected), **kw)

    def add_meta_path(self, path: List[str]) -> None:
        self.hg.validate_meta_path(path)  # hetero_graph.go:260-272
        self.meta_paths.append(path)

    def init(self, dim: int) -> None:
        self.dim = dim
        n = self.hg.n_vertices
        k1, _ = jax.random.split(jax.random.PRNGKey(self.seed))
        self.state = {
            "vertex": init_embedding(k1, n, dim),
            "context": zeros_embedding(n, dim),
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
        return (
            HeteroTables.build(hg),
            jnp.asarray(pt),
            jnp.asarray(pl),
        )

    def _make_step(self, batch_walks, walk_steps, window, negatives,
                   shared_negatives, collision):
        n = self.hg.n_vertices
        n_paths = len(self.meta_paths)

        def step(state, ctx, key, alpha):
            tables, pt, pl = ctx
            k1, k2, k3, k4, k5 = jax.random.split(key, 5)
            starts = jax.random.randint(
                k1, (batch_walks,), 0, n, dtype=jnp.int32
            )
            pidx = jax.random.randint(
                k2, (batch_walks,), 0, n_paths, dtype=jnp.int32
            )
            walk, valid = tables.metapath_walk(
                k3, starts, pt, pl, pidx, walk_steps
            )
            src, pos, mask = skipgram_pairs(walk, k4, window, valid=valid)
            # uniform^0.75 == uniform negatives (metapath2vec.go:139-145)
            negs = jax.random.randint(k5, (shared_negatives,), 0, n)
            wv, wc = state["vertex"], state["context"]
            # inner_passes > 1 (truncated-budget freshness policy, set in
            # train()): re-evaluate gradients at the updated tables on
            # the SAME samples, alpha split across passes -- restores the
            # reference's sequential per-pair bootstrap dynamics
            # (models/walk_base.py rationale; metapath2vec.go:292-316)
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
        if not self.meta_paths:
            raise ValueError(
                "no meta-paths defined; call add_meta_path() first"
            )
        total = walk_times * self.hg.n_vertices
        bw2, _ = freshness_policy(total, batch_walks, 1)
        if bw2 != batch_walks:
            batch_walks = bw2
        if getattr(self, "inner_passes", 0) in (0, 1):
            # Metapath walks CYCLE their type pattern and dead-end fast
            # (an A-P-A walk stops at length 3, metapath2vec.go:236-248),
            # so each step carries few pairs and the zero-init context
            # bootstrap gap (walk_base.py rationale) persists at EVERY
            # practical budget, not just truncated ones -- measured:
            # batched 1-pass sits 0.911 vs the sequential oracle's 0.962
            # author-topic AUC regardless of batch size (16 or 128),
            # while inner_passes=4 with doubled step mass reaches 0.994
            # (round 4, /tmp/mp2v_probe). The walks are short, so the 4x
            # re-evaluation cost is small; always-on here.
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
        save_embeddings(path, self.hg.names, np.asarray(self.state["vertex"]))
