"""FINE / msFINE: field-projected community embedding.

Reference: /root/reference/src/model/FINE.cpp, msFINE.cpp with kernels
UpdateFieldCommunity (proNet.cpp:3181) / UpdateMSFieldCommunity
(proNet.cpp:3261). The reference materializes one shadow row per
(vertex, field) -- MAX_fvid rows (proNet.cpp:389-406); here the shadow
tables have n_vertices * n_fields rows indexed vid * F + fid
(ops/community.py field_project).

Train loop (FINE.cpp:82-141): v1 = SourceSample, v2 = TargetSample(v1),
kernel over a context walk of walk_steps+1 positions starting AT v2.
Negatives: NegativeSample rejected until field matches the current
context's field. SaveWeights (FINE.cpp:11-36): per vertex, concatenation
of its field-0 and field-1 shadow rows (2*dim floats per vertex).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.io.embeddings import save_embeddings
from smore_tpu.models.base import clamp_batch, PairModelBase, TrainDriver, init_embedding
from smore_tpu.ops.community import (
    field_community_step,
    field_community_step_shared_negs,
)
from smore_tpu.sampling.fields import FieldTables
from smore_tpu.sampling.walks import random_walk


class FINE(PairModelBase):
    ms_variant = False

    def __init__(self, graph, seed: int = 0):
        super().__init__(graph, seed)
        self.walk_steps = 5

    def init(self, dim: int) -> None:
        self.dim = dim
        g = self.graph
        rows = g.n_vertices * max(1, g.n_fields)
        k1, k2 = jax.random.split(self._key())
        # FINE inits BOTH shadow tables uniform (FINE.cpp:66-78)
        self.state = {
            "vertex": init_embedding(k1, rows, dim),
            "context": init_embedding(k2, rows, dim),
        }
        self.build_sampler()

    def load_field_meta(self, path: str) -> None:
        self.graph.load_field_meta(path)

    def _make_ctx(self):
        g = self.graph
        neg_t = FieldTables.build(g)  # degree^0.75 mass, field-bucketed
        return (self.build_sampler(), neg_t)

    def _make_step(self, batch, negatives, collision,
                   shared_negatives=0):
        S = self.walk_steps + 1  # positions: v2 + walk_steps extensions
        nf = max(1, self.graph.n_fields)
        ms = self.ms_variant
        Kp = shared_negatives

        def step(state, ctx, key, alpha):
            tables, neg_t = ctx
            k1, k2, k3, k4 = jax.random.split(key, 4)
            v1 = tables.source_sample(k1, (batch,))
            v2 = tables.target_sample(k2, v1)

            if S > 1:
                walk, _ = random_walk(
                    tables, k3, v2, S - 1, restart_on_deadend=False
                )
            else:
                walk = v2[:, None]
            deg = tables.vert_meta.at[walk].get(mode="promise_in_bounds")[..., 1]
            alive = jnp.cumprod(
                jnp.concatenate(
                    [
                        jnp.ones((batch, 1), jnp.float32),
                        (deg[:, :-1] > 0).astype(jnp.float32),
                    ],
                    axis=1,
                ),
                axis=1,
            )
            c_fid = neg_t.field_of_v(walk)  # (B, S)
            if Kp:
                # ONE Kp-row pool per field (exact per-field law; the
                # sigmoid gradient is additive in negatives, so the
                # k_equiv/Kp pool scale preserves the per-sample
                # expected update exactly)
                pool = neg_t.negative_field_sample(
                    k4,
                    jnp.broadcast_to(
                        jnp.arange(nf, dtype=jnp.int32)[:, None],
                        (nf, Kp),
                    ),
                )
                wv, wc, loss = field_community_step_shared_negs(
                    state["vertex"], state["context"], v1, walk, alive,
                    pool, neg_t.field_of, nf, alpha,
                    k_equiv=negatives, ms_variant=ms,
                    collision=collision,
                )
                return {"vertex": wv, "context": wc}, loss
            negs = neg_t.negative_field_sample(
                k4,
                jnp.broadcast_to(c_fid[:, :, None], (batch, S, negatives)),
            )
            wv, wc, loss = field_community_step(
                state["vertex"], state["context"], v1, walk, alive, negs,
                neg_t.field_of, nf, alpha, ms_variant=ms,
                collision=collision,
            )
            return {"vertex": wv, "context": wc}, loss

        return step

    def train(
        self,
        sample_times: int = 10,
        walk_steps: int = 5,
        negative_samples: int = 5,
        alpha: float = 0.025,
        batch: int = 2048,
        steps_per_call: int = 64,
        collision: str = "sum",
        shared_negatives: int = 128,  # Kp-row per-FIELD shared pools
        # (field_community_step_shared_negs; 0 = per-sample reference
        # negatives). Exactly expectation-preserving; zoo-gated.
        verbose: bool = True,
    ) -> None:
        self.walk_steps = walk_steps
        batch = clamp_batch(self.graph.n_vertices, batch)
        if shared_negatives and self.graph.n_vertices < 4 * shared_negatives:
            # tiny-graph guard (see GCN.train): pool concentration
            # overshoots on toy nets; per-sample negatives there
            shared_negatives = 0
        if shared_negatives:
            shared_negatives = min(shared_negatives, batch)
        driver = TrainDriver(
            self._make_step(batch, negative_samples, collision,
                            shared_negatives),
            ctx=self._make_ctx(),
            samples_per_step=batch,
            alpha=alpha,
            total_samples=int(sample_times * 1_000_000),
            steps_per_call=steps_per_call,
            **self._ckpt_kw(),
        )
        self.state = driver.train(self.state, self._key(), verbose=verbose)

    def save_weights(self, path: str, table: str = "vertex") -> None:
        g = self.graph
        nf = max(1, g.n_fields)
        wv = np.asarray(self.state["vertex"]).reshape(g.n_vertices, nf, -1)
        k = min(2, nf)  # reference writes fields 0 and 1 (FINE.cpp:21-27)
        rows = wv[:, :k, :].reshape(g.n_vertices, -1)
        save_embeddings(path, g.names, rows)


class MSFINE(FINE):
    """msFINE: vertex side projected, context side plain, reg=0.025
    (UpdateMSFieldCommunity, proNet.cpp:3261-3308)."""

    ms_variant = True
