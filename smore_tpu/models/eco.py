"""ECO: softmax-choice embedding (experimental family in the reference).

Reference: /root/reference/src/model/ECO.cpp (Train :64-128, live branch):
field-0 sources; per sample 5 rounds of UpdateDChoice
(proNet.cpp:2221-2345): c1 = TargetSample(v1), c2 = 2 further hops,
softmax over {c1 (weight 2), c2 (weight 1), K negatives}, ONE shared
table, init uniform(-0.5, 0.5) WITHOUT the /dim scale (ECO.cpp:51-57).

The reference ships the family's other kernels only as commented-out
alternates in the same loop (ECO.cpp:103-110); here they are selectable
heads so every Choice kernel has a model-level consumer:
  head="dchoice"     the live branch (default)
  head="hop_choice"  UpdateHOPChoice(v1, v2) + UpdateHOPChoice(v1, v3,
                     alpha*0.5) with v2 = TargetSample(v1), v3 = two
                     further hops (ECO.cpp:105-106); negatives from the
                     global degree^0.75 table (NegativeSample,
                     proNet.cpp:2161)
  head="recall_rank" UpdateRecallRank(v1): 5 rounds of softmax-choice
                     with pos = TargetSample(v1) (ECO.cpp:110;
                     proNet.cpp:1887-2036); negatives FIELD-MATCHED to
                     the positive context (the rejection loop at
                     proNet.cpp:1924-1926, here an O(1) per-field alias
                     draw)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.models.base import clamp_batch, PairModelBase, TrainDriver, init_embedding
from smore_tpu.ops.community import (
    choice_softmax_step,
    choice_softmax_step_shared_negs,
    dchoice_step,
    dchoice_step_shared_negs,
)
from smore_tpu.sampling.fields import FieldTables


class ECO(PairModelBase):
    def __init__(self, graph, seed: int = 0, reg: float = 0.01,
                 head: str = "dchoice"):
        super().__init__(graph, seed)
        if head not in ("dchoice", "hop_choice", "recall_rank"):
            raise ValueError(f"unknown ECO head {head!r}")
        self.head = head
        self.reg = reg
        self.rounds = 5

    def init(self, dim: int) -> None:
        self.dim = dim
        k1, _ = jax.random.split(self._key())
        # no /dim scale (ECO.cpp:55)
        self.state = {
            "vertex": init_embedding(k1, self.graph.n_vertices, dim, scale=1.0)
        }
        self.build_sampler()

    def load_field_meta(self, path: str) -> None:
        self.graph.load_field_meta(path)

    def _make_ctx(self):
        g = self.graph
        src_t = FieldTables.build(g, weights=g.out_degree)
        # per-field NEGATIVE tables (degree^0.75 within field): the O(1)
        # equivalent of recall_rank's rejection loop (proNet.cpp:1924-26)
        neg_t = FieldTables.build(g)
        return (self.build_sampler(), src_t, neg_t)

    def _make_step(self, batch, negatives, collision,
                   shared_negatives=0):
        R = self.rounds
        reg = self.reg
        head = self.head
        Kp = shared_negatives

        def step(state, ctx, key, alpha):
            tables, src_t, neg_t = ctx
            k1, k2, k3 = jax.random.split(key, 3)
            zeros = jnp.zeros((batch,), dtype=jnp.int32)
            v1 = src_t.negative_field_sample(k1, zeros)

            if head == "hop_choice":
                # ECO.cpp:102,105-106: v2 = TargetSample(v1), v3 = two
                # further hops; full-weight update on (v1, v2), half on
                # (v1, v3); negatives from the global degree^0.75 table
                # (NegativeSample, proNet.cpp:2161).
                u = jax.random.uniform(k2, (batch, 3, 2))
                v2 = tables.target_sample(None, v1, u2=u[:, 0])
                v3 = tables.target_sample(None, v2, u2=u[:, 1])
                v3 = tables.target_sample(None, v3, u2=u[:, 2])
                if Kp:
                    pool = tables.negative_sample(k3, (2, Kp))
                    w, l1 = choice_softmax_step_shared_negs(
                        state["vertex"], v1, v2, pool[0], alpha,
                        k_equiv=negatives, reg=reg, collision=collision,
                    )
                    w, l2 = choice_softmax_step_shared_negs(
                        w, v1, v3, pool[1], alpha * 0.5,
                        k_equiv=negatives, reg=reg, collision=collision,
                    )
                    return {"vertex": w}, l1 + l2
                negs = tables.negative_sample(k3, (batch, 2, negatives))
                w, l1 = choice_softmax_step(
                    state["vertex"], v1, v2, negs[:, 0], alpha, reg=reg,
                    collision=collision,
                )
                w, l2 = choice_softmax_step(
                    w, v1, v3, negs[:, 1], alpha * 0.5, reg=reg,
                    collision=collision,
                )
                return {"vertex": w}, l1 + l2

            if head == "recall_rank":
                # ECO.cpp:110: UpdateRecallRank(v1, v1) -- 5 softmax-choice
                # rounds with a fresh pos = TargetSample(v1) each round
                # (proNet.cpp:1887-2036); rounds fold into the batch dim.
                vB = jnp.tile(v1, R)
                u = jax.random.uniform(k2, (batch * R, 2))
                pos = tables.target_sample(None, vB, u2=u)
                # field-matched negatives (proNet.cpp:1924-1926): draw
                # from the degree^0.75 law WITHIN the positive's field
                fids = neg_t.field_of_v(pos)
                negs = neg_t.negative_field_sample(
                    k3,
                    jnp.broadcast_to(fids[:, None],
                                     (batch * R, negatives)),
                )
                w, loss = choice_softmax_step(
                    state["vertex"], vB, pos, negs, alpha, reg=reg,
                    collision=collision,
                )
                return {"vertex": w}, loss

            # R rounds folded into the batch dim: fresh (c1, c2) per round
            vB = jnp.tile(v1, R)
            u = jax.random.uniform(k2, (batch * R, 3, 2))
            c1 = tables.target_sample(None, vB, u2=u[:, 0])
            c2 = tables.target_sample(None, c1, u2=u[:, 1])
            c2 = tables.target_sample(None, c2, u2=u[:, 2])
            if Kp:
                pool = tables.negative_sample(k3, (Kp,))
                w, loss = dchoice_step_shared_negs(
                    state["vertex"], vB, c1, c2, pool, alpha,
                    k_equiv=negatives, reg=reg, collision=collision,
                )
                return {"vertex": w}, loss
            negs = tables.negative_sample(k3, (batch * R, negatives))

            w, loss = dchoice_step(
                state["vertex"], vB, c1, c2, negs, alpha, reg=reg,
                collision=collision,
            )
            return {"vertex": w}, loss

        return step

    def train(
        self,
        sample_times: int = 10,
        negative_samples: int = 5,
        reg: float = 0.01,
        alpha: float = 0.025,
        batch: int = 2048,
        steps_per_call: int = 64,
        collision: str = "sum",
        shared_negatives: int = 128,  # Kp-row shared pool per step
        # (dchoice/choice_softmax *_shared_negs: sampled-softmax
        # estimator with k_equiv/Kp-scaled partition mass -- the
        # recall_rank head keeps per-sample field-matched negatives).
        # Zoo-gated at AUC/recall parity (PERF_NOTES round-5).
        verbose: bool = True,
    ) -> None:
        self.reg = reg
        batch = clamp_batch(self.graph.n_vertices, batch)
        if self.head == "recall_rank":
            shared_negatives = 0
        if shared_negatives and self.graph.n_vertices < 4 * shared_negatives:
            # tiny-graph guard (see GCN.train): pool concentration
            # overshoots on toy nets; per-sample negatives there
            shared_negatives = 0
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
