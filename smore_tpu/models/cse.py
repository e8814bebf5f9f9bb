"""CSE: collaborative similarity embedding (NEMF and NERANK variants).

Reference: /root/reference/src/model/NEMF.cpp and NERANK.cpp. Both keep
FOUR tables (w_vertexU/w_contextU for users, w_vertexI/w_contextI for
items; U rows uniform-init, context rows zero) and per sampled field-0
user vid with item neighbor cid run (NEMF.cpp:119-131 / NERANK.cpp:126-130):

  1. UpdateBatchCommunity(I-tables, vertex=cid, walk from vid),
     alpha*0.05, reg=0, 5 negatives  -- item neighborhood smoothing
  2. UpdateBatchCommunity(U-tables, vertex=vid, walk from cid), same
  3. head:
     NEMF  -> UpdateFactorizedPair(U, I, vid, cid, reg=0.025, 5 negs)
     NERANK-> UpdateUIPair(U, I, vid, cid, reg=0.025): up to 16
              field-matched UNIFORM negatives, first margin violator
              (f < 1) gets a BPR update (proNet.cpp:2616-2663)

Sampler methods (NEMF.cpp:4-9): vertex "out_degrees", negative "degrees".
SaveWeights (NEMF.cpp:21-47): field-0 rows from U, field-1 rows from I.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.io.embeddings import save_embeddings
from smore_tpu.models.base import (
    clamp_batch,
    PairModelBase,
    TrainDriver,
    init_embedding,
    zeros_embedding,
)
from smore_tpu.models.hpe import community_walk_pairs
from smore_tpu.ops.update import mf_step, sgns_shared_negs_step, warp_step
from smore_tpu.sampling.fields import FieldTables


class _CSEBase(PairModelBase):
    head = "mf"  # or "rank"

    def __init__(self, graph, seed: int = 0):
        super().__init__(graph, seed)
        self.walk_steps = 5

    def init(self, dim: int) -> None:
        self.dim = dim
        n = self.graph.n_vertices
        k1, k2 = jax.random.split(self._key())
        self.state = {
            "vertexU": init_embedding(k1, n, dim),
            "vertexI": init_embedding(k2, n, dim),
            "contextU": zeros_embedding(n, dim),
            "contextI": zeros_embedding(n, dim),
        }
        self.build_sampler()

    def load_field_meta(self, path: str) -> None:
        self.graph.load_field_meta(path)

    def _make_ctx(self):
        g = self.graph
        src_t = FieldTables.build(g, weights=g.out_degree)
        uni_t = FieldTables.build(g, weights=np.ones(g.n_vertices))
        return (self.build_sampler(), src_t, uni_t)

    def _make_step(self, batch, negatives, shared_negatives, collision):
        S = self.walk_steps
        head = self.head

        def step(state, ctx, key, alpha):
            tables, src_t, uni_t = ctx
            k1, k2, k3, k4, k5, k6, k7 = jax.random.split(key, 7)
            zeros = jnp.zeros((batch,), dtype=jnp.int32)
            vid = src_t.negative_field_sample(k1, zeros)  # field-0 users
            cid = tables.target_sample(k2, vid)
            negs = tables.negative_sample(k3, (shared_negatives,))

            a_comm = alpha * 0.05
            # 1) item community: vertexI[cid] vs walk from vid
            cv, cc, cm = community_walk_pairs(tables, k4, cid, vid, S)
            wvI, wcI, l1 = sgns_shared_negs_step(
                state["vertexI"], state["contextI"], cv, cc, negs,
                a_comm, k_equiv=negatives, mask=cm, collision=collision,
            )
            # 2) user community: vertexU[vid] vs walk from cid
            uv, uc, um = community_walk_pairs(tables, k5, vid, cid, S)
            wvU, wcU, l2 = sgns_shared_negs_step(
                state["vertexU"], state["contextU"], uv, uc, negs,
                a_comm, k_equiv=negatives, mask=um, collision=collision,
            )

            # 3) head on (U, I)
            if head == "mf":
                hneg = tables.negative_sample(k6, (batch, negatives))
                wvU, wvI, l3 = mf_step(
                    wvU, wvI, vid, cid, hneg, alpha, reg=0.025,
                    collision=collision,
                )
            else:
                fid = uni_t.field_of_v(cid)
                hneg = uni_t.negative_field_sample(
                    k7, jnp.broadcast_to(fid[:, None], (batch, 16))
                )
                wvU, wvI, l3 = warp_step(
                    wvU, wvI, vid, cid, hneg, alpha, reg=0.025,
                    collision=collision,
                )
            return (
                {
                    "vertexU": wvU,
                    "vertexI": wvI,
                    "contextU": wcU,
                    "contextI": wcI,
                },
                l1 + l2 + l3,
            )

        return step

    def train(
        self,
        sample_times: int = 10,
        walk_steps: int = 5,
        negative_samples: int = 5,
        alpha: float = 0.025,
        batch: int = 2048,
        steps_per_call: int = 64,
        shared_negatives: int = 256,
        collision: str = "sum",
        verbose: bool = True,
    ) -> None:
        self.walk_steps = walk_steps
        batch = clamp_batch(self.graph.n_vertices, batch)
        driver = TrainDriver(
            self._make_step(batch, negative_samples, shared_negatives, collision),
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
        fields = (
            g.fields if g.fields is not None else np.zeros(g.n_vertices, int)
        )
        wU = np.asarray(self.state["vertexU"])
        wI = np.asarray(self.state["vertexI"])
        rows = np.where((fields == 0)[:, None], wU, wI)
        save_embeddings(path, g.names, rows)


class NEMF(_CSEBase):
    head = "mf"


class NERANK(_CSEBase):
    head = "rank"
