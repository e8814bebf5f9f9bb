"""ECO: softmax-choice embedding (experimental family in the reference).

Reference: /root/reference/src/model/ECO.cpp (Train :64-128, live branch):
field-0 sources; per sample 5 rounds of UpdateDChoice
(proNet.cpp:2221-2345): c1 = TargetSample(v1), c2 = 2 further hops,
softmax over {c1 (weight 2), c2 (weight 1), K negatives}, ONE shared
table, init uniform(-0.5, 0.5) WITHOUT the /dim scale (ECO.cpp:51-57).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.models.base import clamp_batch, PairModelBase, TrainDriver, init_embedding
from smore_tpu.ops.community import dchoice_step
from smore_tpu.sampling.fields import FieldTables


class ECO(PairModelBase):
    def __init__(self, graph, seed: int = 0, reg: float = 0.01):
        super().__init__(graph, seed)
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
        return (self.build_sampler(), src_t)

    def _make_step(self, batch, negatives, collision):
        R = self.rounds
        reg = self.reg

        def step(state, ctx, key, alpha):
            tables, src_t = ctx
            k1, k2, k3 = jax.random.split(key, 3)
            zeros = jnp.zeros((batch,), dtype=jnp.int32)
            v1 = src_t.negative_field_sample(k1, zeros)

            # R rounds folded into the batch dim: fresh (c1, c2) per round
            vB = jnp.tile(v1, R)
            u = jax.random.uniform(k2, (batch * R, 3, 2))
            c1 = tables.target_sample(None, vB, u2=u[:, 0])
            c2 = tables.target_sample(None, c1, u2=u[:, 1])
            c2 = tables.target_sample(None, c2, u2=u[:, 2])
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
        verbose: bool = True,
    ) -> None:
        self.reg = reg
        batch = clamp_batch(self.graph.n_vertices, batch)
        driver = TrainDriver(
            self._make_step(batch, negative_samples, collision),
            ctx=self._make_ctx(),
            samples_per_step=batch,
            alpha=alpha,
            total_samples=int(sample_times * 1_000_000),
            steps_per_call=steps_per_call,
            **self._ckpt_kw(),
        )
        self.state = driver.train(self.state, self._key(), verbose=verbose)
