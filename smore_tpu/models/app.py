"""APP: scalable graph embedding for asymmetric proximity.

Reference: /root/reference/src/model/APP.{h,cpp} (Train APP.cpp:59-127):
per vertex, ``sample_times`` JumpingRandomWalks; each contributes ONE
SGNS pair (walk[0], walk.back()). CLI defaults (cli/app.cpp):
jump factor 0.15, sample_times=20, walk_times=100.
"""

from __future__ import annotations

import jax

from smore_tpu.models.walk_base import WalkSGNSBase
from smore_tpu.sampling.walks import jumping_walk_endpoints


class APP(WalkSGNSBase):
    def __init__(self, graph, seed: int = 0):
        super().__init__(graph, seed)
        self.jump = 0.15
        self.max_steps = 64

    def _emit_pairs(self, tables, key, starts):
        ends, row_mask = jumping_walk_endpoints(
            tables, key, starts, self.jump, self.max_steps
        )
        return starts, ends, row_mask

    def train(
        self,
        walk_times: int = 100,
        sample_times: int = 20,
        jump: float = 0.15,
        negative_samples: int = 5,
        alpha: float = 0.025,
        batch_walks: int = 8192,
        steps_per_call: int = 64,
        shared_negatives: int = 128,
        collision: str = "sum",
        mesh=None,
        sharding: str = "dp",
        verbose: bool = True,
    ) -> None:
        self.jump = jump
        self._run(
            total_walks=walk_times * sample_times * self.graph.n_vertices,
            batch_walks=batch_walks,
            negatives=negative_samples,
            alpha=alpha,
            steps_per_call=steps_per_call,
            shared_negatives=shared_negatives,
            collision=collision,
            verbose=verbose,
            mesh=mesh,
            sharding=sharding,
        )
