"""Walklets: multi-scale skip-gram over banded walk offsets.

Reference: /root/reference/src/model/Walklets.{h,cpp} (Train
Walklets.cpp:6-64): RandomWalk -> ScaleSkipGrams(window_min, window_max)
-> UpdatePairs (negatives from the standard degree^0.75 table).
CLI defaults (cli/walklets.cpp): window_min=2, window_max=5.
"""

from __future__ import annotations

import jax

from smore_tpu.models.walk_base import WalkSGNSBase
from smore_tpu.sampling.mappers import scale_skipgram_pairs
from smore_tpu.sampling.walks import random_walk


class Walklets(WalkSGNSBase):
    def __init__(self, graph, seed: int = 0):
        super().__init__(graph, seed)
        self.walk_steps = 40
        self.window_min = 2
        self.window_max = 5

    def _emit_pairs(self, tables, key, starts):
        walk, row_mask = random_walk(tables, key, starts, self.walk_steps)
        return scale_skipgram_pairs(
            walk, self.window_min, self.window_max, row_mask
        )

    def train(
        self,
        walk_times: int = 10,
        walk_steps: int = 40,
        window_min: int = 2,
        window_max: int = 5,
        negative_samples: int = 5,
        alpha: float = 0.025,
        batch_walks: int = 128,  # see deepwalk.py on collision dilution
        steps_per_call: int = 64,
        shared_negatives: int = 256,
        collision: str = "sum",
        mesh=None,
        sharding: str = "dp",
        verbose: bool = True,
    ) -> None:
        self.walk_steps = walk_steps
        self.window_min = window_min
        self.window_max = window_max
        self._run(
            total_walks=walk_times * self.graph.n_vertices,
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
