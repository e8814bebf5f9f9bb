"""Truncated-budget (walk_times=2) deepwalk config sweep vs the
reference's measured 0.9390 link-AUC (walk_parity trunc run).

The freshness policy's first cut (batch_walks 26, hoist 4) only reached
0.698 -- each snapshot still carries ~6k pairs and negatives come from
a 256-row shared pool. Sweep batch_walks (pairs per snapshot) and the
shared-negative pool size to find what closes the gap.

Run: python experiments/trunc_walk_sweep.py [bw:hoist:ks ...]
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from walk_parity import TRAIN, link_auc  # noqa: E402

from bench import make_graph  # noqa: E402


def run(bw, hoist, ks, alpha=0.025):
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.deepwalk import DeepWalk

    g = Graph.load_edge_list(TRAIN, undirected=True)
    m = DeepWalk(g, seed=0)
    m.init(dim=64)
    t0 = time.time()
    m.train(walk_times=2, walk_steps=40, window_size=5,
            negative_samples=5, batch_walks=bw, hoist=hoist,
            shared_negatives=ks, alpha=alpha, verbose=False)
    out = "/tmp/trunc_dw_out.txt"
    m.save_weights(out)
    auc = link_auc(out)
    print(f"bw={bw} hoist={hoist} Ks={ks} a={alpha}: link-AUC={auc:.4f} "
          f"({time.time()-t0:.0f}s)   [ref trunc arm: 0.9390]",
          flush=True)


def main():
    make_graph(TRAIN, n=20_000, e=400_000, n_comm=50, seed=0)
    arms = sys.argv[1:] or ["4:32:256", "2:64:256", "4:32:1024",
                            "16:8:256"]
    for arm in arms:
        parts = arm.split(":")
        bw, hoist, ks = int(parts[0]), int(parts[1]), int(parts[2])
        alpha = float(parts[3]) if len(parts) > 3 else 0.025
        run(bw, hoist, ks, alpha)


if __name__ == "__main__":
    main()
