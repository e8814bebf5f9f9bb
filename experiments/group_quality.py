"""Quality gate for grouped source draws: train LINE o2 at 40M samples
on the bench community graph with group in {1, 8, 16, 32} and report
community-AUC (cosine). Grouping reuses each drawn source for G
consecutive contexts (same conditional law; tests/test_sampling_device.py
has the distribution-law test) — this checks the *optimization* effect
of the induced within-batch correlation at the full sample budget.

Gate: AUC must match the ungrouped/reference value (1.0000 on this
graph at 40M; see PERF_NOTES.md quality parity record).

Also gates batch-size changes (the other throughput lever): set
GQ_BATCH to override bench.BATCH — larger batches raise within-batch
scatter collisions on hot rows (verify-skill gotcha), so any batch bump
must re-pass this gate before bench.py adopts it.

Usage: [GQ_BATCH=N] python experiments/group_quality.py [G ...]   (default: 8)
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import ALPHA, DIM, GRAPH_PATH, NEGS, make_graph  # noqa: E402
import bench  # noqa: E402

BATCH = int(os.environ.get("GQ_BATCH", bench.BATCH))

N, N_COMM, SAMPLES_M = 50_000, 100, 40


def community_auc(emb_by_vid: np.ndarray, name2id, seed=7, n_pairs=200_000):
    """AUC of cosine(u,v) separating same-community from cross-community
    pairs. Labels indexed by the v{i} name, remapped through name2id
    (internal vids are first-appearance order — verify-skill gotcha)."""
    labels = np.random.default_rng(0).integers(0, N_COMM, N)
    rows = np.array([name2id[f"v{i}"] for i in range(N)])
    e = emb_by_vid[rows]
    e = e / (np.linalg.norm(e, axis=1, keepdims=True) + 1e-12)
    rng = np.random.default_rng(seed)
    a = rng.integers(0, N, n_pairs)
    b = rng.integers(0, N, n_pairs)
    keep = a != b
    a, b = a[keep], b[keep]
    same = labels[a] == labels[b]
    if same.sum() == 0 or (~same).sum() == 0:
        return float("nan")
    s = (e[a] * e[b]).sum(axis=1)
    order = np.argsort(s)
    ranks = np.empty_like(order, dtype=np.float64)
    ranks[order] = np.arange(1, len(s) + 1)
    n_pos, n_neg = same.sum(), (~same).sum()
    return float((ranks[same].sum() - n_pos * (n_pos + 1) / 2) / (n_pos * n_neg))


def main():
    groups = [int(x) for x in sys.argv[1:]] or [8]
    make_graph(GRAPH_PATH)
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE

    g = Graph.load_edge_list(GRAPH_PATH, undirected=True)
    for G in groups:
        m = LINE(g, seed=0)
        m.init(dim=DIM, order=2)
        t0 = time.time()
        m.train(sample_times=SAMPLES_M, negative_samples=NEGS, alpha=ALPHA,
                batch=BATCH, steps_per_call=1280, group=G, verbose=False)
        emb = np.asarray(m.state["vertex"], dtype=np.float64)
        dt = time.time() - t0
        auc = community_auc(emb, g.name2id)
        print(f"group={G:2d} batch={BATCH}  community-AUC(cos)={auc:.4f}  "
              f"wall={dt:.1f}s ({SAMPLES_M*1e6/dt/1e6:.1f}M samples/s incl compile)",
              flush=True)


if __name__ == "__main__":
    main()
