"""(a) Micro-F1 node-classification parity on the community bench graph
(BASELINE.md row "LINE o1+o2 on Youtube-links, micro-F1" -- the real
Youtube-links labels are unavailable offline, so the planted-community
graph plays its role) and (b) LINE throughput at Youtube scale (1.1M
vertices / 10M directed edges, synthetic).

Probe: multinomial logistic regression (full-batch GD on CPU) trained on
80% of vertices' embeddings, micro-F1 (== accuracy in single-label
multiclass) on the held-out 20%. Ours vs the reference's saved
embedding at the same 40M-sample budget.
"""

from __future__ import annotations

import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

REF_EMB = "/tmp/ref_line40.txt"
YT_PATH = "/tmp/yt_scale_net.txt"


def softmax_probe(emb: np.ndarray, labels: np.ndarray, seed=0,
                  iters=300, lr=0.5):
    """Full-batch multinomial logistic regression; returns test micro-F1."""
    rng = np.random.default_rng(seed)
    n = len(labels)
    order = rng.permutation(n)
    cut = int(0.8 * n)
    tr, te = order[:cut], order[cut:]
    x = emb / (np.linalg.norm(emb, axis=1, keepdims=True) + 1e-9)
    k = labels.max() + 1
    w = np.zeros((emb.shape[1], k), dtype=np.float64)
    b = np.zeros(k)
    y = np.zeros((len(tr), k))
    y[np.arange(len(tr)), labels[tr]] = 1.0
    xt = x[tr]
    for _ in range(iters):
        z = xt @ w + b
        z -= z.max(axis=1, keepdims=True)
        p = np.exp(z)
        p /= p.sum(axis=1, keepdims=True)
        g = (p - y) / len(tr)
        w -= lr * (xt.T @ g)
        b -= lr * g.sum(axis=0)
    pred = np.argmax(x[te] @ w + b, axis=1)
    return float(np.mean(pred == labels[te]))


def load_ref(path, n, dim):
    emb = np.zeros((n, dim), dtype=np.float32)
    with open(path) as f:
        f.readline()
        for line in f:
            p = line.split()
            emb[int(p[0][1:])] = np.array(p[1:], dtype=np.float32)
    return emb


def main():
    from bench import GRAPH_PATH, make_graph
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE

    # ---------------- (a) micro-F1 parity ----------------
    make_graph(GRAPH_PATH)
    labels = np.random.default_rng(0).integers(0, 100, 50_000)
    g = Graph.load_edge_list(GRAPH_PATH, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    m.train(sample_times=40, verbose=False)
    raw = np.asarray(m.state["vertex"])
    perm = np.zeros(50_000, dtype=np.int64)
    for name, vid in g.name2id.items():
        perm[int(name[1:])] = vid
    ours_f1 = softmax_probe(raw[perm], labels)
    print(f"ours      micro-F1: {ours_f1:.4f}", flush=True)
    if os.path.exists(REF_EMB):
        ref_f1 = softmax_probe(load_ref(REF_EMB, 50_000, 64), labels)
        print(f"reference micro-F1: {ref_f1:.4f}", flush=True)

    # ---------------- (b) Youtube-scale throughput ----------------
    if not os.path.exists(YT_PATH):
        rng = np.random.default_rng(7)
        n, e = 1_100_000, 5_000_000
        src = rng.integers(0, n, e)
        dst = rng.integers(0, n, e)
        with open(YT_PATH, "w") as f:
            np.savetxt(f, np.stack([src, dst], 1), fmt="u%d u%d 1")
    gy = Graph.load_edge_list(YT_PATH, undirected=True)
    my = LINE(gy, seed=0)
    my.init(dim=64, order=2)
    my.train(sample_times=1, verbose=False)  # warm/compile (new shapes)
    t0 = time.time()
    my.train(sample_times=40, verbose=False)
    float(my.state["vertex"][0, 0])
    dt = time.time() - t0
    print(f"youtube-scale (1.1M vertices, 10M edges): "
          f"{40/dt:.1f} M samples/s wall", flush=True)


if __name__ == "__main__":
    main()
