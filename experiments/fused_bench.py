"""Fused banded SGNS kernel at Youtube scale: throughput vs the unfused
banded path, plus the 40M community-AUC quality gate for the fused
config (band 16392, group=1).

Run on the real TPU: python experiments/fused_bench.py [perf|quality]
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

from bench import make_youtube_graph  # noqa: E402
from yt_scale_bench import YT, community_auc  # noqa: E402


def run(use_pallas, sample_times, quality=False, tag=""):
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE

    g = Graph.load_edge_list(YT, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    kw = dict(banded=True, use_pallas=use_pallas, verbose=False)
    m.train(sample_times=1, **kw)
    float(m.state["vertex"][0, 0])
    t0 = time.time()
    m.train(sample_times=sample_times, **kw)
    float(m.state["vertex"][0, 0])
    dt = time.time() - t0
    print(f"{tag or use_pallas} @{sample_times}M: "
          f"{sample_times/dt:.2f} M samples/s ({dt:.1f}s)", flush=True)
    if quality:
        auc = community_auc(np.asarray(m.state["vertex"]), m.graph.names)
        print(f"  -> community-AUC @{sample_times}M: {auc:.4f}", flush=True)


def main():
    make_youtube_graph(YT)
    want = sys.argv[1:] or ["perf", "quality"]
    if "perf" in want:
        run(True, 100, tag="fused")
        run(False, 100, tag="unfused-xla")
    if "quality" in want:
        run(True, 40, quality=True, tag="fused")


if __name__ == "__main__":
    main()
