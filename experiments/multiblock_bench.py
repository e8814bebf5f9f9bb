"""DMA-staged multiblock banded SGNS kernel at Youtube scale.

Round-4 headline (VERDICT item 1): sgns_banded_multiblock rewritten
with in-kernel DMA band staging (two VMEM band buffers instead of the
round-3 grid pipeline's ~16 staged block buffers that scoped-VMEM
OOMed). Measures throughput at the quality-proven visit size (batch
2048, band 16392 -- the exact-parity config that ran 8.6 M samples/s on
the per-micro-step path) and the 40M community-AUC gate.

Run on real TPU:
  python experiments/multiblock_bench.py perf     # throughput sweep
  python experiments/multiblock_bench.py quality  # 40M gate AUC
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from bench import make_youtube_graph  # noqa: E402
from yt_scale_bench import YT, community_auc  # noqa: E402


def run(batch, hoist, band_size, sample_times, quality=False,
        stream=False):
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE

    g = Graph.load_edge_list(YT, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    kw = dict(banded=True, multiband=True, batch=batch, hoist=hoist,
              band_size=band_size, verbose=False, edge_stream=stream)
    m.train(sample_times=1, **kw)
    float(m.state["vertex"][0, 0])
    t0 = time.time()
    m.train(sample_times=sample_times, **kw)
    float(m.state["vertex"][0, 0])
    dt = time.time() - t0
    print(f"multiblock b={batch} S={hoist} band={band_size} "
          f"stream={int(stream)} @{sample_times}M: "
          f"{sample_times/dt:.2f} M samples/s ({dt:.1f}s)", flush=True)
    if quality:
        auc = community_auc(np.asarray(m.state["vertex"]), m.graph.names)
        print(f"  -> community-AUC @{sample_times}M: {auc:.4f}",
              flush=True)


def main():
    make_youtube_graph(YT)
    want = sys.argv[1:] or ["perf"]
    if "perf" in want:
        run(2048, 16, 8200, 100, stream=True)
        run(2048, 32, 8200, 100, stream=True)
        run(4096, 16, 8200, 100, stream=True)
        run(2048, 16, 8200, 100, stream=False)
    if "quality" in want:
        run(2048, 32, 8200, 40, quality=True, stream=True)
        run(4096, 16, 8200, 40, quality=True, stream=True)
        run(2048, 32, 8200, 400, quality=True, stream=True)
        run(4096, 16, 8200, 400, quality=True, stream=True)


if __name__ == "__main__":
    main()
