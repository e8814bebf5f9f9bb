"""YT-scale banded multiblock under the hogwild mesh mode (round 5,
VERDICT r4 item 1 "done" criterion): the PRODUCTION fast path on an
8-device CPU mesh vs the same path on 1 device, at Youtube scale.

Replaces experiments/rowshard_bench.py's non-banded rows-mode number as
the scale-out measurement: rowshard measured the PRE-banded step (the
path with the big-table scatter cliff banded was built to remove);
this measures the actual production kernel (interpret mode on CPU --
absolute rates are NOT TPU rates; the comparison is per-device work
split and merge overhead).

Run: XLA_FLAGS=--xla_force_host_platform_device_count=8 \
     JAX_PLATFORMS=cpu python experiments/hogwild_bench.py
"""

from __future__ import annotations

import os
import sys
import time

os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np  # noqa: E402

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")

from bench import YT_GRAPH_PATH, make_youtube_graph, yt_community_auc  # noqa: E402


def run(mesh, tag, budget_m=0.066):
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE

    g = Graph.load_edge_list(YT_GRAPH_PATH, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    # interpret-mode Pallas on CPU pays per-op interpreter cost on the
    # serial row loops, so the budget is small: the measurement shows
    # the production path EXECUTES under the mesh at YT scale and
    # bounds the per-call merge overhead, not absolute rates.
    # edge_stream OFF: a replicated ~0.9 GB stream materializes one
    # copy PER virtual device under the mesh -- host OOM at 8 devices;
    # the hoisted-draw path measures the same kernel.
    kw = dict(negative_samples=5, alpha=0.025, banded=True,
              multiband=True, batch=2048, hoist=4, band_size=16400,
              edge_stream=False, steps_per_call=2, verbose=False)
    m.train(sample_times=0.017, mesh=mesh, **kw)  # warm/compile
    float(m.state["vertex"][0, 0])
    t0 = time.time()
    m.train(sample_times=budget_m, mesh=mesh, **kw)
    float(m.state["vertex"][0, 0])
    dt = time.time() - t0
    rate = m.last_driver.executed_samples / dt
    print(f"{tag}: {rate/1e6:.3f} M samples/s "
          f"({m.last_driver.executed_samples/1e6:.1f}M in {dt:.1f}s, "
          f"n_shards={m.last_driver.n_shards})", flush=True)
    return m, rate


def main():
    make_youtube_graph(YT_GRAPH_PATH)
    from smore_tpu.parallel.mesh import make_mesh

    n = len(jax.devices())
    assert n >= 8, f"need 8 virtual devices, have {n} (set XLA_FLAGS)"
    _, r1 = run(None, "single-device CPU (banded multiblock)")
    m8, r8 = run(make_mesh(8), "8-device CPU mesh (hogwild merge)")
    print(f"scale-out: {r8/r1:.2f}x on 8 devices "
          f"(efficiency {r8/r1/8:.2f}; CPU-mesh devices share the same "
          f"host cores, so this measures merge/compile overhead, not "
          f"8 real chips)", flush=True)
    auc = yt_community_auc(np.asarray(m8.state["vertex"]), m8.graph.names)
    print(f"hogwild 8-dev community-AUC @~0.5M samples: {auc:.4f} "
          f"(early-budget sanity, not the 40M gate)", flush=True)


if __name__ == "__main__":
    main()
