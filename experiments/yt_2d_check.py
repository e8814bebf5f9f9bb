"""2D-banded production check at Youtube scale: throughput + AUC@40M
(reference on the same graph/budget: 0.6114; 1D-banded g=1: 0.6137)."""
import sys, time
sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/experiments")
from yt_scale_bench import YT, community_auc
from bench import make_youtube_graph
import numpy as np


def run(group, st, measure_rate=True):
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE
    g = Graph.load_edge_list(YT, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    if measure_rate:
        m.train(sample_times=1, banded=True, group=group, verbose=False,
                steps_per_call=12800)
        float(m.state["vertex"][0, 0])
        t0 = time.time()
        m.train(sample_times=st, banded=True, group=group, verbose=False,
                steps_per_call=12800)
        float(m.state["vertex"][0, 0])
        dt = time.time() - t0
        print(f"2D g={group}: {st/dt:.2f} M samples/s ({st}M in {dt:.1f}s)",
              flush=True)
    else:
        m.train(sample_times=st, banded=True, group=group, verbose=False)
        float(m.state["vertex"][0, 0])
    auc = community_auc(np.asarray(m.state["vertex"]), m.graph.names)
    print(f"2D g={group} @{st}M: AUC={auc:.4f}", flush=True)


make_youtube_graph(YT)
for spec in sys.argv[1:] or ["1,400,rate", "1,40,auc", "4,400,rate"]:
    p = spec.split(",")
    run(int(p[0]), int(p[1]), p[2] == "rate")
