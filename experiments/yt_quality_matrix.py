"""Isolate the undertrained-regime AUC gap at Youtube scale:
reference 0.6114 @40M vs ours (banded, group=8) 0.5708.
Matrix: {banded, unbanded} x {group 8, 1} (+ banded@higher budget)."""
import sys, time
sys.path.insert(0, "/root/repo")
from yt_scale_bench import YT, community_auc
from bench import make_youtube_graph
import numpy as np


def run(banded, group, st):
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE
    g = Graph.load_edge_list(YT, undirected=True)
    m = LINE(g, seed=0)
    m.init(dim=64, order=2)
    t0 = time.time()
    m.train(sample_times=st, banded=banded, group=group, verbose=False)
    float(m.state["vertex"][0, 0])
    auc = community_auc(np.asarray(m.state["vertex"]), m.graph.names)
    print(f"banded={banded} group={group} @{st}M: AUC={auc:.4f} "
          f"({time.time()-t0:.0f}s)", flush=True)


make_youtube_graph(YT)
for args in sys.argv[1:] or ["True,8,40", "False,8,40", "True,1,40",
                             "True,8,120"]:
    b, gp, st = args.split(",")
    run(b == "True", int(gp), int(st))
