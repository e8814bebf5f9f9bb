"""Bisect the Ks (shared-negative pool) remote-AOT-compile crash.

Round-3 finding (PERF_NOTES): Ks=2048 on the fused banded path crashed
the remote AOT compile service (HTTP 500, ~1h outage). This bisects
Ks on the PRODUCTION multiband path at YT scale, one subprocess per
Ks so a compiler fault can't take the harness down, smallest first.

Run LAST in a session: a crash can still take the remote compile
service down; the bench executables are in the local persistent cache
(~/.cache/smore_tpu_xla) so the end-of-round bench survives.

Usage: python experiments/ks_bisect.py [Ks ...]   (default 256 512
1024 1536 2048)
"""

from __future__ import annotations

import subprocess
import sys
import time

CHILD = r"""
import sys, time
sys.path.insert(0, "/root/repo")
from smore_tpu.graph.graph import Graph
from smore_tpu.models.line import LINE

ks = int(sys.argv[1])
g = Graph.load_edge_list("/tmp/yt_faithful_net.txt", undirected=True)
m = LINE(g, seed=0)
m.init(dim=64, order=2)
t0 = time.time()
m.train(sample_times=1, negative_samples=5, alpha=0.025,
        shared_negatives=ks, steps_per_call=256, verbose=False)
float(m.state["vertex"][0, 0])
t_compile = time.time() - t0
t0 = time.time()
m.train(sample_times=30, negative_samples=5, alpha=0.025,
        shared_negatives=ks, steps_per_call=12800, verbose=False)
float(m.state["vertex"][0, 0])
dt = time.time() - t0
sps = m.last_driver.executed_samples / dt
print(f"KS_OK {ks} compile+first={t_compile:.0f}s "
      f"rate={sps/1e6:.1f}M/s", flush=True)
"""


def main():
    ks_list = [int(a) for a in sys.argv[1:]] or [256, 512, 1024, 1536,
                                                 2048]
    sys.path.insert(0, "/root/repo")
    from bench import make_youtube_graph  # noqa: E402

    make_youtube_graph("/tmp/yt_faithful_net.txt")
    for ks in ks_list:
        t0 = time.time()
        r = subprocess.run([sys.executable, "-c", CHILD, str(ks)],
                           capture_output=True, text=True)
        tail = (r.stdout.strip().splitlines() or ["<no stdout>"])[-1]
        if r.returncode == 0 and "KS_OK" in r.stdout:
            print(f"Ks={ks}: OK   {tail} (wall {time.time()-t0:.0f}s)",
                  flush=True)
        else:
            err = (r.stderr.strip().splitlines() or ["<no stderr>"])[-1]
            print(f"Ks={ks}: FAIL rc={r.returncode} ({err[:300]}) "
                  f"(wall {time.time()-t0:.0f}s)", flush=True)
            print("stopping: compile service may need ~1h to recover",
                  flush=True)
            break


if __name__ == "__main__":
    main()
