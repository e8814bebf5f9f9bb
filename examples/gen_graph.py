"""Synthesize the example graphs (see bench.py for the generators).

  --scale community  50k-vertex / ~2M-edge planted-community graph
                     (the official 50k bench workload)
  --scale youtube    ~1.1M-vertex / ~3M-link power-law graph, a faithful
                     stand-in for Youtube-links (zero-egress env; same
                     shape as the graph example/train_youtube.sh fetches)
"""
import argparse
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_graph, make_youtube_graph  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--scale", choices=("community", "youtube"),
                    default="community")
    ap.add_argument("--out", default=None,
                    help="output edge-list path (src dst weight)")
    ap.add_argument("pos_out", nargs="?", default=None,
                    help="positional output path (legacy form)")
    a = ap.parse_args()
    out = a.out or a.pos_out or "/tmp/smore_example_net.txt"
    if a.scale == "youtube":
        make_youtube_graph(out)
    else:
        make_graph(out)
    print(f"graph written: {out}")


if __name__ == "__main__":
    main()
