"""Synthesize the example community graph (see bench.py for the full
generator rationale)."""
import sys

sys.path.insert(0, __file__.rsplit("/", 2)[0])
from bench import make_graph  # noqa: E402

make_graph(sys.argv[1] if len(sys.argv) > 1 else "/tmp/smore_example_net.txt")
print("graph written")
