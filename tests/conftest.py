"""Test configuration: force CPU with 8 virtual devices so multi-chip
sharding paths can be exercised without TPU hardware (SURVEY.md section 4).

Must run before jax is imported anywhere in the test process.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax

# The env var alone is not enough on machines where a TPU platform plugin
# (axon) is installed -- it stomps JAX_PLATFORMS. The config update wins.
jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


TOY_EDGES = [
    ("userA", "itemA", 3.0),
    ("userA", "itemC", 5.0),
    ("userB", "itemA", 1.0),
    ("userB", "itemB", 5.0),
    ("userC", "itemA", 4.0),
]


@pytest.fixture
def toy_net_path(tmp_path):
    """The README toy user-item net (/root/reference/README.md:49-56)."""
    p = tmp_path / "net.txt"
    p.write_text("".join(f"{a} {b} {int(w)}\n" for a, b, w in TOY_EDGES))
    return str(p)


@pytest.fixture
def toy_graph():
    from smore_tpu.graph.graph import Graph

    return Graph.from_edges(TOY_EDGES, undirected=True)


@pytest.fixture
def rng():
    return np.random.default_rng(0)
