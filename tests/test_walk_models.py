"""End-to-end quality gates for walk-based models on a two-community
graph: intra-community pairs must score above cross-community pairs."""

import numpy as np
import pytest

from smore_tpu.graph.graph import Graph
from smore_tpu.models.app import APP
from smore_tpu.models.deepwalk import DeepWalk
from smore_tpu.models.node2vec import Node2Vec
from smore_tpu.models.walklets import Walklets


@pytest.fixture(scope="module")
def comm_graph():
    """Two dense 12-vertex communities + one bridge edge."""
    rng = np.random.default_rng(7)
    edges = []
    for base in (0, 12):
        for i in range(12):
            for j in range(i + 1, 12):
                if rng.random() < 0.6:
                    edges.append((f"v{base + i}", f"v{base + j}", 1.0))
    edges.append(("v0", "v12", 1.0))
    return Graph.from_edges(edges, undirected=True)


def _separation(m, g):
    wv = np.asarray(m.state["vertex"])
    wv = wv / (np.linalg.norm(wv, axis=1, keepdims=True) + 1e-9)
    intra, cross = [], []
    for a in range(0, 24, 3):
        for b in range(1, 24, 3):
            ia, ib = g.name2id[f"v{a}"], g.name2id[f"v{b}"]
            s = wv[ia] @ wv[ib]
            (intra if (a < 12) == (b < 12) else cross).append(s)
    return np.mean(intra) - np.mean(cross)


# Tiny-graph config: collision="sum" + small batch + modest alpha. With 24
# vertices a large batch makes every row's update the mean of hundreds of
# colliding pair gradients (collision="mean"), slowing learning to a crawl;
# "sum" with a small batch is closest to the reference's sequential hogwild.
TRAIN_KW = dict(
    walk_times=100, negative_samples=5, alpha=0.01,
    batch_walks=8, steps_per_call=16, collision="sum", verbose=False,
)


def test_deepwalk_learns_communities(comm_graph):
    m = DeepWalk(comm_graph, seed=0)
    m.init(dim=16)
    m.train(walk_steps=10, window_size=3, **TRAIN_KW)
    assert _separation(m, comm_graph) > 0.2


def test_walklets_learns_communities(comm_graph):
    m = Walklets(comm_graph, seed=0)
    m.init(dim=16)
    m.train(walk_steps=10, window_min=1, window_max=3, **TRAIN_KW)
    assert _separation(m, comm_graph) > 0.2


def test_node2vec_learns_communities(comm_graph):
    m = Node2Vec(comm_graph, seed=0)
    m.init(dim=16)
    m.train(walk_steps=10, window_size=3, p=0.5, q=2.0, **TRAIN_KW)
    assert _separation(m, comm_graph) > 0.2


def test_app_learns_communities(comm_graph):
    m = APP(comm_graph, seed=0)
    m.init(dim=16)
    m.train(walk_times=100, sample_times=4, jump=0.3, negative_samples=5,
            alpha=0.01, batch_walks=64, steps_per_call=16, collision="sum",
            verbose=False)
    # APP scores with vertex . context (asymmetric proximity)
    wv = np.asarray(m.state["vertex"])
    wc = np.asarray(m.state["context"])
    g = comm_graph
    intra, cross = [], []
    for a in range(0, 24, 3):
        for b in range(1, 24, 3):
            ia, ib = g.name2id[f"v{a}"], g.name2id[f"v{b}"]
            s = wv[ia] @ wc[ib]
            (intra if (a < 12) == (b < 12) else cross).append(s)
    assert np.mean(intra) > np.mean(cross)


def test_walk_models_save(comm_graph, tmp_path):
    m = DeepWalk(comm_graph, seed=0)
    m.init(dim=8)
    m.train(walk_times=2, walk_steps=5, window_size=2, negative_samples=2,
            alpha=0.025, batch_walks=32, steps_per_call=2, verbose=False)
    out = tmp_path / "dw.txt"
    m.save_weights(str(out))
    header = out.read_text().split("\n")[0]
    assert header == f"{comm_graph.n_vertices} 8"


def test_truncated_budget_policy_engages(comm_graph=None):
    """The freshness policy must shrink batch/raise micro-steps AND set
    the inner-pass bootstrap compensation ONLY at truncated budgets."""
    from smore_tpu.models.base import freshness_policy

    # default-budget walk config (20k graph, walk_times=10): untouched
    b, h = freshness_policy(200_000, 128, 1)
    assert (b, h) == (128, 1)
    # truncated (walk_times=2): shrink + compensate
    b2, h2 = freshness_policy(40_000, 128, 1)
    assert b2 < 128 and h2 > 1
    # tiny: floors hold
    b3, h3 = freshness_policy(100, 128, 1)
    assert b3 == 8 and h3 <= 64


def test_trunc_mass_multiplier_batch_aware():
    """x3 step mass only in the tiny-rebatch calibration regime; larger
    rebatched steps (e.g. APP's ~1300-row rebatch, where x3 measured a
    table collapse) keep the round-3 x2."""
    from smore_tpu.models.base import trunc_mass_multiplier

    assert trunc_mass_multiplier(8) == 3.0    # node2vec wt=2 regime
    assert trunc_mass_multiplier(26) == 3.0   # deepwalk trunc regime
    assert trunc_mass_multiplier(64) == 3.0   # boundary inclusive
    assert trunc_mass_multiplier(65) == 2.0
    assert trunc_mass_multiplier(1300) == 2.0  # APP rebatch regime
