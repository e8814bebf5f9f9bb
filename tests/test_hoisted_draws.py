"""Hoisted mega-draw tests (VERDICT r1 #8): draw_edge_batches_hoisted must
preserve the per-sample (src, pos) joint law of the per-step grouped draw
(the hoist only changes WHEN draws happen, never their distribution), and
LINE's production hoist path must still learn graph structure."""

import jax
import numpy as np
import pytest

from smore_tpu.graph.graph import Graph
from smore_tpu.models.line import LINE
from smore_tpu.sampling.tables import SamplerTables


@pytest.fixture
def tables(toy_graph):
    return SamplerTables.build(toy_graph)


def test_hoisted_draw_shapes_and_group_layout(toy_graph, tables):
    S, B, G, K = 5, 32, 4, 8
    src, pos, negs = tables.draw_edge_batches_hoisted(
        jax.random.PRNGKey(0), B, G, K, S
    )
    assert src.shape == (S, B) and pos.shape == (S, B)
    assert negs.shape == (S, K)
    src = np.asarray(src)
    # groups of G consecutive elements share a source, per step row
    grouped = src.reshape(S, -1, G)
    assert (grouped == grouped[:, :, :1]).all()
    assert np.isin(np.asarray(negs), np.arange(toy_graph.n_vertices)).all()


def test_hoisted_draw_matches_grouped_joint_law(toy_graph, tables):
    """Same expected (src, pos) joint as test_grouped_edge_batch_joint_law:
    hoisting S steps into one draw is a pure batching transform."""
    S, B, G = 10, 4_000, 4
    src, pos, _ = tables.draw_edge_batches_hoisted(
        jax.random.PRNGKey(6), B, G, 16, S
    )
    src = np.asarray(src).ravel()
    pos = np.asarray(pos).ravel()
    n = len(src)

    g = toy_graph
    vmass = g.out_degree**0.75
    p_src = vmass / vmass.sum()
    seg = np.repeat(np.arange(g.n_vertices), np.diff(g.indptr))
    w75 = g.weights**0.75
    z = np.bincount(seg, weights=w75, minlength=g.n_vertices)
    expect = {}
    for e in range(g.n_edges):
        k = (seg[e], g.indices[e])
        expect[k] = expect.get(k, 0.0) + p_src[seg[e]] * w75[e] / z[seg[e]]
    emp = {}
    for s, p in zip(src, pos):
        emp[(s, p)] = emp.get((s, p), 0) + 1.0 / n
    for k, v in expect.items():
        assert abs(emp.get(k, 0.0) - v) < 0.015, (k, emp.get(k, 0.0), v)


def test_hoisted_negative_distribution(toy_graph, tables):
    g = toy_graph
    _, _, negs = tables.draw_edge_batches_hoisted(
        jax.random.PRNGKey(3), 256, 4, 64, 8
    )
    draws = np.asarray(negs).ravel()
    # widen the sample for a stable histogram
    _, _, negs2 = tables.draw_edge_batches_hoisted(
        jax.random.PRNGKey(4), 256, 4, 512, 16
    )
    draws = np.concatenate([draws, np.asarray(negs2).ravel()])
    emp = np.bincount(draws, minlength=g.n_vertices) / len(draws)
    w = (g.out_degree + g.in_degree) ** 0.75
    np.testing.assert_allclose(emp, w / w.sum(), atol=0.02)


def _comm_graph():
    rng = np.random.default_rng(7)
    edges = []
    for base in (0, 12):
        for i in range(12):
            for j in range(i + 1, 12):
                if rng.random() < 0.6:
                    edges.append((f"v{base + i}", f"v{base + j}", 1.0))
    edges.append(("v0", "v12", 1.0))
    return Graph.from_edges(edges, undirected=True)


def _sep(m, g):
    wv = np.asarray(m.state["vertex"])
    wv = wv / (np.linalg.norm(wv, axis=1, keepdims=True) + 1e-9)
    intra, cross = [], []
    for a in range(0, 24, 3):
        for b in range(1, 24, 3):
            s = wv[g.name2id[f"v{a}"]] @ wv[g.name2id[f"v{b}"]]
            (intra if (a < 12) == (b < 12) else cross).append(s)
    return np.mean(intra) - np.mean(cross)


@pytest.mark.parametrize("order", [1, 2])
def test_line_hoist_path_learns_communities(order):
    g = _comm_graph()
    m = LINE(g, seed=0)
    m.init(dim=16, order=order)
    m.train(sample_times=0.05, negative_samples=5, alpha=0.02, batch=16,
            group=8, hoist=8, steps_per_call=32, collision="mean",
            banded=False, verbose=False)
    assert np.isfinite(np.asarray(m.state["vertex"])).all()
    assert _sep(m, g) > 0.2


def test_banded_hoisted_draw_matches_exact_joint_law(toy_graph):
    """The mixture over hoisted steps must telescope to the exact
    unbanded joint edge law (same check as the per-step banded draw;
    each STEP contributes one band draw, so use many small steps)."""
    from smore_tpu.sampling.banded import BandedTables
    from smore_tpu.sampling.tables import _vertex_distribution

    bt = BandedTables.build(toy_graph, band_size=4, two_d=True)
    S, B, G = 3000, 32, 1
    sb, db, src, pos, negs = bt.draw_banded_batches_hoisted(
        jax.random.PRNGKey(0), B, G, 16, S
    )
    assert sb.shape == (S,) and db.shape == (S,)
    assert src.shape == (S, B) and pos.shape == (S, B)
    assert negs.shape == (S, 16)
    # per-step band consistency: all pos/src in step i fall in its band
    db_np, pos_np = np.asarray(db)[:, None], np.asarray(pos)
    assert ((pos_np >= db_np) & (pos_np < db_np + 4)).all()
    sb_np, src_np = np.asarray(sb)[:, None], np.asarray(src)
    assert ((src_np >= sb_np) & (src_np < sb_np + 4)).all()

    g = toy_graph
    seg = np.repeat(np.arange(g.n_vertices), np.diff(g.indptr))
    vmass = _vertex_distribution(g, "out_degrees").astype(np.float64)
    vmass = np.where(vmass > 0, vmass**0.75, 0.0)
    w = np.asarray(g.weights, dtype=np.float64) ** 0.75
    z = np.zeros(g.n_vertices)
    np.add.at(z, seg, w)
    jw = (vmass[seg] / vmass.sum()) * (w / z[seg])
    expect = {}
    for e in range(g.n_edges):
        k = (seg[e], g.indices[e])
        expect[k] = expect.get(k, 0.0) + jw[e]
    emp = {}
    n = S * B
    for s, p in zip(src_np.ravel(), pos_np.ravel()):
        emp[(s, p)] = emp.get((s, p), 0) + 1.0 / n
    for k, v in expect.items():
        assert abs(emp.get(k, 0.0) - v) < 0.02, (k, emp.get(k, 0.0), v)


def test_banded_hoisted_draw_grouped(toy_graph):
    from smore_tpu.sampling.banded import BandedTables

    bt = BandedTables.build(toy_graph, band_size=4, two_d=True)
    S, B, G = 6, 32, 4
    sb, db, src, pos, negs = bt.draw_banded_batches_hoisted(
        jax.random.PRNGKey(1), B, G, 8, S
    )
    src = np.asarray(src)
    grouped = src.reshape(S, -1, G)
    assert (grouped == grouped[:, :, :1]).all()
    db_np = np.asarray(db)[:, None]
    pos_np = np.asarray(pos)
    assert ((pos_np >= db_np) & (pos_np < db_np + 4)).all()


@pytest.mark.parametrize("order", [1, 2])
def test_line_banded_hoist_quality(order):
    """Banded + hoist e2e: same community quality as banded hoist=1."""
    g = _comm_graph()
    seps = {}
    for hoist in (1, 4):
        m = LINE(g, seed=0)
        m.init(dim=16, order=order)
        m.train(sample_times=0.1, negative_samples=5, alpha=0.02,
                batch=32, group=1, hoist=hoist, steps_per_call=32,
                banded=True, band_size=8, verbose=False)
        assert np.isfinite(np.asarray(m.state["vertex"])).all()
        seps[hoist] = _sep(m, g)
    assert seps[4] > 0.15, seps
    assert abs(seps[4] - seps[1]) < 0.25, seps


@pytest.mark.parametrize("cls_name", ["BPR", "MF", "WARP"])
def test_rec_hoist_path_trains(cls_name):
    """Rec-family hoist: same mega-draw transform; model still learns
    (connected pairs outscore random) and stays finite."""
    from smore_tpu.models import rec

    g = _comm_graph()
    m = getattr(rec, cls_name)(g, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.05, alpha=0.02, batch=32, hoist=4,
            steps_per_call=32, collision="mean", verbose=False)
    assert np.isfinite(np.asarray(m.state["vertex"])).all()
    assert _sep(m, g) > 0.1


def test_deepwalk_hoist_path_learns_communities():
    from smore_tpu.models.deepwalk import DeepWalk

    g = _comm_graph()
    m = DeepWalk(g, seed=0)
    m.init(dim=16)
    m.train(walk_times=60, walk_steps=10, window_size=3,
            negative_samples=5, alpha=0.01, batch_walks=8, hoist=4,
            steps_per_call=8, collision="sum", verbose=False)
    assert np.isfinite(np.asarray(m.state["vertex"])).all()
    assert _sep(m, g) > 0.2


def test_hpe_hoist_path_trains():
    from smore_tpu.models.hpe import HPE

    g = _comm_graph()
    m = HPE(g, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.05, walk_steps=3, alpha=0.02, batch=32,
            hoist=4, steps_per_call=32, collision="mean", verbose=False)
    assert np.isfinite(np.asarray(m.state["vertex"])).all()
    assert _sep(m, g) > 0.1
