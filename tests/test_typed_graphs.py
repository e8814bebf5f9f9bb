"""Typed-graph stores + their models: SNE, CTDNE, metapath2vec, FastRP."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smore_tpu.graph.hetero import HeteroGraph, HeteroTables
from smore_tpu.graph.signed import SignedNetwork
from smore_tpu.graph.temporal import TemporalGraph, TemporalTables
from smore_tpu.models.ctdne import CTDNE
from smore_tpu.models.fastrp import FastRP
from smore_tpu.models.metapath2vec import Metapath2Vec
from smore_tpu.models.sne import SNE


# ------------------------------- signed -------------------------------- #
@pytest.fixture(scope="module")
def signed_path(tmp_path_factory):
    """Two friendly camps with hostile cross edges."""
    rng = np.random.default_rng(2)
    lines = []
    for camp in (0, 1):
        ids = range(camp * 8, camp * 8 + 8)
        for i in ids:
            for j in ids:
                if i < j and rng.random() < 0.6:
                    lines.append(f"v{i} v{j} +1\n")
    for _ in range(20):
        i = rng.integers(0, 8)
        j = rng.integers(8, 16)
        lines.append(f"v{i} v{j} -1\n")
    p = tmp_path_factory.mktemp("s") / "signed.txt"
    p.write_text("".join(lines))
    return str(p)


def test_signed_loader(signed_path):
    sn = SignedNetwork.load_edge_list(signed_path)
    assert sn.n_vertices == 16
    assert len(sn.neg_src) == 40  # 20 undirected
    assert len(sn.pos_src) % 2 == 0


def test_sne_learns(signed_path):
    sn = SignedNetwork.load_edge_list(signed_path)
    m = SNE(sn, seed=0)
    m.init(dim=16)
    m.train(epochs=200, alpha=0.02, batch=64, steps_per_call=8,
            verbose=False)
    ws = np.asarray(m.state["source"])
    wt = np.asarray(m.state["target"])
    pos_s = np.mean([ws[a] @ wt[b] for a, b in zip(sn.pos_src[:50], sn.pos_dst[:50])])
    neg_s = np.mean([ws[a] @ wt[b] for a, b in zip(sn.neg_src, sn.neg_dst)])
    assert pos_s > neg_s


# ------------------------------ temporal ------------------------------- #
@pytest.fixture(scope="module")
def temporal_path(tmp_path_factory):
    """Chain a->b->c->d with increasing times + a late distractor."""
    lines = ["a b 1\n", "b c 2\n", "c d 3\n", "d e 4\n", "a e 10\n"]
    p = tmp_path_factory.mktemp("t") / "temporal.txt"
    p.write_text("".join(lines))
    return str(p)


def test_temporal_walk_time_increasing(temporal_path):
    tg = TemporalGraph.load_edge_list(temporal_path)
    tt = TemporalTables.build(tg)
    starts = jnp.full((64,), tg.name2id["a"], dtype=jnp.int32)
    t0 = jnp.zeros((64,))
    walk, valid = tt.temporal_walk(jax.random.PRNGKey(0), starts, t0, 4, 100.0)
    w = np.asarray(walk)
    v = np.asarray(valid)
    # from a at t=0, either a->b(1)->c(2)->d(3)->e(4) or a->e(10) then stuck
    for row, vr in zip(w, v):
        seq = [tg.names[i] for i, ok in zip(row, vr) if ok]
        assert seq[0] == "a"
        if len(seq) > 2:
            assert seq[:3] == ["a", "b", "c"]
        elif len(seq) == 2:
            assert seq[1] in ("b", "e")


def test_temporal_walk_window(temporal_path):
    tg = TemporalGraph.load_edge_list(temporal_path)
    tt = TemporalTables.build(tg)
    starts = jnp.full((32,), tg.name2id["a"], dtype=jnp.int32)
    # window 2 from t=8: only the t=10 edge a->e qualifies
    walk, valid = tt.temporal_walk(
        jax.random.PRNGKey(1), starts, jnp.full((32,), 8.0), 3, 2.0
    )
    w, v = np.asarray(walk), np.asarray(valid)
    assert np.all(w[:, 1][v[:, 1] > 0] == tg.name2id["e"])


def test_ctdne_trains(temporal_path):
    tg = TemporalGraph.load_edge_list(temporal_path)
    m = CTDNE(tg, seed=0, time_window=5.0)
    m.init(dim=8)
    m.train(walk_times=20, walk_steps=4, window_size=2,
            negative_samples=2, alpha=0.02, batch_walks=16,
            steps_per_call=4, shared_negatives=8, verbose=False)
    assert np.isfinite(np.asarray(m.state["vertex"])).all()


# ------------------------------- hetero -------------------------------- #
@pytest.fixture(scope="module")
def hetero_path(tmp_path_factory):
    """Authors-papers-venues: a_i writes p_j, p_j published at v_k."""
    rng = np.random.default_rng(9)
    lines = []
    for a in range(8):
        for p in rng.choice(12, 4, replace=False):
            lines.append(f"a{a} author p{p} paper writes\n")
    for p in range(12):
        lines.append(f"p{p} paper v{p % 3} venue published_at\n")
    f = tmp_path_factory.mktemp("h") / "hetero.txt"
    f.write_text("".join(lines))
    return str(f)


def test_hetero_loader_and_walk(hetero_path):
    hg = HeteroGraph.load_edge_list(hetero_path)
    assert set(hg.types) == {"author", "paper", "venue"}
    ht = HeteroTables.build(hg)
    # A-P-A metapath from an author
    pt = jnp.asarray(
        [[hg.type2id["author"], hg.type2id["paper"]]], dtype=jnp.int32
    )
    pl = jnp.asarray([2], dtype=jnp.int32)
    starts = jnp.asarray(
        [hg.name2id[f"a{i}"] for i in range(8)] * 4, dtype=jnp.int32
    )
    walk, valid = ht.metapath_walk(
        jax.random.PRNGKey(0), starts,
        pt, pl, jnp.zeros((32,), dtype=jnp.int32), 6,
    )
    w, v = np.asarray(walk), np.asarray(valid)
    tp = hg.node_type
    for row, vr in zip(w, v):
        for t, (node, ok) in enumerate(zip(row, vr)):
            if ok:
                want = "author" if t % 2 == 0 else "paper"
                assert hg.types[tp[node]] == want


def test_metapath2vec_trains(hetero_path, tmp_path):
    m = Metapath2Vec.load_edge_list(hetero_path, seed=0)
    m.add_meta_path(["author", "paper", "author"])
    m.init(dim=8)
    m.train(walk_times=10, walk_steps=6, window_size=2,
            negative_samples=2, alpha=0.02, batch_walks=16,
            steps_per_call=4, shared_negatives=8, verbose=False)
    out = tmp_path / "m2v.txt"
    m.save_weights(str(out))
    assert out.read_text().split("\n")[0] == f"{m.hg.n_vertices} 8"


def test_metapath_validation(hetero_path):
    m = Metapath2Vec.load_edge_list(hetero_path)
    with pytest.raises(ValueError):
        m.add_meta_path(["author", "nosuch"])
    with pytest.raises(ValueError):
        m.add_meta_path(["author"])


# ------------------------------- fastrp -------------------------------- #
def test_fastrp_two_blocks(tmp_path):
    """Two cliques joined by one edge: FastRP separates them without
    any training."""
    lines = []
    for base in (0, 10):
        for i in range(10):
            for j in range(i + 1, 10):
                lines.append(f"n{base + i} n{base + j} 1\n")
    lines.append("n0 n10 1\n")
    p = tmp_path / "net.txt"
    p.write_text("".join(lines))

    m = FastRP.load_edge_list(str(p), iterations=3,
                              normalization_strength=0.5)
    m.generate(dim=32)
    wv = np.asarray(m.state["vertex"])
    assert wv.shape == (20, 32)
    np.testing.assert_allclose(np.linalg.norm(wv, axis=1), 1.0, atol=1e-5)
    g = m.graph
    intra, cross = [], []
    for i in range(0, 20, 2):
        for j in range(1, 20, 2):
            s = wv[g.name2id[f"n{i}"]] @ wv[g.name2id[f"n{j}"]]
            (intra if (i < 10) == (j < 10) else cross).append(s)
    assert np.mean(intra) > np.mean(cross) + 0.1


# -------------------------------- HAN ---------------------------------- #
def test_han_trains(hetero_path, tmp_path):
    from smore_tpu.models.han import HAN

    m = HAN.load_edge_list(hetero_path, seed=0)
    m.add_meta_path(["author", "paper", "author"])
    m.add_meta_path(["author", "paper", "venue", "paper", "author"])
    m.init(dim=16, learning_rate=0.05)
    m.train(walk_times=3, walk_steps=4, epochs=3, batch=16, verbose=False)
    wv = np.asarray(m.state["embed"])
    assert np.isfinite(wv).all()
    # updated rows are unit-norm (heuristic renormalization)
    norms = np.linalg.norm(wv, axis=1)
    assert (np.abs(norms - 1.0) < 1e-4).sum() > m.hg.n_vertices // 2
    out = tmp_path / "han.txt"
    m.save_weights(str(out))
    assert out.read_text().split("\n")[0] == f"{m.hg.n_vertices} 16"


# ----------------------- host-side query APIs --------------------------- #
def test_temporal_neighbors_window_query(temporal_path):
    """GetTemporalNeighbors parity (temporal_graph.go:181-195): inclusive
    [t0, t1] window over time-sorted out-edges."""
    tg = TemporalGraph.load_edge_list(temporal_path)
    a = tg.name2id["a"]
    # a has out-edges at t=1 (->b) and t=10 (->e)
    assert list(tg.temporal_neighbors(a, 0.0, 5.0)) == [tg.name2id["b"]]
    assert list(tg.temporal_neighbors(a, 1.0, 10.0)) == [
        tg.name2id["b"], tg.name2id["e"]
    ]
    assert list(tg.temporal_neighbors(a, 2.0, 9.0)) == []
    rng = np.random.default_rng(0)
    nid, ts = tg.sample_temporal_neighbor(a, 5.0, 20.0, rng)
    assert nid == tg.name2id["e"] and ts == 10.0
    assert tg.sample_temporal_neighbor(a, 2.0, 9.0, rng) == (-1, 0.0)


def test_hetero_query_apis(hetero_path):
    hg = HeteroGraph.load_edge_list(hetero_path)
    a0 = hg.name2id["a0"]
    nbrs = hg.neighbors_by_type(a0, "paper")
    assert len(nbrs) == hg.neighbor_count(a0, "paper") == 4
    assert all(hg.types[hg.node_type[v]] == "paper" for v in nbrs)
    assert hg.neighbor_count(a0, "venue") == 0
    hg.validate_meta_path(["author", "paper", "author"])
    with pytest.raises(ValueError):
        hg.validate_meta_path(["author"])
    with pytest.raises(ValueError):
        hg.validate_meta_path(["author", "movie"])
