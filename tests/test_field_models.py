"""GCN/TextGCN/CSE/FINE/ECO: smoke + learning tests on a doc-word /
user-item style field graph."""

import numpy as np
import pytest

from smore_tpu.graph.graph import Graph
from smore_tpu.models.cse import NEMF, NERANK
from smore_tpu.models.eco import ECO
from smore_tpu.models.fine import FINE, MSFINE
from smore_tpu.models.gcn import GCN, TEXTGCN


N_U, N_I = 16, 24


@pytest.fixture(scope="module")
def field_graph(tmp_path_factory):
    """Bipartite user-item graph with 2 taste clusters + field file
    (users = field 'u' -> 0, items = field 'i' -> 1)."""
    rng = np.random.default_rng(5)
    edges = []
    for u in range(N_U):
        cl = u % 2
        own = [i for i in range(N_I) if i % 2 == cl]
        for i in rng.choice(own, 8, replace=False):
            edges.append((f"u{u}", f"i{i}", 1.0))
    g = Graph.from_edges(edges, undirected=True)
    p = tmp_path_factory.mktemp("f") / "field.txt"
    p.write_text(
        "".join(
            f"{nm} {'u' if nm.startswith('u') else 'i'}\n" for nm in g.names
        )
    )
    g.load_field_meta(str(p))
    assert g.field_names[0] == "u"  # users are field 0 (sources)
    return g


def _gap(g, wv, wc=None):
    wc = wv if wc is None else wc
    own, other = [], []
    for u in range(N_U):
        for i in range(N_I):
            s = wv[g.name2id[f"u{u}"]] @ wc[g.name2id[f"i{i}"]]
            (own if i % 2 == u % 2 else other).append(s)
    return np.mean(own) - np.mean(other)


def test_gcn_trains(field_graph):
    m = GCN(field_graph, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.02, walk_steps=3, negative_samples=3,
            alpha=0.01, batch=32, steps_per_call=8, verbose=False)
    wv = np.asarray(m.state["vertex"])
    assert np.isfinite(wv).all()
    # On a bipartite graph GCN's CBOW only touches item rows (both sides
    # aggregate the user's item neighbors): check item-item cluster
    # alignment instead of user-item scores.
    g = field_graph
    own, other = [], []
    for i in range(N_I):
        for j in range(i + 1, N_I):
            s = wv[g.name2id[f"i{i}"]] @ wv[g.name2id[f"i{j}"]]
            (own if i % 2 == j % 2 else other).append(s)
    assert np.mean(own) > np.mean(other)


def test_textgcn_trains_and_saves(field_graph, tmp_path):
    m = TEXTGCN(field_graph, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.02, walk_steps=3, negative_samples=3,
            alpha=0.01, batch=32, steps_per_call=8, verbose=False)
    out = tmp_path / "tg.txt"
    m.save_weights(str(out))
    lines = out.read_text().strip().split("\n")
    # field-1 (items here) rows are skipped in the dump
    n_field0 = sum(1 for nm in field_graph.names if nm.startswith("u"))
    assert len(lines) == 1 + n_field0


def test_nemf_learns(field_graph):
    m = NEMF(field_graph, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.05, walk_steps=3, negative_samples=3,
            alpha=0.02, batch=64, steps_per_call=8, verbose=False)
    gap = _gap(
        field_graph,
        np.asarray(m.state["vertexU"]),
        np.asarray(m.state["vertexI"]),
    )
    assert gap > 0.02


def test_nerank_learns_and_saves(field_graph, tmp_path):
    m = NERANK(field_graph, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.05, walk_steps=3, negative_samples=3,
            alpha=0.02, batch=64, steps_per_call=8, verbose=False)
    gap = _gap(
        field_graph,
        np.asarray(m.state["vertexU"]),
        np.asarray(m.state["vertexI"]),
    )
    assert gap > 0.0
    out = tmp_path / "cse.txt"
    m.save_weights(str(out))
    assert out.read_text().split("\n")[0] == f"{field_graph.n_vertices} 16"


def test_fine_learns_and_saves(field_graph, tmp_path):
    m = FINE(field_graph, seed=0)
    m.init(dim=8)
    m.train(sample_times=0.05, walk_steps=2, negative_samples=3,
            alpha=0.02, batch=64, steps_per_call=8, verbose=False)
    wv = np.asarray(m.state["vertex"])
    assert np.isfinite(wv).all()
    out = tmp_path / "fine.txt"
    m.save_weights(str(out))
    first = out.read_text().split("\n")[1].split()
    assert len(first) == 1 + 2 * 8  # name + both field projections


def test_msfine_trains(field_graph):
    m = MSFINE(field_graph, seed=0)
    m.init(dim=8)
    m.train(sample_times=0.02, walk_steps=2, negative_samples=3,
            alpha=0.02, batch=32, steps_per_call=8, verbose=False)
    assert np.isfinite(np.asarray(m.state["vertex"])).all()


def test_eco_learns(field_graph):
    m = ECO(field_graph, seed=0)
    m.init(dim=16)
    m.train(sample_times=0.05, negative_samples=3, alpha=0.005,
            batch=32, steps_per_call=8, verbose=False)
    wv = np.asarray(m.state["vertex"])
    assert np.isfinite(wv).all()
    assert _gap(field_graph, wv) > 0.0


@pytest.mark.parametrize("head", ["hop_choice", "recall_rank"])
def test_eco_alternate_heads_learn(field_graph, head):
    """The reference's commented-out Choice alternates (ECO.cpp:103-110)
    as selectable heads: UpdateHOPChoice / UpdateRecallRank get a
    model-level consumer."""
    m = ECO(field_graph, seed=0, head=head)
    m.init(dim=16)
    m.train(sample_times=0.05, negative_samples=3, alpha=0.005,
            batch=32, steps_per_call=8, verbose=False)
    wv = np.asarray(m.state["vertex"])
    assert np.isfinite(wv).all()
    assert _gap(field_graph, wv) > 0.0


def test_eco_rejects_unknown_head(field_graph):
    with pytest.raises(ValueError):
        ECO(field_graph, head="nope")


def test_textgcndev_trains_and_saves(tmp_path_factory, tmp_path):
    """user-event-word 3-field graph for the dev CBOW variant."""
    from smore_tpu.models.gcn import TEXTGCNdev

    rng = np.random.default_rng(17)
    edges, fields = [], []
    for u in range(8):
        for e in rng.choice(6, 3, replace=False):
            edges.append((f"u{u}", f"e{e}", 1.0))
    for e in range(6):
        for w in rng.choice(10, 4, replace=False):
            edges.append((f"e{e}", f"w{w}", 1.0))
    g = Graph.from_edges(edges, undirected=True)
    p = tmp_path_factory.mktemp("tgd") / "field.txt"
    p.write_text("".join(
        f"{nm} {'u' if nm[0] == 'u' else 'e' if nm[0] == 'e' else 'w'}\n"
        for nm in g.names
    ))
    g.load_field_meta(str(p))
    assert g.field_names[0] == "u" and g.field_names[1] == "e"

    m = TEXTGCNdev(g, seed=0)
    m.init(dim=8)
    m.train(sample_times=0.01, num_events=2, num_words=3,
            negative_samples=2, alpha=0.01, batch=16, steps_per_call=4,
            verbose=False)
    assert np.isfinite(np.asarray(m.state["vertex"])).all()
    out = tmp_path / "tgd.txt"
    m.save_weights(str(out))
    lines = out.read_text().strip().split("\n")
    n_kept = sum(1 for nm in g.names if not nm.startswith("e"))
    assert lines[0] == f"{n_kept} 8"
    assert len(lines) == 1 + n_kept


def test_eco_recall_rank_negatives_are_field_matched(field_graph):
    """The recall_rank head's negatives must share the positive's field
    (reference rejection loop proNet.cpp:1924-1926): probe the step's
    drawn negatives via the neg FieldTables it builds."""
    import jax
    import jax.numpy as jnp
    from smore_tpu.sampling.fields import FieldTables

    g = field_graph
    neg_t = FieldTables.build(g)
    # sample positives of each field and draw matched negatives
    pos = jnp.asarray(
        np.concatenate([np.arange(0, g.n_vertices, 2),
                        np.arange(1, g.n_vertices, 2)]).astype(np.int32)
    )
    fids = neg_t.field_of_v(pos)
    negs = neg_t.negative_field_sample(
        jax.random.PRNGKey(0),
        jnp.broadcast_to(fids[:, None], (len(pos), 16)),
    )
    nf = np.asarray(neg_t.field_of_v(negs.reshape(-1)))
    pf = np.repeat(np.asarray(fids), 16)
    assert (nf == pf).all()


def test_eco_hop_choice_negative_law_is_degree_power(field_graph):
    """hop_choice negatives follow degree^0.75 (NegativeSample,
    proNet.cpp:2161) -- not uniform."""
    import jax
    from smore_tpu.sampling.tables import SamplerTables

    g = field_graph
    t = SamplerTables.build(g)
    draws = np.asarray(
        t.negative_sample(jax.random.PRNGKey(1), (120_000,))
    )
    emp = np.bincount(draws, minlength=g.n_vertices) / len(draws)
    w = (g.out_degree + g.in_degree) ** 0.75
    np.testing.assert_allclose(emp, w / w.sum(), atol=0.01)
