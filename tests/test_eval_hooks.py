"""Model self-evaluation hooks, mirroring the Go reference's in-model
metrics (SURVEY.md section 4): node2vec ComputeHomophily, CTDNE
ComputeTemporalCoherence, SNE ComputeBalanceRatio/PredictSign, and the
KG-family EvaluateLinkPrediction."""

import numpy as np
import pytest

from smore_tpu.graph.graph import Graph


def test_node2vec_homophily():
    from smore_tpu.models.node2vec import Node2Vec

    g = Graph.from_edges(
        [("a", "b", 1), ("b", "c", 1), ("c", "a", 1), ("d", "e", 1)],
        undirected=True,
    )
    m = Node2Vec(g)
    m.init(dim=8)
    m.train(walk_times=1, verbose=False)
    h = m.compute_homophily()
    assert 0.0 <= h <= 1.0


def test_sne_balance_ratio(tmp_path):
    from smore_tpu.models.sne import SNE

    p = tmp_path / "signed.txt"
    p.write_text("a b 1\nb c 1\nc d -1\nd a -1\n")
    m = SNE.load_edge_list(str(p))
    m.init(dim=8)
    m.train(epochs=2, batch=16, verbose=False)
    r = m.compute_balance_ratio()
    assert 0.0 <= r <= 1.0
    assert isinstance(m.predict_sign(0, 1), float)


def test_ctdne_temporal_coherence(tmp_path):
    from smore_tpu.models.ctdne import CTDNE

    p = tmp_path / "temporal.txt"
    p.write_text("a b 1 1\nb c 1 2\nc d 1 3\nd a 1 4\n")
    m = CTDNE.load_edge_list(str(p))
    m.init(dim=8)
    m.train(walk_times=1, walk_steps=3, batch_walks=8, verbose=False)
    c = m.compute_temporal_coherence()
    assert -1.0 <= c <= 1.0


@pytest.mark.parametrize("cls_name", ["TransE", "RotatE", "ComplEx"])
def test_kg_link_prediction(tmp_path, cls_name, rng):
    import smore_tpu.models.kg as kg_mod

    p = tmp_path / "triples.txt"
    lines = [
        f"e{rng.integers(0, 20)} r{rng.integers(0, 3)} e{rng.integers(0, 20)} 1"
        for _ in range(200)
    ]
    p.write_text("\n".join(lines) + "\n")
    m = getattr(kg_mod, cls_name).load_triples(str(p))
    m.init(dim=8)
    m.train(epochs=2, batch=64, verbose=False)
    mrr, hits3 = m.evaluate_link_prediction(test_triples=50)
    assert 0.0 < mrr <= 1.0
    assert 0.0 <= hits3 <= 1.0
