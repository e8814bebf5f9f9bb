"""KG models (TransE/RotatE/ComplEx): loader semantics + link-prediction
learning gates on a synthetic two-relation KG."""

import numpy as np
import pytest

from smore_tpu.graph.knowledge import KnowledgeGraph
from smore_tpu.models.kg import ComplEx, RotatE, TransE


@pytest.fixture(scope="module")
def kg_path(tmp_path_factory):
    """'likes' connects people to foods; 'in' connects foods to cuisines.
    Person p_i likes foods of cuisine (i % 2)."""
    rng = np.random.default_rng(11)
    lines = []
    foods = {0: [f"f{j}" for j in range(0, 12, 2)],
             1: [f"f{j}" for j in range(1, 12, 2)]}
    for c, fs in foods.items():
        for f in fs:
            lines.append(f"{f} in c{c}\n")
    for i in range(16):
        for f in rng.choice(foods[i % 2], 4, replace=False):
            lines.append(f"p{i} likes {f}\n")
    p = tmp_path_factory.mktemp("kg") / "triples.txt"
    p.write_text("".join(lines))
    return str(p)


def test_loader(kg_path):
    kg = KnowledgeGraph.load_triples(kg_path)
    assert kg.n_relations == 2
    assert kg.n_triples == 12 + 16 * 4
    assert kg.n_entities == 16 + 12 + 2
    # per-relation pools contain only entities seen with that relation
    rid = kg.relation2id["in"]
    pool = kg.rel_entities[kg.rel_indptr[rid] : kg.rel_indptr[rid + 1]]
    pool_names = {kg.entities[e] for e in pool}
    assert all(n.startswith(("f", "c")) for n in pool_names)


def _rank_gate(model_cls, kg_path, **kw):
    kg = KnowledgeGraph.load_triples(kg_path)
    m = model_cls(kg, seed=0, **kw)
    m.init(dim=16)
    m.train(epochs=60, batch=32, alpha=0.05, verbose=False)
    # known (p, likes, f) triples must outscore corrupted tails on average
    rid = kg.relation2id["likes"]
    sel = kg.relations == rid
    h = kg.heads[sel][:32]
    t = kg.tails[sel][:32]
    import jax.numpy as jnp

    r = jnp.full((32,), rid, dtype=jnp.int32)
    rng = np.random.default_rng(0)
    t_bad = jnp.asarray(
        rng.integers(0, kg.n_entities, 32), dtype=jnp.int32
    )
    pos = np.asarray(m._score(m.state, jnp.asarray(h), r, jnp.asarray(t)))
    neg = np.asarray(m._score(m.state, jnp.asarray(h), r, t_bad))
    if m._higher_is_better:
        assert pos.mean() > neg.mean()
    else:
        assert pos.mean() < neg.mean()
    return m


def test_transe_learns(kg_path, tmp_path):
    m = _rank_gate(TransE, kg_path, norm=2)
    m.save_embeddings(str(tmp_path / "e.txt"), str(tmp_path / "r.txt"))
    header = (tmp_path / "e.txt").read_text().split("\n")[0]
    assert header == f"{m.kg.n_entities} 16"


def test_transe_l1_learns(kg_path):
    _rank_gate(TransE, kg_path, norm=1)


def test_rotate_learns(kg_path, tmp_path):
    # adversarial_temp must be on the scale of the distances (the Go
    # formula is an ABSOLUTE exp(-negScore/T), rotate.go:191-195 -- with
    # T=1 and distances ~7 the weight collapses to 1e-3 and nothing moves)
    m = _rank_gate(RotatE, kg_path, margin=3.0, adversarial_temp=10.0)
    # relations exported as cos|sin pairs: unit modulus per dim
    rel = np.asarray(m._relation_out())
    d = rel.shape[1] // 2
    np.testing.assert_allclose(
        rel[:, :d] ** 2 + rel[:, d:] ** 2, 1.0, atol=1e-5
    )


def test_complex_learns(kg_path):
    _rank_gate(ComplEx, kg_path)


def test_transe_entities_normalized(kg_path):
    kg = KnowledgeGraph.load_triples(kg_path)
    m = TransE(kg, seed=0)
    m.init(dim=8)
    m.train(epochs=3, batch=16, alpha=0.01, verbose=False)
    norms = np.linalg.norm(np.asarray(m.state["entity"]), axis=1)
    np.testing.assert_allclose(norms, 1.0, atol=1e-5)
