"""On-device sampler distribution tests (SamplerTables draws run under jit
on the CPU test backend; same code path as TPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smore_tpu.sampling.tables import SamplerTables


@pytest.fixture
def tables(toy_graph):
    return SamplerTables.build(toy_graph)


def test_source_sample_distribution(toy_graph, tables):
    g = toy_graph
    key = jax.random.PRNGKey(0)
    draws = np.asarray(tables.source_sample(key, (100_000,)))
    emp = np.bincount(draws, minlength=g.n_vertices) / len(draws)
    w = g.out_degree**0.75  # POWER_SAMPLE quirk: vertex table is ^0.75 too
    expect = w / w.sum()
    np.testing.assert_allclose(emp, expect, atol=0.01)


def test_negative_sample_distribution(toy_graph, tables):
    g = toy_graph
    key = jax.random.PRNGKey(1)
    draws = np.asarray(tables.negative_sample(key, (100_000,)))
    emp = np.bincount(draws, minlength=g.n_vertices) / len(draws)
    w = (g.out_degree + g.in_degree) ** 0.75
    expect = w / w.sum()
    np.testing.assert_allclose(emp, expect, atol=0.01)


def test_target_sample_per_vertex(toy_graph, tables):
    g = toy_graph
    a = g.name2id["userA"]
    key = jax.random.PRNGKey(2)
    vids = jnp.full((100_000,), a, dtype=jnp.int32)
    draws = np.asarray(tables.target_sample(key, vids))
    emp = np.bincount(draws, minlength=g.n_vertices) / len(draws)
    # userA -> itemA (w=3), itemC (w=5), each ^0.75-normalized in-segment
    w = np.zeros(g.n_vertices)
    w[g.name2id["itemA"]] = 3.0**0.75
    w[g.name2id["itemC"]] = 5.0**0.75
    expect = w / w.sum()
    np.testing.assert_allclose(emp, expect, atol=0.01)


def test_target_sample_zero_degree_returns_self():
    from smore_tpu.graph.graph import Graph

    g = Graph.from_edges([("a", "b", 1.0)], undirected=False)
    t = SamplerTables.build(g, vertex_method="no_degrees")
    b = g.name2id["b"]
    out = np.asarray(
        t.target_sample(jax.random.PRNGKey(0), jnp.full((64,), b, jnp.int32))
    )
    assert (out == b).all()


def test_draws_jit_and_scan_safe(tables):
    """Sampler must be traceable inside jit+scan (the training hot path)."""

    @jax.jit
    def run(key):
        def body(key, _):
            key, sub = jax.random.split(key)
            k1, k2 = jax.random.split(sub)
            src = tables.source_sample(k1, (16,))
            pos = tables.target_sample(k2, src)
            return key, (src, pos)

        _, (srcs, poss) = jax.lax.scan(body, key, None, length=4)
        return srcs, poss

    srcs, poss = run(jax.random.PRNGKey(0))
    assert srcs.shape == (4, 16)
    assert poss.shape == (4, 16)
