"""Walk generators and pair mappers: shape/semantics golden tests on
deterministic tiny graphs (SURVEY.md section 4 test strategy)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from smore_tpu.graph.graph import Graph
from smore_tpu.sampling.mappers import (
    cbow_groups,
    ordinal_pairs,
    scale_skipgram_pairs,
    skipgram_pairs,
)
from smore_tpu.sampling.tables import SamplerTables
from smore_tpu.sampling.walks import (
    NeighborIndex,
    jumping_walk_endpoints,
    node2vec_walk,
    random_walk,
)


@pytest.fixture(scope="module")
def ring_graph():
    # directed ring 0->1->2->...->9->0 plus a dead-end vertex 10 (0->10)
    edges = [(f"v{i}", f"v{(i + 1) % 10}", 1.0) for i in range(10)]
    edges.append(("v0", "v10", 1.0))
    return Graph.from_edges(edges, undirected=False)


@pytest.fixture(scope="module")
def ring_tables(ring_graph):
    return SamplerTables.build(ring_graph)


def test_random_walk_follows_edges(ring_graph, ring_tables):
    starts = jnp.arange(10, dtype=jnp.int32)
    walk, row_mask = random_walk(ring_tables, jax.random.PRNGKey(0), starts, 8)
    assert walk.shape == (10, 9)
    assert np.all(np.asarray(row_mask) == 1.0)
    w = np.asarray(walk)
    indptr, indices = ring_graph.indptr, ring_graph.indices
    for b in range(10):
        for t in range(8):
            a, c = w[b, t], w[b, t + 1]
            nbrs = indices[indptr[a] : indptr[a + 1]]
            # either followed an edge, or hit the dead end and restarted
            if c not in nbrs:
                assert len(nbrs) == 0 or a == 10
                # after a dead end the cursor resets to start then samples
                s = w[b, 0]
                assert c in indices[indptr[s] : indptr[s + 1]]


def test_random_walk_deadend_start_masked(ring_tables):
    starts = jnp.asarray([10], dtype=jnp.int32)  # vertex with no out-edges
    walk, row_mask = random_walk(ring_tables, jax.random.PRNGKey(0), starts, 5)
    assert float(row_mask[0]) == 0.0
    assert np.all(np.asarray(walk) == 10)  # frozen at start


def test_jumping_walk_endpoints(ring_tables):
    starts = jnp.zeros((512,), dtype=jnp.int32)
    ends, mask = jumping_walk_endpoints(
        ring_tables, jax.random.PRNGKey(1), starts, jump=0.5, max_steps=16
    )
    assert np.all(np.asarray(mask) == 1.0)
    e = np.asarray(ends)
    # from v0 the first step hits v1 or v10 with prob 1/2 each; v10 is
    # absorbing (dead end freezes the cursor), and an e==1 endpoint needs
    # first-step v1 AND stop at t=1: P = 1/2 * 1/2 = 1/4.
    frac_absorbed = np.mean(e == 10)
    frac_v1 = np.mean(e == 1)
    assert 0.4 < frac_absorbed < 0.7
    assert 0.15 < frac_v1 < 0.35
    # dead-end vertex 10 is absorbing: it can appear as endpoint
    assert set(np.unique(e)) <= set(range(11))


def test_skipgram_pairs_window_semantics():
    walk = jnp.asarray([[0, 1, 2, 3, 4]], dtype=jnp.int32)
    src, ctx, mask = skipgram_pairs(walk, jax.random.PRNGKey(0), window=2)
    assert src.shape == ctx.shape == mask.shape == (1 * 5 * 4,)
    s, c, m = map(np.asarray, (src, ctx, mask))
    got = {(a, b) for a, b, mm in zip(s, c, m) if mm > 0}
    # every emitted pair is within distance 2 on the walk
    pos = {v: i for i, v in enumerate([0, 1, 2, 3, 4])}
    for a, b in got:
        assert 1 <= abs(pos[a] - pos[b]) <= 2
    # distance-1 pairs always emitted (reduce >= 1)
    for i in range(4):
        assert (i, i + 1) in got and (i + 1, i) in got


def test_scale_skipgram_band():
    walk = jnp.asarray([[0, 1, 2, 3, 4, 5]], dtype=jnp.int32)
    src, ctx, mask = scale_skipgram_pairs(walk, window_min=2, window_max=3)
    s, c, m = map(np.asarray, (src, ctx, mask))
    got = {(a, b) for a, b, mm in zip(s, c, m) if mm > 0}
    pos = {v: i for i, v in enumerate([0, 1, 2, 3, 4, 5])}
    assert got  # non-empty
    for a, b in got:
        assert 2 <= abs(pos[a] - pos[b]) <= 3
    # all in-bound band pairs present
    for i in range(6):
        for o in (-3, -2, 2, 3):
            if 0 <= i + o < 6:
                assert (i, i + o) in got


def test_ordinal_pairs():
    walk = jnp.asarray([[7, 3, 5, 9]], dtype=jnp.int32)
    src, ctx, mask = ordinal_pairs(walk)
    assert np.asarray(src).tolist() == [7, 7, 7]
    assert np.asarray(ctx).tolist() == [3, 5, 9]
    assert np.asarray(mask).tolist() == [1.0, 1.0, 1.0]


def test_cbow_groups_shapes():
    walk = jnp.asarray([[0, 1, 2, 3]], dtype=jnp.int32)
    centers, ctx, m = cbow_groups(walk, jax.random.PRNGKey(0), window=2)
    assert centers.shape == (4,)
    assert ctx.shape == (4, 4) and m.shape == (4, 4)
    # center 0: only right-contexts valid
    assert np.asarray(m)[0, :2].sum() == 0  # left offsets out of bounds


def test_neighbor_index(ring_graph):
    nbr = NeighborIndex.build(ring_graph)
    a = jnp.asarray([0, 0, 0, 5, 9, 10], dtype=jnp.int32)
    b = jnp.asarray([1, 10, 5, 6, 0, 0], dtype=jnp.int32)
    got = np.asarray(nbr.contains(a, b))
    assert got.tolist() == [True, True, False, True, True, False]


def test_node2vec_walk_unbiased_matches_edges(ring_graph, ring_tables):
    nbr = NeighborIndex.build(ring_graph)
    starts = jnp.arange(10, dtype=jnp.int32)
    walk, row_mask = node2vec_walk(
        ring_tables, nbr, jax.random.PRNGKey(0), starts, 6, p=1.0, q=1.0
    )
    assert walk.shape == (10, 7)
    w = np.asarray(walk)
    indptr, indices = ring_graph.indptr, ring_graph.indices
    for b in range(10):
        for t in range(6):
            a, c = w[b, t], w[b, t + 1]
            nbrs = indices[indptr[a] : indptr[a + 1]]
            if c not in nbrs:
                assert len(nbrs) == 0  # dead-end restart
                s = w[b, 0]
                assert c in indices[indptr[s] : indptr[s + 1]]


def test_node2vec_bias_return_prob():
    # star: center 0 connected to 1..4 (undirected) -> from 1, every step
    # goes to 0; from 0 with huge p (never return), prev is excluded.
    edges = [("c", f"l{i}", 1.0) for i in range(4)]
    g = Graph.from_edges(edges, undirected=True)
    t = SamplerTables.build(g)
    nbr = NeighborIndex.build(g)
    cid = g.name2id["c"]
    starts = jnp.full((256,), g.name2id["l0"], dtype=jnp.int32)
    walk, _ = node2vec_walk(
        t, nbr, jax.random.PRNGKey(0), starts, 2, p=1000.0, q=1.0, trials=16
    )
    w = np.asarray(walk)
    # step1: l0 -> c (only neighbor). step2: c -> leaves; returning to l0
    # has bias 1/1000 vs 1/q=1 for the other three leaves.
    assert np.all(w[:, 1] == cid)
    frac_return = np.mean(w[:, 2] == g.name2id["l0"])
    assert frac_return < 0.05  # unbiased would be 0.25
