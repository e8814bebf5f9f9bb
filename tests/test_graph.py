"""Graph store and loader tests against reference semantics
(/root/reference/src/proNet.cpp:115-236)."""

import numpy as np

from smore_tpu.graph.graph import Graph


def test_toy_graph_shapes(toy_graph):
    g = toy_graph
    assert g.n_vertices == 6
    assert g.n_edges == 10  # undirected doubles 5 edges
    # insertion order: userA, itemA, itemC, userB, itemB, userC
    assert g.names[0] == "userA"
    assert g.name2id["userC"] == 5


def test_degrees(toy_graph):
    g = toy_graph
    a = g.name2id["userA"]
    ia = g.name2id["itemA"]
    # userA: out edges to itemA(3), itemC(5) = 8; undirected adds reverse
    assert g.out_degree[a] == 8.0
    assert g.in_degree[a] == 8.0
    # itemA receives 3+1+4 = 8 and sends back the same (undirected)
    assert g.out_degree[ia] == 8.0
    assert g.in_degree[ia] == 8.0


def test_neighbors_sorted_by_csr(toy_graph):
    g = toy_graph
    a = g.name2id["userA"]
    nbrs = set(g.neighbors(a).tolist())
    assert nbrs == {g.name2id["itemA"], g.name2id["itemC"]}


def test_directed_load(toy_net_path):
    g = Graph.load_edge_list(toy_net_path, undirected=False, use_native=False)
    assert g.n_edges == 5
    ia = g.name2id["itemA"]
    assert g.out_degree[ia] == 0.0
    assert g.in_degree[ia] == 8.0


def test_load_matches_from_edges(toy_net_path, toy_graph):
    g = Graph.load_edge_list(toy_net_path, undirected=True, use_native=False)
    assert g.n_vertices == toy_graph.n_vertices
    assert g.n_edges == toy_graph.n_edges
    np.testing.assert_array_equal(g.indptr, toy_graph.indptr)
    np.testing.assert_array_equal(g.indices, toy_graph.indices)
    np.testing.assert_array_equal(g.weights, toy_graph.weights)


def test_weight_defaults_to_one(tmp_path):
    p = tmp_path / "net.txt"
    p.write_text("a b\nb c 2\n")
    g = Graph.load_edge_list(str(p), undirected=False, use_native=False)
    assert g.n_edges == 2
    assert g.weights.sum() == 3.0


def test_malformed_lines_skipped(tmp_path):
    p = tmp_path / "net.txt"
    p.write_text("a b 1\njunk\n\nc d notanumber\ne f 2\n")
    g = Graph.load_edge_list(str(p), undirected=False, use_native=False)
    assert g.n_edges == 2


def test_directory_input(tmp_path):
    d = tmp_path / "edges"
    d.mkdir()
    (d / "part0.txt").write_text("a b 1\n")
    (d / "part1.txt").write_text("b c 2\n")
    g = Graph.load_edge_list(str(d), undirected=False, use_native=False)
    assert g.n_edges == 2
    assert g.n_vertices == 3


def test_field_meta(toy_graph, tmp_path):
    p = tmp_path / "field.txt"
    p.write_text(
        "userA u\nuserB u\nuserC u\nitemA i\nitemB i\nitemC i\n"
    )
    toy_graph.load_field_meta(str(p))
    assert toy_graph.n_fields == 2
    u = toy_graph.fields[toy_graph.name2id["userA"]]
    assert toy_graph.fields[toy_graph.name2id["userB"]] == u
    assert toy_graph.fields[toy_graph.name2id["itemB"]] != u


def test_walk_meta(toy_graph, tmp_path):
    p = tmp_path / "walk.txt"
    p.write_text("userA 7\nitemB 2\n")
    toy_graph.load_walk_meta(str(p), default_steps=5)
    assert toy_graph.walk_steps[toy_graph.name2id["userA"]] == 7
    assert toy_graph.walk_steps[toy_graph.name2id["itemB"]] == 2
    assert toy_graph.walk_steps[toy_graph.name2id["userC"]] == 5
