"""CLI fidelity: -load_v/-load_c warm start and PE -walk_meta.

Reference surfaces: cli/deepwalk.cpp:61-62 and cli/hpe.cpp expose
-load_v/-load_c feeding Init(dim, load_vertex, load_context)
(src/model/DeepWalk.cpp:60-94); PE::LoadWalkMeta
(ProximityEmbedding.cpp:6-7) loads per-vertex walk lengths.
"""

import numpy as np

from smore_tpu.cli.main import main
from smore_tpu.io.embeddings import load_embeddings


def _toy_graph(tmp_path, n=40, seed=1):
    rng = np.random.default_rng(seed)
    path = tmp_path / "net.txt"
    with open(path, "w") as f:
        for _ in range(200):
            a, b = rng.integers(0, n, 2)
            if a != b:
                f.write(f"n{a} n{b} 1\n")
    return str(path)


def test_load_v_warm_start_roundtrip(tmp_path):
    net = _toy_graph(tmp_path)
    first = str(tmp_path / "first.txt")
    rc = main(["deepwalk", "-train", net, "-save", first,
               "-dimensions", "8", "-walk_times", "1", "-walk_steps", "5",
               "-batch", "16"])
    assert rc == 0

    # Warm-started second run must start FROM the saved rows: with a zero
    # training budget the output equals the pretrain file.
    second = str(tmp_path / "second.txt")
    rc = main(["deepwalk", "-train", net, "-save", second,
               "-dimensions", "8", "-walk_times", "0", "-walk_steps", "5",
               "-batch", "16", "-load_v", first])
    assert rc == 0
    a, b = load_embeddings(first), load_embeddings(second)
    assert set(a) == set(b)
    # One driver call always runs (ceil of 0 budget -> 1 step), so allow
    # tiny drift but require near-identity vs the ~U(-0.5,0.5)/dim init.
    deltas = [float(np.abs(a[k] - b[k]).max()) for k in a]
    assert np.median(deltas) < 0.05


def test_line_load_flags_exist(tmp_path):
    net = _toy_graph(tmp_path)
    first = str(tmp_path / "l1.txt")
    assert main(["line", "-train", net, "-save", first, "-dimensions", "8",
                 "-sample_times", "0.001", "-batch", "32"]) == 0
    out = str(tmp_path / "l2.txt")
    assert main(["line", "-train", net, "-save", out, "-dimensions", "8",
                 "-sample_times", "0.001", "-batch", "32",
                 "-load_v", first, "-load_c", first]) == 0


def test_pe_walk_meta(tmp_path):
    net = _toy_graph(tmp_path)
    meta = tmp_path / "steps.txt"
    with open(meta, "w") as f:
        f.write("n0 4\nn1 1\n")  # others default to 3 (proNet.cpp:310)
    out = str(tmp_path / "pe.txt")
    rc = main(["pe", "-train", net, "-save", out, "-dimensions", "8",
               "-sample_times", "0.002", "-batch", "32",
               "-walk_meta", str(meta)])
    assert rc == 0
    emb = load_embeddings(out)
    assert all(np.isfinite(v).all() for v in emb.values())


def test_pe_walk_meta_defaults(tmp_path):
    # Graph API: unnamed vertices keep the reference default of 3.
    from smore_tpu.graph.graph import Graph

    net = _toy_graph(tmp_path)
    meta = tmp_path / "steps2.txt"
    with open(meta, "w") as f:
        f.write("n0 7\n")
    g = Graph.load_edge_list(net, undirected=True)
    g.load_walk_meta(str(meta))
    assert g.walk_steps[g.name2id["n0"]] == 7
    others = [g.walk_steps[g.name2id[n]] for n in g.names if n != "n0"]
    assert set(others) == {3}
