"""CLI smoke tests: every subcommand is registered; representative
commands run end-to-end on toy data."""

import numpy as np
import pytest

from smore_tpu.cli.main import _REGISTRY, main


EXPECTED = {
    "deepwalk", "walklets", "line", "hpe", "app", "mf", "bpr", "warp",
    "hoprec", "nemf", "nerank", "skewopt", "eco", "gcn", "textgcn", "textgcndev",
    "fine", "msfine", "pe", "node2vec", "fastrp", "metapath2vec", "han",
    "ctdne", "jodie", "transe", "rotate", "complex", "sne", "sasrec",
    "gsasrec", "recdenoiser", "cpr", "tpr",
}


def test_all_reference_clis_registered():
    """Union of the C++ cli/ binaries and Go cmd/ mains (SURVEY.md 2.2,
    2.4) must be available as subcommands."""
    assert EXPECTED <= set(_REGISTRY)


def test_help():
    assert main([]) == 0
    assert main(["help"]) == 0
    assert main(["nosuchmodel"]) == 1


@pytest.fixture()
def toy_edges(tmp_path):
    rng = np.random.default_rng(0)
    p = tmp_path / "net.txt"
    lines = []
    for u in range(12):
        for i in rng.choice(12, 4, replace=False):
            lines.append(f"u{u} i{i} 1\n")
    p.write_text("".join(lines))
    return p


def test_cli_line_end_to_end(toy_edges, tmp_path):
    out = tmp_path / "rep.txt"
    main([
        "line", "-train", str(toy_edges), "-save", str(out),
        "-dimensions", "8", "-sample_times", "0.01", "-batch", "32",
    ])
    header = out.read_text().split("\n")[0]
    assert header == "24 8"


def test_cli_fastrp_end_to_end(toy_edges, tmp_path):
    out = tmp_path / "rp.txt"
    main([
        "fastrp", "-train", str(toy_edges), "-save", str(out),
        "-dimensions", "16",
    ])
    assert out.read_text().split("\n")[0] == "24 16"


def test_cli_transe_end_to_end(tmp_path):
    triples = tmp_path / "kg.txt"
    triples.write_text("a r1 b\nb r1 c\nc r2 a\na r2 c\n")
    e_out, r_out = tmp_path / "e.txt", tmp_path / "r.txt"
    main([
        "transe", "-train", str(triples), "-save_entity", str(e_out),
        "-save_relation", str(r_out), "-dimensions", "8", "-epochs", "2",
        "-batch_size", "4",
    ])
    assert e_out.read_text().split("\n")[0] == "3 8"
    assert r_out.read_text().split("\n")[0] == "2 8"
