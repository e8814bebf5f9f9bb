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


def test_cli_default_batch_stable_on_readme_toy_net(tmp_path):
    """The README toy net (README.md:49-66) trained with DEFAULT flags
    must produce finite embeddings: clamp_batch caps the 32768 default
    batch near the vertex count so collision="sum" cannot overshoot
    (it NaN'd before the guard)."""
    net = tmp_path / "toy.txt"
    net.write_text("u1 i1 1\nu1 i2 1\nu2 i2 1\nu2 i3 1\nu3 i3 1\n")
    out = tmp_path / "rep.txt"
    main([
        "line", "-train", str(net), "-save", str(out),
        "-dimensions", "8", "-sample_times", "0.01",
    ])
    lines = out.read_text().strip().split("\n")
    assert lines[0] == "6 8"
    for line in lines[1:]:
        vals = np.array(line.split()[1:], dtype=float)
        assert np.all(np.isfinite(vals)), line


def test_clamp_batch():
    from smore_tpu.models.base import clamp_batch

    assert clamp_batch(6, 32768) == 6
    assert clamp_batch(6, 32768, group=8) == 8  # floor at one group
    assert clamp_batch(50_000, 32768) == 32768  # bench config unchanged
    assert clamp_batch(50_000, 32768, group=8) == 32768
    assert clamp_batch(100, 96, group=8) == 96
    assert clamp_batch(100, 2048, group=8) == 96  # 100 -> multiple of 8


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
