"""Default-config stability on tiny graphs (library API).

Regression tests for the clamp_batch / collision-fallback guards: with
DEFAULT batch sizes, the CBOW family and SNE previously diverged (NaN) or
crashed on graphs smaller than one sample's neighbor fan-out. The full
34-subcommand CLI version of this check is
experiments/cli_default_sweep.py.
"""

import numpy as np
import pytest


@pytest.fixture()
def toy_files(tmp_path):
    (tmp_path / "net.txt").write_text(
        "u1 i1 1\nu1 i2 1\nu2 i2 1\nu2 i3 1\nu3 i3 1\n"
    )
    (tmp_path / "field.txt").write_text(
        "u1 0\nu2 0\nu3 0\ni1 1\ni2 1\ni3 1\n"
    )
    (tmp_path / "field3.txt").write_text(
        "u1 0\nu2 0\nu3 0\ni1 2\ni2 2\ni3 1\n"
    )
    return tmp_path


def _assert_finite(state):
    for name, tbl in state.items():
        arr = np.asarray(tbl)
        assert np.all(np.isfinite(arr)), f"table {name!r} has non-finite rows"


def test_gcn_default_batch_finite(toy_files):
    from smore_tpu.models import GCN

    m = GCN.load_edge_list(str(toy_files / "net.txt"))
    m.graph.load_field_meta(str(toy_files / "field.txt"))
    m.init(dim=8)
    m.train(sample_times=0.005, verbose=False)
    _assert_finite(m.state)


def test_textgcndev_default_batch_finite(toy_files):
    from smore_tpu.models import TEXTGCNdev

    m = TEXTGCNdev.load_edge_list(str(toy_files / "net.txt"))
    m.graph.load_field_meta(str(toy_files / "field3.txt"))
    m.init(dim=8)
    m.train(sample_times=0.005, verbose=False)
    _assert_finite(m.state)


def test_sne_default_batch_finite(tmp_path):
    from smore_tpu.models import SNE

    p = tmp_path / "sgn.txt"
    p.write_text("a b +1\nb c +1\nc d -1\nd a -1\na c +1\n")
    m = SNE.load_edge_list(str(p))
    m.init(dim=8)
    m.train(epochs=2, verbose=False)
    _assert_finite(m.state)


def test_sne_no_edges_raises(tmp_path):
    from smore_tpu.models import SNE

    p = tmp_path / "bad.txt"
    p.write_text("a b +\nb c -\n")  # bare +/- rejected, reference parity
    m = SNE.load_edge_list(str(p))
    m.init(dim=8)
    with pytest.raises(ValueError, match="no edges"):
        m.train(epochs=1, verbose=False)


def test_sne_only_negative_edges_runs(tmp_path):
    from smore_tpu.models import SNE

    p = tmp_path / "neg.txt"
    p.write_text("a b -1\nb c -1\nc a -1\n")
    m = SNE.load_edge_list(str(p))
    m.init(dim=8)
    m.train(epochs=2, verbose=False)
    _assert_finite(m.state)
