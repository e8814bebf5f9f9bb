"""Checkpoint/resume through TrainDriver and the CLI.

The reference's only persistence is the final text dump + warm start
(SURVEY.md 5.4); mid-train checkpoint/resume is a production upgrade.
The contract tested here: kill-at-50%-then-resume is STEP-IDENTICAL to
an uninterrupted run (the alpha schedule is a pure function of the
restored step counter and the PRNG key is checkpointed with the state).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from smore_tpu.graph.graph import Graph
from smore_tpu.models.line import LINE


def _toy_graph(tmp_path, n=60, seed=0):
    rng = np.random.default_rng(seed)
    path = tmp_path / "net.txt"
    with open(path, "w") as f:
        for _ in range(400):
            a, b = rng.integers(0, n, 2)
            if a != b:
                f.write(f"n{a} n{b} {rng.uniform(0.5, 2.0):.3f}\n")
    return str(path)


def _make_model(path):
    g = Graph.load_edge_list(path, undirected=True)
    m = LINE(g)
    m.init(dim=8, order=2)
    return m


TRAIN_KW = dict(
    sample_times=0.004,  # 4000 samples
    negative_samples=2,
    alpha=0.02,
    batch=64,
    steps_per_call=4,  # ~16 calls total
    group=1,
    verbose=False,
)


def test_kill_at_50pct_then_resume_is_step_identical(tmp_path):
    net = _toy_graph(tmp_path)

    # Uninterrupted run (no checkpointing).
    m_ref = _make_model(net)
    m_ref.train(**TRAIN_KW)
    ref_v = np.asarray(m_ref.state["vertex"])
    ref_c = np.asarray(m_ref.state["context"])

    # Interrupted run: checkpoint every call, die after the ~8th call.
    ckpt = str(tmp_path / "ckpt")
    m_a = _make_model(net)
    m_a.set_checkpoint(ckpt, every=1)

    from smore_tpu.models.base import TrainDriver

    orig_save = TrainDriver._save_ckpt
    calls = {"n": 0}

    def killing_save(self, state, key, done):
        orig_save(self, state, key, done)
        calls["n"] += 1
        if calls["n"] == 8:
            raise KeyboardInterrupt("simulated preemption")

    TrainDriver._save_ckpt = killing_save
    try:
        with pytest.raises(KeyboardInterrupt):
            m_a.train(**TRAIN_KW)
    finally:
        TrainDriver._save_ckpt = orig_save
    assert calls["n"] == 8

    # Fresh process analog: new model object, resume from the checkpoint.
    m_b = _make_model(net)
    m_b.set_checkpoint(ckpt, every=1)
    m_b.train(**TRAIN_KW)

    np.testing.assert_array_equal(np.asarray(m_b.state["vertex"]), ref_v)
    np.testing.assert_array_equal(np.asarray(m_b.state["context"]), ref_c)


def test_resume_skips_completed_run(tmp_path):
    net = _toy_graph(tmp_path)
    ckpt = str(tmp_path / "ckpt2")
    m = _make_model(net)
    m.set_checkpoint(ckpt, every=1)
    m.train(**TRAIN_KW)
    done_v = np.asarray(m.state["vertex"])

    # Resuming a finished run must be a no-op on the tables.
    m2 = _make_model(net)
    m2.set_checkpoint(ckpt, every=1)
    m2.train(**TRAIN_KW)
    np.testing.assert_array_equal(np.asarray(m2.state["vertex"]), done_v)


def test_cli_checkpoint_flag(tmp_path):
    net = _toy_graph(tmp_path)
    out = str(tmp_path / "emb.txt")
    ckpt = str(tmp_path / "cli_ckpt")
    from smore_tpu.cli.main import main

    rc = main([
        "line", "-train", net, "-save", out, "-dimensions", "8",
        "-sample_times", "0.002", "-batch", "64",
        "-checkpoint", ckpt,
    ])
    assert rc == 0
    from smore_tpu.utils.checkpoint import checkpoint_exists

    assert checkpoint_exists(ckpt)
    header = open(out).readline().split()
    assert len(header) == 2 and header[1] == "8"
