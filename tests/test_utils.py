"""Checkpoint round-trip + profiling helpers."""

import jax.numpy as jnp
import numpy as np

from smore_tpu.utils.checkpoint import load_checkpoint, save_checkpoint
from smore_tpu.utils.profiling import PhaseTimer, throughput


def test_checkpoint_roundtrip(tmp_path):
    state = {
        "vertex": jnp.arange(12.0).reshape(3, 4),
        "context": jnp.ones((3, 4)) * 2,
    }
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, state, step=42, extra={"alpha": 0.025})
    got, step, extra = load_checkpoint(p)
    assert step == 42
    np.testing.assert_array_equal(np.asarray(got["vertex"]),
                                  np.asarray(state["vertex"]))
    assert float(extra["alpha"]) == 0.025


def test_checkpoint_resume_training(tmp_path, toy_net_path):
    """Save mid-train, restore, continue -- tables must carry over."""
    from smore_tpu.graph.graph import Graph
    from smore_tpu.models.line import LINE

    g = Graph.load_edge_list(toy_net_path, undirected=True, use_native=False)
    m = LINE(g, seed=0)
    m.init(dim=8, order=2)
    m.train(sample_times=0.005, batch=32, steps_per_call=4, verbose=False)
    p = str(tmp_path / "ckpt")
    save_checkpoint(p, m.state, step=5000)

    m2 = LINE(g, seed=0)
    m2.init(dim=8, order=2)
    m2.state, step, _ = load_checkpoint(p)
    assert step == 5000
    np.testing.assert_allclose(
        np.asarray(m.state["vertex"]), np.asarray(m2.state["vertex"])
    )
    m2.train(sample_times=0.005, batch=32, steps_per_call=4, verbose=False)
    assert np.isfinite(np.asarray(m2.state["vertex"])).all()


def test_phase_timer():
    t = PhaseTimer()
    with t.phase("a"):
        pass
    with t.phase("b"):
        pass
    with t.phase("a"):
        pass
    assert t.counts["a"] == 2 and t.counts["b"] == 1
    rep = t.report()
    assert "a" in rep and "b" in rep
    assert throughput(100, 2.0) == 50.0
