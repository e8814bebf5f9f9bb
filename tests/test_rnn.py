"""Standalone RNN cell (ops/rnn.py == reference pkg/rnn semantics)."""

import jax
import jax.numpy as jnp
import numpy as np

from smore_tpu.ops.rnn import (
    init_rnn_cell,
    rnn_forward,
    rnn_project,
    rnn_update,
)


def test_forward_matches_scalar_reference():
    """h' = tanh(Wh h + Wx x + b) (rnn.go:58-81), checked against a
    plain numpy transcription."""
    p = init_rnn_cell(jax.random.PRNGKey(0), 4, 8)
    h = np.random.default_rng(1).normal(size=(8,))
    x = np.random.default_rng(2).normal(size=(4,))
    got = np.asarray(rnn_forward(p, jnp.asarray(h), jnp.asarray(x)))
    Wh, Wx, b = (np.asarray(p[k]) for k in ("Wh", "Wx", "b"))
    want = np.tanh(Wh @ h + Wx @ x + b)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


def test_update_moves_prediction_toward_target():
    """rnn.go:85-119 pseudo-BPTT: after an update, the forward output
    is closer to the target."""
    p = init_rnn_cell(jax.random.PRNGKey(3), 2, 6)
    h = jnp.ones((6,)) * 0.3
    x = jnp.ones((2,)) * 0.5
    target = jnp.full((6,), 0.7)
    before = float(jnp.sum((rnn_forward(p, h, x) - target) ** 2))
    for _ in range(20):
        p = rnn_update(p, h, x, target, lr=0.1)
    after = float(jnp.sum((rnn_forward(p, h, x) - target) ** 2))
    assert after < before * 0.5


def test_update_batched_equals_summed_singles():
    p = init_rnn_cell(jax.random.PRNGKey(4), 3, 5)
    key = jax.random.PRNGKey(5)
    h = jax.random.normal(jax.random.fold_in(key, 0), (4, 5))
    x = jax.random.normal(jax.random.fold_in(key, 1), (4, 3))
    t = jax.random.normal(jax.random.fold_in(key, 2), (4, 5))
    batched = rnn_update(p, h, x, t, lr=0.01)
    # summed per-sample gradients against the SAME initial params
    acc = {k: np.asarray(v).copy() for k, v in p.items()}
    for i in range(4):
        upd = rnn_update(p, h[i], x[i], t[i], lr=0.01)
        for k in acc:
            acc[k] += np.asarray(upd[k]) - np.asarray(p[k])
    for k in acc:
        np.testing.assert_allclose(np.asarray(batched[k]), acc[k],
                                   rtol=1e-4, atol=1e-6)


def test_project_uses_dt_slot():
    """Project = forward with input [dt, 0...] (rnn.go:123-132)."""
    p = init_rnn_cell(jax.random.PRNGKey(6), 3, 5)
    emb = jnp.ones((5,)) * 0.2
    got = rnn_project(p, emb, 2.5)
    x = jnp.zeros((3,)).at[0].set(2.5)
    want = rnn_forward(p, emb, x)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want))
    assert not np.allclose(np.asarray(rnn_project(p, emb, 0.0)),
                           np.asarray(got))
