"""band_scatter_add (Pallas serial in-VMEM scatter) == np.add.at,
including duplicate accumulation. Interpret mode on the CPU backend;
the compiled path is exercised on TPU (experiments/pallas_scatter_bench)."""

import jax.numpy as jnp
import numpy as np
import pytest

from smore_tpu.ops.pallas_scatter import band_scatter_add


@pytest.mark.parametrize("dup", ["random", "all_same", "iota"])
def test_band_scatter_add_matches_add_at(dup):
    rng = np.random.default_rng(1)
    Nb, D, B = 128, 64, 2048
    band = rng.normal(size=(Nb, D)).astype(np.float32)
    if dup == "random":
        idx = rng.integers(0, Nb, B).astype(np.int32)
    elif dup == "all_same":
        idx = np.full(B, 7, np.int32)  # worst-case duplicate pile-up
    else:
        idx = (np.arange(B) % Nb).astype(np.int32)
    delta = rng.normal(size=(B, D)).astype(np.float32)

    want = band.copy()
    np.add.at(want, idx, delta)
    got = band_scatter_add(
        jnp.asarray(band), jnp.asarray(idx), jnp.asarray(delta),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=2e-5, atol=2e-4)


def test_band_scatter_add_multi_tile():
    """B spanning several 2048-row delta tiles accumulates across tiles."""
    rng = np.random.default_rng(2)
    Nb, D, B = 64, 64, 8192
    band = np.zeros((Nb, D), np.float32)
    idx = rng.integers(0, Nb, B).astype(np.int32)
    delta = np.ones((B, D), np.float32)
    want = band.copy()
    np.add.at(want, idx, delta)
    got = band_scatter_add(
        jnp.asarray(band), jnp.asarray(idx), jnp.asarray(delta),
        interpret=True,
    )
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-6)


def test_banded_step_pallas_scatter_matches_xla():
    """sgns_shared_negs_step_banded(pallas_scatter=True) == the XLA
    scatter path (identical sums up to float ordering)."""
    import jax
    from smore_tpu.ops.update import sgns_shared_negs_step_banded

    rng = np.random.default_rng(5)
    n_pad, band, D, B, Ks, G = 256, 64, 32, 2048, 16, 4
    wv = rng.normal(size=(n_pad, D)).astype(np.float32) * 0.1
    wc = rng.normal(size=(n_pad, D)).astype(np.float32) * 0.1
    sb, db = 64, 128
    src = (sb + rng.integers(0, band, B // G).repeat(G)).astype(np.int32)
    pos = (db + rng.integers(0, band, B)).astype(np.int32)
    negs = rng.integers(0, n_pad - 1, Ks).astype(np.int32)

    outs = {}
    for flag in (False, True):
        outs[flag] = sgns_shared_negs_step_banded(
            jnp.asarray(wv), jnp.asarray(wc), jnp.int32(db), band,
            jnp.asarray(src), jnp.asarray(pos), jnp.asarray(negs),
            jnp.float32(0.025), k_equiv=5, src_group=G,
            src_band_start=jnp.int32(sb), pallas_scatter=flag,
        )
    for a, b in zip(outs[False], outs[True]):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=2e-5, atol=2e-6
        )
