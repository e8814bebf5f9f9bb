"""Alias-table correctness: draws must match the analytic distribution
(chi-squared style check), per SURVEY.md section 4."""

import numpy as np
import pytest

from smore_tpu.sampling.alias import (
    AliasTable,
    build_alias,
    build_alias_segmented,
)


def empirical_dist(samples, n):
    return np.bincount(samples, minlength=n) / len(samples)


def test_alias_matches_distribution(rng):
    w = np.array([1.0, 2.0, 3.0, 4.0, 0.0, 10.0])
    at = AliasTable.from_weights(w, power=1.0)
    draws = at.sample_np(rng, 200_000)
    emp = empirical_dist(draws, len(w))
    expect = w / w.sum()
    np.testing.assert_allclose(emp, expect, atol=0.01)
    assert emp[4] == 0.0  # zero-weight entry never drawn


def test_alias_power_transform(rng):
    w = np.array([1.0, 8.0, 27.0])
    at = AliasTable.from_weights(w, power=0.75)
    draws = at.sample_np(rng, 200_000)
    emp = empirical_dist(draws, len(w))
    expect = w**0.75 / (w**0.75).sum()
    np.testing.assert_allclose(emp, expect, atol=0.01)


def test_alias_uniform_fallback_all_zero():
    prob, alias = build_alias(np.zeros(4))
    assert np.all(prob == 1.0)  # degenerates to uniform


def test_alias_single_element(rng):
    at = AliasTable.from_weights(np.array([5.0]))
    assert at.sample_np(rng, 100).tolist() == [0] * 100


def test_segmented_build_matches_per_segment(rng):
    w = np.array([1.0, 3.0, 2.0, 2.0, 6.0, 5.0, 1.0])
    indptr = np.array([0, 2, 2, 5, 7])  # segment 1 empty
    prob, alias = build_alias_segmented(w, indptr, power=1.0)
    for v in range(4):
        lo, hi = indptr[v], indptr[v + 1]
        if hi <= lo:
            continue
        p_ref, a_ref = build_alias(w[lo:hi], power=1.0, use_native=False)
        np.testing.assert_allclose(prob[lo:hi], p_ref)
        np.testing.assert_array_equal(alias[lo:hi], a_ref)


def test_segmented_draw_distribution(rng):
    w = np.array([1.0, 3.0, 2.0, 2.0, 6.0])
    indptr = np.array([0, 2, 5])
    prob, alias = build_alias_segmented(w, indptr, power=1.0)
    # draw within segment 1 ([2,5)): slots 2,3,4 with weights 2,2,6
    lo, hi = 2, 5
    i = rng.integers(lo, hi, size=100_000)
    u = rng.random(100_000)
    local = np.where(alias >= 0, alias, np.arange(len(w)) - indptr[0])
    picked = np.where(u < prob[i], i, lo + alias[i])
    emp = np.bincount(picked, minlength=5)[lo:hi] / 100_000
    expect = w[lo:hi] / w[lo:hi].sum()
    np.testing.assert_allclose(emp, expect, atol=0.01)
