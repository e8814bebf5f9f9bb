"""Walker/Vose alias-method table construction (host side).

Reference: proNet::AliasMethod (/root/reference/src/proNet.cpp:544-620) and
BuildAliasMethod (proNet.cpp:410-542).

Reference quirk preserved on purpose: the C++ ``AliasMethod(distribution,
power)`` ignores its ``power`` argument and always applies
``pow(x, POWER_SAMPLE=0.75)`` (proNet.cpp:557,565) -- so vertex, negative
AND per-vertex context tables are all 0.75-power transformed. We default
``power=0.75`` everywhere to match observed behavior, but the parameter is
real here.

The build itself is O(n) and sequential (two work-stacks); for large graphs
the C++ native builder (smore_tpu/native) is used, with this numpy/python
implementation as a portable fallback and as the test oracle.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np


def _build_alias_py(norm_prob: np.ndarray) -> Tuple[np.ndarray, np.ndarray]:
    """Core Vose build given probabilities already scaled to mean 1."""
    n = len(norm_prob)
    prob = np.ones(n, dtype=np.float64)
    alias = np.full(n, -1, dtype=np.int64)
    p = norm_prob.astype(np.float64).copy()

    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]

    while small and large:
        s = small.pop()
        l = large.pop()
        prob[s] = p[s]
        alias[s] = l
        p[l] = p[l] + p[s] - 1.0
        if p[l] < 1.0:
            small.append(l)
        else:
            large.append(l)
    # leftovers get prob 1.0 (already initialized); alias stays -1 like the
    # reference (never selected because prob==1).
    return prob, alias


def build_alias(
    weights: np.ndarray, power: float = 0.75, use_native: bool = True
) -> Tuple[np.ndarray, np.ndarray]:
    """Build a single alias table over ``weights`` (>=0).

    Returns (prob[n] float32-able, alias[n] int64). Zero-weight entries get
    prob 0 -> always redirect to alias. If all weights are zero the table
    degenerates to uniform (alias -1 / prob 1), matching the Go fallback
    (/root/reference/pkg/pronet/alias.go:31-37).
    """
    w = np.asarray(weights, dtype=np.float64)
    n = len(w)
    if n == 0:
        return np.zeros(0), np.zeros(0, dtype=np.int64)
    if power != 1.0:
        w = np.where(w > 0, np.power(w, power, where=w > 0), 0.0)
    total = w.sum()
    if total <= 0:
        return np.ones(n, dtype=np.float64), np.full(n, -1, dtype=np.int64)
    norm_prob = w * (n / total)

    if use_native and n > 4096:
        try:
            from smore_tpu.native import fastgraph

            if fastgraph.available():
                return fastgraph.build_alias(norm_prob)
        except Exception:
            pass
    return _build_alias_py(norm_prob)


def build_alias_segmented(
    weights: np.ndarray,
    indptr: np.ndarray,
    power: float = 0.75,
    use_native: bool = True,
) -> Tuple[np.ndarray, np.ndarray]:
    """Build one alias table per CSR segment, concatenated.

    This is the per-vertex context table layout of the reference
    (proNet.cpp:512-541): one sub-table per vertex over its outgoing
    edge weights, stored flat so slot ``indptr[v] + r`` serves vertex v.
    ``alias`` entries are LOCAL slot indices within the segment
    (callers remap to global slots or vids).
    """
    weights = np.asarray(weights, dtype=np.float64)
    indptr = np.asarray(indptr, dtype=np.int64)
    n = len(weights)
    if use_native and n > 4096:
        try:
            from smore_tpu.native import fastgraph

            if fastgraph.available():
                return fastgraph.build_alias_segmented(weights, indptr, power)
        except Exception:
            pass

    prob = np.ones(n, dtype=np.float64)
    alias = np.full(n, -1, dtype=np.int64)
    for v in range(len(indptr) - 1):
        lo, hi = indptr[v], indptr[v + 1]
        if hi <= lo:
            continue
        p, a = build_alias(weights[lo:hi], power=power, use_native=False)
        prob[lo:hi] = p
        alias[lo:hi] = a
    return prob, alias


@dataclass
class AliasTable:
    """A device-friendly alias table: draw = 2 gathers + 1 select."""

    prob: np.ndarray  # (n,) float32
    alias: np.ndarray  # (n,) int32; -1 means "self" (prob==1 slots)

    @staticmethod
    def from_weights(weights: np.ndarray, power: float = 0.75) -> "AliasTable":
        prob, alias = build_alias(weights, power=power)
        # Replace -1 alias by self-index so device gathers stay in-bounds.
        idx = np.arange(len(alias), dtype=np.int64)
        alias = np.where(alias < 0, idx, alias)
        return AliasTable(prob.astype(np.float32), alias.astype(np.int32))

    def sample_np(self, rng: np.random.Generator, size: int) -> np.ndarray:
        """Host-side batched draw (for tests and host pipelines)."""
        n = len(self.prob)
        i = rng.integers(0, n, size=size)
        u = rng.random(size)
        return np.where(u < self.prob[i], i, self.alias[i])
