"""Probe: what makes TPU random-row gather/scatter fast or slow at the
1.1M-vertex scale? Times isolated gathers/scatters under a scan, varying
(a) table size, (b) index SPREAD (full-range uniform vs narrow region vs
all-identical), to locate the wall behind PERF_NOTES' 3.6x scale cliff
and test the hot/cold-split hypothesis.

Run: python experiments/gather_probe.py  (real TPU)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

B = 32768
D = 64
S = 30
N_BIG = 1_100_000
N_SMALL = 49_152  # 12 MB at f32 x 64 -- the "VMEM-scale" table size


def timed(name, fn, *args):
    call = jax.jit(fn, donate_argnums=(0,))
    state = args[0]
    t0 = time.time()
    state, x = call(state, *args[1:])
    float(x)
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(4):
        state, x = call(state, *args[1:])
    float(x)
    dt = (time.time() - t0) / (4 * S)
    print(f"{name:22s} {dt*1e3:8.3f} ms/step   ({comp:.0f}s compile)",
          flush=True)
    return dt


def scan_gather(table, idx_fn):
    """state=(table, acc); per step: gather B rows at idx_fn(key), sum."""
    def call(state, key):
        def body(carry, _):
            (table, acc), key = carry
            key, sub = jax.random.split(key)
            idx = idx_fn(sub, table.shape[0])
            rows = table.at[idx].get(mode="promise_in_bounds")
            return ((table, acc + rows.sum()), key), rows[0, 0]

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()

    return call


def scan_scatter(table, idx_fn):
    def call(state, key):
        def body(carry, _):
            (table, acc), key = carry
            key, sub = jax.random.split(key)
            idx = idx_fn(sub, table.shape[0])
            delta = jnp.full((B, D), 1e-7, jnp.float32)
            table = table.at[idx].add(delta, mode="promise_in_bounds")
            return ((table, acc), key), table[0, 0]

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()

    return call


def uniform(k, n):
    return jax.random.randint(k, (B,), 0, n, dtype=jnp.int32)


def narrow(k, n):
    return jax.random.randint(k, (B,), 0, min(n, N_SMALL), dtype=jnp.int32)


def same(k, n):
    return jnp.full((B,), 7, jnp.int32)


def mixed_70(k, n):
    """70% of indices in the hot region, 30% full-range (power-law-ish)."""
    k1, k2, k3 = jax.random.split(k, 3)
    hot = jax.random.randint(k1, (B,), 0, min(n, N_SMALL), dtype=jnp.int32)
    cold = jax.random.randint(k2, (B,), 0, n, dtype=jnp.int32)
    pick = jax.random.uniform(k3, (B,)) < 0.7
    return jnp.where(pick, hot, cold)


def main():
    key = jax.random.PRNGKey(0)
    print(f"B={B} D={D} S={S}  big={N_BIG} small={N_SMALL}")

    for name, n_rows, idxf in [
        ("gather big/uniform", N_BIG, uniform),
        ("gather big/narrow", N_BIG, narrow),
        ("gather big/same-row", N_BIG, same),
        ("gather big/mixed70", N_BIG, mixed_70),
        ("gather small/uniform", N_SMALL, uniform),
    ]:
        # fresh table per variant: state is DONATED into the timed call
        table = jnp.zeros((n_rows, D), jnp.float32)
        acc = jnp.zeros((), jnp.float32)
        timed(name, scan_gather(table, idxf), (table, acc), key)

    for name, n_rows, idxf in [
        ("scatter big/uniform", N_BIG, uniform),
        ("scatter big/narrow", N_BIG, narrow),
        ("scatter big/mixed70", N_BIG, mixed_70),
        ("scatter small/uniform", N_SMALL, uniform),
    ]:
        table = jnp.zeros((n_rows, D), jnp.float32)
        acc = jnp.zeros((), jnp.float32)
        timed(name, scan_scatter(table, idxf), (table, acc), key)

    # follow-ups for the hot/cold two-table design:
    # (1) does a scatter with mostly-DROPPED indices cost like its valid
    #     count or like B? (decides whether cold-side compaction is needed)
    def dropped_75(k, n):
        k1, k2 = jax.random.split(k)
        idx = jax.random.randint(k1, (B,), 0, n, dtype=jnp.int32)
        return jnp.where(jax.random.uniform(k2, (B,)) < 0.75, n + 1, idx)

    def scan_scatter_drop(idx_fn):
        def call(state, key):
            def body(carry, _):
                (table, acc), key = carry
                key, sub = jax.random.split(key)
                idx = idx_fn(sub, table.shape[0])
                delta = jnp.full((B, D), 1e-7, jnp.float32)
                table = table.at[idx].add(delta, mode="drop")
                return ((table, acc), key), table[0, 0]

            (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
            return state, xs.sum()

        return call

    table = jnp.zeros((N_BIG, D), jnp.float32)
    acc = jnp.zeros((), jnp.float32)
    timed("scatter big/75%drop", scan_scatter_drop(dropped_75), (table, acc), key)

    # (2) per-row scaling: B/4 rows into the big table
    def scan_scatter_b(idx_fn, b):
        def call(state, key):
            def body(carry, _):
                (table, acc), key = carry
                key, sub = jax.random.split(key)
                idx = jax.random.randint(sub, (b,), 0, table.shape[0],
                                         dtype=jnp.int32)
                delta = jnp.full((b, D), 1e-7, jnp.float32)
                table = table.at[idx].add(delta, mode="promise_in_bounds")
                return ((table, acc), key), table[0, 0]

            (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
            return state, xs.sum()

        return call

    for b in (8192, 2048):
        table = jnp.zeros((N_BIG, D), jnp.float32)
        acc = jnp.zeros((), jnp.float32)
        timed(f"scatter big/B={b}", scan_scatter_b(uniform, b), (table, acc), key)

    # (3) production-shaped hot/cold mix: hot scatter (B rows, small
    #     table) + cold scatter (B/4 rows, big table) in the same step
    def scan_hotcold():
        def call(state, key):
            def body(carry, _):
                (hot, cold, acc), key = carry
                k1, k2 = jax.random.split(key)
                ih = jax.random.randint(k1, (B,), 0, hot.shape[0], jnp.int32)
                ic = jax.random.randint(k2, (B // 4,), 0, cold.shape[0],
                                        jnp.int32)
                hot = hot.at[ih].add(jnp.full((B, D), 1e-7, jnp.float32),
                                     mode="promise_in_bounds")
                cold = cold.at[ic].add(
                    jnp.full((B // 4, D), 1e-7, jnp.float32),
                    mode="promise_in_bounds")
                return ((hot, cold, acc), key), hot[0, 0] + cold[0, 0]

            (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
            return state, xs.sum()

        return call

    hot = jnp.zeros((24576, D), jnp.float32)
    cold = jnp.zeros((N_BIG, D), jnp.float32)
    acc = jnp.zeros((), jnp.float32)
    timed("scatter hot24k+cold/4", scan_hotcold(), (hot, cold, acc), key)


if __name__ == "__main__":
    main()
