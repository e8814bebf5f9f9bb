"""Time the Pallas band scatter-add vs XLA .at[].add on the real TPU.

The banded SGNS step's two in-band scatters (32768 rows x 256 B into a
32776-row band) cost ~0.5 ms each in XLA -- its per-row floor
(PERF_NOTES.md, iotascat == random). The Pallas kernel keeps the band in
VMEM and does a serial unrolled RMW loop; if the per-row cost lands
under ~8 ns this halves the banded step.

Run: python experiments/pallas_scatter_bench.py
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from smore_tpu.ops.pallas_scatter import band_scatter_add

Nb, D, B, REPS = 32776, 64, 32768, 500


def timed(name, fn, band, idx, delta):
    # ALL reps inside one jitted scan: per-call tunnel dispatch costs
    # ~1s, so Python-loop reps would measure the tunnel, not the TPU
    # (see .claude/skills/verify/SKILL.md).
    def many(band, idx, delta):
        def body(b, _):
            return fn(b, idx, delta), ()
        band, _ = jax.lax.scan(body, band, None, length=REPS)
        return band

    call = jax.jit(many, donate_argnums=(0,))
    band = call(band, idx, delta)  # compile
    float(band[0, 0])
    t0 = time.time()
    band = call(band, idx, delta)
    float(band[0, 0])
    dt = (time.time() - t0) / REPS
    print(f"{name:16s} {dt * 1e6:8.1f} us/scatter "
          f"({dt / B * 1e9:6.2f} ns/row)", flush=True)
    return band


def main():
    key = jax.random.PRNGKey(0)
    idx = jax.random.randint(jax.random.fold_in(key, 1), (B,), 0, Nb,
                             jnp.int32)
    delta = jax.random.normal(jax.random.fold_in(key, 2), (B, D),
                              jnp.float32) * 1e-4

    variants = [
        ("xla_at_add", lambda b, i, d: b.at[i].add(d)),
        ("xla_promise", lambda b, i, d: b.at[i].add(
            d, mode="promise_in_bounds")),
        ("pallas_serial", lambda b, i, d: band_scatter_add(b, i, d)),
    ]
    for name, fn in variants:
        # fresh band per variant: the timed call DONATES it
        band = jax.random.normal(key, (Nb, D), jnp.float32)
        timed(name, fn, band, idx, delta)


if __name__ == "__main__":
    main()
