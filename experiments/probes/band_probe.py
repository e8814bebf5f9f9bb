"""Probe for the BANDED-update design (the VERDICT #1 attack).

Questions, in order:
  (1) scatter per-row cost vs table size -- 32k..922k rows: is the 5.3x
      small-table win a VMEM-residency effect or does HBM scatter itself
      get cheaper as the table shrinks? Where is the cliff?
  (2) banded scatter: dynamic_slice a 32k-row band out of the big table,
      scatter B rows into the slice, dynamic_update_slice it back --
      per-step cost vs a direct big-table scatter. THE design gate: if
      this is ~small-table speed + ~20us of band copy, stratified banded
      steps make every pos row "hot".
  (3) scatter-SET with precomputed unique indices (no RMW) vs ADD.
Run: python experiments/band_probe.py   (real TPU)
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B = 32768
D = 64
S = 30
N_BIG = 921_878  # faithful yt-scale vertex count
BAND = 32_768


def timed(name, fn, state, *args):
    call = jax.jit(fn, donate_argnums=(0,))
    t0 = time.time()
    state, x = call(state, *args)
    float(x)
    comp = time.time() - t0
    t0 = time.time()
    for _ in range(4):
        state, x = call(state, *args)
    float(x)
    dt = (time.time() - t0) / (4 * S)
    print(f"{name:28s} {dt*1e3:8.3f} ms/step   ({comp:.0f}s compile)",
          flush=True)
    return dt


def scan_scatter(n_rows):
    def call(state, key):
        def body(carry, _):
            (table, acc), key = carry
            key, sub = jax.random.split(key)
            idx = jax.random.randint(sub, (B,), 0, n_rows, jnp.int32)
            delta = jnp.full((B, D), 1e-7, jnp.float32)
            table = table.at[idx].add(delta, mode="promise_in_bounds")
            return ((table, acc), key), table[0, 0]

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()

    return call


def scan_banded_scatter(n_rows, band):
    """Per step: pick a random aligned band, slice it out, scatter B rows
    into the slice, write the band back."""
    n_bands = n_rows // band

    def call(state, key):
        def body(carry, _):
            (table, acc), key = carry
            key, k1, k2 = jax.random.split(key, 3)
            b = jax.random.randint(k1, (), 0, n_bands) * band
            ds = jax.lax.dynamic_slice(table, (b, 0), (band, D))
            idx = jax.random.randint(k2, (B,), 0, band, jnp.int32)
            delta = jnp.full((B, D), 1e-7, jnp.float32)
            ds = ds.at[idx].add(delta, mode="promise_in_bounds")
            table = jax.lax.dynamic_update_slice(table, ds, (b, 0))
            return ((table, acc), key), table[0, 0]

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()

    return call


def scan_banded_full(n_rows, band):
    """Banded step with the FULL op mix of a production SGNS step: pos
    gather from the band, src gather/scatter (B//8 rows, grouped) on a
    second big table, negs gather + band-split neg scatter, MXU grads."""
    n_bands = n_rows // band
    Ks = 128
    G = 8

    def call(state, key):
        def body(carry, _):
            (wv, wc, acc), key = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            b = jax.random.randint(k1, (), 0, n_bands) * band
            ds = jax.lax.dynamic_slice(wc, (b, 0), (band, D))

            pos_l = jax.random.randint(k2, (B,), 0, band, jnp.int32)
            src_s = jax.random.randint(k3, (B // G,), 0, n_rows, jnp.int32)
            negs = jax.random.randint(k4, (Ks,), 0, n_rows, jnp.int32)

            v_s = wv.at[src_s].get(mode="promise_in_bounds")
            v = jnp.repeat(v_s, G, axis=0)
            cp = ds.at[pos_l].get(mode="promise_in_bounds")
            cn = wc.at[negs].get(mode="promise_in_bounds")

            s_pos = jax.nn.sigmoid(jnp.einsum("bd,bd->b", v, cp))
            f = jnp.dot(v, cn.T, preferred_element_type=jnp.float32)
            g_pos = (1.0 - s_pos) * 0.025
            g_neg = -jax.nn.sigmoid(f) * (0.025 * (5.0 / Ks))
            d_src = g_pos[:, None] * cp + jnp.dot(
                g_neg, cn, preferred_element_type=jnp.float32
            )
            d_pos = g_pos[:, None] * v
            d_neg = jnp.dot(g_neg.T, v, preferred_element_type=jnp.float32)

            ds = ds.at[pos_l].add(d_pos, mode="promise_in_bounds")
            # band-split negative scatter (both tiny)
            negs_l = negs - b
            in_band = (negs_l >= 0) & (negs_l < band)
            ds = ds.at[jnp.where(in_band, negs_l, band)].add(
                d_neg, mode="drop"
            )
            wc = wc.at[jnp.where(in_band, n_rows, negs)].add(
                d_neg, mode="drop"
            )
            wc = jax.lax.dynamic_update_slice(wc, ds, (b, 0))
            wv = wv.at[src_s].add(
                d_src.reshape(B // G, G, D).sum(1), mode="promise_in_bounds"
            )
            return ((wv, wc, acc), key), d_src[0, 0]

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()

    return call


def scan_set_unique(n_rows):
    """Scatter-SET at B disjoint (iota-shifted) rows: the no-RMW ceiling."""
    def call(state, key):
        def body(carry, _):
            (table, acc), key = carry
            key, sub = jax.random.split(key)
            off = jax.random.randint(sub, (), 0, n_rows)
            idx = (jax.lax.broadcasted_iota(jnp.int32, (B, 1), 0)[:, 0]
                   + off) % n_rows
            vals = jnp.full((B, D), 1e-7, jnp.float32)
            table = table.at[idx].set(vals, unique_indices=True,
                                      mode="promise_in_bounds")
            return ((table, acc), key), table[0, 0]

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()

    return call


def main():
    key = jax.random.PRNGKey(0)
    print(f"B={B} D={D} S={S} band={BAND}")

    for n in (32_768, 65_536, 131_072, 262_144, 524_288, N_BIG):
        table = jnp.zeros((n, D), jnp.float32)
        timed(f"scatter n={n}", scan_scatter(n),
              (table, jnp.zeros((), jnp.float32)), key)

    for n in (N_BIG,):
        table = jnp.zeros((n, D), jnp.float32)
        timed(f"banded-scatter n={n}", scan_banded_scatter(n, BAND),
              (table, jnp.zeros((), jnp.float32)), key)

    table = jnp.zeros((N_BIG, D), jnp.float32)
    timed("set-unique n=big", scan_set_unique(N_BIG),
          (table, jnp.zeros((), jnp.float32)), key)

    wv = jnp.zeros((N_BIG, D), jnp.float32)
    wc = jnp.zeros((N_BIG, D), jnp.float32)
    timed("banded-FULL-step", scan_banded_full(N_BIG, BAND),
          (wv, wc, jnp.zeros((), jnp.float32)), key)


if __name__ == "__main__":
    main()
