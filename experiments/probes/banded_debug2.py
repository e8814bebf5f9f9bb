"""Bisect synth (3.93 ms) vs band_probe's scan_banded_full (1.29 ms).
Differences tested one at a time:
  base     exact re-run of band_probe's scan_banded_full shape (N_BIG,
           28 bands, default scatter mode, const alpha, no loss monitor)
  pad      base + tables padded to a band multiple (29 bands)
  promise  base + mode="promise_in_bounds" on the pos scatter
  alpha    base + alpha as a traced scalar
  loss     base + the [:1024] log loss monitor
  all      all of the above = production step
Run: python experiments/banded_debug2.py   (real TPU)
"""

import functools
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

B, D, Ks, G, S = 32768, 64, 128, 8, 30
N_BIG = 921_878
BAND = 32_768


def timed(name, fn, state, *args):
    call = jax.jit(fn, donate_argnums=(0,))
    t0 = time.time()
    out = call(state, *args)
    float(out[-1])
    comp = time.time() - t0
    state = out[0]
    t0 = time.time()
    for _ in range(4):
        out = call(state, *args)
        state = out[0]
    float(out[-1])
    dt = (time.time() - t0) / (4 * S)
    print(f"{name:10s} {dt*1e3:8.3f} ms/step  {B/dt/1e6:7.2f} M/s"
          f"   ({comp:.0f}s compile)", flush=True)


def make(pad=False, promise=False, traced_alpha=False, loss_mon=False):
    n_rows = -(-N_BIG // BAND) * BAND if pad else N_BIG
    n_bands = n_rows // BAND
    kw = {"mode": "promise_in_bounds"} if promise else {}

    def call(state, key, alpha):
        def body(carry, _):
            (wv, wc), key = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            a = alpha if traced_alpha else 0.025
            b = jax.random.randint(k1, (), 0, n_bands) * BAND
            ds = jax.lax.dynamic_slice(wc, (b, 0), (BAND, D))
            pos_l = jax.random.randint(k2, (B,), 0, BAND, jnp.int32)
            src_s = jax.random.randint(k3, (B // G,), 0, N_BIG, jnp.int32)
            negs = jax.random.randint(k4, (Ks,), 0, N_BIG, jnp.int32)

            v = jnp.repeat(wv.at[src_s].get(mode="promise_in_bounds"),
                           G, axis=0)
            cp = ds.at[pos_l].get(mode="promise_in_bounds")
            cn = wc.at[negs].get(mode="promise_in_bounds")

            s_pos = jax.nn.sigmoid(jnp.einsum("bd,bd->b", v, cp))
            f = jnp.dot(v, cn.T, preferred_element_type=jnp.float32)
            s_neg = jax.nn.sigmoid(f)
            g_pos = (1.0 - s_pos) * a
            g_neg = -s_neg * (a * (5.0 / Ks))
            d_src = g_pos[:, None] * cp + jnp.dot(
                g_neg, cn, preferred_element_type=jnp.float32)
            d_pos = g_pos[:, None] * v
            d_neg = jnp.dot(g_neg.T, v, preferred_element_type=jnp.float32)

            ds = ds.at[pos_l].add(d_pos, **kw)
            negs_l = negs - b
            in_b = (negs_l >= 0) & (negs_l < BAND)
            ds = ds.at[jnp.where(in_b, negs_l, BAND)].add(d_neg, mode="drop")
            wc = wc.at[jnp.where(in_b, n_rows, negs)].add(d_neg, mode="drop")
            wc = jax.lax.dynamic_update_slice(wc, ds, (b, 0))
            wv = wv.at[src_s].add(d_src.reshape(B // G, G, D).sum(1),
                                  mode="promise_in_bounds")
            if loss_mon:
                eps = 1e-7
                ce = -jnp.log(s_pos[:1024] + eps) - (5.0 / Ks) * jnp.sum(
                    jnp.log(1.0 - s_neg[:1024] + eps), axis=-1)
                out = jnp.mean(ce)
            else:
                out = d_src[0, 0]
            return ((wv, wc), key), out

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()

    return call, n_rows


def main():
    key = jax.random.PRNGKey(0)
    variants = [
        ("base", {}),
        ("pad", {"pad": True}),
        ("promise", {"promise": True}),
        ("alpha", {"traced_alpha": True}),
        ("loss", {"loss_mon": True}),
        ("all", {"pad": True, "promise": True, "traced_alpha": True,
                 "loss_mon": True}),
    ]
    want = sys.argv[1:] or None
    for name, kw in variants:
        if want and name not in want:
            continue
        fn, n_rows = make(**kw)
        wv = jax.random.uniform(jax.random.PRNGKey(1), (n_rows, D)) * 0.01
        wc = jnp.zeros((n_rows, D))
        timed(name, fn, (wv, wc), key, jnp.float32(0.025))


if __name__ == "__main__":
    main()


def size_sweep():
    """Which table sizes trigger the slow scatter path?"""
    key = jax.random.PRNGKey(0)
    for n_rows in (917_504, 921_878, 921_880, 933_888, 950_272, 950_273,
                   983_040):
        fn, _ = make()  # base variant but with overridden tables
        # rebuild a closure with this size
        def mk(n_rows):
            n_bands = n_rows // BAND

            def call(state, key, alpha):
                def body(carry, _):
                    (wv, wc), key = carry
                    key, k1, k2, k3, k4 = jax.random.split(key, 5)
                    b = jax.random.randint(k1, (), 0, n_bands) * BAND
                    ds = jax.lax.dynamic_slice(wc, (b, 0), (BAND, D))
                    pos_l = jax.random.randint(k2, (B,), 0, BAND, jnp.int32)
                    negs = jax.random.randint(k4, (Ks,), 0, n_rows, jnp.int32)
                    d_pos = jnp.full((B, D), 1e-7, jnp.float32)
                    ds = ds.at[pos_l].add(d_pos)
                    wc = jax.lax.dynamic_update_slice(wc, ds, (b, 0))
                    return ((wv, wc), key), wc[0, 0]

                (state, key), xs = jax.lax.scan(body, (state, key), None,
                                                length=S)
                return state, xs.sum()

            return call

        wv = jnp.zeros((8, D))
        wc = jnp.zeros((n_rows, D))
        timed(f"n={n_rows}", mk(n_rows), (wv, wc), key, jnp.float32(0.025))


if __name__ == "__main__" and "sweep" in sys.argv:
    size_sweep()
