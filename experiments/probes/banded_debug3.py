"""Bisect WHICH op in the padded full-mix step (950,272 rows) costs the
extra ~2.6 ms (banded_debug2: pad=3.86ms vs base=1.23ms, while the pure
slice+scatter+dus sweep is fast at every size)."""
import sys
import time

sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, D, Ks, G, S = 32768, 64, 128, 8, 30
N_BIG = 921_878
BAND = 32_768
N_PAD = 950_272


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
    print(f"{name:12s} {dt*1e3:8.3f} ms/step  {B/dt/1e6:7.2f} M/s"
          f"   ({comp:.0f}s compile)", flush=True)


def make(nwv, nwc, do_wv=True, do_cn=True, do_drop=True, do_grads=True):
    n_bands = nwc // BAND

    def call(state, key, alpha):
        def body(carry, _):
            (wv, wc), key = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            b = jax.random.randint(k1, (), 0, n_bands) * BAND
            ds = jax.lax.dynamic_slice(wc, (b, 0), (BAND, D))
            pos_l = jax.random.randint(k2, (B,), 0, BAND, jnp.int32)
            src_s = jax.random.randint(k3, (B // G,), 0, N_BIG, jnp.int32)
            negs = jax.random.randint(k4, (Ks,), 0, N_BIG, jnp.int32)

            v = jnp.repeat(wv.at[src_s].get(mode="promise_in_bounds"),
                           G, axis=0)
            cp = ds.at[pos_l].get(mode="promise_in_bounds")
            cn = (wc.at[negs].get(mode="promise_in_bounds") if do_cn
                  else jnp.ones((Ks, D)) * 1e-3)

            if do_grads:
                s_pos = jax.nn.sigmoid(jnp.einsum("bd,bd->b", v, cp))
                f = jnp.dot(v, cn.T, preferred_element_type=jnp.float32)
                s_neg = jax.nn.sigmoid(f)
                g_pos = (1.0 - s_pos) * 0.025
                g_neg = -s_neg * (0.025 * (5.0 / Ks))
                d_src = g_pos[:, None] * cp + jnp.dot(
                    g_neg, cn, preferred_element_type=jnp.float32)
                d_pos = g_pos[:, None] * v
                d_neg = jnp.dot(g_neg.T, v,
                                preferred_element_type=jnp.float32)
            else:
                d_src = v * 1e-7
                d_pos = cp * 1e-7
                d_neg = cn * 1e-7

            ds = ds.at[pos_l].add(d_pos)
            if do_drop:
                negs_l = negs - b
                in_b = (negs_l >= 0) & (negs_l < BAND)
                ds = ds.at[jnp.where(in_b, negs_l, BAND)].add(
                    d_neg, mode="drop")
                wc = wc.at[jnp.where(in_b, nwc, negs)].add(
                    d_neg, mode="drop")
            wc = jax.lax.dynamic_update_slice(wc, ds, (b, 0))
            if do_wv:
                wv = wv.at[src_s].add(d_src.reshape(B // G, G, D).sum(1),
                                      mode="promise_in_bounds")
            return ((wv, wc), key), d_src[0, 0]

        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()

    return call


def main():
    key = jax.random.PRNGKey(0)
    variants = [
        ("pad_all", dict(nwv=N_PAD, nwc=N_PAD)),
        ("wv_unpad", dict(nwv=N_BIG, nwc=N_PAD)),
        ("no_wvscat", dict(nwv=N_PAD, nwc=N_PAD, do_wv=False)),
        ("no_cn", dict(nwv=N_PAD, nwc=N_PAD, do_cn=False)),
        ("no_drop", dict(nwv=N_PAD, nwc=N_PAD, do_drop=False)),
        ("no_grads", dict(nwv=N_PAD, nwc=N_PAD, do_grads=False)),
    ]
    want = sys.argv[1:] or None
    for name, kw in variants:
        if want and name not in want:
            continue
        wv = jax.random.uniform(jax.random.PRNGKey(1), (kw["nwv"], D)) * 0.01
        wc = jnp.zeros((kw["nwc"], D))
        timed(name, make(**kw), (wv, wc), key, jnp.float32(0.025))


if __name__ == "__main__":
    main()
