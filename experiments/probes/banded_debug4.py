"""Validate the de-aliased band size: full padded op mix with
band=32776 (=8*4097, 2-adic valuation 3) vs 32768 (=2^15).
Also checks unaligned-start dynamic_slice costs nothing extra."""
import sys, time
sys.path.insert(0, "/root/repo")
import jax
import jax.numpy as jnp

B, D, Ks, G, S = 32768, 64, 128, 8, 30
N_BIG = 921_878


def timed(name, fn, state, *args):
    call = jax.jit(fn, donate_argnums=(0,))
    t0 = time.time()
    out = call(state, *args); float(out[-1]); comp = time.time() - t0
    state = out[0]; t0 = time.time()
    for _ in range(4):
        out = call(state, *args); state = out[0]
    float(out[-1]); dt = (time.time() - t0) / (4 * S)
    print(f"{name:16s} {dt*1e3:8.3f} ms/step  {B/dt/1e6:7.2f} M/s"
          f"   ({comp:.0f}s compile)", flush=True)


def make(band):
    n_bands = -(-N_BIG // band)
    n_pad = n_bands * band

    def call(state, key, alpha):
        def body(carry, _):
            (wv, wc), key = carry
            key, k1, k2, k3, k4 = jax.random.split(key, 5)
            b = jax.random.randint(k1, (), 0, n_bands) * band
            ds = jax.lax.dynamic_slice(wc, (b, 0), (band, D))
            pos_l = jax.random.randint(k2, (B,), 0, band, jnp.int32)
            src_s = jax.random.randint(k3, (B // G,), 0, N_BIG, jnp.int32)
            negs = jax.random.randint(k4, (Ks,), 0, N_BIG, jnp.int32)
            v = jnp.repeat(wv.at[src_s].get(mode="promise_in_bounds"), G, 0)
            cp = ds.at[pos_l].get(mode="promise_in_bounds")
            cn = wc.at[negs].get(mode="promise_in_bounds")
            s_pos = jax.nn.sigmoid(jnp.einsum("bd,bd->b", v, cp))
            f = jnp.dot(v, cn.T, preferred_element_type=jnp.float32)
            s_neg = jax.nn.sigmoid(f)
            g_pos = (1.0 - s_pos) * 0.025
            g_neg = -s_neg * (0.025 * (5.0 / Ks))
            d_src = g_pos[:, None] * cp + jnp.dot(
                g_neg, cn, preferred_element_type=jnp.float32)
            d_pos = g_pos[:, None] * v
            d_neg = jnp.dot(g_neg.T, v, preferred_element_type=jnp.float32)
            ds = ds.at[pos_l].add(d_pos)
            negs_l = negs - b
            in_b = (negs_l >= 0) & (negs_l < band)
            ds = ds.at[jnp.where(in_b, negs_l, band)].add(d_neg, mode="drop")
            wc = wc.at[jnp.where(in_b, n_pad, negs)].add(d_neg, mode="drop")
            wc = jax.lax.dynamic_update_slice(wc, ds, (b, 0))
            wv = wv.at[src_s].add(d_src.reshape(B // G, G, D).sum(1),
                                  mode="promise_in_bounds")
            return ((wv, wc), key), d_src[0, 0]
        (state, key), xs = jax.lax.scan(body, (state, key), None, length=S)
        return state, xs.sum()
    return call, n_pad


def main():
    key = jax.random.PRNGKey(0)
    for band in (32776, 32768):
        fn, n_pad = make(band)
        wv = jax.random.uniform(jax.random.PRNGKey(1), (n_pad, D)) * 0.01
        wc = jnp.zeros((n_pad, D))
        timed(f"band={band} pad={n_pad}", fn, (wv, wc), key,
              jnp.float32(0.025))


if __name__ == "__main__":
    main()
