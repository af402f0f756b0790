"""Fetch-synced tuning of the MAP-backward gather and the Poisson step.

Every timed window ends with a scalar fetch.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    def timeit_fetch(fn, args, label, iters=30):
        out = fn(*args)
        value = float(np.asarray(out))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        value = float(np.asarray(out))
        per = (time.time() - t0) / iters
        print(f"{label}: {per*1e3:7.2f} ms  [{value:.3e}]", flush=True)
        return per

    rs = np.random.RandomState(0)
    n, k, d = 65536, 200, 64
    x = jnp.asarray(rs.rand(n, d).astype(np.float32))
    a = jnp.asarray(rs.rand(k, d, d).astype(np.float32))
    a_flat = a.reshape(k, d * d)
    b = jnp.asarray(rs.rand(k, d).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, k, n), jnp.int32)
    g = jnp.asarray(rs.rand(n).astype(np.float32))

    # split representation for exact-f32 one-hot matmul gather
    a_hi = a_flat.astype(jnp.bfloat16).astype(jnp.float32)
    a_lo = a_flat - a_hi

    @jax.jit
    def v_take3d(x, a, b, idx, g):
        a_g = jnp.take(a, idx, axis=0)
        b_g = jnp.take(b, idx, axis=0)
        xa = jnp.sum(x[:, :, None] * a_g, axis=1)
        return (-(xa - b_g) * g[:, None]).sum()

    @jax.jit
    def v_takeflat(x, a_flat, b, idx, g):
        a_g = jnp.take(a_flat, idx, axis=0).reshape(-1, d, d)
        b_g = jnp.take(b, idx, axis=0)
        xa = jnp.sum(x[:, :, None] * a_g, axis=1)
        return (-(xa - b_g) * g[:, None]).sum()

    @jax.jit
    def v_onehot_split(x, a_hi, a_lo, b, idx, g):
        oh = jax.nn.one_hot(idx, k, dtype=jnp.float32)
        a_g = (
            jnp.dot(oh, a_hi, preferred_element_type=jnp.float32)
            + jnp.dot(oh, a_lo, preferred_element_type=jnp.float32)
        ).reshape(-1, d, d)
        b_g = jnp.take(b, idx, axis=0)
        xa = jnp.sum(x[:, :, None] * a_g, axis=1)
        return (-(xa - b_g) * g[:, None]).sum()

    @jax.jit
    def v_onehot_default(x, a_flat, b, idx, g):
        oh = jax.nn.one_hot(idx, k, dtype=jnp.float32)
        a_g = jnp.dot(oh, a_flat,
                      preferred_element_type=jnp.float32).reshape(-1, d, d)
        b_g = jnp.take(b, idx, axis=0)
        xa = jnp.sum(x[:, :, None] * a_g, axis=1)
        return (-(xa - b_g) * g[:, None]).sum()

    timeit_fetch(v_take3d, (x, a, b, idx, g), "bwd take3d        ")
    timeit_fetch(v_takeflat, (x, a_flat, b, idx, g), "bwd takeflat      ")
    timeit_fetch(v_onehot_split, (x, a_hi, a_lo, b, idx, g),
                 "bwd onehot split  ")
    timeit_fetch(v_onehot_default, (x, a_flat, b, idx, g),
                 "bwd onehot default")

    # ---------------- poisson-side decomposition -------------------
    from jolideco_tpu.ops.fft import convolve_fft_precomputed, kernel_fft

    img = jnp.asarray(rs.rand(10, 1, 1, 1024, 1024).astype(np.float32))
    psf = jnp.asarray(rs.rand(10, 1, 1, 33, 33).astype(np.float32) * 1e-3)
    fshape = (1080, 1080)
    kft = jax.vmap(lambda p: kernel_fft(p, (1024, 1024), fshape))(psf)
    counts = jnp.asarray(
        rs.poisson(3.0, (10, 1, 1, 1024, 1024)).astype(np.float32)
    )

    @jax.jit
    def conv_only(img, kft):
        return convolve_fft_precomputed(img, kft, fshape).sum()

    timeit_fetch(conv_only, (img, kft), "conv batch fwd    ")

    @jax.jit
    def conv_grad(img, kft):
        return jax.grad(
            lambda im: convolve_fft_precomputed(im, kft, fshape).sum()
        )(img).sum()

    timeit_fetch(conv_grad, (img, kft), "conv batch fwd+bwd")

    @jax.jit
    def nll_only(img, counts):
        npred = jnp.clip(img, 0, None) + 2.0
        return jnp.mean(npred - counts * jnp.log(npred + 1e-25))

    timeit_fetch(nll_only, (img, counts), "nll fwd           ")

    @jax.jit
    def nll_grad(img, counts):
        return jax.grad(
            lambda im: jnp.mean(
                jnp.clip(im, 0, None) + 2.0
                - counts * jnp.log(jnp.clip(im, 0, None) + 2.0 + 1e-25)
            )
        )(img).sum()

    timeit_fetch(nll_grad, (img, counts), "nll fwd+bwd       ")


if __name__ == "__main__":
    main()
