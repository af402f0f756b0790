"""CT matmul-conv vs the production packed-FFT path, benchmark shape.

Chained-dependency timing (no caching/elision possible) of the
pair-packed convolution at benchmark scale: 5 packed pairs (10 obs) of
1024^2 images, 33^2 kernels. Compares jnp.fft packed pairs against
ct_convolve_pair at several (fft_shape, factors) choices and both
precisions, fwd and fwd+bwd.
"""

import sys
import time
from functools import partial
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    from jolideco_tpu.ops.ct_conv import (
        ct_convolve_pair, ct_kernel_pair, make_ct_tables,
    )
    from jolideco_tpu.ops.fft import (
        convolve_fft_packed_pair, kernel_fft_pair,
    )

    print("devices:", jax.devices(), flush=True)

    rs = np.random.RandomState(0)
    n_pairs, h = 5, 1024
    x0 = jnp.asarray(rs.rand(n_pairs, 1, h, h).astype(np.float32))
    x1 = jnp.asarray(rs.rand(n_pairs, 1, h, h).astype(np.float32))
    k0 = rs.rand(33, 33).astype(np.float64) * 1e-3
    k1 = rs.rand(33, 33).astype(np.float64) * 1e-3

    def timeit(fn, args, label, iters=20, reps=2):
        out = fn(*args)
        float(jnp.sum(out[0]))  # warm-up, synchronised by the fetch
        best = float("inf")
        for _ in range(reps):  # min over reps: tunnel hiccups inflate
            t0 = time.time()
            x = args[0]
            for _ in range(iters):
                y0, y1 = fn(x, *args[1:])
                x = y0 + 0.5  # chain
            # on the tunnel backend only a real device->host fetch
            # synchronises (block_until_ready returns early), so the
            # timed window must end with one
            float(jnp.sum(x))
            best = min(best, (time.time() - t0) / iters)
        print(f"{label}: {best*1e3:7.2f} ms", flush=True)
        return best

    # ---- production packed FFT
    # complex spectra/tables must be jit ARGUMENTS, not closures: the
    # tunnel backend cannot fetch complex arrays to host, which is
    # exactly what constant-embedding a captured device array does
    fs = (1056, 1056)
    a, b = kernel_fft_pair(k0, k1, (h, h), fs)

    @jax.jit
    def fft_fwd(x0, x1, a, b):
        return convolve_fft_packed_pair(x0, x1, a, b, fs)

    @jax.jit
    def fft_fb(x0, x1, a, b):
        def f(u):
            p, q = convolve_fft_packed_pair(u, x1, a, b, fs)
            # square so the gradient depends on u — a linear loss's
            # gradient is input-independent and XLA would hoist the
            # whole backward out of the timing chain
            return jnp.sum(p * p) + jnp.sum(q * q)
        g = jax.grad(f)(x0)
        return g, g

    timeit(fft_fwd, (x0, x1, a, b), "fft  1056 packed fwd    ")
    timeit(fft_fb, (x0, x1, a, b), "fft  1056 packed fwd+bwd")

    # ---- CT variants
    configs = [
        ((1056, 1056), ((176, 6), (176, 6))),
        ((1056, 1056), ((132, 8), (132, 8))),
        ((1056, 1056), ((96, 11), (96, 11))),
        ((1056, 1056), ((33, 32), (33, 32))),
        ((1152, 1152), ((128, 9), (128, 9))),
        ((1152, 1152), ((192, 6), (192, 6))),
        ((1089, 1089), ((121, 9), (121, 9))),
    ]
    for fs_ct, factors in configs:
        tabs = make_ct_tables(fs_ct, factors)
        spec = ct_kernel_pair(k0, k1, (h, h), fs_ct, factors)
        for prec, pname in (("split3", "s3"),
                            (lax.Precision.DEFAULT, "bf")):

            @partial(jax.jit, static_argnames=("fs_ct", "prec"))
            def ct_fwd(x0, x1, spec, tabs, fs_ct=fs_ct, prec=prec):
                return ct_convolve_pair(x0, x1, *spec, tabs, fs_ct,
                                        prec)

            @partial(jax.jit, static_argnames=("fs_ct", "prec"))
            def ct_fb(x0, x1, spec, tabs, fs_ct=fs_ct, prec=prec):
                def f(u):
                    p, q = ct_convolve_pair(u, x1, *spec, tabs,
                                            fs_ct, prec)
                    return jnp.sum(p * p) + jnp.sum(q * q)
                g = jax.grad(f)(x0)
                return g, g

            n1 = factors[0][0]
            label = f"ct {fs_ct[0]}x{n1:3d} {pname}"
            try:
                timeit(ct_fwd, (x0, x1, spec, tabs), f"{label} fwd    ")
                timeit(ct_fb, (x0, x1, spec, tabs), f"{label} fwd+bwd")
            except Exception as e:  # noqa: BLE001
                print(f"{label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
