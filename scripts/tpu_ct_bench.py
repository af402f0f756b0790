"""CT matmul-conv vs the production packed-FFT path, benchmark shape.

Chained-dependency timing (no caching/elision possible) of the
pair-packed convolution at benchmark scale: 5 packed pairs (10 obs) of
1024^2 images, 33^2 kernels. Compares jnp.fft packed pairs against
ct_convolve_pair at several (fft_shape, factors) choices and both
precisions, fwd and fwd+bwd.
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

    def timeit(fn, args, label, iters=20):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        x = args[0]
        for _ in range(iters):
            y0, y1 = fn(x, *args[1:])
            x = y0 + 0.5  # chain
        jax.block_until_ready(x)
        per = (time.time() - t0) / iters
        print(f"{label}: {per*1e3:7.2f} ms", flush=True)
        return per

    # ---- production packed FFT
    fs = (1056, 1056)
    a, b = kernel_fft_pair(k0, k1, (h, h), fs)

    @jax.jit
    def fft_fwd(x0, x1):
        return convolve_fft_packed_pair(x0, x1, a, b, fs)

    @jax.jit
    def fft_fb(x0, x1):
        def f(u):
            p, q = convolve_fft_packed_pair(u, x1, a, b, fs)
            return jnp.sum(p) + jnp.sum(q)
        g = jax.grad(f)(x0)
        return g, g

    timeit(fft_fwd, (x0, x1), "fft  1056 packed fwd    ")
    timeit(fft_fb, (x0, x1), "fft  1056 packed fwd+bwd")

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

            @jax.jit
            def ct_fwd(x0, x1, tabs=tabs, spec=spec, fs_ct=fs_ct,
                       prec=prec):
                return ct_convolve_pair(x0, x1, *spec, tabs, fs_ct,
                                        prec)

            @jax.jit
            def ct_fb(x0, x1, tabs=tabs, spec=spec, fs_ct=fs_ct,
                      prec=prec):
                def f(u):
                    p, q = ct_convolve_pair(u, x1, *spec, tabs,
                                            fs_ct, prec)
                    return jnp.sum(p) + jnp.sum(q)
                g = jax.grad(f)(x0)
                return g, g

            n1 = factors[0][0]
            label = f"ct {fs_ct[0]}x{n1:3d} {pname}"
            try:
                timeit(ct_fwd, (x0, x1), f"{label} fwd    ")
                timeit(ct_fb, (x0, x1), f"{label} fwd+bwd")
            except Exception as e:  # noqa: BLE001
                print(f"{label}: FAILED {type(e).__name__}: "
                      f"{str(e)[:120]}", flush=True)


if __name__ == "__main__":
    main()
