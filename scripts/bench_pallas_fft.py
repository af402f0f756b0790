"""Pallas matmul-DFT conv vs XLA packed FFT at benchmark shape.

The round-5 shot at the FFT-lowering gap (docs/performance.md
"Explicit bound"): chained-dependency timing of the pair-packed
convolution at benchmark scale — 5 packed pairs (10 obs) of 1024^2
images, 33^2 kernels. XLA FFT transforms at the measured-optimal
minimal 1056; the Pallas matmul-DFT at its native 1152 = 128*9.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    from jolideco_tpu.ops.fft import (
        convolve_fft_packed_pair, kernel_fft_pair,
    )
    from jolideco_tpu.ops.pallas_fft import (
        conv_packed_pfft, pfft_pair_spectra, pfft_size,
    )

    print("devices:", jax.devices(), flush=True)

    rs = np.random.RandomState(0)
    n_pairs, h = 5, 1024
    x0 = jnp.asarray(rs.rand(n_pairs, h, h).astype(np.float32))
    x1 = jnp.asarray(rs.rand(n_pairs, h, h).astype(np.float32))
    k0 = rs.rand(33, 33).astype(np.float64) * 1e-3
    k1 = rs.rand(33, 33).astype(np.float64) * 1e-3

    def timeit(fn, args, label, iters=20, reps=3):
        out = fn(*args)
        float(jnp.sum(out[0]))  # warm-up + sync via fetch
        best = float("inf")
        for _ in range(reps):
            t0 = time.time()
            x = args[0]
            for _ in range(iters):
                y0, y1 = fn(x, *args[1:])
                x = y0 + 0.5  # chain dependencies
            float(jnp.sum(x))  # only a fetch synchronises the tunnel
            best = min(best, (time.time() - t0) / iters)
        print(f"{label}: {best*1e3:7.2f} ms", flush=True)
        return best

    # ---- XLA packed FFT at the measured-optimal minimal shape
    fs = (1056, 1056)
    a, b = kernel_fft_pair(k0, k1, (h, h), fs)

    @jax.jit
    def fft_fwd(x0, x1, a, b):
        return convolve_fft_packed_pair(x0, x1, a, b, fs)

    @jax.jit
    def fft_fb(x0, x1, a, b):
        def f(u):
            p, q = convolve_fft_packed_pair(u, x1, a, b, fs)
            return jnp.sum(p * p) + jnp.sum(q * q)
        g = jax.grad(f)(x0)
        return g, g

    timeit(fft_fwd, (x0, x1, a, b), "XLA fft @1056      fwd   ")
    timeit(fft_fb, (x0, x1, a, b), "XLA fft @1056      fwd+bwd")

    # ---- Pallas matmul-DFT
    n = pfft_size(h + 33 - 1)
    planes = pfft_pair_spectra(k0, k1, (h, h), n)
    spectra = tuple(
        jnp.asarray(np.broadcast_to(p, (n_pairs, n, n)).copy())
        for p in planes
    )

    ref0, ref1 = fft_fwd(x0, x1, a, b)

    for mode in ("f32", "split", "bf16"):
        pf_fwd = jax.jit(
            lambda x0, x1, *s, _m=mode: conv_packed_pfft(
                x0, x1, *s, n, _m, False
            )
        )

        def make_fb(_m):
            @jax.jit
            def pf_fb(x0, x1, *s):
                def f(u):
                    p, q = conv_packed_pfft(u, x1, *s, n, _m, False)
                    return jnp.sum(p * p) + jnp.sum(q * q)
                g = jax.grad(f)(x0)
                return g, g
            return pf_fb

        y0, y1 = pf_fwd(x0, x1, *spectra)
        err = float(
            jnp.max(jnp.abs(y0 - ref0)) / jnp.max(jnp.abs(ref0))
        )
        print(f"pfft {mode} rel err vs XLA: {err:.2e}", flush=True)
        timeit(pf_fwd, (x0, x1) + spectra,
               f"pfft @{n} {mode:5s} fwd   ")
        timeit(make_fb(mode), (x0, x1) + spectra,
               f"pfft @{n} {mode:5s} fwd+bwd")


if __name__ == "__main__":
    main()
