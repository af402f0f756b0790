"""Trustworthy convolution timing: full-array chained dependencies.

Each iteration feeds the previous output back as input, so no layer of
the stack can cache or elide executions. Compares FFT convolution at
several paddings against direct (spatial) convolution for the bench
PSF size, over the stacked 10-observation batch.
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

    from jolideco_tpu.ops.fft import convolve_fft_precomputed

    print("devices:", jax.devices(), flush=True)

    rs = np.random.RandomState(0)
    x0 = jnp.asarray(rs.rand(10, 1, 1024, 1024).astype(np.float32))

    def timeit_chained(fn, x0, label, extra=(), iters=10):
        x = fn(x0, *extra)
        jax.block_until_ready(x)
        t0 = time.time()
        for _ in range(iters):
            x = fn(x, *extra)
        jax.block_until_ready(x)
        per = (time.time() - t0) / iters
        print(f"{label}: {per*1e3:7.2f} ms", flush=True)

    for s in [1056, 1080, 1152]:
        # small kernel magnitudes keep the chained values bounded
        kft = jnp.asarray(
            (rs.rand(10, 1, s, s // 2 + 1) * 1e-4
             + 1j * 1e-4 * rs.rand(10, 1, s, s // 2 + 1)).astype(np.complex64)
        )

        @jax.jit
        def conv(x, kft, s=s):
            return convolve_fft_precomputed(x, kft, (s, s)) + 0.5

        timeit_chained(conv, x0, f"fft conv {s:5d}  ", extra=(kft,))

    # direct spatial convolution, PSF 33x33, one shared kernel
    kernel = jnp.asarray(rs.rand(1, 1, 33, 33).astype(np.float32) * 1e-3)

    @jax.jit
    def direct(x, kernel):
        return lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + 0.5

    timeit_chained(direct, x0, "direct conv 33x33", extra=(kernel,))

    # per-obs kernels via grouped conv
    kernels10 = jnp.asarray(rs.rand(10, 1, 33, 33).astype(np.float32) * 1e-3)
    x0g = x0.reshape(1, 10, 1024, 1024)

    @jax.jit
    def grouped(x, kernels10):
        return lax.conv_general_dilated(
            x, kernels10, window_strides=(1, 1), padding="SAME",
            feature_group_count=10,
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        ) + 0.5

    timeit_chained(grouped, x0g, "grouped conv 33x33", extra=(kernels10,))

    # pure elementwise chain for overhead reference
    @jax.jit
    def elementwise(x):
        return x * 0.999 + 0.001

    timeit_chained(elementwise, x0, "elementwise ref  ")


if __name__ == "__main__":
    main()
