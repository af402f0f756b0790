"""Sweep 2-D real-FFT conv sizes on TPU to pick the padding policy.

Times the actual ``convolve_fft_precomputed`` path (traced kernel FFT,
centered output slice) plus its gradient, batched over 10 observations.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def _factor(n):
    out = []
    for p in (2, 3, 5, 7, 11, 13):
        c = 0
        while n % p == 0:
            n //= p
            c += 1
        if c:
            out.append(f"{p}^{c}")
    if n > 1:
        out.append(str(n))
    return "*".join(out)


def main():
    import jax
    import jax.numpy as jnp

    from jolideco_tpu.ops.fft import convolve_fft_precomputed

    print("devices:", jax.devices(), flush=True)

    rs = np.random.RandomState(0)
    base = jnp.asarray(rs.rand(10, 1, 1, 1024, 1024).astype(np.float32))

    def timeit_chained(fn, x, kft, iters=10):
        # serial dependency between iterations defeats any duplicate-
        # execution caching in the remote backend
        out = fn(x, kft)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(x + out * 1e-30, kft)
        jax.block_until_ready(out)
        return (time.time() - t0) / iters

    for s in [1056, 1080, 1152, 1280, 1296, 1440, 2048]:
        kft = jnp.asarray(
            (rs.rand(10, 1, 1, s, s // 2 + 1)
             + 1j * rs.rand(10, 1, 1, s, s // 2 + 1)).astype(np.complex64)
        )

        @jax.jit
        def conv(x, kft, s=s):
            return convolve_fft_precomputed(x, kft, (s, s)).sum()

        t_fwd = timeit_chained(conv, base, kft)

        grad_fn = jax.grad(
            lambda x, kft, s=s: convolve_fft_precomputed(
                x, kft, (s, s)
            ).sum()
        )

        @jax.jit
        def grad_sum(x, kft, s=s):
            return grad_fn(x, kft).sum()

        t_grad = timeit_chained(grad_sum, base, kft)

        print(
            f"conv {s:5d}: fwd {t_fwd*1e3:7.2f} ms  grad {t_grad*1e3:7.2f} "
            f"ms   ({s}={_factor(s)})",
            flush=True,
        )


if __name__ == "__main__":
    main()
