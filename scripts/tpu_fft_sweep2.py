"""Fetch-synced FFT convolution size sweep (batch-10, 1024^2 images)."""

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
    img = jnp.asarray(rs.rand(10, 1, 1, 1024, 1024).astype(np.float32))

    def timeit_fetch(fn, args, label, iters=20):
        out = fn(*args)
        value = float(np.asarray(out))
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        value = float(np.asarray(out))
        per = (time.time() - t0) / iters
        print(f"{label}: {per*1e3:7.2f} ms  [{value:.3e}]", flush=True)

    for s in [1056, 1080, 1120, 1152, 1200, 1280, 1296, 1440, 1600, 2048]:
        # build the complex kernel FFT on-device (complex h2d transfers
        # are unimplemented on the tunnel backend)
        kernel = jnp.asarray(
            rs.rand(10, 1, 1, 33, 33).astype(np.float32) * 1e-3
        )
        kft = jax.jit(
            lambda k, s=s: jnp.fft.rfft2(k, s=(s, s))
        )(kernel)

        @jax.jit
        def conv(x, kft, s=s):
            return convolve_fft_precomputed(x, kft, (s, s)).sum()

        timeit_fetch(conv, (img, kft), f"conv {s:5d} ({_factor(s):>9s})")


if __name__ == "__main__":
    main()
