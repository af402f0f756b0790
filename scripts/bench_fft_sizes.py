"""Measure TPU FFT throughput across candidate padded transform sizes.

The stacked forward pads linear convolutions to ``image + kernel - 1``
(1056 = 2^5 * 3 * 11 at the 1024^2 / 33x33 benchmark shape). XLA's TPU
FFT lowering is mixed-radix; sizes with only small prime factors
(2, 3, 5) typically run faster than ones with a factor of 11, at the
cost of transforming more points. This harness times the *actual*
per-step FFT workload — a batch of packed complex 2-D transforms, one
forward + one inverse — at each candidate size, so the padded-vs-radix
trade is measured rather than guessed.

Usage::

    python scripts/bench_fft_sizes.py --batch 5 --repeats 5
"""

import argparse
import time

import jax
import jax.numpy as jnp
import numpy as np


def time_roundtrip(size, batch, repeats, inner=50):
    """fwd fft2 -> kernel multiply -> ifft2, chained ``inner`` times
    inside one lax.scan so per-call tunnel latency (~25 ms, larger
    than the op itself) amortises away; one device->host fetch at the
    end is the fence (block_until_ready returns early on this
    backend). A bare ifft2(fft2(z)) roundtrip without the kernel
    multiply gets simplified to a copy — measured 0.01 ms."""
    shape = (batch, size, size)
    key0, key1 = jax.random.split(jax.random.PRNGKey(0))
    x = jax.lax.complex(
        jax.random.normal(key0, shape, jnp.float32),
        jax.random.normal(key1, shape, jnp.float32),
    )
    kft = jax.lax.complex(
        jax.random.normal(key1, shape[1:], jnp.float32),
        jax.random.normal(key0, shape[1:], jnp.float32),
    )

    @jax.jit
    def chain(z, k):
        def body(carry, _):
            # normalise so the chain neither overflows nor can any
            # iteration be folded away (each depends on the previous)
            y = jnp.fft.ifft2(jnp.fft.fft2(carry) * k)
            return y / jnp.max(jnp.abs(y)), None

        out, _ = jax.lax.scan(body, z, None, length=inner)
        return jnp.sum(jnp.real(out))

    float(chain(x, kft))  # compile
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        float(chain(x, kft))
        times.append((time.perf_counter() - t0) / inner)
    return min(times), float(np.median(times))


def factorize(n):
    out, p = [], 2
    while n > 1:
        while n % p == 0:
            out.append(p)
            n //= p
        p += 1
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=5,
                    help="packed complex transforms per step (obs/2)")
    ap.add_argument("--repeats", type=int, default=5)
    ap.add_argument("--sizes", type=int, nargs="*",
                    default=[1056, 1080, 1120, 1152, 1200, 1215, 1250,
                             1280, 1296, 1344, 1440, 1536, 2048])
    args = ap.parse_args()

    print(f"device: {jax.devices()[0]}, batch={args.batch} complex64 "
          f"2-D roundtrips (fft2+ifft2)")
    rows = []
    for size in args.sizes:
        best, med = time_roundtrip(size, args.batch, args.repeats)
        fac = "*".join(map(str, factorize(size)))
        rows.append((size, best, med, fac))
        print(f"  {size:5d} ({fac:>14s}): min {best * 1e3:7.2f} ms  "
              f"median {med * 1e3:7.2f} ms")
    base = next((r for r in rows if r[0] == 1056), rows[0])
    print("\nrelative to size {}:".format(base[0]))
    for size, best, _, fac in rows:
        print(f"  {size:5d}: {base[1] / best:5.2f}x")


if __name__ == "__main__":
    main()
