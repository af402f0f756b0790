"""Prototype: wrap-corrected circular convolution at the native image
size vs the padded linear convolution.

The padded path transforms at ``image + kernel - 1`` (1056 at the
benchmark shape). A circular convolution at the image's own 1024
(pure radix-2) measured 1.23x faster per transform pair
(``bench_fft_sizes.py``, chained timing) — and is EXACTLY correctable
to the linear "same" result by subtracting the wraparound aliases,
which live in h-wide border bands (h = kernel//2) and are computable
from four thin strip convolutions of the image's border bands:

    y_same = circ_N(x, k) - wrap(T) - wrap(B) - L - R

where T/B are the top/bottom aprons of the linear convolution
(rows [-h, 0) and [N, N+h), full extended width, which depend only on
the first/last h rows of x) and L/R the left/right aprons over the
core rows. Every out-of-range cell of the linear output lands in
exactly one strip, so the subtraction is exact (float assert below).

Usage::

    python scripts/bench_wrap_conv.py --batch 5 --inner 50
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def build_wrap_products(kernels, n):
    """Per-kernel build products for the wrap-corrected path.

    kernels: list of (P, P) float arrays (P odd for this prototype).
    Returns packed spectra for the main circular conv at (n, n) and
    packed spectra + geometry for the four apron strip convs.
    """
    from jolideco_tpu.ops.fft import (
        _complex_on_device,
        _origin_centered_numpy,
        kernel_fft_pair,
    )

    p = kernels[0].shape[-1]
    assert all(k.shape == (p, p) for k in kernels) and p % 2 == 1
    h = p // 2
    assert 2 * h <= n

    pairs = [(kernels[i], kernels[i + 1]) for i in range(0, len(kernels), 2)]

    # main circular conv: origin-centered kernel spectra AT the image
    # shape (kernel wraps around the corner — that is the circular
    # embedding; kernel_fft_pair's linear-size check is deliberately
    # bypassed)
    def circular_pair(k0, k1):
        f0 = np.fft.fft2(_origin_centered_numpy(k0, (n, n)), s=(n, n))
        f1 = np.fft.fft2(_origin_centered_numpy(k1, (n, n)), s=(n, n))
        a, b = 0.5 * (f0 + f1), 0.5 * (f0 - f1)
        return (
            _complex_on_device(np.asarray(a.real, np.float32),
                               np.asarray(a.imag, np.float32)),
            _complex_on_device(np.asarray(b.real, np.float32),
                               np.asarray(b.imag, np.float32)),
        )

    main = [circular_pair(k0, k1) for k0, k1 in pairs]

    # strip convs: the strip is placed at offset (h, h) inside a canvas
    # whose "same"-crop then exposes the apron rows/cols of the linear
    # output. T/B canvas: (3h, n + 2h); L/R canvas: (n + 2h, 3h).
    tb_canvas = (3 * h, n + 2 * h)
    lr_canvas = (n + 2 * h, 3 * h)
    tb_fft = (tb_canvas[0] + p - 1, tb_canvas[1] + p - 1)
    lr_fft = (lr_canvas[0] + p - 1, lr_canvas[1] + p - 1)
    tb = [kernel_fft_pair(k0, k1, tb_canvas, tb_fft) for k0, k1 in pairs]
    lr = [kernel_fft_pair(k0, k1, lr_canvas, lr_fft) for k0, k1 in pairs]
    return {
        "h": h,
        "n": n,
        "main": main,
        "tb": tb,
        "lr": lr,
        "tb_canvas": tb_canvas,
        "lr_canvas": lr_canvas,
        "tb_fft": tb_fft,
        "lr_fft": lr_fft,
    }


def wrap_convolve(x, prod):
    """x: (n_pairs, 2, N, N) real pairs -> same-shaped linear conv."""
    import jax.numpy as jnp

    from jolideco_tpu.ops.fft import convolve_fft_packed_pair

    h, n = prod["h"], prod["n"]

    def packed(x0, x1, ab, shape):
        a, b = ab
        return convolve_fft_packed_pair(x0, x1, a, b, shape)

    y0s, y1s = [], []
    for i in range(x.shape[0]):
        x0, x1 = x[i, 0], x[i, 1]
        # circular main: fft_shape == image shape -> no padding, the
        # crop is a no-op, the conv wraps
        yc0, yc1 = packed(x0, x1, prod["main"][i], (n, n))

        # aprons: place border bands of x into the canvases
        tb_c = prod["tb_canvas"]
        canvas_t0 = jnp.zeros(tb_c, x.dtype).at[h:2 * h, h:h + n].set(
            x0[0:h, :]
        )
        canvas_t1 = jnp.zeros(tb_c, x.dtype).at[h:2 * h, h:h + n].set(
            x1[0:h, :]
        )
        canvas_b0 = jnp.zeros(tb_c, x.dtype).at[h:2 * h, h:h + n].set(
            x0[n - h:n, :]
        )
        canvas_b1 = jnp.zeros(tb_c, x.dtype).at[h:2 * h, h:h + n].set(
            x1[n - h:n, :]
        )
        t0_full, t1_full = packed(
            canvas_t0, canvas_t1, prod["tb"][i], prod["tb_fft"]
        )
        b0_full, b1_full = packed(
            canvas_b0, canvas_b1, prod["tb"][i], prod["tb_fft"]
        )
        # T = linear rows [-h, 0) = canvas same-crop rows [0, h);
        # B = linear rows [N, N+h) = canvas rows [2h, 3h)
        t0, t1 = t0_full[0:h, :], t1_full[0:h, :]
        b0, b1 = b0_full[2 * h:3 * h, :], b1_full[2 * h:3 * h, :]

        lr_c = prod["lr_canvas"]
        canvas_l0 = jnp.zeros(lr_c, x.dtype).at[h:h + n, h:2 * h].set(
            x0[:, 0:h]
        )
        canvas_l1 = jnp.zeros(lr_c, x.dtype).at[h:h + n, h:2 * h].set(
            x1[:, 0:h]
        )
        canvas_r0 = jnp.zeros(lr_c, x.dtype).at[h:h + n, h:2 * h].set(
            x0[:, n - h:n]
        )
        canvas_r1 = jnp.zeros(lr_c, x.dtype).at[h:h + n, h:2 * h].set(
            x1[:, n - h:n]
        )
        l0_full, l1_full = packed(
            canvas_l0, canvas_l1, prod["lr"][i], prod["lr_fft"]
        )
        r0_full, r1_full = packed(
            canvas_r0, canvas_r1, prod["lr"][i], prod["lr_fft"]
        )
        # L: linear cols [-h, 0), core rows only (corners belong to T/B)
        l0, l1 = l0_full[h:h + n, 0:h], l1_full[h:h + n, 0:h]
        r0, r1 = r0_full[h:h + n, 2 * h:3 * h], r1_full[h:h + n, 2 * h:3 * h]

        def wrap_tb(strip):
            # (h, n + 2h) extended-width strip -> (h, n) with x-wrap
            core = strip[:, h:h + n]
            core = core.at[:, n - h:n].add(strip[:, 0:h])
            core = core.at[:, 0:h].add(strip[:, h + n:])
            return core

        def correct(yc, t, b, lft, r):
            yc = yc.at[n - h:n, :].add(-wrap_tb(t))
            yc = yc.at[0:h, :].add(-wrap_tb(b))
            yc = yc.at[:, n - h:n].add(-lft)
            yc = yc.at[:, 0:h].add(-r)
            return yc

        y0s.append(correct(yc0, t0, b0, l0, r0))
        y1s.append(correct(yc1, t1, b1, l1, r1))

    return jnp.stack([jnp.stack([a, b]) for a, b in zip(y0s, y1s)])


def padded_convolve(x, pairs_ab, fft_shape):
    import jax.numpy as jnp

    from jolideco_tpu.ops.fft import convolve_fft_packed_pair

    outs = []
    for i in range(x.shape[0]):
        a, b = pairs_ab[i]
        y0, y1 = convolve_fft_packed_pair(x[i, 0], x[i, 1], a, b, fft_shape)
        outs.append(jnp.stack([y0, y1]))
    return jnp.stack(outs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1024)
    ap.add_argument("--psf", type=int, default=33)
    ap.add_argument("--batch", type=int, default=5,
                    help="packed pairs (obs/2)")
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--repeats", type=int, default=4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from jolideco_tpu.ops.fft import kernel_fft_pair

    n, p = args.n, args.psf
    rng = np.random.RandomState(0)
    kernels = [
        np.abs(rng.randn(p, p)).astype(np.float32) for _ in range(2 * args.batch)
    ]
    kernels = [k / k.sum() for k in kernels]
    x = rng.rand(args.batch, 2, n, n).astype(np.float32)

    prod = build_wrap_products(kernels, n)
    fft_shape = (n + p - 1, n + p - 1)
    pairs_ab = [
        kernel_fft_pair(kernels[i], kernels[i + 1], (n, n), fft_shape)
        for i in range(0, len(kernels), 2)
    ]

    xd = jnp.asarray(x)
    # spectra go in as jit ARGUMENTS: closed-over device arrays get
    # embedded as compile-time constants, which requires a host fetch
    # of complex buffers — unimplemented on this remote backend
    geom = {k: v for k, v in prod.items()
            if k in ("main", "tb", "lr")}
    static = {k: v for k, v in prod.items()
              if k not in ("main", "tb", "lr")}

    @jax.jit
    def f_wrap(z, spectra):
        return wrap_convolve(z, {**static, **spectra})

    @jax.jit
    def f_pad(z, ab):
        return padded_convolve(z, ab, fft_shape)

    # device-side compare: bulk array fetches are unimplemented on
    # some remote backends, scalars always work
    @jax.jit
    def rel_err(z, spectra, ab):
        yw = wrap_convolve(z, {**static, **spectra})
        yp = padded_convolve(z, ab, fft_shape)
        return jnp.max(jnp.abs(yw - yp)) / jnp.max(jnp.abs(yp))

    err = float(rel_err(xd, geom, pairs_ab))
    print(f"max rel diff wrap vs padded: {err:.2e}")
    assert err < 1e-5, "wrap correction is NOT exact"

    def chain_time(f, aux, label):
        @jax.jit
        def chain(z, a):
            def body(carry, _):
                y = f(carry, a)
                return y / jnp.max(jnp.abs(y)), None

            out, _ = jax.lax.scan(body, z, None, length=args.inner)
            return jnp.sum(out)

        float(chain(xd, aux))  # compile
        times = []
        for _ in range(args.repeats):
            t0 = time.perf_counter()
            float(chain(xd, aux))
            times.append((time.perf_counter() - t0) / args.inner)
        best = min(times)
        print(f"{label}: min {best * 1e3:.3f} ms/conv-batch "
              f"(median {np.median(times) * 1e3:.3f})")
        return best

    t_pad = chain_time(lambda z, a: padded_convolve(z, a, fft_shape),
                       pairs_ab, f"padded  @ {fft_shape}")
    t_wrap = chain_time(lambda z, a: wrap_convolve(z, {**static, **a}),
                        geom, f"wrapped @ ({n}, {n}) + aprons")
    print(f"speedup: {t_pad / t_wrap:.3f}x")


if __name__ == "__main__":
    main()
