"""Packed-pair Cooley-Tukey matmul convolution (MXU FFT, v2).

Second-generation MXU convolution path. ``ops.fft_mxu`` established
that a 4-step (Cooley-Tukey) DFT factored into two matmul stages per
axis beats nothing at benchmark scale because it transforms each real
image separately, runs every complex contraction as 4 real matmuls
(x3 split-float passes = 12 MXU passes), and uses balanced ~32x33
factors whose contraction dims leave the 128-lane MXU mostly idle.
This module keeps the permuted-basis trick (reference behaviour being
replaced: the runtime FFT convolution of
``jolideco/utils/torch.py:347-390``) and fixes all three:

- **Pair packing.** Two real images ride one complex transform, with
  hermitian unpacking folded into precomputed kernel spectra
  ``W = A Z + B conj(Z~)`` exactly like ``ops.fft.
  convolve_fft_packed_pair``. The frequency-negation ``Z~[m] = Z[-m]``
  is a *permutation in the CT basis too*: on the flattened (k1, k2)
  layout it is ``j=0 -> 0``, ``1 <= j < n2 -> n2-j``,
  ``j >= n2 -> N+n2-1-j`` per axis — three static slices/flips (it
  degenerates to the natural-order flip+roll at n1 = 1).
- **Karatsuba complex matmuls.** 3 real matmuls per complex
  contraction (t1 = xr M_r, t2 = xi M_i, t3 = (xr+xi)(M_r+M_i)), each
  split-float (hi.hi + lo.hi + hi.lo bf16 passes, ~2^-16 relative) =
  9 MXU passes, vs 12 for the rr/ri/ir/ii formulation.
- **Factor choice by measurement.** ``ct_conv_shape`` prefers
  factorizations with one large (lane-filling) factor, e.g.
  1056 = 132x8 or 1152 = 128x9, over balanced 32x33; the bench
  scripts pick the fastest per shape on-chip.

The output layout of the 2-D transform is a permutation of the true
frequency grid; convolution is pointwise in any fixed permutation of
the frequency basis, so the kernel spectra are simply stored
pre-permuted (host-side numpy) and the inverse transform undoes the
permutation. No bit reversal anywhere.
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

from .splitfp import bf16_round

__all__ = [
    "ct_conv_shape",
    "ct_factor",
    "make_ct_tables",
    "ct_kernel_pair",
    "ct_convolve_pair",
    "ct_convolve_single",
    "ct_build_pair_spectra",
    "ct_kernel_spectra",
    "ct_dft2",
    "ct_idft2",
]


# ----------------------------------------------------------------- shapes

def ct_factor(n):
    """Default (n1, n2) factorization of ``n``: the largest divisor
    <= 256 leads (stage-1 contraction fills MXU lanes/depth), its
    cofactor trails."""
    best = None
    for n1 in range(min(n, 256), 0, -1):
        if n % n1 == 0:
            best = (n1, n // n1)
            break
    return best


def ct_conv_shape(min_size):
    """Smallest size >= min_size with an MXU-friendly leading factor.

    Scans a window above the minimal linear-convolution size for the
    factorization minimising estimated stage cost, weighting stage-1
    by how poorly its contraction dim fills 128 lanes.
    """
    best = None
    for n in range(int(min_size), int(min_size) + 128):
        n1, n2 = ct_factor(n)
        if n1 < 32:
            continue
        # effective MXU passes: ceil(dim/128) tiles at utilization
        # dim/tile_size per stage, plus the small-stage VPU-ish cost
        util1 = min(n1, 128) / 128.0
        cost = n * (n1 / util1 + 3.0 * n2)
        if best is None or cost < best[0]:
            best = (cost, n)
    return best[1] if best else int(min_size)


# ----------------------------------------------------------------- tables

@lru_cache(maxsize=32)
def _axis_tables_np(n, n1):
    """Host-side f64 DFT stage matrices + twiddles for one axis."""
    n2 = n // n1
    assert n1 * n2 == n
    f1 = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n1)) / n1)
    f2 = np.exp(-2j * np.pi * np.outer(np.arange(n2), np.arange(n2)) / n2)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(n1), np.arange(n2)) / n)
    return {
        "f1": f1, "f2": f2, "tw": tw,
        "f1i": np.conj(f1) / n1, "f2i": np.conj(f2) / n2,
        "twi": np.conj(tw),
    }


def _parts_np(m):
    """float32 real/imag parts + bf16 hi/lo splits and Karatsuba sums
    of a host complex matrix, as a dict of numpy arrays.

    The hi/lo splits are *bf16-rounded values stored as float32*: a
    DEFAULT-precision f32 matmul on TPU truncates operands to bf16,
    which is lossless for these, so the MXU runs single bf16 passes
    while CPU tests run the same numbers in plain f32.
    """
    out = {}
    re = np.asarray(m.real, np.float32)
    im = np.asarray(m.imag, np.float32)
    rpi = re + im
    for name, arr in (("r", re), ("i", im), ("s", rpi)):
        out[name] = arr
        hi = arr.astype(jnp.bfloat16).astype(np.float32)
        out[f"{name}_hi"] = hi
        out[f"{name}_lo"] = (
            (arr - hi).astype(jnp.bfloat16).astype(np.float32)
        )
    return out


def make_ct_tables(fft_shape, factors=None):
    """Flat pytree dict of device arrays for a 2-D permuted DFT.

    Parameters
    ----------
    fft_shape : (rows, cols)
    factors : ((n1r, n2r), (n1c, n2c)), optional
        Per-axis stage factorization; defaults to :func:`ct_factor`.
    """
    rows, cols = int(fft_shape[0]), int(fft_shape[1])
    if factors is None:
        factors = (ct_factor(rows), ct_factor(cols))
    out = {}
    for prefix, n, (n1, _) in (("rows", rows, factors[0]),
                               ("cols", cols, factors[1])):
        tabs = _axis_tables_np(n, n1)
        for key in ("f1", "f2", "tw", "f1i", "f2i", "twi"):
            for pname, arr in _parts_np(tabs[key]).items():
                out[f"{prefix}_{key}_{pname}"] = jnp.asarray(arr)
    return out


def _perm_index(n, n1):
    """Natural frequency index at each flattened CT slot: slot
    ``j = k1*n2 + k2`` holds true frequency ``k = k1 + n1*k2``."""
    n2 = n // n1
    j = np.arange(n)
    k1, k2 = j // n2, j % n2
    return k1 + n1 * k2


def ct_kernel_pair(kernel0, kernel1, image_shape, fft_shape,
                   factors=None):
    """Packed-pair kernel spectra in the permuted CT basis.

    Same hermitian fold as ``ops.fft.kernel_fft_pair`` —
    ``A = (F0 + F1)/2``, ``B = (F0 - F1)/2`` for origin-centered
    embedded kernels — computed with natural-order f64 numpy FFTs and
    then reindexed into the CT layout per axis. Returns
    ``(a_re, a_im, b_re, b_im)`` float32 device arrays.
    """
    from .fft import _origin_centered_numpy, fft_conv_shape

    min0 = fft_conv_shape(image_shape, kernel0.shape)
    min1 = fft_conv_shape(image_shape, kernel1.shape)
    if (fft_shape[0] < max(min0[0], min1[0])
            or fft_shape[1] < max(min0[1], min1[1])):
        raise ValueError(
            f"fft_shape {fft_shape} too small for linear convolution"
        )
    if factors is None:
        factors = (ct_factor(int(fft_shape[0])),
                   ct_factor(int(fft_shape[1])))

    f0 = np.fft.fft2(_origin_centered_numpy(kernel0, fft_shape),
                     s=fft_shape)
    f1 = np.fft.fft2(_origin_centered_numpy(kernel1, fft_shape),
                     s=fft_shape)
    a = 0.5 * (f0 + f1)
    b = 0.5 * (f0 - f1)
    pr = _perm_index(int(fft_shape[0]), factors[0][0])
    pc = _perm_index(int(fft_shape[1]), factors[1][0])
    a = a[..., pr, :][..., :, pc]
    b = b[..., pr, :][..., :, pc]
    return tuple(
        jnp.asarray(np.ascontiguousarray(part, np.float32))
        for part in (a.real, a.imag, b.real, b.imag)
    )


# ------------------------------------------------------------- transforms

def _axis_view(tables, prefix):
    view = {"n1": tables[f"{prefix}_f1_r"].shape[0],
            "n2": tables[f"{prefix}_f2_r"].shape[0]}
    for key in ("f1", "f2", "tw", "f1i", "f2i", "twi"):
        view[key] = {p: tables[f"{prefix}_{key}_{p}"]
                     for p in ("r", "i", "s", "r_hi", "r_lo",
                               "i_hi", "i_lo", "s_hi", "s_lo")}
    return view


def _split_mm(spec, x, hi, lo):
    """Split-float einsum: 3 bf16 MXU passes, ~2^-16 relative.

    Operands are bf16-rounded f32 (see :func:`_parts_np`), so the
    TPU's DEFAULT-precision operand truncation is lossless. The x-side
    split must go through :func:`ops.splitfp.bf16_round` — a plain
    astype round-trip is elided by XLA's excess-precision pass and
    zeroes ``x_lo`` (measured 2.4e-3 conv error instead of ~1e-5).
    """
    x_hi = bf16_round(x)
    x_lo = x - x_hi
    mm = partial(jnp.einsum, spec,
                 preferred_element_type=jnp.float32)
    return mm(x_hi, hi) + mm(x_lo, hi) + mm(x_hi, lo)


def _cmm(spec, xr, xi, m, precision):
    """Karatsuba complex contraction ``(xr + i xi) @ M``.

    ``m`` holds M's parts from :func:`_parts_np`. 3 real matmuls:
    t1 = xr M_r, t2 = xi M_i, t3 = (xr + xi)(M_r + M_i);
    re = t1 - t2, im = t3 - t1 - t2.
    """
    if precision == "split3":
        t1 = _split_mm(spec, xr, m["r_hi"], m["r_lo"])
        t2 = _split_mm(spec, xi, m["i_hi"], m["i_lo"])
        t3 = _split_mm(spec, xr + xi, m["s_hi"], m["s_lo"])
    else:
        mm = partial(jnp.einsum, precision=precision,
                     preferred_element_type=jnp.float32)
        t1 = mm(spec, xr, m["r"])
        t2 = mm(spec, xi, m["i"])
        t3 = mm(spec, xr + xi, m["s"])
    return t1 - t2, t3 - t1 - t2


def _twiddle(ar, ai, twr, twi):
    return ar * twr - ai * twi, ar * twi + ai * twr


def _ct_axis_last(xr, xi, view, inverse, precision):
    """Permuted (inverse) DFT along the last axis, real arithmetic."""
    n1, n2 = view["n1"], view["n2"]
    lead = xr.shape[:-1]
    xr = xr.reshape(lead + (n1, n2))
    xi = xi.reshape(lead + (n1, n2))

    if not inverse:
        ar, ai = _cmm("...nt,nk->...kt", xr, xi, view["f1"], precision)
        ar, ai = _twiddle(ar, ai, view["tw"]["r"], view["tw"]["i"])
        outr, outi = _cmm("...kt,tj->...kj", ar, ai, view["f2"],
                          precision)
    else:
        ar, ai = _cmm("...kj,jt->...kt", xr, xi, view["f2i"], precision)
        ar, ai = _twiddle(ar, ai, view["twi"]["r"], view["twi"]["i"])
        outr, outi = _cmm("...kt,kn->...nt", ar, ai, view["f1i"],
                          precision)

    return (outr.reshape(lead + (n1 * n2,)),
            outi.reshape(lead + (n1 * n2,)))


def _mm_real(spec, x, m, part, precision):
    """Real matmul against one part ('r'/'i') of a complex matrix."""
    if precision == "split3":
        return _split_mm(spec, x, m[f"{part}_hi"], m[f"{part}_lo"])
    return jnp.einsum(spec, x, m[part], precision=precision,
                      preferred_element_type=jnp.float32)


def _ct_axis_last_realin(x, view, precision):
    """Forward permuted DFT along the last axis for a *real* input:
    stage 1 needs only 2 real matmuls instead of the Karatsuba 3."""
    n1, n2 = view["n1"], view["n2"]
    lead = x.shape[:-1]
    x = x.reshape(lead + (n1, n2))
    ar = _mm_real("...nt,nk->...kt", x, view["f1"], "r", precision)
    ai = _mm_real("...nt,nk->...kt", x, view["f1"], "i", precision)
    ar, ai = _twiddle(ar, ai, view["tw"]["r"], view["tw"]["i"])
    outr, outi = _cmm("...kt,tj->...kj", ar, ai, view["f2"], precision)
    return (outr.reshape(lead + (n1 * n2,)),
            outi.reshape(lead + (n1 * n2,)))


def _ct_axis_last_realout(xr, xi, view, precision):
    """Inverse permuted DFT along the last axis keeping only the real
    part: the final stage needs 2 real matmuls instead of 3."""
    n1, n2 = view["n1"], view["n2"]
    lead = xr.shape[:-1]
    xr = xr.reshape(lead + (n1, n2))
    xi = xi.reshape(lead + (n1, n2))
    ar, ai = _cmm("...kj,jt->...kt", xr, xi, view["f2i"], precision)
    ar, ai = _twiddle(ar, ai, view["twi"]["r"], view["twi"]["i"])
    out = (
        _mm_real("...kt,kn->...nt", ar, view["f1i"], "r", precision)
        - _mm_real("...kt,kn->...nt", ai, view["f1i"], "i", precision)
    )
    return out.reshape(lead + (n1 * n2,))


def _ct2_parts(xr, xi, tables, inverse, precision):
    """2-D permuted (inverse) DFT: cols pass then rows pass."""
    cols = _axis_view(tables, "cols")
    rows = _axis_view(tables, "rows")
    xr2, xi2 = _ct_axis_last(xr, xi, cols, inverse, precision)
    xr2 = jnp.swapaxes(xr2, -1, -2)
    xi2 = jnp.swapaxes(xi2, -1, -2)
    xr2, xi2 = _ct_axis_last(xr2, xi2, rows, inverse, precision)
    return jnp.swapaxes(xr2, -1, -2), jnp.swapaxes(xi2, -1, -2)


def ct_dft2(z, tables, precision="split3"):
    """Permuted 2-D DFT (complex in/out, for tests)."""
    xr, xi = _ct2_parts(jnp.real(z), jnp.imag(z), tables, False,
                        precision)
    return lax.complex(xr, xi)


def ct_idft2(z, tables, precision="split3"):
    """Inverse of :func:`ct_dft2`."""
    xr, xi = _ct2_parts(jnp.real(z), jnp.imag(z), tables, True,
                        precision)
    return lax.complex(xr, xi)


def _neg_freq_last(x, n2):
    """Frequency negation along the last (CT-flattened) axis.

    ``out[j] = x[-freq(j)]``: slot 0 maps to itself, slots
    ``[1, n2)`` flip among themselves, slots ``[n2, N)`` flip among
    themselves (derived from ``k1' = (n1-k1) % n1``,
    ``k2' = (n2-k2-[k1>0]) % n2``; degenerates to the natural-order
    ``roll(flip(x), 1)`` at n1 = 1).
    """
    return jnp.concatenate(
        [x[..., :1],
         jnp.flip(x[..., 1:n2], axis=-1),
         jnp.flip(x[..., n2:], axis=-1)],
        axis=-1,
    )


def _neg_freq2(x, n2r, n2c):
    """2-D frequency negation in the CT basis (both axes)."""
    x = _neg_freq_last(x, n2c)
    x = jnp.swapaxes(
        _neg_freq_last(jnp.swapaxes(x, -1, -2), n2r), -1, -2
    )
    return x


# ------------------------------------------------------------ convolution

def _ct_conv_pair_impl(x0, x1, ar, ai, br, bi, tables, fft_shape,
                       precision):
    h, w = x0.shape[-2], x0.shape[-1]
    pad = [(0, 0)] * (x0.ndim - 2) + [
        (0, int(fft_shape[0]) - h),
        (0, int(fft_shape[1]) - w),
    ]
    zr, zi = _ct2_parts(jnp.pad(x0, pad), jnp.pad(x1, pad), tables,
                        False, precision)
    n2r = _axis_view(tables, "rows")["n2"]
    n2c = _axis_view(tables, "cols")["n2"]
    # W = A Z + B conj(Z~) — hermitian unpacking folded into (A, B)
    zrr = _neg_freq2(zr, n2r, n2c)
    zri = _neg_freq2(zi, n2r, n2c)
    wr = ar * zr - ai * zi + br * zrr + bi * zri
    wi = ar * zi + ai * zr + bi * zrr - br * zri
    yr, yi = _ct2_parts(wr, wi, tables, True, precision)
    return yr[..., :h, :w], yi[..., :h, :w]


@partial(jax.custom_vjp, nondiff_argnums=(7, 8))
def ct_convolve_pair(x0, x1, ar, ai, br, bi, tables, fft_shape,
                     precision="split3"):
    """Convolve two real images with two kernels via one CT transform.

    Matmul-DFT twin of ``ops.fft.convolve_fft_packed_pair``: returns
    ``(y0, y1) = (x0 * k0, x1 * k1)`` cropped to the input shape, with
    ``(ar, ai, br, bi)`` from :func:`ct_kernel_pair`. The VJP is the
    same pipeline with conjugated kernel spectra (adjoint of a pair of
    real circular convolutions = the correlation pair), costing
    exactly one forward.
    """
    return _ct_conv_pair_impl(x0, x1, ar, ai, br, bi, tables,
                              fft_shape, precision)


def _ct_conv_pair_fwd(x0, x1, ar, ai, br, bi, tables, fft_shape,
                      precision):
    out = _ct_conv_pair_impl(x0, x1, ar, ai, br, bi, tables,
                             fft_shape, precision)
    return out, (ar, ai, br, bi, tables)


def _ct_conv_pair_bwd(fft_shape, precision, res, cotangents):
    ar, ai, br, bi, tables = res
    g0, g1 = cotangents
    d0, d1 = _ct_conv_pair_impl(g0, g1, ar, -ai, br, -bi, tables,
                                fft_shape, precision)
    zeros = jax.tree.map(jnp.zeros_like, (ar, ai, br, bi, tables))
    return (d0, d1) + zeros


ct_convolve_pair.defvjp(_ct_conv_pair_fwd, _ct_conv_pair_bwd)


@partial(jax.jit, static_argnames=("n2r", "n2c"))
def _build_pair_spectra_impl(k0, k1, tables, n2r, n2c):
    z = ct_dft2(lax.complex(k0, k1), tables, lax.Precision.HIGHEST)
    zc = jnp.conj(_neg_freq2(z, n2r, n2c))
    f0 = 0.5 * (z + zc)
    f1 = -0.5j * (z - zc)
    a = 0.5 * (f0 + f1)
    b = 0.5 * (f0 - f1)
    return (jnp.real(a), jnp.imag(a), jnp.real(b), jnp.imag(b))


def _ct_conv_single_impl(x, fr, fi, tables, fft_shape, precision):
    h, w = x.shape[-2], x.shape[-1]
    pad = [(0, 0)] * (x.ndim - 2) + [
        (0, int(fft_shape[0]) - h),
        (0, int(fft_shape[1]) - w),
    ]
    cols = _axis_view(tables, "cols")
    rows = _axis_view(tables, "rows")

    zr, zi = _ct_axis_last_realin(jnp.pad(x, pad), cols, precision)
    zr, zi = jnp.swapaxes(zr, -1, -2), jnp.swapaxes(zi, -1, -2)
    zr, zi = _ct_axis_last(zr, zi, rows, False, precision)
    zr, zi = jnp.swapaxes(zr, -1, -2), jnp.swapaxes(zi, -1, -2)

    wr = fr * zr - fi * zi
    wi = fr * zi + fi * zr

    yr, yi = _ct_axis_last(wr, wi, cols, True, precision)
    yr, yi = jnp.swapaxes(yr, -1, -2), jnp.swapaxes(yi, -1, -2)
    out = _ct_axis_last_realout(yr, yi, rows, precision)
    return jnp.swapaxes(out, -1, -2)[..., :h, :w]


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def ct_convolve_single(x, fr, fi, tables, fft_shape,
                       precision="split3"):
    """Convolve one real image via the permuted matmul DFT.

    Single-image twin of :func:`ct_convolve_pair` for the per-
    observation paths (sequential strategy, odd stack tails, spatially
    sharded evaluation — the einsum stages partition under GSPMD where
    XLA's FFT op rejects resharded layouts). Exploits real structure:
    the first forward stage and the last inverse stage each need 2
    real matmuls instead of the Karatsuba 3, and no frequency-negation
    pass is needed at all. ``(fr, fi)`` come from
    :func:`ct_kernel_spectra`. The VJP conjugates the spectrum, so the
    gradient costs exactly one forward.
    """
    return _ct_conv_single_impl(x, fr, fi, tables, fft_shape, precision)


def _ct_conv_single_fwd(x, fr, fi, tables, fft_shape, precision):
    out = _ct_conv_single_impl(x, fr, fi, tables, fft_shape, precision)
    return out, (fr, fi, tables)


def _ct_conv_single_bwd(fft_shape, precision, res, g):
    fr, fi, tables = res
    dx = _ct_conv_single_impl(g, fr, -fi, tables, fft_shape, precision)
    zeros = jax.tree.map(jnp.zeros_like, (fr, fi, tables))
    return (dx,) + zeros


ct_convolve_single.defvjp(_ct_conv_single_fwd, _ct_conv_single_bwd)


@jax.jit
def _kernel_spectra_impl(embedded, tables):
    z = ct_dft2(embedded.astype(jnp.complex64), tables,
                lax.Precision.HIGHEST)
    return jnp.real(z), jnp.imag(z)


def ct_kernel_spectra(embedded, tables):
    """Per-kernel CT spectra ``(re, im)`` from origin-centered embedded
    kernels (device, HIGHEST precision, one jitted dispatch)."""
    return _kernel_spectra_impl(embedded, tables)


def ct_build_pair_spectra(embedded, tables):
    """Packed-pair CT spectra from origin-centered embedded kernels.

    Device twin of :func:`ct_kernel_pair` for a whole kernel stack at
    once: ``embedded`` is the ``(n, ..., fh, fw)`` output of
    ``ops.fft._origin_centered`` at the CT transform shape; adjacent
    kernels (2i, 2i+1) pack into one HIGHEST-precision complex
    transform with hermitian unpacking folded in. Returns
    ``(a_re, a_im, b_re, b_im)`` float32 stacks of ``n // 2`` pairs.
    """
    n_pairs = embedded.shape[0] // 2
    k0 = embedded[0:2 * n_pairs:2]
    k1 = embedded[1:2 * n_pairs:2]
    n2r = _axis_view(tables, "rows")["n2"]
    n2c = _axis_view(tables, "cols")["n2"]
    return _build_pair_spectra_impl(k0, k1, tables, n2r, n2c)
