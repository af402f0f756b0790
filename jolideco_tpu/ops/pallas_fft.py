"""Pallas TPU matmul-DFT convolution at 128-aligned transform sizes.

The round-4 roofline (docs/performance.md "Explicit bound") leaves a
~6x gap between XLA's mixed-radix FFT lowering at the minimal 1056
transform and the HBM bandwidth bound; this module is the round-5
"one concrete shot" at that gap. Instead of a radix FFT, the transform
size pads up to ``N = 128*m`` (1056 -> 1152 = 128*9) and each 1-D DFT
factors into exactly two stages that map perfectly onto the TPU:

- **stage A** (the ``m``-point DFT over 128-strided sample blocks) is
  ``m^2`` complex multiply-adds of ``(.., 128)`` tiles on the VPU with
  *static trace-time coefficients* — no gathers, no reshapes;
- **stage B** (the 128-point DFTs with the size-``N`` twiddles folded
  in) is ``m`` complex ``(.., 128) @ (128, 128)`` matmuls on the MXU —
  the systolic array's native shape.

The spectrum lives in a fixed *permuted* order (storage position
``128*k2 + k1`` holds frequency ``m*k1 + k2``); the permutation
cancels between the forward and inverse pipelines, and the kernel
spectra are precomputed host-side directly in permuted order, so no
reordering ever happens on device.

Pair-packed convolution (two real images through one complex
transform, matching :func:`jolideco_tpu.ops.fft.convolve_fft_packed_pair`
semantics) normally needs the frequency-reversed spectrum
``conj(Z~)`` — an awkward lane permutation. Two identities remove it:

    conj(Z~)          = FFT2(conj(v))                (no flips of Z)
    IFFT(B . conj(Z~)) = (1/N) FFT(B[-m] . conj(Z))  per axis,

so the packed convolution becomes reversal-free::

    y0 + i y1 = IFFT2(A . Z) + FWDP2(B2 . conj(Z)),
    Z  = FFT2(x0 + i x1),     A = (K0+K1)/2,
    B2[m] = ((K0-K1)/2)[-m]   (host-side precomputed reversal),

where ``FWDP`` — the forward transform of a permuted-layout input with
natural-order output and ``1/N`` folded in — factorizes as the
*conjugated inverse* pipeline: identical matmul structure, conjugate
matrices (validated exactly against numpy in
``tests/test_pallas_fft.py``).

Three kernels per convolution direction (3 HBM round-trips):

1. axis-0 forward on the raw ``(H, W)`` image pair (padding to ``N``
   rows is implicit: absent sample blocks are zero, their stage-A
   terms are skipped at trace time);
2. per row-strip: lane-axis forward, spectrum combine, lane-axis
   inverse of the ``A`` term and permuted-forward of the ``B2`` term
   (output lanes cropped to ``W`` — spectrum columns beyond the image
   width are never written or read again);
3. axis-0 inverse of ``V1`` plus permuted-forward of ``V2``, summed,
   rows cropped to ``H``.

The adjoint of the convolution is the same pipeline with conjugated
kernel spectra (correlation), applied as a static sign flip inside
kernel 2, so the custom VJP costs exactly one forward — like the XLA
path's (``ops/fft.py``).

Reference being re-engineered: ``jolideco/utils/torch.py:347-390``
(FFT convolution); this backend is an alternative lowering of the
same math, exact to float32 rounding in ``mode="f32"``.
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .fft import _origin_centered_numpy, fft_conv_shape

__all__ = [
    "pfft_size",
    "pfft_pair_spectra",
    "pfft_pair_spectra_device",
    "conv_packed_pfft",
    "default_pfft_mode",
    "PFFT_LANE",
]


def default_pfft_mode():
    """Matmul precision mode from the library-wide precision knob.

    Follows ``config.gmm_precision()`` so one dial controls the whole
    accuracy/throughput trade (measured conv error vs the XLA f32 FFT
    at benchmark shape): ``highest`` -> ``f32`` (1.8e-6), ``high`` ->
    ``split`` (3.1e-5, bf16 hi/lo 3-pass), ``default`` -> ``bf16``
    (1.3e-2).
    """
    from .. import config

    precision = config.gmm_precision()
    if precision == jax.lax.Precision.HIGHEST:
        return "f32"
    if precision == jax.lax.Precision.HIGH:
        return "split"
    return "bf16"

PFFT_LANE = 128  # MXU dimension; transform sizes are multiples of this
_COL_CHUNK = 256  # kernel-1/3 lane chunk
# the three kernels hold stage matrices + in/out planes + the pipeline's
# double buffers; the default 16 MB scoped cap is ~300 KB short at the
# benchmark shape (v5e has 128 MB physical VMEM — the cap trades
# pipelining headroom, not correctness). Block sizes scale down with
# the transform size (see _chunk_sizes): m = n/128 stage iterations
# unroll in-kernel, so live temporaries grow with n.
_VMEM_CAP = 64 * 1024 * 1024


def _chunk_sizes(n):
    """(lane chunk for kernels 1/3, row strip for kernel 2) at size n."""
    cc = _COL_CHUNK if n <= 12 * PFFT_LANE else PFFT_LANE
    sr = PFFT_LANE if n <= 24 * PFFT_LANE else PFFT_LANE // 2
    return cc, sr


def pfft_size(n):
    """Smallest transform size ``128*m >= n`` supported by this backend."""
    return -(-int(n) // PFFT_LANE) * PFFT_LANE


# ---------------------------------------------------------------------------
# host-side constants
# ---------------------------------------------------------------------------


@lru_cache(maxsize=8)
def _stage_tables(m):
    """Stage-A tables and stage-B matrix planes for ``N = 128*m``.

    Stage-A coefficients are nested python-float tuples — they fold
    into the kernels as trace-time constants. Stage-B planes are
    float32 numpy arrays ``(m, 128, 128)``:

    - ``mf``: forward ``M[k2][n1, k1] = W128^{n1 k1} WN^{n1 k2}`` as
      ``(re, im, re+im)`` in lane orientation (``s @ M``) and ``mf_t``
      transposed for the sublane orientation (``M^T @ s``);
    - ``mi``: inverse ``M'[k2][k1, b] = W128^{+b k1} WN^{+b k2} / N``
      as ``(re, im, re+im, re-im)`` — the ``re-im`` plane serves the
      conjugated permuted-forward path; ``mi_t`` transposed.
    """
    N = PFFT_LANE * m
    n1 = np.arange(PFFT_LANE, dtype=np.float64)[:, None]
    k1 = np.arange(PFFT_LANE, dtype=np.float64)[None, :]

    mf = np.stack([
        np.exp(-2j * np.pi * n1 * k1 / PFFT_LANE)
        * np.exp(-2j * np.pi * n1 * k2 / N)
        for k2 in range(m)
    ])
    kk1 = np.arange(PFFT_LANE, dtype=np.float64)[:, None]
    b = np.arange(PFFT_LANE, dtype=np.float64)[None, :]
    mi = np.stack([
        np.exp(+2j * np.pi * b * kk1 / PFFT_LANE)
        * np.exp(+2j * np.pi * b * k2 / N)
        / N
        for k2 in range(m)
    ])

    def planes(mat, transpose):
        if transpose:
            mat = np.swapaxes(mat, -2, -1)
        re = np.ascontiguousarray(mat.real, dtype=np.float32)
        im = np.ascontiguousarray(mat.imag, dtype=np.float32)
        return re, im, re + im, re - im

    def table(sign):
        t = np.exp(sign * 2j * np.pi
                   * np.outer(np.arange(m), np.arange(m)) / m)
        return tuple(
            tuple((float(c.real), float(c.imag)) for c in row)
            for row in t
        )

    return {
        "wf": table(-1.0),  # wf[n2][k2]
        "wi": table(+1.0),  # wi[a][k2]
        "mf": planes(mf, False)[:3],
        "mf_t": planes(mf, True)[:3],
        "mi": planes(mi, False),
        "mi_t": planes(mi, True),
    }


def _perm(N):
    """Natural frequency index held at each storage position."""
    m = N // PFFT_LANE
    p = np.arange(N)
    return m * (p % PFFT_LANE) + p // PFFT_LANE


def pfft_pair_spectra(kernel0, kernel1, image_shape, n):
    """Permuted-layout packed spectra for one kernel pair (host-side).

    Equivalent preprocessing to
    :func:`jolideco_tpu.ops.fft.kernel_fft_pair` (origin-centered
    kernels, float64 transforms) but returns four float32 planes
    ``(a_re, a_im, b2_re, b2_im)`` in the permuted storage order of
    the Pallas transform, with the ``B`` term frequency-reversed at
    build time so the device pipeline needs no reversal op.
    """
    n = int(n)
    if n % PFFT_LANE:
        raise ValueError(
            f"pfft transform size must be a multiple of {PFFT_LANE}, "
            f"got {n}"
        )
    min0 = fft_conv_shape(image_shape, np.shape(kernel0))
    min1 = fft_conv_shape(image_shape, np.shape(kernel1))
    need = max(min0[0], min1[0], min0[1], min1[1])
    if n < need:
        raise ValueError(
            f"pfft size {n} too small for linear convolution, need "
            f">= {need}"
        )
    fs = (n, n)
    f0 = np.fft.fft2(_origin_centered_numpy(kernel0, fs), s=fs)
    f1 = np.fft.fft2(_origin_centered_numpy(kernel1, fs), s=fs)
    a = 0.5 * (f0 + f1)
    b = 0.5 * (f0 - f1)
    rev = (-np.arange(n)) % n
    b2 = b[rev][:, rev]
    p = _perm(n)
    a = a[p][:, p]
    b2 = b2[p][:, p]
    return (
        np.asarray(a.real, np.float32), np.asarray(a.imag, np.float32),
        np.asarray(b2.real, np.float32), np.asarray(b2.imag, np.float32),
    )


def pfft_pair_spectra_device(kernels_even, kernels_odd, image_shape, n):
    """Device twin of :func:`pfft_pair_spectra` for stacked kernels.

    ``kernels_even`` / ``kernels_odd`` are the per-pair kernel stacks
    ``(P, ..., kh, kw)`` (already upsampled / psf_scale-zoomed by the
    stacked build). Returns the four float32 plane stacks
    ``(P, ..., n, n)`` in permuted layout. Build-time cost: two
    batched ``fft2`` + two gathers, one jitted dispatch.
    """
    from .fft import _origin_centered

    n = int(n)
    if n % PFFT_LANE:
        raise ValueError(
            f"pfft transform size must be a multiple of {PFFT_LANE}, "
            f"got {n}"
        )
    min0 = fft_conv_shape(image_shape, kernels_even.shape)
    min1 = fft_conv_shape(image_shape, kernels_odd.shape)
    need = max(min0[0], min1[0], min0[1], min1[1])
    if n < need:
        raise ValueError(
            f"pfft size {n} too small for linear convolution, need "
            f">= {need}"
        )
    perm = jnp.asarray(_perm(n))
    rev = jnp.asarray((-np.arange(n)) % n)

    @partial(jax.jit, static_argnums=(2,))
    def build(ke, ko, n):
        f0 = jnp.fft.fft2(_origin_centered(ke, (n, n)), s=(n, n))
        f1 = jnp.fft.fft2(_origin_centered(ko, (n, n)), s=(n, n))
        a = 0.5 * (f0 + f1)
        b = 0.5 * (f0 - f1)
        b2 = jnp.take(jnp.take(b, rev, axis=-2), rev, axis=-1)
        a = jnp.take(jnp.take(a, perm, axis=-2), perm, axis=-1)
        b2 = jnp.take(jnp.take(b2, perm, axis=-2), perm, axis=-1)
        return (jnp.real(a).astype(jnp.float32),
                jnp.imag(a).astype(jnp.float32),
                jnp.real(b2).astype(jnp.float32),
                jnp.imag(b2).astype(jnp.float32))

    return build(kernels_even, kernels_odd, n)


# ---------------------------------------------------------------------------
# in-kernel helpers
# ---------------------------------------------------------------------------


def _dot(a, b, mode):
    if mode == "bf16":
        return jnp.dot(a.astype(jnp.bfloat16), b.astype(jnp.bfloat16),
                       preferred_element_type=jnp.float32)
    if mode == "split":
        # manual bf16 hi/lo operand splits, 3 MXU passes (~1e-5
        # relative). Mosaic rejects Precision.HIGH in kernels, and
        # in-kernel splits are immune to XLA's excess-precision
        # elision (ops/splitfp.py caveat — that pass runs on HLO,
        # not on Mosaic kernels).
        a_hi = a.astype(jnp.bfloat16)
        a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        b_hi = b.astype(jnp.bfloat16)
        b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        kw = dict(preferred_element_type=jnp.float32)
        return (jnp.dot(a_hi, b_hi, **kw) + jnp.dot(a_hi, b_lo, **kw)
                + jnp.dot(a_lo, b_hi, **kw))
    # true float32 MXU passes: TPU's DEFAULT precision runs f32
    # matmuls as single-pass bf16 (measured ~1.3e-2 conv error)
    return jnp.dot(a, b, preferred_element_type=jnp.float32,
                   precision=jax.lax.Precision.HIGHEST)


def _cmm_right(sr, si, planes, mode, conj=False):
    """Complex Karatsuba matmul ``(sr + i si) @ M`` (3 real matmuls).

    ``planes = (re, im, sum, dif)`` of ``M``; with ``conj`` the matrix
    is conjugated (``M* = re - i im``), which swaps the ``sum`` plane
    for ``dif`` and flips two signs.
    """
    br, bi = planes[0], planes[1]
    t1 = _dot(sr, br, mode)
    t2 = _dot(si, bi, mode)
    if conj:
        t3 = _dot(sr + si, planes[3], mode)
        return t1 + t2, t3 - t1 + t2
    t3 = _dot(sr + si, planes[2], mode)
    return t1 - t2, t3 - t1 - t2


def _cmm_left(planes, sr, si, mode, conj=False):
    """Complex Karatsuba matmul ``M @ (sr + i si)``, matrix on the left."""
    br, bi = planes[0], planes[1]
    t1 = _dot(br, sr, mode)
    t2 = _dot(bi, si, mode)
    if conj:
        t3 = _dot(planes[3], sr + si, mode)
        return t1 + t2, t3 - t1 + t2
    t3 = _dot(planes[2], sr + si, mode)
    return t1 - t2, t3 - t1 - t2


def _c_scale(xr, xi, wr, wi, real):
    """One complex scalar multiply with constant-folded trivial cases."""
    if real:
        if wi == 0.0:
            return xr if wr == 1.0 else wr * xr
        if wr == 0.0:
            return -wi * xi
        return wr * xr - wi * xi
    if wi == 0.0:
        return xi if wr == 1.0 else wr * xi
    if wr == 0.0:
        return wi * xr
    return wr * xi + wi * xr


def _stage_a(blocks_re, blocks_im, w_table, k2):
    """Stage A: ``sum_n2 W[n2][k2] * block[n2]`` (trace-time constants)."""
    s_re = None
    s_im = None
    for n2, (xr, xi) in enumerate(zip(blocks_re, blocks_im)):
        tr = _c_scale(xr, xi, *w_table[n2][k2], real=True)
        ti = _c_scale(xr, xi, *w_table[n2][k2], real=False)
        s_re = tr if s_re is None else s_re + tr
        s_im = ti if s_im is None else s_im + ti
    return s_re, s_im


def _lane_blocks(x, nb):
    return [x[:, PFFT_LANE * i: PFFT_LANE * (i + 1)] for i in range(nb)]


def _row_blocks(x, nb):
    return [x[PFFT_LANE * i: PFFT_LANE * (i + 1), :] for i in range(nb)]


# ---------------------------------------------------------------------------
# kernel 1: axis-0 (sublane) forward, natural rows -> permuted rows
# ---------------------------------------------------------------------------


def _k1_body(x0_ref, x1_ref, mr_ref, mi_ref, ms_ref, ur_ref, ui_ref,
             *, m, h, wf, mode):
    blocks_re = _row_blocks(x0_ref[0], h // PFFT_LANE)
    blocks_im = _row_blocks(x1_ref[0], h // PFFT_LANE)
    for k2 in range(m):
        s_re, s_im = _stage_a(blocks_re, blocks_im, wf, k2)
        o_re, o_im = _cmm_left(
            (mr_ref[k2], mi_ref[k2], ms_ref[k2]), s_re, s_im, mode
        )
        sl = slice(PFFT_LANE * k2, PFFT_LANE * (k2 + 1))
        ur_ref[0, sl, :] = o_re
        ui_ref[0, sl, :] = o_im


# ---------------------------------------------------------------------------
# kernel 2: lane forward + spectrum combine + lane inverse / permuted-forward
# ---------------------------------------------------------------------------


def _k2_body(ur_ref, ui_ref, ar_ref, ai_ref, br_ref, bi_ref,
             fr_ref, fi_ref, fs_ref, ir_ref, ii_ref, is_ref, id_ref,
             v1r_ref, v1i_ref, v2r_ref, v2i_ref, zr_ref, zi_ref,
             *, m, w, wf, wi_t, mode, conj_spec):
    in_re = _lane_blocks(ur_ref[0], w // PFFT_LANE)
    in_im = _lane_blocks(ui_ref[0], w // PFFT_LANE)
    # lane-axis forward into the permuted scratch spectrum
    for k2 in range(m):
        s_re, s_im = _stage_a(in_re, in_im, wf, k2)
        o_re, o_im = _cmm_right(
            s_re, s_im,
            (fr_ref[k2], fi_ref[k2], fs_ref[k2]), mode,
        )
        sl = slice(PFFT_LANE * k2, PFFT_LANE * (k2 + 1))
        zr_ref[:, sl] = o_re
        zi_ref[:, sl] = o_im

    nb_out = w // PFFT_LANE
    asign = -1.0 if conj_spec else 1.0
    acc = [[None, None, None, None] for _ in range(nb_out)]  # v1r v1i v2r v2i
    for k2 in range(m):
        sl = slice(PFFT_LANE * k2, PFFT_LANE * (k2 + 1))
        z_re = zr_ref[:, sl]
        z_im = zi_ref[:, sl]
        a_re = ar_ref[0, :, sl]
        a_im = asign * ai_ref[0, :, sl]
        b_re = br_ref[0, :, sl]
        b_im = asign * bi_ref[0, :, sl]
        # U1 = A . Z ;  U2 = B2 . conj(Z)
        u1_re = a_re * z_re - a_im * z_im
        u1_im = a_re * z_im + a_im * z_re
        u2_re = b_re * z_re + b_im * z_im
        u2_im = b_im * z_re - b_re * z_im
        mi_planes = (ir_ref[k2], ii_ref[k2], is_ref[k2], id_ref[k2])
        i1_re, i1_im = _cmm_right(u1_re, u1_im, mi_planes, mode)
        i2_re, i2_im = _cmm_right(u2_re, u2_im, mi_planes, mode, conj=True)
        for a in range(nb_out):
            wr, wi = wi_t[a][k2]
            terms = (
                _c_scale(i1_re, i1_im, wr, wi, real=True),
                _c_scale(i1_re, i1_im, wr, wi, real=False),
                # permuted-forward uses the conjugate stage table
                _c_scale(i2_re, i2_im, wr, -wi, real=True),
                _c_scale(i2_re, i2_im, wr, -wi, real=False),
            )
            for j in range(4):
                acc[a][j] = (
                    terms[j] if acc[a][j] is None else acc[a][j] + terms[j]
                )
    for a in range(nb_out):
        sl = slice(PFFT_LANE * a, PFFT_LANE * (a + 1))
        v1r_ref[0, :, sl] = acc[a][0]
        v1i_ref[0, :, sl] = acc[a][1]
        v2r_ref[0, :, sl] = acc[a][2]
        v2i_ref[0, :, sl] = acc[a][3]


# ---------------------------------------------------------------------------
# kernel 3: axis-0 inverse (V1) + permuted-forward (V2), summed, crop rows
# ---------------------------------------------------------------------------


def _k3_body(v1r_ref, v1i_ref, v2r_ref, v2i_ref,
             ir_ref, ii_ref, is_ref, id_ref, y0_ref, y1_ref,
             *, m, h, wi_t, mode):
    nb_out = h // PFFT_LANE
    acc = [[None, None] for _ in range(nb_out)]
    for k2 in range(m):
        sl = slice(PFFT_LANE * k2, PFFT_LANE * (k2 + 1))
        mi_planes = (ir_ref[k2], ii_ref[k2], is_ref[k2], id_ref[k2])
        i1_re, i1_im = _cmm_left(
            mi_planes, v1r_ref[0, sl, :], v1i_ref[0, sl, :], mode
        )
        i2_re, i2_im = _cmm_left(
            mi_planes, v2r_ref[0, sl, :], v2i_ref[0, sl, :], mode,
            conj=True,
        )
        for a in range(nb_out):
            wr, wi = wi_t[a][k2]
            t_re = (
                _c_scale(i1_re, i1_im, wr, wi, real=True)
                + _c_scale(i2_re, i2_im, wr, -wi, real=True)
            )
            t_im = (
                _c_scale(i1_re, i1_im, wr, wi, real=False)
                + _c_scale(i2_re, i2_im, wr, -wi, real=False)
            )
            if acc[a][0] is None:
                acc[a][0], acc[a][1] = t_re, t_im
            else:
                acc[a][0] = acc[a][0] + t_re
                acc[a][1] = acc[a][1] + t_im
    for a in range(nb_out):
        sl = slice(PFFT_LANE * a, PFFT_LANE * (a + 1))
        y0_ref[0, sl, :] = acc[a][0]
        y1_ref[0, sl, :] = acc[a][1]


# ---------------------------------------------------------------------------
# pallas_call wrappers
# ---------------------------------------------------------------------------


def _compiler_params(interpret):
    if interpret:
        return None
    return pltpu.CompilerParams(vmem_limit_bytes=_VMEM_CAP)


def _const_spec(arr):
    return pl.BlockSpec(arr.shape, lambda p, i: (0,) * arr.ndim,
                        memory_space=pltpu.VMEM)


def _pfft_conv_impl(x0, x1, a_re, a_im, b2_re, b2_im, n, mode,
                    interpret, conj_spec):
    P, H, W = x0.shape
    n = int(n)
    m = n // PFFT_LANE
    if H % PFFT_LANE or W % PFFT_LANE:
        raise ValueError(
            f"pfft images must be multiples of {PFFT_LANE}, got "
            f"{(H, W)} (pad at the caller)"
        )
    t = _stage_tables(m)
    f32 = jnp.float32
    mf_t = tuple(jnp.asarray(x) for x in t["mf_t"])
    mf = tuple(jnp.asarray(x) for x in t["mf"])
    mi = tuple(jnp.asarray(x) for x in t["mi"])
    mi_t = tuple(jnp.asarray(x) for x in t["mi_t"])

    cc, sr = _chunk_sizes(n)
    cc = min(cc, W)
    u_re, u_im = pl.pallas_call(
        partial(_k1_body, m=m, h=H, wf=t["wf"], mode=mode),
        grid=(P, W // cc),
        in_specs=[
            pl.BlockSpec((1, H, cc), lambda p, i: (p, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, cc), lambda p, i: (p, 0, i),
                         memory_space=pltpu.VMEM),
            *[_const_spec(x) for x in mf_t],
        ],
        out_specs=[
            pl.BlockSpec((1, n, cc), lambda p, i: (p, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, n, cc), lambda p, i: (p, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, n, W), f32),
            jax.ShapeDtypeStruct((P, n, W), f32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(x0, x1, *mf_t)

    spec_strip = pl.BlockSpec((1, sr, n), lambda p, i: (p, i, 0),
                              memory_space=pltpu.VMEM)
    u_strip = pl.BlockSpec((1, sr, W), lambda p, i: (p, i, 0),
                           memory_space=pltpu.VMEM)
    v1_re, v1_im, v2_re, v2_im = pl.pallas_call(
        partial(_k2_body, m=m, w=W, wf=t["wf"], wi_t=t["wi"], mode=mode,
                conj_spec=conj_spec),
        grid=(P, n // sr),
        in_specs=[
            u_strip, u_strip,
            spec_strip, spec_strip, spec_strip, spec_strip,
            *[_const_spec(x) for x in mf],
            *[_const_spec(x) for x in mi],
        ],
        out_specs=[u_strip, u_strip, u_strip, u_strip],
        out_shape=[jax.ShapeDtypeStruct((P, n, W), f32)] * 4,
        scratch_shapes=[
            pltpu.VMEM((sr, n), f32),
            pltpu.VMEM((sr, n), f32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(u_re, u_im, a_re, a_im, b2_re, b2_im, *mf, *mi)

    y0, y1 = pl.pallas_call(
        partial(_k3_body, m=m, h=H, wi_t=t["wi"], mode=mode),
        grid=(P, W // cc),
        in_specs=[
            *[pl.BlockSpec((1, n, cc), lambda p, i: (p, 0, i),
                           memory_space=pltpu.VMEM) for _ in range(4)],
            *[_const_spec(x) for x in mi_t],
        ],
        out_specs=[
            pl.BlockSpec((1, H, cc), lambda p, i: (p, 0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, cc), lambda p, i: (p, 0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((P, H, W), f32),
            jax.ShapeDtypeStruct((P, H, W), f32),
        ],
        interpret=interpret,
        compiler_params=_compiler_params(interpret),
    )(v1_re, v1_im, v2_re, v2_im, *mi_t)
    return y0, y1


@partial(jax.custom_jvp, nondiff_argnums=(6, 7, 8, 9))
def _pfft_apply(x0, x1, a_re, a_im, b2_re, b2_im, n, mode, interpret,
                conj_spec):
    """The kernel pipeline as a forward-differentiable primitive.

    The convolution is linear in ``(x0, x1)``, so its JVP is the same
    pipeline applied to the tangents — which is what makes the
    forward-over-reverse Hessian probe (``TotalLoss.hessian_diagonals``)
    trace through compiled kernels: without this rule, jvp hits the
    raw ``pallas_call`` (no JVP) inside the custom-VJP residual jaxpr.
    Spectrum tangents are ignored: spectra are frozen build products
    (the reverse path likewise returns zero cotangents for them).
    """
    return _pfft_conv_impl(x0, x1, a_re, a_im, b2_re, b2_im, n, mode,
                           interpret, conj_spec=conj_spec)


@_pfft_apply.defjvp
def _pfft_apply_jvp(n, mode, interpret, conj_spec, primals, tangents):
    x0, x1, a_re, a_im, b2_re, b2_im = primals
    t0, t1 = tangents[0], tangents[1]
    primal_out = _pfft_apply(x0, x1, a_re, a_im, b2_re, b2_im, n, mode,
                             interpret, conj_spec)
    tangent_out = _pfft_apply(t0, t1, a_re, a_im, b2_re, b2_im, n, mode,
                              interpret, conj_spec)
    return primal_out, tangent_out


@partial(jax.custom_vjp, nondiff_argnums=(6, 7, 8))
def conv_packed_pfft(x0, x1, a_re, a_im, b2_re, b2_im, n, mode="f32",
                     interpret=False):
    """Pair-packed linear convolution via the Pallas matmul-DFT.

    Parameters
    ----------
    x0, x1 : float32 arrays ``(P, H, W)``
        The two real image batches of each packed pair. ``H`` and
        ``W`` must be multiples of 128 (pad at the caller).
    a_re, a_im, b2_re, b2_im : float32 arrays ``(P, n, n)``
        Permuted-layout packed spectra from :func:`pfft_pair_spectra`.
    n : int (static)
        Transform size, a multiple of 128, at least the minimal linear
        convolution shape.
    mode : {"f32", "bf16"} (static)
        MXU precision of the stage-B matmuls. ``f32`` is exact to
        float32 rounding; ``bf16`` trades ~1e-3 relative accuracy for
        throughput.
    interpret : bool (static)
        Run the kernels in the Pallas interpreter (CPU tests).

    Returns
    -------
    y0, y1 : float32 arrays ``(P, H, W)``
        ``x0 * k0`` and ``x1 * k1`` cropped to the input shape —
        identical semantics to
        :func:`jolideco_tpu.ops.fft.convolve_fft_packed_pair`.
    """
    return _pfft_apply(x0, x1, a_re, a_im, b2_re, b2_im, n, mode,
                       interpret, False)


def _conv_packed_pfft_fwd(x0, x1, a_re, a_im, b2_re, b2_im, n, mode,
                          interpret):
    out = _pfft_apply(x0, x1, a_re, a_im, b2_re, b2_im, n, mode,
                      interpret, False)
    return out, (a_re, a_im, b2_re, b2_im)


def _conv_packed_pfft_bwd(n, mode, interpret, res, cotangents):
    a_re, a_im, b2_re, b2_im = res
    g0, g1 = cotangents
    # adjoint = correlation = the same pipeline with conjugated kernel
    # spectra (static sign flip inside kernel 2)
    d0, d1 = _pfft_apply(g0, g1, a_re, a_im, b2_re, b2_im, n, mode,
                         interpret, True)
    zero = jnp.zeros_like(a_re)
    return d0, d1, zero, zero, zero, zero


conv_packed_pfft.defvjp(_conv_packed_pfft_fwd, _conv_packed_pfft_bwd)
