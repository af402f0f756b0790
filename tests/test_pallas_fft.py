"""Pallas matmul-DFT convolution vs the XLA packed-FFT path.

Runs the three-kernel pipeline in the Pallas interpreter on CPU and
pins it against :func:`jolideco_tpu.ops.fft.convolve_fft_packed_pair`
at the same transform shape — values and gradients (the custom VJP's
conjugate-spectrum adjoint).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from jolideco_tpu.ops.fft import convolve_fft_packed_pair, kernel_fft_pair
from jolideco_tpu.ops.pallas_fft import (
    PFFT_LANE,
    _perm,
    _stage_tables,
    conv_packed_pfft,
    pfft_pair_spectra,
    pfft_size,
)


def test_pfft_size():
    assert pfft_size(1056) == 1152
    assert pfft_size(1152) == 1152
    assert pfft_size(129) == 256
    assert pfft_size(128) == 128


def test_permutation_definition():
    # storage position 128*k2 + k1 holds frequency m*k1 + k2
    n = 384
    p = _perm(n)
    m = n // PFFT_LANE
    for pos in (0, 1, 127, 128, 130, 383):
        k2, k1 = divmod(pos, PFFT_LANE)
        assert p[pos] == m * k1 + k2


@pytest.mark.parametrize("m", [2, 3])
def test_stage_tables_reconstruct_dft(m):
    """The two-stage factorization reproduces the DFT matrix exactly."""
    n = PFFT_LANE * m
    t = _stage_tables(m)
    mf_re, mf_im, _ = t["mf"]
    mf = mf_re.astype(np.float64) + 1j * mf_im.astype(np.float64)
    rng = np.random.default_rng(0)
    x = rng.standard_normal(n) + 1j * rng.standard_normal(n)
    xb = x.reshape(m, PFFT_LANE)  # block n2 = x[128 n2 + n1]
    out = np.empty((m, PFFT_LANE), complex)
    for k2 in range(m):
        s = np.zeros(PFFT_LANE, complex)
        for n2 in range(m):
            wr, wi = t["wf"][n2][k2]
            s += (wr + 1j * wi) * xb[n2]
        out[k2] = s @ mf[k2]
    ref = np.fft.fft(x)[_perm(n)]
    np.testing.assert_allclose(out.ravel(), ref, rtol=1e-5, atol=1e-4)


def _setup(seed, P=2, h=128, w=128, k=9):
    rng = np.random.default_rng(seed)
    x0 = rng.standard_normal((P, h, w)).astype(np.float32)
    x1 = rng.standard_normal((P, h, w)).astype(np.float32)
    kernels = [
        (rng.random((k, k)).astype(np.float64),
         rng.random((k, k)).astype(np.float64))
        for _ in range(P)
    ]
    n = pfft_size(max(h, w) + k - 1)
    planes = [pfft_pair_spectra(k0, k1, (h, w), n) for k0, k1 in kernels]
    spectra = tuple(
        jnp.asarray(np.stack([p[j] for p in planes])) for j in range(4)
    )
    return x0, x1, kernels, n, spectra


def _xla_reference(x0, x1, kernels, n):
    outs0, outs1 = [], []
    for p, (k0, k1) in enumerate(kernels):
        a, b = kernel_fft_pair(k0, k1, x0.shape[1:], (n, n))
        y0, y1 = convolve_fft_packed_pair(
            jnp.asarray(x0[p]), jnp.asarray(x1[p]), a, b, (n, n)
        )
        outs0.append(y0)
        outs1.append(y1)
    return jnp.stack(outs0), jnp.stack(outs1)


@pytest.mark.parametrize("h,k", [(128, 9), (256, 33)])
def test_conv_matches_xla_packed_pair(h, k):
    x0, x1, kernels, n, spectra = _setup(0, P=2, h=h, w=h, k=k)
    ref0, ref1 = _xla_reference(x0, x1, kernels, n)
    y0, y1 = conv_packed_pfft(
        jnp.asarray(x0), jnp.asarray(x1), *spectra, n, "f32", True
    )
    scale = float(jnp.max(jnp.abs(ref0)))
    np.testing.assert_allclose(y0, ref0, atol=2e-5 * scale)
    np.testing.assert_allclose(y1, ref1, atol=2e-5 * scale)


def test_conv_rectangular_pair_batch():
    # W != H exercises the separate row/lane block counts
    x0, x1, kernels, n, spectra = _setup(3, P=1, h=128, w=256, k=9)
    ref0, ref1 = _xla_reference(x0, x1, kernels, n)
    y0, y1 = conv_packed_pfft(
        jnp.asarray(x0), jnp.asarray(x1), *spectra, n, "f32", True
    )
    scale = float(jnp.max(jnp.abs(ref0)))
    np.testing.assert_allclose(y0, ref0, atol=2e-5 * scale)
    np.testing.assert_allclose(y1, ref1, atol=2e-5 * scale)


def test_gradients_match_xla_path():
    """The conjugate-spectrum VJP equals the XLA path's gradient."""
    x0, x1, kernels, n, spectra = _setup(1, P=2, h=128, w=128, k=9)

    def loss_pfft(x0, x1):
        y0, y1 = conv_packed_pfft(x0, x1, *spectra, n, "f32", True)
        return jnp.sum(y0 * y0) + jnp.sum(jnp.sin(y1))

    def loss_xla(x0, x1):
        outs0, outs1 = [], []
        for p, (k0, k1) in enumerate(kernels):
            a, b = kernel_fft_pair(k0, k1, x0.shape[1:], (n, n))
            y0, y1 = convolve_fft_packed_pair(x0[p], x1[p], a, b, (n, n))
            outs0.append(y0)
            outs1.append(y1)
        y0, y1 = jnp.stack(outs0), jnp.stack(outs1)
        return jnp.sum(y0 * y0) + jnp.sum(jnp.sin(y1))

    g0, g1 = jax.grad(loss_pfft, argnums=(0, 1))(
        jnp.asarray(x0), jnp.asarray(x1)
    )
    # reference gradient via the XLA custom VJP (same math)
    r0, r1 = jax.grad(
        lambda a, b: loss_xla(a, b), argnums=(0, 1)
    )(jnp.asarray(x0), jnp.asarray(x1))
    scale = float(jnp.max(jnp.abs(r0)))
    np.testing.assert_allclose(g0, r0, atol=5e-5 * scale)
    np.testing.assert_allclose(g1, r1, atol=5e-5 * scale)


def test_forward_over_reverse_matches_xla_path():
    """jvp-of-grad (the ``compute_error`` Hessian probe) traces through
    the pipeline and matches the XLA path.

    The convolution is linear, so its JVP is itself (the inner
    ``custom_jvp``); without that rule the probe hits the raw
    ``pallas_call`` inside the custom-VJP residual jaxpr and crashes.
    """
    x0, x1, kernels, n, spectra = _setup(2, P=1, h=128, w=128, k=9)
    c = jnp.asarray(np.random.default_rng(5).random((1, 128, 128)),
                    jnp.float32)

    def loss_pfft(x0):
        y0, y1 = conv_packed_pfft(x0, jnp.asarray(x1), *spectra, n,
                                  "f32", True)
        return jnp.mean(c * jnp.sin(y0)) + jnp.mean(y1 * y1)

    def loss_xla(x0):
        k0, k1_ = kernels[0]
        a, b = kernel_fft_pair(k0, k1_, x0.shape[1:], (n, n))
        y0, y1 = convolve_fft_packed_pair(x0, jnp.asarray(x1), a, b,
                                          (n, n))
        return jnp.mean(c * jnp.sin(y0)) + jnp.mean(y1 * y1)

    ones = jnp.ones_like(jnp.asarray(x0))
    hvp_p = jax.jvp(jax.grad(loss_pfft), (jnp.asarray(x0),), (ones,))[1]
    hvp_x = jax.jvp(jax.grad(loss_xla), (jnp.asarray(x0),), (ones,))[1]
    scale = float(jnp.max(jnp.abs(hvp_x)))
    np.testing.assert_allclose(hvp_p, hvp_x, atol=1e-5 * scale)


def test_spectra_validation():
    k = np.ones((9, 9))
    with pytest.raises(ValueError, match="multiple of"):
        pfft_pair_spectra(k, k, (128, 128), 200)
    with pytest.raises(ValueError, match="too small"):
        pfft_pair_spectra(k, k, (128, 128), 128)


def test_image_shape_validation():
    x = jnp.zeros((1, 100, 128), jnp.float32)
    s = jnp.zeros((1, 256, 256), jnp.float32)
    with pytest.raises(ValueError, match="multiples of"):
        conv_packed_pfft(x, x, s, s, s, s, 256, "f32", True)
