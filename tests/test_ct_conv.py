"""Packed-pair Cooley-Tukey matmul convolution (``ops.ct_conv``)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp
from jax import lax

from jolideco_tpu.ops.ct_conv import (
    _ct_conv_pair_impl,
    _neg_freq_last,
    ct_conv_shape,
    ct_convolve_pair,
    ct_dft2,
    ct_factor,
    ct_idft2,
    ct_kernel_pair,
    make_ct_tables,
)
from jolideco_tpu.ops.fft import convolve_fft_numpy


def test_factor_and_shape():
    assert ct_factor(1056) == (176, 6)
    assert ct_factor(1152) == (192, 6)
    n1, n2 = ct_factor(52)
    assert n1 * n2 == 52
    n = ct_conv_shape(1056)
    assert n >= 1056
    assert ct_factor(n)[0] >= 32


def test_neg_freq_permutes_to_natural_flip():
    """The flattened CT-basis negation equals the natural-order
    ``roll(flip(x), 1)`` conjugated through the layout permutation."""
    from jolideco_tpu.ops.ct_conv import _perm_index

    n, n1 = 24, 4
    n2 = n // n1
    perm = _perm_index(n, n1)        # natural freq at each CT slot
    x_nat = np.arange(100, 100 + n)
    x_ct = x_nat[perm]
    out = np.asarray(_neg_freq_last(jnp.asarray(x_ct), n2))
    # natural-order negation: index k -> (-k) % n
    expected = x_nat[(-perm) % n]
    assert np.array_equal(out, expected)


@pytest.mark.parametrize("fft_shape,factors", [
    ((72, 96), None),
    ((66, 64), ((22, 3), (16, 4))),
    ((40, 40), ((40, 1), (8, 5))),   # single-stage degenerate axis
])
def test_dft2_matches_numpy_permuted(fft_shape, factors):
    from jolideco_tpu.ops.ct_conv import _perm_index

    if factors is None:
        factors = (ct_factor(fft_shape[0]), ct_factor(fft_shape[1]))
    rs = np.random.RandomState(1)
    x = rs.rand(2, *fft_shape).astype(np.float32)
    tabs = make_ct_tables(fft_shape, factors)

    z = np.asarray(ct_dft2(jnp.asarray(x), tabs))
    ref = np.fft.fft2(x.astype(np.float64))
    pr = _perm_index(fft_shape[0], factors[0][0])
    pc = _perm_index(fft_shape[1], factors[1][0])
    ref = ref[..., pr, :][..., :, pc]
    scale = np.abs(ref).max()
    assert_allclose(z / scale, ref / scale, atol=5e-5)

    back = np.asarray(jnp.real(ct_idft2(ct_dft2(jnp.asarray(x), tabs),
                                        tabs)))
    assert_allclose(back, x, atol=5e-5)


@pytest.mark.parametrize("precision,tol", [
    ("split3", 5e-5),
    (lax.Precision.HIGHEST, 5e-6),
])
def test_conv_pair_matches_numpy(precision, tol):
    rs = np.random.RandomState(2)
    h, w = 40, 56
    k0 = rs.rand(13, 11).astype(np.float64)
    k1 = rs.rand(9, 15).astype(np.float64)
    fs = (ct_conv_shape(h + 13 - 1), ct_conv_shape(w + 15 - 1))
    x0 = rs.rand(3, 1, h, w).astype(np.float32)
    x1 = rs.rand(3, 1, h, w).astype(np.float32)

    tabs = make_ct_tables(fs)
    spec = ct_kernel_pair(k0, k1, (h, w), fs)
    y0, y1 = ct_convolve_pair(jnp.asarray(x0), jnp.asarray(x1), *spec,
                              tabs, fs, precision)
    r0 = np.stack([convolve_fft_numpy(x0[i, 0], k0)
                   for i in range(3)])[:, None]
    r1 = np.stack([convolve_fft_numpy(x1[i, 0], k1)
                   for i in range(3)])[:, None]
    assert_allclose(np.asarray(y0) / np.abs(r0).max(),
                    r0 / np.abs(r0).max(), atol=tol)
    assert_allclose(np.asarray(y1) / np.abs(r1).max(),
                    r1 / np.abs(r1).max(), atol=tol)


def test_conv_pair_custom_vjp_matches_autodiff():
    """The conjugate-spectrum backward equals autodiff through the
    unwrapped implementation."""
    rs = np.random.RandomState(3)
    h, w = 24, 32
    k0 = rs.rand(7, 7).astype(np.float64)
    k1 = rs.rand(5, 9).astype(np.float64)
    fs = (ct_conv_shape(h + 6), ct_conv_shape(w + 8))
    x0 = jnp.asarray(rs.rand(2, 1, h, w).astype(np.float32))
    x1 = jnp.asarray(rs.rand(2, 1, h, w).astype(np.float32))
    tabs = make_ct_tables(fs)
    spec = ct_kernel_pair(k0, k1, (h, w), fs)
    wts = jnp.asarray(rs.rand(2, 1, h, w).astype(np.float32))

    def f_custom(u0, u1):
        a, b = ct_convolve_pair(u0, u1, *spec, tabs, fs, "split3")
        return jnp.sum(a * wts) + jnp.sum(b * (1 - wts))

    def f_impl(u0, u1):
        a, b = _ct_conv_pair_impl(u0, u1, *spec, tabs, fs, "split3")
        return jnp.sum(a * wts) + jnp.sum(b * (1 - wts))

    g0, g1 = jax.grad(f_custom, argnums=(0, 1))(x0, x1)
    r0, r1 = jax.grad(f_impl, argnums=(0, 1))(x0, x1)
    scale = float(jnp.abs(r0).max())
    assert_allclose(np.asarray(g0) / scale, np.asarray(r0) / scale,
                    atol=2e-4)
    assert_allclose(np.asarray(g1) / scale, np.asarray(r1) / scale,
                    atol=2e-4)


def test_kernel_pair_rejects_small_fft_shape():
    k = np.ones((9, 9))
    with pytest.raises(ValueError, match="too small"):
        ct_kernel_pair(k, k, (32, 32), (33, 40))


def _toy_datasets(n_obs=4, size=32, seed=5):
    from jolideco_tpu.utils.kernels import gaussian_kernel_2d

    rs = np.random.RandomState(seed)
    datasets = {}
    for i in range(n_obs):
        psf = gaussian_kernel_2d(1.5 + 0.2 * i, x_size=9, y_size=9)
        datasets[f"obs-{i}"] = {
            "counts": rs.poisson(3.0, (size, size)).astype(np.float32),
            "psf": psf.astype(np.float32),
            "exposure": (1.0 + 0.1 * i) * np.ones(
                (size, size), np.float32
            ),
            "background": np.full((size, size), 2.0, np.float32),
        }
    return datasets


@pytest.mark.parametrize("n_obs", [4, 5])
def test_stacked_loss_ct_matches_fft(n_obs):
    """conv_mode='ct' stacked loss equals the FFT path (values and
    flux gradients), including the odd-tail rFFT fallback."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.parallel.stacked import StackedPoissonLoss

    rs = np.random.RandomState(6)
    datasets = _toy_datasets(n_obs=n_obs)
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.uniform(0.5, 2.0, (32, 32))
    )

    fft_loss = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="fft"
    )
    ct_loss = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="ct"
    )
    assert ct_loss.ct_pair_kernels is not None
    assert ct_loss.ct_tables is not None

    fluxes = components.to_flux_tuple()
    v_fft = np.asarray(fft_loss.evaluate(fluxes))
    v_ct = np.asarray(ct_loss.evaluate(fluxes))
    assert v_fft.shape == v_ct.shape == (n_obs,)
    assert_allclose(v_ct, v_fft, rtol=2e-4, atol=2e-4)

    g_fft = jax.grad(lambda f: fft_loss((f,)))(fluxes[0])
    g_ct = jax.grad(lambda f: ct_loss((f,)))(fluxes[0])
    scale = float(jnp.abs(g_fft).max())
    assert_allclose(np.asarray(g_ct) / scale,
                    np.asarray(g_fft) / scale, atol=2e-4)


def test_stacked_loss_ct_per_obs_paths_match_fft():
    """The per-observation CT path (`ct_convolve_single`; sequential
    strategy / evaluate_dataset) matches the FFT per-obs path."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.parallel.stacked import StackedPoissonLoss

    rs = np.random.RandomState(7)
    datasets = _toy_datasets(n_obs=3)
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.uniform(0.5, 2.0, (32, 32))
    )
    fluxes = components.to_flux_tuple()

    fft_loss = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="fft"
    )
    ct_loss = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="ct"
    )
    assert ct_loss.ct_singles is not None
    for idx in range(3):
        v_fft = float(fft_loss.evaluate_dataset(idx, fluxes))
        v_ct = float(ct_loss.evaluate_dataset(idx, fluxes))
        assert_allclose(v_ct, v_fft, rtol=2e-4)

    # gradient through the single-image custom VJP
    g_fft = jax.grad(
        lambda f: fft_loss.evaluate_dataset(1, (f,))
    )(fluxes[0])
    g_ct = jax.grad(
        lambda f: ct_loss.evaluate_dataset(1, (f,))
    )(fluxes[0])
    scale = float(jnp.abs(g_fft).max())
    assert_allclose(np.asarray(g_ct) / scale,
                    np.asarray(g_fft) / scale, atol=2e-4)


def test_spatial_sharding_ct_matches_single_device():
    """2-D (obs x row) mesh with conv_mode='ct': the einsum stages
    partition under GSPMD like the mxu mode, values and gradients."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.parallel import (
        make_obs_row_mesh,
        shard_stacked_spatial,
    )
    from jolideco_tpu.parallel.stacked import StackedPoissonLoss

    rs = np.random.RandomState(8)
    datasets = _toy_datasets(n_obs=4)
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.uniform(0.5, 2.0, (32, 32))
    )
    fluxes = components.to_flux_tuple()

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="ct"
    )
    expected = np.asarray(stacked.evaluate(fluxes))

    mesh = make_obs_row_mesh(2, 4)
    sharded = shard_stacked_spatial(stacked, mesh)
    assert sharded.ct_pair_kernels is None     # per-obs path under 2-D mesh
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)

    g1 = jax.grad(lambda f: jnp.sum(stacked.evaluate((f,))))(fluxes[0])
    g2 = jax.jit(
        jax.grad(lambda f, s=sharded: jnp.sum(s.evaluate((f,))))
    )(fluxes[0])
    scale = float(jnp.abs(g1).max())
    assert_allclose(np.asarray(g2) / scale, np.asarray(g1) / scale,
                    atol=1e-5)


def test_obs_sharding_ct_keeps_pairs_when_even():
    """Under a 1-D obs mesh with an even per-device count the CT pair
    spectra stay sharded (packing survives), matching unsharded."""
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.parallel import make_obs_mesh
    from jolideco_tpu.parallel.stacked import StackedPoissonLoss

    rs = np.random.RandomState(9)
    datasets = _toy_datasets(n_obs=8)
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=rs.uniform(0.5, 2.0, (32, 32))
    )
    fluxes = components.to_flux_tuple()

    stacked = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components, conv_mode="ct"
    )
    expected = np.asarray(stacked.evaluate(fluxes))

    mesh = make_obs_mesh(4)
    sharded = stacked.shard(mesh)
    assert sharded.ct_pair_kernels is not None  # 2 obs/device: pairs kept
    got = np.asarray(jax.jit(lambda s, f: s.evaluate(f))(sharded, fluxes))
    assert_allclose(got, expected, rtol=1e-5, atol=1e-6)


def test_deconvolver_ct_mode_end_to_end():
    """A short MAPDeconvolver run with conv_mode='ct' converges to the
    same flux as the FFT mode within split-float tolerance."""
    from jolideco_tpu import (
        FluxComponents,
        MAPDeconvolver,
        SpatialFluxComponent,
    )

    datasets = _toy_datasets(n_obs=4)
    results = {}
    for mode in ("fft", "ct"):
        components = FluxComponents()
        components["flux"] = SpatialFluxComponent.from_numpy(
            flux=np.ones((32, 32), np.float32)
        )
        deco = MAPDeconvolver(
            n_epochs=50, learning_rate=0.1, display_progress=False,
            update_strategy="joint", scan_epochs=True, trace_every=0,
            conv_mode=mode,
        )
        results[mode] = np.asarray(
            deco.run(datasets=datasets, components=components)
            .components["flux"].flux_upsampled_numpy
        )
    assert_allclose(results["ct"], results["fft"], rtol=5e-4, atol=5e-4)
