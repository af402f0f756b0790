"""End-to-end equivalence of the three convolution modes + misc ops."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    SpatialFluxComponent,
    UniformPrior,
)
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf


@pytest.fixture(scope="module")
def datasets():
    rs = np.random.RandomState(642020)
    return {
        f"{idx}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for idx in range(4)
    }


def build_components():
    rs = np.random.RandomState(642020)
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32)), prior=UniformPrior()
    )
    return components


@pytest.mark.parametrize("conv_mode", ["direct", "mxu"])
def test_joint_training_conv_modes_match_fft(datasets, conv_mode):
    results = {}
    for mode in ("fft", conv_mode):
        deco = MAPDeconvolver(
            n_epochs=20, learning_rate=0.1, display_progress=False,
            update_strategy="joint", conv_mode=mode,
        )
        results[mode] = deco.run(
            datasets=datasets, components=build_components()
        )
    assert_allclose(
        results[conv_mode].flux_total, results["fft"].flux_total, rtol=2e-4,
        atol=1e-5,
    )


def test_joint_training_pfft_matches_fft(datasets):
    """The Pallas matmul-DFT backend trains identically to the XLA FFT.

    Runs the pfft kernels in the Pallas interpreter; 32^2 images also
    exercise the pad-to-128-multiple path.
    """
    from jolideco_tpu.config import force_pallas

    results = {}
    for mode in ("fft", "pfft"):
        deco = MAPDeconvolver(
            n_epochs=20, learning_rate=0.1, display_progress=False,
            update_strategy="joint", conv_mode=mode,
        )
        with force_pallas("interpret"):
            results[mode] = deco.run(
                datasets=datasets, components=build_components()
            )
    assert_allclose(
        results["pfft"].flux_total, results["fft"].flux_total, rtol=2e-4,
        atol=1e-5,
    )


def test_pfft_falls_back_without_pallas(datasets):
    """With Pallas unavailable (auto on CPU), conv_mode='pfft' trains
    through the per-observation rFFT path and matches fft exactly."""
    from jolideco_tpu.config import force_pallas

    results = {}
    for mode in ("fft", "pfft"):
        deco = MAPDeconvolver(
            n_epochs=5, learning_rate=0.1, display_progress=False,
            update_strategy="joint", conv_mode=mode,
        )
        with force_pallas("off"):
            results[mode] = deco.run(
                datasets=datasets, components=build_components()
            )
    assert_allclose(
        results["pfft"].flux_total, results["fft"].flux_total, rtol=1e-6
    )


def test_conv_mode_auto_resolution(datasets, monkeypatch):
    """``conv_mode="auto"`` resolves to the XLA FFT without compiled
    Pallas (CPU), to the matmul-FFT backend with it on large-enough
    fields, and back to the XLA FFT below the size gate."""
    from jolideco_tpu import core as jt_core
    from jolideco_tpu.config import force_pallas

    deco = MAPDeconvolver(
        n_epochs=1, display_progress=False, update_strategy="joint"
    )
    assert deco.conv_mode == "auto"
    loss = deco._build_total_loss(datasets, None, build_components(), None)
    assert loss.poisson_loss.conv_mode == "fft"
    assert loss.poisson_loss.pfft_pairs is None

    monkeypatch.setattr(jt_core, "PFFT_AUTO_MIN_DIM", 32)
    with force_pallas("on"):
        loss = deco._build_total_loss(
            datasets, None, build_components(), None
        )
    assert loss.poisson_loss.conv_mode == "pfft"
    assert loss.poisson_loss.pfft_pairs is not None
    # interpret mode is a test vehicle, not a speed path
    with force_pallas("interpret"):
        loss = deco._build_total_loss(
            datasets, None, build_components(), None
        )
    assert loss.poisson_loss.conv_mode == "fft"
    # below the size gate the dispatch overhead outweighs the win
    monkeypatch.setattr(jt_core, "PFFT_AUTO_MIN_DIM", 1024)
    with force_pallas("on"):
        loss = deco._build_total_loss(
            datasets, None, build_components(), None
        )
    assert loss.poisson_loss.conv_mode == "fft"


def test_cycle_spin_interp():
    from jolideco_tpu.ops import cycle_spin_interp

    rs = np.random.RandomState(0)
    image = jnp.asarray(rs.rand(1, 1, 16, 16).astype(np.float32))
    shifted, shifts = cycle_spin_interp(
        jax.random.PRNGKey(0), image, patch_shape=(8, 8)
    )
    assert shifted.shape == image.shape
    assert np.abs(np.asarray(shifts)).max() <= 2.0
    # total intensity approximately conserved away from borders
    assert_allclose(
        float(shifted.sum()), float(image.sum()), rtol=0.25
    )


def test_mxu_dft_roundtrip():
    from jolideco_tpu.ops.fft_mxu import make_dft_tables, mxu_dft2, mxu_idft2

    rs = np.random.RandomState(1)
    tables = make_dft_tables((24, 36))
    x = jnp.asarray(
        rs.rand(2, 24, 36).astype(np.float32)
    ).astype(jnp.complex64)
    back = mxu_idft2(mxu_dft2(x, tables), tables)
    assert_allclose(np.asarray(back.real), np.asarray(x.real), atol=1e-5)


def test_joint_training_ct_full_config_matches_fft(datasets):
    """conv_mode='ct' through the full configuration space: ×2
    upsampling + per-observation trainable calibrations, 20 joint
    epochs, vs the FFT path."""
    from jolideco_tpu.models import NPredCalibration, NPredCalibrations

    def build():
        r = np.random.RandomState(1)
        c = FluxComponents()
        c["flux"] = SpatialFluxComponent.from_numpy(
            flux=r.gamma(20, size=(32, 32)),
            prior=UniformPrior(),
            upsampling_factor=2,
        )
        return c

    def build_cal():
        cal = NPredCalibrations()
        for name in datasets:
            cal[name] = NPredCalibration(shift_x=0.1, shift_y=-0.2)
        return cal

    results = {}
    for mode in ("fft", "ct"):
        deco = MAPDeconvolver(
            n_epochs=20, learning_rate=0.1, display_progress=False,
            update_strategy="joint", conv_mode=mode,
        )
        results[mode] = deco.run(
            datasets=datasets, components=build(), calibrations=build_cal()
        )
    assert_allclose(
        results["ct"].flux_total, results["fft"].flux_total,
        rtol=2e-4, atol=1e-5,
    )


def test_wrong_resolution_flux_fails_at_build():
    """An already-upsampled flux init must fail with a clear build-time
    error, not a broadcast error inside the traced forward."""
    rs = np.random.RandomState(0)
    datasets = {
        "a": gauss_and_point_sources_gauss_psf(random_state=rs)
    }
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((64, 64), np.float32), upsampling_factor=2
    )
    deco = MAPDeconvolver(n_epochs=1, display_progress=False)
    with pytest.raises(ValueError, match="expected flux shape"):
        deco.run(datasets=datasets, components=components)
