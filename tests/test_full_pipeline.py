"""Chandra-E0102-style full pipeline: many observations, per-obs
calibrations, upsampled GMM-prior component + frozen second component,
joint sharded updates (BASELINE.json configs 3-4 shape)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    NPredCalibration,
    NPredCalibrations,
    SpatialFluxComponent,
)
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
from jolideco_tpu.parallel import make_obs_mesh
from jolideco_tpu.priors import GMMPatchPrior, GaussianMixtureModel


@pytest.fixture(scope="module")
def datasets():
    rs = np.random.RandomState(642020)
    datasets = {}
    for idx in range(8):
        d = gauss_and_point_sources_gauss_psf(random_state=rs)
        d["psf"] = {"diffuse": d["psf"], "flat": d["psf"]}
        datasets[f"obs-{idx}"] = d
    return datasets


def test_full_pipeline_joint_sharded(datasets):
    rs = np.random.RandomState(642020)

    components = FluxComponents()
    components["diffuse"] = SpatialFluxComponent.from_numpy(
        flux=rs.gamma(20, size=(32, 32)),
        upsampling_factor=2,
        prior=GMMPatchPrior(
            gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1"),
        ),
    )
    components["flat"] = SpatialFluxComponent.from_numpy(
        flux=0.1 * np.ones((32, 32)), frozen=True
    )

    calibrations = NPredCalibrations()
    for name in datasets:
        calibrations[name] = NPredCalibration()

    deco = MAPDeconvolver(
        n_epochs=10,
        learning_rate=0.1,
        display_progress=False,
        update_strategy="joint",
        mesh=make_obs_mesh(),
    )
    result = deco.run(
        datasets=datasets, components=components, calibrations=calibrations
    )

    # mixed upsampling factors: totals are defined at data resolution
    assert result.flux_total.shape == (32, 32)
    assert result.components["diffuse"].flux_upsampled_numpy.shape == (64, 64)
    assert np.isfinite(result.trace_loss[-1]["total"])
    # frozen component untouched
    assert_allclose(
        result.components["flat"].flux_upsampled_numpy, 0.1, rtol=1e-6
    )
    # calibrations moved off their init
    shift = np.asarray(result.calibrations["obs-0"].shift_xy)
    assert np.abs(shift).max() > 0

    # round-trip the full result through FITS
    import tempfile
    from pathlib import Path

    from jolideco_tpu import MAPDeconvolverResult

    with tempfile.TemporaryDirectory() as tmp:
        path = Path(tmp) / "result.fits"
        result.write(path)
        back = MAPDeconvolverResult.read(path)
        assert_allclose(
            back.components["diffuse"].flux_upsampled_numpy,
            result.components["diffuse"].flux_upsampled_numpy,
            rtol=1e-6,
        )
        assert "obs-0" in back.calibrations
        assert_allclose(
            back.calibrations["obs-0"].to_dict()["shift_x"],
            result.calibrations["obs-0"].to_dict()["shift_x"],
            rtol=1e-5, atol=1e-7,
        )


def test_full_pipeline_sequential_matches_reference_semantics(datasets):
    """Sequential (reference) semantics with the same setup runs and
    converges comparably to joint."""
    rs = np.random.RandomState(642020)

    def build():
        components = FluxComponents()
        components["diffuse"] = SpatialFluxComponent.from_numpy(
            flux=rs.gamma(20, size=(32, 32)), upsampling_factor=2
        )
        components["flat"] = SpatialFluxComponent.from_numpy(
            flux=0.1 * np.ones((32, 32)), frozen=True
        )
        return components

    small = {k: datasets[k] for k in list(datasets)[:2]}

    deco = MAPDeconvolver(
        n_epochs=10, learning_rate=0.1, display_progress=False
    )
    result = deco.run(datasets=small, components=build())
    assert np.isfinite(result.trace_loss[-1]["total"])
