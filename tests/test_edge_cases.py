"""Edge cases the reference struggles with (SURVEY.md §7 quirks)."""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    SpatialFluxComponent,
)
from jolideco_tpu.priors import GMMPatchPrior, GaussianMixtureModel
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf


def test_gmm_odd_stride_jitter():
    """Odd image size + odd stride + jitter.

    The reference xfails this configuration (its jitter indices run out
    of bounds, reference ``tests/test_core.py:223-246``); the gather
    formulation here clamps indices and trains fine.
    """
    random_state = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(
        random_state=random_state, shape=(37, 37)
    )

    deco = MAPDeconvolver(n_epochs=10, learning_rate=0.1,
                          display_progress=False)
    flux_init = random_state.gamma(20, size=(37, 37))

    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init,
        upsampling_factor=1,
        prior=GMMPatchPrior(
            gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1"),
            stride=3,
            jitter=True,
        ),
    )

    result = deco.run(datasets={"dataset-1": dataset}, components=components)
    assert np.isfinite(result.trace_loss[-1]["total"])
    assert np.isfinite(result.flux_total).all()


def test_single_dataset_component_shortcut():
    """Passing a bare component (not FluxComponents) works."""
    random_state = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=random_state)

    deco = MAPDeconvolver(n_epochs=3, learning_rate=0.1,
                          display_progress=False)
    component = SpatialFluxComponent.from_numpy(
        flux=random_state.gamma(20, size=(32, 32))
    )
    result = deco.run(datasets={"obs": dataset}, components=component)
    assert "flux" in result.components


def test_poisson_loss_weights_nonzero_without_calibrations():
    """The reference's PoissonLoss.__call__ returns 0 without
    calibrations (empty weight tensor, reference loss.py:40-49);
    ours weights by 1."""
    from jolideco_tpu.loss import PoissonLoss

    random_state = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=random_state)
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=random_state.gamma(20, size=(32, 32))
    )
    loss = PoissonLoss.from_datasets(
        datasets={"obs": dataset}, components=components
    )
    total = float(loss(components.to_flux_tuple()))
    assert total > 0


def test_hessian_includes_poisson_term():
    """Flux errors reflect the data, not just the prior (the reference
    detaches the Poisson term — SURVEY.md §3.4)."""
    from jolideco_tpu.loss import TotalLoss

    random_state = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=random_state)
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32))
    )
    total_loss = TotalLoss.from_datasets_and_components(
        datasets={"obs": dataset}, components=components
    )
    fluxes = components.to_flux_tuple()
    hessians = total_loss.hessian_diagonals(fluxes)
    # uniform prior has zero Hessian: any structure comes from the
    # Poisson term
    assert float(np.abs(np.asarray(hessians[0])).max()) > 0


def test_hessian_with_pallas_scorer_enabled():
    """Flux errors must work when the GMM Pallas kernel is the active
    scorer: its custom-VJP backward has no JVP rule, so the
    second-order probe must force the XLA scan (regression for a
    NotImplementedError('repeat') on TPU)."""
    from jolideco_tpu import config as jt_config
    from jolideco_tpu.loss import TotalLoss
    from jolideco_tpu.priors import GMMPatchPrior

    random_state = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=random_state)
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32)),
        prior=GMMPatchPrior(
            gmm=GaussianMixtureModel.from_registry("builtin-8x8-v1"),
            cycle_spin=False,
        ),
    )
    total_loss = TotalLoss.from_datasets_and_components(
        datasets={"obs": dataset}, components=components
    )
    fluxes = components.to_flux_tuple()
    jt_config.set_use_pallas("interpret")
    try:
        hessians = total_loss.hessian_diagonals(
            fluxes, key=jax.random.PRNGKey(0)
        )
    finally:
        jt_config.set_use_pallas("auto")
    assert jt_config.use_pallas() == "auto"
    assert np.isfinite(np.asarray(hessians[0])).all()


def test_masked_component_stays_masked():
    random_state = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=random_state)

    mask = np.zeros((32, 32), bool)
    mask[8:24, 8:24] = True

    deco = MAPDeconvolver(n_epochs=5, learning_rate=0.1,
                          display_progress=False)
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=random_state.gamma(20, size=(32, 32)), mask=mask
    )
    result = deco.run(datasets={"obs": dataset}, components=components)
    flux = result.components["flux-1"].flux_upsampled_numpy
    assert_allclose(flux[~mask], 0.0)
    assert (flux[mask] > 0).all()


def test_multi_component_sparse_plus_dense():
    """Two components with per-component PSFs train jointly."""
    from jolideco_tpu import SparseSpatialFluxComponent
    from jolideco_tpu.priors import InverseGammaPrior

    random_state = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=random_state)
    dataset = dict(dataset)
    dataset["psf"] = {"diffuse": dataset["psf"], "points": dataset["psf"]}

    components = FluxComponents()
    components["diffuse"] = SpatialFluxComponent.from_numpy(
        flux=random_state.gamma(20, size=(32, 32))
    )
    components["points"] = SparseSpatialFluxComponent.from_numpy(
        flux=np.array([10.0, 5.0]),
        x_pos=np.array([16.0, 26.0]),
        y_pos=np.array([26.0, 16.0]),
        shape=(32, 32),
    )

    deco = MAPDeconvolver(n_epochs=5, learning_rate=0.1,
                          display_progress=False)
    result = deco.run(datasets={"obs": dataset}, components=components)
    assert np.isfinite(result.trace_loss[-1]["total"])
    assert result.components["points"].x_pos_numpy.shape == (2,)


def test_frozen_component_unchanged_by_training():
    random_state = np.random.RandomState(642020)
    dataset = gauss_and_point_sources_gauss_psf(random_state=random_state)
    dataset = dict(dataset)
    dataset["psf"] = {"a": dataset["psf"], "b": dataset["psf"]}

    frozen_flux = random_state.gamma(20, size=(32, 32))
    components = FluxComponents()
    components["a"] = SpatialFluxComponent.from_numpy(
        flux=random_state.gamma(20, size=(32, 32))
    )
    components["b"] = SpatialFluxComponent.from_numpy(
        flux=frozen_flux, frozen=True
    )

    deco = MAPDeconvolver(n_epochs=5, learning_rate=0.1,
                          display_progress=False)
    result = deco.run(datasets={"obs": dataset}, components=components)
    assert_allclose(
        result.components["b"].flux_upsampled_numpy, frozen_flux, rtol=1e-6
    )


def test_nonfinite_training_warns(caplog):
    """A training blow-up (NaN counts here) must be reported loudly."""
    import logging

    from jolideco_tpu import MAPDeconvolver, SpatialFluxComponent

    data = gauss_and_point_sources_gauss_psf(
        random_state=np.random.RandomState(0)
    )
    data["counts"] = data["counts"].copy()
    data["counts"][0, 0] = np.nan

    component = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32), np.float32)
    )
    deco = MAPDeconvolver(
        n_epochs=3, display_progress=False, scan_epochs=True, trace_every=1
    )
    with caplog.at_level(logging.WARNING, logger="jolideco_tpu.core"):
        result = deco.run(datasets={"obs": data}, components=component)
    assert any("non-finite" in r.message for r in caplog.records)
    assert not np.isfinite(
        result.components["flux"].flux_upsampled_numpy
    ).all()
