"""Model-layer tests: forward physics, components, calibrations.

Mirrors the reference's ``jolideco/models/tests/test_core.py`` unit
tests: delta-flux conservation through the NPred chain, sparse
splatting, 3-D multi-band PSF stacks, RMF contraction.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax.numpy as jnp

from jolideco_tpu import (
    FluxComponents,
    NPredCalibration,
    NPredCalibrations,
    NPredModel,
    NPredModels,
    SparseSpatialFluxComponent,
    SpatialFluxComponent,
)
from jolideco_tpu.utils.kernels import gaussian_kernel_2d


@pytest.fixture
def dataset():
    shape = (1, 1, 25, 25)
    exposure = np.ones(shape, np.float32)
    psf = gaussian_kernel_2d(3).astype(np.float32)
    return {
        "psf": jnp.asarray(psf[None, None]),
        "exposure": jnp.asarray(exposure),
    }


@pytest.fixture
def dataset_3d():
    shape = (1, 3, 25, 25)
    exposure = np.ones(shape, np.float32)
    psf = np.stack(
        [gaussian_kernel_2d(s, x_size=25) for s in [1, 2, 3]]
    ).astype(np.float32)
    return {
        "psf": jnp.asarray(psf[None]),
        "exposure": jnp.asarray(exposure),
    }


def test_simple_npred_model(dataset):
    flux_init = np.zeros((1, 1, 25, 25), np.float32)
    flux_init[0, 0, 10, 10] = 1

    component = SpatialFluxComponent(flux_upsampled=jnp.asarray(flux_init))
    npred_model = NPredModel(**dataset)

    npred = np.asarray(npred_model(flux=component.flux))[0, 0]
    # delta flux through a unit-sum PSF conserves total flux
    assert_allclose(npred.sum(), 1.0, atol=1e-3)
    # peak lands at the source position
    assert npred[10, 10] == npred.max()


def test_simple_npred_model_sparse(dataset):
    flux = np.array([3.7, 2.1, 4.2], np.float32)
    x_pos = np.array([7.2, 12.1, 19.2], np.float32)
    y_pos = np.array([7.7, 3.1, 14.2], np.float32)

    component = SparseSpatialFluxComponent(
        flux=jnp.asarray(flux),
        x_pos=jnp.asarray(x_pos),
        y_pos=jnp.asarray(y_pos),
        shape=(25, 25),
    )
    npred_model = NPredModel(**dataset)
    npred = np.asarray(npred_model(flux=component.flux))[0, 0]

    # total flux (sources near the border lose some to PSF leakage)
    assert_allclose(npred.sum(), flux.sum(), rtol=0.05)
    # splatted image itself conserves flux exactly
    assert_allclose(component.flux_numpy.sum(), flux.sum(), rtol=1e-5)


def test_sparse_splat_centroid():
    component = SparseSpatialFluxComponent(
        flux=jnp.asarray([2.0]),
        x_pos=jnp.asarray([3.3]),
        y_pos=jnp.asarray([5.8]),
        shape=(10, 10),
        use_log_flux=False,
    )
    image = component.flux_numpy
    assert_allclose(image.sum(), 2.0, rtol=1e-6)
    ys, xs = np.mgrid[0:10, 0:10]
    assert_allclose((image * xs).sum() / image.sum(), 3.3, rtol=1e-5)
    assert_allclose((image * ys).sum() / image.sum(), 5.8, rtol=1e-5)


def test_simple_npred_model_3d(dataset_3d):
    flux_init = np.zeros((1, 3, 25, 25), np.float32)
    flux_init[0, :, 12, 12] = 1

    component = SpatialFluxComponent(flux_upsampled=jnp.asarray(flux_init))
    npred_model = NPredModel(**dataset_3d)
    npred = np.asarray(npred_model(flux=component.flux))[0]

    assert npred.shape == (3, 25, 25)
    assert_allclose(npred.sum(), 3, rtol=1e-3)
    # narrower PSF gives higher peak in band 0
    assert npred[0, 12, 12] > npred[1, 12, 12] > npred[2, 12, 12]


def test_simple_npred_model_3d_rmf(dataset_3d):
    flux_init = np.zeros((1, 3, 25, 25), np.float32)
    flux_init[0, :, 12, 12] = 1

    rmf = jnp.ones((3, 1)) / 3.0
    component = SpatialFluxComponent(flux_upsampled=jnp.asarray(flux_init))
    npred_model = NPredModel(rmf=rmf, **dataset_3d)
    npred = np.asarray(npred_model(flux=component.flux))[0]

    assert npred.shape == (1, 25, 25)
    assert_allclose(npred.sum(), 1, rtol=2e-3)


def test_npred_model_upsampling():
    exposure = np.ones((16, 16), np.float32)
    psf = gaussian_kernel_2d(2, x_size=9, y_size=9).astype(np.float32)
    npred_model = NPredModel.from_numpy(
        exposure=exposure, psf=psf, upsampling_factor=2
    )

    assert npred_model.shape_upsampled == (1, 1, 32, 32)
    assert npred_model.shape == (1, 1, 16, 16)

    flux = np.zeros((1, 1, 32, 32), np.float32)
    flux[0, 0, 16, 16] = 1.0
    npred = np.asarray(npred_model(flux=jnp.asarray(flux)))
    assert npred.shape == (1, 1, 16, 16)
    # total flux is conserved through upsample-convolve-pool
    assert_allclose(npred.sum(), 1.0, rtol=1e-2)


def test_npred_models_from_dataset(dataset):
    flux_init = np.ones((32, 32), np.float32)
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(flux=flux_init)

    numpy_dataset = {
        "counts": np.ones((32, 32), np.float32),
        "exposure": np.ones((32, 32), np.float32),
        "background": 0.5 * np.ones((32, 32), np.float32),
        "psf": gaussian_kernel_2d(2).astype(np.float32),
    }
    npred_models = NPredModels.from_dataset_numpy(
        dataset=numpy_dataset, components=components
    )
    npred = np.asarray(
        npred_models.evaluate(fluxes=components.to_flux_tuple())
    )
    assert npred.shape == (1, 1, 32, 32)
    # interior: flux * exposure + background = 1.5
    assert_allclose(npred[0, 0, 16, 16], 1.5, rtol=1e-3)


def test_calibration_shift_and_background():
    calibration = NPredCalibration(
        shift_x=0.5, shift_y=-0.25, background_norm=2.0
    )
    assert_allclose(float(calibration.background_norm[0]), 2.0, rtol=1e-6)

    data = calibration.to_dict()
    assert_allclose(data["shift_x"], 0.5)
    assert_allclose(data["shift_y"], -0.25)
    assert_allclose(data["background_norm"], 2.0, rtol=1e-6)

    round_trip = NPredCalibration.from_dict(data)
    assert_allclose(
        np.asarray(round_trip.shift_xy), np.asarray(calibration.shift_xy)
    )

    flux = jnp.asarray(np.random.RandomState(0).rand(1, 1, 16, 16), jnp.float32)
    shifted = calibration(flux=flux, scale=1)
    assert shifted.shape == flux.shape


def test_calibrations_parameters():
    calibrations = NPredCalibrations()
    calibrations["a"] = NPredCalibration()
    calibrations["b"] = NPredCalibration(frozen=True)

    params = calibrations.parameters()
    assert "a" in params and "b" not in params
    assert set(params["a"]) == {"shift_xy", "log_background_norm"}


def test_component_frozen_and_mask():
    flux = np.ones((4, 4), np.float32)
    mask = np.zeros((4, 4), bool)
    mask[1:3, 1:3] = True

    component = SpatialFluxComponent.from_numpy(flux=flux, mask=mask)
    out = component.flux_upsampled_numpy
    assert_allclose(out[0, 0], 0.0)
    assert_allclose(out[1, 1], 1.0)

    frozen = SpatialFluxComponent.from_numpy(flux=flux, frozen=True)
    assert frozen.parameters() == {}


def test_components_parameters_roundtrip():
    flux = np.ones((4, 4), np.float32)
    components = FluxComponents()
    components["a"] = SpatialFluxComponent.from_numpy(flux=flux)
    components["b"] = SpatialFluxComponent.from_numpy(flux=2 * flux, frozen=True)

    params = components.parameters()
    assert list(params) == ["a"]

    new = {"a": {"flux": params["a"]["flux"] + 1.0}}
    components.set_parameters(new)
    assert_allclose(
        components["a"].flux_upsampled_numpy, np.e * np.ones((4, 4)), rtol=1e-5
    )

    # frozen component flux still flows into the tuple
    fluxes = components.fluxes_from(new)
    assert len(fluxes) == 2
    assert_allclose(np.asarray(fluxes[1])[0, 0], 2 * flux, rtol=1e-5)


def test_from_flux_init_datasets():
    datasets = [
        {
            "counts": 4 * np.ones((8, 8), np.float32),
            "exposure": 2 * np.ones((8, 8), np.float32),
            "background": np.ones((8, 8), np.float32),
        }
    ]
    component = SpatialFluxComponent.from_flux_init_datasets(datasets)
    assert_allclose(component.flux_upsampled_numpy, 1.0, rtol=1e-6)


def test_from_flux_init_datasets_oversubtracted_background():
    # counts/exposure - background < 0 somewhere: the log-flux
    # parameterisation must stay finite (clipped to the smallest
    # positive estimate, documented deviation from the reference)
    counts = np.zeros((8, 8), np.float32)
    counts[4, 4] = 8.0
    datasets = [
        {
            "counts": counts,
            "exposure": np.ones((8, 8), np.float32),
            "background": np.ones((8, 8), np.float32),
        }
    ]
    component = SpatialFluxComponent.from_flux_init_datasets(datasets)
    flux = component.flux_upsampled_numpy
    assert np.isfinite(flux).all()
    assert (flux > 0).all()
    assert_allclose(flux[4, 4], 7.0, rtol=1e-6)
    # log-flux parameter itself is finite
    params = component.parameters()
    assert np.isfinite(np.asarray(params["flux"])).all()


def test_from_sky_coord_unpacks_x_y():
    # astropy's SkyCoord.to_pixel returns (x, y); the reference unpacks
    # it as (y, x) (reference models/core.py:185), transposing every
    # source — a reference bug deliberately not reproduced here
    from jolideco_tpu.models import SparseSpatialFluxComponent

    class FakeSkyCoord:
        def to_pixel(self, wcs):
            return np.array([10.0, 3.0]), np.array([40.0, 7.0])

    component = SparseSpatialFluxComponent.from_sky_coord(
        FakeSkyCoord(), wcs=None, flux=np.array([1.0, 2.0]),
        shape=(64, 64),
    )
    np.testing.assert_array_equal(component.x_pos_numpy, [10.0, 3.0])
    np.testing.assert_array_equal(component.y_pos_numpy, [40.0, 7.0])


def test_background_is_reserved_component_name():
    from jolideco_tpu.models import NPredModel, NPredModels

    model = NPredModel.from_numpy(
        exposure=np.ones((8, 8)), psf=np.ones((3, 3)) / 9,
        upsampling_factor=1,
    )
    with pytest.raises(ValueError, match="reserved"):
        NPredModels(
            np.zeros((1, 1, 8, 8)), None, [("background", model)]
        )


def test_dataset_rmf_threads_through_build():
    # superset of the reference: a dataset "rmf" reaches the forward
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.models import NPredModels
    from jolideco_tpu.priors import UniformPrior

    rng = np.random.RandomState(0)
    n_e_in, n_e_out, size = 3, 2, 16
    rmf = rng.dirichlet(np.ones(n_e_out), size=n_e_in).astype(np.float32)
    dataset = {
        "counts": np.ones((n_e_out, size, size), np.float32),
        "psf": np.ones((n_e_in, 5, 5), np.float32) / 25,
        "exposure": np.ones((n_e_in, size, size), np.float32),
        "background": 0.1 * np.ones((n_e_out, size, size), np.float32),
        "rmf": rmf,
    }
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent(
        flux_upsampled=np.ones((1, n_e_in, size, size), np.float32),
        prior=UniformPrior(),
    )
    models = NPredModels.from_dataset_numpy(
        dataset=dataset, components=components
    )
    npred = models.evaluate(components.to_flux_tuple())
    # energy redistribution contracted n_e_in -> n_e_out bands
    assert npred.shape[-3] == n_e_out
    assert np.all(np.isfinite(np.asarray(npred)))

    # and the full per-dataset loss builds and evaluates (multiband
    # counts follow the same 2-D/3-D convention)
    from jolideco_tpu.loss import PoissonLoss

    per = PoissonLoss.from_datasets(
        datasets={"obs": dataset}, components=components
    )
    loss = np.asarray(per.evaluate(components.to_flux_tuple()))
    assert np.all(np.isfinite(loss))
