"""Functional test: calibrations recover known nuisance parameters."""

import numpy as np
from numpy.testing import assert_allclose
from scipy.signal import fftconvolve

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    NPredCalibration,
    NPredCalibrations,
    SpatialFluxComponent,
)
from jolideco_tpu.utils.kernels import gaussian_kernel_2d


def make_shifted_dataset(flux, shift, bkg_norm, rs):
    """Counts generated from a shifted flux and scaled background."""
    from scipy.ndimage import shift as nd_shift

    psf = gaussian_kernel_2d(2, x_size=9, y_size=9)
    exposure = np.ones(flux.shape, np.float32)
    background = np.ones(flux.shape, np.float32)

    flux_shifted = nd_shift(flux, (shift[1], shift[0]), order=1)
    npred = (
        fftconvolve(flux_shifted * exposure, psf, mode="same")
        + bkg_norm * background
    )
    counts = rs.poisson(np.maximum(npred, 0)).astype(np.float32)
    return {
        "counts": counts,
        "psf": psf.astype(np.float32),
        "exposure": exposure,
        "background": background,
    }


def test_calibration_recovers_shift_and_background():
    rs = np.random.RandomState(642020)

    # smooth, bright truth so the position signal is strong
    yy, xx = np.mgrid[0:64, 0:64]
    flux = 2000.0 * np.exp(
        -((xx - 32.0) ** 2 + (yy - 30.0) ** 2) / (2 * 9.0)
    ).astype(np.float32)

    true_shift = (1.5, -0.75)
    true_bkg = 1.6

    datasets = {
        "obs": make_shifted_dataset(flux, true_shift, true_bkg, rs)
    }

    # frozen flux at the truth: only the calibration trains
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.maximum(flux, 1e-3), frozen=True
    )

    calibrations = NPredCalibrations()
    calibrations["obs"] = NPredCalibration()

    deco = MAPDeconvolver(
        n_epochs=500, learning_rate=0.05, display_progress=False
    )
    result = deco.run(
        datasets=datasets, components=components, calibrations=calibrations
    )

    fitted = result.calibrations["obs"].to_dict()
    # shift_image samples input at +shift (grid_sample convention), so
    # the fitted calibration is the negative of the data shift
    assert_allclose(fitted["shift_x"], -true_shift[0], atol=0.15)
    assert_allclose(fitted["shift_y"], -true_shift[1], atol=0.15)
    assert_allclose(fitted["background_norm"], true_bkg, rtol=0.1)


def test_flux_errors_computed_at_trained_calibration_values():
    """Flux errors after ``run()`` are the errors at the TRAINED
    calibration values by construction: ``fluxes_error`` threads the
    optimiser's calibration pytree explicitly instead of relying on the
    ``set_parameters`` write-back having mutated the stored statics
    first (round-3 ordering-contract hole)."""
    import jax.numpy as jnp

    from jolideco_tpu.loss import TotalLoss
    from jolideco_tpu.priors import UniformPrior

    rs = np.random.RandomState(11)
    yy, xx = np.mgrid[0:32, 0:32]
    flux = 500.0 * np.exp(
        -((xx - 16.0) ** 2 + (yy - 16.0) ** 2) / (2 * 9.0)
    ).astype(np.float32)
    datasets = {"obs": make_shifted_dataset(flux, (0.0, 0.0), 1.8, rs)}

    def make_components():
        components = FluxComponents()
        components["flux"] = SpatialFluxComponent.from_numpy(
            flux=np.maximum(flux, 1e-3), prior=UniformPrior()
        )
        return components

    calibrations = NPredCalibrations()
    calibrations["obs"] = NPredCalibration(frozen_shift=True)

    deco = MAPDeconvolver(
        n_epochs=60, learning_rate=0.1, display_progress=False,
        compute_error=True,
    )
    components = make_components()
    result = deco.run(
        datasets=datasets, components=components, calibrations=calibrations
    )

    fitted = result.calibrations["obs"].to_dict()
    # the calibration must actually have trained away from init (1.0),
    # otherwise the test proves nothing
    assert abs(fitted["background_norm"] - 1.0) > 0.2

    # independent recomputation from a FRESH TotalLoss whose stored
    # calibration statics are still at INIT values: threading the
    # trained pytree must reproduce run()'s errors; omitting it (init
    # statics) must not.
    calibrations_init = NPredCalibrations()
    calibrations_init["obs"] = NPredCalibration(frozen_shift=True)
    total = TotalLoss.from_datasets_and_components(
        datasets=datasets,
        components=result.components,  # trained fluxes
        calibrations=calibrations_init,
    )
    fluxes = result.components.to_flux_tuple()
    trained_params = {
        "obs": {
            "log_background_norm": jnp.asarray(
                np.log(fitted["background_norm"]), jnp.float32
            )
        }
    }
    err_trained = np.asarray(
        total.fluxes_error(
            fluxes=fluxes, calibration_params=trained_params
        )["flux"]
    )
    err_init = np.asarray(total.fluxes_error(fluxes=fluxes)["flux"])

    got = result.components["flux"].flux_upsampled_error_numpy
    assert_allclose(got, err_trained[0, 0], rtol=1e-4)
    assert np.abs(err_init[0, 0] / got - 1.0).max() > 1e-3
