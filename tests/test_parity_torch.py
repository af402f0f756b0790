"""End-to-end numerical parity against a PyTorch mirror of the reference.

The reference package itself cannot be imported here (astropy is not
installed), so this test re-implements the reference's exact training
math in torch — log-flux parameter, FFT PSF convolution with centered
crop, ``PoissonNLLLoss(log_input=False, eps=1e-25, full=True)``, Adam
with one step per dataset per epoch (reference ``core.py:209-230``) —
and checks that our JAX implementation reproduces the same flux maps on
identical input data. This is the BASELINE.json "flux rtol vs PyTorch
ref" criterion exercised at test scale.
"""

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax

from jolideco_tpu import FluxComponents, MAPDeconvolver, SpatialFluxComponent
from jolideco_tpu.priors import UniformPrior
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf


def torch_reference_run(datasets, flux_init, n_epochs, lr):
    """The reference training loop, re-implemented in torch."""
    import torch
    import torch.nn.functional as F

    def convolve_fft_torch(image, kernel):
        image_2d, kernel_2d = image[0][0], kernel[0][0]
        shape = [
            image_2d.shape[i] + kernel_2d.shape[i] - 1
            for i in range(image_2d.ndim)
        ]
        image_ft = torch.fft.rfft2(image, s=shape)
        kernel_ft = torch.fft.rfft2(kernel, s=shape)
        result = torch.fft.irfft2(image_ft * kernel_ft, s=shape)
        # centered crop
        start = [(shape[i] - image.shape[2 + i]) // 2 for i in range(2)]
        return result[
            ...,
            start[0] : start[0] + image.shape[2],
            start[1] : start[1] + image.shape[3],
        ]

    log_flux = torch.nn.Parameter(
        torch.log(torch.from_numpy(flux_init[None, None].astype(np.float32)))
    )
    optimizer = torch.optim.Adam([log_flux], lr=lr)
    loss_fn = torch.nn.PoissonNLLLoss(
        log_input=False, reduction="mean", eps=1e-25, full=True
    )

    prepared = []
    for dataset in datasets.values():
        exposure = torch.from_numpy(dataset["exposure"][None, None])
        psf = torch.from_numpy(dataset["psf"][None, None])
        # exposure edge correction as in NPredModel.from_numpy
        weights = convolve_fft_torch(torch.ones_like(exposure), psf)
        exposure = exposure / weights
        background = torch.from_numpy(dataset["background"][None, None])
        counts = torch.from_numpy(dataset["counts"][None, None])
        prepared.append((exposure, psf, background, counts))

    for _ in range(n_epochs):
        for exposure, psf, background, counts in prepared:
            optimizer.zero_grad()
            flux = torch.exp(log_flux)
            npred = flux * exposure
            npred = convolve_fft_torch(npred, psf)
            npred = torch.clip(npred, 0, torch.inf) + background
            loss = loss_fn(npred, counts)
            loss.backward()
            optimizer.step()

    return torch.exp(log_flux).detach().numpy()[0, 0]


@pytest.fixture(scope="module")
def datasets():
    rs = np.random.RandomState(642020)
    return {
        f"{idx}": gauss_and_point_sources_gauss_psf(random_state=rs)
        for idx in range(3)
    }


@pytest.mark.parametrize("n_epochs", [50])
def test_flux_map_parity_with_torch(datasets, n_epochs):
    rs = np.random.RandomState(642020)
    flux_init = rs.gamma(20, size=(32, 32))

    # torch mirror of the reference
    flux_torch = torch_reference_run(
        datasets, flux_init, n_epochs=n_epochs, lr=0.1
    )

    # our implementation
    deco = MAPDeconvolver(
        n_epochs=n_epochs, learning_rate=0.1, display_progress=False
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init, prior=UniformPrior()
    )
    result = deco.run(datasets=datasets, components=components)
    flux_jax = result.components["flux-1"].flux_upsampled_numpy

    # upsampling_factor=1: NPredModel still applies the (identity)
    # pooling; flux grids match directly.
    assert_allclose(flux_jax, flux_torch, rtol=2e-3, atol=2e-3)


def test_flux_map_parity_with_torch_upsampled(datasets):
    """Parity including x2 upsampling of the flux grid."""
    import torch
    import torch.nn.functional as F

    rs = np.random.RandomState(642020)
    flux_init = rs.gamma(20, size=(32, 32))
    n_epochs = 30

    def torch_run_upsampled():
        def convolve_fft_torch(image, kernel):
            image_2d, kernel_2d = image[0][0], kernel[0][0]
            shape = [
                image_2d.shape[i] + kernel_2d.shape[i] - 1
                for i in range(image_2d.ndim)
            ]
            image_ft = torch.fft.rfft2(image, s=shape)
            kernel_ft = torch.fft.rfft2(kernel, s=shape)
            result = torch.fft.irfft2(image_ft * kernel_ft, s=shape)
            start = [(shape[i] - image.shape[2 + i]) // 2 for i in range(2)]
            return result[
                ...,
                start[0] : start[0] + image.shape[2],
                start[1] : start[1] + image.shape[3],
            ]

        factor = 2
        flux0 = torch.from_numpy(flux_init[None, None].astype(np.float32))
        flux0 = F.interpolate(flux0, scale_factor=factor, mode="bilinear")
        log_flux = torch.nn.Parameter(torch.log(flux0))
        optimizer = torch.optim.Adam([log_flux], lr=0.1)
        loss_fn = torch.nn.PoissonNLLLoss(
            log_input=False, reduction="mean", eps=1e-25, full=True
        )

        prepared = []
        for dataset in datasets.values():
            exposure = torch.from_numpy(dataset["exposure"][None, None])
            psf = torch.from_numpy(dataset["psf"][None, None])
            exposure = F.interpolate(
                exposure, scale_factor=factor, mode="bilinear"
            )
            psf = (
                F.interpolate(psf, scale_factor=factor, mode="bilinear")
                / factor**2
            )
            weights = convolve_fft_torch(torch.ones_like(exposure), psf)
            exposure = exposure / weights
            background = torch.from_numpy(dataset["background"][None, None])
            counts = torch.from_numpy(dataset["counts"][None, None])
            prepared.append((exposure, psf, background, counts))

        for _ in range(n_epochs):
            for exposure, psf, background, counts in prepared:
                optimizer.zero_grad()
                flux = torch.exp(log_flux)
                npred = flux * exposure
                npred = convolve_fft_torch(npred, psf)
                npred = F.avg_pool2d(
                    npred, kernel_size=factor, divisor_override=1
                )
                npred = torch.clip(npred, 0, torch.inf) + background
                loss = loss_fn(npred, counts)
                loss.backward()
                optimizer.step()

        return torch.exp(log_flux).detach().numpy()[0, 0]

    flux_torch = torch_run_upsampled()

    deco = MAPDeconvolver(
        n_epochs=n_epochs, learning_rate=0.1, display_progress=False
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init, upsampling_factor=2, prior=UniformPrior()
    )
    result = deco.run(datasets=datasets, components=components)
    flux_jax = result.components["flux-1"].flux_upsampled_numpy

    assert flux_jax.shape == (64, 64)
    assert_allclose(flux_jax, flux_torch, rtol=5e-3, atol=5e-3)
