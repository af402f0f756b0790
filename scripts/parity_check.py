"""Flux-map parity report vs a PyTorch mirror of the reference.

Runs the same joint deconvolution (shared flux, per-obs PSF/exposure/
background, sequential per-dataset Adam steps — the reference's exact
training semantics) in this package and in a faithful torch
re-implementation on identical inputs, and reports flux-map agreement.

    python scripts/parity_check.py [--size 64 --n-obs 5 --iters 300]
"""

import argparse
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def torch_mirror(datasets, flux_init, n_epochs, lr):
    import torch

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


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--n-obs", type=int, default=5)
    parser.add_argument("--iters", type=int, default=300)
    args = parser.parse_args()

    from jolideco_tpu import FluxComponents, MAPDeconvolver, SpatialFluxComponent
    from jolideco_tpu.priors import UniformPrior
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf

    rs = np.random.RandomState(642020)
    datasets = {
        f"obs-{i}": gauss_and_point_sources_gauss_psf(
            shape=(args.size, args.size), random_state=rs
        )
        for i in range(args.n_obs)
    }
    flux_init = rs.gamma(20, size=(args.size, args.size))

    flux_torch = torch_mirror(
        datasets, flux_init, n_epochs=args.iters, lr=0.1
    )

    deco = MAPDeconvolver(
        n_epochs=args.iters, learning_rate=0.1, display_progress=False
    )
    components = FluxComponents()
    components["flux-1"] = SpatialFluxComponent.from_numpy(
        flux=flux_init, prior=UniformPrior()
    )
    result = deco.run(datasets=datasets, components=components)
    flux_jax = result.components["flux-1"].flux_upsampled_numpy

    denom = np.maximum(np.abs(flux_torch), 1e-6)
    rel = np.abs(flux_jax - flux_torch) / denom
    print(
        f"flux-map parity vs torch mirror "
        f"({args.n_obs} obs {args.size}^2, {args.iters} sequential Adam "
        f"iters):"
    )
    print(f"  max |rel|    : {rel.max():.2e}")
    print(f"  mean |rel|   : {rel.mean():.2e}")
    print(f"  99th pct     : {np.percentile(rel, 99):.2e}")


if __name__ == "__main__":
    main()
