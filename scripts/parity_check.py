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


def torch_mirror_full(datasets, flux_init, bg_flux, n_epochs, lr, factor=2):
    """Faithful torch mirror of the BASELINE config 3-5 shape: x2
    upsampled trained component + frozen flat component, per-obs
    trainable sub-pixel shift and background norm, joint Adam steps.

    Mirrors the reference semantics (``models/npred.py:160-191``,
    shift ``:383-398``, upsampling ``:96-106``) independently of the
    JAX implementation.
    """
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
        start = [(shape[i] - image.shape[2 + i]) // 2 for i in range(2)]
        return result[
            ...,
            start[0] : start[0] + image.shape[2],
            start[1] : start[1] + image.shape[3],
        ]

    def shift_bilinear(image, sx, sy, scale):
        # out[y, x] = in[y + scale*sy, x + scale*sx], zeros outside —
        # pixel-space equivalent of the reference's affine_grid +
        # grid_sample(align_corners=False) (utils/torch.py:196-223)
        h, w = image.shape[-2:]
        rows = torch.arange(h, dtype=image.dtype) + scale * sy
        cols = torch.arange(w, dtype=image.dtype) + scale * sx
        r0 = torch.floor(rows).long()
        c0 = torch.floor(cols).long()
        fr = (rows - r0.to(image.dtype))[:, None]
        fc = (cols - c0.to(image.dtype))[None, :]

        def take(rr, cc):
            valid = (
                (rr >= 0)[:, None] & (rr < h)[:, None]
                & (cc >= 0)[None, :] & (cc < w)[None, :]
            )
            rr = rr.clamp(0, h - 1)
            cc = cc.clamp(0, w - 1)
            return image[..., rr, :][..., :, cc] * valid

        out = (
            take(r0, c0) * (1 - fr) * (1 - fc)
            + take(r0 + 1, c0) * fr * (1 - fc)
            + take(r0, c0 + 1) * (1 - fr) * fc
            + take(r0 + 1, c0 + 1) * fr * fc
        )
        return out

    up = torch.from_numpy(flux_init[None, None].astype(np.float32))
    up = F.interpolate(up, scale_factor=factor, mode="bilinear",
                       align_corners=False)
    log_flux = torch.nn.Parameter(torch.log(up))

    bg_up = torch.from_numpy(bg_flux[None, None].astype(np.float32))
    bg_up = F.interpolate(bg_up, scale_factor=factor, mode="bilinear",
                          align_corners=False)
    log_bg = torch.log(bg_up)  # frozen: not a Parameter

    n = len(datasets)
    shifts = torch.nn.Parameter(torch.zeros((n, 2)))
    log_norms = torch.nn.Parameter(torch.zeros((n,)))

    optimizer = torch.optim.Adam([log_flux, shifts, log_norms], lr=lr)
    loss_fn = torch.nn.PoissonNLLLoss(
        log_input=False, reduction="mean", eps=1e-25, full=True
    )

    prepared = []
    for dataset in datasets.values():
        exposure = torch.from_numpy(dataset["exposure"][None, None])
        psf = torch.from_numpy(dataset["psf"][None, None])
        exposure = F.interpolate(exposure, scale_factor=factor,
                                 mode="bilinear", align_corners=False)
        psf = F.interpolate(psf, scale_factor=factor, mode="bilinear",
                            align_corners=False) / factor**2
        weights = convolve_fft_torch(torch.ones_like(exposure), psf)
        exposure = exposure / weights
        background = torch.from_numpy(dataset["background"][None, None])
        counts = torch.from_numpy(dataset["counts"][None, None])
        prepared.append((exposure, psf, background, counts))

    for _ in range(n_epochs):
        optimizer.zero_grad()
        total = 0.0
        for i, (exposure, psf, background, counts) in enumerate(prepared):
            npred = torch.zeros_like(background)
            for comp_log_flux in (log_flux, log_bg):
                x = torch.exp(comp_log_flux)
                x = shift_bilinear(x, shifts[i, 0], shifts[i, 1], factor)
                x = x * exposure
                x = convolve_fft_torch(x, psf)
                x = F.avg_pool2d(x, kernel_size=factor, divisor_override=1)
                npred = npred + torch.clip(x, 0, torch.inf)
            npred = npred + background * torch.exp(log_norms[i])
            total = total + loss_fn(npred, counts)
        total.backward()
        optimizer.step()

    return (
        torch.exp(log_flux).detach().numpy()[0, 0],
        shifts.detach().numpy(),
        log_norms.detach().numpy(),
    )


def run_full_config(args):
    from jolideco_tpu import (
        FluxComponents,
        MAPDeconvolver,
        NPredCalibration,
        NPredCalibrations,
        SpatialFluxComponent,
    )
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf
    from jolideco_tpu.priors import UniformPrior

    rs = np.random.RandomState(642020)
    datasets = {
        f"obs-{i}": gauss_and_point_sources_gauss_psf(
            shape=(args.size, args.size), random_state=rs
        )
        for i in range(args.n_obs)
    }
    flux_init = rs.gamma(20, size=(args.size, args.size)).astype(np.float32)
    bg_flux = np.full((args.size, args.size), 0.5, np.float32)

    flux_torch, shifts_torch, log_norms_torch = torch_mirror_full(
        datasets, flux_init, bg_flux, n_epochs=args.iters, lr=0.1
    )

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=flux_init, prior=UniformPrior(), upsampling_factor=2
    )
    components["bg"] = SpatialFluxComponent.from_numpy(
        flux=bg_flux, prior=UniformPrior(), upsampling_factor=2, frozen=True
    )
    for dataset in datasets.values():
        psf = dataset["psf"]
        dataset["psf"] = {"flux": psf, "bg": psf}

    calibrations = NPredCalibrations()
    for name in datasets:
        calibrations[name] = NPredCalibration(background_norm=1.0)

    deco = MAPDeconvolver(
        n_epochs=args.iters, learning_rate=0.1, display_progress=False,
        update_strategy="joint", scan_epochs=True, trace_every=0,
    )
    result = deco.run(
        datasets=datasets, components=components, calibrations=calibrations
    )
    flux_jax = result.components["flux"].flux_upsampled_numpy

    denom = np.maximum(np.abs(flux_torch), 1e-6)
    rel = np.abs(flux_jax - flux_torch) / denom
    print(
        f"FULL-config flux-map parity vs torch mirror ({args.n_obs} obs "
        f"{args.size}^2 x2 upsampling, frozen bg component, per-obs "
        f"shift+norm calibrations, {args.iters} joint Adam iters):"
    )
    print(f"  max |rel|    : {rel.max():.2e}")
    print(f"  mean |rel|   : {rel.mean():.2e}")
    print(f"  99th pct     : {np.percentile(rel, 99):.2e}")
    shift_err = []
    norm_err = []
    for i, name in enumerate(datasets):
        cal = result.calibrations[name]
        shift_err.append(
            np.abs(np.asarray(cal.shift_xy).reshape(2) - shifts_torch[i])
        )
        norm_err.append(
            abs(float(np.log(np.asarray(cal.background_norm)).reshape(()))
                - log_norms_torch[i])
        )
    print(f"  max shift param |diff| : {np.max(shift_err):.2e} px")
    print(f"  max log-norm |diff|    : {np.max(norm_err):.2e}")


def main():
    # parity is a CPU-vs-CPU comparison; force the CPU backend before
    # any jax backend initialisation (plain JAX_PLATFORMS env vars are
    # overridden by the TPU plugin on tunnel-attached machines)
    import jax

    jax.config.update("jax_platforms", "cpu")

    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=64)
    parser.add_argument("--n-obs", type=int, default=5)
    parser.add_argument("--iters", type=int, default=300)
    parser.add_argument("--config", default="basic",
                        choices=["basic", "full"],
                        help="basic: shared flux, sequential steps; "
                             "full: x2 upsampling + frozen component + "
                             "calibrations, joint steps")
    args = parser.parse_args()

    if args.config == "full":
        run_full_config(args)
        return

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
