"""One-off: time compute_error (Hessian probe) at benchmark scale.

Builds the bench problem (10 obs, 1024^2, K=200 GMM) and times
``TotalLoss.fluxes_error`` — the reference's flux-error feature
(``jolideco/loss.py:263-279``) — in MAP and marginalise reductions.
The probe re-traces with the patch-level Pallas kernels (the fused
image scorer is custom_vjp-only), so this measures the staged-fallback
path a real ``MAPDeconvolver(compute_error=True)`` run takes.

    python scripts/tpu_error_probe.py [--size 1024] [--marginalize]
"""

import argparse
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--n-obs", type=int, default=10)
    parser.add_argument("--marginalize", action="store_true")
    parser.add_argument("--precision", default="high",
                        choices=["highest", "high", "default"])
    args = parser.parse_args()

    from bench import make_bench_gmm, make_datasets
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu import config as jt_config
    from jolideco_tpu.loss import PriorLoss, TotalLoss
    from jolideco_tpu.parallel import StackedPoissonLoss
    from jolideco_tpu.priors import GMMPatchPrior

    jt_config.set_gmm_precision(args.precision)

    datasets = make_datasets(n_obs=args.n_obs, size=args.size)
    gmm = make_bench_gmm(k=200)
    prior = GMMPatchPrior(gmm=gmm, stride=4, cycle_spin=False,
                          marginalize=args.marginalize)
    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((args.size, args.size), np.float32), prior=prior
    )

    poisson = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    total = TotalLoss(
        poisson_loss=poisson,
        prior_loss=PriorLoss(priors=components.priors),
        beta=1.0,
    )
    fluxes = components.to_flux_tuple()

    t0 = time.time()
    errors = total.fluxes_error(fluxes=fluxes)
    err = np.asarray(errors["flux"])
    t_first = time.time() - t0
    t0 = time.time()
    errors = total.fluxes_error(fluxes=fluxes)
    err = np.asarray(errors["flux"])
    t_second = time.time() - t0

    assert np.isfinite(err).all(), "non-finite flux errors"
    mode = "marginalise" if args.marginalize else "MAP"
    print(
        f"compute_error OK [{mode}, {args.precision}] "
        f"{args.n_obs}x{args.size}^2: first {t_first:.1f}s "
        f"(incl. compile), repeat {t_second:.2f}s; "
        f"err range [{err.min():.3g}, {err.max():.3g}]"
    )


if __name__ == "__main__":
    main()
