"""Fit a sparse point-source list jointly with a diffuse component.

Demonstrates `SparseSpatialFluxComponent` (trainable per-source flux
and sub-pixel positions) combined with a dense diffuse component, as in
the reference's sparse-component workflow.

Run:  python examples/sparse_point_sources.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from jolideco_tpu import (  # noqa: E402
    FluxComponents,
    MAPDeconvolver,
    SparseSpatialFluxComponent,
    SpatialFluxComponent,
)
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf  # noqa: E402
from jolideco_tpu.priors import SmoothnessPrior, UniformPrior  # noqa: E402


def main():
    from jolideco_tpu.config import enable_persistent_cache

    enable_persistent_cache()  # skip recompiles across invocations
    random_state = np.random.RandomState(642020)
    data = gauss_and_point_sources_gauss_psf(random_state=random_state)
    dataset = {
        key: data[key]
        for key in ("counts", "psf", "exposure", "background")
    }
    # per-component PSFs (same instrument response here)
    dataset["psf"] = {"diffuse": dataset["psf"], "points": dataset["psf"]}

    components = FluxComponents()
    components["diffuse"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((32, 32)),
        prior=SmoothnessPrior(width=2),
    )
    # initial guesses near the four injected point sources
    # NOTE: parametric sparsity priors (inverse-gamma/exponential) act
    # on strictly-positive flux images; the splatted sparse image
    # contains exact zeros, so keep the prior flat here.
    components["points"] = SparseSpatialFluxComponent.from_numpy(
        flux=np.array([500.0, 200.0, 80.0, 30.0]),
        x_pos=np.array([16.0, 16.0, 26.0, 6.0]) + 0.5,
        y_pos=np.array([26.0, 6.0, 16.0, 16.0]) - 0.5,
        shape=(32, 32),
        prior=UniformPrior(),
    )

    deco = MAPDeconvolver(n_epochs=500, learning_rate=0.05, beta=1e-3)
    result = deco.run(datasets={"obs": dataset}, components=components)

    points = result.components["points"]
    print("fitted positions (x, y) and fluxes:")
    for x, y, f in zip(
        points.x_pos_numpy, points.y_pos_numpy, points.flux_values_numpy
    ):
        print(f"  ({x:6.2f}, {y:6.2f})  flux {f:8.1f}")
    print("final losses:", dict(result.trace_loss[-1]))


if __name__ == "__main__":
    main()
