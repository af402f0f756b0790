"""First steps with jolideco-tpu (counterpart of the reference's
``examples/first-steps.py``): deconvolve a simulated point source.

Run:  python examples/first_steps.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from jolideco_tpu import (  # noqa: E402
    FluxComponents,
    MAPDeconvolver,
    SpatialFluxComponent,
)
from jolideco_tpu.data import point_source_gauss_psf  # noqa: E402
from jolideco_tpu.priors import GMMPatchPrior, GaussianMixtureModel  # noqa: E402
from jolideco_tpu.utils.norms import MaxImageNorm  # noqa: E402


def main():
    from jolideco_tpu.config import enable_persistent_cache

    enable_persistent_cache()  # skip recompiles across invocations
    random_state = np.random.RandomState(642020)
    data = point_source_gauss_psf(random_state=random_state)

    datasets = {
        "obs-1": {
            key: data[key]
            for key in ("counts", "psf", "exposure", "background")
        }
    }

    gmm = GaussianMixtureModel.from_registry("zoran-weiss")
    prior = GMMPatchPrior(gmm=gmm, norm=MaxImageNorm(), stride=4)

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones(data["counts"].shape),
        upsampling_factor=2,
        prior=prior,
    )

    deco = MAPDeconvolver(n_epochs=500, learning_rate=0.1, beta=1.0)
    result = deco.run(datasets=datasets, components=components)

    print("final losses:", dict(result.trace_loss[-1]))
    result.write("first-steps-result.fits", overwrite=True)
    print("wrote first-steps-result.fits")


if __name__ == "__main__":
    main()
