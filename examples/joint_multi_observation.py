"""Joint multi-observation deconvolution with calibrations and
observation sharding (counterpart of the reference's Chandra E0102
example shape: many observations, per-observation PSF/exposure/
background, shared flux component, position calibrations).

Run:  python examples/joint_multi_observation.py
"""

import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))

from jolideco_tpu import (  # noqa: E402
    FluxComponents,
    MAPDeconvolver,
    NPredCalibration,
    NPredCalibrations,
    SpatialFluxComponent,
)
from jolideco_tpu.data import gauss_and_point_sources_gauss_psf  # noqa: E402
from jolideco_tpu.parallel import make_obs_mesh  # noqa: E402
from jolideco_tpu.priors import GMMPatchPrior  # noqa: E402


def main():
    from jolideco_tpu.config import enable_persistent_cache

    enable_persistent_cache()  # skip recompiles across invocations
    random_state = np.random.RandomState(642020)

    n_obs = 8
    datasets = {
        f"obs-{idx}": gauss_and_point_sources_gauss_psf(
            random_state=random_state
        )
        for idx in range(n_obs)
    }

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_flux_init_datasets(
        list(datasets.values()), upsampling_factor=2, prior=GMMPatchPrior()
    )

    calibrations = NPredCalibrations()
    for name in datasets:
        calibrations[name] = NPredCalibration()

    # one joint Adam step per epoch over all observations, sharded over
    # every available device
    deco = MAPDeconvolver(
        n_epochs=250,
        learning_rate=0.1,
        update_strategy="joint",
        mesh=make_obs_mesh(),
    )
    result = deco.run(
        datasets=datasets, components=components, calibrations=calibrations
    )

    print("final losses:", dict(result.trace_loss[-1]))
    for name, calibration in result.calibrations.items():
        print(name, calibration.to_dict())


if __name__ == "__main__":
    main()
