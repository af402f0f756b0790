"""Ablation timing of the bench config — one TPU claim, many variants.

Times 100-iteration windows of the real training scan under different
configurations to attribute the per-iteration cost.
"""

import copy
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def run_variant(label, datasets, make_prior, precision="highest",
                pallas="auto", iters=100, cycle_spin=True):
    import jax

    from jolideco_tpu import (
        FluxComponents,
        MAPDeconvolver,
        SpatialFluxComponent,
        config,
    )

    config.set_gmm_precision(precision)
    config.set_use_pallas(pallas)

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((1024, 1024), np.float32),
        prior=make_prior(cycle_spin),
    )

    deco = MAPDeconvolver(
        n_epochs=iters, learning_rate=0.1, display_progress=False,
        update_strategy="joint", scan_epochs=True, scan_chunk=iters,
        trace_every=0, seed=0,
    )

    # warm-up compiles the chunk; second run reuses it
    deco.run(datasets=datasets, components=copy.deepcopy(components))
    t0 = time.time()
    result = deco.run(datasets=datasets, components=components)
    np.asarray(result.components["flux"].flux_upsampled_numpy)
    per_iter = (time.time() - t0) / iters
    print(f"{label}: {per_iter*1e3:.1f} ms/iter "
          f"({1.0/per_iter:.1f} it/s)", flush=True)


def main():
    import jax

    print("devices:", jax.devices(), flush=True)

    from bench import make_bench_gmm, make_datasets
    from jolideco_tpu.priors import GMMPatchPrior, UniformPrior

    datasets = make_datasets(n_obs=10, size=1024)
    gmm = make_bench_gmm(k=200)

    def gmm_prior(cycle_spin):
        return GMMPatchPrior(gmm=gmm, cycle_spin=cycle_spin)

    def uniform_prior(cycle_spin):
        return UniformPrior()

    run_variant("uniform prior (poisson+adam only)  ", datasets,
                uniform_prior)
    run_variant("gmm scan HIGHEST                   ", datasets, gmm_prior,
                pallas="off")
    run_variant("gmm pallas HIGHEST                 ", datasets, gmm_prior,
                pallas="on")
    run_variant("gmm pallas DEFAULT (bf16)          ", datasets, gmm_prior,
                pallas="on", precision="default")
    run_variant("gmm scan HIGHEST, no cycle spin    ", datasets, gmm_prior,
                pallas="off", cycle_spin=False)


if __name__ == "__main__":
    main()
