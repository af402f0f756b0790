"""Decompose the bench-config iteration cost on the TPU.

Times each stage of the joint training step at benchmark scale
(10 obs, 1024^2, K=200 GMM): stacked Poisson forward/gradient, patch
extraction, GMM prior, full loss gradient, Adam update.
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def timeit(fn, args, label, iters=10):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    per = (time.time() - t0) / iters
    print(f"{label}: {per*1e3:.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp
    import optax

    print("devices:", jax.devices(), flush=True)

    from bench import make_bench_gmm, make_datasets
    from jolideco_tpu import FluxComponents, SpatialFluxComponent
    from jolideco_tpu.loss import PriorLoss
    from jolideco_tpu.parallel import StackedPoissonLoss
    from jolideco_tpu.priors import GMMPatchPrior

    datasets = make_datasets(n_obs=10, size=1024)
    gmm = make_bench_gmm(k=200)

    components = FluxComponents()
    components["flux"] = SpatialFluxComponent.from_numpy(
        flux=np.ones((1024, 1024), np.float32),
        prior=GMMPatchPrior(gmm=gmm, cycle_spin=True),
    )
    poisson = StackedPoissonLoss.from_datasets(
        datasets=datasets, components=components
    )
    prior_loss = PriorLoss(priors=components.priors)
    params = {"components": components.parameters()}
    key = jax.random.PRNGKey(0)

    # 1. stacked Poisson forward
    @jax.jit
    def poisson_fwd(poisson, components, params):
        fluxes = components.fluxes_from(params["components"])
        return poisson.evaluate(fluxes).sum()

    timeit(poisson_fwd, (poisson, components, params), "poisson fwd      ")

    # 2. stacked Poisson grad
    @jax.jit
    def poisson_grad(poisson, components, params):
        return jax.grad(
            lambda p: poisson_fwd_inner(poisson, components, p)
        )(params)

    def poisson_fwd_inner(poisson, components, params):
        fluxes = components.fluxes_from(params["components"])
        return poisson.evaluate(fluxes).sum()

    timeit(poisson_grad, (poisson, components, params), "poisson grad     ")

    # 3. patch extraction alone (conv formulation + its gradient)
    from jolideco_tpu.ops.patches import (
        extract_patches_at,
        view_as_overlapping_patches,
    )

    flux_img = jnp.ones((1, 1, 1024, 1024), jnp.float32)

    @jax.jit
    def patches_only(img):
        return view_as_overlapping_patches(img, (8, 8), 4).sum()

    timeit(patches_only, (flux_img,), "patch extract conv")

    timeit(jax.jit(jax.grad(lambda im: patches_only(im))), (flux_img,),
           "patch extract grad")

    iy = jnp.asarray(
        np.repeat(np.arange(0, 1017, 4), 255), jnp.int32
    )
    ix = jnp.asarray(np.tile(np.arange(0, 1017, 4), 255), jnp.int32)

    @jax.jit
    def patches_gather(img):
        return extract_patches_at(img[0, 0], iy, ix, (8, 8)).sum()

    timeit(patches_gather, (flux_img,), "patch extract gthr")

    # 4. GMM prior fwd / grad
    @jax.jit
    def prior_fwd(components, params, key):
        fluxes = components.fluxes_from(params["components"])
        return prior_loss_inner(components, fluxes, params, key)

    def prior_loss_inner(components, fluxes, params, key):
        pl = PriorLoss(priors=components.priors)
        return pl(fluxes, params=params["components"], key=key)

    timeit(prior_fwd, (components, params, key), "gmm prior fwd    ")

    @jax.jit
    def prior_grad(components, params, key):
        return jax.grad(
            lambda p: prior_fwd_inner(components, p, key)
        )(params)

    def prior_fwd_inner(components, params, key):
        fluxes = components.fluxes_from(params["components"])
        return prior_loss_inner(components, fluxes, params, key)

    timeit(prior_grad, (components, params, key), "gmm prior grad   ")

    # 5. full joint loss grad + Adam update
    tx = optax.adam(0.1)
    opt_state = tx.init(params)

    def loss_joint(params, poisson, components, key):
        fluxes = components.fluxes_from(params["components"])
        losses = poisson.evaluate(fluxes)
        lp = PriorLoss(priors=components.priors)(
            fluxes, params=params["components"], key=key
        )
        return jnp.sum(losses) - lp

    @jax.jit
    def step(params, opt_state, poisson, components, key):
        grads = jax.grad(loss_joint)(params, poisson, components, key)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state

    timeit(step, (params, opt_state, poisson, components, key),
           "full train step  ")

    # 6. Adam update alone
    @jax.jit
    def adam_only(params, opt_state):
        grads = jax.tree_util.tree_map(jnp.ones_like, params)
        updates, opt_state = tx.update(grads, opt_state, params)
        return optax.apply_updates(params, updates)

    timeit(adam_only, (params, opt_state), "adam update      ")

    # 7. FFT conv alone (one obs)
    from jolideco_tpu.ops.fft import convolve_fft_precomputed

    kft = poisson.psf_ffts["flux"][0]
    fshape = poisson.fft_shape

    @jax.jit
    def conv_one(img, kft):
        return convolve_fft_precomputed(img, kft, fshape).sum()

    timeit(conv_one, (flux_img, kft), "fft conv (1 obs) ")


if __name__ == "__main__":
    main()
