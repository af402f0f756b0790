"""Mesh-partitioned GMM patch prior (parallel/prior.py).

Round-4 verdict item #1: the flagship prior replicated its full
patch-scoring work on every device. These tests pin, on the 8-virtual-
CPU-device mesh, that the shard_map-partitioned evaluation equals the
unsharded one — values AND gradients — for the fused strip-block path,
the non-fused fallback, the MultiScale wrapper (mixed fused/fallback
levels), and end-to-end training through MAPDeconvolver.
"""

import copy

import numpy as np
import pytest
from numpy.testing import assert_allclose

import jax
import jax.numpy as jnp

from jolideco_tpu import (
    FluxComponents,
    MAPDeconvolver,
    SpatialFluxComponent,
    UniformPrior,
)
from jolideco_tpu.config import force_pallas
from jolideco_tpu.loss import PriorLoss
from jolideco_tpu.parallel import make_obs_mesh, sharded_prior_fn
from jolideco_tpu.priors import (
    GaussianMixtureModel,
    GMMPatchPrior,
    MultiScalePrior,
)


@pytest.fixture(scope="module")
def gmm():
    return GaussianMixtureModel.from_registry("builtin-8x8-v1")


def _mesh():
    return make_obs_mesh(n_devices=8)


def _flux(h, w, seed=0):
    rng = np.random.RandomState(seed)
    return jnp.asarray(rng.uniform(0.1, 2.0, (1, 1, h, w)), jnp.float32)


def _compare_sharded(priors, fluxes, params=None, rtol=1e-6, atol=0.0):
    """Sharded-vs-unsharded value and gradient comparison."""
    prior_loss = PriorLoss(priors=priors)
    mesh = _mesh()
    fn = sharded_prior_fn(mesh)
    key = jax.random.PRNGKey(42)

    def unsharded(fluxes, params):
        return prior_loss(fluxes, params=params, key=key)

    def sharded(fluxes, params):
        return fn(prior_loss, fluxes, params=params, key=key)

    v0 = float(jax.jit(unsharded)(fluxes, params))
    v1 = float(jax.jit(sharded)(fluxes, params))
    assert_allclose(v1, v0, rtol=rtol, atol=atol)

    g0 = jax.jit(jax.grad(unsharded))(fluxes, params)
    g1 = jax.jit(jax.grad(sharded))(fluxes, params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)
    ):
        scale = float(jnp.max(jnp.abs(b))) + 1e-30
        assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-6
        )
    return v0


@pytest.mark.parametrize("shape", [(128, 128), (136, 256)])
def test_sharded_gmm_prior_matches_unsharded(gmm, shape):
    """Fused strip-block partitioning: 8 shards, value and grad == the
    unsharded fused evaluation at 1e-6 (includes a strip count that
    does NOT divide 8, exercising the shard padding)."""
    prior = GMMPatchPrior(gmm=gmm, stride=4, cycle_spin=True)
    with force_pallas("interpret"):
        assert prior._fused_ok((1, 1) + shape)
        _compare_sharded({"flux": prior}, (_flux(*shape),))


def test_sharded_prior_fallback_path_matches(gmm):
    """Non-fused configurations (jitter) fall back to value/n_shards
    per shard — still exactly equal after the psum."""
    prior = GMMPatchPrior(gmm=gmm, stride=4, cycle_spin=True, jitter=True)
    with force_pallas("interpret"):
        assert not prior._fused_ok((1, 1, 128, 128))
        _compare_sharded({"flux": prior}, (_flux(128, 128),), rtol=1e-6)


def test_sharded_mixed_priors_match(gmm):
    """GMM (partitioned) + uniform (replicated fallback) components."""
    priors = {
        "a": GMMPatchPrior(gmm=gmm, stride=4),
        "b": UniformPrior(),
    }
    fluxes = (_flux(128, 128, seed=1), _flux(64, 64, seed=2))
    with force_pallas("interpret"):
        _compare_sharded(priors, fluxes)


def test_sharded_multiscale_prior_matches(gmm):
    """MultiScale wrapper: level 0 (128 px) partitions through the
    fused strip blocks, level 1 (64 px, below the fused width floor)
    through the replicated fallback — the mix still matches."""
    prior = MultiScalePrior(
        prior=GMMPatchPrior(gmm=gmm, stride=4), n_levels=2
    )
    with force_pallas("interpret"):
        _compare_sharded({"flux": prior}, (_flux(128, 128),))


def test_sharded_prior_with_learnable_norm_params(gmm):
    """Gradients w.r.t. prior hyper-parameters (learnable norm) flow
    through the shard_map identically."""
    from jolideco_tpu.utils.norms import ASinhImageNorm

    prior = GMMPatchPrior(gmm=gmm, stride=4, norm=ASinhImageNorm())
    prior_loss = PriorLoss(priors={"flux": prior})
    mesh = _mesh()
    fn = sharded_prior_fn(mesh)
    key = jax.random.PRNGKey(3)
    fluxes = (_flux(128, 128),)
    params = {"flux": {"prior": prior.parameters()}}
    assert params["flux"]["prior"], "norm must expose learnable params"

    with force_pallas("interpret"):
        g0 = jax.jit(jax.grad(
            lambda p: prior_loss(fluxes, params=p, key=key)
        ))(params)
        g1 = jax.jit(jax.grad(
            lambda p: fn(prior_loss, fluxes, params=p, key=key)
        ))(params)
    for a, b in zip(
        jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g0)
    ):
        assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-8)


def test_deconvolver_shard_prior_end_to_end(gmm):
    """MAPDeconvolver joint training on the obs mesh with the prior
    partitioned reproduces the unpartitioned mesh run."""
    from jolideco_tpu.data import gauss_and_point_sources_gauss_psf

    rs = np.random.RandomState(642020)
    datasets = {}
    for i in range(8):
        d = gauss_and_point_sources_gauss_psf(
            shape=(128, 128), random_state=rs
        )
        datasets[f"obs-{i}"] = d

    flux_init = rs.gamma(20, size=(128, 128))

    def run(shard_prior):
        components = FluxComponents()
        components["flux"] = SpatialFluxComponent.from_numpy(
            flux=flux_init.copy(),
            prior=GMMPatchPrior(gmm=gmm, stride=4),
        )
        deco = MAPDeconvolver(
            n_epochs=3, learning_rate=0.05, display_progress=False,
            update_strategy="joint", scan_epochs=True, seed=11,
            mesh=_mesh(), shard_prior=shard_prior, trace_every=0,
        )
        with force_pallas("interpret"):
            result = deco.run(
                datasets=datasets, components=components
            )
        assert result.config["shard_prior"] is shard_prior
        return result.components["flux"].flux_upsampled_numpy

    flux_sharded = run(True)
    flux_replicated = run(False)
    assert_allclose(flux_sharded, flux_replicated, rtol=1e-4, atol=1e-6)
