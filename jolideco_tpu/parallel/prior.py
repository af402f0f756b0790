"""Mesh-partitioned prior evaluation.

The stacked Poisson side partitions over the ``obs`` (and optionally
``row``) mesh axes by sharding its data arrays and letting GSPMD do
the rest. The flagship GMM patch prior is different: it is a function
of the (replicated) latent flux alone, so plain GSPMD replicates its
entire patch-scoring work on every device — round-4 profiling put the
fused prior at ~40% of the benchmark step, an ~2.2x Amdahl cap on an
8-chip mesh (docs/performance.md).

This module partitions the prior's *work* instead: under
``jax.shard_map`` every device evaluates
``Prior.shard_partial(flux, ..., n_shards, shard_index)`` — for the
GMM patch prior a disjoint contiguous strip block of the fused patch
enumeration (``ops.gmm_fused.gmm_score_fused_partial_sum``), for
priors without a partitioned form the exact ``value / n_shards`` —
and one ``psum`` over all mesh axes restores the scalar. The PRNG key
stays replicated, so cycle spins/jitter draws are identical on every
shard and ``psum(partials) == unsharded value`` to f32 summation
noise, for values AND gradients (the backward of the replicated-input
``shard_map`` sums the per-shard strip gradients).

No reference counterpart (the reference is single-device); blueprint:
SURVEY.md §5 "patch-dimension blocking … spatially-sharded" row.
"""

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import PartitionSpec as P

__all__ = ["sharded_prior_fn"]


def sharded_prior_fn(mesh):
    """Build ``fn(prior_loss, fluxes, params, key) -> scalar``.

    The summed log-prior of ``loss.PriorLoss``, with each prior's work
    partitioned over *every* device of ``mesh`` (all axes flattened
    into one shard index; the GMM patch prior's strip blocks don't
    care which mesh axis a device sits on). Inputs are replicated
    (``P()``); the output psum makes the scalar replicated again, so
    the call is a drop-in for ``prior_loss(fluxes, params, key)``
    inside a jitted loss on this mesh.
    """
    axis_names = tuple(mesh.axis_names)
    sizes = tuple(int(mesh.shape[name]) for name in axis_names)
    n_shards = int(np.prod(sizes))

    def body(prior_loss, fluxes, params, key):
        index = lax.axis_index(axis_names[0])
        for name in axis_names[1:]:
            index = index * mesh.shape[name] + lax.axis_index(name)
        values = prior_loss.evaluate_sharded(
            fluxes, params=params, key=key,
            n_shards=n_shards, shard_index=index,
        )
        total = sum(values) if values else jnp.float32(0.0)
        return lax.psum(total, axis_names)

    sharded = jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )

    def fn(prior_loss, fluxes, params=None, key=None):
        if key is None:
            raise ValueError(
                "sharded_prior_fn requires an explicit PRNG key (the "
                "key must be identical on every shard)"
            )
        return sharded(prior_loss, fluxes, params, key)

    return fn
