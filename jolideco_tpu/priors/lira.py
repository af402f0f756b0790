"""LIRA-style Dirichlet multiscale prior.

The reference ships this as an incomplete stub (its ``__call__`` passes
a literal ``Ellipsis`` to ``Dirichlet.log_prob``, reference
``jolideco/priors/lira.py:37``, and never downsamples). This version
completes the evident intent: per multiscale level, split the image into
non-overlapping 2x2 blocks, normalise each block to proportions, score
those proportions under a symmetric Dirichlet with concentration
``alpha``, then downsample by summing 2x2 blocks and recurse.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.image import cycle_spin, sum_pool
from ..ops.patches import view_as_overlapping_patches
from ..utils.pytree import register_pytree
from .core import Prior

__all__ = ["LIRAPrior"]


def _dirichlet_logpdf(p, alpha):
    """Symmetric Dirichlet log-pdf, batched over rows of ``p``."""
    k = p.shape[-1]
    log_norm = jax.scipy.special.gammaln(k * alpha) - k * jax.scipy.special.gammaln(
        alpha
    )
    return log_norm + (alpha - 1.0) * jnp.sum(jnp.log(p), axis=-1)


class LIRAPrior(Prior):
    """Multiscale Dirichlet prior over 2x2 flux-split proportions.

    Parameters
    ----------
    alphas : sequence of float
        Dirichlet concentration per multiscale level (coarsest last).
    cycle_spin : bool
        Random roll before evaluation.
    """

    def __init__(self, alphas, cycle_spin=True, seed=0):
        super().__init__(seed=seed)
        self.alphas = tuple(float(a) for a in alphas)
        self.cycle_spin = bool(cycle_spin)

    def __call__(self, flux, params=None, key=None):
        if key is None:
            key = self.next_key()

        if self.cycle_spin:
            key, sub = jax.random.split(key)
            flux, _ = cycle_spin(sub, flux, patch_shape=(2, 2))

        log_prior = 0.0
        level_flux = flux
        for alpha in self.alphas:
            patches = view_as_overlapping_patches(level_flux, (2, 2), stride=2)
            totals = jnp.sum(patches, axis=1, keepdims=True)
            proportions = patches / jnp.maximum(totals, 1e-25)
            values = _dirichlet_logpdf(
                jnp.maximum(proportions, 1e-25), jnp.float32(alpha)
            )
            log_prior = log_prior + jnp.sum(values) / flux.size
            level_flux = sum_pool(level_flux, 2)

        return log_prior

    def to_dict(self):
        data = super().to_dict()
        data["alphas"] = list(self.alphas)
        data["cycle_spin"] = bool(self.cycle_spin)
        return data


register_pytree(
    LIRAPrior,
    children_attrs=(),
    aux_attrs=("alphas", "cycle_spin"),
    defaults={"_key": None},
)
