"""Prior base class and parametric priors.

Functional JAX re-design of the reference's ``jolideco/priors/core.py``:
priors are registered pytrees (buffers traced, config static) whose
``__call__(flux, params=None, key=None)`` is pure and traceable — PRNG
randomness (cycle spins) comes from explicit keys threaded by the
training loop instead of stateful generators, and learnable
hyper-parameters are exposed through ``parameters()`` /
``set_parameters()`` so they can live in the optimised pytree.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ..ops.fft import convolve_fft
from ..ops.image import cycle_spin_subpixel
from ..utils.kernels import gaussian_kernel_2d
from ..utils.misc import format_class_str
from ..utils.pytree import register_pytree

__all__ = [
    "Prior",
    "Priors",
    "UniformPrior",
    "ImagePrior",
    "SmoothnessPrior",
    "InverseGammaPrior",
    "ExponentialPrior",
]


class Prior:
    """Prior base class.

    Subclasses implement ``__call__(flux, params=None, key=None)``
    returning the scalar log-prior of one flux component. Eager calls
    (no explicit key) draw from a host-side key that advances per call,
    mimicking the reference's stateful generators; jitted training
    threads keys explicitly.
    """

    def __init__(self, seed=0):
        self._key = jax.random.PRNGKey(seed)

    def next_key(self):
        """Advance and return the host-side PRNG key.

        Eager calls advance the stored key per call (mimicking the
        reference's stateful generators). When tracing (e.g. the jitted
        Hessian probe is handed ``key=None``), the advanced key would be
        a tracer — storing it on ``self`` leaks it out of the trace, so
        the stored key is left untouched and every call in that trace
        derives from the same concrete key (jitted training paths
        thread keys explicitly instead).
        """
        if not hasattr(self, "_key") or self._key is None:
            self._key = jax.random.PRNGKey(0)
        key, sub = jax.random.split(self._key)
        if not isinstance(key, jax.core.Tracer):
            self._key = key
        return sub

    def shard_partial(self, flux, params=None, key=None, n_shards=1,
                      shard_index=0):
        """This shard's additive contribution to the scalar log-prior.

        Contract: summed over ``shard_index = 0..n_shards-1`` (all
        called with the SAME ``key``) this equals ``__call__``.
        ``shard_index`` may be a traced integer (``lax.axis_index``
        inside ``shard_map`` — see ``parallel.prior``). Default: the
        exact full value divided by ``n_shards`` (compute replicated,
        not partitioned); priors that can partition their work
        override this (``GMMPatchPrior`` scores a disjoint strip block
        of the patch enumeration per shard).
        """
        del shard_index
        return self(flux=flux, params=params, key=key) / n_shards

    def second_order_ok(self, flux_shape):
        """Whether forward-over-reverse (jvp-of-grad) traces through
        this prior for a flux of ``flux_shape`` under the current
        dispatch config.

        The Hessian probe (``TotalLoss.hessian_diagonals``) consults
        this capability instead of catching trace-time ``TypeError``
        text from JAX. Default: plain priors are ordinary JAX code and
        support second order.
        """
        return True

    def parameters(self):
        """Trainable hyper-parameters (dict of arrays); default none."""
        return {}

    def set_parameters(self, params):
        """Write back trained hyper-parameters."""

    def to_dict(self):
        """Serialise; the registry name goes in ``type``."""
        from . import PRIOR_REGISTRY

        data = {}
        for name, cls in PRIOR_REGISTRY.items():
            if isinstance(self, cls):
                data["type"] = name
                break
        return data

    @classmethod
    def from_dict(cls, data):
        """Registry-dispatched deserialisation."""
        from . import PRIOR_REGISTRY

        kwargs = data.copy()
        if "type" in data:
            type_ = kwargs.pop("type")
            cls = PRIOR_REGISTRY[type_]
            return cls.from_dict(data=kwargs)
        return cls(**kwargs)

    def __str__(self):
        return format_class_str(instance=self)


class Priors(dict):
    """Named collection of priors (dict of component name -> prior)."""

    def __call__(self, fluxes, params=None, keys=None):
        """Sum of all priors evaluated on the matching flux tuple."""
        value = 0
        for idx, (name, prior) in enumerate(self.items()):
            prior_params = None if params is None else params.get(name)
            key = None if keys is None else keys[idx]
            value = value + prior(flux=fluxes[idx], params=prior_params, key=key)
        return value


jax.tree_util.register_pytree_node(
    Priors,
    lambda obj: (tuple(obj.values()), tuple(obj.keys())),
    lambda names, children: Priors(zip(names, children)),
)


class UniformPrior(Prior):
    """Flat prior: log-prior identically zero."""

    def __init__(self):
        super().__init__()

    def __call__(self, flux, params=None, key=None):
        return jnp.float32(0.0)


register_pytree(UniformPrior, children_attrs=(), defaults={"_key": None})


class InverseGammaPrior(Prior):
    """Sparsity prior: product of inverse-Gamma distributions.

    ``log p = mean(-beta/x - (alpha+1) log x) + alpha log beta -
    lgamma(alpha)`` (reference ``priors/core.py:132-240``).
    """

    def __init__(self, alpha=10, beta=3 / 2, cycle_spin_subpix=False, seed=0):
        super().__init__(seed=seed)
        self.alpha = jnp.asarray([float(alpha)], jnp.float32)
        self.beta = jnp.asarray([float(beta)], jnp.float32)
        self.cycle_spin_subpix = bool(cycle_spin_subpix)

    @property
    def mean(self):
        """Distribution mean."""
        return self.beta / (self.alpha - 1)

    @property
    def mode(self):
        """Distribution mode."""
        return self.beta / (self.alpha + 1)

    @property
    def log_constant_term(self):
        """alpha log beta - lgamma(alpha)."""
        value = self.alpha * jnp.log(self.beta)
        value -= jax.scipy.special.gammaln(self.alpha)
        return value.reshape(())

    def __call__(self, flux, params=None, key=None):
        if self.cycle_spin_subpix:
            key = key if key is not None else self.next_key()
            flux = cycle_spin_subpixel(key, flux)

        value = -self.beta.reshape(()) / flux
        value += (-self.alpha.reshape(()) - 1) * jnp.log(flux)
        return jnp.sum(value) / flux.size + self.log_constant_term

    def to_dict(self):
        data = super().to_dict()
        data["alpha"] = float(self.alpha[0])
        data["beta"] = float(self.beta[0])
        data["cycle_spin_subpix"] = bool(self.cycle_spin_subpix)
        return data


register_pytree(
    InverseGammaPrior,
    children_attrs=("alpha", "beta"),
    aux_attrs=("cycle_spin_subpix",),
    defaults={"_key": None},
)


class ExponentialPrior(Prior):
    """Sparsity prior: product of exponential distributions."""

    def __init__(self, alpha=10, cycle_spin_subpix=False, seed=0):
        super().__init__(seed=seed)
        self.alpha = jnp.asarray([float(alpha)], jnp.float32)
        self.cycle_spin_subpix = bool(cycle_spin_subpix)

    @property
    def mean(self):
        """Distribution mean."""
        return 1 / self.alpha

    @property
    def mode(self):
        """Distribution mode."""
        return 0

    @property
    def log_constant_term(self):
        """log alpha."""
        return jnp.log(self.alpha).reshape(())

    def __call__(self, flux, params=None, key=None):
        if self.cycle_spin_subpix:
            key = key if key is not None else self.next_key()
            flux = cycle_spin_subpixel(key, flux)

        value = -self.alpha.reshape(()) * flux
        return jnp.sum(value) / flux.size + self.log_constant_term

    def to_dict(self):
        data = super().to_dict()
        data["alpha"] = float(self.alpha[0])
        data["cycle_spin_subpix"] = bool(self.cycle_spin_subpix)
        return data


register_pytree(
    ExponentialPrior,
    children_attrs=("alpha",),
    aux_attrs=("cycle_spin_subpix",),
    defaults={"_key": None},
)


class ImagePrior(Prior):
    """Gaussian prior towards a given flux image.

    ``log p = -0.5 * mean(((flux - flux_prior) / flux_prior_error)**2)``.

    The reference's version (``priors/core.py:342-370``) returns the
    raw per-pixel chi-square array and is marked "not fully supported";
    here the proper scalar log-prior is returned.
    """

    def __init__(self, flux_prior, flux_prior_error=None):
        super().__init__()
        self.flux_prior = jnp.asarray(flux_prior, jnp.float32)
        if flux_prior_error is None:
            flux_prior_error = jnp.ones_like(self.flux_prior)
        self.flux_prior_error = jnp.asarray(flux_prior_error, jnp.float32)

    def __call__(self, flux, params=None, key=None):
        chi2 = ((flux - self.flux_prior) / self.flux_prior_error) ** 2
        return -0.5 * jnp.sum(chi2) / flux.size

    def to_dict(self):
        raise NotImplementedError


register_pytree(
    ImagePrior,
    children_attrs=("flux_prior", "flux_prior_error"),
    defaults={"_key": None},
)


class SmoothnessPrior(Prior):
    """Gradient-based smoothness prior.

    ``log p = -sum(flux * (K * flux))`` with a Gaussian kernel K of the
    given width (reference ``priors/core.py:373-396``).
    """

    def __init__(self, width=2):
        super().__init__()
        self.width = float(width)
        self.kernel = jnp.asarray(
            gaussian_kernel_2d(width)[None, None], jnp.float32
        )

    def __call__(self, flux, params=None, key=None):
        smooth = convolve_fft(flux, self.kernel)
        return -jnp.sum(flux * smooth)

    def to_dict(self):
        data = super().to_dict()
        data["width"] = float(self.width)
        return data

    @classmethod
    def from_dict(cls, data):
        kwargs = {k: v for k, v in data.items() if k != "type"}
        return cls(**kwargs)


register_pytree(
    SmoothnessPrior,
    children_attrs=("kernel",),
    aux_attrs=("width",),
    defaults={"_key": None},
)
