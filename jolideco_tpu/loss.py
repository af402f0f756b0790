"""Loss functions: Poisson NLL per dataset, prior loss, total loss.

Functional JAX re-design of the reference's ``jolideco/loss.py``. The
loss objects are registered pytrees holding the static per-dataset data
(counts + forward models), so jitted training steps take them as
arguments; all evaluation paths are traceable given an explicit params
pytree and PRNG keys.

Three deliberate deviations from reference quirks (SURVEY.md §3.4):

- ``PoissonLoss.evaluate`` keeps per-dataset losses differentiable
  (the reference rebuilds a detached tensor, ``loss.py:71``, silently
  dropping the Poisson term from Hessian-based flux errors);
- dataset weights default to 1 when no calibrations are present (the
  reference's ``PoissonLoss.__call__`` returns 0 in that case,
  ``loss.py:40-49,126-133``);
- ``NPredCalibration.weight`` actually weights the *training*
  objective, identically in both update strategies. In the reference
  it is a training no-op: the loop calls the raw loss function
  (``core.py:221``) and the weighted ``PoissonLoss.__call__`` only
  affects Hessian-based errors. The trace still records raw
  unweighted per-dataset NLLs (reference ``loss.py:212-250`` parity).
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from .models import NPredModels
from .utils.pytree import register_pytree
from .utils.table import Table

__all__ = ["PoissonLoss", "PriorLoss", "TotalLoss", "poisson_nll"]


def stirling_term_mean(counts):
    """Mean Stirling approximation term of the full Poisson NLL.

    ``mean(counts log counts - counts + 0.5 log(2 pi counts))`` over
    pixels with ``counts > 1`` (torch's ``PoissonNLLLoss(full=True)``
    convention). Constant in the model parameters — precompute it once
    per dataset instead of burning two logs over every pixel every
    step.
    """
    counts = jnp.asarray(counts)
    stirling = (
        counts * jnp.log(jnp.maximum(counts, 1.0))
        - counts
        + 0.5 * jnp.log(2.0 * jnp.pi * jnp.maximum(counts, 1.0))
    )
    return jnp.mean(jnp.where(counts > 1, stirling, 0.0))


def poisson_nll(npred, counts, eps=1e-25, full=True, stirling=None):
    """Mean Poisson negative log-likelihood.

    Matches ``torch.nn.PoissonNLLLoss(log_input=False, reduction="mean",
    eps=1e-25, full=True)`` (reference ``loss.py:35-37``):
    ``npred - counts * log(npred + eps)`` plus, where ``counts > 1``,
    the Stirling term ``counts log counts - counts + 0.5 log(2 pi
    counts)``. Pass a precomputed ``stirling`` mean (see
    :func:`stirling_term_mean`) to skip recomputing the constant.
    """
    loss = jnp.mean(npred - counts * jnp.log(npred + eps))
    if full:
        if stirling is None:
            stirling = stirling_term_mean(counts)
        loss = loss + stirling
    return loss


class PoissonLoss:
    """Per-dataset Poisson likelihood terms.

    Parameters
    ----------
    counts_all : tuple of arrays
    npred_models_all : tuple of `NPredModels`
    names_all : tuple of str
    """

    def __init__(self, counts_all, npred_models_all, names_all):
        if not (
            len(counts_all) == len(npred_models_all) == len(names_all)
        ):
            raise ValueError(
                "counts_all, npred_models_all and names_all must have "
                f"the same length, got {len(counts_all)}/"
                f"{len(npred_models_all)}/{len(names_all)}"
            )
        self.counts_all = tuple(jnp.asarray(c, jnp.float32) for c in counts_all)
        self.npred_models_all = tuple(npred_models_all)
        self.names_all = tuple(names_all)
        # the Stirling term of the full NLL is parameter-independent
        self.stirling_all = tuple(
            stirling_term_mean(c) for c in self.counts_all
        )

    loss_function = staticmethod(poisson_nll)

    @property
    def n_datasets(self):
        """Number of datasets."""
        return len(self.counts_all)

    @property
    def weights(self):
        """Per-dataset likelihood weights (from calibrations, else 1)."""
        weights = []
        for model in self.npred_models_all:
            if model.calibration is not None:
                weights.append(model.calibration.weight)
            else:
                weights.append(1.0)
        return jnp.asarray(weights, jnp.float32)

    @property
    def iter_by_dataset(self):
        """Iterate over (counts, npred_models) pairs."""
        yield from zip(self.counts_all, self.npred_models_all)

    def evaluate_dataset(self, idx, fluxes, calibration_params=None):
        """Loss of dataset ``idx`` (traceable; ``idx`` static)."""
        npred_models = self.npred_models_all[idx]
        calib_params = None
        if calibration_params is not None:
            calib_params = calibration_params.get(self.names_all[idx])
        npred = npred_models.evaluate(
            fluxes=fluxes, calibration_params=calib_params
        )
        return self.loss_function(
            npred, self.counts_all[idx], stirling=self.stirling_all[idx]
        )

    def evaluate(self, fluxes, calibration_params=None):
        """Per-dataset losses as a stacked array (differentiable)."""
        losses = [
            self.evaluate_dataset(idx, fluxes, calibration_params)
            for idx in range(self.n_datasets)
        ]
        return jnp.stack(losses)

    def __call__(self, fluxes, calibration_params=None):
        """Weighted sum of dataset losses."""
        losses = self.evaluate(fluxes, calibration_params)
        return jnp.sum(losses * self.weights)

    @classmethod
    def from_datasets(cls, datasets, components, calibrations=None,
                      fft_shape=None):
        """Build per-dataset models from raw numpy dataset dicts."""
        npred_models_all, counts_all = [], []

        for name, dataset in datasets.items():
            calibration = calibrations[name] if calibrations else None
            npred_models = NPredModels.from_dataset_numpy(
                dataset=dataset, components=components,
                calibration=calibration, fft_shape=fft_shape,
            )
            npred_models_all.append(npred_models)
            counts = np.asarray(dataset["counts"])
            # 2-D image or 3-D multiband stack (same convention as
            # NPredModel.from_numpy)
            if counts.ndim == 2:
                counts = counts[np.newaxis, np.newaxis]
            elif counts.ndim == 3:
                counts = counts[np.newaxis]
            counts_all.append(jnp.asarray(counts, jnp.float32))

        return cls(
            counts_all=counts_all,
            npred_models_all=npred_models_all,
            names_all=list(datasets),
        )


register_pytree(
    PoissonLoss,
    children_attrs=("counts_all", "npred_models_all", "stirling_all"),
    aux_attrs=("names_all",),
)


class PriorLoss:
    """Sum of per-component prior terms."""

    def __init__(self, priors):
        self.priors = priors

    def evaluate(self, fluxes, params=None, key=None):
        """Per-component log-prior values (traceable)."""
        keys = (
            jax.random.split(key, len(self.priors))
            if key is not None
            else [None] * len(self.priors)
        )
        values = []
        for idx, (name, prior) in enumerate(self.priors.items()):
            prior_params = None
            if params is not None and name in params:
                prior_params = params[name].get("prior")
            values.append(
                prior(flux=fluxes[idx], params=prior_params, key=keys[idx])
            )
        return values

    def evaluate_sharded(self, fluxes, params=None, key=None, n_shards=1,
                         shard_index=0):
        """Per-component shard-partial log-priors.

        Same key schedule as :meth:`evaluate`; summed over all shards
        (each called with the same ``key``) the per-component values
        equal :meth:`evaluate`'s. Used by
        ``parallel.prior.sharded_prior_fn`` under ``shard_map`` with a
        traced ``shard_index``.
        """
        keys = (
            jax.random.split(key, len(self.priors))
            if key is not None
            else [None] * len(self.priors)
        )
        values = []
        for idx, (name, prior) in enumerate(self.priors.items()):
            prior_params = None
            if params is not None and name in params:
                prior_params = params[name].get("prior")
            values.append(
                prior.shard_partial(
                    fluxes[idx], params=prior_params, key=keys[idx],
                    n_shards=n_shards, shard_index=shard_index,
                )
            )
        return values

    def __call__(self, fluxes, params=None, key=None):
        """Summed log-prior."""
        return sum(self.evaluate(fluxes, params=params, key=key))


register_pytree(PriorLoss, children_attrs=("priors",))


class TotalLoss:
    """Poisson + beta-weighted prior loss with trace bookkeeping."""

    def __init__(self, poisson_loss, prior_loss, poisson_loss_validation=None,
                 beta=1):
        self.poisson_loss = poisson_loss
        self.poisson_loss_validation = poisson_loss_validation
        self.prior_loss = prior_loss
        self.beta = float(beta)
        self._trace = None

    @property
    def prior_weight(self):
        """Prior normalisation: the number of datasets.

        API parity: the reference's ``prior_weight`` is likewise NOT
        applied in its ``TotalLoss.__call__`` (reference
        ``loss.py:253-261`` uses ``beta * sum(priors)`` unnormalised);
        in both implementations the ``1/n_datasets`` factor lives in
        the training loop (reference ``core.py:226``; here the
        sequential per-dataset step in ``core.py``).
        """
        return self.poisson_loss.n_datasets

    @property
    def trace(self):
        """Loss trace table (built lazily)."""
        if self._trace is None:
            names = ["total", "datasets-total", "priors-total"]
            names += [f"prior-{name}" for name in self.prior_loss.priors]
            names += [f"dataset-{name}" for name in self.poisson_loss.names_all]
            if self.poisson_loss_validation:
                names += ["datasets-validation-total"]
            names += ["filename"]
            dtypes = [float] * (len(names) - 1) + [str]
            self._trace = Table(names=names, dtype=dtypes)
        return self._trace

    def trace_row_values(self, fluxes, params=None, key=None,
                         calibration_params=None):
        """Traceable dict of scalar trace entries for the current state."""
        loss_datasets = self.poisson_loss.evaluate(fluxes, calibration_params)
        loss_priors = self.prior_loss.evaluate(
            fluxes, params=params, key=key
        )

        loss_datasets_total = jnp.sum(loss_datasets)
        loss_priors_total = self.beta * sum(loss_priors)

        row = {
            "total": loss_datasets_total - loss_priors_total,
            "datasets-total": loss_datasets_total,
            "priors-total": -loss_priors_total,
        }
        for name, value in zip(self.prior_loss.priors, loss_priors):
            row[f"prior-{name}"] = -self.beta * value
        for name, value in zip(self.poisson_loss.names_all, loss_datasets):
            row[f"dataset-{name}"] = value

        if self.poisson_loss_validation:
            loss_validation = self.poisson_loss_validation.evaluate(
                fluxes, calibration_params
            )
            row["datasets-validation-total"] = jnp.sum(loss_validation)

        return row

    def append_trace(self, fluxes, filename="", params=None, key=None,
                     calibration_params=None):
        """Evaluate and append one trace row (host-side)."""
        row = {
            k: float(v)
            for k, v in self.trace_row_values(
                fluxes, params=params, key=key,
                calibration_params=calibration_params,
            ).items()
        }
        row["filename"] = str(filename)
        self.trace.add_row(row)

    def append_trace_device_row(self, row, filename=""):
        """Append a row of already-computed (device) scalars."""
        host_row = {k: float(v) for k, v in row.items()}
        host_row["filename"] = str(filename)
        self.trace.add_row(host_row)

    def __call__(self, fluxes, params=None, key=None, calibration_params=None):
        """Total loss as a function of the flux tuple (differentiable).

        Per-dataset likelihood weights multiply the Poisson terms —
        the same weighting the training strategies optimise (and the
        reference's ``TotalLoss.__call__`` applies through
        ``PoissonLoss.__call__``, ``loss.py:126-133``/``:257-261``).
        The loss *trace* records raw unweighted NLLs, like the
        reference's.
        """
        loss_datasets = self.poisson_loss.evaluate(fluxes, calibration_params)
        loss_priors = self.prior_loss.evaluate(fluxes, params=params, key=key)
        weights = self.poisson_loss.weights
        return (
            jnp.sum(loss_datasets * weights)
            - self.beta * sum(loss_priors)
        )

    def hessian_diagonals(self, fluxes, key=None, calibration_params=None):
        """Hessian-vector product of the total loss with a ones vector.

        Same probe as the reference (``torch.autograd.functional.vhp``
        with unit vectors, ``loss.py:263-279``) but through the full
        differentiable loss — the reference silently drops the Poisson
        term (see module docstring). ``calibration_params`` (the
        trained calibration pytree) is threaded explicitly so errors
        are computed at the trained values by construction, not via
        the ``set_parameters`` write-back having mutated the stored
        statics first.
        """
        from .config import force_fused, force_pallas

        ones = tuple(jnp.ones_like(flux) for flux in fluxes)

        # The Pallas scorer supports forward-over-reverse directly for
        # both reductions via nested custom_jvp rules (MAP: the argmax
        # is piecewise constant, HVP = -t A_{k*}; marginalise: a
        # dedicated softmax-HVP kernel) — the probe runs on the same
        # kernels as training, no re-trace of the XLA scan scorer.
        # The fused image-level scorer is custom_vjp-only (no JVP
        # rule), so the probe asks each prior up front whether second
        # order traces for its flux shape under the current dispatch
        # (``Prior.second_order_ok``, a capability check — never a
        # string match on JAX error text) and starts with the fused
        # kernel forced off when any says no. A defensive trace-time
        # fallback remains for kernels without second order
        # (NotImplementedError, dispatched on the exception type —
        # re-trace with the fully differentiable XLA scan scorer).
        from contextlib import ExitStack

        from .config import gmm_precision, use_fused, use_pallas

        stages = [
            {},
            {"fused": "off"},
            {"fused": "off", "pallas": "off"},
        ]
        priors = list(self.prior_loss.priors.values())
        if not all(
            prior.second_order_ok(tuple(flux.shape))
            for prior, flux in zip(priors, fluxes)
        ):
            stages = stages[1:]
        for i, stage in enumerate(stages):
            last = i == len(stages) - 1
            try:
                with ExitStack() as stack:
                    if "fused" in stage:
                        stack.enter_context(force_fused(stage["fused"]))
                    if "pallas" in stage:
                        stack.enter_context(force_pallas(stage["pallas"]))
                    # jit the whole probe: eager op-by-op dispatch of
                    # jvp-of-grad compiles each FFT/transpose op
                    # standalone, which both recompiles per probe and
                    # hits backend ops that only lower inside a fused
                    # program; the trace-time fallback exception below
                    # still fires during jit tracing. The dispatch
                    # globals are read at trace time, so they enter the
                    # (module-level, reusable) jit cache as a static
                    # config token.
                    config_token = (
                        use_fused(), use_pallas(), str(gmm_precision())
                    )
                    hvp = _hvp_probe_jit(
                        self, tuple(fluxes), ones, key, config_token,
                        calibration_params,
                    )
                return hvp
            except NotImplementedError:
                if last:
                    raise

    def fluxes_error(self, fluxes, key=None, calibration_params=None):
        """Flux errors ``1 / sqrt(H_diag)`` per component."""
        fluxes_error = {}
        hessians = self.hessian_diagonals(
            fluxes=fluxes, key=key, calibration_params=calibration_params
        )
        for name, hessian in zip(self.prior_loss.priors, hessians):
            fluxes_error[name] = jnp.sqrt(1.0 / hessian)
        return fluxes_error

    @classmethod
    def from_datasets_and_components(cls, datasets, components,
                                     datasets_validation=None, beta=1,
                                     calibrations=None, fft_shape=None):
        """Build the total loss from raw datasets and components."""
        poisson_loss = PoissonLoss.from_datasets(
            datasets=datasets, components=components,
            calibrations=calibrations, fft_shape=fft_shape,
        )

        poisson_loss_validation = None
        if datasets_validation:
            poisson_loss_validation = PoissonLoss.from_datasets(
                datasets=datasets_validation, components=components,
                calibrations=calibrations, fft_shape=fft_shape,
            )

        prior_loss = PriorLoss(priors=components.priors)

        return cls(
            poisson_loss=poisson_loss,
            poisson_loss_validation=poisson_loss_validation,
            prior_loss=prior_loss,
            beta=beta,
        )


register_pytree(
    TotalLoss,
    children_attrs=("poisson_loss", "prior_loss", "poisson_loss_validation"),
    aux_attrs=("beta",),
    defaults={"_trace": None},
)


@partial(jax.jit, static_argnums=(4,))
def _hvp_probe_jit(total, flux_tuple, tangents, key, config_token,
                   calibration_params=None):
    """Jitted forward-over-reverse Hessian probe.

    ``total`` is a registered pytree, so the loss state (counts, kernel
    FFTs — 100s of MB at benchmark scale) enters as arguments rather
    than baked-in trace constants. ``config_token`` carries the
    trace-time dispatch globals (fused/pallas/precision) into the jit
    cache key so ``force_pallas``-style context switches retrace
    instead of reusing an executable compiled for another mode.
    ``calibration_params`` (trained calibration pytree or None) enters
    as a traced argument; the probe differentiates w.r.t. fluxes only.
    """
    del config_token

    def f(ft):
        return total(ft, key=key, calibration_params=calibration_params)

    return jax.jvp(jax.grad(f), (flux_tuple,), (tangents,))[1]
