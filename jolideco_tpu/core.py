"""MAP deconvolution driver.

TPU-first re-design of the reference's ``jolideco/core.py``: the public
surface (`MAPDeconvolver`, `MAPDeconvolverResult`, the dataset-dict
convention) matches the reference, but training is a pure jit-compiled
function of a params pytree:

- optimisation state is ``(params, opt_state)`` with optax Adam/SGD;
- the reference's *one optimizer step per dataset per epoch* semantics
  (reference ``core.py:209-230``) are preserved: datasets are unrolled
  inside one jitted epoch step (``update_strategy="sequential"``);
  ``update_strategy="joint"`` instead sums all dataset losses into a
  single step — the variant that scales across chips (see
  ``jolideco_tpu.parallel``);
- epochs run either as a host loop over the jitted epoch function (when
  per-epoch checkpointing / progress / early stopping needs host
  control) or as a single ``lax.scan`` over all epochs
  (``scan_epochs=True`` — the benchmark path);
- randomness (prior cycle spins) comes from a threaded PRNG key;
- flux errors use the exact Hessian-vector probe (reference drops the
  Poisson term, SURVEY.md §3.4 — deviation documented in ``loss.py``).

Trace-evaluation detail: the reference evaluates the post-epoch trace
with fluxes captured *before* the final optimiser step of the epoch
(``core.py:217-247``); here the trace uses the end-of-epoch parameters.
"""

import copy
import logging
from pathlib import Path

import numpy as np

import jax
import jax.numpy as jnp
import optax

from .loss import TotalLoss
from .models import FluxComponents, SparseSpatialFluxComponent, SpatialFluxComponent
from .utils.misc import format_class_str
from .utils.table import Table

log = logging.getLogger(__name__)

__all__ = ["MAPDeconvolver", "MAPDeconvolverResult"]


def _build_adam(learning_rate, betas=(0.9, 0.999), eps=1e-8, **kwargs):
    b1, b2 = betas
    return optax.adam(learning_rate=learning_rate, b1=b1, b2=b2, eps=eps,
                      **kwargs)


def _build_sgd(learning_rate, momentum=0.0, nesterov=False, **kwargs):
    return optax.sgd(learning_rate=learning_rate, momentum=momentum or None,
                     nesterov=nesterov, **kwargs)


def _validate_component_shapes(datasets, components):
    """Fail the build with a clear message on flux/data shape mismatch.

    Without this, a flux initialised at the wrong resolution (e.g.
    already-upsampled pixels passed to
    ``SpatialFluxComponent.from_numpy``, which expects DATA resolution
    and upsamples by ``upsampling_factor`` itself — reference
    ``models/core.py:505-540``) only surfaces as a broadcast error deep
    inside the traced forward.
    """
    for ds_name, dataset in datasets.items():
        data_shape = tuple(np.asarray(dataset["counts"]).shape[-2:])
        for name, component in components.items():
            flux = getattr(component, "flux_upsampled", None)
            if flux is None:
                # sparse components splat onto their own grid
                continue
            factor = getattr(component, "upsampling_factor", 1) or 1
            expected = (data_shape[0] * factor, data_shape[1] * factor)
            got = tuple(flux.shape[-2:])
            if got != expected:
                raise ValueError(
                    f"Flux component {name!r} has shape {got} but dataset "
                    f"{ds_name!r} counts are {data_shape} with upsampling "
                    f"factor {factor} (expected flux shape {expected}). "
                    "Note SpatialFluxComponent.from_numpy takes the flux "
                    "at data resolution and upsamples it by "
                    "upsampling_factor itself."
                )


OPTIMIZER = {
    "adam": _build_adam,
    "sgd": _build_sgd,
}

# conv_mode="auto" picks the Pallas matmul FFT only for fields at
# least this large per axis (incl. upsampling): below it the backend's
# three-kernel dispatch overhead outweighs the transform win
# (docs/performance.md "The Pallas matmul FFT")
PFFT_AUTO_MIN_DIM = 1024


class MAPDeconvolver:
    """Maximum a-posteriori deconvolver.

    Parameters
    ----------
    n_epochs : int
        Number of training epochs.
    beta : float
        Prior scale factor.
    learning_rate : float
    compute_error : bool
        Compute flux errors from the loss Hessian diagonal after
        training.
    stop_early : bool
        Stop when the validation loss stops improving.
    stop_early_n_average : int
        Moving-average window for early stopping.
    display_progress : bool
        Show a tqdm progress bar.
    optimizer_type : {"adam", "sgd"}
    optimizer_kwargs : dict, optional
        Torch-style keys accepted: ``lr``, ``betas``, ``eps``,
        ``momentum``.
    checkpoint_path : str, optional
        Directory for per-epoch checkpoints.
    update_strategy : {"sequential", "joint"}
        ``sequential`` = one optimiser step per dataset per epoch
        (reference semantics); ``joint`` = one step per epoch on the
        summed loss (multi-chip friendly).
    scan_epochs : bool or None
        Run all epochs in one ``lax.scan`` (fastest; no per-epoch host
        callbacks). Default: auto — True when neither checkpointing nor
        progress display is requested. Incompatible with
        ``checkpoint_path`` (per-epoch checkpoint writes need the host
        loop): requesting both warns and uses the host loop.
    trace_every : int
        Record the loss trace every N epochs (0 disables tracing; 1 =
        reference behaviour).
    seed : int
        PRNG seed for prior randomness (cycle spins, jitter).
    shard_prior : bool
        On a mesh with the joint strategy, partition the prior's
        patch-scoring work across every device (``parallel.prior``)
        instead of replicating it — the GMM patch prior scores a
        disjoint strip block per device and the scalar is ``psum``-ed.
        Identical values/gradients to f32 summation noise; default
        True. No effect without a mesh.
    conv_mode : {"auto", "fft", "pfft", "ct", "mxu", "direct"}
        PSF convolution backend for the stacked joint path. ``auto``
        (default) picks the Pallas two-stage matmul FFT (``pfft``,
        measured ~1.9x the XLA FFT at benchmark shape) when compiled
        Pallas kernels are available, no mesh is configured and the
        (upsampled) field is at least ``PFFT_AUTO_MIN_DIM`` per axis;
        the XLA FFT otherwise. See ``docs/performance.md``.
    fft_shape : tuple of int, optional
        Padded transform shape for the joint-strategy FFT convolution
        (must be at least ``image + kernel - 1`` per axis). Default:
        the minimal linear-convolution shape. XLA's mixed-radix TPU
        FFT can run faster at a slightly larger shape with friendlier
        factors — measure with ``scripts/bench_fft_sizes.py``.
    """

    _default_flux_component = "flux"
    _default_checkpoint_filename = "checkpoint-epoch-{epoch}.asdf"

    def __init__(
        self,
        n_epochs=1_000,
        beta=1,
        learning_rate=0.1,
        compute_error=False,
        stop_early=False,
        stop_early_n_average=10,
        display_progress=True,
        optimizer_type="adam",
        optimizer_kwargs=None,
        checkpoint_path=None,
        update_strategy="sequential",
        scan_epochs=None,
        scan_chunk=None,
        trace_every=1,
        seed=0,
        device=None,
        mesh=None,
        conv_mode="auto",
        fft_shape=None,
        shard_prior=True,
    ):
        self.n_epochs = int(n_epochs)
        self.beta = float(beta)
        self.learning_rate = float(learning_rate)
        self.compute_error = bool(compute_error)
        self.stop_early = bool(stop_early)
        self.stop_early_n_average = int(stop_early_n_average)
        self.display_progress = bool(display_progress)
        self.seed = int(seed)
        self.device = device
        self.mesh = mesh
        self.shard_prior = bool(shard_prior)
        self.conv_mode = str(conv_mode)
        self.fft_shape = None if fft_shape is None else tuple(
            int(s) for s in fft_shape
        )

        if optimizer_type not in OPTIMIZER:
            raise ValueError(
                f"Unknown optimizer: {optimizer_type}, must be one of "
                f"{list(OPTIMIZER)}"
            )
        self.optimizer_type = optimizer_type

        optimizer_kwargs = dict(optimizer_kwargs or {})
        # accept torch-style "lr"
        if "lr" in optimizer_kwargs:
            self.learning_rate = float(optimizer_kwargs.pop("lr"))
        optimizer_kwargs.setdefault("learning_rate", self.learning_rate)
        self.optimizer_kwargs = optimizer_kwargs

        if update_strategy not in ("sequential", "joint"):
            raise ValueError(
                f"Unknown update strategy {update_strategy!r}, choose from "
                "'sequential' or 'joint'"
            )
        self.update_strategy = update_strategy
        if mesh is not None and update_strategy != "joint":
            log.warning(
                "mesh is only used by the joint update strategy; the "
                "sequential per-dataset loop runs unsharded. Pass "
                "update_strategy='joint' to shard over the mesh."
            )
        self.scan_epochs = scan_epochs
        self.scan_chunk = None if scan_chunk is None else int(scan_chunk)
        self.trace_every = int(trace_every)

        if checkpoint_path is not None:
            checkpoint_path = Path(checkpoint_path)
            checkpoint_path.mkdir(exist_ok=True, parents=True)
        self.checkpoint_path = checkpoint_path

    # ------------------------------------------------------------------
    def to_dict(self):
        """Full configuration with simple data types — a result file
        must describe the run that produced it."""
        data = {}
        data["n_epochs"] = self.n_epochs
        data["beta"] = self.beta
        data["learning_rate"] = self.learning_rate
        data["compute_error"] = self.compute_error
        data["stop_early"] = self.stop_early
        data["stop_early_n_average"] = self.stop_early_n_average
        data["display_progress"] = self.display_progress
        data["optimizer_type"] = self.optimizer_type
        data["optimizer_kwargs"] = {
            k: v for k, v in self.optimizer_kwargs.items()
            if k != "learning_rate"
        }
        data["update_strategy"] = self.update_strategy
        data["scan_epochs"] = self.scan_epochs
        data["scan_chunk"] = self.scan_chunk
        data["conv_mode"] = self.conv_mode
        data["fft_shape"] = (
            None if self.fft_shape is None else list(self.fft_shape)
        )
        # the mesh itself is runtime state; record its topology
        data["mesh"] = (
            None
            if self.mesh is None
            else "x".join(
                f"{name}:{size}"
                for name, size in zip(
                    self.mesh.axis_names, self.mesh.devices.shape
                )
            )
        )
        data["shard_prior"] = self.shard_prior
        data["trace_every"] = self.trace_every
        data["seed"] = self.seed
        data["checkpoint_path"] = (
            None if self.checkpoint_path is None else str(self.checkpoint_path)
        )
        return data

    def __str__(self):
        return format_class_str(instance=self)

    # ------------------------------------------------------------------
    def _build_total_loss(self, datasets, datasets_validation, components,
                          calibrations):
        """Build the total loss; the joint strategy stacks observations.

        Joint updates with homogeneous datasets use the vmapped
        `StackedPoissonLoss` (one batched forward, sharding-ready over
        the ``obs`` axis); anything else falls back to per-dataset
        models.
        """
        _validate_component_shapes(datasets, components)
        if datasets_validation:
            _validate_component_shapes(datasets_validation, components)
        if self.update_strategy == "joint":
            from .loss import PriorLoss
            from .parallel.stacked import StackedPoissonLoss

            # a mesh with a "row" axis requests 2-D spatial sharding:
            # build with a row-compatible FFT shape and place through
            # shard_stacked_spatial (pencil-FFT path)
            row_shards = (
                int(self.mesh.shape["row"])
                if self.mesh is not None
                and "row" in self.mesh.axis_names
                else None
            )
            conv_mode = self.conv_mode
            if conv_mode == "auto":
                from .config import pallas_mode

                enabled, interpret = pallas_mode()
                # compiled Pallas + single device + large fields -> the
                # measured-faster matmul-FFT backend. Small fields stay
                # on the XLA FFT: the three-kernel dispatch overhead
                # dominates there (E0102-like 256^2: pfft measured
                # ~1.5x SLOWER end-to-end incl. extra compiles, vs
                # 1.4x faster at the 1024^2 benchmark shape). Interpret
                # mode is a test vehicle, not a speed path.
                image_dim = 0
                for component in components.values():
                    factor = component.upsampling_factor or 1
                    shape = next(iter(datasets.values()))["counts"].shape
                    image_dim = max(
                        image_dim, factor * max(shape[-2], shape[-1])
                    )
                conv_mode = (
                    "pfft"
                    if enabled and not interpret and self.mesh is None
                    and image_dim >= PFFT_AUTO_MIN_DIM
                    else "fft"
                )
            if (
                conv_mode == "pfft"
                and self.mesh is not None
                and "row" in self.mesh.axis_names
            ):
                # the Pallas matmul-DFT cannot split a single transform
                # across the row axis — spatial sharding stays on the
                # pencil-FFT path. On a pure obs mesh pfft DOES
                # partition: pairs are shard-local and the kernels run
                # per-device under jax.shard_map (StackedPoissonLoss
                # .shard / _conv_pfft_pair); an uneven or odd
                # per-device observation count falls back to the
                # per-observation rFFT path inside `shard`.
                log.warning(
                    "conv_mode='pfft' does not partition over a row "
                    "(spatial) mesh; using conv_mode='fft' for this "
                    "sharded run"
                )
                conv_mode = "fft"
            poisson = poisson_validation = None
            try:
                poisson = StackedPoissonLoss.from_datasets(
                    datasets=datasets, components=components,
                    calibrations=calibrations, conv_mode=conv_mode,
                    fft_shape=self.fft_shape, row_shards=row_shards,
                )
                if datasets_validation:
                    poisson_validation = StackedPoissonLoss.from_datasets(
                        datasets=datasets_validation, components=components,
                        calibrations=calibrations, conv_mode=conv_mode,
                        fft_shape=self.fft_shape, row_shards=row_shards,
                    )
            except ValueError as exc:
                from .parallel.stacked import DataValidationError

                if isinstance(exc, DataValidationError):
                    # the data is invalid for the per-dataset path too
                    # — fail fast with the direct message instead of
                    # falling back to a forward that fails later inside
                    # jit with an opaque shape error
                    raise
                if self.fft_shape is not None or self.mesh is not None:
                    # an explicit fft_shape or a mesh pins the stacked
                    # path; a silent fallback would ignore the user's
                    # request (unsharded single-device training instead
                    # of the multi-chip run they configured)
                    raise
                poisson = None
                log.warning(
                    f"Cannot stack observations ({exc}); falling back to "
                    "per-dataset forward models"
                )

            if poisson is not None:
                # sharding failures must propagate — only the stacked
                # BUILD has a per-dataset fallback
                if self.mesh is not None:
                    if row_shards:
                        from .parallel.spatial import shard_stacked_spatial

                        poisson = shard_stacked_spatial(poisson, self.mesh)
                        if poisson_validation is not None:
                            poisson_validation = shard_stacked_spatial(
                                poisson_validation, self.mesh
                            )
                    else:
                        poisson = poisson.shard(self.mesh)
                        if poisson_validation is not None:
                            poisson_validation = poisson_validation.shard(
                                self.mesh
                            )
                return TotalLoss(
                    poisson_loss=poisson,
                    prior_loss=PriorLoss(priors=components.priors),
                    poisson_loss_validation=poisson_validation,
                    beta=self.beta,
                )

        if self.conv_mode not in ("fft", "auto"):
            log.warning(
                f"conv_mode={self.conv_mode!r} only applies to the "
                "stacked joint path; the per-dataset forward models "
                "always convolve via FFT"
            )
        return TotalLoss.from_datasets_and_components(
            datasets=datasets,
            datasets_validation=datasets_validation,
            components=components,
            calibrations=calibrations,
            beta=self.beta,
            fft_shape=self.fft_shape,
        )

    def _make_optimizer(self):
        return OPTIMIZER[self.optimizer_type](**self.optimizer_kwargs)

    def _make_epoch_fn(self, tx, n_datasets):
        """Build the jitted epoch step.

        Signature: ``epoch_fn(components, total_loss, params, opt_state,
        key, epoch) -> (params, opt_state, trace_row)`` where
        ``trace_row`` is a dict of scalars (empty when tracing is
        disabled; NaN-filled on epochs skipped by ``trace_every``, so
        the extra trace forward only runs on recorded epochs).
        """
        beta = self.beta
        sequential = self.update_strategy == "sequential"
        # partition the prior's WORK over the mesh (not just the
        # Poisson data): without this every device redundantly scores
        # the full replicated flux — round-4 profiling put the fused
        # GMM prior at ~40% of the step, an ~2.2x Amdahl cap on an
        # 8-chip obs mesh (docs/performance.md; parallel/prior.py)
        prior_mesh = (
            self.mesh
            if self.mesh is not None and not sequential and self.shard_prior
            else None
        )
        if prior_mesh is not None:
            from .parallel.prior import sharded_prior_fn

            prior_fn = sharded_prior_fn(prior_mesh)
        trace_every = self.trace_every
        # early stopping reads the validation loss off the trace row
        # every epoch, so it forces a row per epoch regardless
        trace_every_epoch = trace_every == 1 or self.stop_early

        def loss_for_dataset(params, components, total_loss, idx, key):
            # The per-dataset likelihood weight multiplies the training
            # objective in BOTH update strategies (deviation from the
            # reference, where NPredCalibration.weight is a training
            # no-op: reference core.py:221 calls the raw loss_function,
            # and the weighted PoissonLoss.__call__ at loss.py:126-133
            # is never reached from the loop). Summed over an epoch the
            # sequential objective matches the joint one.
            fluxes = components.fluxes_from(params.get("components"))
            loss = total_loss.poisson_loss.evaluate_dataset(
                idx, fluxes, params.get("calibrations")
            )
            weight = total_loss.poisson_loss.weights[idx]
            loss_prior = total_loss.prior_loss(
                fluxes, params=params.get("components"), key=key
            )
            return weight * loss - beta * loss_prior / n_datasets

        def loss_joint(params, components, total_loss, key):
            # One step on the weighted sum of all dataset losses; the
            # prior enters once per step (the sequential strategy
            # applies beta/n_datasets at each of its n per-dataset
            # steps, so the per-epoch prior weight matches).
            fluxes = components.fluxes_from(params.get("components"))
            losses = total_loss.poisson_loss.evaluate(
                fluxes, params.get("calibrations")
            )
            if prior_mesh is not None:
                loss_prior = prior_fn(
                    total_loss.prior_loss, fluxes,
                    params=params.get("components"), key=key,
                )
            else:
                loss_prior = total_loss.prior_loss(
                    fluxes, params=params.get("components"), key=key
                )
            weights = total_loss.poisson_loss.weights
            return jnp.sum(losses * weights) - beta * loss_prior

        def epoch_fn(components, total_loss, params, opt_state, key,
                     epoch):
            if sequential:
                keys = jax.random.split(key, n_datasets + 1)
                for idx in range(n_datasets):
                    grads = jax.grad(loss_for_dataset)(
                        params, components, total_loss, idx, keys[idx]
                    )
                    updates, opt_state = tx.update(grads, opt_state, params)
                    params = optax.apply_updates(params, updates)
                trace_key = keys[-1]
            else:
                key, trace_key = jax.random.split(key)
                grads = jax.grad(loss_joint)(
                    params, components, total_loss, key
                )
                updates, opt_state = tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)

            def compute_row(params):
                fluxes = components.fluxes_from(params.get("components"))
                return total_loss.trace_row_values(
                    fluxes,
                    params=params.get("components"),
                    key=trace_key,
                    calibration_params=params.get("calibrations"),
                )

            if trace_every_epoch:
                # stop_early reads the validation loss off the row, so
                # it forces a real row per epoch even when trace_every
                # would disable or thin the RECORDED trace (recording
                # is filtered downstream; stopping must not be)
                trace_row = compute_row(params)
            elif trace_every == 0:
                trace_row = {}
            else:
                # the trace row is a full no-grad forward of every
                # dataset (+ validation); only pay it on recorded epochs
                def skip_row(params):
                    shapes = jax.eval_shape(compute_row, params)
                    return jax.tree_util.tree_map(
                        lambda s: jnp.full(s.shape, jnp.nan, s.dtype), shapes
                    )

                trace_row = jax.lax.cond(
                    epoch % trace_every == 0, compute_row, skip_row, params
                )
            return params, opt_state, trace_row

        return jax.jit(epoch_fn)

    def _get_fns(self, n_datasets):
        """Optimiser + jitted epoch/scan functions, cached per instance.

        Caching keeps jit compilation caches warm across repeated
        ``run`` calls with identical configuration (e.g. benchmark
        warm-up runs). The key covers everything the compiled functions
        close over.
        """
        cache_key = (
            n_datasets,
            self.update_strategy,
            self.trace_every,
            self.stop_early,
            self.stop_early_n_average,
            self.optimizer_type,
            self.learning_rate,
            tuple(sorted(self.optimizer_kwargs.items())),
            self.beta,
            self.mesh,
            self.shard_prior,
        )
        if getattr(self, "_fn_cache_key", None) != cache_key:
            tx = self._make_optimizer()
            epoch_fn = self._make_epoch_fn(tx, n_datasets)
            scan_fn = self._make_scan_fn(epoch_fn)
            self._fn_cache_key = cache_key
            self._fn_cache = (tx, epoch_fn, scan_fn)
        return self._fn_cache

    def _make_scan_fn(self, epoch_fn):
        """Jitted ``lax.scan`` over a chunk of epochs with early-stop
        gating. Compiled once per chunk length."""
        stop_early = self.stop_early
        n_average = self.stop_early_n_average

        @jax.jit
        def run(components, total_loss, carry, key, epochs):
            # determine the trace-row structure once (dead code after
            # lowering — only the dict keys are used)
            params0, opt_state0 = carry[0], carry[1]
            _, _, proto = epoch_fn(
                components, total_loss, params0, opt_state0, key, epochs[0]
            )
            nan_row = {k: jnp.float32(jnp.nan) for k in proto}

            def body(carry, epoch):
                key_epoch = jax.random.fold_in(key, epoch)
                params, opt_state, done, val_hist, count = carry

                if not stop_early:
                    # no early stopping: run the epoch unconditionally
                    # (a lax.cond would shuttle the params/opt-state
                    # carries through both branches every epoch)
                    params, opt_state, row = epoch_fn(
                        components, total_loss, params, opt_state,
                        key_epoch, epoch,
                    )
                    return (params, opt_state, done, val_hist, count), row

                def active(operands):
                    params, opt_state = operands
                    return epoch_fn(
                        components, total_loss, params, opt_state,
                        key_epoch, epoch,
                    )

                def idle(operands):
                    params, opt_state = operands
                    return params, opt_state, nan_row

                params, opt_state, row = jax.lax.cond(
                    done, idle, active, (params, opt_state)
                )

                val = row.get("datasets-validation-total", jnp.float32(0.0))
                val_hist = jnp.roll(val_hist, -1).at[-1].set(
                    jnp.where(done, val_hist[-1], val)
                )
                count = count + jnp.where(done, 0, 1)
                avg = jnp.mean(val_hist)
                done = done | ((count > n_average) & (val > avg) & ~done)
                return (params, opt_state, done, val_hist, count), row

            carry, rows = jax.lax.scan(body, tuple(carry), epochs)
            return carry, rows

        return run

    def _run_scan(self, scan_fn, components, total_loss, params, opt_state,
                  key, n_epochs):
        """Run all epochs through chunked jitted scans.

        The scan is executed in equal-size chunks (one compilation per
        distinct chunk length) so repeated runs and different epoch
        counts reuse the compiled chunk executable. Per-epoch keys are
        ``fold_in(key, epoch)`` — identical to the host loop.
        """
        chunk = self.scan_chunk or n_epochs
        n_average = self.stop_early_n_average

        carry = (
            params,
            opt_state,
            jnp.bool_(False),
            jnp.full((n_average,), jnp.inf, jnp.float32),
            jnp.int32(0),
        )

        import time as _time

        debug = log.isEnabledFor(logging.DEBUG)

        all_rows = []
        start = 0
        while start < n_epochs:
            stop = min(start + chunk, n_epochs)
            t0 = _time.time() if debug else None
            carry, rows = scan_fn(
                components, total_loss, carry, key,
                jnp.arange(start, stop, dtype=jnp.int32),
            )
            if debug:
                jax.block_until_ready(carry[0])
                log.debug(
                    f"scan chunk [{start}:{stop}]: "
                    f"{(_time.time() - t0) * 1e3:.1f} ms"
                )
            all_rows.append(rows)
            start = stop
            # one scalar fetch per chunk: once early stopping fired,
            # the remaining chunks would only run no-op idle epochs
            if self.stop_early and bool(carry[2]):
                break

        params, opt_state, _, _, count = carry
        if not all_rows:  # n_epochs == 0: untrained result, empty trace
            rows = {}
        elif len(all_rows) == 1:
            rows = all_rows[0]
        else:
            rows = jax.tree_util.tree_map(
                lambda *parts: jnp.concatenate(parts), *all_rows
            )
        return params, opt_state, rows, count

    # ------------------------------------------------------------------
    def build_loss(self, datasets, datasets_validation=None,
                   components=None, calibrations=None):
        """Build the total loss once, for reuse across ``run`` calls.

        Repeated runs over the same data (seed sweeps, epoch-count
        sweeps, resumed training) pay the dataset build — stacking,
        device transfer, kernel-FFT precompute — on every ``run``.
        Build it once and pass it back via ``run(total_loss=...)``:

        >>> loss = deco.build_loss(datasets, components=components)
        >>> for seed in range(8):
        ...     deco.seed = seed
        ...     results.append(deco.run(datasets, components=components,
        ...                             total_loss=loss))

        The loss captures the *data* (and the components' static
        configuration); the trained parameters still come from the
        ``components`` passed to ``run``. No reference equivalent.
        """
        if isinstance(components, (SpatialFluxComponent,
                                   SparseSpatialFluxComponent)):
            components = {self._default_flux_component: components}
        components = FluxComponents(components)
        if self.device is not None:
            # same placement rule as run(): a configured device applies
            # to the data build too, so a prebuilt loss reused by run()
            # doesn't live on a mismatched default device
            device = self.device
            if isinstance(device, str):
                device = jax.devices(device)[0]
            with jax.default_device(device):
                return self._build_total_loss(
                    datasets, datasets_validation, components, calibrations
                )
        return self._build_total_loss(
            datasets, datasets_validation, components, calibrations
        )

    def run(self, datasets, datasets_validation=None, components=None,
            calibrations=None, resume_from=None, total_loss=None):
        """Run the MAP deconvolution.

        Parameters
        ----------
        datasets : dict of [str, dict]
            Per-dataset dicts with ``counts``, ``psf``, ``exposure``,
            ``background`` numpy arrays (``psf`` may be a dict keyed by
            component).
        datasets_validation : dict of [str, dict], optional
        components : `FluxComponents` or `SpatialFluxComponent`
        calibrations : `NPredCalibrations`, optional
        resume_from : `MAPDeconvolverResult` or path, optional
            Resume training: either a previous result (pass its
            ``.components`` as ``components`` to continue from the same
            parameters and optimiser moments) or a train-state
            checkpoint directory written with
            :meth:`MAPDeconvolverResult.save_state`. Not available in
            the reference (its checkpoints restore model state only).
        total_loss : `TotalLoss`, optional
            Prebuilt loss from :meth:`build_loss` — skips the dataset
            build/transfer for repeated runs over the same data.

        Returns
        -------
        result : `MAPDeconvolverResult`
        """
        if self.stop_early and datasets_validation is None:
            raise ValueError("Early stopping requires providing test datasets")

        if self.device is not None:
            # place the whole run on a requested platform/device
            # (replaces the reference's torch `.to(device)` moves)
            device = self.device
            if isinstance(device, str):
                device = jax.devices(device)[0]
            with jax.default_device(device):
                saved, self.device = self.device, None
                try:
                    return self.run(
                        datasets,
                        datasets_validation=datasets_validation,
                        components=components,
                        calibrations=calibrations,
                        resume_from=resume_from,
                        total_loss=total_loss,
                    )
                finally:
                    self.device = saved

        if isinstance(components, (SpatialFluxComponent,
                                   SparseSpatialFluxComponent)):
            components = {self._default_flux_component: components}

        components = FluxComponents(components)
        components_init = copy.deepcopy(components)
        calibrations_init = copy.deepcopy(calibrations)

        if total_loss is None:
            total_loss = self._build_total_loss(
                datasets, datasets_validation, components, calibrations
            )
        else:
            # reused loss: each run gets a fresh trace table
            total_loss._trace = None
            if (
                datasets_validation is not None
                and total_loss.poisson_loss_validation is None
            ):
                log.warning(
                    "datasets_validation is ignored when a prebuilt "
                    "total_loss is supplied; pass it to build_loss() "
                    "instead"
                )
        if self.stop_early and total_loss.poisson_loss_validation is None:
            raise ValueError(
                "Early stopping requires a loss with validation datasets; "
                "the supplied total_loss was built without them"
            )

        params = {"components": components.parameters()}
        if calibrations:
            calib_params = calibrations.parameters()
            if calib_params:
                params["calibrations"] = calib_params

        n_datasets = total_loss.poisson_loss.n_datasets
        tx, epoch_fn, scan_fn = self._get_fns(n_datasets)
        opt_state = tx.init(params)

        key = jax.random.PRNGKey(self.seed)

        if resume_from is not None:
            if isinstance(resume_from, MAPDeconvolverResult):
                if resume_from.opt_state is not None:
                    opt_state = resume_from.opt_state
                if resume_from.final_key is not None:
                    key = resume_from.final_key
            else:
                from .utils.checkpoint import restore_train_state

                params, opt_state, key, _ = restore_train_state(
                    resume_from, params, opt_state, key
                )

        use_scan = self.scan_epochs
        if use_scan is None:
            use_scan = (
                self.checkpoint_path is None and not self.display_progress
            )
        elif use_scan and self.checkpoint_path is not None:
            log.warning(
                "scan_epochs=True is incompatible with checkpoint_path "
                "(per-epoch checkpoint writes need the host loop); "
                "falling back to the host loop. Set checkpoint_path=None "
                "to run the compiled epoch scan."
            )

        if use_scan and self.checkpoint_path is None:
            params, opt_state, rows, count = self._run_scan(
                scan_fn, components, total_loss, params, opt_state, key,
                self.n_epochs,
            )
            rows = {k: np.asarray(v) for k, v in rows.items()}
            n_rows = int(count) if self.stop_early else self.n_epochs
            for i in range(n_rows):
                if self.trace_every and i % self.trace_every == 0:
                    row = {k: float(v[i]) for k, v in rows.items()}
                    row["filename"] = ""
                    total_loss.trace.add_row(row)
        else:
            self._run_host_loop(
                epoch_fn, components, total_loss, calibrations, params,
                opt_state, key,
            )
            params = self._last_params
            opt_state = self._last_opt_state

        # write back trained parameters
        components.set_parameters(params.get("components", {}))
        if calibrations and "calibrations" in params:
            calibrations.set_parameters(params["calibrations"])

        # loud NaN guard: a non-finite loss propagates into the Adam
        # moments and sticks, so one final check catches any blow-up
        # (one small host fetch; no per-epoch sync)
        leaves = jax.tree_util.tree_leaves(params)
        if leaves and not all(
            bool(jnp.isfinite(leaf).all()) for leaf in leaves
        ):
            msg = "Training produced non-finite parameters"
            if len(total_loss.trace):
                totals = np.asarray(total_loss.trace["total"], np.float64)
                bad = np.nonzero(~np.isfinite(totals))[0]
                if bad.size:
                    msg += (
                        f" (loss first recorded non-finite at trace row "
                        f"{bad[0]})"
                    )
            log.warning(
                f"{msg}. Check the flux initialisation (strictly "
                "positive for log-flux components), the learning rate, "
                "and the data (NaNs, zero exposure)."
            )

        if self.compute_error:
            # trained values by construction: the flux and calibration
            # pytrees from the optimiser are threaded explicitly rather
            # than relying on the set_parameters write-back above
            # having mutated the stored statics first
            fluxes = components.fluxes_from(params.get("components"))
            flux_errors = total_loss.fluxes_error(
                fluxes=fluxes,
                calibration_params=params.get("calibrations"),
            )
            components.set_flux_errors(flux_errors=flux_errors)

        config = self.to_dict()
        return MAPDeconvolverResult(
            config=config,
            components=components,
            components_init=components_init,
            trace_loss=total_loss.trace,
            calibrations=calibrations,
            calibrations_init=calibrations_init,
            opt_state=opt_state,
            final_key=jax.random.fold_in(key, self.n_epochs),
            wcs=components.wcs,
        )

    def _run_host_loop(self, epoch_fn, components, total_loss, calibrations,
                       params, opt_state, key):
        """Host loop over epochs: progress bar, checkpoints, early stop."""
        from tqdm.auto import tqdm

        disable = not self.display_progress
        n_datasets = total_loss.poisson_loss.n_datasets

        postfix_every = max(1, self.n_epochs // 200)

        val_hist = []
        with tqdm(total=self.n_epochs * n_datasets, disable=disable) as pbar:
            for epoch in range(self.n_epochs):
                pbar.set_description(f"Epoch {epoch + 1}")
                key_epoch = jax.random.fold_in(key, epoch)
                params, opt_state, row = epoch_fn(
                    components, total_loss, params, opt_state, key_epoch,
                    jnp.int32(epoch),
                )
                pbar.update(n_datasets)

                if self.checkpoint_path:
                    filename = self._default_checkpoint_filename.format(
                        epoch=epoch
                    )
                    components.set_parameters(params.get("components", {}))
                    if calibrations and "calibrations" in params:
                        calibrations.set_parameters(params["calibrations"])
                    checkpoint = MAPDeconvolverResult(
                        config=self.to_dict(),
                        trace_loss=total_loss.trace,
                        components=components,
                        calibrations=calibrations,
                    )
                    log.info(
                        f"Writing checkpoint to {self.checkpoint_path / filename}"
                    )
                    checkpoint.write(filename=self.checkpoint_path / filename)
                else:
                    filename = ""

                record = self.trace_every and epoch % self.trace_every == 0
                if record and row:
                    total_loss.append_trace_device_row(row, filename=filename)

                if record and row and not disable and (
                    epoch % postfix_every == 0
                ):
                    last = total_loss.trace[-1]
                    pbar.set_postfix(
                        total=last["total"],
                        datasets_total=last["datasets-total"],
                        priors_total=last["priors-total"],
                    )

                if self.stop_early:
                    # per-epoch stopping on its own history — identical
                    # to the scan path's rule even when trace_every > 1
                    # records only a subset of rows in the trace table
                    val_hist.append(
                        float(row["datasets-validation-total"])
                    )
                    window = val_hist[-self.stop_early_n_average:]
                    if (
                        len(val_hist) > self.stop_early_n_average
                        and val_hist[-1] > np.mean(window)
                    ):
                        break

        self._last_params = params
        self._last_opt_state = opt_state


class MAPDeconvolverResult:
    """MAP deconvolver result.

    Parameters
    ----------
    config : dict
    components : `FluxComponents`
    trace_loss : `Table` or dict
    components_init : `FluxComponents`, optional
    calibrations, calibrations_init : `NPredCalibrations`, optional
    opt_state : optax state, optional
        Retained so training can resume from a result (not available in
        the reference, SURVEY.md §5).
    wcs : optional
    """

    def __init__(self, config, components, trace_loss, components_init=None,
                 calibrations=None, calibrations_init=None, opt_state=None,
                 final_key=None, wcs=None):
        self._components = components
        self._components_init = components_init
        if isinstance(trace_loss, dict):
            trace_loss = Table.from_dict(trace_loss)
        self.trace_loss = trace_loss
        self._calibrations = calibrations
        self._calibrations_init = calibrations_init
        self._config = config
        self._opt_state = opt_state
        self._final_key = final_key
        self._wcs = wcs

    @property
    def config(self):
        """Configuration dict."""
        return self._config

    @property
    def components(self):
        """Flux components."""
        return self._components

    @property
    def components_init(self):
        """Initial flux components."""
        return self._components_init

    @property
    def calibrations(self):
        """Calibrations."""
        return self._calibrations

    @property
    def calibrations_init(self):
        """Initial calibrations."""
        return self._calibrations_init

    @property
    def opt_state(self):
        """Final optimiser state (for resuming)."""
        return self._opt_state

    @property
    def final_key(self):
        """PRNG key after training (for resuming)."""
        return self._final_key

    def save_state(self, path):
        """Save the full train state (params, optimiser moments, PRNG
        key) so training can resume across sessions — see
        ``MAPDeconvolver.run(resume_from=...)``."""
        from .utils.checkpoint import save_train_state

        params = {"components": self.components.parameters()}
        if self.calibrations:
            calib_params = self.calibrations.parameters()
            if calib_params:
                params["calibrations"] = calib_params
        save_train_state(
            path,
            params=params,
            opt_state=self._opt_state,
            key=self._final_key,
            epoch=len(self.trace_loss),
        )

    @property
    def wcs(self):
        """World coordinate system of the reconstruction (from the
        components; reference ``core.py:325-327``)."""
        if self._wcs is not None:
            return self._wcs
        if self._components is not None:
            return self._components.wcs
        return None

    @property
    def flux_total(self):
        """Total flux at data resolution."""
        return self.components.flux_total_numpy

    @property
    def flux_upsampled_total(self):
        """Total upsampled flux."""
        return self.components.flux_upsampled_total_numpy

    @property
    def checkpoint_path(self):
        """Checkpoint directory, or None when the run did not
        checkpoint (previously returned the bogus ``Path("None")``)."""
        path = self.config.get("checkpoint_path", None)
        if path is None or path == "None":
            return None
        return Path(path)

    def read_checkpoint(self, epoch):
        """Read the checkpoint written at ``epoch``.

        Checkpoints are written for every epoch, so the filename is
        reconstructed from the epoch number directly — indexing the
        trace table would return the wrong epoch when ``trace_every``
        thins the recorded rows.
        """
        if self.checkpoint_path is None:
            raise ValueError(
                "This run was configured without checkpoint_path; there "
                "are no per-epoch checkpoints to read."
            )
        filename = self.checkpoint_path / (
            MAPDeconvolver._default_checkpoint_filename.format(epoch=epoch)
        )
        if not filename.exists():
            raise FileNotFoundError(
                f"No checkpoint for epoch {epoch}: {filename}"
            )
        return self.__class__.read(filename=filename)

    @property
    def config_table(self):
        """Configuration as a single-row table."""
        config = Table(names=list(self.config), dtype=[str] * len(self.config))
        config.add_row({k: str(v) for k, v in self.config.items()})
        return config

    def plot_trace_loss(self, ax=None, which=None, **kwargs):
        """Plot the loss trace."""
        import matplotlib.pyplot as plt

        from .utils.plot import plot_trace_loss

        ax = plt.gca() if ax is None else ax
        plot_trace_loss(ax=ax, trace_loss=self.trace_loss, which=which, **kwargs)
        return ax

    def peek(self, figsize=(12, 5), kwargs_norm=None):
        """Plot the reconstruction and the loss trace."""
        import matplotlib.pyplot as plt

        from .utils.plot import add_cbar, simple_norm

        fig, axes = plt.subplots(nrows=1, ncols=2, figsize=figsize)
        self.plot_trace_loss(ax=axes[0])

        kwargs_norm = kwargs_norm or {"vmin": 0, "stretch": "asinh",
                                      "asinh_a": 0.01}
        flux = self.components.flux_total_numpy
        norm = simple_norm(flux, **kwargs_norm)
        im = axes[1].imshow(flux, origin="lower", norm=norm,
                            interpolation="None")
        add_cbar(im=im, ax=axes[1], fig=fig)

    def write(self, filename, overwrite=False, format=None):
        """Write the result to file."""
        from .utils.io import IO_FORMATS_MAP_RESULT_WRITE, get_writer

        writer = get_writer(
            filename=filename, format=format,
            registry=IO_FORMATS_MAP_RESULT_WRITE,
        )
        writer(result=self, filename=filename, overwrite=overwrite)

    @classmethod
    def read(cls, filename, format=None):
        """Read a result from file."""
        from .utils.io import IO_FORMATS_MAP_RESULT_READ, get_reader

        reader = get_reader(
            filename=filename, format=format,
            registry=IO_FORMATS_MAP_RESULT_READ,
        )
        return reader(filename=filename)
