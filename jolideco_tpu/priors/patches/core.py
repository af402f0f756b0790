"""GMM patch prior (EPLL) and multiscale wrapper — the flagship prior.

TPU-first re-design of the reference pipeline
(``jolideco/priors/patches/core.py:189-246``):

1. image norm (optionally with learnable parameters from the training
   pytree),
2. integer cycle spin (``jnp.roll``, explicit PRNG key) and optional
   subpixel spin,
3. overlapping (or jittered) patch extraction as a static-shape gather,
4. zero-flux patch *masking* — the reference drops patches by boolean
   indexing, which is shape-dynamic; here invalid patches are zeroed
   before scoring and excluded from the sum, which is numerically
   identical and keeps the whole prior jittable,
5. per-patch mean subtraction,
6. streaming GMM scoring (``ops.gmm_score``): max over components (MAP)
   or logsumexp (marginalisation) without materialising the
   ``(n_patches, K)`` logit matrix.
"""

import logging
from math import sqrt

import numpy as np

import jax
import jax.numpy as jnp

from ...ops.fft import convolve_fft
from ...ops.image import avg_pool, cycle_spin, cycle_spin_subpixel
from ...ops.patches import (
    get_pixel_weights,
    grouped_patch_corners,
    reconstruct_from_overlapping_patches_at,
    view_as_overlapping_patches,
    view_as_overlapping_patches_grouped,
    view_as_random_overlapping_patches,
    view_as_single_group_patches,
)
from ...utils.kernels import gaussian_kernel_2d
from ...utils.norms import IdentityImageNorm, ImageNorm, PatchNorm
from ...utils.pytree import register_pytree
from ..core import Prior
from .gmm import GaussianMixtureModel

__all__ = ["GMMPatchPrior", "MultiScalePrior"]

log = logging.getLogger(__name__)

ZERO_FLUX_SENTINEL = -1e5


class GMMPatchPrior(Prior):
    """Patch prior scoring overlapping patches under a GMM.

    Parameters
    ----------
    gmm : `GaussianMixtureModel`, optional
        Defaults to the registry's ``zoran-weiss`` entry (the built-in
        GMM when the external library is not installed).
    stride : int, optional
        Patch stride; defaults to the GMM's meta stride.
    cycle_spin : bool
        Random integer roll each evaluation.
    cycle_spin_subpix : bool
        Additional random subpixel shift.
    norm : `ImageNorm`
        Image normalisation applied before patch extraction.
    patch_norm : `PatchNorm`, optional
        Defaults to the GMM's meta patch norm.
    jitter : bool
        Randomly jitter patch positions.
    marginalize : bool
        logsumexp over components instead of max.
    patch_fraction : float
        Fraction of patches to score per evaluation (stochastic,
        unbiased). Two regimes: fractions that round to at most one
        offset class (``round(fraction * n_groups) <= 1`` with
        ``n_groups = (patch/stride)**2``) sample ONE whole class — a
        non-overlapping tiling extracted with contiguous slices, the
        TPU-fast path — so e.g. ``patch_fraction=0.1`` with an 8x8
        patch at stride 4 scores exactly 1/4 of the patches, not 1/10.
        Larger fractions below 1.0 keep a uniformly-drawn random
        subset of ``round(fraction * n_patches)`` patches via a gather
        (measured slower than exact scoring at some sizes — see
        docs/performance.md). ``1.0`` scores everything.
    seed : int
        Host-side PRNG seed for eager evaluation.
    """

    def __init__(
        self,
        gmm=None,
        stride=None,
        cycle_spin=True,
        cycle_spin_subpix=False,
        norm=None,
        patch_norm=None,
        jitter=False,
        marginalize=False,
        patch_fraction=1.0,
        seed=0,
    ):
        super().__init__(seed=seed)

        if gmm is None:
            gmm = GaussianMixtureModel.from_registry(name="zoran-weiss")
        self.gmm = gmm

        if stride is None:
            stride = gmm.meta.stride
        self.stride = int(stride)

        self.cycle_spin = bool(cycle_spin)
        self.cycle_spin_subpix = bool(cycle_spin_subpix)

        if norm is None:
            norm = IdentityImageNorm()
        self.norm = norm

        if patch_norm is None:
            patch_norm = gmm.meta.patch_norm
        self.patch_norm = patch_norm

        self.jitter = bool(jitter)
        self.marginalize = bool(marginalize)
        if not 0.0 < patch_fraction <= 1.0:
            raise ValueError("patch_fraction must be in (0, 1]")
        self.patch_fraction = float(patch_fraction)

    # ------------------------------------------------------------------
    @property
    def patch_shape(self):
        """Patch shape from the GMM feature dimension (static)."""
        npix = int(sqrt(self.gmm.means.shape[-1]))
        return npix, npix

    @property
    def overlap(self):
        """Patch overlap in pixels."""
        return max(self.patch_shape) - self.stride

    @property
    def _grouped_ok(self):
        """Whether the grouped (fast-transpose) extraction applies."""
        ph, pw = self.patch_shape
        return ph == pw and ph % self.stride == 0

    @property
    def log_like_weight(self):
        """Per-patch weight correcting for patch overlap."""
        return self.stride**2 / float(np.prod(self.patch_shape))

    def parameters(self):
        """Trainable hyper-parameters: the image-norm parameters."""
        norm_params = self.norm.parameters()
        if norm_params:
            return {"norm": norm_params}
        return {}

    def set_parameters(self, params):
        if params and "norm" in params:
            self.norm.set_parameters(params["norm"])

    def _fused_ok(self, normed_shape):
        """Whether the fused image-level Pallas scorer applies here."""
        from ...config import fused_enabled
        from ...ops.gmm_fused import fused_supported
        from ...utils.norms import SubtractMeanPatchNorm

        return (
            fused_enabled()
            and not self.jitter
            and self.patch_fraction >= 1.0
            and self._grouped_ok
            and type(self.patch_norm) is SubtractMeanPatchNorm
            and self.gmm.packed is not None
            and fused_supported(
                normed_shape, self.patch_shape, self.stride,
                self.gmm.means.shape[-1],
            )
        )

    def second_order_ok(self, flux_shape):
        """Forward-over-reverse capability under the current dispatch.

        The fused image-level scorer is ``custom_vjp``-only (a Pallas
        backward cannot be transposed again, and it defines no JVP
        rule), so when it would be selected for this flux shape the
        Hessian probe must force it off first. The image norm and
        cycle spins are shape-preserving, so the dispatch shape equals
        the flux shape.
        """
        return not self._fused_ok(tuple(flux_shape))

    # ------------------------------------------------------------------
    def _evaluate_log_like(self, flux, params=None, key=None, fused=None):
        """Per-patch log-likelihoods, validity mask and metadata.

        Returns ``(values, argmax, valid, patch_means, shifts,
        subsample_scale)`` where
        ``values``/``argmax`` come from the streaming GMM scorer.
        ``fused=None`` auto-dispatches the fused image-level kernel
        (extraction + masking + mean subtraction + scoring in one
        Pallas pass, ``ops.gmm_fused``) when supported; the fused
        path enumerates padded group tilings (padded entries come
        back invalid) and returns ``patch_means=None``.
        """
        if key is None:
            key = self.next_key()
        key_spin, key_subpix, key_jitter, key_sub = jax.random.split(key, 4)

        norm_params = None if params is None else params.get("norm")
        normed = self.norm(flux, params=norm_params)

        shifts = jnp.zeros((2,), jnp.int32)
        if self.cycle_spin:
            normed, shifts = cycle_spin(
                key_spin, normed, patch_shape=self.patch_shape
            )

        if self.cycle_spin_subpix:
            normed = cycle_spin_subpixel(key_subpix, normed)

        if fused is None:
            fused = self._fused_ok(normed.shape)
        if fused:
            from ...config import gmm_precision, pallas_mode
            from ...ops.gmm_fused import gmm_score_fused_image

            _, interpret = pallas_mode()
            values, argmax, valid = gmm_score_fused_image(
                normed, self.patch_shape, self.stride, self.gmm.packed,
                ZERO_FLUX_SENTINEL, interpret=interpret,
                precision=gmm_precision(),
                marginalize=self.marginalize,
            )
            return values, argmax, valid, None, shifts, 1.0

        n_groups = (self.patch_shape[0] // self.stride) ** 2 \
            if self._grouped_ok else 0
        group_sampling = (
            self.patch_fraction < 1.0
            and not self.jitter
            and self._grouped_ok
            and int(round(self.patch_fraction * n_groups)) <= 1
        )

        if group_sampling:
            # stochastic subsampling by offset class: score ONE of the
            # (p/s)² non-overlapping tilings, drawn uniformly — an
            # unbiased estimator of the full overlapping-grid sum
            # (in the spirit of Parameswaran et al. 2018,
            # arXiv:1710.08124) built from contiguous slices only; a
            # random patch-subset gather costs more than it saves on
            # TPU (measured at benchmark scale)
            r = jax.random.randint(key_sub, (), 0, n_groups)
            patches, _ = view_as_single_group_patches(
                normed, shape=self.patch_shape, stride=self.stride,
                group_index=r, pad_value=2.0 * ZERO_FLUX_SENTINEL,
            )
            # each patch belongs to exactly one group, so scaling the
            # uniformly-drawn group's sum by n_groups is exactly
            # unbiased (n_total/n_kept would bias toward small groups)
            subsample_scale = float(n_groups)
        elif self.jitter:
            patches = view_as_random_overlapping_patches(
                key_jitter, normed, shape=self.patch_shape, stride=self.stride
            )
        elif self._grouped_ok:
            # group-order extraction: same patch set, scatter-free
            # overlap-add transpose (see ops.patches); scoring, masking
            # and the weighted mean are per-patch, so the order is an
            # internal detail (prior_image maps corners explicitly)
            patches = view_as_overlapping_patches_grouped(
                normed, shape=self.patch_shape, stride=self.stride
            )
        else:
            patches = view_as_overlapping_patches(
                normed, shape=self.patch_shape, stride=self.stride
            )

        if self.patch_fraction < 1.0 and not group_sampling:
            # generic stochastic patch subsampling: random static-size
            # subset, scaled back up (gather-based; prefer fractions
            # ≤ 1/(p/s)² which use the group path above)
            n_total = patches.shape[0]
            n_keep = max(1, int(round(self.patch_fraction * n_total)))
            idx = jax.random.permutation(key_sub, n_total)[:n_keep]
            patches = jnp.take(patches, idx, axis=0)
            subsample_scale = n_total / n_keep
        elif not group_sampling:
            subsample_scale = 1.0

        # zero-flux patch filter, shape-static: mask instead of drop
        # (reference priors/patches/core.py:213-216)
        valid = jnp.all(patches > ZERO_FLUX_SENTINEL, axis=1)
        patches = jnp.where(valid[:, None], patches, 0.0)

        patch_means = jnp.nanmean(patches, axis=1, keepdims=True)
        patches = self.patch_norm(patches)
        values, argmax = self.gmm.score(patches, marginalize=self.marginalize)
        return values, argmax, valid, patch_means, shifts, subsample_scale

    def __call__(self, flux, params=None, key=None, mask=None):
        """Scalar log-prior: overlap-weighted mean of patch scores."""
        if mask is not None:
            # the reference accepts mask and silently ignores it (a
            # TODO in its source, reference patches/core.py:214); be
            # explicit and point at the mechanism that does work
            raise NotImplementedError(
                "mask is not implemented (the reference ignores it "
                "too); use SpatialFluxComponent(flux_mask=...) — "
                "masked pixels are zeroed in the forward and the "
                "zero-flux patch filter excludes them from scoring"
            )
        values, _, valid, _, _, subsample_scale = self._evaluate_log_like(
            flux, params=params, key=key
        )
        values = jnp.where(valid, values, 0.0)
        return (
            jnp.sum(values) * subsample_scale * self.log_like_weight
            / flux.size
        )

    def shard_partial(self, flux, params=None, key=None, n_shards=1,
                      shard_index=0):
        """One shard's additive contribution to :meth:`__call__`.

        When the fused image-level scorer applies, this scores only a
        disjoint contiguous strip block of the patch enumeration
        (``ops.gmm_fused.gmm_score_fused_partial_sum``), so the
        prior's *work* — not just its data — partitions across a
        device mesh: ``parallel.prior.sharded_prior_fn`` runs it under
        ``shard_map`` with ``shard_index = lax.axis_index`` and
        ``psum``s the scalars. The PRNG ``key`` must be identical on
        every shard (the cycle spin must roll every shard's view of
        the image the same way); the key schedule matches
        ``_evaluate_log_like`` exactly, so the shard sum equals
        ``__call__`` to f32 summation-order noise — values and
        gradients.

        Falls back to ``__call__ / n_shards`` (exact value, compute
        replicated) when the fused path does not apply (jitter,
        subsampling, non-mean patch norm, narrow images, fused
        dispatch off).
        """
        if key is None:
            key = self.next_key()
        if n_shards == 1 or not self._fused_ok(tuple(flux.shape)):
            return self(flux, params=params, key=key) / n_shards

        # same key schedule as _evaluate_log_like
        key_spin, key_subpix, _, _ = jax.random.split(key, 4)
        norm_params = None if params is None else params.get("norm")
        normed = self.norm(flux, params=norm_params)
        if self.cycle_spin:
            normed, _ = cycle_spin(
                key_spin, normed, patch_shape=self.patch_shape
            )
        if self.cycle_spin_subpix:
            normed = cycle_spin_subpixel(key_subpix, normed)

        from ...config import gmm_precision, pallas_mode
        from ...ops.gmm_fused import gmm_score_fused_partial_sum

        _, interpret = pallas_mode()
        partial = gmm_score_fused_partial_sum(
            normed, self.patch_shape, self.stride, self.gmm.packed,
            ZERO_FLUX_SENTINEL, n_shards, shard_index,
            interpret=interpret, precision=gmm_precision(),
            marginalize=self.marginalize,
        )
        # fused path implies patch_fraction == 1 (subsample_scale = 1)
        return partial * self.log_like_weight / flux.size

    # ------------------------------------------------------------------
    def prior_image(self, flux):
        """Patch image from the eigen-images of the best-fit components.

        Diagnostic (host-side numpy), reference
        ``priors/patches/core.py:123-151``.
        """
        if self.jitter:
            raise ValueError(
                "Computing prior images with jittering is not supported."
            )
        if self.patch_fraction < 1.0:
            raise ValueError(
                "Computing prior images with patch subsampling is not "
                "supported."
            )

        flux = jnp.asarray(flux)
        # fused=False: the diagnostic needs patch means and the grouped
        # corner enumeration, which the fused kernel does not produce
        _, argmax, valid, patch_means, shifts, _ = self._evaluate_log_like(
            flux, fused=False
        )

        idx = np.asarray(argmax)
        eigen_images = self.gmm.eigen_images
        patches = eigen_images[idx] + np.asarray(patch_means).reshape((-1, 1, 1))

        weights = get_pixel_weights(
            patch_shape=self.patch_shape, stride=self.stride
        )
        if self._grouped_ok:
            corners = grouped_patch_corners(
                flux.shape[-2:], self.patch_shape, self.stride
            )
        else:
            h, w = flux.shape[-2:]
            ph, pw = self.patch_shape
            cy = np.arange(0, h - ph + 1, self.stride)
            cx = np.arange(0, w - pw + 1, self.stride)
            yy, xx = np.meshgrid(cy, cx, indexing="ij")
            corners = np.stack([yy.ravel(), xx.ravel()], axis=-1)
        reco = reconstruct_from_overlapping_patches_at(
            patches=weights * patches, corners=corners,
            image_shape=flux.shape[-2:],
        )
        image = np.roll(reco, shift=-1 * np.asarray(shifts), axis=(0, 1))
        scaled = self.norm.inverse(jnp.asarray(image, jnp.float32))
        return np.asarray(scaled)

    def prior_image_average(self, flux, n_average=100):
        """Average of :meth:`prior_image` over cycle spins."""
        flux = np.asarray(flux)[None, None]
        images = [self.prior_image(flux) for _ in range(n_average)]
        return np.mean(images, axis=0)

    # ------------------------------------------------------------------
    def to_dict(self):
        data = super().to_dict()
        data["stride"] = int(self.stride)
        data["cycle_spin"] = bool(self.cycle_spin)
        data["cycle_spin_subpix"] = bool(self.cycle_spin_subpix)
        data["jitter"] = bool(self.jitter)
        data["marginalize"] = bool(self.marginalize)
        data["patch_fraction"] = float(self.patch_fraction)
        data["gmm"] = self.gmm.to_dict()
        data["norm"] = self.norm.to_dict()
        data["patch_norm"] = self.patch_norm.to_dict()
        return data

    @classmethod
    def from_dict(cls, data):
        kwargs = {k: v for k, v in data.items() if k != "type"}

        gmm_config = kwargs.pop("gmm", None)
        if gmm_config is not None:
            kwargs["gmm"] = GaussianMixtureModel.from_dict(gmm_config)

        norm_config = kwargs.pop("norm", None)
        if norm_config is not None:
            kwargs["norm"] = ImageNorm.from_dict(norm_config)

        patch_norm_config = kwargs.pop("patch_norm", None)
        if patch_norm_config is not None:
            kwargs["patch_norm"] = PatchNorm.from_dict(patch_norm_config)

        kwargs.pop("device", None)  # reference-format compatibility
        return cls(**kwargs)


register_pytree(
    GMMPatchPrior,
    children_attrs=("gmm",),
    aux_attrs=(
        "stride",
        "cycle_spin",
        "cycle_spin_subpix",
        "jitter",
        "marginalize",
        "patch_fraction",
        "norm",
        "patch_norm",
    ),
    defaults={"_key": None},
)


class MultiScalePrior(Prior):
    """Apply a prior across resolution levels and sum contributions.

    Reference ``priors/patches/core.py:249-337``. Level weights are
    learnable (softmax-normalised log-weights). Level evaluation is
    always computed for every level (a zero weight multiplies the term
    away) — the reference's data-dependent ``weight == 0: continue`` is
    not expressible under jit.
    """

    def __init__(self, prior, n_levels=2, weights=None, cycle_spin=True,
                 anti_alias=True, seed=0):
        super().__init__(seed=seed)
        self.n_levels = int(n_levels)
        self.cycle_spin = bool(cycle_spin)
        self.prior = prior

        if weights is None:
            weights = np.full(self.n_levels, 1.0 / self.n_levels)
        self._log_weights = jnp.asarray(np.log(np.asarray(weights)), jnp.float32)
        self.anti_alias = bool(anti_alias)

        # anti-alias kernels are static per level
        self._kernels = tuple(
            jnp.asarray(
                gaussian_kernel_2d(2 * 2**idx / 6.0)[None, None], jnp.float32
            )
            for idx in range(self.n_levels)
        )

    @property
    def weights(self):
        """Softmax-normalised level weights."""
        w = jnp.exp(self._log_weights)
        return w / jnp.sum(w)

    def parameters(self):
        params = {"log_weights": self._log_weights}
        sub = self.prior.parameters()
        if sub:
            params["prior"] = sub
        return params

    def set_parameters(self, params):
        if not params:
            return
        if "log_weights" in params:
            self._log_weights = jnp.asarray(params["log_weights"])
        self.prior.set_parameters(params.get("prior"))

    def second_order_ok(self, flux_shape):
        """Second order is available iff the wrapped prior supports it
        at every downsampled level shape (``avg_pool`` floor-divides).

        ``flux_shape`` arrives as the full (1, 1, H, W) component shape
        from ``hessian_diagonals``; only the spatial dims matter.
        """
        h, w = tuple(flux_shape)[-2:]
        return all(
            self.prior.second_order_ok((h // 2**idx, w // 2**idx))
            for idx in range(self.n_levels)
        )

    def __call__(self, flux, params=None, key=None):
        return self._evaluate_levels(
            flux, params, key,
            lambda fl, pp, k: self.prior(flux=fl, params=pp, key=k),
        )

    def shard_partial(self, flux, params=None, key=None, n_shards=1,
                      shard_index=0):
        """One shard's contribution: every level's wrapped prior is
        evaluated through its own :meth:`Prior.shard_partial` (the
        level smoothing/pooling is replicated — cheap next to patch
        scoring). Key schedule identical to ``__call__``."""
        return self._evaluate_levels(
            flux, params, key,
            lambda fl, pp, k: self.prior.shard_partial(
                fl, params=pp, key=k, n_shards=n_shards,
                shard_index=shard_index,
            ),
        )

    def _evaluate_levels(self, flux, params, key, eval_level):
        if key is None:
            key = self.next_key()
        keys = jax.random.split(key, self.n_levels + 1)

        log_weights = (
            params["log_weights"] if params and "log_weights" in params
            else self._log_weights
        )
        w = jnp.exp(log_weights)
        weights = w / jnp.sum(w)

        prior_params = None if params is None else params.get("prior")

        if self.cycle_spin:
            flux, _ = cycle_spin(
                keys[-1], flux, patch_shape=self.prior.patch_shape
            )

        log_like = 0.0
        for idx in range(self.n_levels):
            factor = 2**idx

            if self.anti_alias:
                # NOTE: cumulative smoothing across levels, matching the
                # reference's in-place loop (patches/core.py:310-322)
                flux = convolve_fft(flux, self._kernels[idx])

            # truncate to a pool-divisible shape first (the reference's
            # F.avg_pool2d drops the remainder rows/cols the same way;
            # our avg_pool's reshape requires exact divisibility)
            h, w = flux.shape[-2:]
            flux_level = flux[
                ..., : (h // factor) * factor, : (w // factor) * factor
            ]
            flux_downsampled = avg_pool(flux_level, factor)
            log_like_level = eval_level(
                flux_downsampled, prior_params, keys[idx]
            )
            log_like += factor**2 * weights[idx] * log_like_level

        return log_like

    def to_dict(self):
        return dict(
            # registry key — Prior.from_dict dispatches on it, so a
            # serialised component with a multiscale prior reads back
            type="multiscale-prior",
            n_levels=self.n_levels,
            weights=np.asarray(self.weights).tolist(),
            cycle_spin=self.cycle_spin,
            anti_alias=self.anti_alias,
            prior=self.prior.to_dict(),
        )

    @classmethod
    def from_dict(cls, data):
        kwargs = {k: v for k, v in data.items() if k != "type"}
        prior_config = kwargs.pop("prior", None)
        if prior_config is not None:
            kwargs["prior"] = Prior.from_dict(prior_config)
        return cls(**kwargs)


register_pytree(
    MultiScalePrior,
    children_attrs=("prior", "_log_weights", "_kernels"),
    aux_attrs=("n_levels", "cycle_spin", "anti_alias"),
    defaults={"_key": None},
)
