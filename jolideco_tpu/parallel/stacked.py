"""Stacked multi-observation Poisson loss.

Observations with homogeneous image shapes stack on a leading ``obs``
axis; per-observation PSFs may differ in size — their FFTs are
precomputed at a **common padded FFT shape** (``ops.fft.kernel_fft``
supports this exactly), so the whole stack is one dense array. The
per-observation forward + NLL is ``jax.vmap``-ed over that axis, which:

- turns the reference's Python dataset loop (reference
  ``loss.py:56-77``) into one batched XLA computation (bigger FFT
  batches, bigger MXU work), and
- makes observation-parallelism a pure *sharding annotation*: place the
  stacked arrays with ``NamedSharding(mesh, P("obs"))`` and jit — GSPMD
  partitions the computation and inserts the gradient ``psum`` over
  ICI. No collective code needed.

Drop-in compatible with ``PoissonLoss`` for the joint update strategy
(same ``evaluate`` / ``names_all`` / ``n_datasets`` surface).
"""

import logging

import numpy as np

import jax
import jax.numpy as jnp

from ..config import pallas_mode as _pallas_mode
from ..loss import poisson_nll
from ..ops.fft import (
    _complex_on_device,
    build_kernel_stack,
    convolve_fft_numpy,
    convolve_fft_packed_pair,
    convolve_fft_precomputed,
    kernel_fft_numpy,
    upsample_center_pad_kernels,
)
from ..ops.image import (
    rescale_image,
    shift_image,
    sum_pool,
    upsample_bilinear,
)
from ..utils.pytree import register_pytree

log = logging.getLogger(__name__)

__all__ = ["DataValidationError", "StackedPoissonLoss"]


class DataValidationError(ValueError):
    """The dataset itself is inconsistent — not merely unstackable.

    ``MAPDeconvolver._build_total_loss`` treats a plain ``ValueError``
    from the stacked build as "cannot stack, fall back to per-dataset
    models". Errors of this type mean the data is invalid for EITHER
    path (e.g. an RMF whose channel count does not match the counts),
    so the build re-raises them with the direct message instead of
    falling back to a forward that fails later inside jit with an
    opaque shape error.
    """


class StackedPoissonLoss:
    """Per-dataset Poisson terms over a stacked observation axis.

    Attributes
    ----------
    counts : ``(N, 1, C, H, W)``
    background : ``(N, 1, C, H, W)``
    exposures : dict of component name -> ``(N, 1, C, H', W')``
    psf_ffts : dict of component name -> complex ``(N, 1, C, fh, fw)``

    Notes
    -----
    The static ``psf_scale`` calibration (reference
    ``models/npred.py:178``, non-trainable per ``:333``) is applied at
    *build time*: :meth:`from_datasets` zooms each observation's
    upsampled PSF before precomputing the convolution spectra (all conv
    modes), so every evaluate path sees the scaled kernel with no
    per-step warp. ``psf_scales`` is retained for introspection only.

    Datasets carrying an ``rmf`` (energy redistribution, reference
    ``models/npred.py:184-188``) stack to one ``(N, C, K)`` matrix per
    component (``rmfs``); every evaluate path folds it with a batched
    einsum between the sum-pool and the clip, matching the per-dataset
    chain exactly.
    """

    loss_function = staticmethod(poisson_nll)

    def __init__(self, counts, background, exposures, psf_ffts, names_all,
                 component_factors, fft_shape, component_names=None,
                 has_calibration=False,
                 weights=None, psf_scales=None, psfs=None, conv_mode="fft",
                 dft_tables=None, mxu_fft_shape=None, pair_kernels=None,
                 ct_tables=None, ct_fft_shape=None, ct_pair_kernels=None,
                 ct_singles=None, pfft_pairs=None, pfft_ns=None,
                 sharded=False, static_shifts=None, static_log_norms=None,
                 spatial_mesh=None, row_axis="row", rmfs=None,
                 obs_mesh=None):
        self.counts = counts
        self.background = background
        self.exposures = dict(exposures)
        self.psf_ffts = dict(psf_ffts)
        self.psfs = dict(psfs) if psfs is not None else None
        self.dft_tables = dft_tables
        self.mxu_fft_shape = (
            tuple(mxu_fft_shape) if mxu_fft_shape is not None else None
        )
        # parameter-independent Stirling constant, per observation
        from ..loss import stirling_term_mean

        self.stirling = jax.vmap(stirling_term_mean)(counts)
        self.names_all = tuple(names_all)
        self.component_factors = tuple(component_factors)
        # canonical component order: dict pytree children re-sort by
        # KEY on unflatten inside jit, so iteration must be keyed on
        # this insertion-order aux tuple (matching the fluxes tuple)
        self.component_names = (
            tuple(component_names)
            if component_names is not None
            else tuple(exposures)
        )
        self.fft_shape = tuple(fft_shape)
        self.has_calibration = bool(has_calibration)
        self.conv_mode = str(conv_mode)
        self._weights = tuple(weights) if weights is not None else None
        self.psf_scales = tuple(psf_scales) if psf_scales is not None else None
        self.pair_kernels = dict(pair_kernels) if pair_kernels else None
        self.ct_tables = ct_tables
        self.ct_fft_shape = (
            tuple(ct_fft_shape) if ct_fft_shape is not None else None
        )
        self.ct_pair_kernels = (
            dict(ct_pair_kernels) if ct_pair_kernels else None
        )
        self.ct_singles = dict(ct_singles) if ct_singles else None
        # Pallas matmul-DFT pair spectra (conv_mode="pfft"): component
        # name -> 4 permuted-layout plane stacks, plus the per-component
        # static transform size (tuple of pairs: pytree aux data must
        # hash for the jit compilation-cache key)
        self.pfft_pairs = dict(pfft_pairs) if pfft_pairs else None
        self.pfft_ns = (
            tuple(sorted(dict(pfft_ns).items())) if pfft_ns else None
        )
        self.sharded = bool(sharded)
        # 2-D (obs, row) mesh for the distributed-FFT conv path
        # (set by parallel.spatial.shard_stacked_spatial)
        self.spatial_mesh = spatial_mesh
        # 1-D obs mesh carrying shard-local pfft pairs (set by `shard`
        # when the Pallas matmul-DFT conv partitions via shard_map)
        self.obs_mesh = obs_mesh
        self.row_axis = str(row_axis)
        # per-observation calibration values used when a calibration is
        # (partially) frozen and therefore absent from the params pytree
        self.static_shifts = static_shifts
        self.static_log_norms = static_log_norms
        # energy redistribution: component name -> (N, C, K) matrices
        self.rmfs = dict(rmfs) if rmfs else None

    @property
    def n_datasets(self):
        """Number of stacked observations."""
        return len(self.names_all)

    @property
    def weights(self):
        """Per-dataset likelihood weights."""
        if self._weights is None:
            return jnp.ones((self.n_datasets,), jnp.float32)
        return jnp.asarray(self._weights, jnp.float32)

    # ------------------------------------------------------------------
    @classmethod
    def from_datasets(cls, datasets, components, calibrations=None,
                      fft_shape=None, conv_mode="fft",
                      correct_exposure_edges=True, row_shards=None):
        """Stack homogeneous datasets into batched device arrays.

        Ragged PSF sizes are padded into one FFT shape; raises if the
        image shapes themselves differ (use the sequential path then).

        ``row_shards`` (with ``conv_mode="fft"`` and no explicit
        ``fft_shape``) grows the auto-computed FFT width until the
        half-spectrum divides over that many row shards, so the loss
        can be placed on a 2-D ``(obs, row)`` mesh with
        ``shard_stacked_spatial`` (the pencil-FFT path's all-to-all
        splits ``Fw // 2 + 1`` columns across the ``row`` axis).

        ``conv_mode="direct"`` additionally keeps the (flipped, padded)
        spatial PSF stack and runs the forward through
        ``lax.conv_general_dilated`` instead of FFTs. Measured slower
        than the FFT path at the benchmark scale (33x33 kernels,
        1024^2 images: single-channel spatial convs underutilise the
        MXU) — provided for small-kernel workloads and cross-checking.
        """
        names = list(datasets)
        shapes = {np.asarray(d["counts"]).shape for d in datasets.values()}
        if len(shapes) != 1:
            raise ValueError(
                f"Stacked observations need one common counts shape, got "
                f"{shapes}"
            )
        # energy redistribution ("rmf", threaded per component by the
        # per-dataset NPredModels.from_dataset_numpy) stacks to one
        # (N, C, K) matrix per component and is folded with an einsum
        # after the sum-pool in every evaluate path — matching the
        # per-dataset chain conv -> sum-pool -> RMF -> clip
        # (models/npred.py:184-188). Mixed presence raises so
        # MAPDeconvolver._build_total_loss falls back to the
        # per-dataset forward models instead of silently training a
        # different physical model.
        rmf_present = ["rmf" in d for d in datasets.values()]
        rmfs = None
        if any(rmf_present):
            if not all(rmf_present):
                raise ValueError(
                    "some datasets carry an 'rmf' and others do not; "
                    "the stacked path needs a homogeneous stack"
                )
            rmfs = {}
            for name in components:
                mats = []
                for ds_name, dataset in datasets.items():
                    rmf = dataset["rmf"]
                    if isinstance(rmf, dict):
                        if name not in rmf:
                            # invalid for the per-dataset path too
                            # (NPredModels.from_dataset_numpy needs the
                            # same key) — fail fast, do not fall back
                            raise DataValidationError(
                                f"dataset {ds_name!r}: dict-form 'rmf' "
                                f"is missing component {name!r}"
                            )
                        rmf = rmf[name]
                    mats.append(np.asarray(rmf, np.float32))
                rmf_shapes = {m.shape for m in mats}
                if len(rmf_shapes) != 1 or mats[0].ndim != 2:
                    raise ValueError(
                        f"stacked observations need one common 2-D rmf "
                        f"shape per component, got {rmf_shapes} for "
                        f"component {name!r}"
                    )
                rmfs[name] = jnp.asarray(np.stack(mats))
            counts_shape = next(iter(shapes))
            n_out = counts_shape[-3] if len(counts_shape) >= 3 else 1
            k_out = {m.shape[-1] for m in rmfs.values()}
            if k_out != {n_out}:
                raise DataValidationError(
                    f"rmf output channels {k_out} do not match the "
                    f"counts channel axis ({n_out})"
                )

        # calibrations first: the static psf_scale zoom must be baked
        # into the precomputed convolution spectra below (the reference
        # applies it every forward, models/npred.py:178; it is
        # non-trainable, npred.py:333, so build-time is equivalent)
        has_calibration = bool(calibrations)
        weights = None
        psf_scales = None
        static_shifts = None
        static_log_norms = None
        scale_values = None
        if calibrations:
            weights = [calibrations[n].weight for n in names]
            psf_scales = [calibrations[n].psf_scale_value for n in names]
            if any(float(s) != 1.0 for s in psf_scales):
                scale_values = np.asarray(psf_scales, np.float32)
            static_shifts = jnp.asarray(
                np.stack([np.asarray(calibrations[n].shift_xy)
                          for n in names])
            )
            static_log_norms = jnp.asarray(
                np.stack([np.asarray(calibrations[n]._background_norm)
                          for n in names])
            )

        # stack raw 2-D arrays and add the broadcast dims as a reshape:
        # np.stack over pre-expanded (1, 1, H, W) views hits a slow
        # numpy path (~12x, measured)
        counts = jnp.asarray(
            np.stack(
                [np.asarray(d["counts"], np.float32)
                 for d in datasets.values()]
            )[:, None, None],
        )
        background = jnp.asarray(
            np.stack(
                [np.asarray(d["background"], np.float32)
                 for d in datasets.values()]
            )[:, None, None],
        )

        exposures, psf_ffts, psfs, pair_kernels = {}, {}, {}, {}
        ct_pairs, ct_singles = {}, {}
        pfft_pairs, pfft_ns = {}, {}
        component_factors = []
        common_fft_shape = fft_shape
        mxu_tables, mxu_shape_common = None, None
        ct_tables, ct_shape_common = None, None

        for name, component in components.items():
            factor = component.upsampling_factor or 1
            component_factors.append(factor)

            if conv_mode in ("fft", "ct", "pfft"):
                # batched device build: ship only the raw float32
                # stacks and compute upsampling, origin-centered kernel
                # FFTs, edge correction and pair packing in ONE jitted
                # dispatch (ops.fft.build_kernel_stack) — the previous
                # host-side (float64 pocketfft) loop cost ~7 s per
                # build at benchmark scale
                raw_psfs, raw_exps = [], []
                for dataset in datasets.values():
                    psf = dataset["psf"]
                    if isinstance(psf, dict):
                        psf = psf[name]
                    raw_psfs.append(np.asarray(psf, np.float32))
                    raw_exps.append(
                        np.asarray(dataset["exposure"], np.float32)
                    )

                image_shape = tuple(
                    factor * s for s in raw_exps[0].shape[-2:]
                )
                up_shapes = [
                    (factor * p.shape[-2], factor * p.shape[-1])
                    for p in raw_psfs
                ]
                kmax = (
                    max(s[0] for s in up_shapes),
                    max(s[1] for s in up_shapes),
                )
                if common_fft_shape is None:
                    fw = image_shape[1] + kmax[1] - 1
                    if row_shards and conv_mode == "fft":
                        while (fw // 2 + 1) % row_shards:
                            fw += 1
                    common_fft_shape = (
                        image_shape[0] + kmax[0] - 1,
                        fw,
                    )
                min_shape = (
                    image_shape[0] + kmax[0] - 1,
                    image_shape[1] + kmax[1] - 1,
                )
                if (common_fft_shape[0] < min_shape[0]
                        or common_fft_shape[1] < min_shape[1]):
                    # e.g. components with different upsampling factors:
                    # no common linear-convolution shape — the caller
                    # (MAPDeconvolver._build_total_loss) falls back to
                    # the per-dataset models on this error
                    raise ValueError(
                        f"fft_shape {common_fft_shape} too small for "
                        f"component {name!r} (needs at least {min_shape})"
                    )

                # ragged PSF sizes: upsample + center-pad per shape
                # group on device, then restore observation order
                by_shape = {}
                for idx, psf in enumerate(raw_psfs):
                    by_shape.setdefault(psf.shape[-2:], []).append(idx)

                def padded_stack(scales):
                    groups, order = [], []
                    for idxs in by_shape.values():
                        order.extend(idxs)
                        group_scales = (
                            None if scales is None
                            else jnp.asarray(scales[idxs])
                        )
                        groups.append(upsample_center_pad_kernels(
                            jnp.asarray(np.stack(
                                [raw_psfs[i] for i in idxs]
                            )[:, None, None]),
                            factor=factor,
                            out_shape=kmax,
                            scales=group_scales,
                        ))
                    if len(groups) == 1:
                        return groups[0]
                    inverse = np.argsort(order)
                    return jnp.concatenate(groups)[inverse]

                # psf_scale calibrations: the convolution spectra come
                # from the zoomed kernels; exposure edge correction
                # keeps the unscaled ones (per-dataset build parity).
                # The unscaled stack is only consumed by the edge
                # correction once zoomed kernels exist, so skip its
                # build when nothing reads it.
                psfs_conv = (
                    padded_stack(scale_values)
                    if scale_values is not None else None
                )
                psfs_common = (
                    padded_stack(None)
                    if psfs_conv is None or correct_exposure_edges
                    else psfs_conv
                )

                n_obs = len(raw_psfs)
                n_pairs = (
                    n_obs // 2 if n_obs >= 2 and conv_mode == "fft" else 0
                )
                kft, exp_stack, pair_a, pair_b = build_kernel_stack(
                    psfs_common,
                    jnp.asarray(np.stack(raw_exps)[:, None, None]),
                    factor=factor,
                    fft_shape=common_fft_shape,
                    correct_edges=correct_exposure_edges,
                    n_pairs=n_pairs,
                    conv_kernels=psfs_conv,
                )
                exposures[name] = exp_stack
                psf_ffts[name] = kft
                if n_pairs:
                    pair_kernels[name] = (pair_a, pair_b)

                if conv_mode == "ct":
                    # matmul-DFT spectra in the permuted CT basis,
                    # built on device at HIGHEST precision: packed
                    # pairs for the joint path, per-observation
                    # singles for the per-obs paths (sequential
                    # strategy, odd tails, spatial sharding)
                    from ..ops.ct_conv import (
                        ct_build_pair_spectra,
                        ct_conv_shape,
                        ct_kernel_spectra,
                        make_ct_tables,
                    )
                    from ..ops.fft import _origin_centered

                    ct_shape = (
                        ct_conv_shape(min_shape[0]),
                        ct_conv_shape(min_shape[1]),
                    )
                    if ct_shape_common is None:
                        ct_shape_common = ct_shape
                        ct_tables = make_ct_tables(ct_shape)
                    elif ct_shape != ct_shape_common:
                        raise ValueError(
                            "conv_mode='ct' needs one common transform "
                            f"shape across components, got {ct_shape} "
                            f"vs {ct_shape_common}"
                        )
                    embedded = _origin_centered(
                        psfs_common if psfs_conv is None else psfs_conv,
                        ct_shape_common,
                    )
                    if n_obs >= 2:
                        ct_pairs[name] = ct_build_pair_spectra(
                            embedded, ct_tables
                        )
                    sr, si = ct_kernel_spectra(embedded, ct_tables)
                    ct_singles[name] = jnp.stack([sr, si], axis=1)

                if conv_mode == "pfft" and n_obs >= 2:
                    # Pallas matmul-DFT spectra at the component's own
                    # 128-aligned transform size (the stage tables are
                    # per-size, so components with different upsampling
                    # factors coexist). Images pad to 128 multiples in
                    # the forward; the spectra must cover that padding.
                    from ..ops.pallas_fft import (
                        PFFT_LANE,
                        pfft_pair_spectra_device,
                        pfft_size,
                    )

                    padded_image = (
                        -(-image_shape[0] // PFFT_LANE) * PFFT_LANE,
                        -(-image_shape[1] // PFFT_LANE) * PFFT_LANE,
                    )
                    p_n = pfft_size(max(
                        padded_image[0] + kmax[0] - 1,
                        padded_image[1] + kmax[1] - 1,
                    ))
                    kstack = (
                        psfs_conv if psfs_conv is not None else psfs_common
                    )
                    n_even = 2 * (n_obs // 2)
                    pfft_pairs[name] = pfft_pair_spectra_device(
                        kstack[0:n_even:2], kstack[1:n_even:2],
                        padded_image, p_n,
                    )
                    pfft_ns[name] = p_n
                continue

            # mxu/direct modes: build-time preprocessing stays
            # host-side (numpy); these run once per dataset build
            exp_list, psf_list = [], []
            for obs_idx, dataset in enumerate(datasets.values()):
                psf = dataset["psf"]
                if isinstance(psf, dict):
                    psf = psf[name]

                exposure = np.asarray(dataset["exposure"], np.float32)[
                    None, None
                ]
                psf = np.asarray(psf, np.float32)[None, None]
                if factor > 1:
                    # bilinear upsampling matches the device op exactly
                    # (single round-trip per observation)
                    exposure = np.asarray(
                        upsample_bilinear(jnp.asarray(exposure), factor)
                    )
                    psf = (
                        np.asarray(upsample_bilinear(jnp.asarray(psf), factor))
                        / factor**2
                    )

                if correct_exposure_edges:
                    # edge correction (reference npred.py:108-113),
                    # always with the UNSCALED psf (per-dataset parity)
                    weights_im = convolve_fft_numpy(
                        np.ones_like(exposure), psf
                    )
                    exposure = np.asarray(
                        exposure / weights_im, np.float32
                    )

                if (scale_values is not None
                        and float(scale_values[obs_idx]) != 1.0):
                    # static psf_scale zoom on the upsampled kernel
                    # (reference npred.py:178)
                    psf = np.asarray(
                        rescale_image(
                            jnp.asarray(psf), float(scale_values[obs_idx])
                        ),
                        np.float32,
                    )

                exp_list.append(exposure)
                psf_list.append(psf)

            image_shape = exp_list[0].shape[-2:]
            if common_fft_shape is None:
                kmax_h = max(p.shape[-2] for p in psf_list)
                kmax_w = max(p.shape[-1] for p in psf_list)
                common_fft_shape = (
                    image_shape[0] + kmax_h - 1,
                    image_shape[1] + kmax_w - 1,
                )

            kfts = [
                kernel_fft_numpy(psf, image_shape, common_fft_shape)
                for psf in psf_list
            ]
            exposures[name] = jnp.asarray(np.stack(exp_list))
            psf_ffts[name] = _complex_on_device(
                np.stack([re for re, _ in kfts]),
                np.stack([im for _, im in kfts]),
            )

            if conv_mode == "mxu":
                # permuted matmul-DFT spectra at a balanced-factor shape
                from ..ops.fft_mxu import (
                    make_dft_tables,
                    mxu_conv_shape,
                    mxu_kernel_spectrum,
                )

                kmax_h = max(p.shape[-2] for p in psf_list)
                kmax_w = max(p.shape[-1] for p in psf_list)
                mxu_shape = (
                    mxu_conv_shape(image_shape[0] + kmax_h - 1),
                    mxu_conv_shape(image_shape[1] + kmax_w - 1),
                )
                if mxu_shape_common is None:
                    mxu_shape_common = mxu_shape
                    mxu_tables = make_dft_tables(mxu_shape)
                elif mxu_shape != mxu_shape_common:
                    raise ValueError(
                        "conv_mode='mxu' needs one common transform "
                        f"shape across components, got {mxu_shape} vs "
                        f"{mxu_shape_common}"
                    )
                specs = [
                    mxu_kernel_spectrum(psf, mxu_shape_common, mxu_tables)
                    for psf in psf_list
                ]
                psfs[name] = jnp.stack(specs)

            if conv_mode == "direct":
                # pad all PSFs to a common odd kernel size, centered,
                # and flip for true convolution via lax.conv (which
                # correlates)
                kmax_h = max(p.shape[-2] for p in psf_list)
                kmax_w = max(p.shape[-1] for p in psf_list)
                if kmax_h % 2 == 0:
                    kmax_h += 1
                if kmax_w % 2 == 0:
                    kmax_w += 1
                padded = []
                for psf in psf_list:
                    kh, kw = psf.shape[-2], psf.shape[-1]
                    # center at (kh-1)//2, matching the FFT path's
                    # origin convention
                    top = (kmax_h - 1) // 2 - (kh - 1) // 2
                    left = (kmax_w - 1) // 2 - (kw - 1) // 2
                    pad = jnp.zeros(psf.shape[:-2] + (kmax_h, kmax_w),
                                    psf.dtype)
                    pad = pad.at[
                        ..., top : top + kh, left : left + kw
                    ].set(psf)
                    padded.append(pad[..., ::-1, ::-1])
                psfs[name] = jnp.stack(padded)

        if rmfs is not None:
            # the OUTPUT channel count (K) was validated against the
            # counts above; the INPUT channel count must match the
            # exposure stack's channel axis or the evaluate einsum
            # fails later inside jit with an opaque shape error
            for name in rmfs:
                c_in = int(rmfs[name].shape[-2])
                c_exp = int(exposures[name].shape[-3])
                if c_in != c_exp:
                    raise DataValidationError(
                        f"rmf for component {name!r} has {c_in} input "
                        f"channels but the exposure/counts stack has "
                        f"{c_exp} channels"
                    )

        return cls(
            counts=counts,
            background=background,
            exposures=exposures,
            psf_ffts=psf_ffts,
            names_all=names,
            component_factors=component_factors,
            component_names=list(components),
            fft_shape=common_fft_shape,
            has_calibration=has_calibration,
            weights=weights,
            psf_scales=psf_scales,
            psfs=psfs if conv_mode in ("direct", "mxu") else None,
            conv_mode=conv_mode,
            dft_tables=mxu_tables,
            mxu_fft_shape=mxu_shape_common,
            pair_kernels=pair_kernels or None,
            ct_tables=ct_tables,
            ct_fft_shape=ct_shape_common,
            ct_pair_kernels=ct_pairs or None,
            ct_singles=ct_singles or None,
            pfft_pairs=pfft_pairs or None,
            pfft_ns=pfft_ns or None,
            static_shifts=static_shifts,
            static_log_norms=static_log_norms,
            rmfs=rmfs,
        )

    # ------------------------------------------------------------------
    def _stack_calibration_params(self, calibration_params):
        """Dict-of-dicts calibration params -> stacked arrays (N, ...).

        (Partially) frozen calibrations contribute their STATIC values
        captured at build time — round 1 silently substituted zeros,
        which was wrong for any frozen calibration with a non-default
        shift or background norm.
        """
        shifts, log_norms = [], []
        for idx, name in enumerate(self.names_all):
            cal = (calibration_params or {}).get(name) or {}
            if "shift_xy" in cal:
                shifts.append(cal["shift_xy"])
            elif self.static_shifts is not None:
                shifts.append(self.static_shifts[idx])
            else:
                shifts.append(jnp.zeros((1, 2), jnp.float32))
            if "log_background_norm" in cal:
                log_norms.append(cal["log_background_norm"])
            elif self.static_log_norms is not None:
                log_norms.append(self.static_log_norms[idx])
            else:
                log_norms.append(jnp.zeros((1,), jnp.float32))
        return jnp.stack(shifts), jnp.stack(log_norms)

    def _per_obs_fn(self, fluxes):
        """Single-observation loss function (unbatched arrays)."""
        direct = self.conv_mode == "direct" and self.psfs is not None
        mxu = self.conv_mode == "mxu" and self.psfs is not None
        ct = self.conv_mode == "ct" and self.ct_singles is not None
        factors = self.component_factors
        fft_shape = self.fft_shape
        mxu_fft_shape = self.mxu_fft_shape
        ct_fft_shape = self.ct_fft_shape
        dft_tables = self.dft_tables
        ct_tables = self.ct_tables
        has_calibration = self.has_calibration
        has_rmf = self.rmfs is not None
        group = 3 if has_rmf else 2

        def per_obs(counts, background, shift, log_norm, stirling,
                    *obs_arrays):
            npred = jnp.zeros_like(background)
            for idx, flux in enumerate(fluxes):
                exposure = obs_arrays[group * idx]
                kernel = obs_arrays[group * idx + 1]
                x = flux
                if has_calibration:
                    x = shift_image(x, shift, scale=factors[idx])
                x = x * exposure
                if direct:
                    # grouped conv: each (band) channel convolves with
                    # its own kernel (single-channel kernels broadcast)
                    lead = x.shape[:-2]
                    lhs = x.reshape((1, -1) + x.shape[-2:])
                    rhs = jnp.broadcast_to(
                        kernel, lead + kernel.shape[-2:]
                    ).reshape((-1, 1) + kernel.shape[-2:])
                    x = jax.lax.conv_general_dilated(
                        lhs, rhs,
                        window_strides=(1, 1),
                        padding="SAME",
                        dimension_numbers=("NCHW", "OIHW", "NCHW"),
                        feature_group_count=lhs.shape[1],
                    ).reshape(x.shape)
                elif mxu:
                    from ..ops.fft_mxu import mxu_convolve

                    x = mxu_convolve(x, kernel, dft_tables, mxu_fft_shape)
                elif ct:
                    from ..ops.ct_conv import ct_convolve_single

                    x = ct_convolve_single(
                        x, kernel[0], kernel[1], ct_tables,
                        ct_fft_shape,
                    )
                else:
                    x = convolve_fft_precomputed(x, kernel, fft_shape)
                x = sum_pool(x, factors[idx])
                if has_rmf:
                    # energy redistribution after the sum-pool, before
                    # the clip (per-dataset chain, models/npred.py:184)
                    x = jnp.einsum(
                        "...chw,ck->...khw", x, obs_arrays[group * idx + 2]
                    )
                npred = npred + jnp.clip(x, 0.0, None)
            if has_calibration:
                npred = npred + background * jnp.exp(log_norm)
            else:
                npred = npred + background
            return self.loss_function(npred, counts, stirling=stirling)

        return per_obs

    def _stacked_args(self, calibration_params):
        """Stacked positional arguments for `_per_obs_fn` (all with a
        leading obs axis)."""
        direct = self.conv_mode == "direct" and self.psfs is not None
        mxu = self.conv_mode == "mxu" and self.psfs is not None
        ct = self.conv_mode == "ct" and self.ct_singles is not None
        if direct or mxu:
            kernels = [self.psfs[k] for k in self.component_names]
        elif ct:
            kernels = [self.ct_singles[k] for k in self.component_names]
        else:
            kernels = [self.psf_ffts[k] for k in self.component_names]
        exposures = [self.exposures[k] for k in self.component_names]

        if self.has_calibration:
            shifts, log_norms = self._stack_calibration_params(
                calibration_params
            )
        else:
            n = self.counts.shape[0]
            shifts = jnp.zeros((n, 1, 2), jnp.float32)
            log_norms = jnp.zeros((n, 1), jnp.float32)

        obs_arrays = []
        for name, exposure, kernel in zip(
            self.component_names, exposures, kernels
        ):
            obs_arrays.extend([exposure, kernel])
            if self.rmfs is not None:
                obs_arrays.append(self.rmfs[name])
        return (self.counts, self.background, shifts, log_norms,
                self.stirling, *obs_arrays)

    def evaluate(self, fluxes, calibration_params=None):
        """Per-observation mean Poisson NLL: ``(N,)`` array.

        The FFT path packs observation pairs into complex transforms
        (~1.6x FFT throughput). Under an ``obs`` mesh the packing is
        kept when every device owns an even number of observations
        (pairs stay shard-local — see :meth:`shard`); otherwise
        ``shard`` drops the pair kernels and the per-observation vmap
        lets GSPMD partition one observation per device.
        """
        if self.conv_mode == "fft" and self.spatial_mesh is not None:
            return self._evaluate_spatial_fft(fluxes, calibration_params)
        if (
            self.conv_mode == "fft"
            and self.pair_kernels is not None
        ) or (
            self.conv_mode == "ct"
            and self.ct_pair_kernels is not None
        ) or (
            self.conv_mode == "pfft"
            and self.pfft_pairs is not None
            and any(_pallas_mode())  # compiled on TPU / interpret opt-in;
                                     # otherwise the per-obs rFFT path
        ):
            return self._evaluate_packed_fft(fluxes, calibration_params)
        per_obs = self._per_obs_fn(fluxes)
        args = self._stacked_args(calibration_params)
        return jax.vmap(per_obs, in_axes=(0,) * len(args))(*args)

    def _evaluate_batched(self, fluxes, calibration_params, conv_fn):
        """Shared batched-forward scaffold.

        Calibration shifts, exposure multiply, flux-conserving
        downsample, clip, background norm and the vmapped NLL are
        identical across the batched conv backends; ``conv_fn(name, x)``
        supplies the convolution of the ``(N, 1, C, H', W')`` stack
        ``x`` for component ``name``. One implementation keeps the
        sharded and unsharded joint forwards from diverging.
        """
        n = self.counts.shape[0]
        if self.has_calibration:
            shifts, log_norms = self._stack_calibration_params(
                calibration_params
            )
        else:
            shifts = None
            log_norms = None

        npred = jnp.zeros_like(self.background)
        for idx, name in enumerate(self.component_names):
            flux = fluxes[idx]
            factor = self.component_factors[idx]
            exposure = self.exposures[name]            # (N, 1, C, H', W')
            if shifts is not None:
                x = jax.vmap(
                    lambda s: shift_image(flux, s, scale=factor)
                )(shifts)
            else:
                x = flux[None]
            x = x * exposure
            y = conv_fn(name, x)
            y = sum_pool(y, factor)
            if self.rmfs is not None:
                # per-observation energy redistribution between the
                # sum-pool and the clip (models/npred.py:184-188); the
                # channel contraction keeps any H/W row sharding intact
                y = jnp.einsum("n...chw,nck->n...khw", y, self.rmfs[name])
            npred = npred + jnp.clip(y, 0.0, None)

        if log_norms is not None:
            norm = jnp.exp(log_norms).reshape(
                (n,) + (1,) * (self.background.ndim - 1)
            )
            npred = npred + self.background * norm
        else:
            npred = npred + self.background

        return jax.vmap(self.loss_function)(
            npred, self.counts, stirling=self.stirling
        )

    def _evaluate_packed_fft(self, fluxes, calibration_params):
        """Batched forward with pair-packed convolutions.

        The pair transforms run through XLA's FFT (``conv_mode="fft"``)
        or the permuted matmul-DFT (``conv_mode="ct"``,
        ``ops.ct_conv``); an odd tail observation falls back to a
        single rFFT convolution in either mode.
        """
        n = self.counts.shape[0]
        n_pairs = n // 2
        fft_shape = self.fft_shape

        def conv_fn(name, x):
            if self.conv_mode == "ct":
                from ..ops.ct_conv import ct_convolve_pair

                ar, ai, br, bi = self.ct_pair_kernels[name]
                y0, y1 = ct_convolve_pair(
                    x[0:2 * n_pairs:2], x[1:2 * n_pairs:2],
                    ar, ai, br, bi, self.ct_tables, self.ct_fft_shape,
                )
            elif self.conv_mode == "pfft":
                y0, y1 = self._conv_pfft_pair(
                    name, x[0:2 * n_pairs:2], x[1:2 * n_pairs:2]
                )
            else:
                pair_a, pair_b = self.pair_kernels[name]
                y0, y1 = convolve_fft_packed_pair(
                    x[0:2 * n_pairs:2], x[1:2 * n_pairs:2], pair_a,
                    pair_b, fft_shape,
                )
            y = jnp.stack([y0, y1], axis=1).reshape(
                (2 * n_pairs,) + y0.shape[1:]
            )
            if n % 2:
                tail = convolve_fft_precomputed(
                    x[-1], self.psf_ffts[name][-1], fft_shape
                )
                y = jnp.concatenate([y, tail[None]], axis=0)
            return y

        return self._evaluate_batched(fluxes, calibration_params, conv_fn)

    def _conv_pfft_pair(self, name, xe, xo):
        """Pair convolution through the Pallas matmul-DFT backend.

        ``xe`` / ``xo`` are the even/odd observation stacks
        ``(P, ..., H, W)``. Images pad up to 128-multiples (the build
        sized the spectra for that padding), leading dims flatten into
        the kernel batch, and the crop restores ``(H, W)``.
        """
        from ..ops.pallas_fft import (
            PFFT_LANE,
            conv_packed_pfft,
            default_pfft_mode,
        )

        _, interpret = _pallas_mode()
        n_t = dict(self.pfft_ns)[name]
        planes = self.pfft_pairs[name]
        lead = xe.shape[:-2]
        h, w = xe.shape[-2], xe.shape[-1]
        hp = -(-h // PFFT_LANE) * PFFT_LANE
        wp = -(-w // PFFT_LANE) * PFFT_LANE
        if (hp, wp) != (h, w):
            pad = [(0, 0)] * (xe.ndim - 2) + [(0, hp - h), (0, wp - w)]
            xe = jnp.pad(xe, pad)
            xo = jnp.pad(xo, pad)

        def flat_planes(p):
            return jnp.broadcast_to(
                p, lead + p.shape[-2:]
            ).reshape(-1, n_t, n_t)

        xef = xe.reshape(-1, hp, wp)
        xof = xo.reshape(-1, hp, wp)
        plane_args = tuple(flat_planes(p) for p in planes)
        mode = default_pfft_mode()
        if self.obs_mesh is not None:
            # obs-mesh path: pairs are shard-local (see `shard`), so
            # each device runs the Pallas pipeline on its own block of
            # the flattened pair axis — no communication; shard_map is
            # only needed because GSPMD cannot split a pallas_call
            from jax.sharding import PartitionSpec

            spec = PartitionSpec("obs")

            def local_conv(xe_, xo_, ar, ai, br, bi):
                return conv_packed_pfft(
                    xe_, xo_, ar, ai, br, bi, n_t, mode, interpret
                )

            y0, y1 = jax.shard_map(
                local_conv, mesh=self.obs_mesh,
                in_specs=(spec,) * 6, out_specs=(spec, spec),
                # pallas_call outputs carry no varying-mesh-axes
                # metadata; the body is an element-of-batch map, so
                # the vma check adds nothing here (same as
                # parallel/prior.py)
                check_vma=False,
            )(xef, xof, *plane_args)
        else:
            y0, y1 = conv_packed_pfft(
                xef, xof, *plane_args, n_t, mode, interpret,
            )
        y0 = y0[:, :h, :w].reshape(lead + (h, w))
        y1 = y1[:, :h, :w].reshape(lead + (h, w))
        return y0, y1

    def _evaluate_spatial_fft(self, fluxes, calibration_params):
        """Batched forward with the row-sharded pencil-FFT convolution.

        Used on 2-D ``(obs, row)`` meshes (``shard_stacked_spatial``
        with ``conv_mode="fft"``): everything here is elementwise or a
        reduction GSPMD partitions on its own; the convolution routes
        through ``ops.dist_fft.dist_convolve_fft``, whose two
        all-to-alls are the only cross-row communication.
        """
        from ..ops.dist_fft import dist_convolve_fft

        def conv_fn(name, x):
            return dist_convolve_fft(
                x, self.psf_ffts[name], self.fft_shape,
                self.spatial_mesh, self.row_axis,
            )

        return self._evaluate_batched(fluxes, calibration_params, conv_fn)

    def __call__(self, fluxes, calibration_params=None):
        """Weighted sum of per-observation losses."""
        losses = self.evaluate(fluxes, calibration_params)
        return jnp.sum(losses * self.weights)

    def evaluate_dataset(self, idx, fluxes, calibration_params=None):
        """Single-observation loss — evaluates only observation ``idx``
        (O(1) in the stack size, so the sequential update strategy over
        a stacked loss costs the same total work as per-dataset models)."""
        per_obs = self._per_obs_fn(fluxes)
        args = self._stacked_args(calibration_params)
        return per_obs(*(a[idx] for a in args))

    # ------------------------------------------------------------------
    def shard(self, mesh):
        """Return a copy with the stacked arrays sharded over ``mesh``.

        The ``obs`` mesh axis shards the leading axis of every
        per-observation array (DFT tables replicate); XLA partitions
        the vmapped evaluation accordingly and emits the loss/gradient
        reductions as ICI collectives.
        """
        import copy as _copy

        from .mesh import replicate, shard_stacked

        new = _copy.copy(self)
        for attr in ("counts", "background", "exposures", "psf_ffts",
                     "psfs", "ct_singles", "stirling", "static_shifts",
                     "static_log_norms", "rmfs"):
            value = getattr(self, attr)
            if value is not None:
                setattr(new, attr, shard_stacked(value, mesh))
        if self.dft_tables is not None:
            new.dft_tables = replicate(self.dft_tables, mesh)
        if self.ct_tables is not None:
            new.ct_tables = replicate(self.ct_tables, mesh)
        n_obs = int(self.counts.shape[0])
        d_obs = int(mesh.shape["obs"])
        per_device = n_obs // d_obs if n_obs % d_obs == 0 else 0
        pairs_local = per_device > 0 and per_device % 2 == 0
        if self.pair_kernels is not None and pairs_local:
            # adjacent-pair packing stays shard-local: contiguous block
            # sharding gives each device an even observation count, so
            # pairs (2i, 2i+1) never straddle devices and the packed
            # complex FFTs keep their ~1.6x throughput under the mesh
            # (each device runs per_device/2 packed transforms)
            new.pair_kernels = {
                name: tuple(shard_stacked(k, mesh) for k in pair)
                for name, pair in self.pair_kernels.items()
            }
        else:
            # pairs would straddle devices (odd per-device count or
            # uneven split); keep one observation per device instead
            new.pair_kernels = None
        if self.ct_pair_kernels is not None and pairs_local:
            new.ct_pair_kernels = {
                name: tuple(shard_stacked(k, mesh) for k in pair)
                for name, pair in self.ct_pair_kernels.items()
            }
        else:
            new.ct_pair_kernels = None
        # GSPMD cannot partition a pallas_call along the pair axis,
        # but with an even per-device observation count the pairs are
        # shard-local, so the matmul-DFT conv runs per-device under
        # jax.shard_map instead (see `_conv_pfft_pair`): keep the
        # spectra, block-sharded along the pair axis, and remember the
        # mesh. Otherwise drop them — `evaluate` then runs the
        # per-observation rFFT path.
        if self.pfft_pairs is not None and pairs_local:
            new.pfft_pairs = {
                name: tuple(shard_stacked(p, mesh) for p in planes)
                for name, planes in self.pfft_pairs.items()
            }
            new.obs_mesh = mesh
        else:
            new.pfft_pairs = None
        new.sharded = True
        return new


register_pytree(
    StackedPoissonLoss,
    children_attrs=("counts", "background", "exposures", "psf_ffts", "psfs",
                    "stirling", "dft_tables", "pair_kernels",
                    "ct_tables", "ct_pair_kernels", "ct_singles",
                    "pfft_pairs",
                    "static_shifts", "static_log_norms", "rmfs"),
    aux_attrs=(
        "names_all",
        "component_factors",
        "component_names",
        "fft_shape",
        "mxu_fft_shape",
        "ct_fft_shape",
        "pfft_ns",
        "has_calibration",
        "conv_mode",
        "_weights",
        "psf_scales",
        "sharded",
        "spatial_mesh",
        "row_axis",
        "obs_mesh",
    ),
)
