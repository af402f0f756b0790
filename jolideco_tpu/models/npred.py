"""Predicted-counts forward models and per-dataset calibrations.

TPU-first re-design of the reference's ``jolideco/models/npred.py``:

- the forward physics chain
  ``flux * exposure -> PSF convolve -> sum-pool -> RMF -> clip``
  (reference ``npred.py:160-191``) is a pure function of pytree-
  registered buffers, so a whole ``NPredModels`` passes through
  ``jax.jit``/``vmap``/``shard_map``;
- the PSF rFFT is precomputed **once** at build time at a configurable
  (possibly padded-common) FFT shape — the reference re-FFTs the PSF
  every training step although it caches the transform
  (``npred.py:117-127``); padding support lets ragged per-observation
  PSFs stack into one batched array for the joint/multi-chip path;
- calibrations expose their trainable values through ``parameters()``
  like every other model object, replacing ``nn.Parameter`` surgery.
"""

import logging

import numpy as np

import jax.numpy as jnp

from ..ops.fft import convolve_fft, convolve_fft_precomputed, kernel_fft
from ..ops.image import maybe_rescale_image, shift_image, sum_pool, upsample_bilinear
from ..utils.misc import format_class_str
from ..utils.pytree import register_pytree

log = logging.getLogger(__name__)

__all__ = [
    "NPredModel",
    "NPredModels",
    "NPredCalibration",
    "NPredCalibrations",
]


class NPredModel:
    """Forward model for one (dataset, component) pair.

    Parameters
    ----------
    exposure : array ``(1, C, H', W')``
        Exposure on the (possibly upsampled) flux grid.
    psf : array ``(1, C, kh, kw)``, optional
        Point spread function (upsampled, flux-normalised).
    rmf : array ``(C, C')``, optional
        Energy redistribution matrix.
    upsampling_factor : int, optional
    fft_shape : tuple of int, optional
        FFT shape for the precomputed PSF transform (pad to a common
        shape to batch ragged observations).
    """

    def __init__(self, exposure, psf=None, rmf=None, upsampling_factor=None,
                 fft_shape=None):
        self.exposure = jnp.asarray(exposure, jnp.float32)
        self.psf = None if psf is None else jnp.asarray(psf, jnp.float32)
        self.rmf = None if rmf is None else jnp.asarray(rmf, jnp.float32)
        self.upsampling_factor = upsampling_factor

        if self.psf is not None:
            # minimal linear-convolution shape: measured fastest for
            # XLA's TPU FFT (smoothness-based padding is
            # counterproductive there — see scripts/tpu_fft_sweep2.py)
            image_shape = self.exposure.shape[-2:]
            if fft_shape is None:
                fft_shape = (
                    image_shape[0] + self.psf.shape[-2] - 1,
                    image_shape[1] + self.psf.shape[-1] - 1,
                )
            self.psf_fft = kernel_fft(self.psf, image_shape, fft_shape)
        else:
            self.psf_fft = None
        self.fft_shape = None if fft_shape is None else tuple(fft_shape)

    # ------------------------------------------------------------------
    @property
    def shape_upsampled(self):
        """Flux-grid shape."""
        return tuple(self.exposure.shape)

    @property
    def shape(self):
        """Data-grid shape."""
        shape = list(self.shape_upsampled)
        if self.upsampling_factor:
            shape[-1] //= self.upsampling_factor
            shape[-2] //= self.upsampling_factor
        return tuple(shape)

    # ------------------------------------------------------------------
    @classmethod
    def from_numpy(cls, exposure, psf, upsampling_factor,
                   correct_exposure_edges=True, fft_shape=None, rmf=None):
        """Build from data-resolution numpy arrays.

        Mirrors the reference build path (``npred.py:66-115``): bilinear
        upsampling of exposure and PSF, flux renormalisation of the PSF
        by ``factor**2``, and optional exposure edge correction dividing
        by the PSF response to a unit image.
        """
        def as_bchw(array):
            # 2-D (H, W) -> (1, 1, H, W); 3-D multiband (C, H, W) ->
            # (1, C, H, W). The reference only handles the 2-D case
            # (its unconditional [newaxis, newaxis] makes 3-D inputs
            # 5-D); accepting band stacks here lets multiband datasets
            # with an "rmf" build through from_dataset_numpy.
            array = np.asarray(array)
            if array.ndim == 2:
                array = array[np.newaxis, np.newaxis]
            elif array.ndim == 3:
                array = array[np.newaxis]
            else:
                raise ValueError(
                    f"expected a 2-D image or 3-D band stack, got "
                    f"shape {array.shape}"
                )
            return jnp.asarray(array, jnp.float32)

        exposure = as_bchw(exposure)
        psf = as_bchw(psf)

        if upsampling_factor:
            factor = int(upsampling_factor)
            exposure = upsample_bilinear(exposure, factor)
            psf = upsample_bilinear(psf, factor) / factor**2

        if correct_exposure_edges:
            weights = convolve_fft(jnp.ones_like(exposure), psf)
            exposure = exposure / weights

        return cls(
            exposure=exposure,
            psf=psf,
            rmf=rmf,
            upsampling_factor=upsampling_factor,
            fft_shape=fft_shape,
        )

    @classmethod
    def from_dataset_numpy(cls, dataset, upsampling_factor=None,
                           correct_exposure_edges=True, fft_shape=None):
        """Build from a dataset dict (``exposure``, ``psf``)."""
        return cls.from_numpy(
            exposure=dataset["exposure"],
            psf=dataset["psf"],
            upsampling_factor=upsampling_factor,
            correct_exposure_edges=correct_exposure_edges,
            fft_shape=fft_shape,
        )

    # ------------------------------------------------------------------
    def __call__(self, flux, psf_scale=None):
        return self.forward(flux, psf_scale=psf_scale)

    def forward(self, flux, psf_scale=None):
        """Forward-fold a flux image into predicted counts (traceable).

        Reference chain at ``npred.py:160-191``. When ``psf_scale`` is
        None or statically 1 the precomputed PSF FFT is used; otherwise
        the PSF is rescaled and re-transformed inside the trace.
        """
        npred = flux * self.exposure

        if self.psf is not None:
            static_unit_scale = psf_scale is None or (
                isinstance(psf_scale, (int, float)) and float(psf_scale) == 1.0
            )
            if static_unit_scale:
                npred = convolve_fft_precomputed(
                    npred, self.psf_fft, self.fft_shape
                )
            else:
                psf = maybe_rescale_image(self.psf, psf_scale)
                kft = kernel_fft(psf, npred.shape[-2:], self.fft_shape)
                npred = convolve_fft_precomputed(npred, kft, self.fft_shape)

        if self.upsampling_factor:
            npred = sum_pool(npred, self.upsampling_factor)

        if self.rmf is not None:
            # energy redistribution: contract the channel axis
            npred = jnp.einsum("bchw,ck->bkhw", npred, self.rmf)

        return jnp.clip(npred, 0.0, None)


register_pytree(
    NPredModel,
    children_attrs=("exposure", "psf", "rmf", "psf_fft"),
    aux_attrs=("upsampling_factor", "fft_shape"),
)


class NPredModels(dict):
    """Per-dataset collection of per-component forward models.

    Holds the dataset background, an optional calibration, and one
    `NPredModel` per flux component (reference ``npred.py:194-295``).
    """

    def __init__(self, background, calibration=None, values=()):
        super().__init__()
        self.background = jnp.asarray(background, jnp.float32)
        self.calibration = calibration
        for name, model in values:
            if name == "background":
                # evaluate_per_component keys the dataset background
                # under this name; a component called "background"
                # would be silently dropped from the forward model
                raise ValueError(
                    "'background' is a reserved component name (it "
                    "keys the dataset background term)"
                )
            self[name] = model

    def evaluate_per_component(self, fluxes, calibration_params=None):
        """Per-component predicted counts (traceable).

        Parameters
        ----------
        fluxes : tuple of arrays
            Upsampled fluxes, one per component (matching insertion
            order).
        calibration_params : dict, optional
            Trainable calibration values (``shift_xy``,
            ``log_background_norm``) overriding stored ones.
        """
        npreds = {}
        calibration = self.calibration

        for (name, npred_model), flux in zip(self.items(), fluxes):
            if calibration is not None:
                flux = calibration(
                    flux=flux,
                    scale=npred_model.upsampling_factor or 1,
                    params=calibration_params,
                )
                npreds[name] = npred_model(
                    flux=flux, psf_scale=calibration.psf_scale_value
                )
            else:
                npreds[name] = npred_model(flux=flux)

        if calibration is not None:
            npreds["background"] = self.background * calibration.background_norm_from(
                calibration_params
            )
        else:
            npreds["background"] = self.background

        return npreds

    def evaluate(self, fluxes, calibration_params=None):
        """Total predicted counts: sum of components + background."""
        npreds = self.evaluate_per_component(
            fluxes=fluxes, calibration_params=calibration_params
        )
        npred_total = jnp.zeros(self.background.shape, jnp.float32)
        for npred in npreds.values():
            npred_total = npred_total + npred
        return npred_total

    @classmethod
    def from_dataset_numpy(cls, dataset, components, calibration=None,
                           fft_shape=None):
        """Build per-component models from one dataset dict.

        ``dataset["psf"]`` may be a single array or a dict keyed by
        component name (reference ``npred.py:263-295``).
        """
        values = []
        for name, component in components.items():
            psf = dataset["psf"]
            if isinstance(psf, dict):
                psf = psf[name]
            # superset of the reference (whose from_dataset_numpy drops
            # a dataset "rmf", reference npred.py:263-295 — the RMF is
            # only reachable there by direct NPredModel construction)
            rmf = dataset.get("rmf")
            if isinstance(rmf, dict):
                if name not in rmf:
                    raise ValueError(
                        f"dict-form 'rmf' is missing component {name!r}"
                    )
                rmf = rmf[name]

            npred_model = NPredModel.from_numpy(
                exposure=dataset["exposure"],
                psf=psf,
                upsampling_factor=component.upsampling_factor,
                fft_shape=fft_shape,
                rmf=rmf,
            )
            values.append((name, npred_model))

        background = np.asarray(dataset["background"])[np.newaxis, np.newaxis]
        return cls(background, calibration, values)


def _npred_models_flatten(obj):
    names = tuple(obj.keys())
    children = (obj.background, obj.calibration, tuple(obj.values()))
    return children, names


def _npred_models_unflatten(names, children):
    background, calibration, models = children
    obj = dict.__new__(NPredModels)
    dict.__init__(obj)
    obj.background = background
    obj.calibration = calibration
    for name, model in zip(names, models):
        dict.__setitem__(obj, name, model)
    return obj


import jax  # noqa: E402

jax.tree_util.register_pytree_node(
    NPredModels, _npred_models_flatten, _npred_models_unflatten
)


class NPredCalibration:
    """Per-dataset nuisance parameters.

    Trainable: sub-pixel position shift (``shift_xy``) and log
    background norm. Static: ``psf_scale`` (the reference marks it
    ``requires_grad=False``, ``npred.py:333``) and the likelihood
    ``weight``.
    """

    def __init__(self, shift_x=0.0, shift_y=0.0, background_norm=1.0,
                 psf_scale=1.0, frozen=False, frozen_shift=False, weight=1.0):
        self.shift_xy = jnp.asarray([[shift_x, shift_y]], jnp.float32)
        self._background_norm = jnp.asarray(
            [np.log(background_norm)], jnp.float32
        )
        self.psf_scale_value = float(psf_scale)
        self.frozen = bool(frozen)
        # reference parity: the E0102 tutorial freezes only the shift
        # of the reference observation (example line
        # `calibrations[ref].shift_xy.requires_grad = False`)
        self.frozen_shift = bool(frozen_shift)
        self.weight = float(weight)

    # ------------------------------------------------------------------
    def parameters(self):
        """Trainable leaves; empty when frozen; the shift is excluded
        when only the shift is frozen."""
        if self.frozen:
            return {}
        params = {"log_background_norm": self._background_norm}
        if not self.frozen_shift:
            params["shift_xy"] = self.shift_xy
        return params

    def set_parameters(self, params):
        """Write back trained values."""
        if not params:
            return
        if "shift_xy" in params:
            self.shift_xy = jnp.asarray(params["shift_xy"])
        if "log_background_norm" in params:
            self._background_norm = jnp.asarray(params["log_background_norm"])

    @property
    def background_norm(self):
        """Linear background normalisation."""
        return jnp.exp(self._background_norm)

    def background_norm_from(self, params=None):
        """Background norm evaluated from a params dict (traceable)."""
        value = (
            params["log_background_norm"]
            if params is not None and "log_background_norm" in params
            else self._background_norm
        )
        return jnp.exp(value)

    @property
    def psf_scale(self):
        """PSF scale factor (static)."""
        return self.psf_scale_value

    def __call__(self, flux, scale, params=None):
        """Apply the position calibration shift to a flux image."""
        shift_xy = (
            params["shift_xy"]
            if params is not None and "shift_xy" in params
            else self.shift_xy
        )
        return shift_image(flux, shift_xy, scale=scale)

    # ------------------------------------------------------------------
    def to_dict(self):
        """Serialise calibration values."""
        shift_xy = np.asarray(self.shift_xy)
        return {
            "shift_x": float(shift_xy[0, 0]),
            "shift_y": float(shift_xy[0, 1]),
            "background_norm": float(np.exp(np.asarray(self._background_norm))[0]),
            "psf_scale": float(self.psf_scale_value),
            "frozen": bool(self.frozen),
            "frozen_shift": bool(self.frozen_shift),
            "weight": float(self.weight),
        }

    @classmethod
    def from_dict(cls, data):
        """Deserialise (see :meth:`to_dict`)."""
        return cls(**data)

    def __str__(self):
        return format_class_str(instance=self)


register_pytree(
    NPredCalibration,
    children_attrs=("shift_xy", "_background_norm"),
    aux_attrs=("psf_scale_value", "frozen", "frozen_shift", "weight"),
)


class NPredCalibrations(dict):
    """Named collection of calibrations."""

    def __init__(self, calibrations=None):
        super().__init__()
        if calibrations:
            for name, calibration in dict(calibrations).items():
                self[name] = calibration

    def parameters(self):
        """Trainable params pytree: ``{name: calibration params}``."""
        params = {}
        for name, model in self.items():
            model_params = model.parameters()
            if model_params:
                params[name] = model_params
        return params

    def set_parameters(self, params):
        """Write back trained values per calibration."""
        for name, model_params in (params or {}).items():
            self[name].set_parameters(model_params)

    def to_dict(self):
        """Serialise all calibrations."""
        return {name: model.to_dict() for name, model in self.items()}

    @classmethod
    def from_dict(cls, data):
        """Deserialise (see :meth:`to_dict`)."""
        calibrations = cls()
        for name, component_data in data.items():
            calibrations[name] = NPredCalibration.from_dict(data=component_data)
        return calibrations

    @classmethod
    def read(cls, filename, format=None):
        """Read calibrations from file."""
        from ..utils.io import IO_FORMATS_NPRED_CALIBRATIONS_READ, get_reader

        reader = get_reader(
            filename=filename, format=format,
            registry=IO_FORMATS_NPRED_CALIBRATIONS_READ,
        )
        return reader(filename)

    def write(self, filename, format=None, overwrite=False, **kwargs):
        """Write calibrations to file."""
        from ..utils.io import IO_FORMATS_NPRED_CALIBRATIONS_WRITE, get_writer

        writer = get_writer(
            filename=filename, format=format,
            registry=IO_FORMATS_NPRED_CALIBRATIONS_WRITE,
        )
        return writer(
            npred_calibrations=self, filename=filename, overwrite=overwrite,
            **kwargs,
        )

    def __str__(self):
        return format_class_str(instance=self)


jax.tree_util.register_pytree_node(
    NPredCalibrations,
    lambda obj: (tuple(obj.values()), tuple(obj.keys())),
    lambda names, children: NPredCalibrations(zip(names, children)),
)
