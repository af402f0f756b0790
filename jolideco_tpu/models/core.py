"""Flux components: the learnable latent images.

Functional JAX re-design of the reference's
``jolideco/models/core.py``:

- the stored flux parameter, mask and prior are pytree children, so a
  component can be passed straight into jitted code;
- trainable values are exported with :meth:`parameters` (a plain dict
  pytree the optimiser owns) and evaluated with
  :meth:`flux_upsampled_from` — frozen components simply export nothing
  and their stored buffers are used (replacing the reference's
  parameter-list surgery, ``models/core.py:498-503``);
- masks are applied multiplicatively in the forward pass only — the
  reference's backward hook (``models/core.py:345-351``) is redundant
  given the forward multiply and has no JAX equivalent.
"""

import logging
from pathlib import Path

import numpy as np

import jax.numpy as jnp

from ..ops.image import sum_pool, upsample_bilinear
from ..priors.core import Prior, Priors, UniformPrior
from ..utils.misc import format_class_str
from ..utils.pytree import register_pytree

log = logging.getLogger(__name__)

__all__ = [
    "SpatialFluxComponent",
    "SparseSpatialFluxComponent",
    "FluxComponents",
]


def parse_flux_array(value, cls):
    """Parse a flux specification: filename, array or nested list.

    2-D images (the ``to_dict`` numpy payload, YAML lists) are promoted
    to the internal ``(1, 1, H, W)`` layout.
    """
    if isinstance(value, str):
        flux = cls.read(Path(value)).flux_upsampled
    else:
        flux = jnp.asarray(value, jnp.float32)
        if flux.ndim == 2:
            flux = flux[jnp.newaxis, jnp.newaxis]
    return flux


class SpatialFluxComponent:
    """Dense learnable flux image.

    Parameters
    ----------
    flux_upsampled : array ``(1, 1, H, W)``
        Initial flux (linear units; stored as log when
        ``use_log_flux``).
    flux_upsampled_error : array, optional
    mask : bool array ``(1, 1, H, W)``, optional
        Pixels outside the mask carry zero flux.
    use_log_flux : bool
        Optimise the log of the flux (positivity by construction).
    upsampling_factor : int
        Flux grid oversampling relative to the data grid.
    prior : `Prior`, optional
    frozen : bool
        Exclude from optimisation.
    wcs : optional world-coordinate object (opaque pass-through).
    """

    is_sparse = False

    def __init__(
        self,
        flux_upsampled,
        flux_upsampled_error=None,
        mask=None,
        use_log_flux=True,
        upsampling_factor=1,
        prior=None,
        frozen=False,
        wcs=None,
    ):
        flux_upsampled = jnp.asarray(flux_upsampled, jnp.float32)
        if not flux_upsampled.ndim == 4:
            raise ValueError(
                f"Flux tensor must be four dimensional. Got {flux_upsampled.ndim}"
            )

        if use_log_flux:
            flux_upsampled = jnp.log(flux_upsampled)

        self._flux_upsampled = flux_upsampled
        self._flux_upsampled_error = (
            None
            if flux_upsampled_error is None
            else jnp.asarray(flux_upsampled_error, jnp.float32)
        )

        if mask is not None:
            mask = jnp.asarray(mask)
            if not mask.shape == flux_upsampled.shape:
                raise ValueError(
                    "Flux and mask need to have the same shape, got "
                    f"{flux_upsampled.shape} and {mask.shape}"
                )

        self.mask = mask
        self._use_log_flux = bool(use_log_flux)
        self.upsampling_factor = int(upsampling_factor)
        self.prior = prior if prior is not None else UniformPrior()
        self.frozen = bool(frozen)
        self._wcs = wcs

    # ------------------------------------------------------------------
    # trainable-parameter interface
    def parameters(self):
        """Trainable leaves; empty when frozen."""
        if self.frozen:
            return {}
        params = {"flux": self._flux_upsampled}
        prior_params = self.prior.parameters()
        if prior_params:
            params["prior"] = prior_params
        return params

    def set_parameters(self, params):
        """Write back trained values."""
        if not params:
            return
        if "flux" in params:
            self._flux_upsampled = jnp.asarray(params["flux"])
        if "prior" in params:
            self.prior.set_parameters(params["prior"])

    def flux_upsampled_from(self, params=None):
        """Upsampled flux evaluated from a params dict (traceable)."""
        flux = (
            params["flux"]
            if params is not None and "flux" in params
            else self._flux_upsampled
        )
        if self._use_log_flux:
            flux = jnp.exp(flux)
        if self.mask is not None:
            flux = flux * self.mask
        return flux

    # ------------------------------------------------------------------
    @property
    def shape(self):
        """Full 4-D shape."""
        return tuple(self._flux_upsampled.shape)

    @property
    def shape_image(self):
        """Spatial shape."""
        return self.shape[-2:]

    @property
    def use_log_flux(self):
        """Whether the flux is optimised in log units."""
        return self._use_log_flux

    @property
    def wcs(self):
        """World coordinate system (opaque)."""
        return self._wcs

    @property
    def flux_upsampled(self):
        """Current upsampled flux."""
        return self.flux_upsampled_from()

    @property
    def flux(self):
        """Flux at data resolution (flux-conserving sum pool)."""
        return sum_pool(self.flux_upsampled, self.upsampling_factor)

    @property
    def flux_upsampled_error(self):
        """Flux error (upsampled grid)."""
        return self._flux_upsampled_error

    @property
    def flux_numpy(self):
        """Flux at data resolution as numpy."""
        return np.asarray(self.flux)[0, 0]

    @property
    def flux_upsampled_numpy(self):
        """Upsampled flux as numpy."""
        return np.asarray(self.flux_upsampled)[0, 0]

    @property
    def flux_upsampled_error_numpy(self):
        """Upsampled flux error as numpy."""
        return np.asarray(self._flux_upsampled_error)[0, 0]

    # ------------------------------------------------------------------
    @classmethod
    def from_numpy(cls, flux, mask=None, **kwargs):
        """Build from a data-resolution numpy flux image.

        The flux (and mask) are bilinearly upsampled by
        ``upsampling_factor`` (reference ``models/core.py:505-540``).
        """
        upsampling_factor = kwargs.get("upsampling_factor", None)

        flux = jnp.asarray(flux[np.newaxis, np.newaxis], jnp.float32)
        if upsampling_factor:
            flux = upsample_bilinear(flux, int(upsampling_factor))

        if mask is not None:
            mask = jnp.asarray(
                mask[np.newaxis, np.newaxis].astype(np.float32)
            )
            if upsampling_factor:
                mask = upsample_bilinear(mask, int(upsampling_factor))
            mask = mask > 0.5

        return cls(flux_upsampled=flux, mask=mask, **kwargs)

    @classmethod
    def from_flux_init_datasets(cls, datasets, **kwargs):
        """Initial flux from the mean raw flux estimate of datasets.

        Deviation from the reference (``models/core.py:543-566``): the
        raw estimate ``counts / exposure - background`` is clipped to
        its smallest positive value. The reference stores the estimate
        unclipped, which makes the default log-flux parameterisation
        NaN wherever background over-subtracts — its own tutorials
        avoid this constructor entirely and use positive random inits.
        """
        fluxes = []
        for dataset in datasets:
            flux = dataset["counts"] / dataset["exposure"] - dataset["background"]
            fluxes.append(flux)
        flux_init = np.nanmean(fluxes, axis=0)
        if kwargs.get("use_log_flux", True):
            positive = flux_init[flux_init > 0]
            floor = positive.min() if positive.size else 1.0
            flux_init = np.clip(flux_init, floor, None)
        return cls.from_numpy(flux=flux_init, **kwargs)

    # ------------------------------------------------------------------
    def to_dict(self, include_data=None):
        """Serialise configuration (optionally with data arrays)."""
        from ..utils.wcs import wcs_to_header

        data = {}
        data["use_log_flux"] = bool(self.use_log_flux)
        data["upsampling_factor"] = int(self.upsampling_factor)
        data["frozen"] = bool(self.frozen)
        data["prior"] = self.prior.to_dict()
        if self._wcs is not None:
            data["wcs"] = wcs_to_header(self._wcs)

        if include_data == "numpy":
            data["flux_upsampled"] = self.flux_upsampled_numpy
            if self._flux_upsampled_error is not None:
                data["flux_upsampled_error"] = self.flux_upsampled_error_numpy
            if self.mask is not None:
                data["mask"] = np.asarray(self.mask)[0, 0]

        return data

    @classmethod
    def from_dict(cls, data):
        """Deserialise (see :meth:`to_dict`)."""
        kwargs = data.copy()
        prior_data = kwargs.pop("prior", None)
        if prior_data:
            kwargs["prior"] = Prior.from_dict(data=prior_data)

        if isinstance(kwargs.get("wcs"), dict):
            from ..utils.wcs import wcs_from_header

            kwargs["wcs"] = wcs_from_header(kwargs["wcs"])

        kwargs["flux_upsampled"] = parse_flux_array(
            value=kwargs["flux_upsampled"], cls=cls
        )

        if "flux_upsampled_error" in kwargs and kwargs["flux_upsampled_error"] is not None:
            kwargs["flux_upsampled_error"] = parse_flux_array(
                value=kwargs["flux_upsampled_error"], cls=cls
            )

        if "mask" in kwargs and kwargs["mask"] is not None:
            kwargs["mask"] = jnp.asarray(
                np.asarray(kwargs["mask"])[np.newaxis, np.newaxis].astype(bool)
            )

        return cls(**kwargs)

    def __str__(self):
        return format_class_str(instance=self)

    @classmethod
    def read(cls, filename, format=None):
        """Read a flux component from file."""
        from ..utils.io import IO_FORMATS_FLUX_COMPONENT_READ, get_reader

        reader = get_reader(
            filename=filename, format=format,
            registry=IO_FORMATS_FLUX_COMPONENT_READ,
        )
        return reader(filename)

    def write(self, filename, format=None, overwrite=False, **kwargs):
        """Write the flux component to file."""
        from ..utils.io import IO_FORMATS_FLUX_COMPONENT_WRITE, get_writer

        writer = get_writer(
            filename=filename, format=format,
            registry=IO_FORMATS_FLUX_COMPONENT_WRITE,
        )
        return writer(
            flux_component=self, filename=filename, overwrite=overwrite, **kwargs
        )

    def plot(self, ax=None, kwargs_norm=None, **kwargs):
        """Plot the flux image."""
        import matplotlib.pyplot as plt

        from ..utils.plot import add_cbar, simple_norm

        if ax is None:
            ax = plt.gca()

        kwargs_norm = kwargs_norm or {"vmin": 0, "stretch": "asinh", "asinh_a": 0.01}
        flux = self.flux_upsampled_numpy
        kwargs.setdefault("norm", simple_norm(flux, **kwargs_norm))
        kwargs.setdefault("interpolation", "None")
        im = ax.imshow(flux, origin="lower", **kwargs)
        add_cbar(im=im, ax=ax, fig=ax.figure)
        return ax

    def as_gp_map(self):
        """Convert to a Gammapy WCS map (requires gammapy)."""
        from gammapy.maps import Map, WcsGeom

        geom = WcsGeom(wcs=self.wcs, npix=self.shape_image)
        return Map.from_geom(geom=geom, data=self.flux_numpy)


register_pytree(
    SpatialFluxComponent,
    children_attrs=("_flux_upsampled", "_flux_upsampled_error", "mask", "prior"),
    aux_attrs=("_use_log_flux", "upsampling_factor", "frozen", "is_sparse"),
    defaults={"_wcs": None},
)


class SparseSpatialFluxComponent:
    """Point-source list component: (flux, x, y) splatted onto a grid.

    Bilinear centroid-preserving splatting (reference
    ``models/core.py:54-232``, kernel ``utils/torch.py:31-38``).
    """

    is_sparse = True
    upsampling_factor = 1

    def __init__(
        self,
        flux,
        x_pos,
        y_pos,
        shape,
        use_log_flux=True,
        prior=None,
        frozen=False,
        wcs=None,
    ):
        flux = jnp.asarray(flux, jnp.float32)
        if use_log_flux:
            flux = jnp.log(flux)

        self._flux = flux
        self.x_pos = jnp.asarray(x_pos, jnp.float32)
        self.y_pos = jnp.asarray(y_pos, jnp.float32)
        self._shape = tuple(int(s) for s in shape)
        self._use_log_flux = bool(use_log_flux)
        self.prior = prior if prior is not None else UniformPrior()
        self.frozen = bool(frozen)
        self._wcs = wcs

    # ------------------------------------------------------------------
    def parameters(self):
        """Trainable leaves; empty when frozen."""
        if self.frozen:
            return {}
        params = {"flux": self._flux, "x_pos": self.x_pos, "y_pos": self.y_pos}
        prior_params = self.prior.parameters()
        if prior_params:
            params["prior"] = prior_params
        return params

    def set_parameters(self, params):
        """Write back trained values."""
        if not params:
            return
        if "flux" in params:
            self._flux = jnp.asarray(params["flux"])
        if "x_pos" in params:
            self.x_pos = jnp.asarray(params["x_pos"])
        if "y_pos" in params:
            self.y_pos = jnp.asarray(params["y_pos"])
        if "prior" in params:
            self.prior.set_parameters(params["prior"])

    def flux_upsampled_from(self, params=None):
        """Splat the point sources onto the image grid (traceable)."""
        if params is not None and "flux" in params:
            flux, x_pos, y_pos = params["flux"], params["x_pos"], params["y_pos"]
        else:
            flux, x_pos, y_pos = self._flux, self.x_pos, self.y_pos

        if self._use_log_flux:
            flux = jnp.exp(flux)

        h, w = self._shape
        xs = jnp.arange(w, dtype=jnp.float32)
        ys = jnp.arange(h, dtype=jnp.float32)

        # triangular weights per source, separable in x and y
        wx = jnp.maximum(0.0, 1.0 - jnp.abs(xs[None, :] - x_pos[:, None]))
        wy = jnp.maximum(0.0, 1.0 - jnp.abs(ys[None, :] - y_pos[:, None]))
        image = jnp.einsum("n,nh,nw->hw", flux, wy, wx)
        return image[None, None]

    # ------------------------------------------------------------------
    @property
    def use_log_flux(self):
        """Whether the flux is optimised in log units."""
        return self._use_log_flux

    @property
    def shape(self):
        """Full 4-D shape."""
        return (1, 1) + self._shape

    @property
    def wcs(self):
        """World coordinate system (opaque)."""
        return self._wcs

    @property
    def flux(self):
        """Splatted flux image."""
        return self.flux_upsampled_from()

    @property
    def flux_upsampled(self):
        """Alias of :attr:`flux` (no oversampling for sparse)."""
        return self.flux

    @property
    def flux_numpy(self):
        """Flux image as numpy."""
        return np.asarray(self.flux)[0, 0]

    @property
    def flux_upsampled_numpy(self):
        """Alias of :attr:`flux_numpy`."""
        return self.flux_numpy

    @property
    def x_pos_numpy(self):
        """x positions as numpy."""
        return np.asarray(self.x_pos)

    @property
    def y_pos_numpy(self):
        """y positions as numpy."""
        return np.asarray(self.y_pos)

    @property
    def flux_values_numpy(self):
        """Per-source linear flux values as numpy."""
        flux = self._flux
        if self._use_log_flux:
            flux = jnp.exp(flux)
        return np.asarray(flux)

    # ------------------------------------------------------------------
    @classmethod
    def from_numpy(cls, flux, x_pos, y_pos, **kwargs):
        """Build from numpy source lists."""
        flux = np.atleast_1d(np.asarray(flux, np.float32))
        x_pos = np.atleast_1d(np.asarray(x_pos, np.float32))
        y_pos = np.atleast_1d(np.asarray(y_pos, np.float32))
        return cls(flux=flux, x_pos=x_pos, y_pos=y_pos, **kwargs)

    @classmethod
    def from_sky_coord(cls, skycoord, wcs, **kwargs):
        """Build from astropy sky coordinates (requires astropy).

        ``SkyCoord.to_pixel`` returns ``(x, y)``; the reference unpacks
        it as ``y_pos, x_pos`` (reference ``models/core.py:185``),
        transposing every source position and contradicting its own
        ``sky_coord`` property (``:135``, ``xp=x_pos``). Deliberate fix,
        noted in ``docs/migration.md``.
        """
        x_pos, y_pos = skycoord.to_pixel(wcs=wcs)
        return cls.from_numpy(x_pos=x_pos, y_pos=y_pos, wcs=wcs, **kwargs)

    @property
    def sky_coord(self):
        """Positions as SkyCoord (requires astropy)."""
        from astropy.coordinates import SkyCoord

        return SkyCoord.from_pixel(
            xp=self.x_pos_numpy, yp=self.y_pos_numpy, wcs=self.wcs
        )

    def to_dict(self, **kwargs):
        """Serialise configuration and source lists."""
        data = {}
        data["use_log_flux"] = bool(self.use_log_flux)
        data["frozen"] = bool(self.frozen)
        data["shape"] = self.shape
        data["flux"] = self.flux_values_numpy
        data["x_pos"] = self.x_pos_numpy
        data["y_pos"] = self.y_pos_numpy
        data["prior"] = self.prior.to_dict()
        if self._wcs is not None:
            from ..utils.wcs import wcs_to_header

            data["wcs"] = wcs_to_header(self._wcs)
        return data

    @classmethod
    def from_dict(cls, data):
        """Deserialise (see :meth:`to_dict`)."""
        kwargs = data.copy()
        prior_data = kwargs.pop("prior", None)
        if prior_data:
            kwargs["prior"] = Prior.from_dict(data=prior_data)
        if isinstance(kwargs.get("wcs"), dict):
            from ..utils.wcs import wcs_from_header

            kwargs["wcs"] = wcs_from_header(kwargs["wcs"])
        shape = kwargs.pop("shape")
        kwargs["shape"] = tuple(shape)[-2:]
        return cls(
            flux=jnp.asarray(np.atleast_1d(kwargs.pop("flux")), jnp.float32),
            x_pos=jnp.asarray(np.atleast_1d(kwargs.pop("x_pos")), jnp.float32),
            y_pos=jnp.asarray(np.atleast_1d(kwargs.pop("y_pos")), jnp.float32),
            **kwargs,
        )

    def __str__(self):
        return format_class_str(instance=self)

    @classmethod
    def read(cls, filename, format=None):
        """Read a sparse flux component from file."""
        from ..utils.io import IO_FORMATS_SPARSE_FLUX_COMPONENT_READ, get_reader

        reader = get_reader(
            filename=filename, format=format,
            registry=IO_FORMATS_SPARSE_FLUX_COMPONENT_READ,
        )
        return reader(filename)

    def write(self, filename, format=None, overwrite=False, **kwargs):
        """Write the sparse flux component to file."""
        from ..utils.io import IO_FORMATS_SPARSE_FLUX_COMPONENT_WRITE, get_writer

        writer = get_writer(
            filename=filename, format=format,
            registry=IO_FORMATS_SPARSE_FLUX_COMPONENT_WRITE,
        )
        return writer(
            flux_component=self, filename=filename, overwrite=overwrite, **kwargs
        )

    def plot(self, ax=None, kwargs_norm=None, **kwargs):
        """Plot the splatted flux image."""
        import matplotlib.pyplot as plt

        from ..utils.plot import add_cbar, simple_norm

        if ax is None:
            ax = plt.gca()

        kwargs_norm = kwargs_norm or {"vmin": 0, "stretch": "asinh", "asinh_a": 0.01}
        flux = self.flux_numpy
        kwargs.setdefault("norm", simple_norm(flux, **kwargs_norm))
        kwargs.setdefault("interpolation", "None")
        im = ax.imshow(flux, origin="lower", **kwargs)
        add_cbar(im=im, ax=ax, fig=ax.figure)
        return ax


register_pytree(
    SparseSpatialFluxComponent,
    children_attrs=("_flux", "x_pos", "y_pos", "prior"),
    aux_attrs=("_shape", "_use_log_flux", "frozen"),
    defaults={"_wcs": None},
)


class FluxComponents(dict):
    """Ordered named collection of flux components."""

    def __init__(self, components=None):
        super().__init__()
        if components:
            for name, component in dict(components).items():
                self[name] = component

    # ------------------------------------------------------------------
    def parameters(self):
        """Trainable params pytree: ``{name: component params}``."""
        params = {}
        for name, component in self.items():
            component_params = component.parameters()
            if component_params:
                params[name] = component_params
        return params

    def set_parameters(self, params):
        """Write back trained values per component."""
        for name, component_params in (params or {}).items():
            self[name].set_parameters(component_params)

    def fluxes_from(self, params=None):
        """Tuple of upsampled fluxes evaluated from params (traceable).

        Frozen components fall back to their stored buffers.
        """
        fluxes = []
        for name, component in self.items():
            component_params = None if params is None else params.get(name)
            fluxes.append(component.flux_upsampled_from(component_params))
        return tuple(fluxes)

    def to_flux_tuple(self):
        """Current fluxes as a tuple."""
        return self.fluxes_from()

    # ------------------------------------------------------------------
    @property
    def priors(self):
        """Priors keyed like the components."""
        priors = Priors()
        for name, component in self.items():
            priors[name] = component.prior
        return priors

    @property
    def wcs(self):
        """First non-None component WCS (shared sky frame)."""
        for component in self.values():
            if component.wcs is not None:
                return component.wcs
        return None

    @property
    def flux_upsampled_total(self):
        """Sum of upsampled fluxes."""
        values = list(self.values())
        flux = jnp.zeros(values[0].shape)
        for component in values:
            flux = flux + component.flux_upsampled
        return flux

    @property
    def fluxes_numpy(self):
        """Data-resolution fluxes as numpy dict."""
        return {name: comp.flux_numpy for name, comp in self.items()}

    @property
    def fluxes_upsampled_numpy(self):
        """Upsampled fluxes as numpy dict."""
        return self.to_numpy()

    @property
    def flux_upsampled_total_numpy(self):
        """Summed upsampled flux as numpy."""
        return np.sum(list(self.fluxes_upsampled_numpy.values()), axis=0)

    @property
    def flux_total_numpy(self):
        """Summed data-resolution flux as numpy."""
        return np.sum(list(self.fluxes_numpy.values()), axis=0)

    def to_numpy(self):
        """Upsampled fluxes as squeezed numpy arrays."""
        fluxes = {}
        for name, component in self.items():
            fluxes[name] = np.squeeze(np.asarray(component.flux_upsampled))
        return fluxes

    def set_flux_errors(self, flux_errors):
        """Attach flux errors per component."""
        for name, flux_error in flux_errors.items():
            self[name]._flux_upsampled_error = jnp.asarray(flux_error)

    # ------------------------------------------------------------------
    def to_dict(self, include_data=None):
        """Serialise all components."""
        return {
            name: component.to_dict(include_data=include_data)
            for name, component in self.items()
        }

    @classmethod
    def from_dict(cls, data):
        """Deserialise components (sparse entries auto-detected)."""
        components = cls()
        for name, component_data in data.items():
            if "x_pos" in component_data:
                component = SparseSpatialFluxComponent.from_dict(component_data)
            else:
                component = SpatialFluxComponent.from_dict(component_data)
            components[name] = component
        return components

    @classmethod
    def read(cls, filename, format=None):
        """Read flux components from file."""
        from ..utils.io import IO_FORMATS_FLUX_COMPONENTS_READ, get_reader

        reader = get_reader(
            filename=filename, format=format,
            registry=IO_FORMATS_FLUX_COMPONENTS_READ,
        )
        return reader(filename=filename)

    def write(self, filename, overwrite=False, format=None, **kwargs):
        """Write flux components to file."""
        from ..utils.io import IO_FORMATS_FLUX_COMPONENTS_WRITE, get_writer

        writer = get_writer(
            filename=filename, format=format,
            registry=IO_FORMATS_FLUX_COMPONENTS_WRITE,
        )
        return writer(
            flux_components=self, filename=filename, overwrite=overwrite, **kwargs
        )

    def plot(self, figsize=None, kwargs_norm=None, **kwargs):
        """Plot all component images plus the total."""
        import matplotlib.pyplot as plt

        from ..utils.plot import add_cbar, simple_norm

        ncols = len(self) + 1
        if figsize is None:
            figsize = (ncols * 5, 5)

        fig, axes = plt.subplots(nrows=1, ncols=ncols, figsize=figsize)
        axes = np.atleast_1d(axes)

        kwargs_norm = kwargs_norm or {"vmin": 0, "stretch": "asinh", "asinh_a": 0.01}
        flux = self.flux_total_numpy
        norm = simple_norm(flux, **kwargs_norm)
        im = axes[0].imshow(flux, origin="lower", norm=norm, **kwargs)
        axes[0].set_title("Total")

        for ax, name in zip(axes[1:], self.fluxes_numpy):
            component = self[name]
            component.plot(ax=ax, kwargs_norm=kwargs_norm, **kwargs)
            ax.set_title(name.title())

        add_cbar(im=im, ax=axes[-1], fig=fig)
        return axes

    def __str__(self):
        return format_class_str(instance=self)


def _flux_components_flatten(obj):
    names = tuple(obj.keys())
    return tuple(obj.values()), names


def _flux_components_unflatten(names, children):
    obj = FluxComponents()
    for name, child in zip(names, children):
        dict.__setitem__(obj, name, child)
    return obj


import jax  # noqa: E402

jax.tree_util.register_pytree_node(
    FluxComponents, _flux_components_flatten, _flux_components_unflatten
)
