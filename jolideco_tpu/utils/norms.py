"""Image and patch normalisations (reference ``jolideco/utils/norms.py``).

Same registry surface as the reference: 9 image norms (identity, max,
fixed-max, sigmoid, atan, inverse-cdf, asinh, log, power) and 2 patch
norms (subtract-mean, standardized). TPU-first re-design: norms are
lightweight parameter holders; the transfer functions are pure
``jnp`` expressions evaluated with an explicit ``params`` dict so that
learnable norm parameters (e.g. asinh ``alpha``/``beta``) can live in the
jitted training pytree — mirroring the reference where norm parameters
are ``nn.Parameter``s reachable from the component's module tree.
"""

import abc

import numpy as np

import jax.numpy as jnp

from .misc import format_class_str

__all__ = [
    "ImageNorm",
    "IdentityImageNorm",
    "MaxImageNorm",
    "FixedMaxImageNorm",
    "SigmoidImageNorm",
    "ATanImageNorm",
    "InverseCDFImageNorm",
    "ASinhImageNorm",
    "LogImageNorm",
    "PowerImageNorm",
    "PatchNorm",
    "SubtractMeanPatchNorm",
    "StandardizedSubtractMeanPatchNorm",
    "NORMS_REGISTRY",
    "NORMS_PATCH_REGISTRY",
]


class PatchNorm(abc.ABC):
    """Patch normalisation base class.

    Operates on ``(n_patches, p*p)`` matrices. Norm objects are static
    (jit-cache) configuration, so equality/hashing is by value: two
    norms of the same class and parameters compile to the same
    executable (deep copies must not trigger recompilation).
    """

    def _config_key(self):
        return (type(self).__name__,)

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other._config_key() == self._config_key()
        )

    def __hash__(self):
        return hash(self._config_key())

    @abc.abstractmethod
    def __call__(self, patches):
        """Normalise patches."""

    def inverse(self, patches_normed):
        """Inverse normalisation (not defined for mean subtraction)."""
        raise NotImplementedError

    def evaluate_numpy(self, patches):
        """Evaluate on a numpy array, returning numpy."""
        return np.asarray(self(jnp.asarray(patches, jnp.float32)))

    def to_dict(self):
        data = {}
        for name, cls in NORMS_PATCH_REGISTRY.items():
            if isinstance(self, cls):
                data["type"] = name
                break
        return data

    @classmethod
    def from_dict(cls, data):
        kwargs = data.copy()
        if "type" in data:
            type_ = kwargs.pop("type")
            cls = NORMS_PATCH_REGISTRY[type_]
            return cls.from_dict(kwargs)
        return cls(**kwargs)

    def __str__(self):
        return format_class_str(instance=self)


class SubtractMeanPatchNorm(PatchNorm):
    """Subtract the per-patch mean (Zoran & Weiss EPLL convention)."""

    def __call__(self, patches):
        patches_mean = jnp.nanmean(patches, axis=1, keepdims=True)
        return patches - patches_mean


class StandardizedSubtractMeanPatchNorm(PatchNorm):
    """Subtract and divide by the per-patch mean."""

    def __call__(self, patches):
        patches_mean = jnp.nanmean(patches, axis=1, keepdims=True)
        return (patches - patches_mean) / patches_mean


class ImageNorm:
    """Image normalisation base class.

    Subclasses declare trainable scalars in ``_param_names``; the
    current values are exposed through :meth:`parameters` (a dict of
    ``(1,)`` arrays that can be placed in the training pytree) and every
    transfer function accepts an optional ``params`` override so jitted
    code evaluates the norm functionally.

    Norm objects appear as static aux data of prior pytrees, so
    equality/hashing is by value (class + parameter values + frozen):
    deep copies must not invalidate jit caches.
    """

    _param_names = ()

    def __init__(self, frozen=False):
        self.frozen = frozen

    def _config_key(self):
        return (
            type(self).__name__,
            bool(self.frozen),
            tuple(float(getattr(self, name)) for name in self._param_names),
        )

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other._config_key() == self._config_key()
        )

    def __hash__(self):
        return hash(self._config_key())

    def parameters(self):
        """Trainable parameters as a dict of jnp arrays."""
        if self.frozen:
            return {}
        return {
            name: jnp.asarray(getattr(self, name), jnp.float32).reshape((1,))
            for name in self._param_names
        }

    def set_parameters(self, params):
        """Write back trained parameter values."""
        for name, value in params.items():
            setattr(self, name, float(np.asarray(value).reshape(())))

    def _get(self, params, name):
        if params is not None and name in params:
            return params[name].reshape(())
        return jnp.float32(getattr(self, name))

    @abc.abstractmethod
    def __call__(self, image, params=None):
        """Apply the norm."""

    def inverse(self, image, params=None):
        raise NotImplementedError

    def evaluate_numpy(self, image):
        return np.asarray(self(jnp.asarray(image, jnp.float32)))

    def inverse_numpy(self, image):
        return np.asarray(self.inverse(jnp.asarray(image, jnp.float32)))

    def to_dict(self):
        data = {}
        for name, cls in NORMS_REGISTRY.items():
            if isinstance(self, cls):
                data["type"] = name
                break
        for name in self._param_names:
            data[name] = float(getattr(self, name))
        return data

    @classmethod
    def from_dict(cls, data):
        kwargs = data.copy()
        if "type" in data:
            type_ = kwargs.pop("type")
            cls = NORMS_REGISTRY[type_]
            return cls.from_dict(kwargs)
        return cls(**kwargs)

    def __str__(self):
        return format_class_str(instance=self)

    def plot(self, ax=None, xrange=None, **kwargs):
        """Plot the transfer function."""
        import matplotlib.pyplot as plt

        if xrange is None:
            if isinstance(self, InverseCDFImageNorm):
                xrange = float(self.x[0]), float(self.x[-2])
            else:
                xrange = 0, 1

        ax = plt.gca() if ax is None else ax
        kwargs.setdefault("label", self.__class__.__name__)

        x = np.linspace(xrange[0], xrange[1], 1000)
        y = self.evaluate_numpy(image=x)
        ax.plot(x, y, **kwargs)
        ax.set_xlabel("Pixel value")
        ax.set_ylabel("Scaled pixel value / A.U.")
        ax.set_ylim(0, 1)
        plt.legend()
        return ax


class IdentityImageNorm(ImageNorm):
    """Identity norm."""

    def __call__(self, image, params=None):
        return image

    def inverse(self, image, params=None):
        return image


class ASinhImageNorm(ImageNorm):
    """Inverse hyperbolic sine norm with learnable alpha/beta."""

    _param_names = ("alpha", "beta")

    def __init__(self, alpha=1.0, beta=1.0, **kwargs):
        super().__init__(**kwargs)
        self.alpha = float(alpha)
        self.beta = float(beta)

    def __call__(self, image, params=None):
        alpha = self._get(params, "alpha")
        beta = self._get(params, "beta")
        return jnp.arcsinh(image / alpha) / jnp.arcsinh(beta / alpha)

    def inverse(self, image, params=None):
        alpha = self._get(params, "alpha")
        beta = self._get(params, "beta")
        return alpha * jnp.sinh(image * jnp.arcsinh(beta / alpha))


class MaxImageNorm(ImageNorm):
    """Normalise by the image maximum."""

    def __call__(self, image, params=None):
        return image / image.max()


class FixedMaxImageNorm(ImageNorm):
    """Normalise by a fixed maximum, clipped to [0, 1]."""

    _param_names = ("max_value",)

    def __init__(self, max_value, **kwargs):
        super().__init__(**kwargs)
        self.max_value = float(max_value)

    def __call__(self, image, params=None):
        max_value = self._get(params, "max_value")
        return jnp.clip(image / max_value, 0.0, 1.0)

    def inverse(self, image, params=None):
        return image * self._get(params, "max_value")


class SigmoidImageNorm(ImageNorm):
    """Sigmoid norm with learnable alpha/beta."""

    _param_names = ("alpha", "beta")

    def __init__(self, alpha=1.0, beta=1.0, **kwargs):
        super().__init__(**kwargs)
        self.alpha = float(alpha)
        self.beta = float(beta)

    def __call__(self, image, params=None):
        alpha = self._get(params, "alpha")
        beta = self._get(params, "beta")
        return 1.0 / (1.0 + jnp.exp(-(image - beta / 2.0) / alpha))

    def inverse(self, image, params=None):
        alpha = self._get(params, "alpha")
        beta = self._get(params, "beta")
        return alpha * jnp.log(image / (1.0 - image)) + beta / 2.0


class ATanImageNorm(ImageNorm):
    """Arctangent norm with learnable alpha."""

    _param_names = ("alpha",)

    def __init__(self, alpha=1.0, **kwargs):
        super().__init__(**kwargs)
        self.alpha = float(alpha)

    def __call__(self, image, params=None):
        alpha = self._get(params, "alpha")
        return 2.0 * jnp.arctan(image / alpha) / jnp.pi

    def inverse(self, image, params=None):
        # exact inverse of 2*atan(x/alpha)/pi. The reference's inverse
        # is (pi/2)*tan(y) (reference utils/norms.py:331) — wrong for
        # every input except ~0 and ignoring alpha; deliberately fixed.
        alpha = self._get(params, "alpha")
        return alpha * jnp.tan(0.5 * jnp.pi * image)


class InverseCDFImageNorm(ImageNorm):
    """Histogram-equalising norm from a tabulated CDF."""

    def __init__(self, x, cdf):
        super().__init__()
        x = jnp.asarray(x, jnp.float32)
        cdf = jnp.asarray(cdf, jnp.float32)
        if not x.shape == cdf.shape:
            raise ValueError(
                f"'x' and 'cdf' must have same shape, got {x.shape} and {cdf.shape}"
            )
        self.x = x
        self.cdf = cdf

    @classmethod
    def from_image(cls, image, bins=1000):
        """Build from the histogram of an image."""
        image = np.asarray(image)
        weights, x = np.histogram(image.ravel(), bins=bins)
        cdf = np.cumsum(weights)
        shifted = cdf - cdf.min()
        cdf = shifted / shifted.max()
        x_mean = (x[1:] + x[:-1]) / 2
        return cls(x=x_mean, cdf=cdf)

    def __call__(self, image, params=None):
        from ..ops.image import interp1d

        return interp1d(image, self.x, self.cdf)

    def _config_key(self):
        return (
            type(self).__name__,
            np.asarray(self.x).tobytes(),
            np.asarray(self.cdf).tobytes(),
        )

    def to_dict(self):
        """Serialise the tabulated CDF (the reference raises
        ``NotImplementedError`` here, reference ``norms.py:367-369``)."""
        return {
            "type": "inverse-cdf",
            "x": np.asarray(self.x).tolist(),
            "cdf": np.asarray(self.cdf).tolist(),
        }


class LogImageNorm(ImageNorm):
    """Logarithmic norm with learnable alpha."""

    _param_names = ("alpha",)

    def __init__(self, alpha=1.0, **kwargs):
        super().__init__(**kwargs)
        self.alpha = float(alpha)

    def __call__(self, image, params=None):
        alpha = self._get(params, "alpha")
        return jnp.log(image / alpha)

    def inverse(self, image, params=None):
        return self._get(params, "alpha") * jnp.exp(image)


class PowerImageNorm(ImageNorm):
    """Power-law norm; ``beta`` is a fixed buffer like the reference."""

    _param_names = ("alpha",)

    def __init__(self, alpha=1.0, beta=1.0, **kwargs):
        super().__init__(**kwargs)
        self.alpha = float(alpha)
        self.beta = float(beta)

    def __call__(self, image, params=None):
        alpha = self._get(params, "alpha")
        return jnp.power(image / self.beta, alpha)

    def inverse(self, image, params=None):
        alpha = self._get(params, "alpha")
        return self.beta * jnp.power(image, 1.0 / alpha)

    def _config_key(self):
        return super()._config_key() + (float(self.beta),)

    def to_dict(self):
        data = super().to_dict()
        data["beta"] = float(self.beta)
        return data


NORMS_REGISTRY = {
    "max": MaxImageNorm,
    "fixed-max": FixedMaxImageNorm,
    "sigmoid": SigmoidImageNorm,
    "atan": ATanImageNorm,
    "inverse-cdf": InverseCDFImageNorm,
    "asinh": ASinhImageNorm,
    "log": LogImageNorm,
    "power": PowerImageNorm,
    "identity": IdentityImageNorm,
}

NORMS_PATCH_REGISTRY = {
    "std-subtract-mean": StandardizedSubtractMeanPatchNorm,
    "subtract-mean": SubtractMeanPatchNorm,
}
