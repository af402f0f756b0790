"""Gaussian mixture model over image patches (EPLL-style).

Re-design of the reference's ``jolideco/priors/patches/gmm.py`` for
JAX/TPU:

- the model is a registered pytree: its buffers (means, covariances,
  precision-Cholesky factors, derived scoring arrays) are traced
  children so a ``GaussianMixtureModel`` can be passed straight into
  jitted training steps; meta data is static aux.
- scoring arrays needed by the hot kernel (``mu_k @ P_k``,
  ``log|P_k|``, log weights, trapezoidal pixel weights) are precomputed
  once at construction instead of per-call lazyproperties.
- the registry is **lazy** (looked up on first access) and always
  contains a built-in GMM shipped with the package, so nothing fails at
  import time when ``$JOLIDECO_GMM_LIBRARY`` is unset — fixing the
  reference's import-time crash (reference ``gmm.py:493-508``).
"""

import json
import logging
import os
from collections.abc import Mapping
from dataclasses import dataclass, field
from pathlib import Path
from typing import Optional

import numpy as np

import jax.numpy as jnp

from ...ops.gmm_score import gmm_log_prob_matrix, gmm_score
from ...ops.linalg import compute_precision_cholesky
from ...ops.patches import get_pixel_weights
from ...utils.misc import format_class_str
from ...utils.norms import PatchNorm, SubtractMeanPatchNorm
from ...utils.pytree import register_pytree

__all__ = ["GaussianMixtureModel", "GaussianMixtureModelMeta", "GMM_REGISTRY"]

log = logging.getLogger(__name__)

BUILTIN_GMM_NAME = "builtin-8x8-v1"
ASTRO_GMM_NAME = "astro-snr-v1"

# Model names published by the reference's external
# jolideco-gmm-prior-library (reference ``gmm.py:71``,
# ``examples/first-steps.py:109``). Without that library installed they
# resolve to a shipped substitute, with a warning.
REFERENCE_LIBRARY_ALIASES = (
    "zoran-weiss",
    "gleam-v0.1",
    "jwst-cas-a-v0.1",
    "chandra-snrs-v0.1",
)


@dataclass(eq=False)
class GaussianMixtureModelMeta:
    """GMM meta data: patch stride and patch normalisation.

    ``stride`` drives the trapezoidal overlap down-weighting of pixels
    in the log-likelihood (reference ``gmm.py:24-61``). Compared and
    hashed by value — the meta is static jit-cache aux data, and deep
    copies must not trigger recompilation.
    """

    stride: Optional[int] = None
    patch_norm: PatchNorm = field(default_factory=SubtractMeanPatchNorm)

    def __eq__(self, other):
        return (
            type(other) is type(self)
            and other.stride == self.stride
            and other.patch_norm == self.patch_norm
        )

    def __hash__(self):
        return hash((self.stride, self.patch_norm))


class GaussianMixtureModel:
    """Gaussian mixture model with weighted patch log-probabilities.

    Parameters
    ----------
    means : array ``(K, d)``
    covariances : array ``(K, d, d)``
    weights : array ``(K,)``
    precisions_cholesky : array ``(K, d, d)``
    meta : `GaussianMixtureModelMeta`, optional
    """

    # provenance: set by from_registry, carried as static pytree aux
    _registry_name = None

    def __init__(self, means, covariances, weights, precisions_cholesky, meta=None):
        self.means = jnp.asarray(means, jnp.float32)
        self.covariances = jnp.asarray(covariances, jnp.float32)
        self.weights = jnp.asarray(weights, jnp.float32)
        self.precisions_cholesky = jnp.asarray(precisions_cholesky, jnp.float32)
        self.meta = meta or GaussianMixtureModelMeta()

        # derived scoring buffers (host-side numpy for f64 accuracy,
        # stored as f32 device arrays)
        means64 = np.asarray(means, np.float64)
        prec64 = np.asarray(precisions_cholesky, np.float64)
        self.means_precisions_cholesky = jnp.asarray(
            np.einsum("kd,kde->ke", means64, prec64), jnp.float32
        )
        diag = np.einsum("kii->ki", prec64)
        self.log_det_cholesky = jnp.asarray(
            np.sum(np.log(diag), axis=1), jnp.float32
        )
        self.log_weights = jnp.asarray(
            np.log(np.asarray(weights, np.float64)), jnp.float32
        )
        self.pixel_weights = jnp.asarray(
            self._pixel_weights_numpy(), jnp.float32
        ).reshape(-1)

        # packed buffers for the Pallas scoring kernel (host-side once)
        from ...ops.gmm_pallas import pack_gmm_buffers, pallas_supported

        if pallas_supported(self.n_features, self.n_components):
            self.packed = pack_gmm_buffers(
                np.asarray(self.means_precisions_cholesky),
                prec64,
                np.asarray(self.log_det_cholesky),
                np.asarray(self.log_weights),
                np.asarray(self.pixel_weights),
            )
        else:
            self.packed = None

    def _pixel_weights_numpy(self):
        if self.meta.stride is None:
            return np.ones(self.patch_shape)
        return get_pixel_weights(
            patch_shape=self.patch_shape, stride=self.meta.stride
        )

    # ------------------------------------------------------------------
    # basic properties
    @property
    def means_numpy(self):
        return np.asarray(self.means)

    @property
    def covariances_numpy(self):
        return np.asarray(self.covariances)

    @property
    def weights_numpy(self):
        return np.asarray(self.weights)

    @property
    def precisions_cholesky_numpy(self):
        return np.asarray(self.precisions_cholesky)

    @property
    def log_weights_numpy(self):
        return np.log(self.weights_numpy)

    @property
    def log_det_cholesky_numpy(self):
        return np.asarray(self.log_det_cholesky)

    @property
    def pixel_weights_numpy(self):
        return np.asarray(self.pixel_weights).reshape((1, -1))

    @property
    def patch_shape(self):
        npix = int(round(self.means.shape[-1] ** 0.5))
        return npix, npix

    @property
    def n_features(self):
        return self.covariances.shape[1]

    @property
    def n_components(self):
        return self.covariances.shape[0]

    # ------------------------------------------------------------------
    # scoring
    def _score_arrays(self):
        return (
            self.means_precisions_cholesky,
            self.precisions_cholesky,
            self.log_det_cholesky,
            self.log_weights,
            self.pixel_weights,
        )

    def estimate_log_prob(self, x):
        """Full ``(N, K)`` weighted log-probability matrix (traceable)."""
        return gmm_log_prob_matrix(x, *self._score_arrays())

    def score(self, x, marginalize=False):
        """Streaming reduced score: ``(values (N,), argmax (N,))``.

        The training-loop path — never materialises ``(N, K)``.
        Dispatches to the Pallas TPU kernel for the MAP (max) reduction
        when enabled (``jolideco_tpu.config``); logsumexp marginalise
        and unsupported shapes use the XLA scan.
        """
        from ...config import gmm_precision, pallas_mode

        enabled, interpret = pallas_mode()
        precision = gmm_precision()

        # the quadratic-form kernel beats the XLA blocked scan at every
        # precision on v5e (HIGHEST: one f32 6-pass contraction with no
        # padding waste vs the scan's 12.5 ms; HIGH: split-float bf16x3;
        # DEFAULT: raw bf16), and it serves both the MAP max and the
        # marginalise logsumexp from the same materialised logit tile.
        if enabled and self.packed is not None:
            from ...ops.gmm_pallas import gmm_score_pallas

            return gmm_score_pallas(
                x,
                self.packed,
                self.means_precisions_cholesky,
                self.precisions_cholesky,
                self.pixel_weights,
                interpret,
                precision,
                marginalize,
            )
        return gmm_score(
            x, *self._score_arrays(), marginalize=marginalize,
            precision=precision,
        )

    def estimate_log_prob_numpy(self, x):
        """Numpy reference implementation (float64)."""
        x = np.asarray(x, np.float64)
        n_samples, n_features = x.shape
        means = np.asarray(self.means, np.float64)
        prec = np.asarray(self.precisions_cholesky, np.float64)
        pw = np.asarray(self.pixel_weights, np.float64)

        log_prob = np.empty((n_samples, self.n_components))
        for k, (mu, prec_chol) in enumerate(zip(means, prec)):
            y = np.dot(x, prec_chol) - np.dot(mu, prec_chol)
            log_prob[:, k] = np.sum(np.square(y) * pw, axis=1)

        log_det = np.sum(np.log(np.einsum("kii->ki", prec)), axis=1)
        return (
            -0.5 * (n_features * np.log(2 * np.pi) + log_prob)
            + log_det
            + np.log(np.asarray(self.weights, np.float64))
        )

    # ------------------------------------------------------------------
    # constructors
    @classmethod
    def from_numpy(cls, means, covariances, weights, meta=None):
        """Build from raw numpy means/covariances/weights."""
        precisions_cholesky = compute_precision_cholesky(covariances=covariances)
        return cls(
            means=means,
            covariances=covariances,
            weights=weights,
            precisions_cholesky=precisions_cholesky,
            meta=meta,
        )

    @classmethod
    def from_sklearn_gmm(cls, gmm):
        """Build from a fitted ``sklearn.mixture.GaussianMixture``."""
        return cls.from_numpy(
            means=gmm.means_,
            covariances=gmm.covariances_,
            weights=gmm.weights_,
        )

    @classmethod
    def from_registry(cls, name, **kwargs):
        """Build a registered GMM by name."""
        registry = GMM_REGISTRY
        if name not in registry:
            raise ValueError(
                f"Not a supported GMM {name!r}, choose from {list(registry)}"
            )
        # registry entry provides defaults; explicit caller kwargs win
        kwargs = {**registry[name], **kwargs}
        substitute_of = kwargs.pop("substitute_of", None)
        if substitute_of is not None:
            log.warning(
                f"GMM {name!r} refers to a model from the external "
                "jolideco-gmm-prior-library, which is not installed "
                "($JOLIDECO_GMM_LIBRARY unset or missing the entry); "
                f"substituting the shipped {substitute_of!r} model. "
                "Results will differ numerically from the reference "
                "library model."
            )
        gmm = cls.read(**kwargs)
        # remember the provenance so to_dict can serialise a registry
        # reference without rescanning (and re-reading) the registry
        gmm._registry_name = name
        return gmm

    @classmethod
    def read(cls, filename, format="npz", **kwargs):
        """Read a GMM from file.

        Parameters
        ----------
        filename : str or Path
        format : {"npz", "epll-matlab", "epll-matlab-16x16", "table"}
            ``npz`` is the native format: arrays ``means``,
            ``covariances``, ``weights`` plus optional scalars
            ``stride`` and ``patch_norm``. The EPLL matlab formats match
            the reference readers (reference ``gmm.py:337-389``);
            ``table`` requires astropy.
        """
        filename = Path(os.path.expandvars(str(filename)))

        if format == "npz":
            with np.load(filename, allow_pickle=False) as data:
                means = data["means"]
                covariances = data["covariances"]
                weights = data["weights"]
                stride = int(data["stride"]) if "stride" in data else None
                patch_norm_type = (
                    str(data["patch_norm"]) if "patch_norm" in data
                    else "subtract-mean"
                )
            meta = GaussianMixtureModelMeta(
                stride=stride,
                patch_norm=PatchNorm.from_dict({"type": patch_norm_type}),
            )
        elif format == "epll-matlab":
            import scipy.io as sio

            gmm_dict = sio.loadmat(str(filename))
            gmm_data = gmm_dict["GS"]
            means = gmm_data["means"][0][0].T
            covariances = gmm_data["covs"][0][0].T
            weights = gmm_data["mixweights"][0][0][:, 0]
            meta = GaussianMixtureModelMeta(
                stride=4, patch_norm=SubtractMeanPatchNorm()
            )
        elif format == "epll-matlab-16x16":
            import scipy.io as sio

            gmm_dict = sio.loadmat(str(filename))
            gmm_data = gmm_dict["GMM"]
            covariances = gmm_data["covs"][0][0].T
            weights = gmm_data["mixweights"][0][0][:, 0]
            # zero means sized from the data (the reference hardcodes
            # (200, 256), reference ``gmm.py:372`` — broken for any
            # other component count)
            means = np.zeros(covariances.shape[:2])
            meta = GaussianMixtureModelMeta(
                stride=8, patch_norm=SubtractMeanPatchNorm()
            )
        elif format == "table":
            try:
                from astropy.table import Table
            except ImportError as exc:
                raise ImportError(
                    "Reading 'table'-format GMMs requires astropy, which "
                    "is not installed. Convert to 'npz' instead."
                ) from exc
            table = Table.read(str(filename))
            means = table["means"].data
            weights = table["weights"].data
            covariances = table["covariances"].data
            patch_norm_type = table.meta.get("PNPTYPE", "subtract-mean")
            npix = int((table["means"].shape[-1]) ** 0.5)
            meta = GaussianMixtureModelMeta(
                stride=npix // 2,
                patch_norm=PatchNorm.from_dict({"type": patch_norm_type}),
            )
        else:
            raise ValueError(f"Not a supported format {format}")

        return cls.from_numpy(
            means=means, covariances=covariances, weights=weights, meta=meta,
            **kwargs,
        )

    def write(self, filename):
        """Write in the native npz format."""
        data = {
            "means": self.means_numpy,
            "covariances": self.covariances_numpy,
            "weights": self.weights_numpy,
        }
        if self.meta.stride is not None:
            data["stride"] = np.int64(self.meta.stride)
        data["patch_norm"] = np.str_(
            self.meta.patch_norm.to_dict().get("type", "subtract-mean")
        )
        np.savez_compressed(filename, **data)

    # ------------------------------------------------------------------
    # transforms / diagnostics
    def reduce_to_topk(self, k):
        """Keep the ``k`` highest-weight components."""
        idx = np.argsort(self.weights_numpy)[::-1][:k]
        return self.__class__.from_numpy(
            means=self.means_numpy[idx],
            covariances=self.covariances_numpy[idx],
            weights=self.weights_numpy[idx],
            meta=self.meta,
        )

    @property
    def eigen_images(self):
        """Per-component eigen images ``(K, p, p)``."""
        from scipy import linalg

        eigen_images = []
        for idx in range(self.n_components):
            w, v = linalg.eigh(self.covariances_numpy[idx])
            data = (v @ w).reshape(self.patch_shape)
            eigen_images.append(data)
        return np.stack(eigen_images)

    def plot_eigen_images(self, ncols=20, figsize=None):
        """Plot eigen images."""
        import matplotlib.pyplot as plt

        nrows = -(-self.n_components // ncols)  # ceil: plot every one
        if figsize is None:
            width = 12
            figsize = (width, width * nrows / ncols)
        # the property recomputes K eigendecompositions — hoist it
        images = self.eigen_images
        _, axes = plt.subplots(ncols=ncols, nrows=nrows, figsize=figsize)
        for idx, ax in enumerate(np.atleast_1d(axes).flat):
            if idx >= self.n_components:
                ax.set_visible(False)
                continue
            ax.imshow(images[idx])
            ax.set_axis_off()
            ax.set_title(f"{idx}")

    def plot_mean_images(self, ncols=20, figsize=None):
        """Plot mean images."""
        import matplotlib.pyplot as plt

        nrows = -(-self.n_components // ncols)  # ceil: plot every one
        if figsize is None:
            width = 12
            figsize = (width, width * nrows / ncols)
        _, axes = plt.subplots(ncols=ncols, nrows=nrows, figsize=figsize)
        for idx, ax in enumerate(np.atleast_1d(axes).flat):
            if idx >= self.n_components:
                ax.set_visible(False)
                continue
            ax.imshow(self.means_numpy[idx].reshape(self.patch_shape))
            ax.set_axis_off()
            ax.set_title(f"{idx}")

    @property
    def covariance_det(self):
        """Determinant of the first covariance matrix."""
        return np.linalg.det(self.covariances_numpy[0])

    def kl_divergence(self, other):
        """KL divergence vs another single-component GMM."""
        if not (self.n_components == 1 and other.n_components == 1):
            raise ValueError(
                "KL divergence can only be computed for single component GMM"
            )
        k = self.means_numpy.shape[1]
        precision_other = np.linalg.inv(other.covariances_numpy[0])
        diff = self.means_numpy[0] - other.means_numpy[0]
        term_mean = diff.T @ precision_other @ diff
        term_trace = np.trace(precision_other @ self.covariances_numpy[0])
        term_log = np.log(other.covariance_det / self.covariance_det)
        return 0.5 * (term_log - k + term_mean + term_trace)

    def symmetric_kl_divergence(self, other):
        """Symmetrised KL divergence."""
        return other.kl_divergence(other=self) + self.kl_divergence(other=other)

    def is_equal(self, other):
        """Buffer-shape + covariance equality check."""
        if not self.covariances.shape == other.covariances.shape:
            return False
        return np.allclose(self.covariances_numpy, other.covariances_numpy)

    # ------------------------------------------------------------------
    # serialization
    def to_dict(self):
        """Serialise as a registry reference, or inline when unknown.

        A model built via :meth:`from_registry` serialises as its
        registry name (O(1) — no registry scan; the round-1 version
        instantiated every registry entry to test equality, reading and
        Cholesky-factorising the whole library per serialisation).
        Models of other provenance inline their arrays — a superset of
        the reference, which can only serialise registry GMMs
        (``gmm.py:458-471`` there).
        """
        name = getattr(self, "_registry_name", None)
        if name is not None:
            return {"type": name}

        data = {"type": "inline"}
        data["means"] = self.means_numpy
        data["covariances"] = self.covariances_numpy
        data["weights"] = self.weights_numpy
        if self.meta.stride is not None:
            data["stride"] = int(self.meta.stride)
        data["patch_norm"] = self.meta.patch_norm.to_dict()
        return data

    @classmethod
    def from_dict(cls, data):
        """Build from a registry-reference or inline dict."""
        if data["type"] != "inline":
            return cls.from_registry(name=data["type"])

        meta = GaussianMixtureModelMeta(
            stride=data.get("stride"),
            patch_norm=PatchNorm.from_dict(
                dict(data.get("patch_norm", {"type": "subtract-mean"}))
            ),
        )
        return cls.from_numpy(
            means=np.asarray(data["means"]),
            covariances=np.asarray(data["covariances"]),
            weights=np.asarray(data["weights"]),
            meta=meta,
        )

    def __str__(self):
        return format_class_str(instance=self)


register_pytree(
    GaussianMixtureModel,
    children_attrs=(
        "means",
        "covariances",
        "weights",
        "precisions_cholesky",
        "means_precisions_cholesky",
        "log_det_cholesky",
        "log_weights",
        "pixel_weights",
        "packed",
    ),
    aux_attrs=("meta", "_registry_name"),
)


def _builtin_registry():
    """Registry entries for GMM assets shipped with the package."""
    assets = Path(__file__).parent.parent.parent / "assets"
    registry = {}
    builtin = assets / "gmm-builtin-8x8.npz"
    if builtin.exists():
        registry[BUILTIN_GMM_NAME] = {"filename": str(builtin), "format": "npz"}
    # K=200 EPLL-style GMM fitted on an astronomy-statistics patch
    # corpus (power-law fields, SNR shells/filaments, PSF-convolved
    # point fields — scripts/make_astro_gmm.py), the in-package
    # analogue of the reference's flagship zoran-weiss / jwst-cas-a
    # libraries (reference ``gmm.py:310-389,493-508``).
    astro = assets / "gmm-astro-snr-8x8.npz"
    if astro.exists():
        registry[ASTRO_GMM_NAME] = {"filename": str(astro), "format": "npz"}
    # The reference's default prior GMM is "zoran-weiss" from the
    # external jolideco-gmm-prior-library. When that library is not
    # installed, alias the common names to the closest shipped model so
    # default configurations still run — but tag each alias entry with
    # ``substitute_of`` so from_registry can warn that the numbers will
    # differ from the actual library model. An external library index
    # (merged later in get_gmm_registry) replaces the whole entry,
    # marker included.
    default_name = next(
        (n for n in (ASTRO_GMM_NAME, BUILTIN_GMM_NAME) if n in registry), None
    )
    if default_name:
        for alias in REFERENCE_LIBRARY_ALIASES:
            registry.setdefault(
                alias,
                {**registry[default_name], "substitute_of": default_name},
            )
    return registry


def get_gmm_registry():
    """Read the GMM registry.

    Merges (later wins): built-in package assets, then the external
    library index at ``$JOLIDECO_GMM_LIBRARY/jolideco-gmm-library-index
    .json`` if the env var is set (reference ``gmm.py:493-508`` — but
    evaluated lazily instead of at import time).
    """
    registry = _builtin_registry()

    library = os.environ.get("JOLIDECO_GMM_LIBRARY")
    if library:
        path = Path(library) / "jolideco-gmm-library-index.json"
        if path.exists():
            log.debug(f"Reading GMM registry from {path}")
            with path.open() as f:
                registry.update(json.load(f))
        else:
            log.warning(f"GMM registry index not found: {path}")

    return registry


class _LazyGMMRegistry(Mapping):
    """Import-time-safe view of the GMM registry (loaded on first use)."""

    def __init__(self):
        self._data = None

    def _load(self):
        if self._data is None:
            self._data = get_gmm_registry()
        return self._data

    def refresh(self):
        """Force a reload (e.g. after changing ``$JOLIDECO_GMM_LIBRARY``)."""
        self._data = None

    def __getitem__(self, key):
        return self._load()[key]

    def __iter__(self):
        return iter(self._load())

    def __len__(self):
        return len(self._load())


GMM_REGISTRY = _LazyGMMRegistry()
