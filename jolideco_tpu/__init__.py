"""jolideco-tpu: TPU-native joint-likelihood deconvolution.

A from-scratch JAX/XLA/Pallas re-design with the capabilities and API
shape of the reference ``jolideco`` package (PyTorch): MAP deconvolution
of Poisson-noise images against shared latent flux components with
per-observation PSF/exposure/background/calibration, EPLL-style GMM
patch priors, and multi-observation scaling via ``jax.sharding``.
"""

from .core import MAPDeconvolver, MAPDeconvolverResult  # noqa: F401
from .loss import PoissonLoss, PriorLoss, TotalLoss  # noqa: F401
from .models import (  # noqa: F401
    FluxComponents,
    NPredCalibration,
    NPredCalibrations,
    NPredModel,
    NPredModels,
    SparseSpatialFluxComponent,
    SpatialFluxComponent,
)
from .priors import (  # noqa: F401
    ExponentialPrior,
    GaussianMixtureModel,
    GMMPatchPrior,
    ImagePrior,
    InverseGammaPrior,
    LIRAPrior,
    MultiScalePrior,
    Priors,
    SmoothnessPrior,
    UniformPrior,
)

from . import config  # noqa: F401

__version__ = "0.1.0"
