from .core import GMMPatchPrior, MultiScalePrior  # noqa: F401
from .gmm import GMM_REGISTRY, GaussianMixtureModel, GaussianMixtureModelMeta  # noqa: F401
