"""Models (L3 of the layer map): flux parameterisations + NPred physics."""

from .core import (  # noqa: F401
    FluxComponents,
    SparseSpatialFluxComponent,
    SpatialFluxComponent,
)
from .npred import (  # noqa: F401
    NPredCalibration,
    NPredCalibrations,
    NPredModel,
    NPredModels,
)
