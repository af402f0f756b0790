"""Multi-chip scaling (SURVEY.md §2: the DP-equivalent).

The reference iterates datasets sequentially on one device; here
observations stack on a leading axis, the per-observation NPred + NLL
evaluation is vmapped, and the stacked arrays are sharded over an
``obs`` mesh axis — XLA/GSPMD inserts the gradient ``psum`` over ICI.
"""

from .mesh import make_obs_mesh, shard_stacked  # noqa: F401
from .stacked import DataValidationError, StackedPoissonLoss  # noqa: F401
from .spatial import make_obs_row_mesh, shard_stacked_spatial  # noqa: F401
from .prior import sharded_prior_fn  # noqa: F401
from ..ops.dist_fft import spatial_fft_shape  # noqa: F401
