"""Spatial (image-axis) sharding — the tensor-parallel analogue.

SURVEY.md §2: the reference has no TP; the analogue here is sharding
the image grid itself over a second mesh axis, for problems where a
single image (or its FFT intermediates) outgrows one chip's HBM. The
stacked observation arrays shard as ``P("obs", None, None, "row",
None)``; parameters stay replicated and GSPMD inserts the collectives
the convolution needs across the sharded image axis.

All three convolution backends work on the 2-D mesh:

- ``conv_mode="fft"`` (fastest, the single-chip default) routes
  through the explicit pencil decomposition in ``ops.dist_fft`` —
  local transforms plus two ``all_to_all``s per conv under
  ``shard_map``, because XLA's FFT op cannot be GSPMD-partitioned
  along a transform axis. Build the loss with
  ``fft_shape=spatial_fft_shape(...)`` so the half-spectrum divides
  over the row shards.
- ``conv_mode="ct"`` (packed-pair Cooley-Tukey matmul DFT,
  ``ops.ct_conv``) and ``conv_mode="mxu"`` (its v1): their einsum
  stages partition under plain GSPMD with no explicit collectives.

Each verified identical to single-device evaluation on an 8-device
(2 obs x 4 row) mesh (``tests/test_parallel.py``).
"""

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_obs_row_mesh", "shard_stacked_spatial"]


def make_obs_row_mesh(n_obs_shards, n_row_shards, devices=None):
    """2-D mesh over ``(obs, row)`` axes."""
    if devices is None:
        devices = jax.devices()
    n = n_obs_shards * n_row_shards
    if len(devices) < n:
        raise ValueError(
            f"make_obs_row_mesh: {n_obs_shards}x{n_row_shards}={n} devices "
            f"requested but only {len(devices)} available; refusing to "
            "silently build a smaller mesh. For tests, force a virtual CPU "
            "backend with XLA_FLAGS=--xla_force_host_platform_device_count=N."
        )
    grid = np.asarray(devices[:n]).reshape(n_obs_shards, n_row_shards)
    return Mesh(grid, axis_names=("obs", "row"))


def shard_stacked_spatial(stacked, mesh):
    """Shard a `StackedPoissonLoss` over observations *and* image rows.

    Per-observation arrays of layout ``(N, 1, C, H, W)`` shard as
    ``P("obs", None, None, "row", None)``; DFT tables (if any)
    replicate.
    """
    import copy as _copy

    def place(leaf):
        if leaf is None:
            return None
        spec = [None] * leaf.ndim
        spec[0] = "obs"
        # rows shard only when the row axis is distinct from the obs
        # axis (for a 2-D leaf spec[-2] IS spec[0] — overwriting it
        # would silently drop the obs sharding)
        if leaf.ndim >= 3:
            spec[-2] = "row"
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    def place_spectrum(leaf):
        # rFFT kernel spectra shard their COLUMN (last) axis over the
        # row shards: that is the axis the pencil-FFT's all_to_all
        # redistributes, so the multiply is local on every device
        if leaf is None:
            return None
        spec = [None] * leaf.ndim
        spec[0] = "obs"
        spec[-1] = "row"
        return jax.device_put(leaf, NamedSharding(mesh, P(*spec)))

    replicated = NamedSharding(mesh, P())
    fft_mode = stacked.conv_mode == "fft"

    if fft_mode:
        n_rows = int(mesh.shape["row"])
        fwh = stacked.fft_shape[1] // 2 + 1
        h = int(stacked.counts.shape[-2])
        if fwh % n_rows or any(
            (f * h) % n_rows for f in stacked.component_factors
        ):
            raise ValueError(
                f"conv_mode='fft' on a {n_rows}-row mesh needs the "
                f"image height ({h}, x upsampling) and the spectrum "
                f"width Fw//2+1 ({fwh}) divisible by the row shards; "
                "build with fft_shape=ops.dist_fft.spatial_fft_shape(...)"
            )

    new = _copy.copy(stacked)
    new.pair_kernels = None
    new.ct_pair_kernels = None
    new.sharded = True
    if fft_mode:
        new.spatial_mesh = mesh
        new.row_axis = "row"
    for attr in ("counts", "background", "exposures", "psf_ffts", "psfs",
                 "ct_singles"):
        value = getattr(stacked, attr)
        if value is not None:
            placer = (
                place_spectrum if fft_mode and attr == "psf_ffts"
                else place
            )
            setattr(new, attr, jax.tree_util.tree_map(placer, value))
    # per-obs scalars/vectors shard on obs only
    obs_only = NamedSharding(mesh, P("obs"))
    new.stirling = jax.device_put(stacked.stirling, obs_only)
    for attr in ("static_shifts", "static_log_norms"):
        value = getattr(stacked, attr)
        if value is not None:
            setattr(new, attr, jax.device_put(value, obs_only))
    if stacked.rmfs is not None:
        # (N, C, K) redistribution matrices: the channel axes stay
        # replicated (spec[-2]="row" would wrongly split channels)
        new.rmfs = jax.tree_util.tree_map(
            lambda leaf: jax.device_put(leaf, obs_only), stacked.rmfs,
        )
    for attr in ("dft_tables", "ct_tables"):
        value = getattr(stacked, attr)
        if value is not None:
            setattr(new, attr, jax.tree_util.tree_map(
                lambda leaf: jax.device_put(leaf, replicated), value,
            ))
    return new
