"""Row-sharded (distributed pencil) FFT convolution.

Closes the spatial-sharding gap of the plain FFT path: XLA's FFT op
cannot be GSPMD-partitioned along a transform axis, so the 2-D
``(obs, row)`` mesh previously required the matmul-DFT convolutions
(``conv_mode="ct"``/``"mxu"``, ~2.5x slower end-to-end than the FFT at
benchmark scale). This module runs the same rfft2-convolve-irfft2
pipeline as :func:`ops.fft.convolve_fft_precomputed` as an explicit
pencil decomposition under ``jax.shard_map``:

1. each device holds ``H/R`` full image rows → local ``rfft`` along W
   (rows are complete, no communication);
2. ``all_to_all`` over the ``row`` mesh axis transposes the shard axis:
   every device now holds *all* ``H`` rows of ``(Fw/2+1)/R`` spectrum
   columns;
3. local zero-pad to ``Fh`` + full-height complex ``fft`` along H,
   multiply by the (column-sharded) kernel spectrum, ``ifft``, crop
   back to ``H`` rows;
4. ``all_to_all`` back, local ``irfft`` along W, crop to ``W``.

The two all-to-alls ride the ICI mesh; every FFT is a dense local
transform, so the per-device FLOPs are exactly ``1/R`` of the
single-chip convolution. The reference has no distributed execution at
all (SURVEY.md §2: the TP analogue is new surface); semantics match
``convolve_fft_precomputed`` (origin-centered kernels, ``[:H, :W]``
crop — reference ``utils/torch.py:347-390``) to float roundoff.

The adjoint is the same pipeline with the conjugated spectrum (see the
proof on ``convolve_fft_precomputed``), wired as ``jax.custom_vjp`` so
the backward costs one forward and never builds XLA's mechanically
transposed FFT/collective graph.
"""

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax

__all__ = ["spatial_fft_shape", "dist_convolve_fft"]


def spatial_fft_shape(image_shape, kernel_shape, n_row_shards):
    """An FFT shape whose half-spectrum splits evenly over row shards.

    Starts from the minimal linear-convolution shape ``(H + kh - 1,
    W + kw - 1)`` and grows the width until ``Fw // 2 + 1`` is a
    multiple of ``n_row_shards`` (the all-to-all splits the rFFT's
    ``Fw // 2 + 1`` spectrum columns across the ``row`` axis). Pass the
    result as ``fft_shape=`` to ``StackedPoissonLoss.from_datasets``
    when the loss will be sharded with ``conv_mode="fft"`` on a 2-D
    mesh.
    """
    fh = image_shape[-2] + kernel_shape[-2] - 1
    fw = image_shape[-1] + kernel_shape[-1] - 1
    while (fw // 2 + 1) % n_row_shards:
        fw += 1
    return (fh, fw)


def _pipeline(x, kft, fft_shape, mesh, row_axis, n_rows):
    """The sharded pipeline body (linear in ``x``)."""
    fh, fw = fft_shape
    del n_rows  # divisibility validated in _dist_impl
    if x.ndim < 3 or kft.ndim != x.ndim:
        # the partition specs index axis 0 (obs) and axis -2 (row)
        # independently — for a 2-D x they alias, silently replacing
        # the obs sharding, and a rank-mismatched kft gets a wrong-rank
        # spec with a misleading trace error downstream
        raise ValueError(
            "dist_convolve_fft needs x with a leading batch axis "
            "(ndim >= 3) and kft of the same rank; got "
            f"x.ndim={x.ndim}, kft.ndim={kft.ndim}. Reshape 2-D "
            "inputs to (1, H, W) / (1, Fh, Fwh)."
        )
    h, w = x.shape[-2], x.shape[-1]  # global (pre-shard) image dims

    def body(x, kft):
        # (..., H/R, W) -> local rFFT along the (complete) row axis
        xf = jnp.fft.rfft(x, n=fw, axis=-1)             # (..., H/R, Fwh)
        # transpose shards: all rows of Fwh/R spectrum columns each
        xf = lax.all_to_all(xf, row_axis, split_axis=x.ndim - 1,
                            concat_axis=x.ndim - 2, tiled=True)
        # full-height transform, spectrum multiply, crop back to H rows
        pad = [(0, 0)] * (x.ndim - 2) + [(0, fh - h), (0, 0)]
        yf = jnp.fft.fft(jnp.pad(xf, pad), axis=-2)     # (..., Fh, Fwh/R)
        yf = jnp.fft.ifft(yf * kft, axis=-2)[..., :h, :]
        # transpose back and finish with the local inverse real FFT
        yf = lax.all_to_all(yf, row_axis, split_axis=x.ndim - 2,
                            concat_axis=x.ndim - 1, tiled=True)
        return jnp.fft.irfft(yf, n=fw, axis=-1)[..., :w]

    ndim = x.ndim
    obs = "obs" if "obs" in mesh.axis_names else None
    spec_x = [None] * ndim
    spec_k = [None] * ndim
    if obs is not None:
        spec_x[0] = spec_k[0] = obs
    spec_x[-2] = row_axis
    spec_k[-1] = row_axis
    P = jax.sharding.PartitionSpec
    return jax.shard_map(
        body, mesh=mesh,
        in_specs=(P(*spec_x), P(*spec_k)),
        out_specs=P(*spec_x),
    )(x, kft)


@partial(jax.custom_vjp, nondiff_argnums=(2, 3, 4))
def dist_convolve_fft(x, kft, fft_shape, mesh, row_axis="row"):
    """Row-sharded linear convolution with a precomputed kernel rFFT.

    Parameters
    ----------
    x : array ``(..., H, W)``
        Image batch, sharded ``P(..., row, None)`` over ``mesh`` (a
        leading ``obs`` axis, if the mesh has one, shards axis 0).
        ``H`` must divide evenly over the ``row`` shards.
    kft : complex array ``(..., Fh, Fw // 2 + 1)``
        From :func:`ops.fft.kernel_fft` at ``fft_shape``; its last axis
        must divide evenly over the ``row`` shards (use
        :func:`spatial_fft_shape`).
    fft_shape : tuple of int (static)
    mesh, row_axis : the 2-D device mesh and its image-row axis name.

    Returns
    -------
    out : array ``(..., H, W)``, sharded like ``x``.
    """
    return _dist_impl(x, kft, fft_shape, mesh, row_axis)


def _dist_impl(x, kft, fft_shape, mesh, row_axis):
    n_rows = int(mesh.shape[row_axis])
    fwh = fft_shape[1] // 2 + 1
    if kft.shape[-1] != fwh:
        raise ValueError(
            f"kernel spectrum width {kft.shape[-1]} does not match "
            f"fft_shape {fft_shape} (expect {fwh})"
        )
    if fwh % n_rows or x.shape[-2] % n_rows:
        raise ValueError(
            f"row sharding over {n_rows} devices needs H "
            f"({x.shape[-2]}) and Fw//2+1 ({fwh}) divisible by it; "
            "build the loss with fft_shape=spatial_fft_shape(...)"
        )
    return _pipeline(x, kft, tuple(fft_shape), mesh, row_axis, n_rows)


def _dist_fwd(x, kft, fft_shape, mesh, row_axis):
    return _dist_impl(x, kft, fft_shape, mesh, row_axis), kft


def _dist_bwd(fft_shape, mesh, row_axis, kft, g):
    dx = _dist_impl(g, jnp.conj(kft), fft_shape, mesh, row_axis)
    return dx, jnp.zeros_like(kft)


dist_convolve_fft.defvjp(_dist_fwd, _dist_bwd)
