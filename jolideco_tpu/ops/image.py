"""Image-space kernels: resampling, warps, cycle spins, interpolation.

Functional JAX equivalents of the reference's torch image helpers
(reference ``jolideco/utils/torch.py:26-223``), designed TPU-first:

- static shapes everywhere (jit/vmap-safe),
- randomness via explicit ``jax.random`` keys instead of stateful
  generators,
- warps implemented with ``jax.scipy.ndimage.map_coordinates`` using the
  same half-pixel-center sampling convention as torch's
  ``grid_sample(align_corners=False)`` so results agree with the
  reference's affine-grid code paths (reference ``utils/torch.py:172-223``).

All image arguments are ``(..., H, W)``; the warp helpers accept the 4-D
``(1, 1, H, W)`` layout used throughout the model code.
"""

import jax
import jax.numpy as jnp
from jax.scipy.ndimage import map_coordinates

__all__ = [
    "upsample_bilinear",
    "sum_pool",
    "avg_pool",
    "shift_image",
    "rescale_image",
    "grid_weights",
    "cycle_spin",
    "cycle_spin_subpixel",
    "interp1d",
]


def upsample_bilinear(image, factor):
    """Bilinear upsampling by an integer factor.

    Matches ``torch.nn.functional.interpolate(mode="bilinear",
    align_corners=False)`` as used by the reference when building
    upsampled exposures/PSFs (reference ``models/npred.py:96-106``) and
    flux inits (reference ``models/core.py:524-527``): output pixel
    centers sample the input at ``(i + 0.5) / factor - 0.5`` with edge
    clamping.
    """
    if not factor or factor == 1:
        return image
    h, w = image.shape[-2], image.shape[-1]
    out_shape = image.shape[:-2] + (h * factor, w * factor)
    return jax.image.resize(image, out_shape, method="linear")


def sum_pool(image, factor):
    """Flux-conserving downsampling: sum over non-overlapping blocks.

    Equivalent of ``F.avg_pool2d(x, kernel_size=factor,
    divisor_override=1)`` in the reference forward model
    (reference ``models/npred.py:181-184``, ``models/core.py:596-607``).
    Implemented as a reshape-reduce, which XLA fuses into a single pass.
    """
    if not factor or factor == 1:
        return image
    h, w = image.shape[-2], image.shape[-1]
    lead = image.shape[:-2]
    x = image.reshape(lead + (h // factor, factor, w // factor, factor))
    return x.sum(axis=(-3, -1))


def avg_pool(image, factor):
    """Mean over non-overlapping blocks (``F.avg_pool2d`` default)."""
    if not factor or factor == 1:
        return image
    return sum_pool(image, factor) / (factor * factor)


def _bilinear_sample(image_2d, rows, cols):
    """Bilinear sample with zero padding outside (grid_sample zeros mode)."""
    return map_coordinates(
        image_2d, [rows, cols], order=1, mode="constant", cval=0.0
    )


def shift_image(image, shift_xy, scale=1.0):
    """Shift an image by (possibly fractional) pixels with zero padding.

    Behavioural equivalent of the reference's ``shift_image_torch``
    (``utils/torch.py:196-223``), which builds an affine grid
    ``theta = [I | 2*scale*shift/size]`` and applies
    ``grid_sample(align_corners=False)``. In pixel coordinates that is
    simply: ``out[y, x] = in[y + scale*shift_y, x + scale*shift_x]``
    (bilinear, zeros outside). Used by ``NPredCalibration`` position
    calibration (reference ``models/npred.py:383-398``).

    Parameters
    ----------
    image : array ``(..., H, W)``
    shift_xy : array ``(2,)`` or ``(1, 2)``
        Shift in x (last axis) and y, in *data* pixels.
    scale : float
        Upsampling factor converting data pixels to image pixels.
    """
    shift_xy = jnp.asarray(shift_xy).reshape(-1)
    h, w = image.shape[-2], image.shape[-1]
    rows = jnp.arange(h, dtype=image.dtype)[:, None] + scale * shift_xy[1]
    cols = jnp.arange(w, dtype=image.dtype)[None, :] + scale * shift_xy[0]
    rows = jnp.broadcast_to(rows, (h, w))
    cols = jnp.broadcast_to(cols, (h, w))

    flat = image.reshape((-1, h, w))
    out = jax.vmap(lambda im: _bilinear_sample(im, rows, cols))(flat)
    return out.reshape(image.shape)


def rescale_image(image, factor):
    """Rescale (zoom) an image about its center by ``factor``.

    Equivalent of the reference's ``rescale_image_torch``
    (``utils/torch.py:172-193``): affine grid ``theta = diag(1/factor)``
    with ``grid_sample(align_corners=False)``. With half-pixel centers the
    sampled input position for output pixel ``x`` is
    ``(2x + 1 - W) / (2 * factor) + (W - 1) / 2``. Used for the (fixed)
    ``psf_scale`` calibration parameter.

    ``factor`` may be a traced scalar; the output shape equals the input
    shape so this jits with static shapes.
    """
    factor = jnp.asarray(factor).reshape(())
    h, w = image.shape[-2], image.shape[-1]
    ys = (2.0 * jnp.arange(h, dtype=image.dtype) + 1.0 - h) / (2.0 * factor) + (
        h - 1
    ) / 2.0
    xs = (2.0 * jnp.arange(w, dtype=image.dtype) + 1.0 - w) / (2.0 * factor) + (
        w - 1
    ) / 2.0
    rows = jnp.broadcast_to(ys[:, None], (h, w))
    cols = jnp.broadcast_to(xs[None, :], (h, w))

    flat = image.reshape((-1, h, w))
    out = jax.vmap(lambda im: _bilinear_sample(im, rows, cols))(flat)
    return out.reshape(image.shape)


def maybe_rescale_image(image, factor):
    """Host-side helper: skip the warp when ``factor`` is statically 1."""
    if factor is None:
        return image
    if isinstance(factor, (int, float)) and float(factor) == 1.0:
        return image
    return rescale_image(image, factor)


def grid_weights(x, y, x0, y0):
    """Centroid-preserving 4-pixel bilinear splat weights.

    Same formula as the reference (``utils/torch.py:31-38``): triangular
    weights ``max(0, 1 - |x - x0|) * max(0, 1 - |y - y0|)``. Used to splat
    sparse point sources onto the flux grid and to build subpixel
    cycle-spin kernels.
    """
    dx = jnp.abs(x - x0)
    dx = jnp.where(dx < 1, 1 - dx, 0.0)
    dy = jnp.abs(y - y0)
    dy = jnp.where(dy < 1, 1 - dy, 0.0)
    return dx * dy


def cycle_spin(key, image, patch_shape):
    """Random integer cyclic roll of up to ``patch // 4`` pixels per axis.

    PRNG-key-threaded equivalent of the reference's ``cycle_spin``
    (``utils/torch.py:91-119``): draws integer shifts uniformly from
    ``[-p//4, p//4]`` per axis and rolls the trailing two axes.

    Returns
    -------
    image : array
        Rolled image.
    shifts : int array ``(2,)``
        The drawn ``(shift_y, shift_x)`` — needed by patch-image
        reconstruction to undo the roll.
    """
    x_max, y_max = patch_shape
    x_width, y_width = x_max // 4, y_max // 4
    kx, ky = jax.random.split(key)
    shift_x = jax.random.randint(kx, (), -x_width, x_width + 1)
    shift_y = jax.random.randint(ky, (), -y_width, y_width + 1)
    shifts = jnp.stack([shift_y, shift_x])
    return jnp.roll(image, shift=(shift_y, shift_x), axis=(-2, -1)), shifts


def cycle_spin_interp(key, image, patch_shape, scale=1.0):
    """Continuous (interpolated) cycle spin.

    Equivalent of the reference's ``cycle_spin_interp``
    (``utils/torch.py:63-88``): uniform real-valued shifts of up to
    ``patch // 4`` pixels per axis applied with the bilinear
    ``shift_image`` warp.

    Returns
    -------
    image : array
        Shifted image.
    shifts : array ``(2,)``
        The drawn ``(shift_x, shift_y)`` scaled by ``scale``.
    """
    x_max, y_max = patch_shape
    x_width, y_width = x_max // 4, y_max // 4
    kx, ky = jax.random.split(key)
    shift_x = jax.random.uniform(kx, (), minval=-x_width, maxval=x_width)
    shift_y = jax.random.uniform(ky, (), minval=-y_width, maxval=y_width)
    shifts = scale * jnp.stack([shift_x, shift_y])
    return shift_image(image, shifts, scale=1.0), shifts


def cycle_spin_subpixel(key, image):
    """Random subpixel shift via a 3x3 bilinear kernel convolution.

    Equivalent of the reference's ``cycle_spin_subpixel``
    (``utils/torch.py:122-143``): a random offset in ``[-0.5, 0.5)^2``
    becomes a 3x3 ``grid_weights`` kernel applied with 'same' padding.
    Implemented directly (shift-and-scale sum of 4 rolls) instead of a
    conv — cheaper than a conv dispatch for a 3x3 kernel and exactly
    equivalent for interior pixels; borders use zero padding like the
    reference's ``F.conv2d(padding="same")``.
    """
    kx, ky = jax.random.split(key)
    x0 = jax.random.uniform(kx, ()) - 0.5
    y0 = jax.random.uniform(ky, ()) - 0.5
    grid = jnp.arange(-1, 2, dtype=image.dtype)
    y, x = jnp.meshgrid(grid, grid, indexing="ij")
    kernel = grid_weights(x, y, x0, y0)

    # cross-correlate with 'same' zero padding (what F.conv2d does)
    padded = jnp.pad(
        image,
        [(0, 0)] * (image.ndim - 2) + [(1, 1), (1, 1)],
    )
    h, w = image.shape[-2], image.shape[-1]
    out = jnp.zeros_like(image)
    for dy in range(3):
        for dx in range(3):
            out = out + kernel[dy, dx] * padded[..., dy : dy + h, dx : dx + w]
    return out


def interp1d(x, xp, fp):
    """Piecewise-linear interpolation matching the reference's variant.

    The reference's ``interp1d_torch`` (``utils/torch.py:146-169``) uses
    ``searchsorted`` then lerps between ``idx - 1`` and ``idx`` with
    *extrapolation* outside the table (torch.lerp does not clamp), which
    differs from ``jnp.interp``'s edge clamping — so implement the same
    arithmetic directly. Used by ``InverseCDFImageNorm``.
    """
    idx = jnp.clip(jnp.searchsorted(xp, x), 0, len(xp) - 2)
    y0, y1 = fp[idx - 1], fp[idx]
    x0, x1 = xp[idx - 1], xp[idx]
    weights = (x - x0) / (x1 - x0)
    return y0 + weights * (y1 - y0)
