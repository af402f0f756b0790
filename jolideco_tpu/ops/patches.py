"""Overlapping-patch kernels for the EPLL-style GMM patch prior.

JAX equivalents of the reference's patch machinery (reference
``jolideco/utils/torch.py:226-334`` and ``jolideco/utils/numpy.py:37-148``).
The torch version uses ``Tensor.unfold`` views; here extraction is a pure
gather with static shapes, so it jits, vmaps over observations, and feeds
the Pallas GMM scoring kernel with a dense ``(n_patches, p*p)`` matrix.

Patch element ordering is row-major within a patch and patches are laid
out row-major over the grid of top-left corners — identical to
``unfold(-2).unfold(-1).reshape(-1, p*p)`` in the reference.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

__all__ = [
    "view_as_overlapping_patches",
    "view_as_overlapping_patches_grouped",
    "view_as_random_overlapping_patches",
    "extract_patches_at",
    "grouped_patch_corners",
    "reconstruct_from_overlapping_patches",
    "reconstruct_from_overlapping_patches_at",
    "get_pixel_weights",
    "evaluate_trapez",
]


def _patch_grid(size, patch, stride):
    """Top-left corner positions of the patch grid along one axis."""
    return np.arange(0, size - patch + 1, stride)


def extract_patches_at(image, idy, idx, shape):
    """Gather ``shape``-sized patches with top-left corners ``(idy, idx)``.

    Parameters
    ----------
    image : array ``(H, W)``
    idy, idx : int arrays, same shape ``(n,)`` (or broadcastable)
        Patch corner coordinates. May be traced (jitter support).
    shape : tuple of int (static)
        Patch shape ``(ph, pw)``.

    Returns
    -------
    patches : array ``(n, ph * pw)``
    """
    ph, pw = shape
    dy = jnp.arange(ph)
    dx = jnp.arange(pw)
    rows = idy[:, None, None] + dy[None, :, None]
    cols = idx[:, None, None] + dx[None, None, :]
    patches = image[rows, cols]
    return patches.reshape((-1, ph * pw))


@partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def _patches_blocked(image_2d, shape, stride):
    """Patch extraction via static block slices (stride | patch, H, W).

    Both directions are a handful of static-slice adds/stacks — no
    gather and no convolution transpose. The overlap-add backward of
    the conv formulation measured ~9 ms at benchmark scale; this one is
    bandwidth-bound on a few passes over the image.
    """
    return _patches_blocked_fwd_impl(image_2d, shape, stride)


def _patches_blocked_fwd_impl(image_2d, shape, stride):
    p, s = shape[0], stride
    q = p // s
    h, w = image_2d.shape
    nb_h, nb_w = h // s, w // s
    n_i, n_j = nb_h - q + 1, nb_w - q + 1

    blocks = image_2d.reshape(nb_h, s, nb_w, s)
    pieces = []
    for bi in range(q):
        row = []
        for bj in range(q):
            row.append(blocks[bi : bi + n_i, :, bj : bj + n_j, :])
        pieces.append(jnp.stack(row, axis=0))
    # (q_i, q_j, n_i, s, n_j, s) -> (n_i, n_j, q_i, s, q_j, s)
    stacked = jnp.stack(pieces, axis=0)
    patches = jnp.transpose(stacked, (2, 4, 0, 3, 1, 5))
    return patches.reshape(n_i * n_j, p * p)


def _patches_blocked_fwd(image_2d, shape, stride):
    # residuals: static dims + a zero-dim dtype carrier (pytree-safe)
    return _patches_blocked_fwd_impl(image_2d, shape, stride), (
        image_2d.shape[0],
        image_2d.shape[1],
        jnp.zeros((), image_2d.dtype),
    )


def _patches_blocked_bwd(shape, stride, residuals, dpatches):
    h, w, proto = residuals
    dtype = proto.dtype
    p, s = shape[0], stride
    q = p // s
    nb_h, nb_w = h // s, w // s
    n_i, n_j = nb_h - q + 1, nb_w - q + 1

    dp = dpatches.reshape(n_i, n_j, q, s, q, s)
    acc = jnp.zeros((nb_h, s, nb_w, s), dtype)
    for bi in range(q):
        for bj in range(q):
            # dp slice dims (i, j, u, v) -> target block dims (i, u, j, v)
            acc = acc.at[bi : bi + n_i, :, bj : bj + n_j, :].add(
                jnp.transpose(dp[:, :, bi, :, bj, :], (0, 2, 1, 3))
            )
    return (acc.reshape(h, w),)


_patches_blocked.defvjp(_patches_blocked_fwd, _patches_blocked_bwd)


def view_as_overlapping_patches(image, shape, stride=None):
    """View an image as a dense matrix of overlapping patches.

    Equivalent of ``view_as_overlapping_patches_torch`` (reference
    ``utils/torch.py:251-275``). When the stride divides the patch size
    and the image dimensions, extraction and its overlap-add transpose
    are pure static block reshapes (fast path); otherwise
    ``lax.conv_general_dilated_patches`` is used. A strided patch
    *gather* costs ~40 ms at benchmark scale — never used here.

    Parameters
    ----------
    image : array ``(..., H, W)``
        Leading axes (e.g. ``(1, 1)``) are flattened away.
    shape : tuple of int
        Patch shape.
    stride : int, optional
        Defaults to half the patch size.

    Returns
    -------
    patches : array ``(n_patches, ph * pw)``
    """
    from jax import lax

    if stride is None:
        stride = shape[0] // 2

    h, w = image.shape[-2], image.shape[-1]
    blocked_ok = (
        shape[0] == shape[1]
        and stride > 0
        and shape[0] % stride == 0
        and h % stride == 0
        and w % stride == 0
    )
    if blocked_ok:
        return _patches_blocked(
            image.reshape(h, w), tuple(shape), int(stride)
        )

    im = image.reshape((1, 1) + image.shape[-2:])
    # output: (1, ph*pw, oh, ow) with features ordered (ph, pw)
    patches = lax.conv_general_dilated_patches(
        im,
        filter_shape=tuple(shape),
        window_strides=(stride, stride),
        padding="VALID",
    )
    n_features = shape[0] * shape[1]
    patches = jnp.transpose(patches[0], (1, 2, 0))
    return patches.reshape((-1, n_features))


def grouped_patch_corners(image_shape, shape, stride):
    """Corner coordinates matching ``view_as_overlapping_patches_grouped``.

    Host-side numpy; one ``(n, 2)`` array of ``(y, x)`` top-left
    corners in the grouped extraction order.
    """
    p, s = shape[0], stride
    h, w = image_shape[-2:]
    corners = []
    for a in range(0, p, s):
        for b in range(0, p, s):
            na = (h - a) // p
            nb = (w - b) // p
            cy = a + p * np.arange(na)
            cx = b + p * np.arange(nb)
            yy, xx = np.meshgrid(cy, cx, indexing="ij")
            corners.append(np.stack([yy.ravel(), xx.ravel()], axis=-1))
    return np.concatenate(corners, axis=0)


def view_as_overlapping_patches_grouped(image, shape, stride):
    """Overlapping patches in *group* order — the training hot path.

    Decomposes the strided overlapping grid into ``(patch/stride)**2``
    offset classes; each class is a NON-overlapping tiling, extracted
    by a shifted slice + space-to-depth reshape. The same patch *set*
    as :func:`view_as_overlapping_patches` in a different row order
    (group-major instead of grid-row-major), so any per-patch consumer
    (scoring, masking, sums) is unaffected.

    The payoff is the transpose: plain JAX autodiff of the
    slice/reshape/transpose chain gives a scatter-free overlap-add —
    measured 14x faster than the row-major blocked extraction's
    backward at benchmark scale (0.5 vs 7 ms for a 1056^2 image,
    8x8 patches, stride 4), because the row-major layout forces
    relayouts of odd-sized ``(263, 263, 2, 4, 2, 4)`` intermediates.

    Use :func:`grouped_patch_corners` for the matching corner
    coordinates (e.g. to reconstruct diagnostics).
    """
    p, s = shape[0], stride
    h, w = image.shape[-2:]
    if shape[0] != shape[1] or p % s != 0:
        raise ValueError(
            "grouped extraction needs square patches with stride | patch; "
            f"got shape={shape}, stride={stride}"
        )
    img = image.reshape(h, w)
    groups = []
    for a in range(0, p, s):
        for b in range(0, p, s):
            na = (h - a) // p
            nb = (w - b) // p
            sl = jax.lax.slice(img, (a, b), (a + na * p, b + nb * p))
            pt = sl.reshape(na, p, nb, p).transpose(0, 2, 1, 3)
            groups.append(pt.reshape(na * nb, p * p))
    return jnp.concatenate(groups, axis=0)


def view_as_single_group_patches(image, shape, stride, group_index,
                                 pad_value):
    """Extract ONE offset class of the grouped patch decomposition.

    The overlapping stride-``s`` grid decomposes into ``(p/s)²``
    non-overlapping tilings (see
    :func:`view_as_overlapping_patches_grouped`); this extracts the
    tiling selected by ``group_index`` (may be traced — dispatched with
    ``lax.switch`` over the static variants). Sampling one group
    uniformly at random is an unbiased estimator of the full
    overlapping-grid patch sum at ``1/(p/s)²`` of the scoring cost,
    with *contiguous slices only* — a random patch-subset gather at
    benchmark scale costs more than it saves (measured: gather
    subsampling at fraction 0.25 ran slower than exact scoring).

    Groups differ in size when ``p`` does not divide the image, so the
    output is padded to the largest group with ``pad_value`` rows
    (choose it to fail the caller's zero-flux filter).

    Returns
    -------
    patches : array ``(gmax, p*p)``
    n_kept : int32 scalar
        Number of real (non-padding) patches in the selected group.
    """
    p, s = shape[0], stride
    h, w = image.shape[-2:]
    if shape[0] != shape[1] or p % s != 0:
        raise ValueError(
            "grouped extraction needs square patches with stride | patch; "
            f"got shape={shape}, stride={stride}"
        )
    img = image.reshape(h, w)
    offsets = [(a, b) for a in range(0, p, s) for b in range(0, p, s)]
    gmax = max(((h - a) // p) * ((w - b) // p) for a, b in offsets)

    variants = []
    for a, b in offsets:
        na, nb = (h - a) // p, (w - b) // p

        def extract(img, a=a, b=b, na=na, nb=nb):
            sl = jax.lax.slice(img, (a, b), (a + na * p, b + nb * p))
            pt = sl.reshape(na, p, nb, p).transpose(0, 2, 1, 3)
            pt = pt.reshape(na * nb, p * p)
            if na * nb < gmax:
                pt = jnp.pad(
                    pt, ((0, gmax - na * nb), (0, 0)),
                    constant_values=pad_value,
                )
            return pt, jnp.int32(na * nb)

        variants.append(extract)
    return jax.lax.switch(group_index, variants, img)


def count_overlapping_patches(image_shape, shape, stride):
    """Total patch count of the grouped decomposition (static)."""
    p, s = shape[0], stride
    h, w = image_shape[-2:]
    return sum(
        ((h - a) // p) * ((w - b) // p)
        for a in range(0, p, s)
        for b in range(0, p, s)
    )


def reconstruct_from_overlapping_patches_at(patches, corners, image_shape):
    """Overlap-add reconstruction from patches with explicit corners.

    Host-side numpy counterpart of
    :func:`view_as_overlapping_patches_grouped` (weights applied by the
    caller or uniform).
    """
    patches = np.asarray(patches)
    image = np.zeros(image_shape)
    ph, pw = patches.shape[1:]
    for patch, (i, j) in zip(patches, np.asarray(corners)):
        image[i:i + ph, j:j + pw] += patch
    return image


def random_patch_indices(key, image_shape, shape, stride):
    """Draw the jittered patch-corner grid of the reference.

    Reproduces the index arithmetic of
    ``view_as_random_overlapping_patches_torch`` (reference
    ``utils/torch.py:278-334``): a regular grid starting at ``overlap``
    with per-row/column integer jitter in ``[-overlap, overlap]``.

    Returns
    -------
    idy, idx : int arrays ``(n,)``
        Flattened corner coordinates (static count).
    """
    overlap = max(shape) - stride
    ny, nx = image_shape[-2:]
    base_x = np.arange(overlap, nx - stride - overlap, stride)
    base_y = np.arange(overlap, ny - stride - overlap, stride)

    kx, ky = jax.random.split(key)
    jitter_x = jax.random.randint(kx, (len(base_x),), -overlap, overlap + 1)
    jitter_y = jax.random.randint(ky, (len(base_y),), -overlap, overlap + 1)

    # clip jittered corners into the valid range: the raw grid can
    # jitter past n - patch for many image sizes (the reference xfails
    # these as known-broken — torch errors there, while a JAX gather
    # would silently CLAMP row/col indices, feeding degenerate
    # duplicated-edge patches to the prior)
    idx = jnp.clip(jnp.asarray(base_x) + jitter_x, 0, nx - shape[-1])
    idy = jnp.clip(jnp.asarray(base_y) + jitter_y, 0, ny - shape[-2])
    idy, idx = jnp.meshgrid(idy, idx, indexing="ij")
    return idy.ravel(), idx.ravel()


def view_as_random_overlapping_patches(key, image, shape, stride):
    """Jittered overlapping patches (PRNG-keyed).

    Equivalent of ``view_as_random_overlapping_patches_torch``
    (reference ``utils/torch.py:278-334``) with explicit keys.
    """
    im = image.reshape(image.shape[-2:])
    idy, idx = random_patch_indices(key, im.shape, shape, stride)
    return extract_patches_at(im, idy, idx, shape)


def evaluate_trapez(x, width, slope):
    """One-dimensional trapezoid profile (reference ``utils/numpy.py:37-51``)."""
    x = np.asarray(x, dtype=np.float64)
    x2 = min(-width / 2.0, 0)
    x3 = max(width / 2.0, 0)
    x1 = x2 - 1.0 / slope
    x4 = x3 + 1.0 / slope

    range_a = np.logical_and(x >= x1, x < x2)
    range_b = np.logical_and(x >= x2, x < x3)
    range_c = np.logical_and(x >= x3, x < x4)
    val_a = slope * (x - x1)
    val_c = slope * (x4 - x)
    return np.select([range_a, range_b, range_c], [val_a, 1, val_c])


def get_pixel_weights(patch_shape, stride):
    """Trapezoidal per-pixel weights down-weighting patch overlap.

    Host-side numpy, computed once per GMM (reference
    ``utils/numpy.py:54-79``): overlapping pixels contribute less to the
    patch log-likelihood so the total stays calibrated; normalised to sum
    to ``stride**2``.
    """
    width = np.max(patch_shape)
    overlap = width - stride

    if overlap == 0:
        # non-overlapping patches: uniform weights
        return np.full(patch_shape, stride**2 / float(np.prod(patch_shape)))

    value = (width - 1.0) / 2
    x = np.linspace(-value, value, width)

    values = evaluate_trapez(x=x, width=(stride - overlap), slope=1.0 / overlap)
    weights = values * values[:, np.newaxis]
    weights = weights / weights.sum() * stride**2
    return weights


def reconstruct_from_overlapping_patches(patches, image_shape, stride=None):
    """Overlap-add reconstruction of an image from weighted patches.

    Host-side numpy diagnostic used by ``GMMPatchPrior.prior_image``
    (reference ``utils/numpy.py:109-148``).

    Parameters
    ----------
    patches : array ``(n, ph, pw)``
    image_shape : tuple of int
    stride : int, optional

    Returns
    -------
    image : ``numpy.ndarray``
    """
    patches = np.asarray(patches)
    if stride is None:
        stride = patches.shape[-1] // 2

    image_height, image_width = image_shape
    patch_height, patch_width = patches.shape[1:]
    image = np.zeros(image_shape)

    n_h = image_height - patch_height + 1
    n_w = image_width - patch_width + 1

    weights = get_pixel_weights(patch_shape=patches.shape[1:], stride=stride)

    from itertools import product

    for patch, (i, j) in zip(
        patches, product(range(0, n_h, stride), range(0, n_w, stride))
    ):
        image[i : i + patch_height, j : j + patch_width] += weights * patch

    return image
