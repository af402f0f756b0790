"""Fused patch-extraction + GMM scoring Pallas kernel.

The grouped XLA patch extraction (``ops.patches.
view_as_overlapping_patches_grouped``) costs ~1.1 ms/iteration at
benchmark scale (10 obs, 1024², 8×8 patches, stride 4) in lane-crossing
space-to-depth copies, plus ~0.3 ms of mean-subtract / zero-flux-mask
fusions — pure data movement that the TPU's vector memory layout
handles badly. This module moves the whole pipeline

    image → shifted offset-group slices → patches → zero-flux mask →
    mean subtraction → quadratic-form GMM scores

into one Pallas kernel per image strip, using an MXU permutation
matmul for the extraction (reference behaviour:
``jolideco/priors/patches/core.py:189-246`` extraction + masking +
normalisation feeding ``jolideco/priors/patches/gmm.py:262-281``
scoring):

- A strip of ``p`` image rows ``(p, C)`` holds one row of ``C/p``
  non-overlapping patches of an offset group. The de-interleave
  ``strip[r, p·j + c] → xT[(r,c), j]`` is an unsupported Mosaic shape
  cast directly, but becomes two *supported* reshapes after a one-hot
  permutation matmul ``Y = strip @ S`` with
  ``S[p·j + c, c·(C/p) + j] = 1`` — data movement done on the MXU,
  the TPU-native trick. One-hot products are exact per element, so a
  three-way bf16 split of the f32 operand (3 × 8 = 24 mantissa bits)
  reconstructs float32 exactly.
- The scorer then runs in the transposed formulation
  ``qT = AqT · uT`` with ``uT[(a,b), j] = xT[a,j] · xT[b,j]`` and a
  sublane max/argmax — same math as ``gmm_pallas._logits_block``,
  feature-major.
- The backward mixes ``A_k``/``b_k`` columns with a weight matmul —
  exact one-hot weights for the MAP max, a softmax over components
  (recomputed in-kernel from the saved patches and the forward's
  logsumexp) for the marginalise mode — applies the mean-subtraction
  and validity transposes in-register, and returns to image layout
  through the inverse permutation matmul. The training step never
  materialises a patch matrix in row-major layout, and the only
  full-size HBM intermediate is the feature-major ``(64, N)``
  normalised-patch tensor saved for the backward (a straight store,
  no relayout).
- Each grid step processes ``R`` image strips at once (``R`` the
  largest of 8/4/2/1 dividing the strip count): the per-step
  overhead (~2 µs) amortises over ``R·128`` patches, the permutation
  matmul covers all ``R·p = 64`` sublanes of the MXU in one pass,
  and the scorer matmuls run at ``R·128`` lanes. The ``uT`` outer
  product is streamed in ``ab``-row a-panels so its VMEM footprint
  stays ≤ 2 MB regardless of ``R``. Outputs leave the kernel in
  strip-tile order and are transposed back to the public group-major
  patch order outside the ``custom_vjp`` (XLA maps the cotangent
  through the transpose automatically).
- Images narrower than one 1024-lane chunk (multiscale levels,
  upsampled small fields) are *strip-folded*: the width pads to a
  chunk divisor ``wp ∈ {128, 256, 512}`` and ``fold = 1024/wp``
  consecutive 8-row strips are laid side-by-side into one virtual
  1024-lane strip. Patch grids align at multiples of ``wp`` so no
  patch straddles a seam, and the flattened (strip, patch) order is
  preserved — ``t = (i mod fold)·(wp/8) + j`` flattens to
  ``i·(wp/8) + j`` — so masks and the output reorder stay plain
  reshapes and the kernel itself never sees a narrow chunk (Mosaic
  rejects sub-128-lane shape casts).

Differentiation is ``jax.custom_vjp`` (a Pallas backward cannot be
expressed as a transposable JVP). Forward-over-reverse probes
(``TotalLoss.hessian_diagonals``) therefore cannot differentiate
through the fused path — they fall back to the patch-level
``custom_jvp`` kernels via ``config.force_fused("off")``.
"""

from functools import lru_cache, partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = [
    "fused_supported",
    "gmm_score_fused_image",
    "gmm_score_fused_partial_sum",
    "fused_patch_count",
]

# lane-chunk width: strips are processed in (p, CHUNK) panels so the
# permutation matrix stays (CHUNK, CHUNK) regardless of image width
CHUNK = 1024
_PATCH = 8
_D = _PATCH * _PATCH
_NXC = CHUNK // _PATCH  # 128 patches per chunk


# narrowest image the fused path accepts: folded widths pad to the
# next chunk divisor, so below 128 px the lane waste outgrows the
# extraction saving and the XLA patch path is used instead
_MIN_W = 128


def fused_supported(image_shape, patch_shape, stride, n_features):
    """Whether the fused image-level scorer applies.

    Requires 8×8 patches (d = 64), stride dividing the patch edge,
    and an image at least 128 px wide (narrower images use the XLA
    extraction path; widths below one 1024-lane chunk are strip-folded
    — see the module docstring). Sizes that are not multiples of the
    chunk/patch grid are zero-padded inside
    :func:`gmm_score_fused_image`; the padded patches come back
    ``valid == False``.
    """
    h, w = image_shape[-2:]
    p = patch_shape[0]
    return (
        p == _PATCH
        and patch_shape[1] == p
        and n_features == _D
        and p % stride == 0
        and w >= _MIN_W
        and h >= p
    )


def _padded_dims(h, w):
    """Padded grid dims ``(hp, wp, fold)``.

    Width pads to a multiple of the 1024-lane chunk, or — below one
    chunk — to the next chunk divisor ``wp ∈ {128, 256, 512}`` with
    ``fold = CHUNK/wp`` strips folded side-by-side per virtual strip.
    Height pads to ``fold`` whole 8-row strips.
    """
    if w >= CHUNK:
        wp, fold = -(-w // CHUNK) * CHUNK, 1
    else:
        wp = next(c for c in (128, 256, 512, CHUNK) if c >= w)
        fold = CHUNK // wp
    hp = -(-h // (_PATCH * fold)) * (_PATCH * fold)
    return hp, wp, fold


@lru_cache(maxsize=4)
def _perm_matrices():
    """One-hot de-interleave matrix S and its transpose (host-side).

    ``S[p·j + c, c·NXC + j] = 1`` so ``(strip @ S)`` reorders lanes
    from pixel-major to (feature-offset)-major.
    """
    s = np.zeros((CHUNK, CHUNK), np.float32)
    for j in range(_NXC):
        for c in range(_PATCH):
            s[_PATCH * j + c, c * _NXC + j] = 1.0
    return s, np.ascontiguousarray(s.T)


def _offsets(stride):
    return [(a, b) for a in range(0, _PATCH, stride)
            for b in range(0, _PATCH, stride)]


def fused_patch_count(image_shape, stride):
    """Total (padded) patch count of the fused enumeration."""
    h, w = image_shape[-2:]
    hp, wp, _ = _padded_dims(h, w)
    n_groups = (_PATCH // stride) ** 2
    return n_groups * (hp // _PATCH) * (wp // _PATCH)


@lru_cache(maxsize=16)
def _grid_mask_np(h, w, stride):
    """Static real-patch mask in fused order ``(rows, 128)`` f32.

    The grid is enumerated group-major over the zero-padded
    ``(hp, wp)`` dims; patch ``(i, j)`` of group ``(a, b)`` is real iff
    it lies fully inside the unpadded image: ``i < (h-a)//p`` and
    ``j < (w-b)//p``. Strip-folding and chunk-splitting both preserve
    the flattened ``(strip, patch)`` order, so a plain reshape to
    128-lane rows matches the kernel layout at any fold and width.
    """
    hp, wp, _ = _padded_dims(h, w)
    ny, nx = hp // _PATCH, wp // _PATCH
    rows = []
    for a, b in _offsets(stride):
        na, nb = (h - a) // _PATCH, (w - b) // _PATCH
        m = ((np.arange(ny) < na)[:, None]
             & (np.arange(nx) < nb)[None, :])
        rows.append(m.reshape(-1, _NXC))
    return np.concatenate(rows, axis=0).astype(np.float32)


@lru_cache(maxsize=16)
def _fused_mask_np(h, w, stride, r_strips):
    """`_grid_mask_np` rearranged to the kernel's strip-tile order.

    Kernel row ``(group, tile, chunk)`` holds lanes ``(r, j)`` with
    ``r`` the *virtual* strip within the tile — i.e. virtual strip
    ``tile·R + r`` of the strip-major grid mask.
    """
    m = _grid_mask_np(h, w, stride)
    hp, wp, fold = _padded_dims(h, w)
    nyv = hp // _PATCH // fold
    wc = wp * fold // CHUNK
    g = m.shape[0] // (nyv * wc)
    m = m.reshape(g, nyv // r_strips, r_strips, wc, _NXC)
    m = m.transpose(0, 1, 3, 2, 4)
    return np.ascontiguousarray(
        m.reshape(g * (nyv // r_strips) * wc, 1, r_strips * _NXC)
    )


def _strips_per_tile(ny):
    """Largest supported strip batch dividing the strip count."""
    return next(r for r in (8, 4, 2, 1) if ny % r == 0)


def _panel_rows(nl):
    """a-panel row count for the streamed ``uT`` outer product.

    Full (one-shot, matching the un-batched kernel exactly) at
    ``R = 1``; otherwise sized so one f32 panel is ~1 MB of VMEM.
    """
    if nl == _NXC:
        return _D
    return max(1, (1 << 20) // (_D * nl * 4))


def _split3(a):
    """Three-way bf16 split: hi + mid + lo reconstructs f32 exactly."""
    hi = a.astype(jnp.bfloat16)
    r1 = a - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


def _permute_exact(strip, s_ref):
    """Exact f32 ``strip @ S`` for a one-hot ``S`` (bf16 operands)."""
    hi, mid, lo = _split3(strip)
    return (
        jnp.dot(hi, s_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(mid, s_ref[:], preferred_element_type=jnp.float32)
        + jnp.dot(lo, s_ref[:], preferred_element_type=jnp.float32)
    )


def _deinterleave(y, r_strips):
    """Permuted strips ``(R·p, CHUNK)`` → feature-major ``(d, R·NXC)``.

    Column ``r·NXC + j`` is patch ``j`` of strip ``r`` (strip-tile
    lane order; the public group-major order is restored outside the
    kernel by a transpose).
    """
    if r_strips == 1:
        return y.reshape(_PATCH, _PATCH, _NXC).reshape(_D, _NXC)
    return jnp.concatenate(
        [
            lax.slice(y, (r * _PATCH, 0), ((r + 1) * _PATCH, CHUNK))
            .reshape(_PATCH, _PATCH, _NXC).reshape(_D, _NXC)
            for r in range(r_strips)
        ],
        axis=1,
    )


def _logits_streamed(xtn, aq_refs, bqt_ref, c2t_ref, mode, nl):
    """``(K_pad, nl)`` logits from feature-major patches.

    The ``uT`` outer product streams in ``ab``-row a-panels so its VMEM
    footprint stays bounded at any lane count; shared by the forward
    and the marginalise backward (which recomputes logits rather than
    saving the ``(K_pad, n)`` tensor to HBM).
    """
    k_pad = aq_refs[0].shape[0]
    ab = _panel_rows(nl)
    qt = jnp.zeros((k_pad, nl), jnp.float32)
    for a0 in range(0, _D, ab):
        # uT panel: rows (a - a0)·d + b = xtn[a]·xtn[b], a in [a0, a0+ab)
        xa = jnp.concatenate(
            [lax.broadcast_in_dim(xtn[a:a + 1, :], (_D, nl), (0, 1))
             for a in range(a0, a0 + ab)],
            axis=0,
        )
        ut = xa * pltpu.repeat(xtn, ab, axis=0)
        sl = slice(a0 * _D, (a0 + ab) * _D)
        if mode == "split3":
            aqt_hi_ref, aqt_lo_ref = aq_refs
            ut_hi = ut.astype(jnp.bfloat16)
            ut_lo = (ut - ut_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            qt = (
                qt
                + jnp.dot(aqt_hi_ref[:, sl], ut_hi,
                          preferred_element_type=jnp.float32)
                + jnp.dot(aqt_hi_ref[:, sl], ut_lo,
                          preferred_element_type=jnp.float32)
                + jnp.dot(aqt_lo_ref[:, sl], ut_hi,
                          preferred_element_type=jnp.float32)
            )
        else:
            (aqt_ref,) = aq_refs
            prec = (lax.Precision.HIGHEST if mode == "highest"
                    else lax.Precision.DEFAULT)
            qt = qt + jnp.dot(aqt_ref[:, sl], ut,
                              preferred_element_type=jnp.float32,
                              precision=prec)
    xb = jnp.dot(bqt_ref[:], xtn, preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    return -0.5 * qt + xb + c2t_ref[:]          # (K_pad, nl)


def _fwd_kernel(img_ref, mask_ref, s_ref, *refs, mode, sentinel,
                r_strips, marginalize):
    if mode == "split3":
        aqt_hi_ref, aqt_lo_ref, bqt_ref, c2t_ref, \
            values_ref, argmax_ref, valid_ref, xtn_ref = refs
        aq_refs = (aqt_hi_ref, aqt_lo_ref)
    else:
        aqt_ref, bqt_ref, c2t_ref, \
            values_ref, argmax_ref, valid_ref, xtn_ref = refs
        aq_refs = (aqt_ref,)

    nl = r_strips * _NXC
    strips = img_ref[0, 0].reshape(r_strips * _PATCH, CHUNK)
    y = _permute_exact(strips, s_ref)           # one MXU pass, all strips
    xt = _deinterleave(y, r_strips)             # (d, nl)

    sentinel_ok = jnp.all(xt > sentinel, axis=0, keepdims=True)
    valid = jnp.where(sentinel_ok, mask_ref[0], 0.0)    # (1, nl) f32
    xt = xt * valid
    mean = jnp.mean(xt, axis=0, keepdims=True)
    xtn = xt - mean
    xtn_ref[:] = xtn
    valid_ref[0] = valid

    logits = _logits_streamed(xtn, aq_refs, bqt_ref, c2t_ref, mode, nl)

    best = jnp.max(logits, axis=0, keepdims=True)
    sub = lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    argmax_ref[0] = jnp.min(
        jnp.where(logits >= best, sub, logits.shape[0]),
        axis=0, keepdims=True,
    )
    if marginalize:
        values_ref[0] = best + jnp.log(
            jnp.sum(jnp.exp(logits - best), axis=0, keepdims=True)
        )
    else:
        values_ref[0] = best


def _select_contract_t(xtn, w_hi, w_lo, aq_hi_ref, aq_lo_ref, bq_ref,
                       nl):
    """``b_w - A_w x`` in the feature-major layout.

    ``A_w = Σ_k w_k A_k``, ``b_w = Σ_k w_k b_k`` with per-patch
    component weights ``(K_pad, nl)`` given as a bf16 hi/lo pair
    (``w_lo=None`` for exact one-hot weights). The ``A`` mixture runs
    on the MXU, streamed in a-panels like the forward's ``uT``.
    """
    ab = _panel_rows(nl)
    rows = []
    for a0 in range(0, _D, ab):
        sl = slice(a0 * _D, (a0 + ab) * _D)
        panel = (
            jnp.dot(aq_hi_ref[sl, :], w_hi,
                    preferred_element_type=jnp.float32)
            + jnp.dot(aq_lo_ref[sl, :], w_hi,
                      preferred_element_type=jnp.float32)
        )
        if w_lo is not None:
            panel = panel + jnp.dot(aq_hi_ref[sl, :], w_lo,
                                    preferred_element_type=jnp.float32)
        ar3 = panel.reshape(ab, _D, nl)         # (a, b, j)
        rows.append(jnp.sum(ar3 * xtn[None, :, :], axis=1))
    xa = rows[0] if len(rows) == 1 else jnp.concatenate(rows, axis=0)

    bsel = jnp.dot(bq_ref[:], w_hi.astype(jnp.float32),
                   preferred_element_type=jnp.float32,
                   precision=lax.Precision.HIGHEST)
    if w_lo is not None:
        bsel = bsel + jnp.dot(bq_ref[:], w_lo.astype(jnp.float32),
                              preferred_element_type=jnp.float32,
                              precision=lax.Precision.HIGHEST)
    return bsel - xa


def _dimg_epilogue(dxtn, valid_ref, st_ref, dimg_ref, r_strips):
    """Transpose of mean subtraction + mask, then permute to image."""
    dxt = dxtn - jnp.mean(dxtn, axis=0, keepdims=True)
    dxt = dxt * valid_ref[0]

    if r_strips == 1:
        dy = dxt.reshape(_PATCH, _PATCH, _NXC).reshape(_PATCH, CHUNK)
    else:
        dy = jnp.concatenate(
            [
                lax.slice(dxt, (0, r * _NXC), (_D, (r + 1) * _NXC))
                .reshape(_PATCH, _PATCH, _NXC).reshape(_PATCH, CHUNK)
                for r in range(r_strips)
            ],
            axis=0,
        )                                       # (R·p, CHUNK)
    out = _permute_exact(dy, st_ref)            # one MXU pass, all strips
    dimg_ref[0, 0] = out.reshape(r_strips, _PATCH, CHUNK)


def _bwd_kernel(xtn_ref, argmax_ref, valid_ref, dval_ref, st_ref,
                aq_hi_ref, aq_lo_ref, bq_ref, dimg_ref, *, r_strips):
    xtn = xtn_ref[:]                            # (d, nl)
    nl = r_strips * _NXC
    k_pad = aq_hi_ref.shape[1]
    sub = lax.broadcasted_iota(jnp.int32, (k_pad, nl), 0)
    # one-hot products copy the bf16 hi/lo split exactly, f32
    # accumulate reconstructs f32 A_{k*}
    onehot = (sub == argmax_ref[0]).astype(jnp.bfloat16)
    unit = _select_contract_t(xtn, onehot, None, aq_hi_ref, aq_lo_ref,
                              bq_ref, nl)
    _dimg_epilogue(unit * dval_ref[0], valid_ref, st_ref, dimg_ref,
                   r_strips)


def _bwd_marg_kernel(xtn_ref, values_ref, valid_ref, dval_ref, st_ref,
                     *refs, mode, r_strips):
    if mode == "split3":
        aqt_hi_ref, aqt_lo_ref, bqt_ref, c2t_ref, \
            aq_hi_ref, aq_lo_ref, bq_ref, dimg_ref = refs
        aq_refs = (aqt_hi_ref, aqt_lo_ref)
    else:
        aqt_ref, bqt_ref, c2t_ref, \
            aq_hi_ref, aq_lo_ref, bq_ref, dimg_ref = refs
        aq_refs = (aqt_ref,)

    xtn = xtn_ref[:]                            # (d, nl)
    nl = r_strips * _NXC
    # recompute logits (cheaper than a (K_pad, n) HBM round-trip);
    # softmax against the forward's logsumexp, renormalised to absorb
    # f32 roundoff between the saved lse and the recomputed logits
    logits = _logits_streamed(xtn, aq_refs, bqt_ref, c2t_ref, mode, nl)
    p = jnp.exp(logits - values_ref[0])
    p = p / jnp.sum(p, axis=0, keepdims=True)
    p_hi = p.astype(jnp.bfloat16)
    p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    unit = _select_contract_t(xtn, p_hi, p_lo, aq_hi_ref, aq_lo_ref,
                              bq_ref, nl)
    _dimg_epilogue(unit * dval_ref[0], valid_ref, st_ref, dimg_ref,
                   r_strips)


def _mode(precision):
    if precision == lax.Precision.HIGH:
        return "split3"
    if precision == lax.Precision.HIGHEST:
        return "highest"
    return "default"


def _full(a):
    return pl.BlockSpec(a.shape, lambda g, i, c: (0,) * a.ndim,
                        memory_space=pltpu.VMEM)


@partial(jax.custom_vjp, nondiff_argnums=(0, 1, 2, 3))
def _fused_score(interpret, mode, sentinel, marginalize, imgs, mask2,
                 buffers):
    out, _ = _fused_forward(interpret, mode, sentinel, marginalize,
                            imgs, mask2, buffers)
    return out


def _fused_forward(interpret, mode, sentinel, marginalize, imgs, mask2,
                   buffers):
    g_, nt, r_strips, p, w = imgs.shape
    wc = w // CHUNK
    nrows = g_ * nt * wc
    nl = r_strips * _NXC
    n = nrows * nl

    if mode == "split3":
        aq_inputs = (buffers["aqt_hi"], buffers["aqt_lo"])
    else:
        aq_inputs = (buffers["aqt"],)
    bqt, c2t = buffers["bqt"], buffers["const2t"]
    s_mat = buffers["s"]

    def row_ix(g, i, c):
        return ((g * nt + i) * wc + c, 0, 0)

    # per-row outputs are (nrows, 1, nl) so the (1, 1, nl) block
    # matches the trailing dims exactly (Mosaic block-shape rule)
    row = pl.BlockSpec((1, 1, nl), row_ix, memory_space=pltpu.VMEM)
    xtn_spec = pl.BlockSpec(
        (_D, nl), lambda g, i, c: (0, (g * nt + i) * wc + c),
        memory_space=pltpu.VMEM,
    )

    values2, argmax2, valid2, xtn = pl.pallas_call(
        partial(_fwd_kernel, mode=mode, sentinel=sentinel,
                r_strips=r_strips, marginalize=marginalize),
        grid=(g_, nt, wc),
        in_specs=[
            pl.BlockSpec((1, 1, r_strips, p, CHUNK),
                         lambda g, i, c: (g, i, 0, 0, c),
                         memory_space=pltpu.VMEM),
            row,
            _full(s_mat),
            *[_full(a) for a in aq_inputs],
            _full(bqt),
            _full(c2t),
        ],
        out_specs=[row, row, row, xtn_spec],
        out_shape=[
            jax.ShapeDtypeStruct((nrows, 1, nl), jnp.float32),
            jax.ShapeDtypeStruct((nrows, 1, nl), jnp.int32),
            jax.ShapeDtypeStruct((nrows, 1, nl), jnp.float32),
            jax.ShapeDtypeStruct((_D, n), jnp.float32),
        ],
        interpret=interpret,
    )(imgs, mask2, s_mat, *aq_inputs, bqt, c2t)

    return (values2, argmax2, valid2), (xtn, values2, argmax2, valid2)


def _fused_fwd(interpret, mode, sentinel, marginalize, imgs, mask2,
               buffers):
    out, res = _fused_forward(interpret, mode, sentinel, marginalize,
                              imgs, mask2, buffers)
    return out, (res, imgs.shape, buffers)


def _fused_bwd(interpret, mode, sentinel, marginalize, residuals,
               cotangents):
    (xtn, values2, argmax2, valid2), img_shape, buffers = residuals
    dvalues2, _, _ = cotangents
    g_, nt, r_strips, p, w = img_shape
    wc = w // CHUNK
    nrows = g_ * nt * wc
    nl = r_strips * _NXC

    def row_ix(g, i, c):
        return ((g * nt + i) * wc + c, 0, 0)

    row = pl.BlockSpec((1, 1, nl), row_ix, memory_space=pltpu.VMEM)
    xtn_spec = pl.BlockSpec(
        (_D, nl), lambda g, i, c: (0, (g * nt + i) * wc + c),
        memory_space=pltpu.VMEM,
    )
    out_spec = pl.BlockSpec((1, 1, r_strips, p, CHUNK),
                            lambda g, i, c: (g, i, 0, 0, c),
                            memory_space=pltpu.VMEM)

    if marginalize:
        if mode == "split3":
            aq_inputs = (buffers["aqt_hi"], buffers["aqt_lo"])
        else:
            aq_inputs = (buffers["aqt"],)
        dimgs = pl.pallas_call(
            partial(_bwd_marg_kernel, mode=mode, r_strips=r_strips),
            grid=(g_, nt, wc),
            in_specs=[
                xtn_spec, row, row, row,
                _full(buffers["st"]),
                *[_full(a) for a in aq_inputs],
                _full(buffers["bqt"]),
                _full(buffers["const2t"]),
                _full(buffers["aq_hi"]),
                _full(buffers["aq_lo"]),
                _full(buffers["bq"]),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(img_shape, jnp.float32),
            interpret=interpret,
        )(xtn, values2, valid2, dvalues2, buffers["st"], *aq_inputs,
          buffers["bqt"], buffers["const2t"], buffers["aq_hi"],
          buffers["aq_lo"], buffers["bq"])
    else:
        dimgs = pl.pallas_call(
            partial(_bwd_kernel, r_strips=r_strips),
            grid=(g_, nt, wc),
            in_specs=[
                xtn_spec, row, row, row,
                _full(buffers["st"]),
                _full(buffers["aq_hi"]),
                _full(buffers["aq_lo"]),
                _full(buffers["bq"]),
            ],
            out_specs=out_spec,
            out_shape=jax.ShapeDtypeStruct(img_shape, jnp.float32),
            interpret=interpret,
        )(xtn, argmax2, valid2, dvalues2, buffers["st"],
          buffers["aq_hi"], buffers["aq_lo"], buffers["bq"])

    zeros_mask = jnp.zeros((nrows, 1, nl), jnp.float32)
    zeros_buffers = jax.tree.map(jnp.zeros_like, buffers)
    return dimgs, zeros_mask, zeros_buffers


_fused_score.defvjp(_fused_fwd, _fused_bwd)


def _fused_buffers(packed):
    """Kernel-ready buffer dict from ``pack_gmm_buffers`` output."""
    s_np, st_np = _perm_matrices()
    return {
        "s": jnp.asarray(s_np, jnp.bfloat16),
        "st": jnp.asarray(st_np, jnp.bfloat16),
        "aqt": packed["aqt"],
        "aqt_hi": packed["aqt_hi"],
        "aqt_lo": packed["aqt_lo"],
        "aq_hi": packed["aq_hi"],
        "aq_lo": packed["aq_lo"],
        "bq": packed["bq"],
        "bqt": packed["bqt"],
        "const2t": packed["const2"].T,
    }


@lru_cache(maxsize=16)
def _strip_major_mask_np(h, w, stride, nyv_pad):
    """Real-patch mask in strip-major virtual-strip order.

    ``(g, nyv_pad, wc, NXC)`` f32 with the virtual-strip axis padded to
    ``nyv_pad`` (shard-padding strips come back all-invalid). Same
    enumeration as :func:`_grid_mask_np` — strip-folding preserves the
    flattened (strip, patch) order — but kept strip-major so a shard's
    contiguous strip block is one slice of axis 1.
    """
    hp, wp, fold = _padded_dims(h, w)
    ny = nyv_pad * fold                 # real 8-row strips incl. padding
    nx = wp // _PATCH
    wc = wp * fold // CHUNK
    offs = _offsets(stride)
    out = np.zeros((len(offs), nyv_pad, wc, _NXC), np.float32)
    for gi, (a, b) in enumerate(offs):
        na, nb = (h - a) // _PATCH, (w - b) // _PATCH
        m = ((np.arange(ny) < na)[:, None]
             & (np.arange(nx) < nb)[None, :])
        out[gi] = m.reshape(nyv_pad, wc, _NXC)
    return out


def gmm_score_fused_partial_sum(normed, patch_shape, stride, packed,
                                sentinel, n_shards, shard_index,
                                interpret=False,
                                precision=lax.Precision.HIGH,
                                marginalize=False):
    """Partial ``sum(values * valid)`` over one shard's strip block.

    Splits the virtual-strip axis of the fused enumeration into
    ``n_shards`` contiguous blocks (padding the strip count up to a
    multiple — padded strips come back invalid) and scores only block
    ``shard_index``, which may be a *traced* integer (e.g.
    ``lax.axis_index`` inside ``shard_map``). Summed over all shards
    this equals ``sum(where(valid, values, 0))`` of
    :func:`gmm_score_fused_image` — each patch belongs to exactly one
    shard. Gradients flow back to ``normed`` through the kernel's
    ``custom_vjp`` plus the differentiable pad/slice wrappers (the
    ``dynamic_slice`` adjoints scatter-add the per-shard strip
    gradients into the full image).

    This is the cross-chip partitioning of the flagship GMM patch
    prior (SURVEY.md §5 "patch-dimension blocking … spatially-sharded"
    row): each device scores a disjoint strip range and the caller
    ``psum``s the scalar.
    """
    h, w = normed.shape[-2:]
    if not fused_supported(normed.shape, patch_shape, stride, _D):
        raise ValueError("fused scorer does not support this shape")
    n_shards = int(n_shards)
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")

    hp, wp, fold = _padded_dims(h, w)
    nyv = hp // _PATCH // fold
    nyv_pad = -(-nyv // n_shards) * n_shards
    n_local = nyv_pad // n_shards       # virtual strips per shard
    rows_local = n_local * _PATCH * fold
    hp2 = nyv_pad * _PATCH * fold

    img = normed.reshape(h, w)
    padded = jnp.pad(img, ((0, hp2 - h + _PATCH), (0, wp - w + _PATCH)))
    row0 = shard_index * rows_local
    groups = [
        lax.dynamic_slice(padded, (row0 + a, b), (rows_local, wp))
        for a, b in _offsets(stride)
    ]
    g_ = len(groups)
    r_local = _strips_per_tile(n_local)
    nt = n_local // r_local
    wpv = wp * fold
    wc = wpv // CHUNK

    imgs = jnp.stack(groups)
    if fold > 1:
        imgs = (imgs.reshape(g_, n_local, fold, _PATCH, wp)
                .transpose(0, 1, 3, 2, 4))
    imgs = imgs.reshape(g_, nt, r_local, _PATCH, wpv)

    mask_full = jnp.asarray(_strip_major_mask_np(h, w, stride, nyv_pad))
    mask_loc = lax.dynamic_slice(
        mask_full, (0, shard_index * n_local, 0, 0),
        (g_, n_local, wc, _NXC),
    )
    mask2 = (mask_loc.reshape(g_, nt, r_local, wc, _NXC)
             .transpose(0, 1, 3, 2, 4)
             .reshape(g_ * nt * wc, 1, r_local * _NXC))

    buffers = _fused_buffers(packed)
    mode = _mode(precision)
    values2, _, valid2 = _fused_score(
        interpret, mode, float(sentinel), bool(marginalize), imgs,
        mask2, buffers
    )
    return jnp.sum(values2 * valid2)


def gmm_score_fused_image(normed, patch_shape, stride, packed, sentinel,
                          interpret=False,
                          precision=lax.Precision.HIGH,
                          marginalize=False):
    """Score all overlapping patches of ``normed`` directly.

    Fused equivalent of grouped extraction + zero-flux masking +
    mean-subtraction patch norm + ``gmm_score_pallas`` (MAP max or
    marginalise logsumexp over components). Patches are enumerated
    group-major over ``(p/s)²`` offset groups, each padded to the full
    ``(h/p, w/p)`` tiling; padded entries come back with
    ``valid == False``. The marginalise backward recomputes the logits
    from the saved normalised patches (no ``(K, N)`` HBM round-trip)
    and softmax-mixes components, like ``gmm_pallas._unit_marg_kernel``
    but in the fused feature-major layout.

    Returns ``(values (N,), argmax (N,), valid bool (N,))`` with
    ``N = fused_patch_count(normed.shape, stride)``.
    """
    h, w = normed.shape[-2:]
    if not fused_supported(normed.shape, patch_shape, stride, _D):
        raise ValueError("fused scorer does not support this shape")

    hp, wp, fold = _padded_dims(h, w)
    img = normed.reshape(h, w)
    padded = jnp.pad(img, ((0, hp - h + _PATCH), (0, wp - w + _PATCH)))
    groups = [
        lax.slice(padded, (a, b), (a + hp, b + wp))
        for a, b in _offsets(stride)
    ]
    nyv = hp // _PATCH // fold
    wpv = wp * fold
    wc = wpv // CHUNK
    r_strips = _strips_per_tile(nyv)
    nt = nyv // r_strips
    imgs = jnp.stack(groups)
    if fold > 1:
        # fold consecutive 8-row strips side-by-side into 1024-lane
        # virtual strips; flattened (strip, patch) order is preserved
        imgs = (imgs.reshape(len(groups), nyv, fold, _PATCH, wp)
                .transpose(0, 1, 3, 2, 4))
    imgs = imgs.reshape(len(groups), nt, r_strips, _PATCH, wpv)

    mask2 = jnp.asarray(_fused_mask_np(h, w, stride, r_strips))
    buffers = _fused_buffers(packed)

    mode = _mode(precision)
    values2, argmax2, valid2 = _fused_score(
        interpret, mode, float(sentinel), bool(marginalize), imgs,
        mask2, buffers
    )

    def reorder(x2):
        """Kernel strip-tile lane order → group-major patch order."""
        return (
            x2.reshape(len(groups), nt, wc, r_strips, _NXC)
            .transpose(0, 1, 3, 2, 4)
            .reshape(-1)
        )

    return (
        reorder(values2),
        reorder(argmax2),
        reorder(valid2) > 0.5,
    )
