"""Pallas TPU kernel for GMM patch scoring (MAP max and marginalise).

Scores ``N`` patches of dimension ``d = 64`` against ``K`` Gaussian
components with per-pixel overlap weights ``w`` (the EPLL hot loop,
reference ``jolideco/priors/patches/gmm.py:262-281``).

The round-1 kernel computed whitened residuals ``y = x @ L_k`` in
``KB``-component column blocks and segment-reduced ``y^2 w`` to
per-component sums with a 0/1 matmul. That segment matmul contracts
512 lanes into 8 outputs — it costs as many MXU cycles as the main
matmul and doubles the pass count. This kernel restructures the score
as an explicit quadratic form, which needs **one** big matmul and no
reduction matmul:

    q_k(x) = (xL_k - m'_k) W (xL_k - m'_k)^T
           = x A_k x^T - 2 x b_k + c_k,
    A_k = L_k W L_k^T,  b_k = m'_k W L_k^T,  c_k = m'_k W m'_k^T

- the kernel forms ``u = x (x) x`` (the row-wise outer product,
  ``(TILE_N, d^2)``) on the VPU and multiplies it against the packed
  ``(d^2, K_pad)`` matrix of all ``A_k`` — a single MXU contraction of
  4096 with zero padding waste (the round-1 layout padded its d=64
  contraction to 128, wasting half the array);
- ``x @ b`` is a negligible ``(TILE_N, 64) @ (64, K_pad)`` matmul and
  ``c_k`` folds into the per-component constant;
- the per-tile ``(TILE_N, K_pad)`` logit block is small enough to
  materialise in registers, so the MAP max/argmax *and* the
  marginalise logsumexp are plain lane reductions — both modes run at
  full kernel speed (the round-1 marginalise path fell back to a slow
  XLA scan);
- precision modes: HIGHEST keeps float32 operands (XLA 6-pass),
  HIGH is the split-float bf16x3 mode (hi/lo bf16 operand splits,
  ~2^-16 relative accuracy at 3 MXU passes), DEFAULT is raw bf16.

The backward never gathers from HBM (the round-1 MAP backward gathered
``(N, 64, 64)`` float32 quadratic forms — ~1 GB of traffic at benchmark
scale). Instead the per-patch ``A_{k*}`` row block is *selected on the
MXU* with a one-hot matmul: one-hot rows times a bf16 hi/lo split of
``A`` copy f32 values exactly (products by 1.0 are exact, and each
output element receives exactly one nonzero term), so the MAP backward
is exact f32 at two bf16 passes. The marginalise backward replaces the
one-hot with softmax weights (split bf16x3 for accuracy) and adds a
logit recomputation.

Second order is nested ``custom_jvp`` all the way down: the MAP unit
gradient's JVP is ``-t A_{k*}`` (argmax piecewise constant), and the
marginalise unit gradient's JVP is the softmax-HVP kernel
(``_hvp_marg_kernel``: one extra cross quadratic form gives the
directional logit derivatives, then two A-mixtures) — so
``TotalLoss.hessian_diagonals`` runs on compiled kernels in both
reductions.
"""

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .gmm_score import LOG_2PI

__all__ = [
    "gmm_score_pallas",
    "pack_gmm_buffers",
    "pallas_supported",
    "TILE_N",
]

TILE_N = 256  # patch rows per kernel instance (u buffer: TILE_N x 4096)
K_ALIGN = 128  # component padding: full MXU lane panels

# VMEM at TILE_N rows: the u outer-product buffer is TILE_N x 4096 f32
# plus its two broadcast factors; f32 A adds 4 MB. The HIGHEST mode
# would overflow the 16 MB scoped limit at 256 rows with the monolithic
# u buffer, so it builds u in _HIGHEST_JB-column-group blocks
# (TILE_N x JB*64 panels) accumulated through the MXU — full-tile
# occupancy at ~8 MB peak. The marginalise backward recomputes the
# logits AND holds the selection buffers, so it runs at half tile.
_TILE_BY_MODE = {"highest": 256, "split3": 256, "default": 256}
_TILE_BWD_MARG = 128
# Marginalise HVP runs as two stages (weights, then mixtures): one
# kernel holding both the aq scoring panels and the aqt mixture panels
# needs ~20 MB scoped VMEM at any tile size. Even split, stage 1
# streams TWO quadratic-form pipelines (logits + the t-cross term)
# against the resident aq panels (~18 MB at HIGHEST), so the HVP calls
# raise the scoped-VMEM cap — fine for an occasional Hessian probe
# (v5e has 128 MB physical VMEM; the cap trades pipelining headroom,
# not correctness).
_TILE_HVP_MARG = 64
_VMEM_HVP_MARG = 32 * 1024 * 1024
_HIGHEST_JB = 16  # j-block: u panels of 16*64 = 1024 lanes


def pallas_supported(n_features, n_components):
    """Whether the kernel supports this GMM shape."""
    return n_features == 64 and n_components >= 1


def _split_hi_lo(a):
    """bf16 hi/lo split of a float64/float32 array (host-side)."""
    a = np.asarray(a, np.float32)
    hi = np.asarray(jnp.asarray(a).astype(jnp.bfloat16))
    lo = np.asarray(
        jnp.asarray(a - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
    )
    return jnp.asarray(hi), jnp.asarray(lo)


def pack_gmm_buffers(means_prec, prec_chol, log_det, log_weights,
                     pixel_weights):
    """Pack GMM buffers into the kernel's quadratic-form layout.

    All products are computed in float64 host-side. Padded components
    carry ``-inf`` constants so they never win the max and vanish from
    the logsumexp.
    """
    prec_chol = np.asarray(prec_chol, np.float64)
    means_prec = np.asarray(means_prec, np.float64)
    w = np.asarray(pixel_weights, np.float64).reshape(-1)
    k, d, _ = prec_chol.shape
    k_pad = -(-k // K_ALIGN) * K_ALIGN

    # A_k = L_k W L_k^T, b_k = m' W L_k^T, c_k = m' W m'^T
    a_quad = np.einsum("kde,e,kje->kdj", prec_chol, w, prec_chol)
    b_quad = np.einsum("ke,e,kje->kj", means_prec, w, prec_chol)
    c_quad = np.einsum("ke,e,ke->k", means_prec, w, means_prec)

    # aq[(j*d + e), k] = A_k[j, e]; A is symmetric so the (j, e)
    # flattening order only has to match the in-kernel outer product.
    aq = np.ascontiguousarray(
        a_quad.reshape(k, d * d).T, dtype=np.float32
    )
    aq = np.pad(aq, ((0, 0), (0, k_pad - k)))
    aq_hi, aq_lo = _split_hi_lo(aq)

    # transposed copies for the backward's one-hot row selection
    aqt = np.ascontiguousarray(aq.T)
    aqt_hi, aqt_lo = _split_hi_lo(aqt)

    bq = np.zeros((d, k_pad), np.float32)
    bq[:, :k] = b_quad.T
    bqt = np.ascontiguousarray(bq.T)

    const2 = np.full((1, k_pad), -np.inf, np.float32)
    const2[0, :k] = (
        -0.5 * d * LOG_2PI
        + np.asarray(log_det, np.float64)
        + np.asarray(log_weights, np.float64)
        - 0.5 * c_quad
    )

    return {
        "aq": jnp.asarray(aq),
        "aq_hi": aq_hi,
        "aq_lo": aq_lo,
        "aqt": jnp.asarray(aqt),
        "aqt_hi": aqt_hi,
        "aqt_lo": aqt_lo,
        "bq": jnp.asarray(bq),
        "bqt": jnp.asarray(bqt),
        "const2": jnp.asarray(const2),
    }


def _outer_rows(x, d, j_lo=0, j_hi=None, x_e=None):
    """Row-wise outer product ``u[n, (j - j_lo)*d + e] = x[n, j] y[n, e]``.

    ``pltpu.repeat`` TILES the lane vector (``[y0..y63, y0..y63, ...]``)
    — that is the e-cycling factor; the j-major factor concatenates
    single-lane broadcasts. ``j_lo/j_hi`` select a block of the outer
    index so callers can stream u in panels instead of materialising
    the full ``(TILE_N, d*d)`` buffer. ``x_e`` (default ``x``) supplies
    the e-cycling factor ``y`` for cross forms like ``t_j x_e`` (the
    marginalise HVP's directional quadratic term).
    """
    if j_hi is None:
        j_hi = d
    if x_e is None:
        x_e = x
    n_j = j_hi - j_lo
    xe = pltpu.repeat(x_e, n_j, axis=1)           # y_e cycling
    xj = jnp.concatenate(                         # x_j repeated d times
        [jax.lax.broadcast_in_dim(x[:, j:j + 1], (x.shape[0], d), (0, 1))
         for j in range(j_lo, j_hi)],
        axis=1,
    )
    return xj * xe


def _quad_rows(x, aq_refs, mode, x_e=None):
    """Per-tile quadratic form ``q[n, k] = x_n A_k y_n^T`` (``y = x_e``
    for cross forms, default ``y = x``)."""
    d = x.shape[1]
    if mode == "split3":
        u = _outer_rows(x, d, x_e=x_e)
        aq_hi, aq_lo = aq_refs
        u_hi = u.astype(jnp.bfloat16)
        u_lo = (u - u_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return (
            jnp.dot(u_hi, aq_hi[:], preferred_element_type=jnp.float32)
            + jnp.dot(u_lo, aq_hi[:], preferred_element_type=jnp.float32)
            + jnp.dot(u_hi, aq_lo[:], preferred_element_type=jnp.float32)
        )
    if mode == "highest":
        # f32 operands would need a (TILE_N, d*d) f32 u buffer; stream
        # it in j-panels instead and accumulate the contraction so the
        # full 256-row tile fits VMEM
        (aq,) = aq_refs
        q = jnp.zeros((x.shape[0], aq.shape[1]), jnp.float32)
        for j0 in range(0, d, _HIGHEST_JB):
            u_blk = _outer_rows(x, d, j0, j0 + _HIGHEST_JB, x_e=x_e)
            q = q + jnp.dot(
                u_blk, aq[j0 * d:(j0 + _HIGHEST_JB) * d, :],
                preferred_element_type=jnp.float32,
                precision=lax.Precision.HIGHEST,
            )
        return q
    u = _outer_rows(x, d, x_e=x_e)
    (aq,) = aq_refs
    return jnp.dot(u, aq[:], preferred_element_type=jnp.float32,
                   precision=lax.Precision.DEFAULT)


def _logits_block(x, aq_refs, bq_ref, const2_ref, mode):
    """Per-tile logits ``(TILE_N, K_pad)`` from the quadratic form."""
    q = _quad_rows(x, aq_refs, mode)
    # the b term is a tiny d-contraction; keep it exact
    xb = jnp.dot(x, bq_ref[:], preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    return -0.5 * q + xb + const2_ref[:]


def _score_kernel(*refs, mode, marginalize):
    if mode == "split3":
        x_ref, aq_hi_ref, aq_lo_ref, bq_ref, const2_ref, values_ref, \
            argmax_ref = refs
        aq_refs = (aq_hi_ref, aq_lo_ref)
    else:
        x_ref, aq_ref, bq_ref, const2_ref, values_ref, argmax_ref = refs
        aq_refs = (aq_ref,)

    logits = _logits_block(x_ref[:], aq_refs, bq_ref, const2_ref, mode)

    best = jnp.max(logits, axis=1, keepdims=True)
    lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
    k_pad = logits.shape[1]
    argmax_ref[:] = jnp.min(
        jnp.where(logits >= best, lane, k_pad), axis=1, keepdims=True
    )
    if marginalize:
        values_ref[:] = best + jnp.log(
            jnp.sum(jnp.exp(logits - best), axis=1, keepdims=True)
        )
    else:
        values_ref[:] = best


def _mode(precision):
    if precision == lax.Precision.HIGH:
        return "split3"
    if precision == lax.Precision.HIGHEST:
        return "highest"
    return "default"


def _full(arr):
    return pl.BlockSpec(arr.shape, lambda i: (0,) * arr.ndim,
                        memory_space=pltpu.VMEM)


def _score_forward_pallas(patches, packed, interpret=False,
                          precision=lax.Precision.HIGHEST,
                          marginalize=False, tile_n=None):
    tile_n = tile_n or _TILE_BY_MODE[_mode(precision)]
    n, d = patches.shape
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        patches = jnp.pad(patches, ((0, n_pad - n), (0, 0)))

    mode = _mode(precision)
    if mode == "split3":
        aq_inputs = (packed["aq_hi"], packed["aq_lo"])
    else:
        aq_inputs = (packed["aq"],)
    bq = packed["bq"]
    const2 = packed["const2"]

    values, argmax = pl.pallas_call(
        partial(_score_kernel, mode=mode, marginalize=marginalize),
        grid=(n_pad // tile_n,),
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[_full(a) for a in aq_inputs],
            _full(bq),
            _full(const2),
        ],
        out_specs=[
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, 1), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, 1), jnp.int32),
        ],
        interpret=interpret,
    )(patches, *aq_inputs, bq, const2)

    return values[:n, 0], argmax[:n, 0]


def _select_contract(x, weights_hi, weights_lo, aqt_hi_ref, aqt_lo_ref,
                     bqt_ref):
    """``dx``-style contraction for weighted component mixtures.

    Computes ``b_w - x A_w`` where ``A_w = sum_k w_k A_k`` and
    ``b_w = sum_k w_k b_k`` with per-row weights ``(TILE_N, K_pad)``
    given as a bf16 hi/lo pair. The ``A`` row mixture happens on the
    MXU; the ``x``-contraction is d strided VPU multiply-accumulates
    (layout-friendly, no reshape relayout). ``bqt_ref=None`` drops the
    ``b`` term (used by the HVP kernel, which needs ``-x A_w`` only).
    """
    d = x.shape[1]
    arow = (
        jnp.dot(weights_hi, aqt_hi_ref[:],
                preferred_element_type=jnp.float32)
        + jnp.dot(weights_hi, aqt_lo_ref[:],
                  preferred_element_type=jnp.float32)
    )
    if weights_lo is not None:
        arow = arow + jnp.dot(weights_lo, aqt_hi_ref[:],
                              preferred_element_type=jnp.float32)

    xa = jnp.zeros_like(x)
    for j in range(d):
        xa = xa + x[:, j:j + 1] * arow[:, j * d:(j + 1) * d]
    if bqt_ref is None:
        return -xa

    b_sel = jnp.dot(
        weights_hi.astype(jnp.float32), bqt_ref[:],
        preferred_element_type=jnp.float32,
        precision=lax.Precision.HIGHEST,
    )
    if weights_lo is not None:
        b_sel = b_sel + jnp.dot(
            weights_lo.astype(jnp.float32), bqt_ref[:],
            preferred_element_type=jnp.float32,
            precision=lax.Precision.HIGHEST,
        )
    return b_sel - xa


def _onehot_rows(argmax_ref, n_rows, k_pad):
    lane = jax.lax.broadcasted_iota(jnp.int32, (n_rows, k_pad), 1)
    return (lane == argmax_ref[:]).astype(jnp.bfloat16)


def _unit_map_kernel(x_ref, argmax_ref, aqt_hi_ref, aqt_lo_ref,
                     bqt_ref, dx_ref):
    """Per-row score gradient ``d values / d x = b_{k*} - x A_{k*}``."""
    x = x_ref[:]
    onehot = _onehot_rows(argmax_ref, x.shape[0], aqt_hi_ref.shape[0])
    # one-hot rows copy A/b entries exactly: each output element gets
    # exactly one nonzero product, and 1.0 * bf16 is exact
    dx_ref[:] = _select_contract(x, onehot, None, aqt_hi_ref, aqt_lo_ref,
                                 bqt_ref)


def _hvp_map_kernel(t_ref, argmax_ref, aqt_hi_ref, aqt_lo_ref, dx_ref):
    """Hessian action ``-t A_{k*}`` (argmax piecewise constant)."""
    t = t_ref[:]
    onehot = _onehot_rows(argmax_ref, t.shape[0], aqt_hi_ref.shape[0])
    dx_ref[:] = _select_contract(t, onehot, None, aqt_hi_ref, aqt_lo_ref,
                                 None)


def _unit_marg_kernel(*refs, mode):
    if mode == "split3":
        (x_ref, values_ref, aq_hi_ref, aq_lo_ref, bq_ref,
         const2_ref, aqt_hi_ref, aqt_lo_ref, bqt_ref, dx_ref) = refs
        aq_refs = (aq_hi_ref, aq_lo_ref)
    else:
        (x_ref, values_ref, aq_ref, bq_ref, const2_ref,
         aqt_hi_ref, aqt_lo_ref, bqt_ref, dx_ref) = refs
        aq_refs = (aq_ref,)

    x = x_ref[:]
    logits = _logits_block(x, aq_refs, bq_ref, const2_ref, mode)
    # softmax against the forward's logsumexp; renormalise to absorb
    # f32 roundoff between the saved lse and the recomputed logits
    p = jnp.exp(logits - values_ref[:])
    p = p / jnp.sum(p, axis=1, keepdims=True)
    p_hi = p.astype(jnp.bfloat16)
    p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dx_ref[:] = _select_contract(x, p_hi, p_lo, aqt_hi_ref, aqt_lo_ref,
                                 bqt_ref)


def _hvp_marg_weights_kernel(*refs, mode):
    """Stage 1 of the marginalise-mode Hessian action on a tangent.

    With ``p = softmax(logits)`` and per-component score gradients
    ``r_k = b_k - x A_k``, the unit gradient is ``sum_k p_k r_k`` and
    its directional derivative along ``t`` is

        H t = -sum_k p_k (t A_k)  +  sum_k dp_k r_k,
        dp_k = p_k (g_k - sum_j p_j g_j),   g_k = r_k . t.

    This kernel emits the per-row weights ``(p, dp)``: the logits
    recompute plus one cross quadratic form ``u(t, x) @ aq`` (same MXU
    cost) for the directional logit derivatives ``g``. The A-mixtures
    live in stage 2 (:func:`_hvp_marg_mix_kernel`) — holding the
    ``aq`` scoring panels AND the ``aqt`` mixture panels in one kernel
    blows the 16 MB scoped-VMEM limit (~20 MB at any tile size).
    """
    if mode == "split3":
        (x_ref, t_ref, values_ref, aq_hi_ref, aq_lo_ref, bq_ref,
         const2_ref, p_ref, dp_ref) = refs
        aq_refs = (aq_hi_ref, aq_lo_ref)
    else:
        (x_ref, t_ref, values_ref, aq_ref, bq_ref, const2_ref,
         p_ref, dp_ref) = refs
        aq_refs = (aq_ref,)

    x = x_ref[:]
    t = t_ref[:]
    logits = _logits_block(x, aq_refs, bq_ref, const2_ref, mode)
    p = jnp.exp(logits - values_ref[:])
    p = p / jnp.sum(p, axis=1, keepdims=True)

    # g_k = r_k . t = t b_k - t A_k x^T (A symmetric)
    tb = jnp.dot(t, bq_ref[:], preferred_element_type=jnp.float32,
                 precision=lax.Precision.HIGHEST)
    g = tb - _quad_rows(t, aq_refs, mode, x_e=x)
    # padded components carry p = 0 (their const2 is -inf), so their
    # (zero-buffer) g values drop out of every term below
    gbar = jnp.sum(p * g, axis=1, keepdims=True)
    p_ref[:] = p
    dp_ref[:] = p * (g - gbar)


def _hvp_marg_mix_kernel(x_ref, t_ref, p_ref, dp_ref, aqt_hi_ref,
                         aqt_lo_ref, bqt_ref, dx_ref):
    """Stage 2 of the marginalise HVP: the two A-mixtures."""
    x = x_ref[:]
    t = t_ref[:]
    p = p_ref[:]
    dp = dp_ref[:]
    p_hi = p.astype(jnp.bfloat16)
    p_lo = (p - p_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dp_hi = dp.astype(jnp.bfloat16)
    dp_lo = (dp - dp_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    dx_ref[:] = (
        _select_contract(t, p_hi, p_lo, aqt_hi_ref, aqt_lo_ref, None)
        + _select_contract(x, dp_hi, dp_lo, aqt_hi_ref, aqt_lo_ref,
                           bqt_ref)
    )


def _row_specs(tile_n, d):
    row = pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    col = pl.BlockSpec((tile_n, 1), lambda i: (i, 0),
                       memory_space=pltpu.VMEM)
    return row, col


@partial(jax.custom_jvp, nondiff_argnums=(0,))
def _unit_map_pallas(interpret, x, argmax2, aqt_hi, aqt_lo, bqt):
    """MAP-mode per-row gradient ``b_{k*} - x A_{k*}`` (padded rows).

    custom_jvp so forward-over-reverse probes (Hessian diagonals) stay
    on the kernel path: the derivative with the argmax held piecewise
    constant is linear, ``d(unit)·t = -t A_{k*}``, served by
    :func:`_hvp_map_pallas` instead of re-tracing the XLA scan scorer.
    """
    n_pad, d = x.shape
    row_spec, col_spec = _row_specs(TILE_N, d)
    return pl.pallas_call(
        _unit_map_kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[row_spec, col_spec,
                  _full(aqt_hi), _full(aqt_lo), _full(bqt)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
    )(x, argmax2, aqt_hi, aqt_lo, bqt)


def _hvp_map_pallas(interpret, t, argmax2, aqt_hi, aqt_lo):
    n_pad, d = t.shape
    row_spec, col_spec = _row_specs(TILE_N, d)
    return pl.pallas_call(
        _hvp_map_kernel,
        grid=(n_pad // TILE_N,),
        in_specs=[row_spec, col_spec, _full(aqt_hi), _full(aqt_lo)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
    )(t, argmax2, aqt_hi, aqt_lo)


@_unit_map_pallas.defjvp
def _unit_map_pallas_jvp(interpret, primals, tangents):
    x, argmax2, aqt_hi, aqt_lo, bqt = primals
    t_x = tangents[0]
    unit = _unit_map_pallas(interpret, x, argmax2, aqt_hi, aqt_lo, bqt)
    tangent = _hvp_map_pallas(interpret, t_x, argmax2, aqt_hi, aqt_lo)
    return unit, tangent


@partial(jax.custom_jvp, nondiff_argnums=(0, 1))
def _unit_marg_pallas(interpret, mode, x, values2, *buffers):
    """Marginalise-mode per-row gradient (softmax-weighted mixture)."""
    n_pad, d = x.shape
    row_spec, col_spec = _row_specs(_TILE_BWD_MARG, d)
    return pl.pallas_call(
        partial(_unit_marg_kernel, mode=mode),
        grid=(n_pad // _TILE_BWD_MARG,),
        in_specs=[row_spec, col_spec, *[_full(b) for b in buffers]],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
    )(x, values2, *buffers)


def _hvp_marg_pallas(interpret, mode, t, x, values2, *buffers):
    n_pad, d = x.shape
    *aq_buffers, aqt_hi, aqt_lo, bqt = buffers
    k_pad = aqt_hi.shape[0]
    tile = _TILE_HVP_MARG
    row_spec, col_spec = _row_specs(tile, d)
    k_spec = pl.BlockSpec((tile, k_pad), lambda i: (i, 0),
                          memory_space=pltpu.VMEM)
    compiler_params = None
    if not interpret:
        compiler_params = pltpu.CompilerParams(
            vmem_limit_bytes=_VMEM_HVP_MARG
        )
    p, dp = pl.pallas_call(
        partial(_hvp_marg_weights_kernel, mode=mode),
        grid=(n_pad // tile,),
        in_specs=[row_spec, row_spec, col_spec,
                  *[_full(b) for b in aq_buffers]],
        out_specs=[k_spec, k_spec],
        out_shape=[
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
            jax.ShapeDtypeStruct((n_pad, k_pad), jnp.float32),
        ],
        interpret=interpret,
        compiler_params=compiler_params,
    )(x, t, values2, *aq_buffers)
    return pl.pallas_call(
        _hvp_marg_mix_kernel,
        grid=(n_pad // tile,),
        in_specs=[row_spec, row_spec, k_spec, k_spec,
                  _full(aqt_hi), _full(aqt_lo), _full(bqt)],
        out_specs=row_spec,
        out_shape=jax.ShapeDtypeStruct((n_pad, d), jnp.float32),
        interpret=interpret,
        compiler_params=compiler_params,
    )(x, t, p, dp, aqt_hi, aqt_lo, bqt)


@_unit_marg_pallas.defjvp
def _unit_marg_pallas_jvp(interpret, mode, primals, tangents):
    """JVP of the softmax-weighted unit gradient (the marginalise HVP).

    The kernel renormalises ``p`` against the recomputed logits, so
    ``values2`` only stabilises the exponentials — the unit gradient is
    exactly invariant to it and its tangent is ignored (as are the
    frozen GMM buffers', matching the MAP rule).
    """
    x, values2, *buffers = primals
    t_x = tangents[0]
    unit = _unit_marg_pallas(interpret, mode, x, values2, *buffers)
    tangent = _hvp_marg_pallas(interpret, mode, t_x, x, values2, *buffers)
    return unit, tangent


def _grad_unit(patches, values, argmax, packed, interpret, precision,
               marginalize):
    """``d values / d patches`` per row, dispatched to the kernels."""
    tile_n = _TILE_BWD_MARG if marginalize else TILE_N
    n, d = patches.shape
    n_pad = -(-n // tile_n) * tile_n
    x = patches
    if n_pad != n:
        x = jnp.pad(x, ((0, n_pad - n), (0, 0)))
        argmax = jnp.pad(argmax, ((0, n_pad - n),))
        values = jnp.pad(values, ((0, n_pad - n),))

    aqt_hi, aqt_lo, bqt = packed["aqt_hi"], packed["aqt_lo"], packed["bqt"]

    if not marginalize:
        unit = _unit_map_pallas(
            interpret, x, argmax[:, None], aqt_hi, aqt_lo, bqt
        )
    else:
        mode = _mode(precision)
        if mode == "split3":
            aq_inputs = (packed["aq_hi"], packed["aq_lo"])
        else:
            aq_inputs = (packed["aq"],)
        unit = _unit_marg_pallas(
            interpret, mode, x, values[:, None], *aq_inputs,
            packed["bq"], packed["const2"], aqt_hi, aqt_lo, bqt,
        )
    return unit[:n]


@partial(jax.custom_jvp, nondiff_argnums=(5, 6, 7))
def gmm_score_pallas(patches, packed, means_prec, prec_chol, pixel_weights,
                     interpret=False, precision=lax.Precision.HIGHEST,
                     marginalize=False):
    """GMM patch score via the Pallas kernel.

    Same contract as ``gmm_score``: returns ``(values (N,), argmax
    (N,))`` where values are the per-patch max (MAP) or logsumexp
    (marginalise) over components. ``packed`` comes from
    :func:`pack_gmm_buffers` (precompute once per GMM). ``precision``
    selects the MXU mode for the main contraction: HIGHEST = float32
    operands (6 passes), HIGH = split-float bf16x3 (~2^-16 relative at
    3 passes), DEFAULT = raw bf16 (1 pass).

    Differentiation is wired through nested ``jax.custom_jvp`` rather
    than ``custom_vjp``: the JVP rule expresses ``d values = unit · t``
    with ``unit`` the per-row score gradient (its own Pallas kernel,
    itself custom_jvp'd for the MAP mode). First-order reverse mode
    falls out by transposing the linear rule (the training path), and
    forward-over-reverse Hessian probes (``TotalLoss.
    hessian_diagonals``) run entirely on kernels — a ``custom_vjp``
    backward would have no JVP rule and forced a multi-minute re-trace
    of the XLA scan scorer at benchmark scale. Gradients flow to
    ``patches`` only (the GMM buffers are frozen, as in the reference).
    """
    return _score_forward_pallas(
        patches, packed, interpret=interpret, precision=precision,
        marginalize=marginalize,
    )


@gmm_score_pallas.defjvp
def _gmm_score_pallas_jvp(interpret, precision, marginalize, primals,
                          tangents):
    patches, packed, means_prec, prec_chol, pixel_weights = primals
    t_patches = tangents[0]
    values, argmax = gmm_score_pallas(
        patches, packed, means_prec, prec_chol, pixel_weights,
        interpret, precision, marginalize,
    )
    unit = _grad_unit(
        patches, values, argmax, packed, interpret, precision, marginalize
    )
    dvalues = jnp.sum(t_patches * unit, axis=1)
    dargmax = np.zeros(argmax.shape, dtype=jax.dtypes.float0)
    return (values, argmax), (dvalues, dargmax)
