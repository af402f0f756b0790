"""Pallas TPU kernel for GMM patch scoring (MAP reduction).

The streaming XLA scan in ``ops.gmm_score`` issues K separate
``(N, d) @ (d, d)`` matmuls — each underutilises the 128x128 MXU
(d = 64 contraction *and* 64 output lanes). This kernel restructures
the computation flash-attention-style:

- all K precision-Cholesky factors are packed host-side into one
  ``(d, K_pad * d)`` matrix ``B`` resident in VMEM (K=200, d=64 ->
  3.3 MB);
- a patch tile ``(TILE_N, d)`` is multiplied against 512-column blocks
  of ``B`` (full MXU lane width), whitened residuals are squared,
  pixel-weighted, and segment-reduced to per-component quadratic forms
  by a second matmul against a 0/1 segment matrix (also MXU), with a
  running max/argmax over components kept in registers;
- the ``(N, K)`` logit matrix never exists — only the ``(N,)`` running
  max and argmax flow back to HBM.

The backward pass exploits MAP semantics: gradients flow only through
each patch's argmax component, so it is a cheap gather + batched
matmul (``~1/K`` of the forward cost) in plain XLA.

Correctness is pinned against ``ops.gmm_score`` in interpret mode on
CPU; the marginalise (logsumexp) path stays on the XLA scan.
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
    "KB",
]

TILE_N = 1024  # tile-size sweep on v5e: 1024 > 512 > 256
KB = 8  # components per inner block; KB * d = 512 lanes per matmul


def pallas_supported(n_features, n_components):
    """Whether the kernel supports this GMM shape."""
    return n_features == 64 and n_components >= 1


def pack_gmm_buffers(means_prec, prec_chol, log_det, log_weights,
                     pixel_weights):
    """Pack GMM buffers into the kernel's dense layout (host-side numpy).

    Returns a dict of arrays; padded components carry ``-inf`` const so
    they never win the max.
    """
    prec_chol = np.asarray(prec_chol)
    means_prec = np.asarray(means_prec)
    k, d, _ = prec_chol.shape
    k_pad = -(-k // KB) * KB
    n_blocks = k_pad // KB

    b = np.zeros((d, k_pad * d), np.float32)
    mp = np.zeros((1, k_pad * d), np.float32)
    for i in range(k):
        b[:, i * d : (i + 1) * d] = prec_chol[i]
        mp[0, i * d : (i + 1) * d] = means_prec[i]

    w = np.tile(np.asarray(pixel_weights, np.float32).reshape(d), k_pad)[None]

    const = np.full((n_blocks, KB), -np.inf, np.float32)
    const.reshape(-1)[:k] = (
        -0.5 * d * LOG_2PI
        + np.asarray(log_det, np.float32)
        + np.asarray(log_weights, np.float32)
    )

    segment = np.zeros((KB * d, KB), np.float32)
    for c in range(KB):
        segment[c * d : (c + 1) * d, c] = 1.0

    # backward-pass quadratic form: q_k(x) = x A_k x^T - 2 x b_k + c_k
    # with A_k = P_k W P_k^T, b_k = mp_k W P_k^T, so
    # d logit_k / dx = -(x A_k - b_k) — one gather + one reduce.
    w_diag = np.asarray(pixel_weights, np.float64).reshape(d)
    a_quad = np.einsum("kde,e,kje->kdj", prec_chol, w_diag, prec_chol)
    b_quad = np.einsum("ke,e,kje->kj", means_prec, w_diag, prec_chol)

    # split-float representation for the "split3" kernel mode:
    # b = b_hi + b_lo with b_hi = bf16(b); DEFAULT-precision products of
    # bf16-representable f32 operands are exact on the MXU
    b_hi = np.asarray(jnp.asarray(b).astype(jnp.bfloat16).astype(jnp.float32))
    b_lo = b - b_hi

    return {
        "b_packed": jnp.asarray(b),
        "b_hi": jnp.asarray(b_hi),
        "b_lo": jnp.asarray(b_lo),
        "mp_row": jnp.asarray(mp),
        "w_row": jnp.asarray(w),
        "const": jnp.asarray(const),
        "segment": jnp.asarray(segment),
        "a_quad": jnp.asarray(a_quad, jnp.float32),
        "b_quad": jnp.asarray(b_quad, jnp.float32),
    }


def _score_kernel(*refs, precision, marginalize=False, split3=False):
    if split3:
        (x_ref, bhi_ref, blo_ref, mp_ref, w_ref, const_ref, seg_ref,
         values_ref, argmax_ref) = refs
        b_width = bhi_ref.shape[1]
    else:
        (x_ref, b_ref, mp_ref, w_ref, const_ref, seg_ref,
         values_ref, argmax_ref) = refs
        b_width = b_ref.shape[1]

    d = x_ref.shape[1]
    block = KB * d
    n_blocks = b_width // block

    x = x_ref[:]  # (TILE_N, d)
    if split3:
        # split-float operands: DEFAULT-precision MXU products of
        # bf16-representable f32 values are exact; dropping only the
        # lo*lo term keeps ~2^-16 relative accuracy at 3 passes
        # (HIGHEST costs 6).
        x_hi = x.astype(jnp.bfloat16).astype(jnp.float32)
        x_lo = x - x_hi

    def body(kb, carry):
        best, best_idx, lse = carry
        col0 = pl.multiple_of(kb * block, block)
        if split3:
            bhi = bhi_ref[:, pl.ds(col0, block)]
            blo = blo_ref[:, pl.ds(col0, block)]
            y = (
                jnp.dot(x_hi, bhi, preferred_element_type=jnp.float32)
                + jnp.dot(x_lo, bhi, preferred_element_type=jnp.float32)
                + jnp.dot(x_hi, blo, preferred_element_type=jnp.float32)
            )
        else:
            b_block = b_ref[:, pl.ds(col0, block)]      # (d, KB*d)
            y = jnp.dot(x, b_block, preferred_element_type=jnp.float32,
                        precision=precision)
        z = jnp.square(y - mp_ref[:, pl.ds(col0, block)])
        z = z * w_ref[:, pl.ds(col0, block)]
        # segment-reduce KB*d lanes -> KB per-component sums via MXU
        # (lane-slice VPU reductions measured slower than this matmul)
        if split3:
            # the segment matrix is 0/1: split z for exact accumulation
            z_hi = z.astype(jnp.bfloat16).astype(jnp.float32)
            z_lo = z - z_hi
            q = (
                jnp.dot(z_hi, seg_ref[:],
                        preferred_element_type=jnp.float32)
                + jnp.dot(z_lo, seg_ref[:],
                          preferred_element_type=jnp.float32)
            )
        else:
            q = jnp.dot(z, seg_ref[:], preferred_element_type=jnp.float32,
                        precision=precision)
        logits = -0.5 * q + const_ref[pl.ds(kb, 1), :]  # (TILE_N, KB)

        block_best = jnp.max(logits, axis=1, keepdims=True)
        lane = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 1)
        block_arg = jnp.min(
            jnp.where(logits >= block_best, lane, KB), axis=1, keepdims=True
        )
        take = block_best > best
        best = jnp.where(take, block_best, best)
        best_idx = jnp.where(take, kb * KB + block_arg, best_idx)

        if marginalize:
            # streaming logsumexp over the block (padded components
            # carry -inf const and contribute exp(-inf) = 0)
            block_lse = block_best[:, 0:1] + jnp.log(
                jnp.sum(jnp.exp(logits - block_best), axis=1, keepdims=True)
            )
            lse = jnp.maximum(lse, block_lse) + jnp.log1p(
                jnp.exp(-jnp.abs(lse - block_lse))
            )
        return best, best_idx, lse

    init = (
        jnp.full((x.shape[0], 1), -jnp.inf, jnp.float32),
        jnp.zeros((x.shape[0], 1), jnp.int32),
        jnp.full((x.shape[0], 1), -jnp.inf, jnp.float32),
    )
    best, best_idx, lse = jax.lax.fori_loop(0, n_blocks, body, init)
    values_ref[:] = lse if marginalize else best
    argmax_ref[:] = best_idx


def _score_forward_pallas(patches, packed, interpret=False,
                          precision=lax.Precision.HIGHEST, tile_n=None,
                          marginalize=False, split3=False):
    tile_n = tile_n or TILE_N
    n, d = patches.shape
    n_pad = -(-n // tile_n) * tile_n
    if n_pad != n:
        patches = jnp.pad(patches, ((0, n_pad - n), (0, 0)))

    mp_row = packed["mp_row"]
    w_row = packed["w_row"]
    const = packed["const"]
    segment = packed["segment"]

    if split3:
        b_inputs = (packed["b_hi"], packed["b_lo"])
    else:
        b_inputs = (packed["b_packed"],)

    grid = (n_pad // tile_n,)

    def full(shape):
        return pl.BlockSpec(shape, lambda i: (0, 0), memory_space=pltpu.VMEM)

    values, argmax = pl.pallas_call(
        partial(_score_kernel, precision=precision, marginalize=marginalize,
                split3=split3),
        grid=grid,
        in_specs=[
            pl.BlockSpec((tile_n, d), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            *[full(b.shape) for b in b_inputs],
            full(mp_row.shape),
            full(w_row.shape),
            full(const.shape),
            full(segment.shape),
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
    )(patches, *b_inputs, mp_row, w_row, const, segment)

    return values[:n, 0], argmax[:n, 0]


@partial(jax.custom_vjp, nondiff_argnums=(5, 6, 7))
def gmm_score_pallas(patches, packed, means_prec, prec_chol, pixel_weights,
                     interpret=False, precision=lax.Precision.HIGHEST,
                     marginalize=False):
    """GMM patch score via the Pallas kernel.

    Same contract as ``gmm_score``: returns ``(values (N,), argmax
    (N,))`` where values are the per-patch max (MAP) or logsumexp
    (marginalise) over components. ``packed`` comes from
    :func:`pack_gmm_buffers` (precompute once per GMM). ``precision``
    controls the MXU passes: HIGHEST for float32 parity (default, 6
    passes), HIGH for the split-float bf16x3 mode (~2^-16 accuracy at
    3 passes), DEFAULT for raw bf16 throughput.
    """
    split3 = precision == lax.Precision.HIGH
    return _score_forward_pallas(
        patches, packed, interpret=interpret,
        precision=lax.Precision.DEFAULT if split3 else precision,
        marginalize=marginalize, split3=split3,
    )


def _fwd(patches, packed, means_prec, prec_chol, pixel_weights, interpret,
         precision, marginalize):
    split3 = precision == lax.Precision.HIGH
    values, argmax = _score_forward_pallas(
        patches, packed, interpret=interpret,
        precision=lax.Precision.DEFAULT if split3 else precision,
        marginalize=marginalize, split3=split3,
    )
    residuals = (patches, packed, means_prec, prec_chol, pixel_weights,
                 argmax, values)
    return (values, argmax), residuals


def _bwd(interpret, precision, marginalize, residuals, cotangents):
    (patches, packed, means_prec, prec_chol, pixel_weights, argmax,
     values) = residuals
    g_values, _ = cotangents

    if not marginalize:
        # MAP backward via the gathered quadratic form:
        # d logit_{k*} / dx = -(x A_{k*} - b_{k*}).  The elementwise
        # broadcast-reduce keeps this on the VPU (bandwidth-bound on
        # the ~N*d*d gather) instead of N tiny batched MXU matmuls.
        d = patches.shape[1]
        a_g = jnp.take(
            packed["a_quad"].reshape(-1, d * d), argmax, axis=0
        ).reshape(-1, d, d)                                # (N, d, d)
        b_g = jnp.take(packed["b_quad"], argmax, axis=0)   # (N, d)
        xa = jnp.sum(patches[:, :, None] * a_g, axis=1)    # (N, d)
        dx = -(xa - b_g) * g_values[:, None]
    else:
        # logsumexp backward: softmax-weighted mixture over components,
        # re-scanned in KB-blocks against the packed buffers (values
        # holds the per-patch logsumexp).
        d = patches.shape[1]
        block = KB * d
        n_blocks = packed["b_packed"].shape[1] // block
        w_row = packed["w_row"][0]
        lse = values

        def body(dx, kb):
            col0 = kb * block
            b_blk = lax.dynamic_slice_in_dim(
                packed["b_packed"], col0, block, axis=1
            )
            mp_blk = lax.dynamic_slice_in_dim(
                packed["mp_row"][0], col0, block, axis=0
            )
            w_blk = lax.dynamic_slice_in_dim(w_row, col0, block, axis=0)
            const_blk = lax.dynamic_index_in_dim(
                packed["const"], kb, 0, keepdims=False
            )
            a_blk = lax.dynamic_slice_in_dim(
                packed["a_quad"], kb * KB, KB, axis=0
            )
            b_quad_blk = lax.dynamic_slice_in_dim(
                packed["b_quad"], kb * KB, KB, axis=0
            )

            y = jnp.dot(patches, b_blk, precision=precision) - mp_blk
            z = jnp.square(y) * w_blk
            q = z.reshape(-1, KB, d).sum(axis=-1)
            logits = -0.5 * q + const_blk                  # (N, KB)
            p = jnp.exp(logits - lse[:, None])             # softmax

            # d logit_k / dx = -(x A_k - b_k) for each block component
            xa = jnp.einsum(
                "nd,kdj->nkj", patches, a_blk, precision=precision
            )
            contrib = -(xa - b_quad_blk[None, :, :])       # (N, KB, d)
            dx, p_sum = dx
            dx = dx + jnp.einsum("nk,nkj->nj", p, contrib)
            p_sum = p_sum + p.sum(axis=1)
            return (dx, p_sum), None

        (dx, p_sum), _ = lax.scan(
            body,
            (jnp.zeros_like(patches), jnp.zeros(patches.shape[0],
                                                patches.dtype)),
            jnp.arange(n_blocks),
        )
        # renormalise: f32 roundoff between the kernel's lse and the
        # recomputed logits (magnitudes ~1e5) leaves sum(p) != 1
        dx = dx / p_sum[:, None]
        dx = dx * g_values[:, None]

    return (
        dx,
        jax.tree_util.tree_map(jnp.zeros_like, packed),
        jnp.zeros_like(means_prec),
        jnp.zeros_like(prec_chol),
        jnp.zeros_like(pixel_weights),
    )


gmm_score_pallas.defvjp(_fwd, _bwd)
