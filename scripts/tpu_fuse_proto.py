"""Prototype: fuse patch extraction into the Pallas GMM scorer.

The naive in-kernel space-to-depth (`reshape (8,1024)->(8,128,8)`) is an
unsupported Mosaic shape cast. TPU-native alternative: do the
rearrangement on the MXU with a one-hot permutation matmul (exact via
bf16 hi/lo splitting), which produces the patch matrix in feature-major
layout ``xT (64, n_patches)`` using only supported shape casts:

  Y  = strip(8,1024) @ S(1024,1024),  S[l, c*128+j] = (l == 8j+c)
  Y3 = Y.reshape(8, 8, 128)      # lane major-split: (r, c, j)
  xT = Y3.reshape(64, 128)       # merge (r, c) into sublanes

Then score in the transposed formulation qT = AqT . uT with
uT[(a,b), j] = xT[a, j] * xT[b, j] and sublane max/argmax.

Run on the TPU:  PYTHONPATH=/root/repo:/root/.axon_site python scripts/tpu_fuse_proto.py
"""
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from jolideco_tpu.ops.gmm_pallas import (
    _score_forward_pallas, pack_gmm_buffers,
)

P = 8
D = P * P
W = 1024
NX = W // P   # 128 patches per strip


def perm_matrix():
    """S[l, c*128+j] = 1 iff l == 8j+c (de-interleave lanes)."""
    S = np.zeros((W, W), np.float32)
    for j in range(NX):
        for c in range(P):
            S[P * j + c, c * NX + j] = 1.0
    return S


def _split_hi_lo(a):
    hi = a.astype(jnp.bfloat16)
    lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


def _strip_to_xt(strip, s_ref):
    """(8, 1024) f32 strip -> exact xT (64, 128) via MXU permute.

    The one-hot permutation matmul is exact per product (1.0 * bf16),
    so splitting the f32 operand into three bf16 terms (3 x 8 = 24
    mantissa bits) reconstructs the f32 value exactly.
    """
    hi = strip.astype(jnp.bfloat16)
    r1 = strip - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    y = (jnp.dot(hi, s_ref[:], preferred_element_type=jnp.float32)
         + jnp.dot(mid, s_ref[:], preferred_element_type=jnp.float32)
         + jnp.dot(lo, s_ref[:], preferred_element_type=jnp.float32))
    return y.reshape(P, P, NX).reshape(D, NX)


def _xt_kernel(img_ref, s_ref, out_ref):
    out_ref[:] = _strip_to_xt(img_ref[0], s_ref)


def extract_xt_pallas(img3, s_bf16):
    ny = img3.shape[0]
    return pl.pallas_call(
        _xt_kernel,
        grid=(ny,),
        in_specs=[
            pl.BlockSpec((1, P, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((W, W), lambda i: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((D, NX), lambda i: (0, i),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((D, ny * NX), jnp.float32),
    )(img3, s_bf16)


def _outer_cols(xt):
    """uT[(a,b), j] = xT[a, j] * xT[b, j]  -> (D*D, NX)."""
    ua = pltpu.repeat(xt, D, axis=0)               # b-major cycling? rows m*64+a = xT[a]
    ub = jnp.concatenate(
        [jax.lax.broadcast_in_dim(xt[a:a + 1, :], (D, NX), (0, 1))
         for a in range(D)], axis=0)
    return ua, ub


def _fused_kernel(img_ref, s_ref, aqt_hi_ref, aqt_lo_ref, bqt_ref,
                  c2t_ref, values_ref, argmax_ref):
    xt = _strip_to_xt(img_ref[0], s_ref)
    mean = jnp.mean(xt, axis=0, keepdims=True)
    xt = xt - mean
    # uT rows (a-major outer index to match Aq row order a*64+b):
    # u[(a,b)] = x_a * x_b ; build as (repeat-each-row a) * (tile b)
    xa = jnp.concatenate(
        [jax.lax.broadcast_in_dim(xt[a:a + 1, :], (D, NX), (0, 1))
         for a in range(D)], axis=0)               # rows a*64+b -> x_a
    xb = pltpu.repeat(xt, D, axis=0)               # rows a*64+b -> x_b
    ut = xa * xb
    ut_hi, ut_lo = _split_hi_lo(ut)
    qt = (jnp.dot(aqt_hi_ref[:], ut_hi, preferred_element_type=jnp.float32)
          + jnp.dot(aqt_hi_ref[:], ut_lo, preferred_element_type=jnp.float32)
          + jnp.dot(aqt_lo_ref[:], ut_hi, preferred_element_type=jnp.float32))
    xbterm = jnp.dot(bqt_ref[:], xt, preferred_element_type=jnp.float32,
                     precision=lax.Precision.HIGHEST)
    logits = -0.5 * qt + xbterm + c2t_ref[:]       # (K_pad, NX)
    best = jnp.max(logits, axis=0, keepdims=True)
    sub = jax.lax.broadcasted_iota(jnp.int32, logits.shape, 0)
    argmax_ref[:] = jnp.min(
        jnp.where(logits >= best, sub, logits.shape[0]), axis=0,
        keepdims=True)
    values_ref[:] = best


def fused_scores(img3, s_bf16, aqt_hi, aqt_lo, bqt, c2t):
    ny = img3.shape[0]
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _fused_kernel,
        grid=(ny,),
        in_specs=[
            pl.BlockSpec((1, P, W), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            full(s_bf16), full(aqt_hi), full(aqt_lo), full(bqt), full(c2t),
        ],
        out_specs=[
            pl.BlockSpec((1, NX), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, NX), lambda i: (0, i),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, ny * NX), jnp.float32),
            jax.ShapeDtypeStruct((1, ny * NX), jnp.int32),
        ],
    )(img3, s_bf16, aqt_hi, aqt_lo, bqt, c2t)


def timeit(fn, *args, iters=100):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    key = jax.random.PRNGKey(0)
    ny = 128
    img = jax.random.uniform(key, (ny * P, W), jnp.float32)
    img3 = img.reshape(ny, P, W)
    S = perm_matrix()
    s_bf16 = jnp.asarray(S, jnp.bfloat16)

    def xla_extract(im):
        s = im.reshape(ny, P, NX, P)
        return jnp.transpose(s, (0, 2, 1, 3)).reshape(ny * NX, D)
    xla_extract_j = jax.jit(xla_extract)

    # 1) rearrangement parity + cost
    xt_fn = jax.jit(partial(extract_xt_pallas, s_bf16=s_bf16))
    ref = np.asarray(xla_extract_j(img))
    got = np.asarray(xt_fn(img3)).T
    assert np.array_equal(ref, got), (
        f"mismatch {np.abs(ref-got).max()}")
    print("MXU-permute extraction: exact match")
    t_xla = timeit(xla_extract_j, img)
    t_pal = timeit(xt_fn, img3)
    print(f"extract 16384x64: xla={t_xla:.3f} ms  pallas-xT={t_pal:.3f} ms")

    # 2) fused image->scores vs extract + existing scorer
    rng = np.random.default_rng(1)
    K = 200
    means_prec = rng.normal(size=(K, D))
    prec_chol = rng.normal(size=(K, D, D)) * 0.1
    log_det = rng.normal(size=(K,))
    log_w = rng.normal(size=(K,))
    packed = pack_gmm_buffers(means_prec, prec_chol, log_det, log_w,
                              np.ones(D))
    # transposed buffers for the qT formulation
    aqt_hi = jnp.asarray(packed["aq_hi"]).T   # (K_pad, 4096) bf16
    aqt_lo = jnp.asarray(packed["aq_lo"]).T
    bqt = jnp.asarray(packed["bq"]).T         # (K_pad, 64)
    c2t = jnp.asarray(packed["const2"]).T     # (K_pad, 1)

    def unfused(im):
        x = xla_extract(im)
        x = x - jnp.mean(x, axis=1, keepdims=True)
        return _score_forward_pallas(x, packed,
                                     precision=lax.Precision.HIGH)
    unfused = jax.jit(unfused)

    fused = jax.jit(partial(fused_scores, s_bf16=s_bf16, aqt_hi=aqt_hi,
                            aqt_lo=aqt_lo, bqt=bqt, c2t=c2t))

    v0, a0 = unfused(img)
    v1, a1 = fused(img3)
    v1, a1 = v1[0], a1[0]
    np.testing.assert_allclose(np.asarray(v0), np.asarray(v1),
                               rtol=3e-4, atol=3e-4)
    match = np.mean(np.asarray(a0) == np.asarray(a1))
    print(f"fused parity ok, argmax match {match:.4f}")

    t_un = timeit(unfused, img)
    t_fu = timeit(fused, img3)
    print(f"scores 16384 patches: unfused={t_un:.3f} ms  fused={t_fu:.3f} ms")


if __name__ == "__main__":
    main()
