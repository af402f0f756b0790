"""Roofline for the fused GMM patch scorer at the headline shape.

Times `ops.gmm_fused.gmm_score_fused_image` forward and
forward+backward on the real chip and compares against the analytic
MXU bound of the work the kernel actually schedules (extraction
permutation matmuls + quadratic-form scoring matmuls, both 3-pass
bf16-split in the headline `precision=high` mode), the same
methodology as the FFT roofline in docs/performance.md. Run:

    python scripts/bench_gmm_roofline.py [--size 1024] [--iters 50]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# v5e peak: 394 TFLOP/s bf16 MXU, 197 TFLOP/s fp32-accumulated pairs
PEAK_BF16 = 394e12
PATCH = 8
CHUNK = 1024


def timeit(fn, *args, iters=50):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters * 1e3


def mxu_bound_ms(h, w, stride, k, passes):
    """Analytic MXU time for the scheduled matmul work, in ms.

    Padded grid per the kernel's own layout (`_padded_dims`): width to
    a CHUNK multiple, height to whole 8-row strips plus the patch
    apron. Per offset group the kernel runs one (8R, CHUNK) @
    (CHUNK, CHUNK) permutation matmul per strip-chunk panel
    (extraction) and the (K, d^2) @ (d^2, lanes) scoring matmul over
    every patch lane; both split into `passes` bf16 MXU passes.
    """
    groups = (PATCH // stride) ** 2
    wp = -(-w // CHUNK) * CHUNK
    hp = -(-h // PATCH) * PATCH + PATCH  # apron for shifted groups
    strips = hp // PATCH
    d = PATCH * PATCH
    n_patches = groups * strips * (wp // PATCH)  # incl. padding lanes
    extract_macs = groups * strips * (PATCH * wp * CHUNK)
    score_macs = n_patches * k * d * d
    flops = 2 * (extract_macs + score_macs) * passes
    return 1e3 * flops / PEAK_BF16, {
        "extract_gflop": round(2 * extract_macs * passes / 1e9, 1),
        "score_gflop": round(2 * score_macs * passes / 1e9, 1),
        "n_patches_padded": n_patches,
    }


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--size", type=int, default=1024)
    parser.add_argument("--stride", type=int, default=4)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--precision", default="high",
                        choices=["highest", "high", "default"])
    parser.add_argument("--marginalize", action="store_true")
    parser.add_argument("--interpret", action="store_true",
                        help="Pallas interpreter on CPU (smoke test)")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp

    from bench import make_bench_gmm
    from jolideco_tpu import config as jt_config
    from jolideco_tpu.ops.gmm_fused import gmm_score_fused_image
    from jolideco_tpu.priors.patches.core import ZERO_FLUX_SENTINEL

    jt_config.set_gmm_precision(args.precision)
    precision = jt_config.gmm_precision()
    gmm = make_bench_gmm(k=200, stride=args.stride)
    k = int(gmm.means.shape[0])

    rs = np.random.RandomState(0)
    normed = jnp.asarray(
        rs.rand(args.size, args.size).astype(np.float32)
    )

    def score_sum(x):
        values, argmax, valid = gmm_score_fused_image(
            x, (PATCH, PATCH), args.stride, gmm.packed,
            ZERO_FLUX_SENTINEL, interpret=args.interpret,
            precision=precision, marginalize=args.marginalize,
        )
        return jnp.sum(jnp.where(valid, values, 0.0))

    fwd = jax.jit(score_sum)
    fwd_bwd = jax.jit(jax.value_and_grad(score_sum))

    t_fwd = timeit(fwd, normed, iters=args.iters)
    t_fb = timeit(fwd_bwd, normed, iters=args.iters)

    # MXU passes per f32 matmul: HIGHEST lowers to ~6 bf16 passes,
    # the manual hi/lo split runs 3, raw bf16 runs 1
    passes = {"highest": 6, "high": 3, "default": 1}[args.precision]
    bound_ms, detail = mxu_bound_ms(
        args.size, args.size, args.stride, k, passes
    )
    # backward: weight-mix matmul (K-col mix of A/b columns) + inverse
    # permutation ~= one scoring + one extraction pass again
    out = {
        "size": args.size,
        "stride": args.stride,
        "k": k,
        "precision": args.precision,
        "marginalize": bool(args.marginalize),
        "fwd_ms": round(t_fwd, 3),
        "fwd_bwd_ms": round(t_fb, 3),
        "bwd_ms": round(t_fb - t_fwd, 3),
        "mxu_bound_fwd_ms": round(bound_ms, 3),
        "fwd_pct_of_bound": round(100 * bound_ms / t_fwd, 1),
        **detail,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
