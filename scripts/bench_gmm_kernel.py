"""Microbenchmark: the Pallas GMM scorer at benchmark scale.

Times forward, forward+gradient and forward-over-reverse (HVP) for the
three MXU precision modes at the headline shape (N = (1024/4)^2 = 65536
patches, K = 200, d = 64). Run on the TPU:

    python scripts/bench_gmm_kernel.py [--n 65536] [--iters 50]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def timeit(fn, *args, iters=50):
    out = fn(*args)
    jax_block(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax_block(out)
    return (time.time() - t0) / iters * 1e3


def jax_block(tree):
    import jax

    for leaf in jax.tree_util.tree_leaves(tree):
        leaf.block_until_ready()


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--n", type=int, default=65536)
    parser.add_argument("--iters", type=int, default=50)
    parser.add_argument("--marginalize", action="store_true")
    args = parser.parse_args()

    import jax
    import jax.numpy as jnp
    from jax import lax

    from bench import make_bench_gmm
    from jolideco_tpu.ops.gmm_pallas import gmm_score_pallas

    gmm = make_bench_gmm(k=200)
    pallas_args = (
        gmm.packed,
        gmm.means_precisions_cholesky,
        gmm.precisions_cholesky,
        gmm.pixel_weights,
    )

    rs = np.random.RandomState(0)
    x = jnp.asarray(rs.rand(args.n, 64).astype(np.float32) - 0.5)
    ones = jnp.ones_like(x)
    marg = args.marginalize

    results = {}
    for name, precision in [
        ("highest", lax.Precision.HIGHEST),
        ("split3", lax.Precision.HIGH),
        ("default", lax.Precision.DEFAULT),
    ]:
        fwd = jax.jit(
            lambda x, p=precision: gmm_score_pallas(
                x, *pallas_args, False, p, marg
            )[0]
        )
        grad = jax.jit(
            jax.grad(
                lambda x, p=precision: gmm_score_pallas(
                    x, *pallas_args, False, p, marg
                )[0].sum()
            )
        )
        row = {
            "fwd_ms": round(timeit(fwd, x, iters=args.iters), 3),
            "fwd_grad_ms": round(timeit(grad, x, iters=args.iters), 3),
        }
        hvp = jax.jit(
            lambda x, t, p=precision: jax.jvp(
                jax.grad(
                    lambda y: gmm_score_pallas(
                        y, *pallas_args, False, p, marg
                    )[0].sum()
                ),
                (x,),
                (t,),
            )[1]
        )
        row["hvp_ms"] = round(timeit(hvp, x, ones, iters=args.iters), 3)
        results[name] = row
        print(name, row, flush=True)

    # roofline context: the main contraction is (N, 4096) @ (4096, 256)
    macs = args.n * 4096 * 256
    print(json.dumps({
        "n": args.n,
        "marginalize": marg,
        "matmul_tflop": round(2 * macs / 1e12, 3),
        "results": results,
    }))


if __name__ == "__main__":
    main()
