"""Real-TPU smoke + microbenchmark: Pallas GMM kernel vs XLA scan.

Run on the tunnel-attached chip (slow first claim):
    python scripts/tpu_smoke.py
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp

    print("devices:", jax.devices(), flush=True)

    from bench import make_bench_gmm
    from jolideco_tpu import config
    from jolideco_tpu.ops.gmm_pallas import gmm_score_pallas
    from jolideco_tpu.ops.gmm_score import gmm_score

    gmm = make_bench_gmm(k=200)
    rs = np.random.RandomState(0)
    n = 65536
    x = jnp.asarray(rs.rand(n, 64).astype(np.float32) - 0.5)

    args_pallas = (
        gmm.packed,
        gmm.means_precisions_cholesky,
        gmm.precisions_cholesky,
        gmm.pixel_weights,
    )
    scan_args = (
        gmm.means_precisions_cholesky,
        gmm.precisions_cholesky,
        gmm.log_det_cholesky,
        gmm.log_weights,
        gmm.pixel_weights,
    )

    @jax.jit
    def fwd_pallas(x, *a):
        v, i = gmm_score_pallas(x, *a, False)
        return v.sum()

    @jax.jit
    def fwd_scan(x, *a):
        v, i = gmm_score(x, *a)
        return v.sum()

    grad_pallas = jax.jit(jax.grad(lambda x, *a: gmm_score_pallas(
        x, *a, False)[0].sum()))
    grad_scan = jax.jit(jax.grad(lambda x, *a: gmm_score(x, *a)[0].sum()))

    def timeit(fn, args, label, iters=20):
        t0 = time.time()
        out = fn(*args)
        jax.block_until_ready(out)
        compile_t = time.time() - t0
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        per_iter = (time.time() - t0) / iters
        print(f"{label}: compile {compile_t:.2f}s, {per_iter*1e3:.2f} ms/iter",
              flush=True)
        return out, per_iter

    v_scan, t_scan = timeit(fwd_scan, (x, *scan_args), "fwd  scan ")
    v_pal, t_pal = timeit(fwd_pallas, (x, *args_pallas), "fwd  pallas")
    print("fwd values close:",
          np.allclose(float(v_scan), float(v_pal), rtol=1e-4), flush=True)

    g_scan, tg_scan = timeit(grad_scan, (x, *scan_args), "grad scan ")
    g_pal, tg_pal = timeit(grad_pallas, (x, *args_pallas), "grad pallas")
    g_scan = np.asarray(g_scan)
    g_pal = np.asarray(g_pal)
    denom = np.abs(g_scan).max()
    print(f"grad maxdiff: {np.abs(g_scan - g_pal).max():.2e} "
          f"(rel {np.abs(g_scan - g_pal).max() / denom:.2e}, "
          f"scale {denom:.2e})", flush=True)

    flops = 2 * n * 200 * 64 * 64
    print(f"fwd pallas: {flops / t_pal / 1e12:.2f} TFLOP/s effective",
          flush=True)
    print(f"fwd scan  : {flops / t_scan / 1e12:.2f} TFLOP/s effective",
          flush=True)


if __name__ == "__main__":
    main()
