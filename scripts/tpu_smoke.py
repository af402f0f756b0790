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

    from jax import lax

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

    flops = 2 * n * 200 * 64 * 64

    # reference values/argmax from the HIGHEST scan
    @jax.jit
    def ref_scan(x, *a):
        return gmm_score(x, *a)

    (v_ref, i_ref), t_scan = timeit(ref_scan, (x, *scan_args), "scan HIGHEST")
    v_ref = np.asarray(v_ref)
    i_ref = np.asarray(i_ref)
    print(f"  scan: {flops / t_scan / 1e12:.2f} TFLOP/s", flush=True)

    g_ref, tg_scan = timeit(
        jax.jit(jax.grad(lambda x, *a: gmm_score(x, *a)[0].sum())),
        (x, *scan_args), "grad scan HIGHEST",
    )
    g_ref = np.asarray(g_ref)
    scale = np.abs(g_ref).max()

    # backward-only timing for the scan path
    @jax.jit
    def vjp_bwd_scan(x, *a):
        _, pullback = jax.vjp(lambda x: gmm_score(x, *a)[0].sum(), x)
        return pullback(jnp.float32(1.0))

    timeit(vjp_bwd_scan, (x, *scan_args), "scan fwd+bwd (vjp)")

    for name, prec in [
        ("HIGHEST", lax.Precision.HIGHEST),
        ("DEFAULT", lax.Precision.DEFAULT),
    ]:
        fwd = jax.jit(
            lambda x, *a, p=prec: gmm_score_pallas(x, *a, False, p)
        )
        (v, i), t_pal = timeit(fwd, (x, *args_pallas), f"pallas {name} fwd")
        v = np.asarray(v)
        i = np.asarray(i)
        agree = (i == i_ref).mean()
        vdiff = np.abs(v - v_ref).max() / max(np.abs(v_ref).max(), 1)
        print(f"  {name}: {flops / t_pal / 1e12:.2f} TFLOP/s, "
              f"argmax agree {agree:.4f}, value reldiff {vdiff:.2e}",
              flush=True)

        grad = jax.jit(jax.grad(
            lambda x, *a, p=prec: gmm_score_pallas(x, *a, False, p)[0].sum()
        ))
        g, tg = timeit(grad, (x, *args_pallas), f"pallas {name} grad")
        g = np.asarray(g)
        print(f"  grad rel maxdiff {np.abs(g - g_ref).max() / scale:.2e}",
              flush=True)


if __name__ == "__main__":
    main()
