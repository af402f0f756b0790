"""Tune the GMM scoring kernels with fetch-synced timing.

Every timed window ends with a real device->host fetch (remote
backends do not drain on block_until_ready).
"""

import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).parent.parent))


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    print("devices:", jax.devices(), flush=True)

    from bench import make_bench_gmm
    from jolideco_tpu.ops.gmm_pallas import _score_forward_pallas
    from jolideco_tpu.ops.gmm_score import gmm_score

    gmm = make_bench_gmm(k=200)
    rs = np.random.RandomState(0)
    n = 65536
    x = jnp.asarray(rs.rand(n, 64).astype(np.float32) - 0.5)

    flops = 2 * n * 200 * 64 * 64

    def timeit_fetch(fn, args, label, iters=30):
        out = fn(*args)
        _ = float(np.asarray(out))  # full sync
        t0 = time.time()
        for _i in range(iters):
            out = fn(*args)
        value = float(np.asarray(out))  # fetch = true barrier
        per = (time.time() - t0) / iters
        print(f"{label}: {per*1e3:7.2f} ms  "
              f"({flops/per/1e12:5.2f} TF eff)  [{value:.3e}]", flush=True)
        return per

    scan_args = (
        gmm.means_precisions_cholesky,
        gmm.precisions_cholesky,
        gmm.log_det_cholesky,
        gmm.log_weights,
        gmm.pixel_weights,
    )

    @jax.jit
    def scan_fwd(x, *a):
        return gmm_score(x, *a)[0].sum()

    timeit_fetch(scan_fwd, (x, *scan_args), "scan  HIGHEST fwd        ")

    @jax.jit
    def scan_grad(x, *a):
        return jax.grad(lambda x: gmm_score(x, *a)[0].sum())(x).sum()

    timeit_fetch(scan_grad, (x, *scan_args), "scan  HIGHEST fwd+bwd    ")

    for prec_name, prec, split3 in [
        ("HIGHEST", lax.Precision.HIGHEST, False),
        ("SPLIT3 ", lax.Precision.DEFAULT, True),
        ("DEFAULT", lax.Precision.DEFAULT, False),
    ]:
        for tile in [512, 1024]:
            @jax.jit
            def pallas_fwd(x, packed, prec=prec, tile=tile, split3=split3):
                v, _ = _score_forward_pallas(
                    x, packed, precision=prec, tile_n=tile, split3=split3
                )
                return v.sum()

            timeit_fetch(
                pallas_fwd, (x, gmm.packed),
                f"pallas {prec_name} tile {tile:4d} fwd",
            )

    # split3 accuracy on real hardware
    @jax.jit
    def s3(x, packed):
        return _score_forward_pallas(
            x, packed, precision=lax.Precision.DEFAULT, split3=True
        )

    @jax.jit
    def hi(x, packed):
        return _score_forward_pallas(
            x, packed, precision=lax.Precision.HIGHEST
        )

    v3, i3 = s3(x, gmm.packed)
    vh, ih = hi(x, gmm.packed)
    v3 = np.asarray(v3)
    vh = np.asarray(vh)
    print(f"split3 vs highest: argmax agree "
          f"{(np.asarray(i3) == np.asarray(ih)).mean():.5f}, value reldiff "
          f"{np.abs(v3 - vh).max() / np.abs(vh).max():.2e}", flush=True)


if __name__ == "__main__":
    main()
