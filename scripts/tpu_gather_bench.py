"""Microbenchmark: MAP-backward gather formulations on TPU.

dx_n = -(x_n @ A_{k*_n} - b_{k*_n}) needs a per-row gather of A by
argmax. Compares lowering strategies.
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

    rs = np.random.RandomState(0)
    n, k, d = 65536, 200, 64
    x = jnp.asarray(rs.rand(n, d).astype(np.float32))
    a = jnp.asarray(rs.rand(k, d, d).astype(np.float32))
    a_flat = a.reshape(k, d * d)
    b = jnp.asarray(rs.rand(k, d).astype(np.float32))
    idx = jnp.asarray(rs.randint(0, k, n), jnp.int32)
    g = jnp.asarray(rs.rand(n).astype(np.float32))

    def timeit(fn, args, label, iters=30):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        per = (time.time() - t0) / iters
        print(f"{label}: {per*1e3:.2f} ms", flush=True)
        return out

    @jax.jit
    def v_take3d(x, a, b, idx, g):
        a_g = jnp.take(a, idx, axis=0)
        b_g = jnp.take(b, idx, axis=0)
        xa = jnp.sum(x[:, :, None] * a_g, axis=1)
        return -(xa - b_g) * g[:, None]

    @jax.jit
    def v_takeflat(x, a, b, idx, g):
        a_g = jnp.take(a_flat, idx, axis=0).reshape(-1, d, d)
        b_g = jnp.take(b, idx, axis=0)
        xa = jnp.sum(x[:, :, None] * a_g, axis=1)
        return -(xa - b_g) * g[:, None]

    @jax.jit
    def v_batched_matmul(x, a, b, idx, g):
        a_g = jnp.take(a, idx, axis=0)
        b_g = jnp.take(b, idx, axis=0)
        xa = jnp.einsum("nd,ndj->nj", x, a_g)
        return -(xa - b_g) * g[:, None]

    @jax.jit
    def v_onehot_chunked(x, a, b, idx, g):
        # process K in chunks: xa += (x @ A_k) masked; K matmuls but
        # full-size MXU work
        def body(carry, k0):
            xa = carry
            a_k = jax.lax.dynamic_index_in_dim(a, k0, 0, keepdims=False)
            contrib = jnp.dot(x, a_k, preferred_element_type=jnp.float32)
            mask = (idx == k0)[:, None]
            return xa + jnp.where(mask, contrib, 0.0), None

        xa, _ = jax.lax.scan(body, jnp.zeros_like(x), jnp.arange(k))
        b_g = jnp.take(b, idx, axis=0)
        return -(xa - b_g) * g[:, None]

    @jax.jit
    def v_sorted(x, a, b, idx, g):
        # sort rows by component, segment-matmul... approximated by
        # gather after sort to measure sort overhead
        order = jnp.argsort(idx)
        x_s = x[order]
        a_g = jnp.take(a, idx[order], axis=0)
        xa = jnp.sum(x_s[:, :, None] * a_g, axis=1)
        inv = jnp.argsort(order)
        return xa[inv]

    r1 = timeit(v_take3d, (x, a, b, idx, g), "take3d + reduce  ")
    r2 = timeit(v_takeflat, (x, a, b, idx, g), "takeflat + reduce")
    r3 = timeit(v_batched_matmul, (x, a, b, idx, g), "take + bmm       ")
    r4 = timeit(v_onehot_chunked, (x, a, b, idx, g), "masked scan      ")
    timeit(v_sorted, (x, a, b, idx, g), "sorted gather    ")

    print("agree 1-2:", np.allclose(np.asarray(r1), np.asarray(r2), atol=1e-3))
    print("agree 1-3:", np.allclose(np.asarray(r1), np.asarray(r3), atol=1e-3))
    print("agree 1-4:", np.allclose(np.asarray(r1), np.asarray(r4), atol=1e-3))


if __name__ == "__main__":
    main()
