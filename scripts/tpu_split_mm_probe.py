"""Microtest: does XLA defeat the f32-carrier split-float matmul?

Compares, against a HIGHEST-precision reference on the chip:
  A. plain DEFAULT einsum (bf16 MXU passes)
  B. current scheme: bf16-rounded *f32* carriers, 3 DEFAULT passes
  C. same 3 passes with operands cast to actual bfloat16 dtype
  D. scheme B with the three passes forced apart by optimization_barrier
"""
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).parent.parent))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from functools import partial


def rel(a, b):
    a = np.asarray(a, np.float64)
    b = np.asarray(b, np.float64)
    return np.abs(a - b).max() / np.abs(b).max()


def main():
    print("devices:", jax.devices())
    rs = np.random.RandomState(0)
    n = 96
    x = jnp.asarray(rs.randn(256, n).astype(np.float32))
    m = jnp.asarray(rs.randn(n, n).astype(np.float32))

    mm = partial(jnp.einsum, "ij,jk->ik",
                 preferred_element_type=jnp.float32)

    def split(a):
        hi = a.astype(jnp.bfloat16).astype(jnp.float32)
        return hi, a - hi

    @jax.jit
    def ref(x, m):
        return jnp.einsum("ij,jk->ik", x, m,
                          precision=lax.Precision.HIGHEST)

    @jax.jit
    def plain(x, m):
        return mm(x, m)

    @jax.jit
    def scheme_b(x, m):
        x_hi, x_lo = split(x)
        m_hi, m_lo = split(m)
        return mm(x_hi, m_hi) + mm(x_lo, m_hi) + mm(x_hi, m_lo)

    @jax.jit
    def scheme_c(x, m):
        x_hi, x_lo = split(x)
        m_hi, m_lo = split(m)
        xb, xl = x_hi.astype(jnp.bfloat16), x_lo.astype(jnp.bfloat16)
        mb, ml = m_hi.astype(jnp.bfloat16), m_lo.astype(jnp.bfloat16)
        return mm(xb, mb) + mm(xl, mb) + mm(xb, ml)

    @jax.jit
    def scheme_d(x, m):
        x_hi, x_lo = split(x)
        m_hi, m_lo = split(m)
        t1 = mm(x_hi, m_hi)
        (t1, x_lo, x_hi, m_lo) = lax.optimization_barrier(
            (t1, x_lo, x_hi, m_lo))
        t2 = mm(x_lo, m_hi)
        (t2, x_hi, m_lo) = lax.optimization_barrier((t2, x_hi, m_lo))
        t3 = mm(x_hi, m_lo)
        return t1 + t2 + t3

    r = np.asarray(ref(x, m))
    for name, fn in [("plain DEFAULT", plain), ("B f32-carrier", scheme_b),
                     ("C bf16-dtype", scheme_c), ("D barrier", scheme_d)]:
        print(name, rel(np.asarray(fn(x, m)), r))


if __name__ == "__main__":
    main()
