"""Split-float building blocks that survive XLA's excess-precision pass.

The obvious trace-time bf16 rounding ``x.astype(bfloat16).astype(f32)``
is *elided to identity* by XLA on TPU: with ``xla_allow_excess_precision``
(on by default) the simplifier removes narrowing ``f32->bf16->f32``
convert pairs. That silently zeroes the ``lo = x - hi`` compensation
operand of every split-float matmul built at trace time, collapsing the
scheme to a single plain-bf16 pass (~2^-9 relative instead of the
designed ~2^-16) — measured on hardware, see
``scripts/tpu_split_mm_probe.py``. Host-side (NumPy) splits and splits
inside Pallas kernel bodies (Mosaic compiles converts as written) are
not affected.

An ``optimization_barrier`` between the down- and up-cast pins the
rounding: the barrier is opaque to the simplifier, costs nothing at run
time, and is transparent to jit/vmap/grad.
"""

import jax.numpy as jnp
from jax import lax

__all__ = ["bf16_round"]


def bf16_round(x):
    """Round an f32 array to bf16 precision, returned as f32.

    Guaranteed to actually round on every backend (see module
    docstring); use this instead of ``astype(bfloat16).astype(f32)``
    whenever the low residual ``x - bf16_round(x)`` is consumed.
    """
    return lax.optimization_barrier(
        x.astype(jnp.bfloat16)
    ).astype(jnp.float32)
