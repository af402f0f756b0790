"""Runtime configuration knobs."""

import jax

__all__ = [
    "use_pallas",
    "set_use_pallas",
    "pallas_mode",
    "force_pallas",
    "use_fused",
    "set_use_fused",
    "fused_enabled",
    "force_fused",
    "set_gmm_precision",
    "gmm_precision",
    "enable_persistent_cache",
]

# "auto": Pallas kernels on TPU backends, XLA elsewhere.
# "on": force Pallas (compiled). "interpret": Pallas in interpreter
# mode (for CPU testing). "off": always the XLA fallback.
_USE_PALLAS = "auto"

# "auto": the fused image-level extraction+scoring kernel whenever the
# Pallas dispatch is enabled and the shape supports it. "off": always
# extract patches with XLA and score patch tiles. The fused path is
# custom_vjp (reverse-mode only); forward-over-reverse probes disable
# it via force_fused("off").
_USE_FUSED = "auto"

# MXU precision for GMM scoring matmuls:
# - "high" (default): split-float bf16x3 Pallas path — measured 9e-6
#   relative logit accuracy with exact argmax agreement vs float32 at
#   half the cost (2x faster than the f32 scan);
# - "highest": full float32 (6-pass) for bit-level conservatism;
# - "default": raw bf16 throughput (~4e-3 accuracy, argmax flips on
#   ~0.5% of patches).
_GMM_PRECISION = "high"


def enable_persistent_cache(path=None, min_compile_time_secs=1.0):
    """Enable JAX's on-disk compilation cache.

    Compiled executables persist across processes, so repeated runs of
    the same configuration (benchmarks, batch jobs, the examples) skip
    the 20-40 s XLA compile entirely. Safe across library versions —
    the cache key includes the compiler fingerprint.

    Parameters
    ----------
    path : str or Path, optional
        Cache directory; defaults to ``~/.cache/jolideco-tpu-xla``.
    min_compile_time_secs : float
        Only cache compilations slower than this.
    """
    from pathlib import Path

    if path is None:
        path = Path.home() / ".cache" / "jolideco-tpu-xla"
    path = Path(path)
    path.mkdir(parents=True, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", str(path))
    jax.config.update(
        "jax_persistent_cache_min_compile_time_secs",
        float(min_compile_time_secs),
    )
    return path


def set_gmm_precision(mode):
    """Set GMM-scoring matmul precision: highest|high|default."""
    global _GMM_PRECISION
    if mode not in ("highest", "high", "default"):
        raise ValueError(f"invalid precision mode {mode!r}")
    _GMM_PRECISION = mode


def gmm_precision():
    """Resolved lax.Precision for GMM scoring."""
    from jax import lax

    return {
        "highest": lax.Precision.HIGHEST,
        "high": lax.Precision.HIGH,
        "default": lax.Precision.DEFAULT,
    }[_GMM_PRECISION]


def set_use_pallas(mode):
    """Set the Pallas dispatch mode: auto|on|interpret|off."""
    global _USE_PALLAS
    if mode not in ("auto", "on", "interpret", "off"):
        raise ValueError(f"invalid pallas mode {mode!r}")
    _USE_PALLAS = mode


def use_pallas():
    """Current Pallas dispatch mode."""
    return _USE_PALLAS


class force_pallas:
    """Context manager: temporarily override the Pallas dispatch mode.

    Used by second-order paths (Hessian flux errors): the Pallas
    backward kernels are not differentiable, so grad-of-grad probes
    trace the XLA scan scorer instead.

    Caveats: the mode is a process-global read at *trace* time — it is
    not thread-safe, and it does not invalidate jit caches compiled
    under a different mode. Entering the context and calling an
    already-compiled jitted function re-runs the old compilation; only
    functions first traced inside the context pick the override up.
    Safe for the eager ``hessian_diagonals`` usage; jitted callers
    should thread the mode as a static argument instead.
    """

    def __init__(self, mode):
        self.mode = mode

    def __enter__(self):
        global _USE_PALLAS
        self._saved = _USE_PALLAS
        set_use_pallas(self.mode)
        return self

    def __exit__(self, *exc):
        global _USE_PALLAS
        _USE_PALLAS = self._saved
        return False


def pallas_mode():
    """Resolve the mode: returns (enabled, interpret)."""
    mode = _USE_PALLAS
    if mode == "off":
        return False, False
    if mode == "on":
        return True, False
    if mode == "interpret":
        return True, True
    # auto: compiled Pallas only on TPU — the kernels use pltpu memory
    # spaces that cannot lower on GPU/Triton (the remote-attached TPU
    # plugin also reports "tpu" as the default backend)
    platform = jax.default_backend()
    return platform == "tpu", False


def set_use_fused(mode):
    """Set the fused extraction+scoring dispatch: auto|off."""
    global _USE_FUSED
    if mode not in ("auto", "off"):
        raise ValueError(f"invalid fused mode {mode!r}")
    _USE_FUSED = mode


def use_fused():
    """Current fused-kernel dispatch mode."""
    return _USE_FUSED


def fused_enabled():
    """Whether the fused image-level scorer may be dispatched.

    Requires both the fused knob and the Pallas dispatch to be on;
    shape support is checked separately at the call site
    (``ops.gmm_fused.fused_supported``). Same trace-time/global
    caveats as :func:`pallas_mode`.
    """
    if _USE_FUSED == "off":
        return False
    enabled, _ = pallas_mode()
    return enabled


class force_fused:
    """Context manager: temporarily override the fused dispatch.

    Used by second-order paths: the fused kernel is ``custom_vjp``
    (no JVP rule), so forward-over-reverse Hessian probes re-trace
    with the patch-level ``custom_jvp`` kernels instead. Same
    trace-time/global caveats as :class:`force_pallas`.
    """

    def __init__(self, mode):
        self.mode = mode

    def __enter__(self):
        global _USE_FUSED
        self._saved = _USE_FUSED
        set_use_fused(self.mode)
        return self

    def __exit__(self, *exc):
        global _USE_FUSED
        _USE_FUSED = self._saved
        return False
