"""Runtime configuration knobs."""

import jax

__all__ = ["use_pallas", "set_use_pallas", "pallas_mode"]

# "auto": Pallas kernels on TPU backends, XLA elsewhere.
# "on": force Pallas (compiled). "interpret": Pallas in interpreter
# mode (for CPU testing). "off": always the XLA fallback.
_USE_PALLAS = "auto"


def set_use_pallas(mode):
    """Set the Pallas dispatch mode: auto|on|interpret|off."""
    global _USE_PALLAS
    if mode not in ("auto", "on", "interpret", "off"):
        raise ValueError(f"invalid pallas mode {mode!r}")
    _USE_PALLAS = mode


def use_pallas():
    """Current Pallas dispatch mode."""
    return _USE_PALLAS


def pallas_mode():
    """Resolve the mode: returns (enabled, interpret)."""
    mode = _USE_PALLAS
    if mode == "off":
        return False, False
    if mode == "on":
        return True, False
    if mode == "interpret":
        return True, True
    # auto: enabled on TPU-ish default backends
    platform = jax.default_backend()
    return platform not in ("cpu",), False
