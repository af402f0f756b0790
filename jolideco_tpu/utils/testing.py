"""Test helpers (reference ``jolideco/utils/testing.py``)."""

__all__ = ["requires_device"]


def requires_device(platform):
    """Skip decorator for tests that need a specific JAX platform.

    JAX analogue of the reference's torch-device gate: ``platform`` is
    a JAX backend name ("tpu", "gpu", "cpu").
    """
    import jax
    import pytest

    try:
        available = {d.platform for d in jax.devices()}
    except RuntimeError:
        available = set()

    skip_it = platform not in available
    reason = f"Missing support for backend {platform}"
    return pytest.mark.skipif(skip_it, reason=reason)
