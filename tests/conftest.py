"""Test configuration.

Tests run on CPU with 8 virtual devices so multi-chip sharding logic is
exercised without TPU hardware (SURVEY.md §4: the JAX-native fake
backend).

Note: this environment may pre-import jax and register a remote TPU
platform plugin at interpreter startup (sitecustomize), so plain
``JAX_PLATFORMS`` env vars are too late — override through
``jax.config`` instead, before any backend is initialized.
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
