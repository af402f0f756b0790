"""On-hardware test tier: runs compiled TPU code (no CPU forcing).

The default suite (tests/) forces an 8-virtual-CPU backend, so Pallas
kernels only ever run in interpret mode there and Mosaic-specific
behavior (tiling, VMEM limits, precision modes) goes unexercised —
the round-1 marginalise-backward VMEM OOM shipped exactly that way.
Run this tier in the bench environment:

    make test-tpu       (python -m pytest tests_tpu/ -q)

Tests skip gracefully when no TPU is attached.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# Persistent on-disk compile cache: the artifact runner
# (scripts/run_tpu_tests.py) executes every test in its own subprocess,
# so without this each process recompiles every executable from scratch
# (~40 min for the tier). With it, re-runs complete in minutes and a
# fresh run pays each compile once.
from jolideco_tpu.config import enable_persistent_cache  # noqa: E402

enable_persistent_cache()
