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
