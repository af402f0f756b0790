#!/bin/bash
# Scale/strategy re-measurement batch (post fused-scorer). Serial, one
# device client at a time, per-stage timeouts.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_scale}"
mkdir -p "$OUT"

timeout 120 python -c "import jax, jax.numpy as jnp; print(jnp.ones((8,8)).sum())" || {
    echo "TUNNEL WEDGED — aborting"; exit 1; }

echo "== sequential strategy (reference semantics), 300 iters"
timeout 900 python bench.py --update-strategy sequential --iters 300 2>&1 | tail -1 | tee "$OUT/seq.txt"

echo "== 20 obs, 1024^2"
timeout 900 python bench.py --n-obs 20 --iters 500 2>&1 | tail -1 | tee "$OUT/obs20.txt"

echo "== 10 obs, 2048^2"
timeout 1200 python bench.py --size 2048 --iters 300 2>&1 | tail -1 | tee "$OUT/s2048.txt"

echo "== 4 obs, 4096^2, 50 iters"
timeout 1500 python bench.py --size 4096 --n-obs 4 --iters 50 2>&1 | tail -1 | tee "$OUT/s4096.txt"

echo "== E0102-like example bench"
timeout 900 python examples/chandra_e0102_like.py --bench 2>&1 | tail -2 | tee "$OUT/e0102.txt"

echo "== batch done; artifacts in $OUT"
