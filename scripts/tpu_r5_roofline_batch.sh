#!/bin/bash
# Wait for the TPU tunnel to recover (probe every 3 min), then run the
# round-5 GMM-kernel roofline rows serially — one device client at a
# time.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_r5_roofline}"
mkdir -p "$OUT"

for i in $(seq 1 20); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(jnp.ones((8,8)).sum())" >/dev/null 2>&1; then
        echo "tunnel healthy after probe $i"
        break
    fi
    echo "probe $i: wedged; sleeping 180 s"
    sleep 180
done

echo "== GMM fused scorer roofline (precision=high, headline mode)"
timeout 900 python scripts/bench_gmm_roofline.py --iters 50 \
    2>&1 | grep -v "Platform 'axon'" | tail -1 | tee "$OUT/roofline_high.json"

echo "== precision=default (raw bf16, 1 MXU pass)"
timeout 900 python scripts/bench_gmm_roofline.py --iters 50 \
    --precision default \
    2>&1 | grep -v "Platform 'axon'" | tail -1 | tee "$OUT/roofline_default.json"

echo "== precision=highest (f32 parity)"
timeout 900 python scripts/bench_gmm_roofline.py --iters 50 \
    --precision highest \
    2>&1 | grep -v "Platform 'axon'" | tail -1 | tee "$OUT/roofline_highest.json"

echo "== batch done; artifacts in $OUT"
