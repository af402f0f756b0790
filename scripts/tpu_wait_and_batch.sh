#!/bin/bash
# Wait for the TPU tunnel to recover (probe every 6 min), then run the
# pending measurement batch serially — one device client at a time.
set -u
cd "$(dirname "$0")/.."
OUT="${1:-/tmp/tpu_r3b}"
mkdir -p "$OUT"

for i in $(seq 1 40); do
    if timeout 90 python -c "import jax, jax.numpy as jnp; print(jnp.ones((8,8)).sum())" >/dev/null 2>&1; then
        echo "tunnel healthy after probe $i"
        break
    fi
    echo "probe $i: wedged; sleeping 360 s"
    sleep 360
done

echo "== stage 1: on-TPU test tier (incl. fused marginalise)"
timeout 2400 python scripts/run_tpu_tests.py --out "$OUT/TPUTESTS.json" 2>&1 | tail -4

echo "== stage 2: marginalise-mode headline bench"
timeout 900 python bench.py --marginalize 2>&1 | tail -2 | tee "$OUT/bench_marginalize.txt"

echo "== stage 3: driver entry check"
timeout 600 python __graft_entry__.py 2>&1 | grep -v "Platform 'axon'" | tail -3 | tee "$OUT/entry.txt"

echo "== stage 4: xprof profile capture (100 iters)"
timeout 900 python bench.py --iters 100 --profile-dir "$OUT/prof" 2>&1 | tail -2 | tee "$OUT/bench_profile.txt"

echo "== batch done; artifacts in $OUT"
