#!/bin/bash
# Round-3 consolidated TPU measurement batch. Runs each step strictly
# sequentially (one TPU client at a time) with individual timeouts so a
# tunnel wedge doesn't strand the whole batch. Outputs to /tmp/r3_*.log
set -x
cd "$(dirname "$0")/.."

timeout 120 python -c "import jax, jax.numpy as jnp; print(jnp.ones((8,8)).sum())" || {
    echo "TUNNEL WEDGED — aborting batch"; exit 1; }

timeout 900 python bench.py --verbose \
    > /tmp/r3_bench_headline.log 2>&1
timeout 900 python bench.py --update-strategy sequential --iters 300 \
    > /tmp/r3_bench_sequential.log 2>&1
timeout 900 python bench.py --precision highest --iters 300 \
    > /tmp/r3_bench_highest.log 2>&1
timeout 900 python scripts/bench_gmm_kernel.py \
    > /tmp/r3_gmm_kernel.log 2>&1
timeout 2400 python scripts/run_tpu_tests.py --out TPUTESTS_r03.json \
    > /tmp/r3_tputests.log 2>&1
echo BATCH_DONE
