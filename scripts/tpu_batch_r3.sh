#!/bin/bash
# Round-3 consolidated TPU batch. The tunnel wedges intermittently and
# tolerates only one client at a time, so every on-chip measurement for
# the round runs serially from this one script, each step under its own
# hard timeout (a wedge becomes a recorded step failure, not a hang).
# Usage: bash scripts/tpu_batch_r3.sh [logdir]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_batch_r3}
mkdir -p "$LOG"

probe() {
    timeout 90 python -c "import jax, jax.numpy as jnp; print(jnp.ones((8,8)).sum())" >/dev/null 2>&1
}

step() { # name timeout_s cmd...
    local name=$1 tmo=$2; shift 2
    echo "=== $name (timeout ${tmo}s) $(date -u +%H:%M:%S)"
    timeout "$tmo" "$@" >"$LOG/$name.log" 2>&1
    local rc=$?
    echo "=== $name rc=$rc"
    tail -3 "$LOG/$name.log" | sed 's/^/    /'
    # after a timeout, give the tunnel a recovery pause before the next client
    if [ "$rc" -ne 0 ]; then sleep 120; fi
    return "$rc"
}

if ! probe; then
    echo "tunnel wedged at start; aborting (re-run when a probe passes)"
    exit 2
fi
echo "tunnel healthy, starting batch"

step tputests 2400 python scripts/run_tpu_tests.py --out TPUTESTS_r03.json
step ct_bench 1500 python scripts/tpu_ct_bench.py
step bench_fft 900 python bench.py
step bench_ct 900 python bench.py --conv-mode ct
step graft_entry 900 python __graft_entry__.py
echo "=== batch done $(date -u +%H:%M:%S)"
