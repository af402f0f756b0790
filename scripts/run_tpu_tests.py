"""Run the on-TPU test tier with per-test timeouts and a JSON artifact.

The remote-TPU tunnel can wedge: every device op blocks, including in
fresh processes, and a plain ``pytest tests_tpu/`` then hangs with no
recorded outcome. This runner executes every test id in its own
subprocess with a hard timeout, so a wedge becomes a recorded
``timeout`` result instead of silence, and writes a driver-checkable
artifact (default ``TPUTESTS.json``)::

    {"ok": bool, "passed": N, "failed": N, "timeout": N, "skipped": N,
     "total_seconds": S, "results": [{"id", "status", "seconds"}, ...]}

Usage::

    python scripts/run_tpu_tests.py --out TPUTESTS_r03.json
    make test-tpu-artifact
"""

import argparse
import json
import subprocess
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def collect_ids(pytest_args):
    """Collect test ids without initializing any backend in-process."""
    proc = subprocess.run(
        [sys.executable, "-m", "pytest", "tests_tpu/", "-q",
         "--collect-only", *pytest_args],
        cwd=REPO, capture_output=True, text=True, timeout=300,
    )
    if proc.returncode not in (0, 5):  # 5 = no tests collected
        raise RuntimeError(
            f"test collection failed (rc={proc.returncode}):\n{proc.stdout}"
            f"\n{proc.stderr}"
        )
    ids = []
    for line in proc.stdout.splitlines():
        line = line.strip()
        if line.startswith("tests_tpu/") and "::" in line:
            ids.append(line)
    return ids


def run_one(test_id, timeout):
    start = time.time()
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", test_id, "-q", "-x",
             "--no-header", "-rN"],
            cwd=REPO, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return {
            "id": test_id,
            "status": "timeout",
            "seconds": round(time.time() - start, 1),
        }
    seconds = round(time.time() - start, 1)
    out = proc.stdout
    if proc.returncode == 0:
        status = "passed" if " passed" in out else "skipped"
    elif proc.returncode == 5:
        status = "skipped"
    else:
        status = "failed"
    result = {"id": test_id, "status": status, "seconds": seconds}
    if status == "failed":
        result["tail"] = "\n".join(out.splitlines()[-20:])
    return result


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("--out", default="TPUTESTS.json")
    parser.add_argument("--timeout", type=float, default=600.0,
                        help="per-test wall-clock limit (seconds); a "
                             "wedged tunnel records a 'timeout' result")
    parser.add_argument("-k", default=None, help="pytest -k filter")
    args = parser.parse_args()

    pytest_args = ["-k", args.k] if args.k else []
    ids = collect_ids(pytest_args)
    if not ids:
        print("no tests collected", file=sys.stderr)

    t0 = time.time()
    results = []
    for test_id in ids:
        result = run_one(test_id, args.timeout)
        results.append(result)
        print(f"{result['status']:>8}  {result['seconds']:>6.1f}s  "
              f"{test_id}", flush=True)

    counts = {s: sum(1 for r in results if r["status"] == s)
              for s in ("passed", "failed", "timeout", "skipped")}
    artifact = {
        "ok": counts["failed"] == 0 and counts["timeout"] == 0
        and counts["passed"] > 0,
        **counts,
        "total_seconds": round(time.time() - t0, 1),
        "per_test_timeout": args.timeout,
        "results": results,
    }
    out_path = REPO / args.out
    out_path.write_text(json.dumps(artifact, indent=1))
    print(json.dumps({k: v for k, v in artifact.items()
                      if k != "results"}))
    sys.exit(0 if artifact["ok"] else 1)


if __name__ == "__main__":
    main()
