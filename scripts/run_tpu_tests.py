"""Run the on-TPU test tier with per-test timeouts and a JSON artifact.

The remote-TPU tunnel can wedge: every device op blocks, including in
fresh processes, and a plain ``pytest tests_tpu/`` then hangs with no
recorded outcome. This runner first tries ONE shared pytest process
under a global timeout (fast: compile state and in-process caches are
shared across tests); if that hangs or crashes it falls back to
executing every test id in its own subprocess with a per-test hard
timeout, so a wedge becomes a recorded ``timeout`` result instead of
silence. Either way it writes a driver-checkable artifact (default
``TPUTESTS.json``)::

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
import xml.etree.ElementTree as ET
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent


def run_oneshot(pytest_args, timeout, junit_path):
    """One pytest process for the whole tier (shared compile state —
    much faster than per-test isolation). Returns parsed per-test
    results, or None if the run hung/crashed and the caller should fall
    back to per-test subprocesses."""
    try:
        proc = subprocess.run(
            [sys.executable, "-m", "pytest", "tests_tpu/", "-q",
             f"--junit-xml={junit_path}", *pytest_args],
            cwd=REPO, capture_output=True, text=True, timeout=timeout,
        )
    except subprocess.TimeoutExpired:
        return None
    if proc.returncode not in (0, 1) or not Path(junit_path).exists():
        return None  # crash / collection error -> isolate per test
    results = []
    for case in ET.parse(junit_path).getroot().iter("testcase"):
        classname = case.get("classname", "").replace(".", "/")
        test_id = f"{classname}.py::{case.get('name')}"
        seconds = round(float(case.get("time", 0.0)), 1)
        if case.find("failure") is not None or case.find("error") is not None:
            node = case.find("failure")
            if node is None:
                node = case.find("error")
            results.append({
                "id": test_id, "status": "failed", "seconds": seconds,
                "tail": (node.get("message") or "")[:2000],
            })
        elif case.find("skipped") is not None:
            results.append(
                {"id": test_id, "status": "skipped", "seconds": seconds}
            )
        else:
            results.append(
                {"id": test_id, "status": "passed", "seconds": seconds}
            )
    return results


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
    parser.add_argument("--oneshot-timeout", type=float, default=1500.0,
                        help="wall-clock budget for the shared-process "
                             "fast path before falling back to per-test "
                             "isolation")
    parser.add_argument("--isolate", action="store_true",
                        help="skip the shared-process fast path")
    parser.add_argument("-k", default=None, help="pytest -k filter")
    args = parser.parse_args()

    pytest_args = ["-k", args.k] if args.k else []

    t0 = time.time()
    results = None
    mode = "isolated"
    if not args.isolate:
        results = run_oneshot(
            pytest_args, args.oneshot_timeout,
            REPO / ".pytest-tpu-junit.xml",
        )
        if results is not None:
            mode = "oneshot"
            for result in results:
                print(f"{result['status']:>8}  {result['seconds']:>6.1f}s  "
                      f"{result['id']}", flush=True)
        else:
            print("shared-process run hung or crashed; isolating per "
                  "test", flush=True)

    if results is None:
        ids = collect_ids(pytest_args)
        if not ids:
            print("no tests collected", file=sys.stderr)
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
        "mode": mode,
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
