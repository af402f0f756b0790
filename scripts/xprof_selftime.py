"""Exclusive-self-time decomposition of a jax profiler trace.

Used for the round-5 sequential-floor measurement in
docs/performance.md: reads the ``*.trace.json.gz`` a
``bench.py --profile-dir`` capture writes, computes per-op SELF time
on the TPU "XLA Ops" track (duration minus nested children — raw
durations double-count, since module/while events span everything),
and buckets ops into kernel classes.

Usage::

    python bench.py --update-strategy sequential --iters 300 \\
        --repeats 2 --profile-dir /tmp/prof
    python scripts/xprof_selftime.py /tmp/prof --per 300
"""

import argparse
import collections
import glob
import gzip
import json


def classify(name):
    n = name.lower()
    if n.startswith("jvp"):
        return "GMM fwd (pallas)"
    if n.startswith("transpose_jvp"):
        return "GMM bwd (pallas)"
    if "pfft" in n or "_lambda_" in n or "custom-call" in n:
        return "pfft conv (pallas)"
    if "fft" in n:
        return "fft"
    if "copy" in n or "transpose" in n:
        return "copy/layout"
    if "fusion" in n:
        return "fusion (conv/NLL/Adam/elementwise)"
    if "while" in n:
        return "while overhead"
    if "reverse" in n:
        return "reverse"
    if "dot" in n:
        return "dot"
    return "other:" + n.split(".")[0]


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument("profile_dir")
    parser.add_argument("--per", type=float, default=None,
                        help="divide totals by this count (e.g. epochs) "
                             "and report ms per unit")
    parser.add_argument("--top", type=int, default=18)
    args = parser.parse_args()

    paths = sorted(glob.glob(
        f"{args.profile_dir}/**/*.trace.json.gz", recursive=True
    ))
    if not paths:
        raise SystemExit(f"no *.trace.json.gz under {args.profile_dir}")
    with gzip.open(paths[-1], "rt") as f:
        data = json.load(f)

    pids = {
        e["pid"]: e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    tpu_pids = {p for p, n in pids.items() if "TPU" in n}
    tids = {
        (e["pid"], e["tid"]): e["args"].get("name", "")
        for e in data["traceEvents"]
        if e.get("ph") == "M" and e.get("name") == "thread_name"
    }
    op_tracks = {
        (p, t) for (p, t), n in tids.items()
        if p in tpu_pids and n == "XLA Ops"
    }

    events = [
        e for e in data["traceEvents"]
        if e.get("ph") == "X" and (e.get("pid"), e.get("tid")) in op_tracks
    ]
    events.sort(key=lambda e: (e["ts"], -e["dur"]))
    self_time = collections.Counter()
    stack = []
    for e in events:
        ts, dur = e["ts"], e["dur"]
        while stack and ts >= stack[-1][0] + stack[-1][1]:
            stack.pop()
        if stack:
            self_time[stack[-1][2]] -= dur
        self_time[e["name"]] += dur
        stack.append((ts, dur, e["name"]))

    cls = collections.Counter()
    for name, t in self_time.items():
        cls[classify(name)] += t
    total = sum(cls.values())
    unit = args.per or 1.0
    label = "ms/unit" if args.per else "total ms"
    print(f"device self time: {total/1e6:.2f}s over {len(events)} op events")
    for k, v in cls.most_common(args.top):
        print(f"  {v/unit/1e3:9.3f} {label}  {100*v/total:5.1f}%  {k}")


if __name__ == "__main__":
    main()
