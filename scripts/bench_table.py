"""Render a BENCH artifact (bench.py --all-modes output) as markdown.

Keeps docs/performance.md's measured table generated from the actual
driver-checkable artifact instead of hand-pasted numbers:

    python bench.py --all-modes > BENCH.json
    python scripts/bench_table.py BENCH.json
"""

import json
import sys
from pathlib import Path

ROW_LABELS = {
    "headline": "headline: joint MAP, split-float GMM (1000 iters)",
    "highest_precision": "`--precision highest` (full-f32 GMM parity)",
    "marginalise": "`--marginalize` (logsumexp reduction)",
    "sequential": "`--update-strategy sequential` (reference-exact "
                  "per-dataset steps; 300 iters)",
}


def main():
    path = Path(sys.argv[1]) if len(sys.argv) > 1 else Path("BENCH.json")
    artifact = json.loads(path.read_text())
    rows = artifact.get("rows") or {"headline": artifact}

    print("| configuration | median it/s | repeats (it/s) | spread | "
          "vs baseline |")
    print("|---|---|---|---|---|")
    for name, label in ROW_LABELS.items():
        row = rows.get(name)
        if row is None:
            continue
        if "value" not in row:
            print(f"| {label} | FAILED ({row.get('error', '?')}) | | | |")
            continue
        repeats = ", ".join(
            f"{r:.1f}" for r in row.get("repeats_iters_per_sec", [])
        )
        spread = row.get("spread_pct")
        spread_s = f"±{spread / 2:.0f}%" if spread is not None else ""
        print(
            f"| {label} | **{row['value']:.1f}** | {repeats} | {spread_s} "
            f"| {row['vs_baseline']:.2f}x |"
        )


if __name__ == "__main__":
    main()
