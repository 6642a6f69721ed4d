#!/usr/bin/env python
"""Merge N solo bench JSON lines into the canonical baseline.

The committed methodology (BENCH/BASELINE.md measurement notes, since
r4): per-query wall time is min-of-QREPS within a run, and the
baseline table is the per-query MIN across three identical-code SOLO
runs — this host's heavy-tailed noise windows (20x wall spikes at
zero load) make any single run's tail unrepresentative, and the min
is the only statistic the A/B protocol (scripts/ab_bench.py) found
stable across windows.

Usage:  python scripts/merge_bench_runs.py run1.json run2.json ... \
            [--out BENCH/BASELINE.md]

The first run's scaling/throughput/input_rows carry through (the
scaling job runs once); queries/total are merged minima.  The merged
MD is rendered by bench.py's own writer so the format never forks.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("runs", nargs="+", help="bench JSON-line files")
    ap.add_argument("--out", default="BENCH/BASELINE.md")
    args = ap.parse_args()

    lines = []
    for p in args.runs:
        with open(p) as f:
            candidates = [
                json.loads(t)
                for t in f.read().strip().splitlines()
                if t.startswith("{")
            ]
        # bench.py prints the FULL line then the compact (<2000 char)
        # summary whose queries map is truncated to fit the driver's
        # tail window — merge from the line with the most queries
        lines.append(
            max(candidates, key=lambda d: len(d.get("queries", {})))
        )

    base = dict(lines[0])
    names = set()
    for ln in lines:
        names |= set(ln["queries"])
    merged = {}
    for q in sorted(names):
        vals = [ln["queries"][q] for ln in lines if q in ln["queries"]]
        merged[q] = round(min(vals), 3)
        if len(vals) != len(lines):
            print(f"warning: {q} present in only {len(vals)}/{len(lines)} runs")
    base["queries"] = merged
    base["value"] = round(sum(merged.values()), 3)

    import bench

    # re-derive the floor fields from the MERGED minima (carrying the
    # first run's floor/noise_band would misstate the merged table —
    # and merging here also folds the minima into BENCH/FLOORS.json)
    floors, noise_band = bench._merge_floors(merged, float(base["sf"]))
    base["queries_floor"] = floors
    base["value_floor"] = round(sum(floors.values()), 3) if floors else base["value"]
    base["noise_band"] = noise_band

    os.environ["SPARK_GRAFT_MD_OUT"] = args.out
    bench._write_baseline_md(base)
    note = (
        f"\n- This table is the PER-QUERY MIN across {len(lines)} "
        f"identical-code solo runs in one session window (min-of-reps "
        f"within a run, min across runs between them); the suite total "
        f"is the sum of those minima.  Per-run totals: "
        + ", ".join(f"{round(sum(ln['queries'].values()), 1)} s" for ln in lines)
        + ".\n"
    )
    with open(args.out, "a") as f:
        f.write(note)
    print(json.dumps({"out": args.out, "total": base["value"],
                      "queries": len(merged)}))


if __name__ == "__main__":
    main()
