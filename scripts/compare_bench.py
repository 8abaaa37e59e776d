#!/usr/bin/env python
"""Mechanical two-regime cross-round bench comparison (judge r10 #5).

Usage: python scripts/compare_bench.py OLD_BENCH.json NEW_BENCH.json

For every query present in both records, print the raw ratio and the
regime-normalized ratio: entries tagged "throughput" (>= the regime
threshold in the NEW record) divide by the throughput-control ratio
(calibration_sec), "scheduling" entries by the scheduling-control
ratio (calibration_sched_sec; absent in records before r11 — falls
back to raw, flagged). Summary = per-regime medians, worst movers.
"""

from __future__ import annotations

import json
import statistics
import sys


def main() -> int:
    with open(sys.argv[1]) as f:
        old = json.load(f)
    with open(sys.argv[2]) as f:
        new = json.load(f)
    thr = new.get("regime_threshold_sec", 5.0)
    cal_ratio = (new["calibration_sec"] / old["calibration_sec"]
                 if old.get("calibration_sec") else None)
    sched_ratio = (new["calibration_sched_sec"]
                   / old["calibration_sched_sec"]
                   if old.get("calibration_sched_sec")
                   and new.get("calibration_sched_sec") else None)
    rows = []
    for name, nsec in sorted(new["queries"].items()):
        osec = old["queries"].get(name)
        if osec is None or osec <= 0:
            continue
        raw = nsec / osec
        regime = "throughput" if nsec >= thr else "scheduling"
        ctl = cal_ratio if regime == "throughput" else sched_ratio
        norm = raw / ctl if ctl else None
        rows.append({"query": name, "old": osec, "new": nsec,
                     "raw_ratio": round(raw, 3), "regime": regime,
                     "norm_ratio": round(norm, 3) if norm else None})
    for r in rows:
        print(json.dumps(r))
    by = {"throughput": [], "scheduling": []}
    for r in rows:
        by[r["regime"]].append(r)
    summary = {
        "n_common": len(rows),
        "throughput_control_ratio": round(cal_ratio, 3) if cal_ratio
        else None,
        "scheduling_control_ratio": round(sched_ratio, 3) if sched_ratio
        else None,
    }
    for regime, rs in by.items():
        if not rs:
            continue
        raws = [r["raw_ratio"] for r in rs]
        norms = [r["norm_ratio"] for r in rs if r["norm_ratio"]]
        summary[regime] = {
            "n": len(rs),
            "median_raw": round(statistics.median(raws), 3),
            "median_norm": (round(statistics.median(norms), 3)
                            if norms else None),
            "worst_raw": sorted(
                ({"q": r["query"], "x": r["raw_ratio"]} for r in rs),
                key=lambda d: -d["x"])[:3],
        }
    print(json.dumps({"summary": summary}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
