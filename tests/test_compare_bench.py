"""Pins scripts/compare_bench.py's two-regime normalization — in
particular the r12 rule that an entry whose regime FLIPPED between the
rounds is normalized by neither control and excluded from the
per-regime medians (r11 advice: classifying by the new round alone
mis-normalized exactly the threshold-straddling entries). Pure-python:
the records are synthesized, no Spark session."""

from __future__ import annotations

import json
import subprocess
import sys
from pathlib import Path

SCRIPT = str(Path(__file__).resolve().parents[1] / "scripts"
             / "compare_bench.py")


def _record(queries, regimes, cal=1.0, sched=0.1):
    return {
        "queries": queries, "regimes": regimes,
        "regime_threshold_sec": 5.0,
        "calibration_sec": cal, "calibration_sched_sec": sched,
    }


def _run(tmp_path, old, new):
    po, pn = tmp_path / "old.json", tmp_path / "new.json"
    po.write_text(json.dumps(old))
    pn.write_text(json.dumps(new))
    out = subprocess.run([sys.executable, SCRIPT, str(po), str(pn)],
                         capture_output=True, text=True, check=True)
    lines = out.stdout.strip().splitlines()
    rows = [json.loads(ln) for ln in lines[:-1]]
    summary = json.loads(lines[-1])["summary"]
    return rows, summary


def test_flip_excluded_from_medians(tmp_path):
    old = _record(
        {"fast": 0.2, "slow": 20.0, "straddle": 4.8},
        {"fast": "scheduling", "slow": "throughput",
         "straddle": "scheduling"},
        cal=1.0, sched=0.1)
    new = _record(
        {"fast": 0.4, "slow": 10.0, "straddle": 5.2},
        {"fast": "scheduling", "slow": "throughput",
         "straddle": "throughput"},
        cal=2.0, sched=0.2)
    rows, summary = _run(tmp_path, old, new)
    by = {r["query"]: r for r in rows}
    assert by["straddle"]["regime"] == "flip"
    assert by["straddle"]["norm_ratio"] is None
    assert by["straddle"]["old_regime"] == "scheduling"
    assert by["straddle"]["new_regime"] == "throughput"
    # controls doubled; both stable entries also doubled raw -> norm 1.0
    assert by["fast"]["norm_ratio"] == 1.0
    assert by["slow"]["norm_ratio"] == 0.25  # raw 0.5 / control 2.0
    assert [f["q"] for f in summary["regime_flips"]] == ["straddle"]
    assert summary["scheduling"]["n"] == 1
    assert summary["throughput"]["n"] == 1
    assert summary["scheduling"]["median_norm"] == 1.0


def test_median_controls_preferred_when_both_records_have_them(tmp_path):
    # r12: median-of-9 controls are the stabler level; the min fields
    # stay for pre-r12 continuity but the ratio must use the medians
    old = _record({"fast": 0.2}, {"fast": "scheduling"},
                  cal=1.0, sched=0.1)
    new = _record({"fast": 0.2}, {"fast": "scheduling"},
                  cal=1.0, sched=0.1)
    old["calibration_sec_median"] = 1.2
    old["calibration_sched_sec_median"] = 0.1
    new["calibration_sec_median"] = 1.2
    new["calibration_sched_sec_median"] = 0.2  # sched level doubled
    rows, summary = _run(tmp_path, old, new)
    assert summary["control_kind"] == "median"
    # raw 1.0 normalized by the MEDIAN sched ratio (2.0), not min (1.0)
    assert rows[0]["norm_ratio"] == 0.5
    # one side lacking medians falls back to min for both
    del old["calibration_sec_median"]
    rows, summary = _run(tmp_path, old, new)
    assert summary["control_kind"] == "min"
    assert rows[0]["norm_ratio"] == 1.0


def test_pre_tag_record_falls_back_to_threshold(tmp_path):
    # a record that predates regimes tags classifies by duration
    old = {"queries": {"q": 0.3}, "calibration_sec": 1.0,
           "calibration_sched_sec": 0.1}
    new = _record({"q": 0.3}, {"q": "scheduling"})
    rows, summary = _run(tmp_path, old, new)
    assert rows[0]["regime"] == "scheduling"
    assert not summary["regime_flips"]
