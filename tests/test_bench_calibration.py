"""Bench calibration-drift guard (r10 verdict task 6): sustained
box load inflates every query ~proportionally and must neither
mass-flag phantom regressions nor hide real ones. Pure-function
tests — no Spark session."""

import importlib.util
import json
import os
import sys


def _load_bench(tmp_path, prev: dict | None = None):
    """Import bench.py fresh from a COPY in tmp_path so
    _previous_bench() sees exactly the BENCH_r*.json we plant."""
    src = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "bench.py",
    )
    dst = tmp_path / "bench.py"
    dst.write_text(open(src).read())
    if prev is not None:
        (tmp_path / "BENCH_r99.json").write_text(json.dumps(prev))
    spec = importlib.util.spec_from_file_location(
        f"bench_under_test_{tmp_path.name}", str(dst)
    )
    mod = importlib.util.module_from_spec(spec)
    sys.modules[spec.name] = mod
    spec.loader.exec_module(mod)
    return mod


def test_drift_computed_against_previous_round(tmp_path):
    b = _load_bench(tmp_path)
    assert b.calibration_drift(1.2, 0.9) == 1.333
    assert b.calibration_drift(0.8, 0.9) == 0.889
    # no / broken baseline -> None, never a crash
    assert b.calibration_drift(1.0, None) is None
    assert b.calibration_drift(1.0, 0.0) is None
    assert b.calibration_drift(0.0, 1.0) is None


def test_sustained_load_scales_the_contention_bound(tmp_path):
    b = _load_bench(tmp_path)
    # quiet box: plain 2x
    assert b.contention_bound(3.0, 1.0) == 6.0
    assert b.contention_bound(3.0, None) == 6.0
    # the r10 phantom shape: box uniformly 1.4x slower -> a query at
    # 1.4x its previous value is NOT contended (bound rises to 2.8x)
    drift = 1.4
    assert 3.0 * 1.4 < b.contention_bound(3.0, drift)
    # but a REAL 3x regression still flags through the drift
    assert 3.0 * 3.0 > b.contention_bound(3.0, drift)
    # a faster box never loosens the bound below 2x
    assert b.contention_bound(3.0, 0.7) == 6.0


def test_previous_bench_reads_queries_and_cal_min(tmp_path, monkeypatch):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    prev = {
        "parsed": {
            "sf": 0.1,
            "queries": {"q_a": 2.5},
            "calibration": {"min": 0.9},
        }
    }
    b = _load_bench(tmp_path, prev)
    rec = b._previous_bench()
    assert rec == {
        "queries": {"q_a": 2.5},
        "cal_min": 0.9,
        "anchor_mins": {},
    }


def test_previous_bench_ignores_other_sf_and_corrupt(
    tmp_path, monkeypatch
):
    monkeypatch.setenv("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    b = _load_bench(
        tmp_path,
        {"parsed": {"sf": 0.01, "queries": {"q_a": 1.0}}},
    )
    empty = {"queries": {}, "cal_min": None, "anchor_mins": {}}
    assert b._previous_bench() == empty
    (tmp_path / "BENCH_r99.json").write_text("{not json")
    assert b._previous_bench() == empty
    # pre-r11 records have no calibration block: queries still load
    (tmp_path / "BENCH_r99.json").write_text(
        json.dumps({"parsed": {"sf": 0.1, "queries": {"q_a": 1.0}}})
    )
    assert b._previous_bench() == {
        "queries": {"q_a": 1.0},
        "cal_min": None,
        "anchor_mins": {},
    }


def test_norm_vs_prev_arithmetic(tmp_path):
    """r11 verdict task 5: the compact line ships pre-divided
    drift-normalized ratios so false movers never reach a verdict."""
    b = _load_bench(tmp_path)
    # the r11 shape: raw 1.4x on a 1.4x-slower box -> normalized 1.0
    assert b.norm_vs_prev(7.0, 5.0, 1.4) == 1.0
    # a REAL 2x regression survives normalization
    assert b.norm_vs_prev(14.0, 5.0, 1.4) == 2.0
    # a FASTER box is normalized too (drift not floored): matching
    # raw times on a 0.8x box is a real 1.25x slowdown
    assert b.norm_vs_prev(4.0, 4.0, 0.8) == 1.25
    # missing baseline / drift -> graceful
    assert b.norm_vs_prev(4.0, None, 1.2) is None
    assert b.norm_vs_prev(4.0, 0.0, 1.2) is None
    assert b.norm_vs_prev(4.0, 2.0, None) == 2.0


def test_median_anchor_drift(tmp_path):
    """r12 verdict task 3: drift = MEDIAN over plan-diverse anchors,
    so one anchor's calibration noise (the r12 phantom `_minmax`
    1.24) can't tilt every normalized ratio."""
    b = _load_bench(tmp_path)
    cur = {"tpch_q6": 1.2, "tpch_q3": 2.2, "store_incremental_aggregate": 3.3}
    prev = {"tpch_q6": 1.0, "tpch_q3": 2.0, "store_incremental_aggregate": 3.0}
    med, per = b.median_anchor_drift(cur, prev)
    assert per == {
        "tpch_q6": 1.2,
        "tpch_q3": 1.1,
        "store_incremental_aggregate": 1.1,
    }
    assert med == 1.1  # the odd-one-out 1.2 is absorbed
    # even split -> mean of the middle two
    med2, _ = b.median_anchor_drift(
        {"a": 1.0, "b": 2.0}, {"a": 1.0, "b": 1.0}
    )
    assert med2 == 1.5
    # a single wildly-noisy anchor cannot move the median
    med3, _ = b.median_anchor_drift(
        {"tpch_q6": 5.0, "tpch_q3": 1.0, "x": 1.02},
        {"tpch_q6": 1.0, "tpch_q3": 1.0, "x": 1.0},
    )
    assert med3 == 1.02


def test_median_anchor_drift_legacy_fallback(tmp_path):
    """Previous rounds persisted only calibration.min (tpch_q6): the
    median path falls back to it so r13's first run still normalizes,
    and anchors without any baseline are skipped, not crashed."""
    b = _load_bench(tmp_path)
    med, per = b.median_anchor_drift(
        {"tpch_q6": 1.3, "tpch_q3": 9.9}, {}, prev_cal_min=1.0
    )
    assert per == {"tpch_q6": 1.3}
    assert med == 1.3
    # no baseline at all -> (None, {})
    assert b.median_anchor_drift({"tpch_q6": 1.0}, {}, None) == (
        None,
        {},
    )
