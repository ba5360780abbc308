"""Unit tests for tools/bench_diff.py (cross-round bench attribution)."""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
import bench_diff  # noqa: E402


def test_identical_benches_have_no_movers():
    q = {"a": 1.0, "b": 2.5, "c": 0.4}
    report = bench_diff.diff(q, dict(q), threshold=1.5)
    assert report["movers"] == []
    assert report["ambient_median_ratio"] == 1.0
    assert report["common"] == 3


def test_uniform_ambient_drift_is_normalized_away():
    old = {f"q{i}": 1.0 + i / 10 for i in range(20)}
    new = {k: v * 1.3 for k, v in old.items()}  # machine 30% slower
    report = bench_diff.diff(old, new, threshold=1.5)
    assert report["ambient_median_ratio"] == pytest.approx(1.3, abs=0.01)
    assert report["movers"] == []


def test_real_regression_survives_normalization():
    old = {f"q{i}": 1.0 for i in range(20)}
    new = {k: 1.1 for k in old}
    new["q7"] = 2.0  # 1.82x raw, ~1.8x normalized
    report = bench_diff.diff(old, new, threshold=1.5)
    assert [m["query"] for m in report["movers"]] == ["q7"]
    assert report["movers"][0]["normalized_ratio"] > 1.5


def test_speedups_reported_as_sub_one_movers():
    old = {f"q{i}": 1.0 for i in range(20)}
    new = {k: 1.0 for k in old}
    new["q3"] = 0.5
    report = bench_diff.diff(old, new, threshold=1.5)
    assert [m["query"] for m in report["movers"]] == ["q3"]
    assert report["movers"][0]["normalized_ratio"] < 1.0


def test_noise_floor_queries_neither_move_nor_pollute_ambient():
    old = {"a": 1.0, "b": 1.0, "c": 1.0, "tiny": 0.05}
    new = {"a": 1.0, "b": 1.0, "c": 1.0, "tiny": 0.15}  # 3x but sub-floor
    report = bench_diff.diff(old, new, threshold=1.5)
    assert report["movers"] == []
    assert report["ambient_median_ratio"] == 1.0


def test_added_and_removed_listed():
    report = bench_diff.diff({"a": 1.0, "gone": 1.0}, {"a": 1.0, "new": 1.0}, 1.5)
    assert report["added"] == ["new"]
    assert report["removed"] == ["gone"]


def test_cli_exit_codes_and_driver_wrapper(tmp_path):
    old = {"queries": {f"q{i}": 1.0 for i in range(10)}}
    newq = {f"q{i}": 1.0 for i in range(10)}
    newq["q0"] = 5.0
    # driver BENCH_r{N}.json wrapper shape: {"parsed": <bench line>}
    new = {"n": 9, "parsed": {"queries": newq}}
    p_old, p_new = tmp_path / "old.json", tmp_path / "new.json"
    p_old.write_text(json.dumps(old))
    p_new.write_text(json.dumps(new))
    tool = os.path.join(os.path.dirname(bench_diff.__file__), "bench_diff.py")
    r = subprocess.run(
        [sys.executable, tool, str(p_old), str(p_new)],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 2, r.stdout + r.stderr
    assert "q0" in r.stdout
    r_clean = subprocess.run(
        [sys.executable, tool, str(p_old), str(p_old)],
        capture_output=True,
        text=True,
    )
    assert r_clean.returncode == 0
