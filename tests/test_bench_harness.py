"""Pins for bench.py's probe-gated ladder points (judge-r11 next-round
#3): a ladder point must enter the record ONLY when its bracketing cpu
probes say the machine was quiet; a noisy point is retried once and then
WITHHELD with an ``_invalid`` note, never recorded. No SparkSession
needed — the helper is pure timing orchestration."""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import bench  # noqa: E402


def _with_probe_sequence(monkeypatch, probes):
    it = iter(probes)
    monkeypatch.setattr(bench, "_cpu_probe", lambda: next(it))
    monkeypatch.setattr(bench.time, "sleep", lambda s: None)


def test_ladder_point_quiet_records_min_of_reps(monkeypatch):
    _with_probe_sequence(monkeypatch, [0.03, 0.04])
    out: dict = {}
    times = iter([0.51, 0.42, 0.47])
    ok = bench._ladder_point(out, "census_x4", lambda: next(times), reps=3)
    assert ok
    assert out["census_x4"] == 0.42  # min of the three reps
    assert out["census_x4_probe"] == 0.04  # max of the bracket
    assert out["census_x4_reps"] == 3
    assert "census_x4_invalid" not in out


def test_ladder_point_noisy_then_quiet_retry_rescues(monkeypatch):
    # first bracket noisy (0.2), retry bracket quiet -> recorded from retry
    _with_probe_sequence(monkeypatch, [0.2, 0.03, 0.04, 0.04])
    out: dict = {}
    times = iter([9.0, 9.0, 9.0, 0.5, 0.6, 0.7])
    ok = bench._ladder_point(out, "p", lambda: next(times), reps=3)
    assert ok
    assert out["p"] == 0.5
    assert out["p_probe"] == 0.04
    assert "p_invalid" not in out


def test_ladder_point_noisy_twice_withholds(monkeypatch):
    _with_probe_sequence(monkeypatch, [0.2, 0.2, 0.06, 0.3])
    out: dict = {}
    ok = bench._ladder_point(out, "p", lambda: 1.0, reps=2)
    assert not ok
    assert "p" not in out  # the value NEVER enters the record
    assert "point withheld" in out["p_invalid"]
    assert out["p_probe"] == 0.3  # the last bracket, auditable


def test_ladder_point_boundary_probe_is_quiet(monkeypatch):
    # exactly at the bar counts as quiet (<=), matching the canary bar
    _with_probe_sequence(monkeypatch, [0.05, 0.05])
    out: dict = {}
    assert bench._ladder_point(out, "p", lambda: 2.0, reps=1)
    assert out["p"] == 2.0
