"""Semantic checks for the event-sequence analytics (funnel + transitions).

The oracle-parity test proves engine == DuckDB on the fixtures; these pin
the SEMANTICS on crafted micro-corpora where the right answer is computed
by hand — strict stage ordering (a click BEFORE the first view must not
count), stage gating, and row-stochastic normalization.
"""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from mapreduce_docker_spark.operators import funnel_queries as fq
from tests.conftest import SF_SMOKE

_SCHEMA = "event_id long, ts timestamp, user_id long, event_type string, value double, props string"


def _ev(eid, user, kind, minute):
    return (eid, dt.datetime(2024, 1, 1, 0, minute, 0), user, kind, 1.0, "{}")


@pytest.fixture()
def crafted_dir(spark, tmp_path):
    def write(rows):
        spark.createDataFrame(rows, _SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "events.parquet"))
        return str(tmp_path)

    return write


def test_funnel_strict_ordering(spark, crafted_dir):
    sf_dir = crafted_dir(
        [
            # user 1: full ordered funnel view@1 -> click@2 -> purchase@3
            _ev(1, 1, "view", 1),
            _ev(2, 1, "click", 2),
            _ev(3, 1, "purchase", 3),
            # user 2: click BEFORE first view -> click stage not reached
            _ev(4, 2, "click", 1),
            _ev(5, 2, "view", 2),
            _ev(6, 2, "purchase", 3),
            # user 3: view only
            _ev(7, 3, "view", 5),
            # user 4: no view at all -> not even stage 1
            _ev(8, 4, "purchase", 1),
        ]
    )
    out = {r["stage"]: r for r in fq.events_funnel_conversion(spark, sf_dir).collect()}
    assert out["1_view"]["users"] == 3
    assert out["2_click"]["users"] == 1
    assert out["3_purchase"]["users"] == 1
    # user 1 converts view(min@1) -> purchase(min@3): 2 minutes
    assert out["3_purchase"]["avg_hours_from_view"] == round(2 / 60, 4)


def test_funnel_purchase_requires_click_first(spark, crafted_dir):
    # view -> purchase with NO intervening click: purchase stage empty
    sf_dir = crafted_dir([_ev(1, 1, "view", 1), _ev(2, 1, "purchase", 2)])
    out = {r["stage"]: r for r in fq.events_funnel_conversion(spark, sf_dir).collect()}
    assert out["1_view"]["users"] == 1
    assert out["2_click"]["users"] == 0
    assert out["3_purchase"]["users"] == 0
    assert out["3_purchase"]["avg_hours_from_view"] == 0.0


def test_transition_matrix_rows_are_stochastic(spark):
    tm = fq.events_transition_matrix(spark, SF_SMOKE)
    sums = tm.groupBy("prev").agg(F.sum("p").alias("s"), F.sum("cnt").alias("n")).collect()
    assert sums, "fixture events should produce transitions"
    for r in sums:
        # each cell rounds to 4dp, so a row of k cells drifts < k * 5e-5
        assert abs(r["s"] - 1.0) < 5 * 5e-5
    n_pairs = tm.agg(F.sum("cnt")).collect()[0][0]
    ev = spark.read.parquet(f"{SF_SMOKE}/events.parquet")
    n_events = ev.count()
    n_users = ev.select("user_id").distinct().count()
    # every event except each user's first contributes exactly one transition
    assert n_pairs == n_events - n_users


def test_sessionize_gap_semantics(spark, crafted_dir):
    # gaps: 1min (same session), 7h (new session), 1min (same session)
    sf_dir = crafted_dir(
        [
            _ev(1, 1, "view", 0),
            _ev(2, 1, "click", 1),
            (3, dt.datetime(2024, 1, 1, 7, 2, 0), 1, "view", 1.0, "{}"),
            (4, dt.datetime(2024, 1, 1, 7, 3, 0), 1, "purchase", 1.0, "{}"),
            _ev(5, 2, "view", 30),
        ]
    )
    rows = {
        (r["user_id"], r["session_idx"]): r
        for r in fq.events_sessionize(spark, sf_dir).collect()
    }
    assert set(rows) == {(1, 1), (1, 2), (2, 1)}
    assert rows[(1, 1)]["n_events"] == 2
    assert rows[(1, 1)]["duration_us"] == 60_000_000
    assert rows[(1, 2)]["n_events"] == 2
    assert rows[(2, 1)]["n_events"] == 1
    assert rows[(2, 1)]["duration_us"] == 0


def test_funnel_stage_counts_monotone(spark):
    out = {r["stage"]: r for r in fq.events_funnel_conversion(spark, SF_SMOKE).collect()}
    # a strictly-ordered funnel can only lose users at each stage
    assert out["1_view"]["users"] >= out["2_click"]["users"] >= out["3_purchase"]["users"]
    assert out["3_purchase"]["users"] > 0  # fixture has full converters


def test_sessionize_partitions_all_events(spark):
    sess = fq.events_sessionize(spark, SF_SMOKE).collect()
    total = sum(r["n_events"] for r in sess)
    n_events = spark.read.parquet(f"{SF_SMOKE}/events.parquet").count()
    assert total == n_events  # sessions partition the event stream exactly
    by_user = {}
    for r in sess:
        by_user.setdefault(r["user_id"], []).append(r["session_idx"])
    for uid, idxs in by_user.items():
        assert sorted(idxs) == list(range(1, len(idxs) + 1)), uid  # contiguous ids
    assert all(r["duration_us"] >= 0 for r in sess)


def test_rolling_hll_within_tolerance_of_exact(spark):
    """The mergeable-sketch rolling path must track the exact rolling
    distinct within HLL tolerance (lgConfigK default 12 -> ~1.6% rse; 5%
    is a safe deterministic bound at fixture cardinalities)."""
    from mapreduce_docker_spark.operators.funnel_queries import (
        events_rolling_7d_active_users,
        events_rolling_7d_hll,
    )

    sf = "/root/testdata/sf0.001"
    exact = {
        r["event_date"]: r["wau_7d"]
        for r in events_rolling_7d_active_users(spark, sf).collect()
    }
    approx = {
        r["event_date"]: r["wau_7d_approx"]
        for r in events_rolling_7d_hll(spark, sf).collect()
    }
    assert set(exact) == set(approx)
    for d, n in exact.items():
        assert abs(approx[d] - n) <= max(1, 0.05 * n), (d, n, approx[d])
