"""Ninth batch of hand-computed truths: the as-of join's pinned tie rules
and the banded range join's half-open window."""

from __future__ import annotations

import datetime as dt

from mapreduce_docker_spark.operators.asof_queries import (
    asof_purchase_prior_view,
    range_join_events_in_order_window,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_asof_tie_rules_hand_computed(spark, tmp_path):
    t0 = dt.datetime(2024, 1, 1, 12, 0, 0)

    def ev(eid, user, kind, secs):
        return (eid, t0 + dt.timedelta(seconds=secs), user, kind, 1.0, "{}")

    rows = [
        # user 1: two views and a purchase at the SAME timestamp — same-ts
        # views are visible (kind orders view before purchase) and the max
        # event_id view wins among the equal-ts views
        ev(1, 1, "view", 0),
        ev(3, 1, "view", 0),
        ev(2, 1, "purchase", 0),
        # a later purchase carries the same most-recent view forward
        ev(4, 1, "purchase", 10),
        # user 2: purchase with no prior view -> NULLs
        ev(5, 2, "purchase", 0),
        # user 3: the only view happens AFTER the purchase -> NULLs
        ev(7, 3, "purchase", 0),
        ev(6, 3, "view", 5),
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = {
        r["purchase_event_id"]: r
        for r in asof_purchase_prior_view(spark, str(tmp_path)).collect()
    }
    assert set(out) == {2, 4, 5, 7}
    assert (out[2]["view_event_id"], out[2]["gap_us"]) == (3, 0)
    assert (out[4]["view_event_id"], out[4]["gap_us"]) == (3, 10_000_000)
    assert out[5]["view_event_id"] is None and out[5]["gap_us"] is None
    assert out[7]["view_event_id"] is None and out[7]["gap_us"] is None


def test_range_join_half_open_band(spark, tmp_path):
    # order date D: the band is [D+8400d, D+8431d) — start inclusive, end
    # exclusive. Craft events exactly on both boundaries.
    d0 = dt.date(2000, 1, 1)
    spark.createDataFrame(
        [(1, 7, d0)], "o_orderkey long, o_custkey long, o_orderdate date"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    lo = dt.datetime(2000, 1, 1) + dt.timedelta(days=8400)
    hi = dt.datetime(2000, 1, 1) + dt.timedelta(days=8431)
    rows = [
        (1, lo, 7, "view", 1.0, "{}"),                       # ON start: in
        (2, lo + dt.timedelta(hours=1), 7, "error", 1.0, "{}"),  # in
        (3, hi - dt.timedelta(seconds=1), 7, "view", 1.0, "{}"), # in
        (4, hi, 7, "view", 1.0, "{}"),                       # ON end: OUT
        (5, lo - dt.timedelta(seconds=1), 7, "view", 1.0, "{}"), # before: out
        (6, lo, 8, "view", 1.0, "{}"),                       # wrong user: out
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = range_join_events_in_order_window(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["o_orderkey"], r["n_events"], r["n_errors"]) == (1, 3, 1)
