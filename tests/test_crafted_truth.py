"""Crafted-corpus truths for r5-window queries that previously had only
the DuckDB oracle: retention cohorts, market-basket lift, and first-touch
attribution. The oracle proves engine == DuckDB; these prove both == a
hand-computed answer, closing the "both engines share the same semantic
misunderstanding" gap on the highest-semantics queries.
"""

from __future__ import annotations

import datetime as dt

import pytest

from mapreduce_docker_spark.operators.funnel_queries import (
    events_first_touch_attribution,
    events_retention_cohorts,
)
from mapreduce_docker_spark.operators.relational_queries import (
    basket_part_pairs_lift,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


@pytest.fixture()
def events_dir(spark, tmp_path):
    def write(rows):
        spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "events.parquet"))
        return str(tmp_path)

    return write


def test_retention_cohorts_hand_computed(spark, events_dir):
    # 2024-01-01 is a Monday: weeks A=01-01, B=01-08, C=01-15
    def ev(eid, user, day):
        return (eid, dt.datetime(2024, 1, day, 12, 0, 0), user, "view", 1.0, "{}")

    sf_dir = events_dir(
        [
            ev(1, 1, 2),   # user 1: week A
            ev(2, 1, 9),   # user 1: week B  -> cohort A, offsets {0, 1}
            ev(3, 2, 3),   # user 2: week A only -> cohort A, offset 0
            ev(4, 3, 10),  # user 3: week B
            ev(5, 3, 16),  # user 3: week C  -> cohort B, offsets {0, 1}
        ]
    )
    rows = {
        (str(r["cohort_week"]), r["week_offset"]): r
        for r in events_retention_cohorts(spark, sf_dir).collect()
    }
    a, b = "2024-01-01", "2024-01-08"
    assert set(rows) == {(a, 0), (a, 1), (b, 0), (b, 1)}
    assert (rows[(a, 0)]["n_active"], rows[(a, 0)]["cohort_size"]) == (2, 2)
    assert rows[(a, 0)]["retention"] == 1.0
    assert (rows[(a, 1)]["n_active"], rows[(a, 1)]["retention"]) == (1, 0.5)
    assert (rows[(b, 0)]["n_active"], rows[(b, 0)]["cohort_size"]) == (1, 1)
    assert rows[(b, 1)]["retention"] == 1.0


def test_first_touch_attribution_hand_computed(spark, events_dir):
    h = 3_600  # seconds
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, user, kind, secs):
        return (eid, base + dt.timedelta(seconds=secs), user, kind, 1.0, "{}")

    sf_dir = events_dir(
        [
            # user 1, session 1: view -> purchase (first=view, converted)
            ev(1, 1, "view", 0),
            ev(2, 1, "purchase", 60),
            # user 1, session 2 after a 7h gap: click only (not converted)
            ev(3, 1, "click", 7 * h + 60),
            # user 2: single purchase session (first=purchase, converted)
            ev(4, 2, "purchase", 0),
        ]
    )
    out = {
        r["first_touch"]: r
        for r in events_first_touch_attribution(spark, sf_dir).collect()
    }
    assert set(out) == {"view", "click", "purchase"}
    v, c, p = out["view"], out["click"], out["purchase"]
    assert (v["n_sessions"], v["n_converted"], v["conversion_rate"]) == (1, 1, 1.0)
    assert (c["n_sessions"], c["n_converted"], c["conversion_rate"]) == (1, 0, 0.0)
    assert (p["n_sessions"], p["n_converted"], p["conversion_rate"]) == (1, 1, 1.0)


def test_basket_lift_hand_computed(spark, tmp_path):
    # baskets: O1={1,2,3}, O2={1,2}, O3={1,2}, O4={3}; N=4 orders
    # supports: P1=3, P2=3, P3=2; only (P1,P2) co-occurs >= 2 times (3x)
    # lift = n_both * N / (n_a * n_b) = 3*4/(3*3) = 1.3333
    rows = [
        (1, 1), (1, 2), (1, 3),
        (2, 1), (2, 2),
        (3, 1), (3, 2),
        (4, 3),
    ]
    spark.createDataFrame(rows, "l_orderkey long, l_partkey long").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = basket_part_pairs_lift(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["part_a"], r["part_b"], r["n_both"], r["n_a"], r["n_b"]) == (
        1, 2, 3, 3, 3,
    )
    assert r["lift"] == 1.3333
