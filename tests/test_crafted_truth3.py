"""Third batch of hand-computed truths: month-over-month growth, ABC
classification cut lines, and the key-skew report."""

from __future__ import annotations

import datetime as dt

from mapreduce_docker_spark.operators.relational_queries import (
    orders_mom_revenue_growth,
    parts_abc_classification,
)


def test_mom_growth_hand_computed(spark, tmp_path):
    d = dt.date
    rows = [
        (1, d(2024, 1, 10), 100.0),
        (2, d(2024, 1, 20), 100.0),   # Jan: 200
        (3, d(2024, 2, 5), 300.0),    # Feb: 300 -> +50%
        (4, d(2024, 3, 5), 150.0),    # Mar: 150 -> -50%
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_orderdate date, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {str(r["month"]): r for r in orders_mom_revenue_growth(spark, str(tmp_path)).collect()}
    assert out["2024-01-01"]["mom_growth"] is None
    assert out["2024-01-01"]["revenue"] == 200.0
    assert out["2024-02-01"]["mom_growth"] == 0.5
    assert out["2024-03-01"]["mom_growth"] == -0.5
    assert out["2024-03-01"]["n_orders"] == 1


def test_abc_classification_hand_computed(spark, tmp_path):
    # revenues: P1=80, P2=15, P3=5 -> cum shares 0.80 (A), 0.95 (B), 1.0 (C)
    rows = [
        (1, 100.0, 0.2),  # 80
        (2, 15.0, 0.0),   # 15
        (3, 10.0, 0.5),   # 5
    ]
    spark.createDataFrame(
        rows, "l_partkey long, l_extendedprice double, l_discount double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = {r["abc"]: r for r in parts_abc_classification(spark, str(tmp_path)).collect()}
    assert set(out) == {"A", "B", "C"}
    assert (out["A"]["n_parts"], out["A"]["class_revenue"]) == (1, 80.0)
    assert out["A"]["max_cum_share"] == 0.8
    assert (out["B"]["n_parts"], out["B"]["class_revenue"]) == (1, 15.0)
    assert out["B"]["max_cum_share"] == 0.95
    assert (out["C"]["n_parts"], out["C"]["class_revenue"]) == (1, 5.0)
    assert out["C"]["max_cum_share"] == 1.0


def test_key_skew_report_hand_computed(spark, tmp_path):
    import importlib

    mod = None
    for m in (
        "mapreduce_docker_spark.operators.profile_queries",
        "mapreduce_docker_spark.operators.relational_queries",
    ):
        candidate = importlib.import_module(m)
        if hasattr(candidate, "dq_key_skew_report"):
            mod = candidate
            break
    assert mod is not None
    d = dt.datetime
    spark.createDataFrame(
        [(1, 7), (2, 7), (3, 7), (4, 8)], "o_orderkey long, o_custkey long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [(1, 1), (2, 1), (3, 2)], "l_orderkey long, l_partkey long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    spark.createDataFrame(
        [
            (1, d(2024, 1, 1), 1, "view", 1.0, "{}"),
            (2, d(2024, 1, 1), 1, "view", 1.0, "{}"),
            (3, d(2024, 1, 1), 2, "view", 1.0, "{}"),
        ],
        "event_id long, ts timestamp, user_id long, event_type string, value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["key_col"], r["rnk"]): r
        for r in mod.dq_key_skew_report(spark, str(tmp_path)).collect()
    }
    r1 = out[("orders.o_custkey", 1)]
    assert (r1["key"], r1["n"], r1["share"]) == (7, 3, 0.75)
    r2 = out[("orders.o_custkey", 2)]
    assert (r2["key"], r2["n"], r2["share"]) == (8, 1, 0.25)
    l1 = out[("lineitem.l_partkey", 1)]
    assert (l1["key"], l1["n"]) == (1, 2)
    e1 = out[("events.user_id", 1)]
    assert (e1["key"], e1["n"], e1["share"]) == (1, 2, 0.666667)
