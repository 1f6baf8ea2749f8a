"""Crafted-corpus truths for the r6-window TPC-H shapes q4 and q17:
EXISTS-as-semi-join multiplicity (an order with many late lineitems
counts once) and the correlated per-part AVG threshold with its strict
inequality. The oracle proves engine == DuckDB; these prove both == a
hand-computed answer.
"""

from __future__ import annotations

import datetime as dt

from mapreduce_docker_spark.operators.relational_queries import (
    q4_order_priority_check,
)
from mapreduce_docker_spark.operators.tpch_queries import (
    q17_small_quantity_revenue,
)


def test_q4_exists_semijoin_hand_computed(spark, tmp_path):
    """Semi-join multiplicity + every boundary: two late lineitems count
    their order ONCE; ship == orderdate is not late (strict >); the date
    range includes 1997-01-01 and excludes 1997-10-01; an order with no
    lineitems never appears."""
    ts = dt.datetime
    spark.createDataFrame(
        [
            (1, "P1", ts(1997, 2, 1)),
            (2, "P1", ts(1997, 3, 1)),
            (3, "P2", ts(1997, 1, 1)),    # lower bound: included
            (4, "P2", ts(1997, 10, 1)),   # upper bound: excluded
            (5, "P2", ts(1996, 12, 31)),  # before range
            (6, "P3", ts(1997, 5, 5)),    # no lineitems at all
        ],
        "o_orderkey long, o_orderpriority string, o_orderdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    spark.createDataFrame(
        [
            (1, ts(1997, 2, 5)),    # late
            (1, ts(1997, 2, 10)),   # late again: order 1 still counts ONCE
            (2, ts(1997, 3, 1)),    # ship == orderdate: NOT late
            (3, ts(1997, 6, 1)),    # late
            (4, ts(1998, 1, 1)),    # late, but order outside date range
            (5, ts(1997, 6, 1)),    # late, but order before range
        ],
        "l_orderkey long, l_shipdate timestamp",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    got = {
        r["o_orderpriority"]: r["n_orders"]
        for r in q4_order_priority_check(spark, str(tmp_path)).collect()
    }
    assert got == {"P1": 1, "P2": 1}


def test_q17_correlated_avg_threshold_hand_computed(spark, tmp_path):
    """Per-part threshold 0.5*avg(l_quantity) computed over ALL of the
    part's lineitems, strict <, and only wanted parts (brand AND size)
    contribute: part 1 qtys {1,2,4,7} -> avg 3.5 -> threshold 1.75 ->
    only the qty-1 row (price 100) passes; avg_yearly = 100/7 = 14.29
    after half-up cent rounding."""
    spark.createDataFrame(
        [
            (1, "Brand#2", 5),    # wanted
            (2, "Brand#2", 15),   # size >= 10: not wanted
            (3, "Brand#9", 5),    # wrong brand: not wanted
        ],
        "p_partkey long, p_brand string, p_size int",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "part.parquet"))
    spark.createDataFrame(
        [
            (1, 1.0, 100.0),   # < 1.75: the ONLY passing row
            (1, 2.0, 999.0),   # 2.0 > 1.75: excluded (and not boundary-equal)
            (1, 4.0, 200.0),
            (1, 7.0, 300.0),
            (2, 0.5, 1000.0),  # would pass its own threshold, part not wanted
            (3, 0.5, 500.0),   # wrong brand
        ],
        "l_partkey long, l_quantity double, l_extendedprice double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    rows = q17_small_quantity_revenue(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    assert rows[0]["avg_yearly"] == 14.29  # 100 / 7, rounded half-up
