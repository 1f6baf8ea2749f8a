"""Crafted-corpus truths for two more r6-window r1-era queries: CUBE's
four grouping sets (a NULL grouping key vs a real NULL value is the
classic trap), and FULL OUTER join's one-sided rows surviving with NULL
balances. The oracle proves engine == DuckDB; these prove both == a
hand-computed answer.
"""

from __future__ import annotations

from mapreduce_docker_spark.operators.relational_queries import (
    agg_cube_status_priority,
    join_full_outer_balances,
)


def test_cube_all_grouping_sets_hand_computed(spark, tmp_path):
    """3 orders -> exactly 8 cube rows: 3 leaf groups, 2 status subtotals,
    2 priority subtotals, 1 grand total — every margin summed by hand."""
    schema = (
        "o_orderkey long, o_custkey long, o_orderstatus string, "
        "o_orderpriority string, o_totalprice double"
    )
    rows = [
        (1, 1, "O", "P1", 10.0),
        (2, 1, "O", "P2", 20.0),
        (3, 1, "F", "P1", 30.0),
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "orders.parquet"))
    got = {
        (r["o_orderstatus"], r["o_orderpriority"]): (
            r["n_orders"], r["total_price"]
        )
        for r in agg_cube_status_priority(spark, str(tmp_path)).collect()
    }
    assert got == {
        ("O", "P1"): (1, 10.0),
        ("O", "P2"): (1, 20.0),
        ("F", "P1"): (1, 30.0),
        ("O", None): (2, 30.0),
        ("F", None): (1, 30.0),
        (None, "P1"): (2, 40.0),
        (None, "P2"): (1, 20.0),
        (None, None): (3, 60.0),
    }


def test_full_outer_balances_one_sided_nations(spark, tmp_path):
    """FULL OUTER must keep nations with only customers (supp_bal NULL)
    and only suppliers (cust_bal NULL), and the nation join key comes from
    coalesce over whichever side exists."""
    spark.createDataFrame(
        [(1, "ALPHA", 0), (2, "BRAVO", 0), (3, "CHARLIE", 0)],
        "n_nationkey long, n_name string, n_regionkey long",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "nation.parquet"))
    spark.createDataFrame(
        [(10, 1, 100.5), (11, 2, 200.25), (12, 2, 99.75)],
        "c_custkey long, c_nationkey long, c_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    spark.createDataFrame(
        [(20, 2, 50.0), (21, 3, 75.125)],
        "s_suppkey long, s_nationkey long, s_acctbal double",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "supplier.parquet"))
    got = {
        r["n_nationkey"]: (r["cust_bal"], r["supp_bal"])
        for r in join_full_outer_balances(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (100.5, None),        # customers only
        2: (300.0, 50.0),        # 200.25 + 99.75, both sides
        3: (None, 75.13),        # suppliers only; 75.125 rounds HALF-UP
    }
