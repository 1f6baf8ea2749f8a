"""Fourth batch of hand-computed truths: embedding norm profile, cohort
LTV, and the decorrelated LATERAL top-2."""

from __future__ import annotations

import datetime as dt

from mapreduce_docker_spark.operators.relational_queries import (
    orders_cohort_ltv,
    sql_lateral_top2_orders,
)
from mapreduce_docker_spark.operators.similarity_queries import emb_norm_profile


def test_norm_profile_hand_computed(spark, tmp_path):
    rows = [
        (1, [3.0, 4.0], 0),   # norm 5
        (2, [0.0, 0.0], 0),   # norm 0 -> zero-vec counter
        (3, [6.0, 8.0], 1),   # norm 10
    ]
    spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    out = {r["label"]: r for r in emb_norm_profile(spark, str(tmp_path)).collect()}
    l0 = out[0]
    assert (l0["n_vecs"], l0["min_dims"], l0["max_dims"]) == (2, 2, 2)
    assert (l0["min_norm"], l0["max_norm"], l0["avg_norm"]) == (0.0, 5.0, 2.5)
    assert l0["n_zero_vecs"] == 1
    l1 = out[1]
    assert (l1["n_vecs"], l1["max_norm"], l1["n_zero_vecs"]) == (1, 10.0, 0)


def test_cohort_ltv_hand_computed(spark, tmp_path):
    d = dt.date
    rows = [
        (1, 1, d(2024, 1, 10), 100.0),  # cust 1 first in Jan
        (2, 2, d(2024, 1, 20), 200.0),  # cust 2 first in Jan -> cohort size 2
        (3, 1, d(2024, 3, 5), 50.0),    # cust 1 again at offset 2
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_orderdate date, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {r["month_offset"]: r for r in orders_cohort_ltv(spark, str(tmp_path)).collect()}
    assert set(out) == {0, 2}
    assert str(out[0]["cohort_month"]) == "2024-01-01"
    assert (out[0]["cohort_customers"], out[0]["cum_revenue"]) == (2, 300.0)
    assert out[0]["ltv_per_customer"] == 150.0
    assert (out[2]["cum_revenue"], out[2]["ltv_per_customer"]) == (350.0, 175.0)


def test_lateral_top2_hand_computed(spark, tmp_path):
    spark.createDataFrame(
        [(1, "a"), (2, "b")], "c_custkey long, c_name string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "customer.parquet"))
    orders = [
        # cust 1: three orders; top-2 by (price desc, orderkey desc) =
        # (11, 500.0) then the 300.0 TIE broken by orderkey desc -> 13
        (11, 1, 500.0),
        (12, 1, 300.0),
        (13, 1, 300.0),
        # cust 2: one order only -> one row
        (21, 2, 100.0),
    ]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = sorted(
        (r["c_custkey"], r["o_orderkey"], r["o_totalprice"])
        for r in sql_lateral_top2_orders(spark, str(tmp_path)).collect()
    )
    assert got == [(1, 11, 500.0), (1, 13, 300.0), (2, 21, 100.0)]
