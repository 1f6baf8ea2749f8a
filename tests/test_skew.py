"""Salting transforms are result-preserving (operators/skew.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_docker_spark.operators.skew import salted_aggregate, salted_join
from mapreduce_docker_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_salted_aggregate_equals_plain(spark):
    ev = load_table(spark, SF, "events")
    plain = ev.groupBy("user_id").agg(
        F.count("event_id").alias("n_events"), F.min("value").alias("min_value")
    )
    salted = salted_aggregate(
        ev,
        keys=["user_id"],
        aggs={"n_events": ("event_id", "count"), "min_value": ("value", "min")},
        salt_from="event_id",
        n_salt=7,
    )
    assert _rows(salted.select("user_id", "n_events", "min_value")) == _rows(plain)


@pytest.mark.parametrize("how", ["inner", "left"])
def test_salted_join_equals_plain(spark, how):
    orders = load_table(spark, SF, "orders").select("o_orderkey", "o_custkey")
    cust = (
        load_table(spark, SF, "customer")
        .select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    )
    plain = orders.join(cust, "o_custkey", how).select(
        "o_orderkey", "o_custkey", "c_mktsegment"
    )
    salted = salted_join(
        orders, cust, on="o_custkey", salt_from="o_orderkey", n_salt=5, how=how
    ).select("o_orderkey", "o_custkey", "c_mktsegment")
    assert _rows(salted) == _rows(plain)


def test_salted_aggregate_rejects_non_reaggregatable(spark):
    ev = load_table(spark, SF, "events")
    with pytest.raises(ValueError, match="non-re-aggregatable"):
        salted_aggregate(
            ev, ["user_id"], {"a": ("value", "avg")}, salt_from="event_id"
        )
