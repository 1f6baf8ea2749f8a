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


def _write_skewed_fixture(spark, base: str) -> None:
    """Synthetic events + customer fixture sized so the hot key's shuffle
    partition clears a forced-down skew threshold.

    Multi-file layouts matter: AQE splits a skewed reduce partition by
    MAPPER ranges, so a single-mapper scan (one small parquet file) is
    unsplittable no matter the thresholds — exactly why the fixture writes
    8 fact files (and why a 100 TB scan, with thousands of mappers, is the
    easy case).
    """
    ev = spark.range(60_000).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.lit(1_704_067_200_000_000) + F.col("id") * 1_000_000
        ).alias("ts"),
        (F.col("id") % 300).alias("user_id"),
        F.lit("view").alias("event_type"),
        (F.col("id") % 97).cast("double").alias("value"),
        F.lit("{}").alias("props"),
    )
    ev.repartition(8).write.mode("overwrite").parquet(base + "/events.parquet")
    cust = spark.range(300).select(
        F.col("id").alias("c_custkey"),
        F.concat(F.lit("cust"), F.col("id")).alias("c_name"),
        (F.col("id").cast("double") * 10.0).alias("c_acctbal"),
        F.lit("BUILDING").alias("c_mktsegment"),
        (F.col("id") % 25).alias("c_nationkey"),
    )
    cust.repartition(4).write.mode("overwrite").parquet(base + "/customer.parquet")


_FORCE_SPLIT = {
    # hot partition (~1/3 of 60k rows) clears 1k easily; factor 1.0 makes
    # "bigger than median" sufficient; tiny advisory size -> many splits
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "1.0",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "1k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "1k",
}


def test_aqe_skew_split_fires_and_preserves_result(spark, tmp_path):
    """The registered AQE-skew demo plan must (a) stay a SortMergeJoin (the
    merge hint holds against broadcast), (b) get runtime skew-split by AQE
    once the thresholds are in reach — executed plan shows
    ``SortMergeJoin(skew=true)`` — and (c) return identical rows with and
    without the split (the whole point of a runtime re-plan)."""
    from mapreduce_docker_spark.operators.skew import join_aqe_skew_enriched_events

    base = str(tmp_path)
    _write_skewed_fixture(spark, base)

    baseline = sorted(
        tuple(r) for r in join_aqe_skew_enriched_events(spark, base).collect()
    )
    assert len(baseline) == 60_000

    saved = {k: spark.conf.get(k) for k in _FORCE_SPLIT}
    try:
        for k, v in _FORCE_SPLIT.items():
            spark.conf.set(k, v)
        df = join_aqe_skew_enriched_events(spark, base)
        split_rows = sorted(tuple(r) for r in df.collect())
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)

    assert "SortMergeJoin" in plan, plan[:800]
    assert "skew=true" in plan, plan[:800]
    assert split_rows == baseline
