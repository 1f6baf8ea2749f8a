"""Table profiling — the data-validation pass a training pipeline runs
before anything else (SURVEY §2.10 U4-adjacent [EXT]).

One scan produces per-column null counts and exact distinct cardinalities;
the single wide aggregate row is then exploded to one row per column so the
profile is itself a queryable relation. Exact ``count(distinct)`` keeps the
result DuckDB-hash-checkable; Spark plans the multi-column distinct via an
Expand (one stream per profiled column), which is the standard exact cost —
at 100 TB swap ``approx_count_distinct`` per column (single pass, HLL
state, no Expand) and the oracle degrades to rows-only, which is exactly
the trade the sketch family documents.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table

_PROFILE_TABLE = "orders"
_PROFILE_COLS = (
    # the fixture orders schema (TESTDATA.md) — narrower than classic TPC-H
    "o_orderkey",
    "o_custkey",
    "o_orderstatus",
    "o_totalprice",
    "o_orderdate",
    "o_orderpriority",
)

_SQL_PROFILE = "\nUNION ALL\n".join(
    f"""SELECT '{c}' AS col_name,
           CAST(count(*) - count({c}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
    FROM {_PROFILE_TABLE}"""
    for c in _PROFILE_COLS
)


@register(
    "profile_orders_columns",
    _SQL_PROFILE,
    section="A7,U4",
    note=f"per-column profile of `{_PROFILE_TABLE}` (null count + exact distinct cardinality) from ONE scan: wide aggregate row exploded to a (col_name, n_nulls, n_distinct) relation",
)
def profile_orders_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, _PROFILE_TABLE)
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.count_distinct(c).alias(f"_nd_{c}"))
    wide = t.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        (F.col("_n_rows") - F.col(f"_nn_{c}")).alias("n_nulls"),
                        F.col(f"_nd_{c}").alias("n_distinct"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    ).select("p.*")


@register(
    "profile_orders_columns_approx",
    None,  # HLL++ estimates are engine-specific -> rows-only
    section="A7,U4",
    note="100 TB twin of profile_orders_columns: approx_count_distinct (HLL++, rsd=0.01) per column in ONE pass with no Expand — mergeable sketch state instead of the exact multi-stream distinct; estimate-vs-exact tolerance pinned in tests/test_sketches.py",
)
def profile_orders_columns_approx(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_table(spark, sf_dir, _PROFILE_TABLE)
    aggs = [F.count(F.lit(1)).alias("_n_rows")]
    for c in _PROFILE_COLS:
        aggs.append(F.count(c).alias(f"_nn_{c}"))
        aggs.append(F.approx_count_distinct(c, rsd=0.01).alias(f"_nd_{c}"))
    wide = t.agg(*aggs)
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("col_name"),
                        (F.col("_n_rows") - F.col(f"_nn_{c}")).alias("n_nulls"),
                        F.col(f"_nd_{c}").alias("n_distinct_approx"),
                    )
                    for c in _PROFILE_COLS
                ]
            )
        ).alias("p")
    ).select("p.*")
