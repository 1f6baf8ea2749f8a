"""Pandas-on-Spark API surface (the third user-facing API lane).

The engine exposes three query APIs over the same execution core: the
DataFrame API (everywhere), raw SQL (`sql_interface_revenue_by_nation`),
and — here — the pandas-on-Spark API (`pyspark.pandas`), for users
migrating pandas workloads who want pandas idioms compiled to the same
Catalyst plans. The query below is written in pandas idiom end-to-end
(boolean-mask filter, groupby-agg, column arithmetic) and converts back to
a plain DataFrame at the edge, so the driver oracle checks the pandas lane
produces bit-identical answers to SQL.

Scale notes: pandas-on-Spark compiles to ordinary Catalyst plans (the agg
below is the same partial/final HashAggregate as the DataFrame twin), BUT
the API's default-index and ordering semantics can inject hidden
`attach_distributed_sequence` exchanges — avoided here by aggregating on
real columns (no positional index is ever materialized). That caveat is
the reason this lane is a MIGRATION surface, not the hot path.

Reference lineage: none (the reference has a single hard-coded job); this
is [EXT] API breadth, same class as the SQL-interface query.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_docker_spark.functions.rounding import sql as rsql
from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table


@register(
    "psapi_priority_order_stats",
    f"""
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_orders,
           CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_customers,
           {rsql("sum(o_totalprice)", 2)} AS revenue
    FROM orders
    WHERE o_totalprice > 1000.0
    GROUP BY o_orderpriority
    """,
    section="D1,A7",
    note=(
        "the pandas-on-Spark API lane: boolean-mask filter + groupby-agg "
        "written in pandas idiom, compiled by the same Catalyst core and "
        "hash-matched against the SQL oracle — proving API-lane value "
        "parity. No positional index is materialized (a pandas-on-Spark "
        "default-index would inject an attach_distributed_sequence "
        "exchange; aggregating on real columns avoids it)"
    ),
)
def q_psapi_priority_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    import pyspark.pandas as ps

    from mapreduce_docker_spark.functions.rounding import dround

    psdf = load_table(spark, sf_dir, "orders").pandas_api()
    filtered = psdf[psdf["o_totalprice"] > 1000.0]
    # dropna=False (r11 random-differential probe): pandas groupby DROPS the
    # NULL key group by default — SQL GROUP BY keeps it, so a NULL-priority
    # order silently vanished from the engine result only
    grouped = filtered.groupby("o_orderpriority", dropna=False).agg(
        n_orders=("o_orderkey", "count"),
        n_customers=("o_custkey", "nunique"),
        revenue=("o_totalprice", "sum"),
    )
    out = grouped.reset_index().to_spark()
    from pyspark.sql import functions as F

    return out.select(
        "o_orderpriority",
        F.col("n_orders").cast("long").alias("n_orders"),
        F.col("n_customers").cast("long").alias("n_customers"),
        dround(F.col("revenue"), 2).alias("revenue"),
    )
