"""As-of (point-in-time) join — SURVEY §2.3 J4's range-join family [EXT].

Spark has no native ASOF JOIN. The classic scalable formulation used here:
UNION both sides as tagged rows, then one window pass per key carries the
most recent left-side attributes forward in event-time order — a single
hash-partition + sort per key, no range-explosion join, no per-row driver
work. At 100 TB this is the shape that survives: cost is one shuffle of
(events) on user_id plus a sort within partitions, versus a theta join whose
candidate space is |A|x|B| per key.

Tie rules are pinned so the DuckDB oracle hash-matches exactly:
* a ``view`` at the same timestamp as a ``purchase`` IS visible to it
  (kind sorts view=0 < purchase=1);
* among equal-timestamp views, the max event_id wins (ORDER BY event_id
  puts it last; last_value picks it).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table


@register(
    "asof_purchase_prior_view",
    """
    WITH tagged AS (
      SELECT user_id, ts, event_id, 0 AS kind FROM events
      WHERE event_type = 'view' AND ts IS NOT NULL
      UNION ALL
      SELECT user_id, ts, event_id, 1 AS kind FROM events
      WHERE event_type = 'purchase' AND ts IS NOT NULL
      -- event-sequence law (r10): NULL-ts order is engine-asymmetric
    ),
    carried AS (
      SELECT user_id, ts, event_id, kind,
             last_value(CASE WHEN kind = 0 THEN event_id END IGNORE NULLS) OVER w AS view_event_id,
             last_value(CASE WHEN kind = 0 THEN epoch_us(ts::TIMESTAMP) END IGNORE NULLS) OVER w AS view_us
      FROM tagged
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, kind, event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT event_id AS purchase_event_id,
           user_id,
           ts::TIMESTAMP AS purchase_ts,
           view_event_id,
           CASE WHEN view_us IS NOT NULL
                THEN epoch_us(ts::TIMESTAMP) - view_us END AS gap_us
    FROM carried WHERE kind = 1
    """,
    section="J4",
    note="as-of join via union + carry-forward window (one shuffle per key); ties: same-ts view visible, max event_id wins",
)
def asof_purchase_prior_view(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event-sequence law (r10): timeless events are outside the as-of order
    ev = load_table(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "event_id", F.lit(0).alias("kind")
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id", F.lit(1).alias("kind")
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "kind", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    is_view = F.col("kind") == 0
    carried = views.unionAll(purchases).select(
        "user_id",
        "ts",
        "event_id",
        "kind",
        F.last(F.when(is_view, F.col("event_id")), ignorenulls=True)
        .over(w)
        .alias("view_event_id"),
        F.last(F.when(is_view, F.unix_micros("ts")), ignorenulls=True)
        .over(w)
        .alias("view_us"),
    )
    return carried.filter(F.col("kind") == 1).select(
        F.col("event_id").alias("purchase_event_id"),
        "user_id",
        F.col("ts").alias("purchase_ts"),
        "view_event_id",
        F.when(
            F.col("view_us").isNotNull(), F.unix_micros("ts") - F.col("view_us")
        ).alias("gap_us"),
    )


@register(
    "range_join_events_in_order_window",
    """
    SELECT o.o_orderkey, count(*) AS n_events,
           CAST(sum(CASE WHEN e.event_type = 'error' THEN 1 ELSE 0 END) AS BIGINT) AS n_errors
    FROM orders o
    JOIN events e
      ON e.user_id = o.o_custkey
     AND e.ts::TIMESTAMP >= o.o_orderdate + INTERVAL 8400 DAYS
     AND e.ts::TIMESTAMP <  o.o_orderdate + INTERVAL 8431 DAYS
    GROUP BY o.o_orderkey
    """,
    section="J4",
    note="banded range join (equi key + time band) — the equi part keeps it a hash join, not a nested loop; band chosen so 1995-2001 order dates project into the 2024 event month",
)
def range_join_events_in_order_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    e = load_table(spark, sf_dir, "events")
    lo = F.col("o_orderdate") + F.expr("INTERVAL 8400 DAYS")
    hi = F.col("o_orderdate") + F.expr("INTERVAL 8431 DAYS")
    return (
        o.join(
            e,
            (e["user_id"] == o["o_custkey"]) & (e["ts"] >= lo) & (e["ts"] < hi),
        )
        .groupBy("o_orderkey")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum((F.col("event_type") == "error").cast("long")).alias("n_errors"),
        )
    )
