"""TPC-H query shapes 2/7/8/9/11/13/15/16/17/20/21 over the fixture star schema.

Completes the TPC-H-shaped surface started in ``relational_queries.py``
(which covers Q1/3/4/5/6/10/12/14/18/19/22): the reference engine computes
none of these (it is a word-count MapReduce, reference coordinator.py:71-83)
— this is the mandated [EXT] relational generalization, SURVEY §2.3-§2.4.

The fixture schema is a simplified TPC-H (TESTDATA.md): there is no
``partsupp`` table and no commit/receipt dates or comment columns, so each
query here keeps the ORIGINAL's structural essence — the thing Catalyst has
to plan well — with predicates adapted to the columns that exist:

* Q2   correlated-MIN subquery joined back (min unit cost per part)
* Q7   double-aliased dimension (nation x2) with symmetric OR predicate
* Q8   market share: conditional share of a multi-join volume by year
* Q9   profit by nation x year with a notional supply cost (no partsupp)
* Q11  HAVING against an uncorrelated scalar subquery (fraction of total)
* Q13  outer join with join-condition filter + distribution re-aggregation
* Q15  view-over-aggregate joined to its own MAX (scalar subquery)
* Q16  NOT IN (anti join) + count(DISTINCT) over a grouped join
* Q17  correlated AVG subquery as a per-key threshold
* Q20  nested IN subqueries (semi-join chain) over an aggregate
* Q21  EXISTS + NOT EXISTS with <> correlation (semi + anti with residual)

Spark-first discipline: correlated subqueries are decorrelated by hand into
aggregate-then-join (broadcast where the subquery result is bounded), since
that is exactly the plan Catalyst's decorrelation would target, and scalar
subqueries become broadcast 1-row cross joins (no collect(), no driver round
trip) — the same patterns proven in q22/q6. Every float the result carries
goes through the cross-engine deterministic rounding in functions/rounding.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_docker_spark.functions.rounding import dround
from mapreduce_docker_spark.functions.rounding import sql as rsql
from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table


def _revenue():
    return F.col("l_extendedprice") * (F.lit(1.0) - F.col("l_discount"))


def _t(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    return tuple(load_table(spark, sf_dir, n) for n in names)


def _ts(s: str):
    return F.lit(s).cast("timestamp")


@register(
    "q2_min_cost_supplier",
    f"""
    WITH cost AS (
      -- zero/NULL-quantity law (r11 random-differential probe): a
      -- zero-quantity line defines no unit cost — NULL, never a divide.
      -- DuckDB's x/0 is NULL anyway; the CASE makes the law explicit and
      -- mirrors the engine's lazy guard (Spark ANSI THROWS on the raw /)
      SELECT l_partkey, l_suppkey,
             min(CASE WHEN l_quantity <> 0 THEN l_extendedprice / l_quantity END)
               AS unit_cost
      FROM lineitem GROUP BY l_partkey, l_suppkey
    ),
    eu AS (
      SELECT s_suppkey, s_name, s_acctbal, n_name
      FROM supplier JOIN nation ON s_nationkey = n_nationkey
                    JOIN region ON n_regionkey = r_regionkey
      WHERE r_name = 'EUROPE'
    ),
    eucost AS (
      SELECT c.l_partkey, c.unit_cost, eu.s_name, eu.s_acctbal, eu.n_name
      FROM cost c JOIN eu ON eu.s_suppkey = c.l_suppkey
    ),
    mincost AS (
      SELECT l_partkey, min(unit_cost) AS min_cost FROM eucost GROUP BY l_partkey
    )
    SELECT e.s_acctbal, e.s_name, e.n_name, p.p_partkey, p.p_name,
           {rsql('e.unit_cost', 2)} AS unit_cost
    FROM part p
    JOIN eucost  e ON e.l_partkey = p.p_partkey
    JOIN mincost m ON m.l_partkey = p.p_partkey AND e.unit_cost = m.min_cost
    WHERE p.p_size BETWEEN 10 AND 15 AND p.p_type = 'LARGE'
    ORDER BY e.s_acctbal DESC, e.n_name, e.s_name, p.p_partkey
    LIMIT 20
    """,
    section="J1,J2,A7,T1",
    note="TPC-H Q2 shape: correlated-MIN subquery decorrelated to agg+join-back; "
    "min unit cost stands in for ps_supplycost (no partsupp in fixture)",
)
def q2_min_cost_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, nation, region, part = _t(
        spark, sf_dir, "lineitem", "supplier", "nation", "region", "part"
    )
    # zero/NULL-quantity law (r11): lazy CASE so the division never
    # evaluates on a zero row (ANSI DIVIDE_BY_ZERO; oracle CASE twin) —
    # same guard family as q14/q8's zero-denominator shares
    unit_cost = F.when(
        F.col("l_quantity") != 0, F.col("l_extendedprice") / F.col("l_quantity")
    )
    cost = li.groupBy("l_partkey", "l_suppkey").agg(
        F.min(unit_cost).alias("unit_cost")
    )
    # supplier x nation x region is bounded (dims fixed at any sf) -> broadcast
    eu = (
        supp.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .filter(F.col("r_name") == "EUROPE")
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    eucost = cost.join(eu, eu["s_suppkey"] == cost["l_suppkey"]).select(
        "l_partkey", "unit_cost", "s_name", "s_acctbal", "n_name"
    )
    # equality against the group MIN is exact: min() returns one of the
    # group's own IEEE values, identically on both engines. The min rides a
    # per-part window instead of the textbook agg-then-self-join
    # decorrelation, which would scan (and re-aggregate) lineitem twice —
    # the window reuses the shuffle the cost aggregation already paid
    best = (
        eucost.withColumn(
            "_min_cost", F.min("unit_cost").over(Window.partitionBy("l_partkey"))
        )
        .filter(F.col("unit_cost") == F.col("_min_cost"))
        .drop("_min_cost")
    )
    wanted = part.filter(
        F.col("p_size").between(10, 15) & (F.col("p_type") == "LARGE")
    ).select("p_partkey", "p_name")
    return (
        best.join(F.broadcast(wanted), best["l_partkey"] == wanted["p_partkey"])
        .select(
            "s_acctbal",
            "s_name",
            "n_name",
            "p_partkey",
            "p_name",
            dround(F.col("unit_cost"), 2).alias("unit_cost"),
        )
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "q7_volume_shipping",
    f"""
    SELECT supp_nation, cust_nation, l_year, {rsql('sum(volume)', 2)} AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             l_extendedprice * (1.0 - l_discount) AS volume
      FROM supplier JOIN lineitem ON s_suppkey = l_suppkey
                    JOIN orders   ON o_orderkey = l_orderkey
                    JOIN customer ON c_custkey = o_custkey
                    JOIN nation n1 ON s_nationkey = n1.n_nationkey
                    JOIN nation n2 ON c_nationkey = n2.n_nationkey
      WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
    ) shipping
    GROUP BY supp_nation, cust_nation, l_year
    """,
    section="J1,J2,A7",
    note="TPC-H Q7 shape: the same dimension joined twice under different roles "
    "with a symmetric OR predicate across the two aliases",
)
def q7_volume_shipping(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp, li, orders, cust, nation = _t(
        spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation"
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation")
    )
    pair = (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    flipped = (F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1")
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(cust, F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(n1), F.col("s_nationkey") == F.col("n1_key"))
        .join(F.broadcast(n2), F.col("c_nationkey") == F.col("n2_key"))
        .filter(pair | flipped)
        .groupBy(
            "supp_nation", "cust_nation", F.year("l_shipdate").alias("l_year")
        )
        .agg(dround(F.sum(_revenue()), 2).alias("revenue"))
    )


@register(
    "q8_market_share",
    f"""
    SELECT o_year,
           CASE WHEN sum(volume) = 0 THEN NULL
           ELSE {rsql("sum(CASE WHEN nation = 'NATION_3' THEN volume ELSE 0.0 END)"
                 " / sum(volume)", 4)} END AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1.0 - l_discount) AS volume,
             n2.n_name AS nation
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON l_orderkey = o_orderkey
                JOIN customer ON o_custkey = c_custkey
                JOIN nation n1 ON c_nationkey = n1.n_nationkey
                JOIN region    ON n1.n_regionkey = r_regionkey
                JOIN nation n2 ON s_nationkey = n2.n_nationkey
      WHERE r_name = 'ASIA'
        AND o_orderdate >= TIMESTAMP '1996-01-01'
        AND o_orderdate <  TIMESTAMP '1998-01-01'
        AND p_type = 'ECONOMY'
    ) all_nations
    GROUP BY o_year
    """,
    section="J1,J2,A7",
    note="TPC-H Q8 shape: one nation's share of a region's import volume by year "
    "(conditional numerator over the same grouped sum); a zero-volume year "
    "(all-zero-price rows — the q14 class, r11 division audit) has no defined "
    "share and yields NULL on both engines instead of ANSI DIVIDE_BY_ZERO",
)
def q8_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li, supp, orders, cust, nation, region = _t(
        spark,
        sf_dir,
        "part",
        "lineitem",
        "supplier",
        "orders",
        "customer",
        "nation",
        "region",
    )
    n1 = nation.select(
        F.col("n_nationkey").alias("n1_key"), F.col("n_regionkey").alias("n1_region")
    )
    n2 = nation.select(
        F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("nation")
    )
    vol = _revenue()
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_type") == "ECONOMY")),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(n1), F.col("c_nationkey") == F.col("n1_key"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "ASIA")),
            F.col("n1_region") == F.col("r_regionkey"),
        )
        .join(F.broadcast(n2), F.col("s_nationkey") == F.col("n2_key"))
        .groupBy(F.year("o_orderdate").alias("o_year"))
        .agg(
            # lazy CASE: the sanctioned ANSI divide-by-zero shield (a
            # zero-volume year is an undefined share -> NULL, q14 class)
            dround(
                F.when(
                    F.sum(vol) != 0,
                    F.sum(
                        F.when(F.col("nation") == "NATION_3", vol).otherwise(
                            F.lit(0.0)
                        )
                    )
                    / F.sum(vol),
                ),
                4,
            ).alias("mkt_share")
        )
    )


@register(
    "q9_product_type_profit",
    f"""
    SELECT nation, o_year, {rsql('sum(amount)', 2)} AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             l_extendedprice * (1.0 - l_discount)
               - CAST(0.4 AS DOUBLE) * p_retailprice * l_quantity AS amount
      FROM part JOIN lineitem ON p_partkey = l_partkey
                JOIN supplier ON s_suppkey = l_suppkey
                JOIN orders   ON o_orderkey = l_orderkey
                JOIN nation   ON s_nationkey = n_nationkey
      WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
    section="J1,J2,A7",
    note="TPC-H Q9 shape: profit by supplier nation x order year; 0.4*p_retailprice"
    "*l_quantity stands in for ps_supplycost (no partsupp in fixture)",
)
def q9_product_type_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    part, li, supp, orders, nation = _t(
        spark, sf_dir, "part", "lineitem", "supplier", "orders", "nation"
    )
    amount = _revenue() - F.lit(0.4) * F.col("p_retailprice") * F.col("l_quantity")
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy(
            F.col("n_name").alias("nation"), F.year("o_orderdate").alias("o_year")
        )
        .agg(dround(F.sum(amount), 2).alias("sum_profit"))
    )


@register(
    "q11_important_stock",
    f"""
    WITH val AS (
      SELECT l_partkey, {rsql('sum(l_extendedprice * l_quantity)', 2)} AS part_value
      FROM lineitem JOIN supplier ON s_suppkey = l_suppkey
                    JOIN nation   ON s_nationkey = n_nationkey
      WHERE n_name = 'NATION_5'
      GROUP BY l_partkey
    )
    -- both comparison sides are rounded (cut-line discipline): an unrounded
    -- order-dependent sum could flip membership for a near-tie under the
    -- driver's exact value hash
    SELECT l_partkey, part_value
    FROM val
    WHERE part_value > {rsql('(SELECT sum(part_value) * CAST(0.001 AS DOUBLE) FROM val)', 2)}
    """,
    section="A7,J2",
    note="TPC-H Q11 shape: grouped value filtered by a fraction-of-global-total "
    "scalar subquery; lineitem value per part stands in for partsupp stock value",
)
def q11_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp, nation = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    val = (
        li.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
        .join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_5")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .groupBy("l_partkey")
        # round the per-part value BEFORE the threshold compare: the raw sum
        # is summation-order-dependent, and the cut line must compare the
        # same rounded values on both engines (cut-line discipline, cf.
        # sim_ann_ivf / text_curation_pipeline)
        .agg(
            dround(F.sum(F.col("l_extendedprice") * F.col("l_quantity")), 2).alias(
                "part_value"
            )
        )
    )
    # the global total rides a zero-column window (one tiny row per part by
    # then); this keeps ONE lineitem scan instead of the cross-join-with-agg
    # decorrelation's two
    total = F.sum("part_value").over(Window.partitionBy())
    return (
        val.withColumn("_threshold", dround(total * F.lit(0.001), 2))
        .filter(F.col("part_value") > F.col("_threshold"))
        .select("l_partkey", "part_value")
    )


@register(
    "q13_customer_distribution",
    """
    SELECT c_count, count(*) AS custdist
    FROM (
      SELECT c_custkey, count(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
    section="J1,A7",
    note="TPC-H Q13 shape: outer join with a join-condition (not WHERE) filter, "
    "then re-aggregating the per-customer counts into a distribution",
)
def q13_customer_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(
            orders,
            (F.col("c_custkey") == F.col("o_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


@register(
    "q15_top_supplier",
    f"""
    WITH revenue AS (
      -- rounded INSIDE the view: the max-equality cut line below must
      -- compare identical rounded doubles on both engines, not raw
      -- order-dependent sums
      SELECT l_suppkey AS supplier_no,
             {rsql('sum(l_extendedprice * (1.0 - l_discount))', 2)} AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01'
        AND l_shipdate <  TIMESTAMP '1996-04-01'
        -- NULL-key law (r11): a supplierless revenue group is not a
        -- top-supplier candidate — unexcluded it can STEAL the max and
        -- empty the result after the supplier join (on both engines)
        AND l_suppkey IS NOT NULL
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT max(total_revenue) FROM revenue)
    """,
    section="A7,J1,T1",
    note="TPC-H Q15 shape: aggregate view joined against its own MAX "
    "(scalar subquery over the same derived relation)",
)
def q15_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, supp = _t(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
            # NULL-key law (r11): see the oracle comment — a supplierless
            # group could steal the max and empty the result
            & F.col("l_suppkey").isNotNull()
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        # rounded before the max-equality compare (cut-line discipline):
        # max over identical rounded values selects the same row set on
        # both engines, where a raw-sum near-tie could diverge by an ulp
        .agg(dround(F.sum(_revenue()), 2).alias("total_revenue"))
    )
    # MAX over the derived relation via a zero-column window: one row per
    # supplier exists by then (tiny), and the lineitem scan happens ONCE —
    # the textbook self-join decorrelation would scan it twice
    best = F.max("total_revenue").over(Window.partitionBy())
    return (
        revenue.withColumn("_best", best)
        .filter(F.col("total_revenue") == F.col("_best"))
        .join(supp, F.col("s_suppkey") == F.col("supplier_no"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


@register(
    "q16_parts_supplier",
    """
    SELECT p_brand, p_size, CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_type <> 'PROMO'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      -- the NULL-key laws (r11 probe): NOT IN drops a NULL lhs implicitly
      -- where Spark's left-anti KEEPS it (a phantom zero-count group), and
      -- one NULL in the subquery list would empty the whole result; both
      -- exclusions are now EXPLICIT so the engines share one contract
      AND l_suppkey IS NOT NULL
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier
                            WHERE s_acctbal < 0.0 AND s_suppkey IS NOT NULL)
    GROUP BY p_brand, p_size
    """,
    section="J3,A4,A7",
    note="TPC-H Q16 shape: NOT IN over a key subquery (anti join) + "
    "count(DISTINCT) per group; negative-balance suppliers stand in for the "
    "complaints list (no comment column in fixture). NULL keys are excluded "
    "EXPLICITLY on both engines (r11): SQL NOT IN silently drops a NULL lhs "
    "while the anti join keeps it — a supplierless lineitem used to create "
    "a phantom zero-count group engine-side only",
)
def q16_parts_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part, supp = _t(spark, sf_dir, "lineitem", "part", "supplier")
    li = li.filter(F.col("l_suppkey").isNotNull())
    bad = supp.filter(
        F.col("s_acctbal") < 0.0
    ).filter(F.col("s_suppkey").isNotNull()).select("s_suppkey")
    wanted = part.filter(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
    )
    return (
        li.join(F.broadcast(wanted), F.col("p_partkey") == F.col("l_partkey"))
        .join(
            F.broadcast(bad), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti"
        )
        .groupBy("p_brand", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q17_small_quantity_revenue",
    f"""
    SELECT {rsql('sum(l_extendedprice) / 7.0', 2)} AS avg_yearly
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand = 'Brand#2'
      AND p_size < 10
      AND l_quantity < (
        SELECT CAST(0.5 AS DOUBLE) * avg(l_quantity)
        FROM lineitem l2 WHERE l2.l_partkey = lineitem.l_partkey
      )
    """,
    section="A7,J1,J2",
    note="TPC-H Q17 shape: correlated AVG subquery as a per-part threshold, "
    "decorrelated to a broadcast per-part aggregate join",
)
def q17_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    li, part = _t(spark, sf_dir, "lineitem", "part")
    # the correlated AVG is per-part, so restricting to the wanted parts
    # FIRST leaves every per-part average unchanged — the threshold can then
    # ride a window over the already-filtered join instead of a second
    # aggregate-the-whole-fact-table pass: ONE lineitem scan, and the window
    # shuffle moves only the wanted parts' lineitems
    wanted = part.filter((F.col("p_brand") == "Brand#2") & (F.col("p_size") < 10))
    threshold = F.lit(0.5) * F.avg("l_quantity").over(Window.partitionBy("l_partkey"))
    return (
        li.join(F.broadcast(wanted), F.col("p_partkey") == F.col("l_partkey"))
        .withColumn("_qty_threshold", threshold)
        .filter(F.col("l_quantity") < F.col("_qty_threshold"))
        .agg(dround(F.sum("l_extendedprice") / F.lit(7.0), 2).alias("avg_yearly"))
    )


@register(
    "q20_potential_part_promotion",
    """
    SELECT s_name, n_name
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    WHERE s_suppkey IN (
      SELECT l_suppkey
      FROM lineitem
      WHERE l_partkey IN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%')
        AND l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1998-01-01'
      GROUP BY l_suppkey
      HAVING sum(l_quantity) > 100.0
    )
    ORDER BY s_name
    """,
    section="J3,A7",
    note="TPC-H Q20 shape: nested IN subqueries (semi-join chain) gated on an "
    "aggregate HAVING; shipped volume stands in for partsupp availqty",
)
def q20_potential_part_promotion(spark: SparkSession, sf_dir: str) -> DataFrame:
    supp, nation, li, part = _t(spark, sf_dir, "supplier", "nation", "lineitem", "part")
    small_parts = part.filter(F.col("p_name").like("small%")).select("p_partkey")
    heavy = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1997-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(F.broadcast(small_parts), F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 100.0)
        .select("l_suppkey")
    )
    return (
        supp.join(heavy, F.col("s_suppkey") == F.col("l_suppkey"), "left_semi")
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_name", "n_name")
        .orderBy("s_name")
    )


@register(
    "q21_waiting_suppliers",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    section="J3,A7,T1",
    note="TPC-H Q21 shape: EXISTS (semi) + NOT EXISTS (anti) both correlated with "
    "an inequality residual; sole-returner-on-multi-supplier-order stands in for "
    "the only-late-supplier predicate (no receipt/commit dates in fixture)",
)
def q21_waiting_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q21(spark, sf_dir, single_pass=False)


@register(
    "q21_waiting_suppliers_onepass",
    """
    SELECT s_name, count(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    WHERE o_orderstatus = 'F'
      AND l1.l_returnflag = 'R'
      AND EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
        SELECT 1 FROM lineitem l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
          AND l3.l_returnflag = 'R'
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 25
    """,
    section="J3,A7,T1,W:analytic",
    note="Q21 rewritten as ONE lineitem scan: per-order supplier sets ride a "
    "window, the EXISTS pair becomes set-size predicates (other supplier "
    "exists <=> |suppliers| > 1; no other R supplier <=> |R suppliers| = 1). "
    "Same oracle as q21_waiting_suppliers — the rewrite is proven, not assumed",
)
def q21_waiting_suppliers_onepass(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q21(spark, sf_dir, single_pass=True)


def _q21(spark: SparkSession, sf_dir: str, single_pass: bool) -> DataFrame:
    supp, li, orders = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    if single_pass:
        # one scan: restrict to F-order lineitems (order-level predicate, so
        # per-order supplier sets are unchanged), then the two correlated
        # subqueries become per-order window set sizes
        w = Window.partitionBy("l_orderkey")
        base = li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        flagged = base.select(
            "l_orderkey",
            "l_suppkey",
            "l_returnflag",
            F.size(F.collect_set("l_suppkey").over(w)).alias("n_supp"),
            F.size(
                F.collect_set(
                    F.when(F.col("l_returnflag") == "R", F.col("l_suppkey"))
                ).over(w)
            ).alias("n_r_supp"),
        )
        waiting = flagged.filter(
            (F.col("l_returnflag") == "R")
            & (F.col("n_supp") > 1)
            & (F.col("n_r_supp") == 1)
        )
        return (
            waiting.join(supp, F.col("s_suppkey") == F.col("l_suppkey"))
            .groupBy("s_name")
            .agg(F.count(F.lit(1)).alias("numwait"))
            .orderBy(F.desc("numwait"), "s_name")
            .limit(25)
        )
    l1 = li.filter(F.col("l_returnflag") == "R").alias("l1")
    l2 = li.select("l_orderkey", "l_suppkey").alias("l2")
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select("l_orderkey", "l_suppkey")
        .alias("l3")
    )
    return (
        l1.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l1.l_orderkey") == F.col("o_orderkey"),
        )
        .join(
            l2,
            (F.col("l2.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l2.l_suppkey") != F.col("l1.l_suppkey")),
            "left_semi",
        )
        .join(
            l3,
            (F.col("l3.l_orderkey") == F.col("l1.l_orderkey"))
            & (F.col("l3.l_suppkey") != F.col("l1.l_suppkey")),
            "left_anti",
        )
        .join(supp, F.col("s_suppkey") == F.col("l1.l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(25)
    )
