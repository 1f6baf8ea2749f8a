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
from pyspark.sql.window import Window

from mapreduce_docker_spark.functions.rounding import dround
from mapreduce_docker_spark.functions.rounding import sql as rsql
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
    pin=(
        "tolerance: per-column approx_count_distinct vs the exact "
        "oracle-proven twin profile_orders_columns "
        "(tests/test_sketches.py)"
    ),
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


# ---------------------------------------------------------------------------
# Constraint checking: the Deequ-style data-quality gate
# ---------------------------------------------------------------------------


@register(
    "dq_constraint_checks",
    """
    WITH o AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             -- non-null rows minus distinct: orthogonal to pk_null below
             -- (count(*) minus distinct would re-count every NULL key)
             CAST(count(o_orderkey) - count(DISTINCT o_orderkey) AS BIGINT) AS pk_dup,
             -- PK completeness (r11): NULL primary keys are OUTSIDE the
             -- table contract every identity-keyed operator assumes
             -- (dedup survivor election, doc-keyed joins, per-doc scoring)
             -- — this gate is where an identityless row is caught
             CAST(count(*) - count(o_orderkey) AS BIGINT) AS pk_null,
             CAST(count(*) - count(o_custkey) AS BIGINT) AS null_cust,
             CAST(sum(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_price
      FROM orders
    ),
    l AS (
      SELECT CAST(sum(CASE WHEN l_quantity <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS nonpos_qty,
             CAST(sum(CASE WHEN l_discount < 0 OR l_discount > 1 THEN 1 ELSE 0 END) AS BIGINT) AS bad_discount
      FROM lineitem
    ),
    lo AS (
      SELECT CAST(count(*) AS BIGINT) AS orphans
      FROM lineitem li WHERE NOT EXISTS (
        SELECT 1 FROM orders o2 WHERE o2.o_orderkey = li.l_orderkey)
    ),
    cn AS (
      SELECT CAST(count(*) AS BIGINT) AS orphans
      FROM customer c WHERE NOT EXISTS (
        SELECT 1 FROM nation n WHERE n.n_nationkey = c.c_nationkey)
    ),
    d AS (
      SELECT CAST(count(*) - count(doc_id) AS BIGINT) AS pk_null,
             CAST(sum(CASE WHEN text IS NULL OR length(text) = 0 THEN 1 ELSE 0 END) AS BIGINT) AS empty_text,
             CAST(sum(CASE WHEN length(text) <> n_chars THEN 1 ELSE 0 END) AS BIGINT) AS n_chars_drift
      FROM documents
    )
    SELECT * FROM (
      SELECT 'orders' AS table_name, 'pk_unique_o_orderkey' AS check_name, pk_dup AS violations FROM o
      UNION ALL SELECT 'orders', 'not_null_o_orderkey', pk_null FROM o
      UNION ALL SELECT 'orders', 'not_null_o_custkey', null_cust FROM o
      UNION ALL SELECT 'orders', 'positive_o_totalprice', nonpos_price FROM o
      UNION ALL SELECT 'lineitem', 'positive_l_quantity', nonpos_qty FROM l
      UNION ALL SELECT 'lineitem', 'l_discount_in_unit_range', bad_discount FROM l
      UNION ALL SELECT 'lineitem', 'fk_l_orderkey_in_orders', orphans FROM lo
      UNION ALL SELECT 'customer', 'fk_c_nationkey_in_nation', orphans FROM cn
      UNION ALL SELECT 'documents', 'not_null_doc_id', pk_null FROM d
      UNION ALL SELECT 'documents', 'non_empty_text', empty_text FROM d
      UNION ALL SELECT 'documents', 'n_chars_matches_text', n_chars_drift FROM d
    )
    """,
    section="A7,J3,P5",
    note="Deequ-style constraint suite: PK uniqueness, not-null, value "
    "ranges, FK referential integrity (anti-join orphan counts), and a "
    "derived-column consistency check — ONE aggregation pass per table "
    "plus one key-hashed anti join per FK; all-integer output so the "
    "gate is drift-free by construction",
)
def dq_constraint_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over the star schema.

    The shape a training pipeline runs before ingesting a new drop: every
    in-table constraint family (uniqueness, completeness, range, derived-
    column consistency) folds into ONE conditional-aggregate scan per
    table — violations are sums, so partial aggregation makes the 100 TB
    cost one pass per table with bytes of shuffle. Referential integrity
    is a LEFT ANTI join per FK edge, hash-partitioned on the key (nation
    is bounded -> broadcast). Output is (table, check, violations BIGINT):
    integer-exact, no float canonicalization needed anywhere.
    """

    def _stack(table: str, agg_df: DataFrame, checks: list[tuple[str, str]]) -> DataFrame:
        return agg_df.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(table).alias("table_name"),
                            F.lit(name).alias("check_name"),
                            F.col(col).cast("long").alias("violations"),
                        )
                        for name, col in checks
                    ]
                )
            ).alias("c")
        ).select("c.*")

    orders = load_table(spark, sf_dir, "orders")
    o = orders.agg(
        # non-null minus distinct: orthogonal to pk_null (see oracle note)
        (F.count("o_orderkey") - F.count_distinct("o_orderkey")).alias("pk_dup"),
        # PK completeness (r11): identityless rows break every identity-
        # keyed operator downstream — caught HERE, not assumed away
        (F.count(F.lit(1)) - F.count("o_orderkey")).alias("pk_null"),
        (F.count(F.lit(1)) - F.count("o_custkey")).alias("null_cust"),
        F.sum(F.when(F.col("o_totalprice") <= 0, 1).otherwise(0)).alias("nonpos_price"),
    )
    lineitem = load_table(spark, sf_dir, "lineitem")
    li = lineitem.agg(
        F.sum(F.when(F.col("l_quantity") <= 0, 1).otherwise(0)).alias("nonpos_qty"),
        F.sum(
            F.when((F.col("l_discount") < 0) | (F.col("l_discount") > 1), 1).otherwise(0)
        ).alias("bad_discount"),
    )
    lo = (
        lineitem.select("l_orderkey")
        .join(orders.select("o_orderkey"), F.col("l_orderkey") == F.col("o_orderkey"), "left_anti")
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    cn = (
        load_table(spark, sf_dir, "customer")
        .select("c_nationkey")
        .join(
            F.broadcast(load_table(spark, sf_dir, "nation").select("n_nationkey")),
            F.col("c_nationkey") == F.col("n_nationkey"),
            "left_anti",
        )
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    docs = load_table(spark, sf_dir, "documents").agg(
        (F.count(F.lit(1)) - F.count("doc_id")).alias("pk_null"),
        F.sum(
            F.when(F.col("text").isNull() | (F.length("text") == 0), 1).otherwise(0)
        ).alias("empty_text"),
        F.sum(F.when(F.length("text") != F.col("n_chars"), 1).otherwise(0)).alias(
            "n_chars_drift"
        ),
    )
    parts = [
        _stack(
            "orders",
            o,
            [
                ("pk_unique_o_orderkey", "pk_dup"),
                ("not_null_o_orderkey", "pk_null"),
                ("not_null_o_custkey", "null_cust"),
                ("positive_o_totalprice", "nonpos_price"),
            ],
        ),
        _stack(
            "lineitem",
            li,
            [
                ("positive_l_quantity", "nonpos_qty"),
                ("l_discount_in_unit_range", "bad_discount"),
            ],
        ),
        _stack("lineitem", lo, [("fk_l_orderkey_in_orders", "orphans")]),
        _stack("customer", cn, [("fk_c_nationkey_in_nation", "orphans")]),
        _stack(
            "documents",
            docs,
            [
                ("not_null_doc_id", "pk_null"),
                ("non_empty_text", "empty_text"),
                ("n_chars_matches_text", "n_chars_drift"),
            ],
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# Equi-width histogram: the profiling visualization primitive
# ---------------------------------------------------------------------------

HIST_BUCKETS = 10


@register(
    "agg_histogram_totalprice",
    f"""
    -- finite-measure law applied to histograms (r12 band-4 differential
    -- find, seed 444): a NaN value bucketed to 0 on Spark (floor(NaN)
    -- returns LONG 0) and to {HIST_BUCKETS - 1} on DuckDB (NaN is GREATEST, so
    -- least() keeps the cap), and a nonfinite min/max poisons every
    -- bucket bound. A histogram counts VALUES over the FINITE
    -- distribution: NaN/Inf AND NULL are excluded at ingress on both
    -- engines — the legacy behavior silently dropped a NULL price into
    -- the cap bucket, an accident of least()'s NULL-skipping that both
    -- engines happened to share (measured, tests/test_crafted_truth43).
    WITH o AS (
      SELECT o_totalprice FROM orders
      WHERE isfinite(o_totalprice)
    ),
    s AS (
      SELECT min(o_totalprice) AS mn, max(o_totalprice) AS mx FROM o
    ),
    b AS (
      SELECT CAST(CASE WHEN s.mx = s.mn THEN 0
                       ELSE least(floor((o_totalprice - s.mn) / (s.mx - s.mn) * {HIST_BUCKETS}.0),
                                  {HIST_BUCKETS - 1}) END AS BIGINT) AS bucket_idx,
             s.mn, s.mx
      FROM o CROSS JOIN s
    )
    SELECT bucket_idx,
           {rsql(f"any_value(mn) + bucket_idx * (any_value(mx) - any_value(mn)) / {HIST_BUCKETS}.0", 4)} AS lo,
           {rsql(f"any_value(mn) + (bucket_idx + 1) * (any_value(mx) - any_value(mn)) / {HIST_BUCKETS}.0", 4)} AS hi,
           CAST(count(*) AS BIGINT) AS n_orders
    FROM b GROUP BY bucket_idx
    """,
    section="A7,U4",
    note=f"equi-width {HIST_BUCKETS}-bucket histogram of o_totalprice: "
    "min/max from one aggregation broadcast as a 1-row relation (never a "
    "driver round-trip), bucket index by pure IEEE arithmetic identical "
    "on both engines (max pinned into the top bucket; min==max guarded to "
    "one point bucket — unguarded it throws DIVIDE_BY_ZERO under ANSI, r8 "
    "crafted-truth find), counts partial-aggregated — two scans total, "
    "shuffle is bytes",
)
def agg_histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    from mapreduce_docker_spark.functions.rounding import dround

    orders = load_table(spark, sf_dir, "orders")
    # finite-measure ingress (r12, seed-444 find): NaN bucketed to 0 here
    # (Spark's LONG floor(NaN) is 0) and to the cap on DuckDB (NaN-greatest
    # least()). A histogram counts VALUES: NULL is excluded with the
    # non-finite — least()'s NULL-skipping had been silently dropping a
    # NULL price into the cap bucket on BOTH engines (measured).
    c = F.col("o_totalprice")
    orders = orders.filter(~F.isnan(c) & (F.abs(c) < F.lit(float("inf"))))
    s = orders.agg(
        F.min("o_totalprice").alias("mn"), F.max("o_totalprice").alias("mx")
    )
    # guard the min==max degenerate EXPLICITLY: under ANSI mode (Spark 4
    # default, on in this session) the unguarded (x-mn)/(mx-mn) THROWS
    # DIVIDE_BY_ZERO on a constant column — caught by the r8 crafted-truth
    # sweep (tests/test_crafted_truth16.py); a constant slice is routine at
    # scale, so the histogram collapses to one point bucket instead
    idx = F.when(F.col("mx") == F.col("mn"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("mn"))
                / (F.col("mx") - F.col("mn"))
                * F.lit(float(HIST_BUCKETS))
            ),
            F.lit(HIST_BUCKETS - 1),
        )
    ).cast("long")
    width = (F.any_value("mx") - F.any_value("mn")) / F.lit(float(HIST_BUCKETS))
    return (
        orders.crossJoin(F.broadcast(s))
        .select(idx.alias("bucket_idx"), "mn", "mx")
        .groupBy("bucket_idx")
        .agg(
            dround(F.any_value("mn") + F.col("bucket_idx") * width, 4).alias("lo"),
            dround(F.any_value("mn") + (F.col("bucket_idx") + 1) * width, 4).alias("hi"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


SKEW_TOP_K = 5


@register(
    "dq_key_skew_report",
    f"""
    WITH u AS (
      SELECT 'orders.o_custkey' AS key_col, o_custkey AS key, count(*) AS n
      FROM orders GROUP BY o_custkey
      UNION ALL
      SELECT 'lineitem.l_partkey', l_partkey, count(*) FROM lineitem GROUP BY l_partkey
      UNION ALL
      SELECT 'events.user_id', user_id, count(*) FROM events GROUP BY user_id
    ),
    t AS (
      SELECT key_col, key, CAST(n AS BIGINT) AS n,
             sum(n) OVER (PARTITION BY key_col) AS total,
             row_number() OVER (
               PARTITION BY key_col ORDER BY n DESC, key ASC
             ) AS rnk
      FROM u
    )
    SELECT key_col, CAST(rnk AS INTEGER) AS rnk, key, n,
           {rsql("CAST(n AS DOUBLE) / total", 6)} AS share
    FROM t WHERE rnk <= {SKEW_TOP_K}
    """,
    section="A7,ST4",
    note=(
        "join-key skew diagnostic: the top-5 heaviest keys and their row "
        "share for each hot join column — the measurement that decides "
        "whether a key needs salting (operators/skew.py) or AQE skew-join "
        "handles it. Per-column grouped counts are map-side combinable; "
        "the top-k per column is a WindowGroupLimit (rank pushdown), never "
        "a full sort; deterministic key-asc tiebreak"
    ),
)
def dq_key_skew_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    parts = []
    for label, table, col in (
        ("orders.o_custkey", "orders", "o_custkey"),
        ("lineitem.l_partkey", "lineitem", "l_partkey"),
        ("events.user_id", "events", "user_id"),
    ):
        parts.append(
            load_table(spark, sf_dir, table)
            .groupBy(F.col(col).alias("key"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.lit(label).alias("key_col"), "key", "n")
        )
    u = parts[0].unionByName(parts[1]).unionByName(parts[2])
    w = Window.partitionBy("key_col")
    t = u.select(
        "key_col",
        "key",
        "n",
        F.sum("n").over(w).alias("total"),
        F.row_number()
        .over(
            # NULLS LAST explicitly: Spark ASC defaults to NULLS FIRST,
            # DuckDB to NULLS LAST — a NULL join key would rank above
            # every real key on one engine only (r10 degenerate sweep)
            Window.partitionBy("key_col").orderBy(
                F.desc("n"), F.asc_nulls_last("key")
            )
        )
        .alias("rnk"),
    )
    return t.filter(F.col("rnk") <= SKEW_TOP_K).select(
        "key_col",
        F.col("rnk").cast("int").alias("rnk"),
        "key",
        "n",
        dround(F.col("n").cast("double") / F.col("total"), 6).alias("share"),
    )
