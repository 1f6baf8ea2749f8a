"""Skew mitigation: salting for hot keys (SURVEY §7 hard part 6).

AQE's skew-join splitting (on in session.py) handles most skew at runtime by
splitting oversized partitions. Salting is the complementary *plan-level*
technique for the cases AQE cannot fix:

* **aggregation skew** — one reduce key so hot its partial-aggregate state
  or final-aggregate partition overwhelms an executor. Salting splits the
  key into ``n_salt`` sub-keys for a first aggregation round, then combines
  sub-results in a second, cheap round (the hot key now contributes
  ``n_salt`` rows, not billions).
* **join skew** — a hot join key concentrates one side; salting the big
  side and replicating the small side ``n_salt``-fold spreads the hot key
  over ``n_salt`` tasks.

Both transforms are RESULT-PRESERVING for any salt assignment, which is why
the salted aggregation below can still carry a plain-GROUP-BY DuckDB oracle:
determinism of the answer does not depend on the salt. Salt is derived from
a deterministic hash of a carried column (never ``rand()``) so retried tasks
recompute identical rows — a correctness requirement under speculative
execution, not a style choice.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from mapreduce_docker_spark.functions.rounding import dround
from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table


def salt_column(unique_col: Column, n_salt: int) -> Column:
    """Deterministic salt in [0, n_salt) from a (unique-ish) column."""
    return F.pmod(F.xxhash64(unique_col), F.lit(n_salt))


def salted_aggregate(
    df: DataFrame,
    keys: Sequence[str],
    aggs: dict[str, tuple[str, str]],
    salt_from: str,
    n_salt: int = 16,
) -> DataFrame:
    """Two-round salted aggregation.

    ``aggs`` maps output column -> (input column, op) with op in
    {sum, count, min, max}; these are the re-aggregatable ops (avg must be
    decomposed into sum+count by the caller). ``("*", "count")`` counts
    ROWS (SQL count(*)); ``(col, "count")`` counts non-NULL values of that
    column (SQL count(col)) — the two diverge the moment the column is
    nullable, so pick deliberately. Round 1 groups by
    (keys + salt) — the hot key's billions of rows reduce to ``n_salt``
    partials; round 2 combines partials per key.
    """
    combine = {"sum": "sum", "count": "sum", "min": "min", "max": "max"}
    for op in (op for _, op in aggs.values()):
        if op not in combine:
            raise ValueError(f"non-re-aggregatable op {op!r}")

    def _expr(col: str, op: str, out: str):
        if op == "count" and col == "*":
            return F.count(F.lit(1)).alias(out)
        return getattr(F, op)(col).alias(out)

    salted = df.withColumn("_salt", salt_column(F.col(salt_from), n_salt))
    partial = salted.groupBy(*keys, "_salt").agg(
        *[_expr(col, op, out) for out, (col, op) in aggs.items()]
    )
    return partial.groupBy(*keys).agg(
        *[
            getattr(F, combine[op])(out).alias(out)
            for out, (_, op) in aggs.items()
        ]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt_from: str,
    n_salt: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the big (skewed) side salted, small side replicated.

    The small side is exploded ``n_salt``-fold — use only when it is too big
    to broadcast but n_salt copies still fit the shuffle; otherwise
    ``F.broadcast`` is strictly better.
    """
    if how not in ("inner", "left"):
        # right/full would duplicate unmatched small-side rows n_salt times
        raise ValueError(f"salted_join supports inner/left, not {how!r}")
    b = big.withColumn("_salt", salt_column(F.col(salt_from), n_salt))
    s = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(n_salt - 1)).cast("array<bigint>"))
    )
    out = b.join(s, [on, "_salt"], how)
    return out.drop("_salt")


@register(
    "skew_salted_user_value_sums",
    """
    SELECT user_id,
           CAST(count(*) AS BIGINT) AS n_events,
           floor(sum(value) * 100.0 + 0.5) / 100.0 AS total_value
    FROM events
    GROUP BY user_id
    """,
    section="A7,ST4",
    note="salted two-round aggregation (16 salts from xxhash64(event_id)); "
    "result identical to plain GROUP BY — the oracle proves salt-invariance. "
    "n_events counts ROWS (count(*), matching the oracle): the r9 crafted "
    "truth showed count(event_id) would silently skip NULL-keyed rows — a "
    "divergence the fixture (non-null ids) could never surface",
)
def skew_salted_user_value_sums(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    agg = salted_aggregate(
        ev,
        keys=["user_id"],
        aggs={"n_events": ("*", "count"), "_raw_total": ("value", "sum")},
        salt_from="event_id",
        n_salt=16,
    )
    return agg.select(
        "user_id",
        "n_events",
        dround(F.col("_raw_total"), 2).alias("total_value"),
    )


@register(
    "join_aqe_skew_enriched_events",
    """
    SELECT CASE WHEN e.user_id % 3 = 0 THEN 0 ELSE e.user_id END AS skew_key,
           e.event_id, c.c_mktsegment, e.value
    FROM events e
    JOIN customer c
      ON c.c_custkey = CASE WHEN e.user_id % 3 = 0 THEN 0 ELSE e.user_id END
    """,
    section="J1,ST4",
    note="AQE skew-join demonstration (VERDICT r5 #5, pairs with "
    "dq_key_skew_report): user_id % 3 = 0 collapses a third of all events "
    "onto one hot join key, and the customer-dim join is hinted "
    "SHUFFLE_MERGE so the fact side shuffles on the skewed key instead of "
    "broadcasting around it. Both join children are bare scans, which is "
    "the SMJ(Sort(Shuffle), Sort(Shuffle)) shape AQE's OptimizeSkewedJoin "
    "pattern-matches — tests/test_skew.py forces the split thresholds down "
    "and asserts THIS query's SMJ goes skew=true, and the oracle proves "
    "the split never changes the answer. Measured caveat the demo exists "
    "to document: a dim carrying its final aggregate directly above its "
    "own shuffle (e.g. a per-key-totals subquery) does NOT match the "
    "pattern, so that shape must fall back to salted_join/salted_aggregate "
    "— the complementary mitigation this module implements",
)
def join_aqe_skew_enriched_events(spark, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    cust = load_table(spark, sf_dir, "customer").select(
        "c_custkey", "c_mktsegment"
    )
    fact = ev.select(
        F.when(F.col("user_id") % 3 == 0, F.lit(0).cast("long"))
        .otherwise(F.col("user_id"))
        .alias("skew_key"),
        "event_id",
        "value",
    )
    # merge hint: broadcast would dodge the skew (and is the right call for
    # a genuinely small dim); the demo's point is the shuffled-join path a
    # big-dim join is forced onto, where AQE's runtime skew split is the
    # defense. No float arithmetic anywhere -> bit-exact oracle.
    return fact.join(
        cust.hint("merge"), fact["skew_key"] == cust["c_custkey"]
    ).select("skew_key", "event_id", "c_mktsegment", "value")
