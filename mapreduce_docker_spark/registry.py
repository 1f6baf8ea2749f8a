"""Query registry: the driver contract's single source of truth.

Every implemented operator from SURVEY.md §2 registers here as a
:class:`QuerySpec` — a named callable ``(spark, sf_dir) -> DataFrame`` plus,
where the semantics are SQL-expressible, an equivalent ANSI-SQL string the
DuckDB oracle can run on the same parquet fixtures. ``__spark_entry__.py``
just re-exports :func:`queries` / :func:`oracle_sql`.

Discipline (driver compare is column-name + value-hash based):
* every computed column is aliased identically in the Spark plan and the SQL;
* float aggregates are rounded identically on both sides;
* integer sums are BIGINT on both sides (DuckDB SUM(int) yields HUGEINT —
  always cast in the oracle);
* the oracle's ``events`` view keeps ns timestamps — oracle SQL must cast
  ``ts::TIMESTAMP`` to match the engine's µs normalization.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check
    section: str  # SURVEY.md §2 tag, e.g. "A1-A2", "U2"
    note: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, sql: str | None, section: str, note: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, section=section, note=note)
        return fn

    return deco


# Modules skipped by _load_all because a genuinely-optional third-party
# dependency (pandas/pyarrow) was absent — inspect this instead of guessing
# why a query family is missing from queries().
SKIPPED_MODULES: dict[str, str] = {}


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import mapreduce_docker_spark.operators.wordcount_queries  # noqa: F401

    for mod in (
        "relational",
        "tpch",
        "textanalysis",
        "dedup",
        "similarity",
        "multimodal",
        "asof",
        "udf",
        "profile",
    ):
        fq = f"mapreduce_docker_spark.operators.{mod}_queries"
        try:
            __import__(fq)
        except ImportError as e:
            # only an absent THIRD-PARTY dep is a legitimate skip; a broken
            # import of our own code must fail loudly, not silently drop a
            # whole query family from the driver contract
            if (e.name or "").startswith("mapreduce_docker_spark"):
                raise
            SKIPPED_MODULES[fq] = f"{e.name}: {e}"
    import mapreduce_docker_spark.operators.skew  # noqa: F401

    try:
        import mapreduce_docker_spark.streaming.window_queries  # noqa: F401
    except ImportError as e:
        if (e.name or "").startswith("mapreduce_docker_spark"):
            raise
        SKIPPED_MODULES["mapreduce_docker_spark.streaming.window_queries"] = str(e)


# The driver verifies the FIRST 50 entries of queries() in iteration order
# against the DuckDB oracle; round 1 spent the whole window on wordcount +
# relational and left dedup/similarity/text/multimodal/udf/streaming with no
# driver verdict. This window hand-picks 50 queries so every SURVEY §2
# family lands at least one oracle-carrying entry inside the checked prefix;
# everything else follows in registration order. Round 2 swaps six slots
# that re-verified round-1-green queries for the new round-2 shapes
# (decorrelated TPC-H, one-pass Q21, multires rollup, VARIANT), keeping
# wordcount/q1/q5 + one join per type as regression canaries.
_PRIORITY_WINDOW = (
    # P1-P3 / A1-A5 / T1 (wordcount core)
    "wordcount",
    "q2_min_cost_supplier",
    "q21_waiting_suppliers_onepass",
    # A7 / J1 / J2 / P5 canaries (TPC-H shapes, green in round 1)
    "q1_pricing_summary",
    "q5_local_supplier",
    "q13_customer_distribution",
    # J1-J4 joins
    "join_semi_urgent_customers",
    "join_theta_acctbal_band",
    "q17_small_quantity_revenue",
    # A4/A7 aggregates (driver-unverified in round 1)
    "agg_percentiles_by_segment",
    "agg_pivot_status_by_segment",
    "agg_stats_quantity_price",
    "agg_collect_order_keys",
    "agg_approx_distinct_users",
    "skew_salted_user_value_sums",
    # windows
    "window_event_gaps",
    "window_distribution_ranks",
    "window_running_spend",
    # scalar function families
    "scalar_datetime_events",
    "scalar_interval_orders",
    "json_event_props",
    "map_hof_event_props",
    "json_variant_events",
    "array_hof_embeddings",
    # SQL-string interface + sampling
    "sql_interface_revenue_by_nation",
    "events_multires_rollup",
    # U4 text analysis
    "text_token_stats",
    "text_tfidf_top_term",
    "text_langid_nb",
    "text_pii_scrub",
    # U1/U2 dedup
    "dedup_exact_groups",
    "dedup_exact_survivors",
    "dedup_minhash_pairs",
    "dedup_minhash_survivors",
    "dedup_simhash",
    "dedup_embedding_pairs",
    "sketch_cms_heavy_hitters",
    # U3 similarity
    "sim_cosine_topk",
    "sim_ann_srp",
    "sim_ann_ivf",
    # U5 multimodal
    "multimodal_meta_by_source",
    "multimodal_features",
    # J4 as-of / range
    "asof_purchase_prior_view",
    "range_join_events_in_order_window",
    # U6 UDF surface
    "udf_pandas_saturation",
    "udf_applyinpandas_zscore",
    "udf_udtf_bigrams",
    "udf_cogroup_user_conversion",
    # ST5/ST7 event-time windows
    "events_tumbling_10m",
    "events_session_5m",
)


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    missing = [n for n in _PRIORITY_WINDOW if n not in _REGISTRY]
    if missing:
        raise RuntimeError(f"priority window references unknown queries: {missing}")
    ordered = {n: _REGISTRY[n] for n in _PRIORITY_WINDOW}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in all_specs().items() if spec.sql is not None}
