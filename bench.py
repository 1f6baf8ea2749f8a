"""Benchmark harness: headline queries at $SPARK_GRAFT_SF_DIR on local[N].

Mirrors the reference's benchmark shape (single wall-clock number around the
job, reference coordinator.py:118-137 / README.md:178-222) but over the whole
engine surface: one timed run per headline query, full execution forced with
the ``noop`` sink (no driver-side collect — the 100 TB design point forbids
funneling results through the driver, unlike the reference's Counter merge at
coordinator.py:71-80).

Prints exactly ONE JSON line:
    {"metric": "...", "value": <total sec>, "unit": "sec",
     "queries": {name: sec, ...}, "sf": <sf>}
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from mapreduce_docker_spark.registry import all_specs  # noqa: E402
from mapreduce_docker_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# One headline query per major subsystem (SURVEY.md §2 tags in registry).
HEADLINE = [
    "wordcount",                    # the reference's entire production query
    "q1_pricing_summary",           # wide scan + grouped agg
    "q3_shipping_priority",         # 3-way join + agg + top-k
    "q5_local_supplier",            # 6-way join with broadcast dims
    "agg_rollup_region_nation",     # hierarchical rollup
    "window_running_spend",         # window frame agg
    "events_session_5m",            # session windows over events
    "json_event_props",             # JSON extraction
    "text_tfidf_top_term",          # text analysis: TF-IDF
    "dedup_minhash_survivors",      # MinHash-LSH near-dedup
    "dedup_exact_survivors",        # exact content-hash dedup
    "sim_cosine_topk",              # embedding similarity top-k
    "sim_ann_srp",                  # LSH-bucketed ANN + exact rerank
    "asof_purchase_prior_view",     # as-of join (union + window)
    "range_join_events_in_order_window",  # banded range join
    "udf_applyinpandas_zscore",     # Arrow grouped-map UDF
]


def main() -> None:
    specs = all_specs()
    spark = get_spark(app_name="bench")
    try:
        # warm-up: JVM + whole-stage-codegen caches. Running each headline
        # plan once at sf0.001 compiles the same generated code the sf0.1
        # run needs (codegen cache is keyed on source text, which depends on
        # the plan shape, not the data), so the timings below measure
        # execution, not JIT.
        warm_dir = "/root/testdata/sf0.001"
        if os.path.isdir(warm_dir) and os.path.realpath(warm_dir) != os.path.realpath(SF_DIR):
            for name in HEADLINE:
                specs[name].fn(spark, warm_dir).write.format("noop").mode("overwrite").save()
        else:
            spark.range(1_000_000).selectExpr("sum(id)").collect()

        timings: dict[str, float] = {}
        for name in HEADLINE:
            df = specs[name].fn(spark, SF_DIR)
            t0 = time.perf_counter()
            df.write.format("noop").mode("overwrite").save()
            timings[name] = round(time.perf_counter() - t0, 3)

        sf = os.path.basename(SF_DIR.rstrip("/")).removeprefix("sf")
        try:
            sf_val: float | str = float(sf)
        except ValueError:
            sf_val = sf
        print(
            json.dumps(
                {
                    "metric": "headline_suite_wall_clock",
                    "value": round(sum(timings.values()), 3),
                    "unit": "sec",
                    "queries": timings,
                    "sf": sf_val,
                }
            )
        )
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
