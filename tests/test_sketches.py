"""Sketch aggregates: approximate answers stay within tolerance of exact."""

from __future__ import annotations

from mapreduce_docker_spark.registry import all_specs

SF = "/root/testdata/sf0.01"


def test_approx_percentile_tracks_exact(spark):
    rows = all_specs()["agg_approx_percentiles"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        exact = r["exact_median"]
        # percentile_approx at accuracy 10000 lands on a nearby actual value
        assert abs(r["approx_median"] - exact) <= 0.02 * abs(exact) + 1, r


def test_approx_count_distinct_tracks_exact(spark):
    r = all_specs()["agg_approx_distinct_users"].fn(spark, SF).collect()[0]
    assert abs(r["approx_users"] - r["exact_users"]) <= 0.05 * r["exact_users"] + 2, r


def test_hll_sketch_union_tracks_exact(spark):
    """Merging per-segment HLL sketches must estimate the GLOBAL distinct
    count (union semantics, not a sum of per-segment counts)."""
    specs = all_specs()
    merged = specs["agg_hll_sketch_union_users"].fn(spark, SF).collect()[0]
    exact = specs["agg_approx_distinct_users"].fn(spark, SF).collect()[0]["exact_users"]
    assert merged["n_sketches"] >= 2, merged
    assert abs(merged["approx_users_merged"] - exact) <= 0.05 * exact + 2, (merged, exact)


def test_cms_estimate_dominates_truth_for_every_word(spark):
    """CMS one-sided error law: est >= exact count for EVERY key (not just
    the top-20 the query returns) — min-over-rows can only overcount."""
    from pyspark.sql import functions as F

    from mapreduce_docker_spark.operators.textanalysis_queries import _cms_buckets

    hb = _cms_buckets(spark, SF)
    counters = hb.groupBy("j", "bucket").agg(F.sum("cnt").alias("bucket_cnt"))
    est = (
        hb.join(counters, ["j", "bucket"])
        .groupBy("word", "cnt")
        .agg(F.min("bucket_cnt").alias("est"))
    )
    assert est.filter(F.col("est") < F.col("cnt")).count() == 0
    assert est.count() > 20  # the law held over more than the query's top-k


def test_cms_counters_merge_cellwise(spark):
    """Mergeability — the 100 TB contract: sketching two disjoint halves and
    summing cells must equal sketching the whole corpus."""
    from pyspark.sql import functions as F

    from mapreduce_docker_spark.functions import texthash as th
    from mapreduce_docker_spark.functions.tokenize import tokens
    from mapreduce_docker_spark.operators.textanalysis_queries import (
        CMS_WIDTH,
        _CMS_COEFS,
    )
    from mapreduce_docker_spark.sources.catalog import load_table

    def sketch(df):
        wc = (
            df.select(F.explode(tokens("text")).alias("word"))
            .groupBy("word")
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        h = th.shingle_hash(F.col("word"))
        return (
            wc.select(
                "cnt",
                F.posexplode(
                    F.array(
                        *[
                            ((F.lit(a) * h + F.lit(b)) % F.lit(th.MINHASH_P))
                            % F.lit(CMS_WIDTH)
                            for a, b in _CMS_COEFS
                        ]
                    )
                ).alias("j", "bucket"),
            )
            .groupBy("j", "bucket")
            .agg(F.sum("cnt").alias("bucket_cnt"))
        )

    docs = load_table(spark, SF, "documents")
    whole = {(r["j"], r["bucket"]): r["bucket_cnt"] for r in sketch(docs).collect()}
    even = sketch(docs.filter(F.col("doc_id") % 2 == 0))
    odd = sketch(docs.filter(F.col("doc_id") % 2 == 1))
    merged: dict = {}
    for r in even.collect() + odd.collect():
        k = (r["j"], r["bucket"])
        merged[k] = merged.get(k, 0) + r["bucket_cnt"]
    assert merged == whole
