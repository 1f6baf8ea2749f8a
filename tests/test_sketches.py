"""Sketch aggregates: approximate answers stay within tolerance of exact."""

from __future__ import annotations

from pyspark.sql import functions as F

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


def test_theta_set_operations_match_exact(spark):
    """Theta sketch intersection/union/difference estimates must track the
    exact set sizes within tolerance at fixture cardinality (theta default
    lgK=12 -> exact below ~4k distinct items, so equality is expected
    here; the assertion still allows 5% for larger fixtures)."""
    from mapreduce_docker_spark.operators.relational_queries import (
        sketch_theta_type_overlap,
    )
    from mapreduce_docker_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    users = {
        t: {r["user_id"] for r in ev.filter(F.col("event_type") == t).select("user_id").distinct().collect()}
        for t in [r["event_type"] for r in ev.select("event_type").distinct().collect()]
    }
    got = sketch_theta_type_overlap(spark, sf).collect()
    assert got, "no type pairs"
    for r in got:
        a, b = users[r["type_a"]], users[r["type_b"]]
        for est, exact in (
            (r["est_intersection"], len(a & b)),
            (r["est_union"], len(a | b)),
            (r["est_a_minus_b"], len(a - b)),
        ):
            assert abs(est - exact) <= max(1, 0.05 * max(exact, 1)), (r, exact)


def test_kll_quantiles_track_exact_and_merge(spark):
    """KLL estimates stay near exact percentiles, and the merge law holds:
    merging per-day sketches gives the same quantiles as one whole-table
    sketch (KLL is deterministic given identical insert partitioning, so
    merged-vs-whole is compared within rank tolerance, not bitwise)."""
    from mapreduce_docker_spark.operators.relational_queries import (
        sketch_kll_value_quantiles,
    )
    from mapreduce_docker_spark.sources.catalog import load_table

    sf = "/root/testdata/sf0.001"
    ev = load_table(spark, sf, "events")
    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in ev.groupBy("event_type")
        .agg(
            F.percentile("value", 0.5).alias("p50"),
            F.percentile("value", 0.9).alias("p90"),
        )
        .collect()
    }
    spread = {
        r["event_type"]: (r["mx"] - r["mn"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    for r in sketch_kll_value_quantiles(spark, sf).collect():
        p50x, p90x = exact[r["event_type"]]
        tol = 0.05 * spread[r["event_type"]]  # KLL error is in RANK space;
        # translate to value space via the per-type range
        assert abs(r["p50_est"] - p50x) <= tol, (r, p50x)
        assert abs(r["p90_est"] - p90x) <= tol, (r, p90x)

    # merge law: sketches of two disjoint halves, merged with the binary
    # kll_sketch_merge_double, answer like the whole-table sketch
    whole = ev.agg(
        F.kll_sketch_get_quantile_double(
            F.kll_sketch_agg_double("value"), F.lit(0.5)
        ).alias("q")
    ).first()["q"]
    mid = ev.agg(F.percentile(F.unix_micros("ts"), 0.5)).first()[0]
    halves = ev.select(
        (F.unix_micros("ts") <= F.lit(mid)).alias("h"), "value"
    ).groupBy("h").agg(F.kll_sketch_agg_double("value").alias("sk"))
    a, b = halves.alias("a"), halves.alias("b")
    merged = (
        a.join(b, F.col("a.h") & ~F.col("b.h"))
        .select(
            F.kll_sketch_get_quantile_double(
                F.kll_sketch_merge_double(F.col("a.sk"), F.col("b.sk")),
                F.lit(0.5),
            ).alias("q")
        )
        .first()["q"]
    )
    glob_spread = ev.agg(F.max("value") - F.min("value")).first()[0]
    assert abs(whole - merged) <= 0.05 * glob_spread, (whole, merged)
