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
