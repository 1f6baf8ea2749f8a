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
