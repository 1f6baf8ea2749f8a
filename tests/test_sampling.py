"""Seeded sampling: deterministic per engine, statistically sane."""

from __future__ import annotations

from mapreduce_docker_spark.sources.catalog import load_table

SF = "/root/testdata/sf0.01"


def test_seeded_sample_is_reproducible_and_unbiased(spark):
    ev = load_table(spark, SF, "events")
    n = ev.count()
    a = ev.sample(fraction=0.1, seed=42)
    b = ev.sample(fraction=0.1, seed=42)
    ids_a = {r["event_id"] for r in a.select("event_id").collect()}
    ids_b = {r["event_id"] for r in b.select("event_id").collect()}
    assert ids_a == ids_b, "same seed must give the same sample"
    # Bernoulli(0.1): expect ~n/10 within 4 sigma
    import math

    mu, sigma = 0.1 * n, math.sqrt(n * 0.1 * 0.9)
    assert abs(len(ids_a) - mu) < 4 * sigma
    other = {r["event_id"] for r in ev.sample(fraction=0.1, seed=7).select("event_id").collect()}
    assert ids_a != other, "different seeds should differ"


def test_stratified_sample_by_respects_fractions(spark):
    ev = load_table(spark, SF, "events")
    fracs = {"click": 0.5, "purchase": 0.05}
    samp = ev.sampleBy("event_type", fractions=fracs, seed=42)
    got = {r["event_type"] for r in samp.select("event_type").distinct().collect()}
    assert got <= set(fracs), "types with no fraction must be excluded"
    counts = {
        r["event_type"]: r["count"]
        for r in samp.groupBy("event_type").count().collect()
    }
    full = {
        r["event_type"]: r["count"]
        for r in ev.groupBy("event_type").count().collect()
    }
    assert counts["click"] > counts.get("purchase", 0)
    assert 0.3 * full["click"] < counts["click"] < 0.7 * full["click"]
