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


def test_hash_stratified_sample_rates_and_stability(spark):
    """The deterministic key-hash sample must hit its per-stratum rates
    within binomial tolerance, be bit-stable across runs AND partitionings
    (membership depends only on the key), and carry the advertised rate."""
    import math

    from mapreduce_docker_spark.registry import all_specs

    fn = all_specs()["sample_stratified_hash"].fn
    rows = fn(spark, SF).collect()
    got = {(r["event_id"], r["event_type"], r["rate_pct"]) for r in rows}
    assert got == {
        (r["event_id"], r["event_type"], r["rate_pct"]) for r in fn(spark, SF).collect()
    }
    full = {
        r["event_type"]: r["count"]
        for r in load_table(spark, SF, "events").groupBy("event_type").count().collect()
    }
    by_type: dict[str, int] = {}
    for _, t, rate in got:
        by_type[t] = by_type.get(t, 0) + 1
        assert rate == (50 if t in ("error", "purchase") else 10)
    for t, n_total in full.items():
        p = 0.5 if t in ("error", "purchase") else 0.1
        mu, sigma = p * n_total, math.sqrt(n_total * p * (1 - p))
        assert abs(by_type[t] - mu) < 4 * sigma, (t, by_type[t], mu)


def test_emb_quantize_error_bound(spark):
    """Quantization must certify its own error bound: every reported
    max_abs_err is <= scale/2 (round-half-up can be off by at most half a
    quantization step) and q values fit int8 ([-127, 127])."""
    from mapreduce_docker_spark.registry import all_specs

    rows = all_specs()["emb_quantize_int8"].fn(spark, SF).collect()
    assert rows
    for r in rows:
        assert r["max_abs_err"] <= r["scale"] / 2 + 1e-9, r
        qs = [int(x) for x in r["q_str"].split("|")]
        assert all(-127 <= q <= 127 for q in qs), r["vec_id"]
        assert (r["n_saturated"] > 0) == any(abs(q) == 127 for q in qs)


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
