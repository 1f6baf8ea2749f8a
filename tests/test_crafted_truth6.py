"""Sixth batch of hand-computed truths: source-vs-corpus KL divergence,
the Zipf OLS fit on an exact power law, and the attribution-window
funnel's boundary behavior."""

from __future__ import annotations

import datetime as dt
import math

from mapreduce_docker_spark.operators.funnel_queries import (
    events_funnel_within_window,
)
from mapreduce_docker_spark.operators.relational_queries import text_zipf_slope
from mapreduce_docker_spark.operators.textanalysis_queries import (
    text_source_kl_divergence,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_source_kl_hand_computed(spark, tmp_path):
    # source a: {x:3, y:1} (p = .75/.25); source b mirrors (q_corpus = .5/.5)
    docs = [
        (1, "a", "x x x y"),
        (2, "b", "x y y y"),
    ]
    spark.createDataFrame(docs, "doc_id long, source string, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["source"]: r for r in text_source_kl_divergence(spark, str(tmp_path)).collect()}
    kl = 0.75 * math.log(0.75 / 0.5) + 0.25 * math.log(0.25 / 0.5)
    for s in ("a", "b"):
        assert out[s]["n_tokens"] == 4
        assert abs(out[s]["kl_vs_corpus"] - round(kl, 6)) < 1e-9


def test_zipf_slope_exact_power_law(spark, tmp_path):
    # two words with counts 4 and 2: ln c vs ln r is exactly collinear with
    # slope -1 (c = 4 * r^-1), intercept ln 4, r2 = 1
    docs = [(1, "aa aa aa aa bb bb")]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = text_zipf_slope(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_words"] == 2
    assert r["zipf_slope"] == -1.0
    assert abs(r["zipf_intercept"] - round(math.log(4.0), 6)) < 1e-9
    assert r["r2"] == 1.0


def test_funnel_within_window_boundary(spark, tmp_path):
    h = 3_600
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, user, kind, secs):
        return (eid, base + dt.timedelta(seconds=secs), user, kind, 1.0, "{}")

    rows = [
        # user 1: click at EXACTLY +3h (inclusive bound), purchase after ->
        # clicked_within counts, purchase at +4h is outside -> not counted
        ev(1, 1, "view", 0),
        ev(2, 1, "click", 3 * h),
        ev(3, 1, "purchase", 4 * h),
        # user 2: click one second past the window -> not clicked_within
        ev(4, 2, "view", 0),
        ev(5, 2, "click", 3 * h + 1),
        # user 3: full funnel inside the window
        ev(6, 3, "view", 0),
        ev(7, 3, "click", h),
        ev(8, 3, "purchase", 2 * h),
        # user 4: purchase BEFORE click is not a conversion
        ev(9, 4, "view", 0),
        ev(10, 4, "purchase", 30),
        ev(11, 4, "click", 60),
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    r = events_funnel_within_window(spark, str(tmp_path)).collect()[0]
    assert r["viewed"] == 4
    assert r["clicked_within"] == 3  # users 1, 3, 4
    assert r["purchased_within"] == 1  # user 3 only
