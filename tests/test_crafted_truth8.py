"""Eighth batch of hand-computed truths: TF-IDF pair cosine on exact
duplicates and CDC log compaction's latest-event pick."""

from __future__ import annotations

import datetime as dt

from mapreduce_docker_spark.operators.funnel_queries import events_compact_latest
from mapreduce_docker_spark.operators.textanalysis_queries import (
    text_tfidf_pair_cosine,
)


def test_tfidf_pair_cosine_exact_duplicates(spark, tmp_path):
    dup = (
        "alpha beta gamma delta epsilon zeta eta theta iota kappa "
        "lambda mu nu xi omicron"
    )
    docs = [
        (1, dup),
        (2, dup),
        # singletons: every shingle has df=1 -> pruned, so they pair with no one
        (3, "one lonely document about very particular gardening topics"),
        (4, "another unrelated text mentioning orbital mechanics and fuel"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = text_tfidf_pair_cosine(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["doc_a"], r["doc_b"]) == (1, 2)
    assert r["cos_sim"] == 1.0  # identical tf-idf vectors


def test_compact_latest_hand_computed(spark, tmp_path):
    base = dt.datetime(2024, 1, 1, 0, 0, 0)

    def ev(eid, user, kind, secs):
        return (eid, base + dt.timedelta(seconds=secs), user, kind, 1.0, "{}")

    rows = [
        ev(1, 1, "view", 0),
        ev(2, 1, "view", 100),      # latest view for user 1
        ev(3, 1, "click", 50),
        ev(5, 2, "view", 200),
        ev(4, 2, "view", 200),      # same ts: event_id DESC -> id 5 wins
    ]
    spark.createDataFrame(
        rows,
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    out = {
        (r["user_id"], r["event_type"]): r
        for r in events_compact_latest(spark, str(tmp_path)).collect()
    }
    assert set(out) == {(1, "view"), (1, "click"), (2, "view")}
    assert out[(1, "view")]["last_event_id"] == 2
    assert out[(1, "click")]["last_event_id"] == 3
    assert out[(2, "view")]["last_event_id"] == 5  # ts tie -> higher event_id
