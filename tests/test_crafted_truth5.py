"""Fifth batch of hand-computed truths: daily anomaly z-scores, NTILE
length buckets, and winsorized statistics."""

from __future__ import annotations

import datetime as dt
import math

from mapreduce_docker_spark.operators.funnel_queries import (
    events_daily_anomaly_zscores,
)
from mapreduce_docker_spark.operators.relational_queries import (
    agg_winsorized_value_stats,
)
from mapreduce_docker_spark.operators.textanalysis_queries import (
    text_length_buckets,
)

_EV_SCHEMA = (
    "event_id long, ts timestamp, user_id long, event_type string, "
    "value double, props string"
)


def test_anomaly_zscores_hand_computed(spark, tmp_path):
    # 'view' daily totals: nine days of 1.0 then a 10.0 spike.
    # mu=1.9; sample var=(109-361/10)/9=8.1; spike z=8.1/sqrt(8.1)=sqrt(8.1)
    rows = [
        (i, dt.datetime(2024, 1, i, 12), 1, "view", 1.0, "{}") for i in range(1, 10)
    ] + [(10, dt.datetime(2024, 1, 10, 12), 1, "view", 10.0, "{}")]
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = {
        str(r["event_date"]): r
        for r in events_daily_anomaly_zscores(spark, str(tmp_path)).collect()
    }
    assert len(out) == 10
    spike = out["2024-01-10"]
    assert spike["daily_total"] == 10.0
    assert abs(spike["zscore"] - round(math.sqrt(8.1), 4)) < 1e-9
    assert spike["is_anomaly"] is True
    normal = out["2024-01-01"]
    assert abs(normal["zscore"] - round(-0.9 / math.sqrt(8.1), 4)) < 1e-9
    assert normal["is_anomaly"] is False


def test_length_buckets_hand_computed(spark, tmp_path):
    # 16 docs with 1..16 tokens, one lang, NTILE(8) -> 2 docs per bucket in
    # sorted order; bucket k holds {2k-1, 2k} tokens
    docs = [(i, "en", " ".join(["w"] * i)) for i in range(1, 17)]
    spark.createDataFrame(docs, "doc_id long, lang string, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["bucket"]: r for r in text_length_buckets(spark, str(tmp_path)).collect()}
    assert set(out) == set(range(1, 9))
    for k in range(1, 9):
        r = out[k]
        lo, hi = 2 * k - 1, 2 * k
        assert (r["n_docs"], r["min_tokens"], r["max_tokens"]) == (2, lo, hi)
        assert r["sum_tokens"] == lo + hi
        # padding to the bucket max wastes exactly 1 token per bucket here
        assert r["padding_waste"] == 1
        assert r["pad_ratio"] == round(1 / (2 * hi), 6)


def test_winsorized_stats_hand_computed(spark, tmp_path):
    # values 0..20: p05 falls exactly on 1.0 and p95 on 19.0 (rank = k*(n-1)
    # integral), so exactly the two extremes clamp; winsorized mean
    # = (210)/21 = 10.0
    rows = [
        (i, dt.datetime(2024, 1, 1 + i % 28, 12), 1, "view", float(i), "{}")
        for i in range(21)
    ]
    spark.createDataFrame(rows, _EV_SCHEMA).coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "events.parquet"))
    out = agg_winsorized_value_stats(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n"], r["n_clamped"]) == (21, 2)
    assert r["winsorized_mean"] == 10.0
    assert (r["winsorized_min"], r["winsorized_max"]) == (1.0, 19.0)
