"""Second batch of hand-computed truths for r5-window queries: character
entropy (including non-BMP codepoints — the ADVICE r4 fix), LOCF gap
fill, and ship-latency percentiles.
"""

from __future__ import annotations

import datetime as dt
import math

from mapreduce_docker_spark.operators.funnel_queries import (
    events_daily_gapfill_locf,
)
from mapreduce_docker_spark.operators.relational_queries import (
    lineitem_ship_latency,
)
from mapreduce_docker_spark.operators.textanalysis_queries import (
    text_char_entropy,
)


def _entropy_bits(counts):
    n = sum(counts)
    return -sum((c / n) * math.log2(c / n) for c in counts)


def test_char_entropy_hand_computed_incl_non_bmp(spark, tmp_path):
    docs = [
        (1, "aabb"),          # {a:2, b:2} -> 1.0 bit
        (2, "\U0001F600\U0001F600aa"),  # emoji is ONE codepoint: {emoji:2, a:2} -> 1.0
        (3, "abab\ncd"),      # {a:2, b:2, \n:1, c:1, d:1} over n=7
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    rows = {r["doc_id"]: r for r in text_char_entropy(spark, str(tmp_path)).collect()}
    assert rows[1]["n_chars_counted"] == 4
    assert abs(rows[1]["entropy_bits"] - 1.0) < 1e-6
    # a UTF-16 surrogate split would count 6 chars and miscompute entropy
    assert rows[2]["n_chars_counted"] == 4
    assert abs(rows[2]["entropy_bits"] - 1.0) < 1e-6
    assert rows[3]["n_chars_counted"] == 7
    assert abs(rows[3]["entropy_bits"] - _entropy_bits([2, 2, 1, 1, 1])) < 1e-3


def test_gapfill_locf_hand_computed(spark, tmp_path):
    schema = (
        "event_id long, ts timestamp, user_id long, event_type string, "
        "value double, props string"
    )
    d = dt.datetime
    rows = [
        (1, d(2024, 1, 1, 9), 1, "view", 2.0, "{}"),
        (2, d(2024, 1, 3, 9), 1, "view", 4.0, "{}"),
        (3, d(2024, 1, 1, 9), 2, "view", 1.0, "{}"),  # second user widens nothing
    ]
    spark.createDataFrame(rows, schema).coalesce(1).write.mode("overwrite").parquet(
        str(tmp_path / "events.parquet")
    )
    out = {
        (r["user_id"], str(r["event_date"])): r
        for r in events_daily_gapfill_locf(spark, str(tmp_path)).collect()
    }
    # grid spans the table's [min, max] date for every active user
    assert len(out) == 6  # 2 users x 3 days
    u1d2 = out[(1, "2024-01-02")]
    assert u1d2["v_raw"] is None and u1d2["was_gap"] is True
    assert u1d2["v_filled"] == 2.0  # carried from day 1
    assert out[(1, "2024-01-03")]["v_filled"] == 4.0
    assert out[(1, "2024-01-03")]["was_gap"] is False
    u2d3 = out[(2, "2024-01-03")]
    assert u2d3["was_gap"] is True and u2d3["v_filled"] == 1.0


def test_ship_latency_percentiles_hand_computed(spark, tmp_path):
    # one priority, latencies [1, 2, 3, 10]:
    # p50 (interpolated) = 2.5; p95 at rank 0.95*3 = 2.85 -> 3 + 0.85*7 = 8.95
    d = dt.date
    orders = [(k, 7, d(2024, 1, 1), "1-URGENT") for k in (1, 2, 3, 4)]
    spark.createDataFrame(
        orders, "o_orderkey long, o_custkey long, o_orderdate date, o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    lines = [
        (1, d(2024, 1, 2)),
        (2, d(2024, 1, 3)),
        (3, d(2024, 1, 4)),
        (4, d(2024, 1, 11)),
    ]
    spark.createDataFrame(lines, "l_orderkey long, l_shipdate date").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = lineitem_ship_latency(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert (r["n_lines"], r["min_days"], r["max_days"]) == (4, 1, 10)
    assert r["avg_days"] == 4.0
    assert r["p50_days"] == 2.5
    assert abs(r["p95_days"] - 8.95) < 1e-9
