"""Fifteenth batch of hand-computed truths, aimed at the r8 freshness
window's oracle-only names (the oracle proves engine == DuckDB; these
prove both == a hand-computed answer, closing the shared-misunderstanding
gap — which this batch actually caught once: the pre-r8 chunker computed
floor where its own contract said ceil, silently dropping up to
STRIDE-1 trailing tokens per document, and the oracle agreed because it
encoded the same floor).

Covers: text_chunk_windows (every boundary shape of the W=32/S=24
sliding chunker + full-coverage), text_repetition_filter (threshold
boundary incl. the round-before-compare contract), events_sliding_10m_5m
(window-boundary assignment, start-inclusive / end-exclusive), and
text_fingerprint (rolling hash folded by hand with hashlib).
"""

from __future__ import annotations

import datetime as dt
import hashlib
import itertools

from mapreduce_docker_spark.operators.textanalysis_queries import (
    CHUNK_STRIDE,
    CHUNK_TOKENS,
    text_chunk_windows,
    text_fingerprint,
    text_repetition_filter,
)
from mapreduce_docker_spark.streaming.window_queries import events_sliding_10m_5m


def _distinct_tokens(n: int) -> list[str]:
    """n distinct engine-standard tokens ([a-z]+ runs, no digits)."""
    out = [
        "".join(t)
        for t in itertools.islice(itertools.product("abcdefghijklmnopqrstuvwxyz", repeat=3), n)
    ]
    assert len(out) == n
    return out


def test_chunk_windows_every_boundary_hand_computed(spark, tmp_path):
    """W=32, S=24: n_chunks = ceil(max(n-W,0)/S)+1. Hand-enumerated chunk
    tables for every boundary shape: short doc (n<W), exact one window
    (n=W), one past (n=W+1 -> a 9-token ragged second chunk), mid-stride
    (n=40: the shape the pre-r8 floor form truncated, dropping 8 tokens),
    exact two windows (n=56), and one past two (n=57 -> a third ragged
    chunk). Every token index must be covered by at least one chunk."""
    assert (CHUNK_TOKENS, CHUNK_STRIDE) == (32, 24)
    sizes = [5, 32, 33, 40, 56, 57]
    toks_by_doc = {i: _distinct_tokens(n) for i, n in enumerate(sizes)}
    spark.createDataFrame(
        [(i, " ".join(t)) for i, t in toks_by_doc.items()],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))

    rows = text_chunk_windows(spark, str(tmp_path)).collect()
    got = {
        (r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_tokens"]) for r in rows
    }
    assert len(got) == len(rows), "duplicate (doc, chunk_idx)"

    # hand-built expectation: chunk k covers 0-based token slice
    # [k*S, min(k*S+W, n)), with k = 0 .. ceil(max(n-W,0)/S)
    expected = {}
    for i, n in enumerate(sizes):
        toks = toks_by_doc[i]
        n_chunks = -((n - CHUNK_TOKENS) // -CHUNK_STRIDE) + 1 if n > CHUNK_TOKENS else 1
        covered = set()
        for k in range(n_chunks):
            lo = k * CHUNK_STRIDE
            hi = min(lo + CHUNK_TOKENS, n)
            expected[(i, k)] = (" ".join(toks[lo:hi]), hi - lo)
            covered |= set(range(lo, hi))
        assert covered == set(range(n)), f"doc {i}: hand expectation has a gap"
    # spot-check the hand arithmetic on the trap shapes before trusting it
    assert expected[(3, 1)][1] == 16  # n=40: second chunk = tokens 24..39
    assert (3, 1) in expected  # the chunk the floor form dropped entirely
    assert expected[(5, 2)][1] == 9  # n=57: third ragged chunk = tokens 48..56

    assert got == expected


def test_repetition_filter_threshold_boundary_hand_computed(spark, tmp_path):
    """keep iff round4(max_count/total) <= 0.3 — the compare runs on the
    ROUNDED ratio, so 7501/25000 = 0.30004 rounds to 0.3000 and is KEPT,
    while 3001/10000 = 0.3001 survives rounding and is dropped. Exact 3/10
    sits on the boundary and is kept (<=, not <)."""
    filler = _distinct_tokens(17499)
    docs = [
        # doc 0: top token "a" x3 of 10 -> ratio exactly 0.3 -> keep
        (0, "a a a " + " ".join(_distinct_tokens(7))),
        # doc 1: top token "a" x4 of 10 -> 0.4 -> drop
        (1, "a a a a " + " ".join(_distinct_tokens(6))),
        # doc 2: 7501 of 25000 -> raw 0.30004, rounds to 0.3 -> KEPT
        (2, " ".join(["z"] * 7501) + " " + " ".join(filler)),
        # doc 3: 3001 of 10000 -> 0.3001 after rounding -> drop
        (3, " ".join(["z"] * 3001) + " " + " ".join(filler[:6999])),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (
            r["top_token_count"],
            r["total_tokens"],
            r["top_token_ratio"],
            r["keep"],
        )
        for r in text_repetition_filter(spark, str(tmp_path)).collect()
    }
    assert got[0] == (3, 10, 0.3, True)
    assert got[1] == (4, 10, 0.4, False)
    assert got[2] == (7501, 25000, 0.3, True)  # rounded BEFORE the compare
    assert got[3] == (3001, 10000, 0.3001, False)


def test_sliding_windows_boundary_assignment_hand_computed(spark, tmp_path):
    """10m/5m sliding windows are start-inclusive, end-exclusive: an event
    at exactly 00:05:00 belongs to [00:00,00:10) and [00:05,00:15) — NOT
    to [23:55,00:05); an event 1µs earlier belongs to [23:55,00:05) and
    [00:00,00:10). Every event lands in exactly two windows."""
    ts = dt.datetime
    events = [
        (1, ts(2024, 1, 2, 0, 0, 0), 10, "c", 1.0, "{}"),
        (2, ts(2024, 1, 2, 0, 4, 59, 999999), 10, "c", 2.0, "{}"),
        (3, ts(2024, 1, 2, 0, 5, 0), 10, "c", 4.0, "{}"),
    ]
    spark.createDataFrame(
        events,
        "event_id long, ts timestamp, user_id long, event_type string,"
        " value double, props string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["window_start"], r["window_end"]): (r["n_events"], r["total_value"])
        for r in events_sliding_10m_5m(spark, str(tmp_path)).collect()
    }
    assert got == {
        (ts(2024, 1, 1, 23, 55), ts(2024, 1, 2, 0, 5)): (2, 3.0),   # e1, e2
        (ts(2024, 1, 2, 0, 0), ts(2024, 1, 2, 0, 10)): (3, 7.0),    # e1, e2, e3
        (ts(2024, 1, 2, 0, 5), ts(2024, 1, 2, 0, 15)): (1, 4.0),    # e3 only
    }
    # exactly-two-windows invariant: total multiplicity = 2 * 3 events
    assert sum(n for n, _ in got.values()) == 6


def test_rolling_fingerprint_hand_computed(spark, tmp_path):
    """fp = fold(toks, 0, (acc,t) -> (acc*31 + int(md5(t)[:8],16)) % (1e9+7)),
    folded by hand with hashlib; tokenizer is lowercased [a-z]+ runs, so
    'Alpha, BETA-7 gamma!' tokenizes to [alpha, beta, gamma]; a doc with no
    letter runs has zero tokens -> fp 0 and md5('') as content hash."""
    spark.createDataFrame(
        [(1, "Alpha, BETA-7 gamma!"), (2, "42 ... 17")],
        "doc_id long, text string",
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    acc = 0
    for t in ["alpha", "beta", "gamma"]:
        h = int(hashlib.md5(t.encode()).hexdigest()[:8], 16)
        acc = (acc * 31 + h) % 1_000_000_007
    got = {
        r["doc_id"]: (r["content_md5"], r["rolling_fp"])
        for r in text_fingerprint(spark, str(tmp_path)).collect()
    }
    assert got[1] == (hashlib.md5(b"alpha beta gamma").hexdigest(), acc)
    assert got[2] == (hashlib.md5(b"").hexdigest(), 0)
