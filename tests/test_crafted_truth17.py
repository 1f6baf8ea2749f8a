"""Seventeenth batch of hand-computed truths, finishing the r8
freshness-window sweep: C4-style span-tile dedup (global
first-occurrence election, ragged tail tile, within-doc repeats,
all-dropped docs) and the lang/source ROLLUP (margin rows vs a
data-NULL group that collides with them on key values)."""

from __future__ import annotations

from mapreduce_docker_spark.operators.dedup_queries import dedup_span_tiles
from mapreduce_docker_spark.operators.textanalysis_queries import (
    text_lang_source_rollup,
)


def test_span_tiles_election_and_raggedness_hand_computed(spark, tmp_path):
    """3-token non-overlapping tiles; the survivor of a repeated tile is
    the MINIMUM (doc_id, tile_idx) pair — lexicographic, NOT corpus
    position, so doc 5 keeping a tile at tile_idx 1 beats doc 6 holding
    the same tile at tile_idx 0. A 7-token doc tiles as 3+3+1 (ragged
    tail is its own tile); a doc repeating a tile internally keeps only
    the first; a doc whose every tile is seen earlier keeps nothing and
    reassembles to the empty string; empty docs are filtered out
    entirely."""
    docs = [
        (1, "aa bb cc dd ee ff gg"),   # tiles: aa bb cc | dd ee ff | gg
        (2, "dd ee ff xx yy zz"),      # first tile already doc 1's
        (3, "aa bb cc"),               # whole doc is a seen tile
        (4, "pp qq rr pp qq rr"),      # internal repeat: keep tile_idx 0
        (5, "qa qb qc mm nn oo"),      # holds "mm nn oo" at tile_idx 1
        (6, "mm nn oo ta tb tc"),      # same tile at tile_idx 0 — LOSES
        (7, ""),                       # empty: no output row
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: (r["n_tiles"], r["n_dropped"], r["clean_text"])
        for r in dedup_span_tiles(spark, str(tmp_path)).collect()
    }
    assert got == {
        1: (3, 0, "aa bb cc dd ee ff gg"),
        2: (2, 1, "xx yy zz"),
        3: (1, 1, ""),
        4: (2, 1, "pp qq rr"),
        5: (2, 0, "qa qb qc mm nn oo"),  # (5,1) < (6,0): doc 5 wins the tile
        6: (2, 1, "ta tb tc"),
    }


def test_lang_source_rollup_margins_hand_computed(spark, tmp_path):
    """ROLLUP (lang, source) emits (lang,source) groups, per-lang margins,
    and the grand total. A doc whose lang IS NULL in the data produces a
    (NULL, web) group and a (NULL, NULL) per-lang margin that collides on
    key values with the grand total — both rows must exist, distinguished
    only by their aggregates, so the expectation is a row multiset, not a
    dict."""
    docs = [
        (1, "en", "web", 10),
        (2, "en", "wiki", 21),
        (3, "de", "web", 5),
        (4, None, "web", 7),
    ]
    spark.createDataFrame(
        docs, "doc_id long, lang string, source string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    def key(t):
        return ((t[0] is None, t[0] or ""), (t[1] is None, t[1] or ""), t[2])

    got = sorted(
        (
            (r["lang"], r["source"], r["n_docs"], r["total_chars"], r["avg_chars"])
            for r in text_lang_source_rollup(spark, str(tmp_path)).collect()
        ),
        key=key,
    )
    expected = sorted(
        [
            ("en", "web", 1, 10, 10.0),
            ("en", "wiki", 1, 21, 21.0),
            ("de", "web", 1, 5, 5.0),
            (None, "web", 1, 7, 7.0),       # data-NULL lang group
            ("en", None, 2, 31, 15.5),      # per-lang margins
            ("de", None, 1, 5, 5.0),
            (None, None, 1, 7, 7.0),        # margin of the data-NULL lang...
            (None, None, 4, 43, 10.75),     # ...AND the grand total
        ],
        key=key,
    )
    assert got == expected
