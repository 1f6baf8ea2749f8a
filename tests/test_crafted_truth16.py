"""Sixteenth batch of hand-computed truths — second half of the r8
freshness-window sweep over oracle-only names (batch 15 caught the
chunker's floor-for-ceil tail-dropping bug; this batch pins the
remaining trap-prone semantics: histogram bucket edges incl. the
min==max degenerate, exact-Jaccard shingle boundaries incl. the
short-doc whole-text guard, JSON-map explosion of empty/null/null-valued
props, collect_list determinism at the key boundary, and intra-label
cosine cohesion on vectors with by-hand angles)."""

from __future__ import annotations

from mapreduce_docker_spark.operators.dedup_queries import dedup_jaccard_sample
from mapreduce_docker_spark.operators.profile_queries import agg_histogram_totalprice
from mapreduce_docker_spark.operators.relational_queries import (
    agg_collect_order_keys,
    json_map_entries,
)
from mapreduce_docker_spark.operators.similarity_queries import sim_label_cohesion


def test_histogram_bucket_edges_hand_computed(spark, tmp_path):
    """Equi-width 10-bucket histogram over [0, 100]: left-inclusive edges
    (10.0 -> bucket 1, not 0), the max pinned INTO the top bucket
    (100.0 -> bucket 9, not a phantom bucket 10), and empty buckets absent
    from the output (GROUP BY emits only observed indices)."""
    prices = [0.0, 9.999, 10.0, 55.0, 95.0, 100.0]
    spark.createDataFrame(
        [(i, p) for i, p in enumerate(prices)], "o_orderkey long, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["bucket_idx"]: (r["lo"], r["hi"], r["n_orders"])
        for r in agg_histogram_totalprice(spark, str(tmp_path)).collect()
    }
    assert got == {
        0: (0.0, 10.0, 2),    # 0.0 and 9.999
        1: (10.0, 20.0, 1),   # 10.0: edge is left-inclusive
        5: (50.0, 60.0, 1),   # 55.0
        9: (90.0, 100.0, 2),  # 95.0 and the max itself
    }


def test_histogram_min_equals_max_degenerate(spark, tmp_path):
    """All-identical values: the unguarded (x-mn)/(mx-mn) THREW
    DIVIDE_BY_ZERO under ANSI mode (Spark 4 default, on in this session)
    when this test was first written — a histogram over a constant column
    is routine at scale, so the r8 fix guards the degenerate explicitly:
    every row lands in one point bucket 0 with lo == hi == the value."""
    spark.createDataFrame(
        [(1, 5.0), (2, 5.0)], "o_orderkey long, o_totalprice double"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    rows = agg_histogram_totalprice(spark, str(tmp_path)).collect()
    assert [(r["bucket_idx"], r["lo"], r["hi"], r["n_orders"]) for r in rows] == [
        (0, 5.0, 5.0, 2)
    ]


def test_jaccard_sample_shingle_boundaries_hand_computed(spark, tmp_path):
    """3-word shingle Jaccard by hand: identical docs -> 1.0; a one-token
    tail swap on 5 tokens -> 2 shared of 4 shingles -> 0.5; an engineered
    3-of-10 overlap sits exactly on the 0.3 threshold and is KEPT (>=);
    disjoint pairs drop. Short-but-nonempty docs (1..2 tokens) hash as
    ONE whole-text shingle, so two identical 2-token docs are perfect
    duplicates. EMPTY docs left the near-dup relation in r10 (the
    zero-shingle law, tools/degenerate_sweep.py): they have no shingles,
    no pair, and no 0/0 Jaccard — exact dedup upstream owns contentless
    duplicates. The doc_id < 300 bound excludes doc 300 entirely."""
    c = ["ca", "cb", "cc", "cd", "ce", "cf", "cg", "ch"]
    d = ["da", "db", "dc", "dd"]
    docs = [
        (10, "aa bb cc dd ee"),
        (11, "aa bb cc dd ee"),       # == doc 10
        (12, "aa bb cc dd zz"),       # shares shingles {aa bb cc, bb cc dd}
        (13, "pp qq rr ss tt"),       # disjoint: every pair with it drops
        (14, "mm nn"),                # short doc: shingles = {"mm nn"}
        (15, "mm nn"),                # == doc 14 -> 1.0 via the guard
        (16, ""),                     # empty doc: shingles = {""}
        (17, ""),                     # == doc 16 -> 1.0 via the guard
        (20, " ".join(c)),            # 8 tokens -> 6 shingles
        (21, " ".join(c[:5] + d)),    # 9 tokens -> 7 shingles, 3 shared
        (300, "aa bb cc dd ee"),      # out of the sample bound
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    got = {
        (r["doc_a"], r["doc_b"]): r["jaccard"]
        for r in dedup_jaccard_sample(spark, str(tmp_path)).collect()
    }
    assert got == {
        (10, 11): 1.0,
        (10, 12): 0.5,
        (11, 12): 0.5,
        (14, 15): 1.0,
        # NO (16, 17): empty docs have no shingles since r10 — they are
        # exact-dedup material, not near-dup pairs
        (20, 21): 0.3,  # 3 shared / (6 + 7 - 3) = exactly the threshold
    }


def test_json_map_entries_hand_computed(spark, tmp_path):
    """JSON props -> map -> exploded entries: multi-key objects fan out one
    row per key, a JSON null value survives as a NULL map_value row, and
    both the empty object and NULL props produce NO rows (the event
    disappears, it does not null-fill)."""
    events = [
        (1, '{"a": 1, "b": 2}'),
        (2, "{}"),
        (3, None),
        (4, '{"x": null}'),
    ]
    spark.createDataFrame(events, "event_id long, props string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "events.parquet"))
    got = {
        (r["event_id"], r["map_key"]): r["map_value"]
        for r in json_map_entries(spark, str(tmp_path)).collect()
    }
    assert got == {(1, "a"): 1, (1, "b"): 2, (4, "x"): None}


def test_collect_order_keys_deterministic_csv_hand_computed(spark, tmp_path):
    """collect_list is order-nondeterministic by contract — the query is
    only deterministic because of the explicit sort_array: order keys
    written in shuffled order come back ascending. The o_custkey < 200
    bound keeps 199 and drops 200."""
    orders = [
        (30, 199), (10, 199), (20, 199),  # deliberately unsorted
        (7, 1),
        (99, 200),                        # boundary: excluded
    ]
    spark.createDataFrame(orders, "o_orderkey long, o_custkey long").repartition(
        4
    ).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    got = {
        r["o_custkey"]: (r["order_keys_csv"], r["n_orders"])
        for r in agg_collect_order_keys(spark, str(tmp_path)).collect()
    }
    assert got == {199: ("10,20,30", 3), 1: ("7", 1)}


def test_label_cohesion_hand_computed_angles(spark, tmp_path):
    """Unit-normalized intra-label cosines on 2-d vectors with by-hand
    angles: (3,4)->(0.6,0.8), (4,3)->(0.8,0.6), (5,0)->(1,0) give pair
    cosines 0.96 / 0.6 / 0.8 -> avg 0.7867 (half-up at 4), max 0.96.
    A single-member label yields no pair and is absent; vec_id 200 is
    outside the strict < 200 sample bound. Vectors are zero-padded to
    the index dimension (r11 dimension law) — appended zeros change no
    dot product or norm, so the hand numbers stand."""

    def p64(v):
        return v + [0.0] * (64 - len(v))

    emb = [
        (1, "a", p64([3.0, 4.0])),
        (2, "a", p64([4.0, 3.0])),
        (3, "a", p64([5.0, 0.0])),
        (200, "a", p64([9.0, 9.0])),  # excluded by the bound
        (4, "b", p64([1.0, 2.0])),    # lone member: no intra pair
    ]
    spark.createDataFrame(
        emb, "vec_id long, label string, embedding array<float>"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "embeddings.parquet"))
    rows = sim_label_cohesion(spark, str(tmp_path)).collect()
    assert len(rows) == 1
    r = rows[0]
    assert (r["label"], r["n_pairs"], r["avg_intra_cos"], r["max_intra_cos"]) == (
        "a",
        3,
        0.7867,
        0.96,
    )
