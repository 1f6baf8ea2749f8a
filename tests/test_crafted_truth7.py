"""Seventh batch of hand-computed truths: smoothed bigram surprisal, the
LSH similarity report and cluster survivorship on exact duplicates, and
the pandas-on-Spark stats lane."""

from __future__ import annotations

import math

from mapreduce_docker_spark.operators.dedup_queries import (
    dedup_cluster_survivorship,
    dedup_pair_similarity_report,
)
from mapreduce_docker_spark.operators.psapi_queries import (
    q_psapi_priority_order_stats,
)
from mapreduce_docker_spark.operators.textanalysis_queries import (
    text_bigram_surprisal,
)


def test_bigram_surprisal_hand_computed(spark, tmp_path):
    # one doc "a b a b": bigrams (a b)x2, (b a)x1; c1(a)=2, c1(b)=1, V=2
    # alpha=0.5: nll(a b) = -ln(2.5/3), nll(b a) = -ln(1.5/2)
    docs = [(1, "a b a b")]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = text_bigram_surprisal(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_bigrams"] == 3
    expect = (2 * -math.log(2.5 / 3.0) + -math.log(1.5 / 2.0)) / 3
    assert abs(r["surprisal"] - round(expect, 6)) < 1e-9


_DUP_TEXT = (
    "the quick brown fox jumps over the lazy dog while the cat watches "
    "from the warm windowsill nearby"
)
_OTHER_TEXT = (
    "completely different vocabulary here involving ships harbors cargo "
    "manifests customs anchors tides navigation beacons"
)


def _write_dup_docs(spark, tmp_path):
    docs = [
        (1, _DUP_TEXT, "en", len(_DUP_TEXT)),
        (2, _DUP_TEXT, "en", len(_DUP_TEXT)),
        (3, _DUP_TEXT, "de", len(_DUP_TEXT)),
        (4, _OTHER_TEXT, "en", len(_OTHER_TEXT)),
    ]
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, n_chars long"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))


def test_pair_report_exact_duplicates(spark, tmp_path):
    # identical texts share every shingle: all bands collide, jaccard and
    # both containments are exactly 1.0; the unrelated doc pairs with no one
    _write_dup_docs(spark, tmp_path)
    rows = {
        (r["doc_a"], r["doc_b"]): r
        for r in dedup_pair_similarity_report(spark, str(tmp_path)).collect()
    }
    assert set(rows) == {(1, 2), (1, 3), (2, 3)}
    for r in rows.values():
        assert r["jaccard"] == 1.0
        assert r["containment_a"] == 1.0 and r["containment_b"] == 1.0


def test_cluster_survivorship_exact_duplicates(spark, tmp_path):
    _write_dup_docs(spark, tmp_path)
    out = {r["cluster_id"]: r for r in dedup_cluster_survivorship(spark, str(tmp_path)).collect()}
    # docs 1-3 collapse into one cluster labeled by the min member id;
    # the unrelated doc stays a singleton cluster of itself
    assert set(out) == {1, 4}
    r = out[1]
    assert r["n_members"] == 3
    # representative = max by (n_chars, doc_id); equal lengths -> doc 3
    assert r["rep_doc_id"] == 3
    assert r["total_chars"] == 3 * len(_DUP_TEXT)
    assert r["langs"] == "de,en"
    s = out[4]
    assert (s["n_members"], s["rep_doc_id"], s["langs"]) == (1, 4, "en")


def test_psapi_stats_hand_computed(spark, tmp_path):
    rows = [
        (1, 1, 2000.0, "1-URGENT"),
        (2, 2, 3000.0, "1-URGENT"),
        (3, 1, 500.0, "1-URGENT"),   # filtered: <= 1000
        (4, 3, 1500.0, "2-HIGH"),
    ]
    spark.createDataFrame(
        rows, "o_orderkey long, o_custkey long, o_totalprice double, o_orderpriority string"
    ).coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "orders.parquet"))
    out = {
        r["o_orderpriority"]: r
        for r in q_psapi_priority_order_stats(spark, str(tmp_path)).collect()
    }
    u = out["1-URGENT"]
    assert (u["n_orders"], u["n_customers"], u["revenue"]) == (2, 2, 5000.0)
    h = out["2-HIGH"]
    assert (h["n_orders"], h["n_customers"], h["revenue"]) == (1, 1, 1500.0)
