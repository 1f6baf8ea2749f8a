"""Functional checks for the dedup surface (planted near-dups in fixtures)."""

from __future__ import annotations

from pyspark.sql import functions as F

from mapreduce_docker_spark.operators import dedup_queries as dq
from tests.conftest import SF_SMOKE


def test_minhash_finds_planted_near_dups(spark):
    pairs = dq.dedup_minhash_pairs(spark, SF_SMOKE).collect()
    # fixture analysis: 28 planted pairs at shingle-jaccard >= 0.5, 27 >= 0.9
    assert len(pairs) == 28
    assert sum(1 for r in pairs if r["jaccard"] >= 0.9) == 27
    assert all(r["doc_a"] < r["doc_b"] for r in pairs)


def test_survivors_drop_exactly_the_pair_tails(spark):
    pairs = dq.dedup_minhash_pairs(spark, SF_SMOKE)
    dropped = {r["doc_b"] for r in pairs.collect()}
    survivors = {r["doc_id"] for r in dq.dedup_minhash_survivors(spark, SF_SMOKE).collect()}
    n_docs = 500
    assert len(survivors) == n_docs - len(dropped)
    assert survivors.isdisjoint(dropped)


def test_exact_dedup_is_identity_on_unique_corpus(spark):
    # fixtures contain no EXACT duplicates (only near-dups)
    groups = dq.dedup_exact_groups(spark, SF_SMOKE)
    assert groups.filter(F.col("n_docs") > 1).count() == 0


def test_embedding_pairs_within_label_only(spark):
    rows = dq.dedup_embedding_pairs(spark, SF_SMOKE).collect()
    assert len(rows) > 0
    assert all(0.40 <= r["cos_sim"] <= 1.0 for r in rows)
