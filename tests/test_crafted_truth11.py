"""Eleventh batch: train/val/test split membership replicated bit-for-bit
in Python — the split must be a pure function of doc_id (re-shard-stable,
engine-independent), so hashlib must reproduce it exactly."""

from __future__ import annotations

import hashlib

from mapreduce_docker_spark.operators.textanalysis_queries import (
    SPLIT_TRAIN_PCT,
    SPLIT_VAL_PCT,
    text_train_val_split,
)


def _expected_split(doc_id: int) -> str:
    bucket = int(hashlib.md5(f"split:{doc_id}".encode()).hexdigest()[:8], 16) % 100
    if bucket < SPLIT_TRAIN_PCT:
        return "train"
    if bucket < SPLIT_TRAIN_PCT + SPLIT_VAL_PCT:
        return "val"
    return "test"


def test_train_val_split_matches_python_md5(spark, tmp_path):
    docs = [(i, "en", "some text") for i in range(1, 201)]
    spark.createDataFrame(docs, "doc_id long, lang string, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    got = {
        r["doc_id"]: r["split"]
        for r in text_train_val_split(spark, str(tmp_path)).collect()
    }
    want = {i: _expected_split(i) for i in range(1, 201)}
    assert got == want
    # and the split actually produces all three classes at n=200
    assert set(got.values()) == {"train", "val", "test"}
