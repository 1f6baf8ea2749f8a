"""Tenth batch of hand-computed truths: training-shard sequence packing
offsets/bins and the exact n-gram decontamination flags."""

from __future__ import annotations

from mapreduce_docker_spark.operators.textanalysis_queries import (
    PACK_TOKEN_BUDGET,
    text_decontaminate_ngram,
    text_pack_sequences,
)


def test_pack_sequences_hand_computed(spark, tmp_path):
    # one lang, doc_id order: token counts 100, 100, 100 -> offsets
    # 0/100/200, bins 0/0/0 with in-bin 0/100/200; the fourth doc starts at
    # 300 = bin 1, offset 300-256=44 (budget 256)
    assert PACK_TOKEN_BUDGET == 256
    docs = [(i, "en", " ".join(["tok"] * 100)) for i in (1, 2, 3, 4)]
    # a second lang packs independently from offset 0
    docs.append((5, "de", " ".join(["wort"] * 10)))
    spark.createDataFrame(docs, "doc_id long, lang string, text string").coalesce(
        1
    ).write.mode("overwrite").parquet(str(tmp_path / "documents.parquet"))
    out = {r["doc_id"]: r for r in text_pack_sequences(spark, str(tmp_path)).collect()}
    assert (out[1]["start_offset"], out[1]["bin_id"], out[1]["bin_offset"]) == (0, 0, 0)
    assert (out[2]["start_offset"], out[2]["bin_id"], out[2]["bin_offset"]) == (100, 0, 100)
    assert (out[3]["start_offset"], out[3]["bin_id"], out[3]["bin_offset"]) == (200, 0, 200)
    assert (out[4]["start_offset"], out[4]["bin_id"], out[4]["bin_offset"]) == (300, 1, 44)
    assert (out[5]["start_offset"], out[5]["bin_id"]) == (0, 0)


def test_decontaminate_ngram_hand_computed(spark, tmp_path):
    # benchmark slice = doc_id < 20 (fixture convention). Benchmark doc 1
    # has shingles {"alpha beta gamma", "beta gamma delta"}; corpus doc 30
    # shares exactly one of them, doc 31 both, doc 32 none.
    docs = [
        (1, "alpha beta gamma delta"),
        (30, "x alpha beta gamma y"),
        (31, "alpha beta gamma delta"),
        (32, "totally unrelated words forming other shingles entirely"),
    ]
    spark.createDataFrame(docs, "doc_id long, text string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(str(tmp_path / "documents.parquet"))
    out = {
        r["doc_id"]: r["n_shared_shingles"]
        for r in text_decontaminate_ngram(spark, str(tmp_path)).collect()
    }
    assert out == {30: 1, 31: 2}
