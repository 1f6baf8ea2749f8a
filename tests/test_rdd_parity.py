"""RDD-vs-DataFrame path equality (SURVEY §3.2 / §7 Phase 5).

All three RDD formulations (reduceByKey, per-partition Counter combiner,
groupByKey) must produce the exact word->count map of the DataFrame
flagship on the same input — including the reference's golden fixtures
(SURVEY §5.2 / reference test_mapreduce.py).
"""

from __future__ import annotations

import pytest

from mapreduce_docker_spark.operators import rdd_parity as rp
from mapreduce_docker_spark.operators import wordcount as wc

FOX_DOG = [
    "The quick brown fox jumps over the lazy dog.",
    "The dog was really lazy, but the fox was quick!",
]
GOLDEN = {
    "the": 4, "lazy": 2, "quick": 2, "fox": 2, "dog": 2, "was": 2,
    "brown": 1, "jumps": 1, "over": 1, "really": 1, "but": 1,
}

HELLO = ["hello world hello python world"]


@pytest.mark.parametrize(
    "shape",
    [rp.wordcount_reduce_by_key, rp.wordcount_combiner_partitions, rp.wordcount_group_by_key],
    ids=["reduceByKey", "partitionCounter", "groupByKey"],
)
@pytest.mark.parametrize(
    "lines,expected",
    [(FOX_DOG, GOLDEN), (HELLO, {"hello": 2, "world": 2, "python": 1})],
    ids=["fox_dog", "hello"],
)
def test_rdd_shapes_golden(spark, shape, lines, expected):
    rdd = spark.sparkContext.parallelize(lines, numSlices=2)
    assert dict(shape(rdd).collect()) == expected


def test_rdd_matches_dataframe_path(spark):
    """RDD shapes (reference-exact Python re) == strict DataFrame tokenizer.

    Input includes the corners where strict differs from maximal-run
    extraction: digit-adjacent ("42") and non-ASCII-adjacent ("café") runs.
    """
    lines = FOX_DOG * 7 + HELLO * 3 + ["", "123 !!!", "Édouard café x42y _foo"]
    rdd = spark.sparkContext.parallelize(lines, numSlices=4)
    want = {
        (r["word"], r["cnt"])
        for r in wc.word_counts(
            spark.createDataFrame([(x,) for x in lines], "text string"),
            "text",
            strict=True,
        ).collect()
    }
    for shape in (
        rp.wordcount_reduce_by_key,
        rp.wordcount_combiner_partitions,
        rp.wordcount_group_by_key,
    ):
        assert set(shape(rdd).collect()) == want, shape.__name__
    # and the DataFrame round-trip keeps the flagship schema
    df = rp.to_df(spark, rp.wordcount_reduce_by_key(rdd))
    assert df.schema.simpleString() == "struct<word:string,cnt:bigint>"


def test_partition_invariance(spark):
    """Answers do not depend on chunking (reference CHUNK_BYTES independence)."""
    lines = FOX_DOG * 13
    a = dict(
        rp.wordcount_reduce_by_key(spark.sparkContext.parallelize(lines, 1)).collect()
    )
    b = dict(
        rp.wordcount_reduce_by_key(spark.sparkContext.parallelize(lines, 8)).collect()
    )
    assert a == b
