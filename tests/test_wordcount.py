"""Golden tests for the flagship word-count (FIXTURES.md §A).

Inputs and expected outputs are the reference's own literal test fixtures
(reference test_mapreduce.py:11-13, 24-28, 47-50) plus the regex edge cases
derived in FIXTURES.md §A.4. These pin the tokenizer semantics exactly:
lowercase first, maximal ``[a-z]+`` runs, no empty tokens, digits and
non-ASCII act as separators.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from mapreduce_docker_spark.operators import wordcount as wc


def _counts(spark, lines: list[str]) -> dict[str, int]:
    df = spark.createDataFrame([(s,) for s in lines], "text string")
    return {r["word"]: r["cnt"] for r in wc.word_counts(df, "text").collect()}


def test_map_kernel_golden(spark):
    # reference test_mapreduce.py:11-13
    assert _counts(spark, ["hello world hello python world"]) == {
        "hello": 2,
        "world": 2,
        "python": 1,
    }


def test_full_pipeline_golden(spark):
    # reference test_mapreduce.py:47-50
    lines = [
        "the quick brown fox jumps over the lazy dog",
        "the dog was really lazy but the fox was quick",
    ]
    expected = {
        "the": 4,
        "quick": 2,
        "brown": 1,
        "fox": 2,
        "jumps": 1,
        "over": 1,
        "lazy": 2,
        "dog": 2,
        "was": 2,
        "really": 1,
        "but": 1,
    }
    assert _counts(spark, lines) == expected
    assert sum(expected.values()) == 19 and len(expected) == 11


def test_topk_golden(spark):
    lines = [
        "the quick brown fox jumps over the lazy dog",
        "the dog was really lazy but the fox was quick",
    ]
    df = spark.createDataFrame([(s,) for s in lines], "text string")
    top5 = wc.top_k(wc.word_counts(df, "text"), 5).collect()
    assert (top5[0]["word"], top5[0]["cnt"]) == ("the", 4)
    # remaining four are count-2 words; engine tiebreak is word-asc
    assert [r["word"] for r in top5[1:]] == ["dog", "fox", "lazy", "quick"]
    assert all(r["cnt"] == 2 for r in top5[1:])


def test_edge_cases(spark):
    # FIXTURES.md §A.4: lowercase happens BEFORE the regex; digits and
    # accented characters split tokens; empty input yields no tokens.
    assert _counts(spark, ["Hello, WORLD-2024! naïve café"]) == {
        "hello": 1,
        "world": 1,
        "na": 1,
        "ve": 1,
        "caf": 1,
    }
    assert _counts(spark, [""]) == {}
    assert _counts(spark, ["123 456 !!!"]) == {}


@pytest.mark.parametrize("nparts", [1, 3, 8])
def test_partitioning_invariance(spark, nparts):
    # counts are invariant under chunking/partitioning — mirrors that the
    # reference's answer is independent of CHUNK_BYTES (coordinator.py:47-60)
    lines = [f"alpha beta gamma alpha w{'abcdefg'[i % 7]}" for i in range(100)]
    df = spark.createDataFrame([(s,) for s in lines], "text string").repartition(nparts)
    got = {r["word"]: r["cnt"] for r in wc.word_counts(df, "text").collect()}
    assert got["alpha"] == 200
    assert got["beta"] == 100
    assert sum(got[f"w{c}"] for c in "abcdefg") == 100


def test_unique_and_total(spark):
    df = spark.createDataFrame([("a b b c c c",)], "text string")
    counts = wc.word_counts(df, "text")
    assert wc.unique_words(counts).collect()[0]["unique_words"] == 3
    assert wc.total_tokens(counts).collect()[0]["total_tokens"] == 6


def test_entry_smoke(spark):
    import __spark_entry__ as e

    df = e.entry(spark)
    rows = df.collect()
    assert len(rows) == 20
    assert rows == sorted(rows, key=lambda r: (-r["cnt"], r["word"]))
    assert df.columns == ["word", "cnt"]


def test_strict_tokenizer_matches_python_re(spark):
    """tokens_strict == re.findall(r'\b[a-z]+\b', text.lower()) bit-exactly."""
    import re

    from mapreduce_docker_spark.functions.tokenize import tokens_strict

    cases = [
        "hello world",
        "abc42 42abc a42b",          # digit-adjacent runs -> dropped by \b
        "Édouard café naïve",        # non-ASCII word chars -> dropped by \b
        "foo_bar _baz qux_",         # underscore is \w -> dropped by \b
        "dash-separated under scores!",
        "",
        "123 !!! \t",
        "mixedCASE TeXt with 9lives and lives9",
    ]
    df = spark.createDataFrame([(s,) for s in cases], "text string")
    got = [list(r["t"]) for r in df.select(tokens_strict("text").alias("t")).collect()]
    want = [re.findall(r"\b[a-z]+\b", s.lower()) for s in cases]
    assert got == want


def test_strict_vs_standard_divergence(spark):
    """Documents exactly where the two tokenizers differ (SURVEY §7 hard part 1)."""
    df = spark.createDataFrame([("café x42y plain",)], "text string")
    std = _counts(spark, ["café x42y plain"])
    strict = {
        r["word"]: r["cnt"]
        for r in wc.word_counts(df, "text", strict=True).collect()
    }
    assert std == {"caf": 1, "x": 1, "y": 1, "plain": 1}
    assert strict == {"plain": 1}


def test_format_topk_golden():
    from mapreduce_docker_spark.sources.text import format_topk

    out = format_topk([("the", 91836871), ("of", 50481034), ("a", 7)], k=3)
    assert out.splitlines() == [
        "   1. the       91,836,871",
        "   2. of        50,481,034",
        "   3. a                  7",
    ]
    assert format_topk([]) == "(empty)"


def test_observed_metrics_match_data(spark):
    """observe() reports the reference's A6 counters from the same job."""
    lines = ["hello world hello python world", "one two", ""]
    df = spark.createDataFrame([(s,) for s in lines], "text string")
    counts, obs = wc.word_counts_observed(df, "text")
    total = counts.agg(F.sum("cnt")).collect()[0][0]
    got = obs.get
    assert got["rows_scanned"] == 3
    assert got["tokens_mapped"] == total == 7
