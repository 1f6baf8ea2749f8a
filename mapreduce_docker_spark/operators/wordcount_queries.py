"""Registry entries for the flagship word-count surface (SURVEY §2 REF ops).

Covers P1-P3 (lowercase / regex tokenize / implicit filter), A1-A5
(combiner + merge + distinct + totals), T1-T2 (top-k / full sort) — the
complete production query surface of the reference system
(reference worker.py:9-17, coordinator.py:62-137).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_docker_spark.operators import wordcount as wc
from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table

# DuckDB-side tokenization with identical semantics (maximal [a-z]+ runs over
# lowercased text; no empty tokens).
_TOKENS_CTE = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
)
"""


@register(
    "wordcount",
    _TOKENS_CTE + "SELECT word, count(*) AS cnt FROM toks GROUP BY word",
    section="P1-P3,A1-A2",
    note="full word->count table; reference coordinator.py:119 + worker.py:9-17",
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.word_counts(load_table(spark, sf_dir, "documents"), "text")


@register(
    "wordcount_top20",
    _TOKENS_CTE
    + """
    SELECT word, cnt FROM (
      SELECT word, count(*) AS cnt FROM toks GROUP BY word
    ) ORDER BY cnt DESC, word ASC LIMIT 20
    """,
    section="T1",
    note="top-20 with deterministic word-asc tiebreak (reference coordinator.py:126; tie order SURVEY §2 T4)",
)
def q_wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.top_k(wc.word_counts(load_table(spark, sf_dir, "documents"), "text"), 20)


@register(
    "wordcount_strict_top20",
    None,  # Python-re \b semantics need lookaround/Unicode-\b; RE2 (DuckDB) has neither
    section="P2-P3,T1",
    note="bit-exact reference tokenizer parity ((?U)\\b[a-z]+\\b); pinned against re.findall in tests/test_wordcount.py",
)
def q_wordcount_strict_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.top_k(
        wc.word_counts(load_table(spark, sf_dir, "documents"), "text", strict=True), 20
    )


@register(
    "wordcount_unique",
    _TOKENS_CTE + "SELECT count(DISTINCT word) AS unique_words FROM toks",
    section="A4",
    note="distinct-word count (reference coordinator.py:106,136)",
)
def q_wordcount_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.unique_words(wc.word_counts(load_table(spark, sf_dir, "documents"), "text"))


@register(
    "wordcount_total_tokens",
    _TOKENS_CTE + "SELECT count(*) AS total_tokens FROM toks",
    section="A5",
    note="total mapped tokens (reference worker.py:16)",
)
def q_wordcount_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.total_tokens(wc.word_counts(load_table(spark, sf_dir, "documents"), "text"))
