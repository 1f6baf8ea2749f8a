"""RDD-parity word count: the reference's two MapReduce shapes on Spark RDDs.

SURVEY.md §3.2: the reference ships a production path (map-side combiner,
worker.py:15) and a dormant classic 3-phase map->shuffle->reduce path
(worker.py:19-23, test_mapreduce.py:59-63). Both are reproduced here on the
RDD API with the same tokenizer semantics as the DataFrame engine, plus the
lesson the reference itself teaches (README.md:131-141): the combiner form
(``reduceByKey``/``aggregateByKey``) strictly dominates ``groupByKey``,
which ships every (word, 1) pair through the shuffle — Spark's own
``reduceByKey > groupByKey`` guidance is the same insight.

These exist as an API-parity demonstration and equality witness for the
DataFrame flagship (tests assert identical results); the DataFrame path is
the engine's hot path — Tungsten rows, codegen, AQE — and is what every
`queries()` entry uses.
"""

from __future__ import annotations

import re
from collections import Counter
from operator import add
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

from pyspark.sql.types import LongType, StringType, StructField, StructType

# exact reference tokenizer (worker.py:6,13): lowercase then \b[a-z]+\b
_WORD_RE = re.compile(r"\b[a-z]+\b")

_SCHEMA = StructType(
    [StructField("word", StringType(), False), StructField("cnt", LongType(), False)]
)


def _tokenize(line: str) -> list[str]:
    # FULL-casing lower, deliberately: this is the reference-exact strict
    # lane (pinned equal to tokens_strict, which is exempt from the r14
    # simple-casing fold law — see functions/tokenize.py)
    return _WORD_RE.findall(line.lower())


def wordcount_reduce_by_key(lines) -> "RDD":  # noqa: F821 - RDD typing needs the jvm
    """Production shape: flatMap -> (w, 1) -> reduceByKey(add).

    ``reduceByKey`` applies the combiner per map partition before the
    shuffle — the exact role of the reference's per-chunk ``Counter``
    (worker.py:15, README.md:131-141).
    """
    return (
        lines.flatMap(_tokenize)
        .map(lambda w: (w, 1))
        .reduceByKey(add)
    )


def wordcount_combiner_partitions(lines) -> "RDD":  # noqa: F821
    """Closest literal analog of the reference worker: one Counter per partition.

    ``mapPartitions(Counter)`` mirrors ``exposed_map`` (worker.py:9-17) —
    a whole input slice folded to its word->count dict before any data
    movement — then ``reduceByKey`` plays the coordinator's merge loop
    (coordinator.py:74-83).
    """

    def combine(it: Iterable[str]) -> Iterator[tuple[str, int]]:
        c: Counter[str] = Counter()
        for line in it:
            c.update(_tokenize(line))
        return iter(c.items())

    return lines.mapPartitions(combine).reduceByKey(add)


def wordcount_group_by_key(lines) -> "RDD":  # noqa: F821
    """Dormant 3-phase shape: explicit shuffle of all (w, 1) pairs.

    Reproduces worker.exposed_reduce (worker.py:19-23) / the test pipeline
    (test_mapreduce.py:54-69): group-by-key materializes ``{word: [1,1,..]}``
    then sums. Kept as the anti-pattern witness — identical answer, strictly
    more shuffle I/O (every token crosses the wire).
    """
    return (
        lines.flatMap(_tokenize)
        .map(lambda w: (w, 1))
        .groupByKey()
        .mapValues(sum)
    )


def to_df(spark: SparkSession, pairs) -> DataFrame:
    """(word, cnt) RDD -> DataFrame with the flagship's exact schema."""
    return spark.createDataFrame(pairs.map(lambda kv: (kv[0], kv[1])), _SCHEMA)
