"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over :mod:`mapreduce_docker_spark.registry`; every operator from
SURVEY.md §2 registers there with a (spark, sf_dir) callable and — where
SQL-expressible — a DuckDB oracle string. See COVERAGE.md for the
§2-inventory -> query-name map.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from mapreduce_docker_spark import registry
from mapreduce_docker_spark.operators import wordcount as _wc
from mapreduce_docker_spark.sources.catalog import load_table as _load_table

_SMOKE_SF_DIR = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on sf0.001: reference-parity word-count top-20.

    Reproduces the reference's entire production pipeline (chunk scan ->
    lowercase -> tokenize -> combine -> merge -> rank; reference
    coordinator.py:47-134, worker.py:9-17) as one declarative plan over
    ``documents.text``.
    """
    docs = _load_table(spark, _SMOKE_SF_DIR, "documents")
    return _wc.wordcount_pipeline(docs, "text", k=20)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent ANSI SQL per query (omitted -> rows-only check)."""
    return registry.oracle_sql()
