"""Partitioned / bucketed sinks — the physical-layout levers for 100 TB.

The reference's only sink is a driver-written TSV (coordinator.py:131-134).
At scale, layout IS the optimization surface:

* ``write_partitioned`` — hive-style directory partitioning. Readers with a
  predicate on the partition column scan only matching directories
  (partition pruning: the listed files already exclude everything else).
* ``write_bucketed`` — pre-shuffled, hash-bucketed table layout. Two tables
  bucketed by the same key into the same bucket count join WITHOUT any
  exchange: the shuffle was paid once at write time and amortized over
  every subsequent join/aggregation. This is the Spark answer to the
  reference's fixed round-robin chunk->worker placement
  (coordinator.py:95-96) — except keyed, so co-location is meaningful.

tests/test_layout.py asserts the plan facts (pruned InMemoryFileIndex,
no Exchange under a bucketed join), not just row counts.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_partitioned(df: DataFrame, path: str, *cols: str, fmt: str = "parquet") -> None:
    """Write hive-partitioned by ``cols`` (low-cardinality keys only —
    one directory per value combination; a high-cardinality partition key
    means millions of tiny files, the classic scale failure)."""
    df.write.mode("overwrite").partitionBy(*cols).format(fmt).save(path)


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort_col: str | None = None,
    path: str | None = None,
) -> None:
    """Save as a bucketed (optionally sorted) table.

    ``n_buckets`` should be sized so one bucket of the LARGER table fits an
    executor's memory at target scale; both join sides must use the same
    column and count for the exchange-free plan.

    With ``path`` the table is EXTERNAL: dropping it keeps the files, whose
    names carry the bucket id (``..._00003.parquet``), so a later session
    can re-register a bucketed table over the same directory without
    rewriting — the basis of the race-free digest-keyed staging in
    operators/layout_queries.py.
    """
    w = df.write.mode("overwrite").bucketBy(n_buckets, bucket_col)
    if sort_col:
        w = w.sortBy(sort_col)
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)
