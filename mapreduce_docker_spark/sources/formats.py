"""CSV / ND-JSON interchange formats (S7 generalization).

The reference reads raw text only; the parquet catalog (catalog.py) is the
engine's primary columnar source. These helpers round out the interchange
surface for pipelines that receive delimited or JSON-lines drops:

* schemas are ALWAYS passed explicitly on read — ``inferSchema`` costs an
  extra full scan of the data (prohibitive at scale) and type-guesses
  inconsistently; the writers return the exact ``StructType`` to read with.
* JSON is newline-delimited (one object per line) — the only JSON layout
  that splits across workers; a single top-level array cannot be split.
* timestamps round-trip in ISO-8601 UTC (session timezone is pinned UTC).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.types import StructType

# default JSON/CSV timestampFormat keeps only milliseconds; fixtures carry µs
_TS_FMT = "yyyy-MM-dd'T'HH:mm:ss.SSSSSSXXX"


def write_csv(df: DataFrame, path: str, sep: str = ",", header: bool = True) -> StructType:
    """Write CSV; returns the schema needed to read it back losslessly."""
    (
        df.write.mode("overwrite")
        .option("sep", sep)
        .option("header", header)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )
    return df.schema


def read_csv(
    spark: SparkSession,
    path: str,
    schema: StructType | str,
    sep: str = ",",
    header: bool = True,
) -> DataFrame:
    return (
        spark.read.schema(schema)
        .option("sep", sep)
        .option("header", header)
        .option("timestampFormat", _TS_FMT)
        .csv(path)
    )


def write_ndjson(df: DataFrame, path: str) -> StructType:
    """Write newline-delimited JSON; returns the read-back schema."""
    df.write.mode("overwrite").option("timestampFormat", _TS_FMT).json(path)
    return df.schema


def read_ndjson(spark: SparkSession, path: str, schema: StructType | str) -> DataFrame:
    return spark.read.schema(schema).option("timestampFormat", _TS_FMT).json(path)


def write_orc(df: DataFrame, path: str) -> StructType:
    """Write ORC (the columnar alternative Spark ships natively besides
    parquet); returns the read-back schema."""
    df.write.mode("overwrite").orc(path)
    return df.schema


def read_orc(spark: SparkSession, path: str) -> DataFrame:
    return spark.read.orc(path)
