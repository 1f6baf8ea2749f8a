"""Fixture-table catalog: parquet sources with schema normalization.

Replaces the reference's source bootstrap (download + unzip + glob scan,
reference coordinator.py:20-44) for the driver's parquet fixtures
(TESTDATA.md): ``spark.read.parquet`` provides the file discovery, splits,
predicate pushdown and column pruning that the reference hand-rolled or
lacked entirely.

The only normalization needed: ``events.ts`` is physically
TIMESTAMP(NANOS) which Spark cannot scan natively; with
``spark.sql.legacy.parquet.nanosAsLong=true`` it arrives as a raw
nanosecond LongType and is floor-divided to microseconds here — the exact
truncation DuckDB applies when casting TIMESTAMP_NS -> TIMESTAMP, so engine
and oracle see identical values.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

# dims small enough to broadcast at ANY scale factor (bounded cardinality:
# region=5, nation=25 are fixed-size in TPC-H-style schemas). customer /
# supplier / part grow with sf, so they are NOT hinted here — Catalyst + AQE
# decide from stats.
BROADCAST_SAFE = frozenset({"region", "nation"})


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Load one fixture table, normalizing physical-type quirks."""
    if name not in TABLES:
        raise KeyError(f"unknown table {name!r}; expected one of {TABLES}")
    df = spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))
    if name == "events" and dict(df.dtypes).get("ts") == "bigint":
        # ns -> µs truncation via INTEGER division (DIV): float division here
        # would lose low bits at ~1.7e18 ns and drift ±1µs from DuckDB's
        # parquet reader, which truncates exactly.
        df = df.withColumn(
            "ts", F.expr("timestamp_micros(CAST(ts DIV 1000 AS BIGINT))")
        )
    return df


def register_views(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    """Load every fixture table and register it as a temp view."""
    out = {}
    for name in TABLES:
        df = load_table(spark, sf_dir, name)
        df.createOrReplaceTempView(name)
        out[name] = df
    return out
