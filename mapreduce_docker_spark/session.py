"""SparkSession factory with engine defaults.

The reference system's hand-tuned execution knobs (reference
coordinator.py:11-12: ``CHUNK_BYTES = 50_000_000``, ``MAX_INFLIGHT = 8``) map
onto declarative Spark configuration here:

* ``spark.sql.files.maxPartitionBytes=50m`` mirrors the 50 MB chunk
  granularity of the reference's streaming scan (coordinator.py:47-60);
* backpressure / in-flight capping is the task scheduler's job — nothing to
  configure beyond parallelism;
* AQE is on for the 100 TB design point: runtime shuffle-partition coalescing
  and skew-join splitting replace any hand-sized reduce phase.

``spark.sql.session.timeZone=UTC`` pins timestamp semantics so results match
the DuckDB oracle (naive UTC timestamps) bit-for-bit.

``spark.sql.legacy.parquet.nanosAsLong=true`` lets Spark scan the driver
fixtures' ``events.parquet`` (TIMESTAMP(NANOS) physical type, which Spark
has no native reader type for); the catalog layer converts ns -> µs on load
(see sources/catalog.py), matching DuckDB's ns->µs truncation.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import SparkSession

# sized for the local[32] harness; a real cluster deployment overrides these
_DEFAULTS = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.adaptive.coalescePartitions.enabled": "true",
    "spark.sql.adaptive.skewJoin.enabled": "true",
    "spark.sql.files.maxPartitionBytes": "50m",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # write TIMESTAMP as INT64 µs, not legacy INT96: INT96 carries no
    # min/max statistics, so range-partitioned layouts would lose rowgroup
    # pruning on timestamp keys (tests/test_layout.py pins this)
    "spark.sql.parquet.outputTimestampType": "TIMESTAMP_MICROS",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.serializer": "org.apache.spark.serializer.KryoSerializer",
    "spark.sql.autoBroadcastJoinThreshold": "64m",
    "spark.ui.enabled": "false",
    "spark.driver.memory": "8g",
    # managed-table location (bucketed layouts, sources/sinks.py); static
    # conf, so it must be set at session build, and never the repo cwd
    "spark.sql.warehouse.dir": os.path.join(
        tempfile.gettempdir(), "spark_graft_warehouse"
    ),
}


def get_spark(
    app_name: str = "mapreduce-docker-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    ``master`` defaults to ``local[$SPARK_GRAFT_CPUS]`` (env, default 32) —
    on a real cluster the caller passes the cluster master / lets
    spark-submit decide by passing ``master=""``.
    """
    # make the engine package importable in executor Python workers no matter
    # where the driver process was launched from (mapInPandas/pandas-UDF
    # closures reference module functions); must happen before JVM launch
    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    pp = os.environ.get("PYTHONPATH", "")
    if repo_root not in pp.split(os.pathsep):
        os.environ["PYTHONPATH"] = f"{repo_root}{os.pathsep}{pp}" if pp else repo_root

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    if master is None:
        master = f"local[{cpus}]"
    if shuffle_partitions is None:
        shuffle_partitions = int(cpus) if str(cpus).isdigit() else 32

    b = SparkSession.builder.appName(app_name)
    if master:
        b = b.master(master)
    conf = dict(_DEFAULTS)
    conf["spark.sql.shuffle.partitions"] = str(shuffle_partitions)
    if extra_conf:
        conf.update(extra_conf)
    for k, v in conf.items():
        b = b.config(k, v)
    return b.getOrCreate()
