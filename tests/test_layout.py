"""Physical-layout assertions: partition pruning and exchange-free bucketed joins.

These tests check the PLAN, not just the rows — the properties that decide
whether the same query is feasible at 100 TB.
"""

from __future__ import annotations

import os

from mapreduce_docker_spark.sources.catalog import load_table
from mapreduce_docker_spark.sources.sinks import (
    read_bucketed,
    write_bucketed,
    write_partitioned,
)

SF = "/root/testdata/sf0.001"


def test_partitioned_write_prunes(spark, tmp_path):
    docs = load_table(spark, SF, "documents")
    out = os.path.join(str(tmp_path), "docs_by_lang")
    write_partitioned(docs, out, "lang")
    # value-preserving round trip
    back = spark.read.parquet(out)
    assert back.count() == docs.count()
    # a lang predicate must reach the file index, not a post-scan Filter:
    # pruned scan lists ONLY the matching partition directory
    pruned = back.filter(back["lang"] == "en")
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "lang" in plan.split("PartitionFilters", 1)[1].split("]", 1)[0], plan
    # pruning means the predicate is NOT re-checked row-by-row after the scan
    assert pruned.count() == docs.filter(docs["lang"] == "en").count()


def test_bucketed_join_has_no_exchange(spark, tmp_path):
    # the in-memory catalog forgets tables between sessions but their
    # warehouse directories survive — clear both before writing
    import shutil

    for t in ("orders_b", "cust_b"):
        spark.sql(f"DROP TABLE IF EXISTS {t}")
        loc = os.path.join(spark.conf.get("spark.sql.warehouse.dir").removeprefix("file:"), t)
        shutil.rmtree(loc, ignore_errors=True)
    orders = load_table(spark, SF, "orders")
    cust = load_table(spark, SF, "customer")
    write_bucketed(orders, "orders_b", "o_custkey", n_buckets=4)
    write_bucketed(
        cust.withColumnRenamed("c_custkey", "o_custkey"), "cust_b", "o_custkey", 4
    )
    # the fixture tables are broadcast-sized, which would hide the layout
    # effect under test — force the shuffle-join path the 100 TB case takes
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = read_bucketed(spark, "orders_b").join(
            read_bucketed(spark, "cust_b"), "o_custkey"
        )
        plan = joined._jdf.queryExecution().executedPlan().toString()
        # co-located layout: SortMergeJoin directly over the bucketed scans —
        # the shuffle was paid at write time
        assert "SortMergeJoin" in plan, plan
        assert "Exchange hashpartitioning" not in plan, plan
        # and it still computes the right thing
        expected = orders.join(
            cust.withColumnRenamed("c_custkey", "o_custkey"), "o_custkey"
        ).count()
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS orders_b")
        spark.sql("DROP TABLE IF EXISTS cust_b")


def test_repartition_by_range_gives_disjoint_files(spark, tmp_path):
    """Range-partitioned layout: per-file key ranges are disjoint.

    The time-series/sorted-layout lever: repartitionByRange + sortWithinPartitions
    writes files whose min/max key ranges do not overlap, so a range predicate
    prunes to O(1) files via parquet row-group stats — the complement of
    hash bucketing (equi-join co-location) tested above.
    """
    import pyarrow.parquet as pq

    orders = load_table(spark, SF, "orders")
    out = os.path.join(str(tmp_path), "orders_ranged")
    (
        orders.repartitionByRange(4, "o_orderdate")
        .sortWithinPartitions("o_orderdate")
        .write.mode("overwrite")
        .parquet(out)
    )
    ranges = []
    for f in os.listdir(out):
        if not f.endswith(".parquet"):
            continue
        md = pq.ParquetFile(os.path.join(out, f)).metadata
        cols = {md.schema.column(i).name: i for i in range(md.num_columns)}
        i = cols["o_orderdate"]
        stats = md.row_group(0).column(i).statistics
        ranges.append((stats.min, stats.max))
    assert len(ranges) == 4
    ranges.sort()
    for (lo_a, hi_a), (lo_b, hi_b) in zip(ranges, ranges[1:]):
        assert hi_a <= lo_b, f"overlapping file ranges: {(lo_a, hi_a)} vs {(lo_b, hi_b)}"
    # and the layout is value-preserving
    assert spark.read.parquet(out).count() == orders.count()
