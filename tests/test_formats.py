"""CSV / ND-JSON round-trips preserve values and types (sources/formats.py)."""

from __future__ import annotations

import os

from mapreduce_docker_spark.sources.catalog import load_table
from mapreduce_docker_spark.sources import formats as fmt

SF = "/root/testdata/sf0.001"


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_csv_roundtrip(spark, tmp_path):
    orders = load_table(spark, SF, "orders")
    out = os.path.join(str(tmp_path), "orders_csv")
    schema = fmt.write_csv(orders, out)
    back = fmt.read_csv(spark, out, schema)
    assert back.schema == orders.schema
    assert _rows(back) == _rows(orders)


def test_ndjson_roundtrip(spark, tmp_path):
    ev = load_table(spark, SF, "events")
    out = os.path.join(str(tmp_path), "events_json")
    schema = fmt.write_ndjson(ev, out)
    back = fmt.read_ndjson(spark, out, schema)
    assert back.schema == ev.schema
    assert _rows(back) == _rows(ev)


def test_orc_roundtrip(spark, tmp_path):
    li = load_table(spark, SF, "lineitem").limit(5000)
    out = os.path.join(str(tmp_path), "lineitem_orc")
    fmt.write_orc(li, out)
    back = fmt.read_orc(spark, out)
    assert back.schema == li.schema
    assert _rows(back) == _rows(li)


def test_gzip_text_reads_natively(spark, tmp_path):
    """Reference S2 note: Spark reads .gz text transparently (no unzip step)."""
    import gzip

    from mapreduce_docker_spark.operators import wordcount as wc
    from mapreduce_docker_spark.sources.text import read_text_corpus

    p = tmp_path / "corpus.txt.gz"
    with gzip.open(p, "wt") as fh:
        fh.write("alpha beta alpha\nbeta beta gamma\n")
    counts = {
        (r["word"], r["cnt"])
        for r in wc.word_counts(read_text_corpus(spark, str(p)), "value").collect()
    }
    assert counts == {("alpha", 2), ("beta", 3), ("gamma", 1)}


def test_parquet_schema_evolution_merge(spark, tmp_path):
    """A later drop adding a column must union-read with the old drop:
    `mergeSchema` reconciles by name, old rows surface NULL for the new
    column. The 100 TB relevance: crawl snapshots evolve schemas and a
    store must read across generations without rewriting history."""
    v1 = spark.createDataFrame([(1, "a"), (2, "b")], "id long, txt string")
    v2 = spark.createDataFrame(
        [(3, "c", "en")], "id long, txt string, lang string"
    )
    v1.write.parquet(str(tmp_path / "drop=1"))
    v2.write.parquet(str(tmp_path / "drop=2"))
    merged = spark.read.option("mergeSchema", True).parquet(str(tmp_path))
    assert set(merged.columns) == {"id", "txt", "lang", "drop"}
    rows = {r["id"]: (r["txt"], r["lang"]) for r in merged.collect()}
    assert rows == {1: ("a", None), 2: ("b", None), 3: ("c", "en")}
