"""Corpus bootstrap parity (S1-S3): fetch/unzip/glob via file:// URLs."""

from __future__ import annotations

import os
import zipfile

from mapreduce_docker_spark.operators import wordcount as wc
from mapreduce_docker_spark.sources.bootstrap import fetch_corpus
from mapreduce_docker_spark.sources.text import read_text_corpus


def _make_zip(path, members: dict[str, str]) -> str:
    with zipfile.ZipFile(path, "w") as zf:
        for name, text in members.items():
            zf.writestr(name, text)
    return f"file://{path}"


def test_fetch_unzips_and_sorts(tmp_path):
    url = _make_zip(
        str(tmp_path / "corpus.zip"),
        {"b.txt": "beta gamma\n", "sub/a.txt": "alpha alpha\n"},
    )
    dest = str(tmp_path / "txt")
    files = fetch_corpus(url, dest)
    assert [os.path.basename(f) for f in files] == ["a.txt", "b.txt"]
    assert not os.path.exists(os.path.join(dest, "corpus.zip")), "archive removed"


def test_fetch_is_idempotent(tmp_path):
    url = _make_zip(str(tmp_path / "c.zip"), {"x.txt": "one two\n"})
    dest = str(tmp_path / "txt")
    first = fetch_corpus(url, dest)
    os.remove(str(tmp_path / "c.zip"))  # fetch again must not need the source
    assert fetch_corpus(url, dest) == first


def test_plain_file_url(tmp_path):
    src = tmp_path / "plain.txt"
    src.write_text("hello world hello\n")
    files = fetch_corpus(f"file://{src}", str(tmp_path / "txt"))
    assert [os.path.basename(f) for f in files] == ["plain.txt"]


def test_fixture_digest_tracks_content(tmp_path):
    """Staging caches key on fixture CONTENT: rewriting a fixture in place
    (what the test-data generator does between rounds) must change the
    digest, or the bootstrap query would answer from a stale zip while the
    oracle reads the fresh parquet (advisor r3, medium)."""
    import shutil
    import time

    from mapreduce_docker_spark.sources.catalog import fixture_digest

    sf = tmp_path / "sf"
    sf.mkdir()
    (sf / "documents.parquet").write_bytes(b"v1-bytes")
    d1 = fixture_digest(str(sf), "documents")
    assert d1 == fixture_digest(str(sf), "documents")  # stable on no change
    time.sleep(0.01)  # ensure mtime_ns moves even on coarse filesystems
    (sf / "documents.parquet").write_bytes(b"v2-bytes!")
    d2 = fixture_digest(str(sf), "documents")
    assert d2 != d1
    # directory-style parquet works too
    shutil.rmtree(sf)
    ddir = sf / "documents.parquet"
    ddir.mkdir(parents=True)
    (ddir / "part-0.parquet").write_bytes(b"p0")
    d3 = fixture_digest(str(sf), "documents")
    (ddir / "part-1.parquet").write_bytes(b"p1")
    assert fixture_digest(str(sf), "documents") != d3


def test_bootstrap_query_tracks_fixture_rewrite(spark, tmp_path):
    """End-to-end staleness regression (advisor r3, medium): the bootstrap
    query stages a zip+extracted corpus in /tmp; when the fixture parquet is
    REWRITTEN IN PLACE at the same path (what the test-data generator does
    every round), the query must answer from the fresh content, not the
    cached staging of the old content."""
    import time

    from mapreduce_docker_spark.registry import all_specs

    fn = all_specs()["bootstrap_zip_wordcount"].fn
    sf = str(tmp_path)
    spark.createDataFrame(
        [(i, "alpha beta") for i in range(5)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    first = {(r["word"], r["cnt"]) for r in fn(spark, sf).collect()}
    assert first == {("alpha", 5), ("beta", 5)}
    # second call with unchanged fixture reuses the staged corpus
    assert {(r["word"], r["cnt"]) for r in fn(spark, sf).collect()} == first

    time.sleep(0.01)  # mtime_ns must move even on coarse filesystems
    spark.createDataFrame(
        [(i, "gamma delta gamma") for i in range(5)], "doc_id long, text string"
    ).coalesce(1).write.mode("overwrite").parquet(f"{sf}/documents.parquet")
    fresh = {(r["word"], r["cnt"]) for r in fn(spark, sf).collect()}
    assert fresh == {("gamma", 10), ("delta", 5)}, fresh


def test_bootstrap_feeds_the_flagship(spark, tmp_path):
    """S1-S3 -> S4 -> the full reference pipeline, end to end."""
    url = _make_zip(
        str(tmp_path / "corpus.zip"),
        {
            "a.txt": "The quick brown fox jumps over the lazy dog.\n",
            "b.txt": "The dog was really lazy, but the fox was quick!\n",
        },
    )
    dest = str(tmp_path / "txt")
    fetch_corpus(url, dest)
    counts = {
        (r["word"], r["cnt"])
        for r in wc.word_counts(read_text_corpus(spark, dest), "value").collect()
    }
    assert ("the", 4) in counts and ("fox", 2) in counts
