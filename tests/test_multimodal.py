"""Multimodal plumbing: binary columns, mapInPandas batches, stubs."""

from __future__ import annotations

import hashlib

import pandas as pd
import pytest
from pyspark.sql import functions as F

from mapreduce_docker_spark.operators import multimodal as mm
from tests.conftest import SF_SMOKE
from mapreduce_docker_spark.sources.catalog import load_table


def test_asset_schema(spark):
    assets = mm.with_binary_payload(load_table(spark, SF_SMOKE, "documents"))
    dt = dict(assets.dtypes)
    assert dt["payload"] == "binary"
    assert dt["meta"].startswith("struct<format:string,n_bytes:bigint,sha256:string")


def test_decode_stub_raises_without_decoder():
    with pytest.raises(NotImplementedError):
        mm.decode_image_batch(pd.Series([b"xx"]))


def test_decode_stub_with_injected_decoder():
    out = mm.decode_image_batch(pd.Series([b"ab", b"c"]), decoder=len)
    assert list(out) == [2, 1]


def test_extract_features_matches_python(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 5)
    feats = {r["doc_id"]: r for r in mm.extract_features(mm.with_binary_payload(docs)).collect()}
    for r in docs.select("doc_id", "text").collect():
        n, w, h, digest = mm.fake_decode_features(r["text"].encode())
        got = feats[r["doc_id"]]
        assert (got["n_bytes"], got["fake_width"], got["fake_height"], got["sha256"]) == (
            n, w, h, digest,
        )
        assert digest == hashlib.sha256(r["text"].encode()).hexdigest()


def test_frame_sample_covers_payload(spark):
    docs = load_table(spark, SF_SMOKE, "documents").filter(F.col("doc_id") < 10)
    frames = mm.frame_sample(mm.with_binary_payload(docs), n_frames=4).collect()
    by_doc = {}
    for r in frames:
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert set(by_doc) == set(range(10))
    for doc_id, rows in by_doc.items():
        assert 1 <= len(rows) <= 4
        assert sorted(r["frame_idx"] for r in rows) == list(range(len(rows)))


def test_binary_file_source_roundtrip(spark, tmp_path):
    from mapreduce_docker_spark.operators.multimodal import read_binary_assets

    payloads = {f"a{i}.bin": bytes([i]) * (10 + i) for i in range(3)}
    for name, data in payloads.items():
        (tmp_path / name).write_bytes(data)
    assets = read_binary_assets(spark, str(tmp_path) + "/*.bin")
    rows = {r["uri"].rsplit("/", 1)[1]: r for r in assets.collect()}
    assert set(rows) == set(payloads)
    for name, data in payloads.items():
        assert bytes(rows[name]["payload"]) == data
        assert rows[name]["meta"]["n_bytes"] == len(data)
        assert rows[name]["meta"]["format"] == "bin"


def test_resize_payload_halves_bytes(spark):
    import hashlib

    from mapreduce_docker_spark.operators.multimodal import (
        resize_payload,
        with_binary_payload,
    )
    from mapreduce_docker_spark.sources.catalog import load_table

    docs = load_table(spark, SF_SMOKE, "documents").limit(20)
    assets = with_binary_payload(docs)
    out = {r["doc_id"]: r for r in resize_payload(assets, factor=2).collect()}
    for r in docs.select("doc_id", "text").collect():
        want = r["text"].encode()[::2]
        got = out[r["doc_id"]]
        assert bytes(got["payload"]) == want
        assert got["n_bytes"] == len(want)
        assert got["sha256"] == hashlib.sha256(want).hexdigest()
