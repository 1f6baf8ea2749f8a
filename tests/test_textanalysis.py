"""Semantic checks for span-tile dedup and unigram surprisal.

Oracle parity (tests/test_oracle_parity.py) proves engine == DuckDB; these
pin the SEMANTICS on crafted corpora where the expected answer is computed
by hand (tile boundaries, within-doc repeats, ragged tails, exact
log-likelihood arithmetic).
"""

from __future__ import annotations

import math

import pytest

from mapreduce_docker_spark.operators import dedup_queries as dq
from mapreduce_docker_spark.operators import textanalysis_queries as tq

_DOC_SCHEMA = "doc_id long, text string, lang string, source string, n_chars long"


@pytest.fixture()
def docs_dir(spark, tmp_path):
    def write(texts):
        rows = [(i, t, "en", "src0", len(t)) for i, t in enumerate(texts)]
        spark.createDataFrame(rows, _DOC_SCHEMA).coalesce(1).write.mode(
            "overwrite"
        ).parquet(str(tmp_path / "documents.parquet"))
        return str(tmp_path)

    return write


def test_span_tiles_cross_doc_and_within_doc(spark, docs_dir):
    sf_dir = docs_dir(
        [
            "aa bb cc dd ee ff",        # tiles: [aa bb cc][dd ee ff]
            "aa bb cc xx yy zz",        # tile 0 repeats doc0's -> dropped
            "pp qq rr pp qq rr pp",     # within-doc repeat + ragged tail
            "aa bb cc dd ee ff",        # fully duplicate doc -> empty
        ]
    )
    out = {r["doc_id"]: r for r in dq.dedup_span_tiles(spark, sf_dir).collect()}
    assert out[0]["clean_text"] == "aa bb cc dd ee ff"
    assert (out[0]["n_tiles"], out[0]["n_dropped"]) == (2, 0)
    assert out[1]["clean_text"] == "xx yy zz"
    assert (out[1]["n_tiles"], out[1]["n_dropped"]) == (2, 1)
    # first occurrence of "pp qq rr" kept, its repeat dropped, tail "pp" kept
    assert out[2]["clean_text"] == "pp qq rr pp"
    assert (out[2]["n_tiles"], out[2]["n_dropped"]) == (3, 1)
    # every tile of doc 3 already occurred in doc 0
    assert out[3]["clean_text"] == ""
    assert (out[3]["n_tiles"], out[3]["n_dropped"]) == (2, 2)


def test_span_tiles_conserve_token_mass(spark):
    """Corpus-wide: kept tokens + dropped tokens == original tokens."""
    from tests.conftest import SF_SMOKE
    from pyspark.sql import functions as F
    from mapreduce_docker_spark.functions.tokenize import tokens

    res = dq.dedup_span_tiles(spark, SF_SMOKE)
    kept_tokens = res.select(
        F.sum(F.size(tokens("clean_text"))).alias("s")
    ).collect()[0]["s"]
    orig = spark.read.parquet(f"{SF_SMOKE}/documents.parquet")
    orig_tokens = orig.select(F.sum(F.size(tokens("text"))).alias("s")).collect()[0]["s"]
    assert 0 < kept_tokens < orig_tokens  # fixtures HAVE repeated spans
    # a doc's tiles partition its tokens, so drops can only shrink mass
    per_doc = res.select(
        "doc_id", F.size(tokens("clean_text")).alias("k")
    ).join(
        orig.select("doc_id", F.size(tokens("text")).alias("o")), "doc_id"
    )
    assert per_doc.filter(F.col("k") > F.col("o")).count() == 0


def test_unigram_surprisal_exact_arithmetic(spark, docs_dir):
    sf_dir = docs_dir(["aa aa aa aa", "aa aa aa bb"])
    out = {r["doc_id"]: r for r in tq.text_unigram_surprisal(spark, sf_dir).collect()}
    # corpus: aa x7, bb x1, N=8
    lp_aa, lp_bb = math.log(7 / 8), math.log(1 / 8)
    exp0 = -(4 * lp_aa) / 4
    exp1 = -(3 * lp_aa + lp_bb) / 4
    assert out[0]["n_tokens"] == 4 and out[1]["n_tokens"] == 4
    # the engine rounds avg_nll to 6dp (cross-engine hash discipline)
    assert abs(out[0]["avg_nll"] - exp0) < 5.01e-7
    assert abs(out[1]["avg_nll"] - exp1) < 5.01e-7
    # the rarer-token doc is strictly more surprising
    assert out[1]["avg_nll"] > out[0]["avg_nll"]
