"""Value pins for the three rows-only queries that had NONE (found while
building the generated ROWSONLY.md audit table, judge-r9 next-round #7):
``streaming_stream_stream_join``, ``sim_brp_lsh_ml`` and
``text_ml_pipeline_tfidf`` were exercised (rows returned, degenerate
probes) but nothing checked their VALUES. Each now has an independent
check in the established taxonomy:

* stream-stream join — twin-equality: the emitted (purchase, view) pairs
  equal the batch inner join under the identical time-bound predicate;
* ml BRP-LSH — recompute + containment: every returned pair's Euclidean
  distance re-derived in numpy from the raw embeddings (LSH prunes
  candidates but distances are exact, so values must match bit-for-bit
  after the engine's 4dp rounding), below the 2.0 threshold, a < b
  oriented, duplicate-free;
* ml TF-IDF pipeline — documented-formula recompute: tokenize/stopword/
  bigram replicated with re + the engine's STOPWORDS, bucket indices
  from HashingTF.indexOf (the library's own hash, used as a lookup, not
  by running the pipeline), idf = ln((m+1)/(df+1)) per the IDF docs, and
  the per-doc tfidf_mass compared exactly after the engine's rounding.
"""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from pyspark.sql import functions as F

from mapreduce_docker_spark.operators.similarity_queries import sim_brp_lsh_ml
from mapreduce_docker_spark.operators.textanalysis_queries import (
    STOPWORDS,
    text_ml_pipeline_tfidf,
)
from mapreduce_docker_spark.sources.catalog import load_table
from tests.conftest import SF_SMOKE


def test_stream_stream_join_equals_batch_twin(spark):
    """Twin-equality: on the single-file fixture the availableNow run is
    one micro-batch, so no join state can be evicted mid-run and the
    emitted set must equal the batch inner join exactly (same fixture,
    same predicate: same user, view within [purchase - 10 min, purchase])."""
    from mapreduce_docker_spark.streaming.stream_demo import run_stream_stream_join

    got = sorted(
        (r["purchase_event_id"], r["view_event_id"])
        for r in run_stream_stream_join(
            spark, SF_SMOKE, query_name="t_ssj_pin"
        ).collect()
    )

    ev = load_table(spark, SF_SMOKE, "events")
    views = ev.filter(F.col("event_type") == "view").select(
        F.col("user_id").alias("v_user"),
        F.col("event_id").alias("view_event_id"),
        F.col("ts").alias("view_ts"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("p_user"),
        F.col("event_id").alias("purchase_event_id"),
        F.col("ts").alias("purchase_ts"),
    )
    want = sorted(
        (r["purchase_event_id"], r["view_event_id"])
        for r in purchases.join(
            views,
            (F.col("p_user") == F.col("v_user"))
            & (F.col("view_ts") <= F.col("purchase_ts"))
            & (
                F.col("view_ts")
                >= F.col("purchase_ts") - F.expr("INTERVAL 10 MINUTES")
            ),
        ).collect()
    )
    assert got == want and got, (len(got), len(want))


def test_brp_lsh_distances_match_numpy_recompute(spark):
    """approxSimilarityJoin prunes CANDIDATES with random hyperplanes but
    computes the distance column exactly — so every returned pair must
    carry the numpy-recomputed Euclidean distance (bit-equal after the
    engine's 4dp rounding), sit under the 2.0 threshold, be a < b
    oriented and duplicate-free. (No recall assertion: LSH makes no
    false-negative guarantee.)"""
    np = pytest.importorskip("numpy")

    pairs = [
        (r["vec_a"], r["vec_b"], r["euclidean_dist"])
        for r in sim_brp_lsh_ml(spark, SF_SMOKE).collect()
    ]
    assert pairs, "fixture should produce at least one near pair"
    emb = {
        r["vec_id"]: np.array(r["embedding"], dtype=np.float64)
        for r in load_table(spark, SF_SMOKE, "embeddings").collect()
    }
    seen = set()
    for a, b, d in pairs:
        assert a < b
        assert (a, b) not in seen
        seen.add((a, b))
        exact = float(np.sqrt(np.sum((emb[a] - emb[b]) ** 2)))
        assert exact <= 2.0 + 1e-9, (a, b, exact)
        want = math.floor(exact * 10**4 + 0.5) / 10**4  # engine dround(·, 4)
        assert d == pytest.approx(want, abs=1e-12), (a, b, d, want, exact)


def test_ml_tfidf_pipeline_matches_documented_formula(spark, tmp_path):
    """Documented-formula recompute on a crafted 3-doc corpus: RegexTokenizer
    ([a-z]+, lowercase) == re.findall; StopWordsRemover == the engine's
    STOPWORDS tuple; NGram(2) == adjacent 'x y' pairs; HashingTF bucket =
    HashingTF.indexOf (library hash as a lookup table); IDF per its API
    doc, idf_j = ln((m+1)/(df_j+1)) with df counted on BUCKETS (collisions
    and all, as the pipeline sees them); tfidf_mass = sum_j tf_j * idf_j,
    compared after the engine's 4dp rounding. Doc 3 keeps one token ->
    zero bigrams -> zero mass (the empty-vector IDF branch)."""
    from pyspark.ml.feature import HashingTF

    texts = {
        1: "The quick brown fox jumps over the lazy dog",
        2: "A quick brown fox and a quick blue hare",
        3: "Fox!",  # one kept token, no bigram
    }
    (
        spark.createDataFrame(
            [(d, t) for d, t in texts.items()], "doc_id long, text string"
        )
        .coalesce(1)
        .write.mode("overwrite")
        .parquet(str(tmp_path / "documents.parquet"))
    )
    got = {
        r["doc_id"]: (r["n_kept_tokens"], r["n_bigrams"], r["tfidf_mass"])
        for r in text_ml_pipeline_tfidf(spark, str(tmp_path)).collect()
    }

    # independent recompute
    hasher = HashingTF(numFeatures=1 << 12)
    grams_by_doc = {}
    for d, t in texts.items():
        toks = re.findall(r"[a-z]+", t.lower())
        kept = [w for w in toks if w not in STOPWORDS]
        grams_by_doc[d] = [
            f"{kept[i]} {kept[i + 1]}" for i in range(len(kept) - 1)
        ]
    tf_by_doc = {
        d: Counter(hasher.indexOf(g) for g in grams)
        for d, grams in grams_by_doc.items()
    }
    m = len(texts)
    df = Counter(bucket for tf in tf_by_doc.values() for bucket in tf)
    want = {}
    for d, t in texts.items():
        toks = re.findall(r"[a-z]+", t.lower())
        kept = [w for w in toks if w not in STOPWORDS]
        mass = sum(
            tf * math.log((m + 1) / (df[bucket] + 1))
            for bucket, tf in tf_by_doc[d].items()
        )
        want[d] = (
            len(kept),
            max(len(kept) - 1, 0),
            math.floor(mass * 10**4 + 0.5) / 10**4,
        )
    assert got == want, (got, want)
