"""Similarity search over ``embeddings`` (SURVEY §2.10 U3, §2.3 J5 [EXT]).

Three tiers, mirroring how a 100 TB vector pipeline is actually built:

* ``sim_cosine_topk`` — exact brute-force cosine top-k for a bounded query
  set: the correctness baseline. Query side is broadcast; the scan side
  streams — cost is O(|queries| x N) with no shuffle of the big side.
* ``sim_ann_srp`` — sign-random-projection bucketing (axis-aligned
  hyperplanes over the first SRP_BITS dims): the hashing scale path.
  Candidates are co-bucketed only, then exactly reranked. Deterministic,
  hence fully oracle-checkable — unlike pyspark.ml's LSH whose random
  hyperplanes force rows-only checks (that API variant lives in
  ``sim_brp_lsh_ml``).
* ``sim_ann_ivf`` — inverted-file cells with multi-probe: the partitioning
  scale path (cells co-locate; a query touches nprobe partitions).
* Recall caveat: the fixture embeddings are near-isotropic (intra-label
  mean cosine ~0.0016), so NO sublinear method can reach high absolute
  recall at small probe fractions; tests/test_similarity.py therefore
  asserts recall against the scanned-fraction baseline (candidates are
  provably better than a random subset of equal size), the standard
  quality statement for approximate retrieval.
* ``sim_label_cohesion`` — cluster-quality diagnostic against the ground
  truth labels.

All cosines use unit-normalized vectors and a sequential left-fold dot
product (``zip_with`` + ``aggregate``), which DuckDB's ``list_reduce``
reproduces bit-for-bit; ranking always happens on the ROUNDED score with a
vec_id tiebreak so cross-engine float drift cannot reorder the top-k.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from mapreduce_docker_spark.functions.rounding import dround
from mapreduce_docker_spark.functions.rounding import sql as rsql
from mapreduce_docker_spark.operators.dedup_queries import (
    _SQL_UNIT,
    _dot,
    _sql_dot,
    _unit_vectors,
)
from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table, scatter

N_QUERIES_TOPK = 10
TOPK = 5
N_QUERIES_ANN = 50
ANN_TOPK = 3
IVF_NPROBE = 2
SRP_BITS = 4  # 2^4 = 16 buckets; more bits over-partitions small corpora (recall collapse)


@register(
    "sim_cosine_topk",
    _SQL_UNIT
    + f""",
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, c.label AS neighbor_label,
             {rsql(_sql_dot('q.u', 'c.u'), 4)} AS cos_sim
      FROM unit q JOIN unit c ON c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES_TOPK}
    )
    SELECT query_id, neighbor_id, neighbor_label, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {TOPK}
    """,
    section="U3",
    note=f"exact cosine top-{TOPK} for query vectors vec_id < {N_QUERIES_TOPK}; broadcast query side, streaming candidate scan",
)
def sim_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    unit = _unit_vectors(spark, sf_dir)
    q = unit.filter(F.col("vec_id") < N_QUERIES_TOPK).select(
        F.col("vec_id").alias("query_id"), F.col("u").alias("qu")
    )
    c = unit.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("label").alias("neighbor_label"),
        F.col("u").alias("cu"),
    )
    scored = (
        F.broadcast(q)
        .join(c, F.col("neighbor_id") != F.col("query_id"))
        .select(
            "query_id",
            "neighbor_id",
            "neighbor_label",
            dround(_dot(F.col("qu"), F.col("cu")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TOPK)
        .select("query_id", "neighbor_id", "neighbor_label", "cos_sim", "rank")
    )


_SQL_BUCKET = (
    "array_to_string(list_transform(embedding[1:" + str(SRP_BITS) + "], "
    "x -> CASE WHEN x >= 0 THEN '1' ELSE '0' END), '')"
)


@register(
    "sim_ann_srp",
    f"""
    WITH unit AS (
      SELECT vec_id, label,
             {_SQL_BUCKET} AS bucket,
             list_transform(embedding, x -> CAST(x AS DOUBLE) /
               sqrt(list_reduce(list_prepend(0.0,
                 list_transform(embedding, y -> CAST(y AS DOUBLE) * CAST(y AS DOUBLE))),
                 (a, b) -> a + b))) AS u
      FROM embeddings
    ),
    scored AS (
      SELECT q.vec_id AS query_id, c.vec_id AS neighbor_id, q.bucket AS bucket,
             {rsql(_sql_dot('q.u', 'c.u'), 4)} AS cos_sim
      FROM unit q JOIN unit c ON c.bucket = q.bucket AND c.vec_id <> q.vec_id
      WHERE q.vec_id < {N_QUERIES_ANN}
    )
    SELECT query_id, neighbor_id, bucket, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {ANN_TOPK}
    """,
    section="U3,J5",
    note=f"ANN via sign-random-projection bucketing ({SRP_BITS} axis hyperplanes -> {2**SRP_BITS} buckets) + exact rerank within bucket; deterministic so fully oracle-checked",
)
def sim_ann_srp(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = scatter(load_table(spark, sf_dir, "embeddings"))
    bucket = F.concat_ws(
        "",
        F.transform(
            F.slice(F.col("embedding"), 1, SRP_BITS),
            lambda x: F.when(x >= 0, F.lit("1")).otherwise(F.lit("0")),
        ),
    )
    sq_sum = F.aggregate(
        F.transform(F.col("embedding"), lambda y: y.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda a, b: a + b,
    )
    unit = emb.select(
        "vec_id",
        bucket.alias("bucket"),
        F.transform(F.col("embedding"), lambda x: x.cast("double") / F.sqrt(sq_sum)).alias(
            "u"
        ),
    )
    q = unit.filter(F.col("vec_id") < N_QUERIES_ANN).select(
        F.col("vec_id").alias("query_id"), F.col("bucket"), F.col("u").alias("qu")
    )
    c = unit.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("bucket").alias("bucket_c"),
        F.col("u").alias("cu"),
    )
    scored = (
        q.join(
            c,
            (F.col("bucket_c") == F.col("bucket"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            "bucket",
            dround(_dot(F.col("qu"), F.col("cu")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_TOPK)
        .select("query_id", "neighbor_id", "bucket", "cos_sim", "rank")
    )


@register(
    "sim_label_cohesion",
    _SQL_UNIT
    + f""",
    pairs AS (
      SELECT a.label,
             {rsql(_sql_dot('a.u', 'b.u'), 4)} AS cos_sim
      FROM unit a JOIN unit b ON a.label = b.label AND a.vec_id < b.vec_id
      WHERE a.vec_id < 200 AND b.vec_id < 200
    )
    SELECT label,
           count(*) AS n_pairs,
           {rsql("avg(cos_sim)", 4)} AS avg_intra_cos,
           {rsql("max(cos_sim)", 4)} AS max_intra_cos
    FROM pairs GROUP BY label
    """,
    section="U3",
    note="intra-cluster cosine cohesion vs ground-truth labels (bounded sample)",
)
def sim_label_cohesion(spark: SparkSession, sf_dir: str) -> DataFrame:
    unit = _unit_vectors(spark, sf_dir).filter(F.col("vec_id") < 200)
    a = unit.select("label", F.col("vec_id").alias("va"), F.col("u").alias("ua"))
    b = unit.select(
        F.col("label").alias("label_b"), F.col("vec_id").alias("vb"), F.col("u").alias("ub")
    )
    pairs = (
        a.join(b, (F.col("label") == F.col("label_b")) & (F.col("va") < F.col("vb")))
        .select("label", dround(_dot(F.col("ua"), F.col("ub")), 4).alias("cos_sim"))
    )
    return pairs.groupBy("label").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        dround(F.avg("cos_sim"), 4).alias("avg_intra_cos"),
        dround(F.max("cos_sim"), 4).alias("max_intra_cos"),
    )


@register(
    "sim_brp_lsh_ml",
    None,  # random hyperplanes inside pyspark.ml -> rows-only check
    section="U3,J5",
    note="pyspark.ml BucketedRandomProjectionLSH approxSimilarityJoin (API-parity variant; seeded but not SQL-reproducible)",
)
def sim_brp_lsh_ml(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.ml.feature import BucketedRandomProjectionLSH
    from pyspark.ml.functions import array_to_vector

    emb = load_table(spark, sf_dir, "embeddings").select(
        "vec_id", array_to_vector(F.col("embedding").cast("array<double>")).alias("features")
    )
    lsh = BucketedRandomProjectionLSH(
        inputCol="features", outputCol="hashes", bucketLength=2.0, numHashTables=3, seed=42
    )
    model = lsh.fit(emb)
    joined = model.approxSimilarityJoin(emb, emb, 2.0, distCol="dist")
    return (
        joined.filter(F.col("datasetA.vec_id") < F.col("datasetB.vec_id"))
        .select(
            F.col("datasetA.vec_id").alias("vec_a"),
            F.col("datasetB.vec_id").alias("vec_b"),
            dround(F.col("dist"), 4).alias("euclidean_dist"),
        )
    )


# ---------------------------------------------------------------------------
# IVF-style ANN: centroid cells + in-cell exact rerank
# ---------------------------------------------------------------------------
# The other half of the ANN design space next to SRP hashing: partition the
# vector space by nearest-centroid (inverted file), search only the query's
# cell (nprobe=1). At 100 TB the cell assignment is the partitioning key —
# each cell's vectors co-locate, a query touches one partition instead of
# the corpus. Centroids are unit-normalized per-label component means — a
# deterministic "trained" quantizer (in production: pyspark.ml.KMeans on a
# sample; the oracle needs bit-reproducible centers, and HOW they were
# trained is orthogonal to the operator shape under test). Component means
# are rounded at 6dp before use and assignment ranks on the ROUNDED score
# (cent_id tiebreak) so float accumulation drift cannot flip a near-tie
# assignment across engines.


def _ivf_centroids(unit: DataFrame) -> DataFrame:
    """(cent_id, cu): unit-normalized per-label mean vectors."""
    comp = (
        unit.select("label", F.posexplode("u").alias("pos", "val"))
        .groupBy("label", "pos")
        .agg(dround(F.avg("val"), 6).alias("m"))
    )
    raw = comp.groupBy("label").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("pos", "m"))), lambda s: s["m"]
        ).alias("craw")
    )
    norm = F.sqrt(
        F.aggregate(
            F.transform(F.col("craw"), lambda y: y * y), F.lit(0.0), lambda a, b: a + b
        )
    )
    return raw.select(
        F.col("label").alias("cent_id"),
        F.transform(F.col("craw"), lambda x: x / norm).alias("cu"),
    )


_SQL_IVF_CENT = f"""
    comp AS (
      SELECT label, i, {rsql('avg(u[i])', 6)} AS m
      FROM unit, unnest(generate_series(1, len(u))) AS t(i)
      GROUP BY label, i
    ),
    centraw AS (SELECT label AS cent_id, list(m ORDER BY i) AS craw FROM comp GROUP BY label),
    cent AS (
      SELECT cent_id,
             list_transform(craw, x -> x / sqrt(list_reduce(
               list_prepend(0.0, list_transform(craw, y -> y * y)),
               (a, b) -> a + b))) AS cu
      FROM centraw
    )
"""


@register(
    "sim_ann_ivf",
    _SQL_UNIT
    + ","
    + _SQL_IVF_CENT
    + f""",
    assign AS (
      SELECT v.vec_id, v.label, v.u, c.cent_id,
             row_number() OVER (
               PARTITION BY v.vec_id
               ORDER BY {rsql(_sql_dot('v.u', 'c.cu'), 4)} DESC, c.cent_id ASC) AS rn
      FROM unit v JOIN cent c ON true
    ),
    cells AS (SELECT vec_id, label, u, cent_id FROM assign WHERE rn = 1),
    probes AS (SELECT vec_id, u, cent_id FROM assign
               WHERE rn <= {IVF_NPROBE} AND vec_id < {N_QUERIES_ANN}),
    scored AS (
      SELECT q.vec_id AS query_id, n.vec_id AS neighbor_id,
             CAST(n.cent_id AS INTEGER) AS cell,
             {rsql(_sql_dot('q.u', 'n.u'), 4)} AS cos_sim
      FROM probes q JOIN cells n ON n.cent_id = q.cent_id AND n.vec_id <> q.vec_id
    )
    SELECT query_id, neighbor_id, cell, cos_sim, rank FROM (
      SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY cos_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {ANN_TOPK}
    """,
    section="U3,J5",
    note=f"IVF ANN: per-label-mean centroid cells, nprobe={IVF_NPROBE} multi-probe + in-cell exact rerank, top-{ANN_TOPK}; deterministic quantizer -> full oracle",
)
def sim_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    unit = _unit_vectors(spark, sf_dir)
    cent = _ivf_centroids(unit)
    scored_cent = unit.crossJoin(F.broadcast(cent)).select(
        "vec_id",
        "label",
        "u",
        "cent_id",
        dround(_dot(F.col("u"), F.col("cu")), 4).alias("cscore"),
    )
    wa = Window.partitionBy("vec_id").orderBy(F.desc("cscore"), F.asc("cent_id"))
    ranked = scored_cent.withColumn("rn", F.row_number().over(wa))
    # index side: each vector lives in exactly its nearest cell
    cells = ranked.filter(F.col("rn") == 1).select("vec_id", "u", "cent_id")
    # query side: probe the IVF_NPROBE nearest cells (multi-probe)
    q = (
        ranked.filter((F.col("rn") <= IVF_NPROBE) & (F.col("vec_id") < N_QUERIES_ANN))
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("cent_id").alias("cell"),
            F.col("u").alias("qu"),
        )
    )
    n = cells.select(
        F.col("vec_id").alias("neighbor_id"),
        F.col("cent_id").alias("n_cell"),
        F.col("u").alias("nu"),
    )
    scored = (
        q.join(
            n,
            (F.col("n_cell") == F.col("cell"))
            & (F.col("neighbor_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            "neighbor_id",
            F.col("n_cell").cast("int").alias("cell"),
            dround(_dot(F.col("qu"), F.col("nu")), 4).alias("cos_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cos_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= ANN_TOPK)
        .select("query_id", "neighbor_id", "cell", "cos_sim", "rank")
    )
