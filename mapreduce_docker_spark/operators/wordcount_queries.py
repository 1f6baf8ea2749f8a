"""Registry entries for the flagship word-count surface (SURVEY §2 REF ops).

Covers P1-P3 (lowercase / regex tokenize / implicit filter), A1-A5
(combiner + merge + distinct + totals), T1-T2 (top-k / full sort) — the
complete production query surface of the reference system
(reference worker.py:9-17, coordinator.py:62-137).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from mapreduce_docker_spark.operators import wordcount as wc
from mapreduce_docker_spark.registry import register
from mapreduce_docker_spark.sources.catalog import load_table

# DuckDB-side tokenization with identical semantics (maximal [a-z]+ runs over
# lowercased text; no empty tokens).
_TOKENS_CTE = """
WITH toks AS (
  SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
  FROM documents
)
"""


@register(
    "wordcount",
    _TOKENS_CTE + "SELECT word, count(*) AS cnt FROM toks GROUP BY word",
    section="P1-P3,A1-A2",
    note="full word->count table; reference coordinator.py:119 + worker.py:9-17",
)
def q_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.word_counts(load_table(spark, sf_dir, "documents"), "text")


@register(
    "wordcount_top20",
    _TOKENS_CTE
    + """
    SELECT word, cnt FROM (
      SELECT word, count(*) AS cnt FROM toks GROUP BY word
    ) ORDER BY cnt DESC, word ASC LIMIT 20
    """,
    section="T1",
    note="top-20 with deterministic word-asc tiebreak (reference coordinator.py:126; tie order SURVEY §2 T4)",
)
def q_wordcount_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.top_k(wc.word_counts(load_table(spark, sf_dir, "documents"), "text"), 20)


@register(
    "wordcount_strict_top20",
    None,  # Python-re \b semantics need lookaround/Unicode-\b; RE2 (DuckDB) has neither
    section="P2-P3,T1",
    note="bit-exact reference tokenizer parity ((?U)\\b[a-z]+\\b); pinned against re.findall in tests/test_wordcount.py",
    pin=(
        "third-engine: tokens_strict == Python re.findall on the "
        "reference pattern, bit-exact "
        "(tests/test_wordcount.py::test_strict_tokenizer_matches_python_re)"
    ),
)
def q_wordcount_strict_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.top_k(
        wc.word_counts(load_table(spark, sf_dir, "documents"), "text", strict=True), 20
    )


@register(
    "wordcount_unique",
    _TOKENS_CTE + "SELECT count(DISTINCT word) AS unique_words FROM toks",
    section="A4",
    note="distinct-word count (reference coordinator.py:106,136)",
)
def q_wordcount_unique(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.unique_words(wc.word_counts(load_table(spark, sf_dir, "documents"), "text"))


@register(
    "wordcount_total_tokens",
    _TOKENS_CTE + "SELECT count(*) AS total_tokens FROM toks",
    section="A5",
    note="total mapped tokens (reference worker.py:16)",
)
def q_wordcount_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    return wc.total_tokens(wc.word_counts(load_table(spark, sf_dir, "documents"), "text"))


@register(
    "wordcount_console_top20",
    _TOKENS_CTE
    + """,
    t AS (
      SELECT word, cnt FROM (
        SELECT word, count(*) AS cnt FROM toks GROUP BY word
      ) ORDER BY cnt DESC, word ASC LIMIT 20
    ),
    r AS (
      SELECT word, cnt,
             row_number() OVER (ORDER BY cnt DESC, word ASC) AS rank,
             max(length(word)) OVER () AS width
      FROM t
    )
    SELECT CAST(rank AS INTEGER) AS rank,
           lpad(CAST(rank AS VARCHAR), 4, ' ') || '. ' ||
           rpad(word, CAST(width AS INTEGER), ' ') || '  ' ||
           lpad(format('{:,}', cnt), 15, ' ') AS line
    FROM r
    """,
    section="S6,T1",
    note="formatted console sink as a driver-checkable relation (reference coordinator.py:123-129): rank, word width-aligned to the longest word shown, thousands-separated counts — the exact f-string spec rendered as SQL on both engines; sources/text.py:format_topk is the driver-side twin",
)
def q_wordcount_console_top20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window

    top = wc.top_k(wc.word_counts(load_table(spark, sf_dir, "documents"), "text"), 20)
    rank = F.row_number().over(
        Window.orderBy(F.desc("cnt"), F.asc("word"))
    )
    width = F.max(F.length("word")).over(
        Window.partitionBy()
    )
    r = top.select("word", "cnt", rank.alias("rank"), width.alias("width"))
    line = F.concat(
        F.lpad(F.col("rank").cast("string"), 4, " "),
        F.lit(". "),
        # SQL-expr form: pyspark's rpad wants a literal width, but the
        # alignment width is data-dependent (longest word shown)
        F.expr("rpad(word, width, ' ')"),
        F.lit("  "),
        F.lpad(F.format_number("cnt", 0), 15, " "),
    )
    return r.select(F.col("rank").cast("int").alias("rank"), line.alias("line"))


@register(
    "wordcount_rdd",
    _TOKENS_CTE + "SELECT word, count(*) AS cnt FROM toks GROUP BY word",
    section="A1-A3,P1-P3",
    note="the reference's RDD-shaped path as a driver-checkable query: flatMap -> (w,1) -> reduceByKey (map-side combiner == reference worker.py:15); same oracle as the DataFrame flagship, proving path equality under the value hash. API-parity demo — the DataFrame path is the hot path",
)
def q_wordcount_rdd(spark: SparkSession, sf_dir: str) -> DataFrame:
    import re
    from operator import add

    from mapreduce_docker_spark.functions.tokenize import py_fold
    from mapreduce_docker_spark.operators.rdd_parity import to_df

    # maximal [a-z]+ runs over lowered text — the engine/oracle tokenizer
    # (rdd_parity's strict \b variant is the rows-only twin, see
    # wordcount_strict_top20)
    lines = load_table(spark, sf_dir, "documents").select("text").rdd.map(
        lambda r: r[0]
    )
    pairs = (
        # NULL text yields no tokens — the DataFrame lane gets this free
        # (explode(NULL) emits nothing) and the oracle's unnest(NULL)
        # matches; the Python lane must say it explicitly
        lines.flatMap(lambda s: re.findall(r"[a-z]+", py_fold(s)) if s else [])
        .map(lambda w: (w, 1))
        .reduceByKey(add)
    )
    return to_df(spark, pairs)


@register(
    "wordcount_tsv_roundtrip",
    _TOKENS_CTE + "SELECT word, count(*) AS cnt FROM toks GROUP BY word",
    section="S5,T2",
    note="TSV sink round-trip as a driver-checkable query: word counts written frequency-descending to a headerless tab-separated file (reference coordinator.py:131-134) and read back typed; same oracle as wordcount, so the sink is proven value-preserving under the hash",
)
def q_wordcount_tsv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    import hashlib
    import os
    import tempfile

    from mapreduce_docker_spark.sources.text import write_tsv

    counts = wc.ranked(wc.word_counts(load_table(spark, sf_dir, "documents"), "text"))
    # stable digest, NOT hash(): PYTHONHASHSEED salts hash() per process,
    # which would mint a fresh /tmp dir every run instead of reusing one
    h = hashlib.md5(os.path.abspath(sf_dir).encode()).hexdigest()[:12]
    out = os.path.join(tempfile.gettempdir(), f"wc_tsv_{h}")
    write_tsv(counts, out)
    return spark.read.schema("word string, cnt bigint").option("sep", "\t").csv(out)


@register(
    "bootstrap_zip_wordcount",
    """
    WITH toks AS (
      SELECT unnest(regexp_extract_all(lower(text), '[a-z]+')) AS word
      FROM documents WHERE doc_id < 100
    )
    SELECT word, count(*) AS cnt FROM toks GROUP BY word
    """,
    section="S1-S3,A1-A2",
    note="bootstrap fetch+unzip+glob as a driver-checkable query (reference coordinator.py:20-44): a deterministic zip of the first 100 documents is staged once, fetch_corpus pulls it over file:// and extracts, spark.read.text globs the result, and the word count matches the same documents' oracle — proving the staging path is value-preserving. The zip build collects 100 bounded rows (one-time fixture staging, not an operator path)",
)
def q_bootstrap_zip_wordcount(spark: SparkSession, sf_dir: str) -> DataFrame:
    import os
    import shutil
    import tempfile
    import zipfile

    from mapreduce_docker_spark.sources.bootstrap import fetch_corpus
    from mapreduce_docker_spark.sources.catalog import fixture_digest
    from mapreduce_docker_spark.sources.text import read_text_corpus

    # digest keyed on fixture CONTENT, not just path: the test-data
    # generator rewrites documents.parquet in place between rounds, and a
    # path-keyed cache would keep answering from the stale zip while the
    # oracle reads the fresh fixture (hash() is PYTHONHASHSEED-salted,
    # hence the md5 inside fixture_digest)
    h = fixture_digest(sf_dir, "documents")
    zip_path = os.path.join(tempfile.gettempdir(), f"bootstrap_{h}.zip")
    corpus_dir = os.path.join(tempfile.gettempdir(), f"bootstrap_corpus_{h}")
    if not os.path.exists(zip_path):
        rows = (
            load_table(spark, sf_dir, "documents")
            .filter("doc_id < 100")
            .select("doc_id", "text")
            .collect()
        )
        # NULL text contributes no tokens (oracle: lower(NULL) -> no rows),
        # so it stages as an empty line
        txt = "\n".join(
            (r["text"] or "").replace("\n", " ") for r in sorted(rows)
        )
        # process-unique tmp + atomic replace: the _write_once discipline
        # (a shared .tmp would interleave two cold stagers' writes)
        tmp = f"{zip_path}.tmp-{os.getpid()}"
        with zipfile.ZipFile(tmp, "w") as zf:
            zf.writestr("corpus_part0.txt", txt)
        os.replace(tmp, zip_path)
        shutil.rmtree(corpus_dir, ignore_errors=True)
    fetch_corpus(f"file://{zip_path}", corpus_dir)
    return wc.word_counts(read_text_corpus(spark, corpus_dir + "/*.txt"), "value")
