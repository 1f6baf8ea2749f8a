"""Plain-text corpus source + sinks (reference parity).

The reference ingests a directory of text files as UTF-8 lines batched into
~50 MB line-aligned chunks (reference coordinator.py:42-60) and sinks results
as a tab-separated file plus a formatted top-k console print
(coordinator.py:123-134). Spark equivalents:

* ``spark.read.text(dir)`` — built-in FileIndex globbing replaces the
  ``sorted(glob.glob(...))`` scan (coordinator.py:42); line records are the
  default; ``spark.sql.files.maxPartitionBytes=50m`` (session.py) reproduces
  the chunk granularity as input splits;
* decode errors: Spark's text source replaces invalid UTF-8 rather than
  dropping it (reference ignores errors, coordinator.py:49) — for pure-ASCII
  tokenization downstream (``[a-z]+``) the two are indistinguishable;
* TSV sink: ``word\\tcount`` frequency-descending (coordinator.py:131-134).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_text_corpus(spark: SparkSession, path: str) -> DataFrame:
    """Directory/glob of plain-text files -> DataFrame[value: string] (one row per line)."""
    return spark.read.text(path)


def write_tsv(df: DataFrame, path: str, single_file: bool = True) -> None:
    """Write a two-column (or n-column) result as a headerless TSV.

    ``single_file=True`` mirrors the reference's one-file sink
    (coordinator.py:131-134); at 100 TB scale pass ``False`` so each reduce
    partition writes independently.
    """
    out = df.coalesce(1) if single_file else df
    out.write.mode("overwrite").option("sep", "\t").csv(path)


def show_topk(df: DataFrame, k: int = 20) -> None:
    """Formatted top-k console sink (reference coordinator.py:123-129)."""
    df.show(k, truncate=False)


def format_topk(rows, k: int = 20) -> str:
    """Reference-style console rendering of ranked (word, count) rows.

    Spec per SURVEY.md §2 S6 (reference coordinator.py:123-129): one line
    per rank, word column width-aligned to the longest word shown,
    thousands separators on counts. Presentation-layer only — the engine
    result is the DataFrame; this renders a small collected head.
    """
    head = rows[:k]
    if not head:
        return "(empty)"
    width = max(len(w) for w, _ in head)
    return "\n".join(
        f"{i + 1:>4}. {w:<{width}}  {c:>15,}" for i, (w, c) in enumerate(head)
    )
