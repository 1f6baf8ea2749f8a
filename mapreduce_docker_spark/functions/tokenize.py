"""Tokenizer with exact reference semantics.

The reference tokenizes by lowercasing the chunk then taking
``re.findall(r"\\b[a-z]+\\b", text)`` (reference worker.py:6,13). Because the
input is lowercased first, the ``\\b`` boundaries add nothing beyond what the
character class already enforces: matches of ``[a-z]+`` are maximal runs of
ASCII letters, so digits, punctuation, whitespace and non-ASCII letters all
act as separators and never appear inside a token, and no empty token is ever
produced. ``regexp_extract_all(lower(x), '[a-z]+', 0)`` is therefore an exact
JVM-side equivalent — no Python UDF in the hot path.

Correctness notes (SURVEY.md §2 P2/P3):
* ``split``-based tokenization emits empty strings at boundaries and is NOT
  used;
* ``explode`` (not ``explode_outer``) drops rows whose text has no tokens,
  matching ``findall`` returning ``[]``.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# maximal ASCII-letter runs over lowercased text == reference \b[a-z]+\b
WORD_PATTERN = "[a-z]+"


def tokens(col: Column | str) -> Column:
    """array<string> of reference-semantics word tokens for a text column."""
    c = F.col(col) if isinstance(col, str) else col
    return F.regexp_extract_all(F.lower(c), F.lit(WORD_PATTERN), 0)


def word_rows(col: Column | str) -> Column:
    """One token per row (use under ``select``): ``explode(tokens(col))``."""
    return F.explode(tokens(col))
