"""Deterministic text-hashing primitives: shingles, MinHash, SimHash, rolling hash.

Each primitive is defined TWICE — as a Spark Column builder and as a DuckDB
SQL-fragment builder — from the same constants, so the engine and the oracle
compute bit-identical values. All hashing routes through ``md5`` (identical
lowercase-hex output on both engines); no engine-specific hash (Spark
``hash``/xxhash, DuckDB ``hash``) is ever used in an oracle-checked path.

Scale notes: every primitive here is a per-row expression (no shuffle); the
MinHash signature is 16 md5 evaluations per shingle — at 100 TB this is
embarrassingly parallel map work inside whole-stage codegen. The classic
alternative (pyspark.ml's MinHashLSH) needs a fitted model + vector
assembler; this formulation keeps the pipeline pure-SQL-expressible, which
is what makes the DuckDB hash-match oracle possible at all.

Reference lineage: the reference system has no dedup surface — this is the
[EXT] mandate (SURVEY.md §2.10 U1-U2; BASELINE.json north_star).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

NUM_HASHES = 16
BANDS = 4
ROWS_PER_BAND = NUM_HASHES // BANDS
SHINGLE_K = 3
FP_MOD = 1_000_000_007
FP_BASE = 31

# ---------------------------------------------------------------------------
# word shingles (k-gram over the token sequence)
# ---------------------------------------------------------------------------
# The fixture vocabulary is tiny (~31 words), so token-SET similarity
# saturates; k-gram shingles over the token SEQUENCE discriminate real
# near-duplicates (same word order) from coincidental vocab overlap.


def shingles(tokens_col: Column, k: int = SHINGLE_K) -> Column:
    """Distinct k-word shingles of a token array (guards short docs)."""
    n = F.size(tokens_col)
    grams = F.transform(
        F.sequence(F.lit(1), n - (k - 1)),
        lambda i: F.concat_ws(" ", F.slice(tokens_col, i, k)),
    )
    whole = F.array(F.concat_ws(" ", tokens_col))
    return F.array_distinct(F.when(n >= k, grams).otherwise(whole))


def sql_shingles(tokens_expr: str, k: int = SHINGLE_K) -> str:
    """DuckDB twin of :func:`shingles` (1-based inclusive list slicing)."""
    return (
        f"list_distinct(CASE WHEN len({tokens_expr}) >= {k} THEN "
        f"list_transform(generate_series(1, len({tokens_expr}) - {k - 1}), "
        f"i -> array_to_string(({tokens_expr})[i:i+{k - 1}], ' ')) "
        f"ELSE [array_to_string({tokens_expr}, ' ')] END)"
    )


# ---------------------------------------------------------------------------
# MinHash signature: sig[i] = min over shingles of md5('<i>:' || shingle)
# ---------------------------------------------------------------------------
# Lexicographic min over md5 hex strings is a valid uniform min-hash (hex of
# a uniform 128-bit value preserves order), and both engines agree on ASCII
# string ordering — no hex->int conversion needed.


def minhash_signature(shingles_col: Column, num_hashes: int = NUM_HASHES) -> Column:
    """array<string>(num_hashes) MinHash signature of a shingle array.

    Implemented as ONE nested higher-order function (outer transform over the
    seed array, inner transform over the shingles). Building 16 separate
    ``array_min(transform(...))`` branches inside one ``F.array`` silently
    corrupts results in Spark 4.1 — the per-branch lambda variables collide
    during analysis and some branches evaluate with the wrong seed binding —
    so do NOT refactor this back to a per-seed comprehension.
    """
    seeds = F.array(*[F.lit(f"{i}:") for i in range(num_hashes)])
    return F.transform(
        seeds,
        lambda seed: F.array_min(
            F.transform(shingles_col, lambda s: F.md5(F.concat(seed, s)))
        ),
    )


def sql_minhash_signature(shingles_expr: str, num_hashes: int = NUM_HASHES) -> str:
    mins = ", ".join(
        f"list_min(list_transform({shingles_expr}, s -> md5('{i}:' || s)))"
        for i in range(num_hashes)
    )
    return f"[{mins}]"


def band_signatures(sig_col: Column, bands: int = BANDS) -> Column:
    """array<string>(bands): md5 of each contiguous r-row slice of the signature."""
    r = NUM_HASHES // bands
    return F.array(
        *[
            F.md5(F.concat_ws("|", F.slice(sig_col, b * r + 1, r)))
            for b in range(bands)
        ]
    )


def sql_band_signatures(sig_expr: str, bands: int = BANDS) -> str:
    r = NUM_HASHES // bands
    parts = ", ".join(
        f"md5(array_to_string(({sig_expr})[{b * r + 1}:{b * r + r}], '|'))"
        for b in range(bands)
    )
    return f"[{parts}]"


# ---------------------------------------------------------------------------
# SimHash (16-bit): majority vote per bit over md5 hex digits of each token
# ---------------------------------------------------------------------------
# Bit j of a token's hash := high bit of hex digit j of md5(token). Each
# token OCCURRENCE votes +1/-1; simhash bit j is 1 iff the sum is > 0.

SIMHASH_BITS = 16
_HIGH_HEX = ("8", "9", "a", "b", "c", "d", "e", "f")


def simhash_votes(token_col: Column) -> list[Column]:
    """Per-token ±1 vote columns, one per simhash bit."""
    h = F.md5(token_col)
    return [
        F.when(F.substring(h, j + 1, 1).isin(*_HIGH_HEX), F.lit(1)).otherwise(F.lit(-1))
        for j in range(SIMHASH_BITS)
    ]


def simhash_from_vote_sums(sum_cols: list[Column]) -> Column:
    """Fold per-bit vote sums into the integer simhash value."""
    acc = F.lit(0)
    for j, s in enumerate(sum_cols):
        acc = acc + F.when(s > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return acc


def sql_simhash_vote(j: int, token_expr: str) -> str:
    highs = ", ".join(f"'{d}'" for d in _HIGH_HEX)
    return f"CASE WHEN substring(md5({token_expr}), {j + 1}, 1) IN ({highs}) THEN 1 ELSE -1 END"


# ---------------------------------------------------------------------------
# Rolling polynomial fingerprint over the token sequence (Rabin-Karp shape)
# ---------------------------------------------------------------------------


def rolling_fingerprint(tokens_col: Column) -> Column:
    """fp = fold(tokens, 0, (acc, t) -> (acc*31 + hash32(t)) % 1e9+7).

    hash32(t) = first 8 hex digits of md5(t) as an integer; intermediate
    values stay < 3.6e10, safely inside int64 on both engines.
    """
    return F.aggregate(
        tokens_col,
        F.lit(0).cast("long"),
        lambda acc, t: (
            acc * F.lit(FP_BASE)
            + F.conv(F.substring(F.md5(t), 1, 8), 16, 10).cast("long")
        )
        % F.lit(FP_MOD),
    )


def sql_rolling_fingerprint(tokens_expr: str) -> str:
    return (
        f"list_reduce(list_prepend(CAST(0 AS BIGINT), "
        f"list_transform({tokens_expr}, t -> ('0x' || substr(md5(t), 1, 8))::BIGINT)), "
        f"(acc, h) -> (acc * {FP_BASE} + h) % {FP_MOD})"
    )
