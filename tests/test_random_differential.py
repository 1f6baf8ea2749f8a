"""Pins for tools/random_differential.py's fixture generator.

The differential gate's value rests on three generator invariants that
must not drift: (1) seeds are reproducible — a finding's replay command
is `python tools/random_differential.py <seed>`; (2) generated parquet
carries EXACTLY the driver fixture schemas, so every registered query
and oracle runs unmodified; (3) primary keys honor the r11 primary-key
contract (SCALING.md): unique and non-NULL, because NULL/duplicate PKs
are excluded at ingest by contract and generating them would probe
outside it. No Spark needed — pure pyarrow/duckdb.
"""

from __future__ import annotations

import math
import os
import sys

import pyarrow.parquet as pq
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

from random_differential import SRC, build_fixture, write_fixture  # noqa: E402

PKS = {
    "region": 0, "nation": 0, "customer": 0, "supplier": 0, "part": 0,
    "orders": 0, "events": 0, "documents": 0, "embeddings": 0,
}


def _eq(a, b):
    if isinstance(a, float) and isinstance(b, float):
        return a == b or (math.isnan(a) and math.isnan(b))
    if isinstance(a, (list, tuple)):
        return (
            isinstance(b, (list, tuple))
            and len(a) == len(b)
            and all(_eq(x, y) for x, y in zip(a, b))
        )
    return a == b


@pytest.mark.parametrize("seed", [1, 7, 42])
def test_same_seed_same_fixture(seed):
    t1, t2 = build_fixture(seed), build_fixture(seed)
    assert t1.keys() == t2.keys()
    for k in t1:
        assert len(t1[k]) == len(t2[k]), k
        assert all(_eq(r1, r2) for r1, r2 in zip(t1[k], t2[k])), k


def test_different_seeds_differ():
    assert not all(
        _eq(a, b)
        for a, b in zip(build_fixture(1)["orders"], build_fixture(2)["orders"])
    )


@pytest.mark.parametrize("seed", [1, 7])
def test_primary_keys_unique_and_non_null(seed):
    tables = build_fixture(seed)
    for name, idx in PKS.items():
        keys = [row[idx] for row in tables[name]]
        assert None not in keys, name
        assert len(keys) == len(set(keys)), name
    # lineitem's PK is composite (l_orderkey, l_linenumber)
    li = [(row[0], row[3]) for row in tables["lineitem"]]
    assert all(k is not None and ln is not None for k, ln in li)
    assert len(li) == len(set(li))


def test_written_parquet_matches_driver_schemas(tmp_path):
    tables = build_fixture(3)
    write_fixture(tables, str(tmp_path))
    for name in tables:
        got = pq.read_schema(str(tmp_path / f"{name}.parquet"))
        want = pq.read_schema(f"{SRC}/{name}.parquet")
        assert got.equals(want), f"{name}: {got} != {want}"


def test_tolerant_eq_non_float_first_alignment_regression():
    """Regression pin for the r11 ADVICE fix (judge-r12 next-round #6):
    ``_tolerant_eq`` aligns rows by their NON-float cells first; float
    cells only break remaining ties, quantized at 3 decimals (coarser
    than the 1e-6 comparison tolerance). Two within-tolerance floats
    straddling a 3rd-decimal boundary (0.0014999 vs 0.0015001 — %.3f
    keys '0.001' vs '0.002') therefore CANNOT sort a row pair apart:
    the string cells pair p-with-p / q-with-q and the floats compare
    within tolerance. A float-first (or finer-quantized) key would sort
    the straddling floats apart, mis-pair p with q, and turn this
    benign association artifact into a hard mismatch."""
    from random_differential import _tolerant_eq

    a = [("p", 0.0014999), ("q", 0.0015001)]
    b = [("p", 0.0015001), ("q", 0.0014999)]
    assert _tolerant_eq(a, b)
    assert _tolerant_eq(b, a)
    # sanity: the straddle really crosses the 3-decimal key boundary
    assert "%.3f" % a[0][1] != "%.3f" % b[0][1]
    # and a REAL divergence (beyond tolerance) still fails
    c = [("p", 0.0014999), ("q", 0.1)]
    assert not _tolerant_eq(a, c)
