"""Cross-engine property test for the deterministic-rounding keystone.

Every float the engine emits goes through ``functions.rounding.dround``
(Spark) and ``functions.rounding.sql`` (DuckDB oracle). The driver's
correctness gate is an exact value hash, so these two spellings must
evaluate BIT-IDENTICALLY on both engines for any double — this test feeds
both sides the same adversarial + random batch and compares exactly.
"""

from __future__ import annotations

import math

import duckdb
import numpy as np

from mapreduce_docker_spark.functions.rounding import dround
from mapreduce_docker_spark.functions.rounding import sql as rsql

# the documented failure mode of naive F.round: shortest-repr landing
# exactly on a half at the target scale (rounding.py module docstring)
_ADVERSARIAL = [
    70160.805,
    2.675,
    -2.675,
    0.005,
    -0.005,
    1.0049999999999999,
    123456789.004999,
    1e-12,
    -1e-12,
    0.0,
    1e15,
    -1e15,
    math.pi,
    -math.e * 1e6,
]


def test_dround_matches_oracle_spelling_bit_exactly(spark):
    rng = np.random.default_rng(7)
    vals = _ADVERSARIAL + list(rng.uniform(-1e7, 1e7, 5000)) + list(
        rng.uniform(-1.0, 1.0, 5000)
    )
    df = spark.createDataFrame([(float(v),) for v in vals], "x double")
    for n in (2, 4, 6):
        got = [
            r[0]
            for r in df.select(dround("x", n).alias("r")).collect()
        ]
        want = [
            r[0]
            for r in duckdb.sql(
                f"SELECT {rsql('x', n)} FROM (SELECT unnest(?::DOUBLE[]) AS x)",
                params=[[float(v) for v in vals]],
            ).fetchall()
        ]
        mism = [
            (v, g, w)
            for v, g, w in zip(vals, got, want)
            if (g != w) and not (g is None and w is None)
        ]
        assert not mism, f"scale {n}: {mism[:5]}"
