"""Measure-ingress normalization for second-moment aggregates.

The finite-measure law (r12 — judge-r11 next-round #6, measured then
adopted): DuckDB's variance family (``stddev_samp``/``stddev_pop``/
``var_pop``/``var_samp``, and ``corr``/``covar_*`` via the same
accumulator) THROWS ``OutOfRangeException`` the moment a non-finite value
(NaN OR +/-Inf — both measured) enters a group, while Spark returns NaN.
That asymmetry kept the variance family outside the DuckDB oracle
contract through r11 (SCALING.md "NaN frontier").

Resolution: variance-bearing queries normalize their measure columns at
ingress — non-finite -> NULL — on BOTH engines, the exact analog of the
finite-norm law every cosine-space ingress already carries. Aggregates
then skip the value the way they skip NULL (pandas' ``skipna=True``, R's
``na.rm``), the query's sum/avg/min/max stay internally consistent with
its stddev over the same population, non-finite-free groups are
bit-identical to the unnormalized form, and the whole family becomes
oracle-checkable under NaN/Inf probes. Queries WITHOUT second-moment
aggregates keep the r11 NaN-propagation contract (rounded sum/avg/min/max
of a NaN measure agree across engines — tests/test_crafted_truth35).

``isnan(NULL)`` is NULL on both engines, so the CASE falls through to the
value branch and NULL stays NULL; ``abs(NULL) < inf`` is NULL -> Spark's
``when`` yields NULL likewise.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_INF = float("inf")


def finite(col: Column | str) -> Column:
    """``col`` where finite, NULL on NaN/+Inf/-Inf (and NULL stays NULL)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.when(~F.isnan(c) & (F.abs(c) < F.lit(_INF)), c)


def sql_finite(expr: str) -> str:
    """DuckDB spelling of :func:`finite` (``isfinite`` covers NaN + Inf)."""
    return f"CASE WHEN isfinite({expr}) THEN {expr} END"
