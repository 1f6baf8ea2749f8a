"""Cross-engine deterministic rounding.

``F.round`` on a Spark DOUBLE routes through the value's shortest decimal
representation (java.math.BigDecimal HALF_UP on ``Double.toString``), while
DuckDB's ``round`` operates on the binary value — they disagree whenever the
shortest repr lands exactly on a half at the target scale (e.g. 70160.805 ->
70160.81 in Spark, 70160.80 in DuckDB). Since the driver's correctness gate
is an exact value-hash, every rounded float the engine emits uses

    floor(x * 10^n + 0.5) / 10^n

instead: pure IEEE-double arithmetic that both engines evaluate bit-
identically. The matching oracle-SQL spelling is produced by :func:`sql`.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dround(col: Column | str, n: int) -> Column:
    """Deterministic round-half-up of a double column to ``n`` decimals."""
    c = F.col(col) if isinstance(col, str) else col
    scale = F.lit(float(10**n))
    return F.floor(c * scale + F.lit(0.5)) / scale


def sql(expr: str, n: int) -> str:
    """DuckDB spelling of :func:`dround` for oracle queries."""
    return f"floor(({expr}) * {float(10 ** n)} + 0.5) / {float(10 ** n)}"
