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

One trap inside that formula: Spark's ``floor(double)`` returns LONG, so for
|x * 10^n| beyond Long range the conversion clamps (1e15 at 4 decimals came
back as 922337203685477.6 — found by tests/test_rounding_properties.py),
while DuckDB's ``floor`` is double -> double. The fix rides an IEEE fact:
every double with magnitude >= 2^52 is already integral, so floor is the
identity there and the long conversion is only used where it is exact —
|y| < 2^52 is far inside Long range. Both branches are bit-identical to
DuckDB's double floor, keeping 100 TB-scale aggregates (global sums DO
reach 1e15) hash-stable.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# doubles at or above this magnitude have no fractional part (ulp >= 1)
_INTEGRAL_THRESHOLD = 2.0**52


def dround(col: Column | str, n: int) -> Column:
    """Deterministic round-half-up of a double column to ``n`` decimals."""
    c = F.col(col) if isinstance(col, str) else col
    scale = F.lit(float(10**n))
    y = c * scale + F.lit(0.5)
    int_part = F.when(
        F.abs(y) < F.lit(_INTEGRAL_THRESHOLD), F.floor(y).cast("double")
    ).otherwise(y)
    return int_part / scale


def spark_sql(expr: str, n: int) -> str:
    """Spark-SQL-TEXT spelling of :func:`dround` for raw ``spark.sql()``
    interface queries.

    Spark SQL's ``floor(double)`` returns LONG — so the plain formula
    clamps +Inf to Long.MAX (9.22e18) and maps NaN to 0 where DuckDB's
    double->double ``floor`` propagates both (measured by the r12 band-4
    nonfinite differential regime on sql_interface_revenue_by_nation).
    This emits the same two-branch form dround builds with the DataFrame
    API; the D suffixes keep the literals DOUBLE (bare 100.0 parses as
    DECIMAL in Spark SQL). Catalyst de-duplicates the repeated aggregate
    subexpression into one buffer, so the spelling costs nothing.
    """
    scale = float(10**n)
    y = f"(({expr}) * {scale}D + 0.5D)"
    return (
        f"(CASE WHEN abs({y}) < {_INTEGRAL_THRESHOLD}D "
        f"THEN CAST(floor({y}) AS DOUBLE) ELSE {y} END / {scale}D)"
    )


def sql(expr: str, n: int) -> str:
    """DuckDB spelling of :func:`dround` for oracle queries.

    DuckDB's ``floor`` is double -> double (no Long conversion), so the
    plain formula already equals :func:`dround`'s two-branch form bit-for-
    bit: below 2^52 both floor exactly, at or above it floor is the
    identity on an already-integral double.
    """
    return f"floor(({expr}) * {float(10 ** n)} + 0.5) / {float(10 ** n)}"
