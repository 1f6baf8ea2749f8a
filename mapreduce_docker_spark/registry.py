"""Query registry: the driver contract's single source of truth.

Every implemented operator from SURVEY.md §2 registers here as a
:class:`QuerySpec` — a named callable ``(spark, sf_dir) -> DataFrame`` plus,
where the semantics are SQL-expressible, an equivalent ANSI-SQL string the
DuckDB oracle can run on the same parquet fixtures. ``__spark_entry__.py``
just re-exports :func:`queries` / :func:`oracle_sql`.

Discipline (driver compare is column-name + value-hash based):
* every computed column is aliased identically in the Spark plan and the SQL;
* float aggregates are rounded identically on both sides;
* integer sums are BIGINT on both sides (DuckDB SUM(int) yields HUGEINT —
  always cast in the oracle);
* the oracle's ``events`` view keeps ns timestamps — oracle SQL must cast
  ``ts::TIMESTAMP`` to match the engine's µs normalization.
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    sql: str | None  # DuckDB oracle; None -> rows-only check
    section: str  # SURVEY.md §2 tag, e.g. "A1-A2", "U2"
    note: str = ""


_REGISTRY: dict[str, QuerySpec] = {}


def register(
    name: str, sql: str | None, section: str, note: str = ""
) -> Callable[[Callable[[SparkSession, str], DataFrame]], Callable]:
    def deco(fn: Callable[[SparkSession, str], DataFrame]) -> Callable:
        if name in _REGISTRY:
            raise ValueError(f"duplicate query name {name!r}")
        _REGISTRY[name] = QuerySpec(name=name, fn=fn, sql=sql, section=section, note=note)
        return fn

    return deco


def _load_all() -> None:
    """Import every module that registers queries (idempotent)."""
    import mapreduce_docker_spark.operators.wordcount_queries  # noqa: F401

    for mod in (
        "relational",
        "textanalysis",
        "dedup",
        "similarity",
        "multimodal",
        "asof",
        "udf",
    ):
        try:
            __import__(f"mapreduce_docker_spark.operators.{mod}_queries")
        except ImportError:
            pass
    import mapreduce_docker_spark.operators.skew  # noqa: F401

    try:
        import mapreduce_docker_spark.streaming.window_queries  # noqa: F401
    except ImportError:
        pass


def all_specs() -> dict[str, QuerySpec]:
    _load_all()
    return dict(_REGISTRY)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {name: spec.fn for name, spec in all_specs().items()}


def oracle_sql() -> dict[str, str]:
    return {name: spec.sql for name, spec in all_specs().items() if spec.sql is not None}
