"""mapreduce_docker_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the capabilities of the reference system
``arshadvani3/mapreduce-docker`` (a distributed streaming MapReduce word-count:
coordinator.py + worker.py over RPyC/Docker), rebuilt Spark-first:

* the reference's entire production pipeline (chunked text scan -> lowercase ->
  regex tokenize -> map-side combine -> global merge -> top-k / TSV sink,
  reference coordinator.py:47-134, worker.py:9-17) collapses into one
  declarative DataFrame plan in :mod:`.operators.wordcount`;
* the scheduling machinery the reference hand-rolls (async dispatch,
  backpressure, round-robin partitioning, incremental merge — reference
  coordinator.py:62-107) is *not* reimplemented: Catalyst/Tungsten and the
  DAG scheduler subsume it (SURVEY.md §4);
* the mandated extension surface (relational core, window functions, dedup,
  similarity search, text analysis, multimodal columns, event-time streaming)
  lives in :mod:`.operators`, :mod:`.streaming`.

Every operator is designed for the 100 TB / 1000-executor design point:
no ``collect()`` in operator paths, broadcast only for bounded dims,
partial-aggregation-friendly shapes, AQE on by default.
"""

__version__ = "0.1.0"

from mapreduce_docker_spark.session import get_spark  # noqa: F401
