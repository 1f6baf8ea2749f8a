"""Task-retry fault tolerance: transient executor failures must not change
results.

The reference has NO fault tolerance — a worker dying mid-RPC kills the
whole job (reference coordinator.py:97-104 has no retry around the async
poll). On a 1000-executor cluster, task attrition is a certainty, and the
Spark answer is deterministic task retry: a failed task's partition is
simply re-run, and because every operator here is a pure function of its
input split, the retried run is value-identical.

Subprocess, not fixture: local-mode retry needs master ``local[N, F]``
(maxFailures > 1), and the JVM session is process-global — conftest's
``local[8]`` session (maxFailures=1) cannot be reconfigured in-process.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import json, os, sys
sys.path.insert(0, {repo!r})
from pyspark import TaskContext
from pyspark.sql import SparkSession
from pyspark.sql import functions as F

marker_dir = {marker_dir!r}
spark = (
    SparkSession.builder.master("local[4, 2]")  # 4 threads, 2 attempts/task
    .appName("retry_gate")
    .config("spark.sql.shuffle.partitions", "4")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)

def flaky(batches):
    # Crash the FIRST attempt of every map partition, succeed on retry.
    # The marker file is the cross-attempt signal (local mode shares a FS).
    part = TaskContext.get().partitionId()
    marker = os.path.join(marker_dir, f"p{{part}}")
    if not os.path.exists(marker):
        open(marker, "w").close()
        raise RuntimeError("injected transient task failure")
    for pdf in batches:
        pdf["doubled"] = pdf["v"] * 2
        yield pdf[["id", "doubled"]]

df = spark.range(0, 1000, 1, 4).select(
    F.col("id"), (F.col("id") % 7).alias("v")
)
out = df.mapInPandas(flaky, "id long, doubled long")
rows = sorted((r["id"], r["doubled"]) for r in out.collect())
want = sorted((i, (i % 7) * 2) for i in range(1000))
markers = sorted(os.listdir(marker_dir))
print(json.dumps({{"ok": rows == want, "n": len(rows), "markers": markers}}))
spark.stop()
"""


def test_task_retry_is_value_transparent(tmp_path):
    marker_dir = str(tmp_path / "attempts")
    os.makedirs(marker_dir)
    script = _SCRIPT.format(repo=REPO, marker_dir=marker_dir)
    proc = subprocess.run(
        [sys.executable, "-c", script],
        capture_output=True,
        text=True,
        timeout=300,
        cwd=str(tmp_path),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    result = json.loads(proc.stdout.strip().splitlines()[-1])
    assert result["ok"], result
    assert result["n"] == 1000
    # every one of the 4 partitions crashed once and was retried
    assert result["markers"] == ["p0", "p1", "p2", "p3"], result
