"""Robustness gate: the WHOLE query surface on a vanilla SparkSession.

Round 1's only driver failures came from a session-conf coupling —
``events.parquet`` (TIMESTAMP_NANOS) was readable only under the engine's
own ``session.get_spark`` builder confs, and the driver hands queries an
external bare session (VERDICT.md "What's wrong" #1). This test reproduces
the driver harness exactly: a subprocess builds a no-defaults
``SparkSession`` and runs every registered query, value-comparing the
oracle-carrying ones against DuckDB.

Subprocess, not fixture: a Spark session is JVM-global per process, so an
in-process "vanilla" session would inherit conftest's engine confs.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SF_DIR = os.environ.get("VANILLA_SF_DIR", "/root/testdata/sf0.001")


def test_vanilla_session_full_gate(tmp_path):
    # cwd is a FOREIGN directory on purpose: round 2 found that pandas-UDF /
    # applyInPandas functions pickled by reference fail to deserialize in
    # Python workers when the harness cwd isn't the repo root (the package
    # isn't on the worker's sys.path); catalog._ship_package fixes it via
    # addPyFile and this cwd choice keeps that fixed.
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "vanilla_gate.py"), SF_DIR],
        capture_output=True,
        text=True,
        cwd=str(tmp_path),
        timeout=1800,
    )
    # last stdout line is the JSON summary (Spark may log above it)
    lines = [ln for ln in proc.stdout.strip().splitlines() if ln.startswith("{")]
    assert lines, f"no JSON summary; stdout={proc.stdout[-2000:]} stderr={proc.stderr[-2000:]}"
    summary = json.loads(lines[-1])
    assert summary["failures"] == {}, json.dumps(summary["failures"], indent=2)
    assert summary["checked"] >= 109
    assert proc.returncode == 0
