"""Dump per-query .explain("formatted") files for the r15 optimization round.

Usage: python tools/dump_r15_plans.py <suffix> [name ...]
Writes plans/r15/<query>_<suffix>.txt for each requested headline query
(default: all HEADLINE). Executes each plan once first so AQE's FINAL plan
(isFinalPlan=true) is captured, same discipline as tools/dump_plans.py.
"""

from __future__ import annotations

import io
import os
import sys
import contextlib

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from bench import HEADLINE  # noqa: E402
from mapreduce_docker_spark.registry import all_specs  # noqa: E402
from mapreduce_docker_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r15"
)


def main() -> None:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    names = sys.argv[2:] or list(HEADLINE)
    os.makedirs(OUT_DIR, exist_ok=True)
    specs = all_specs()
    spark = get_spark(app_name="dump_r15_plans")
    try:
        for name in names:
            df = specs[name].fn(spark, SF_DIR)
            df.write.format("noop").mode("overwrite").save()
            buf = io.StringIO()
            with contextlib.redirect_stdout(buf):
                df.explain("formatted")
            path = os.path.join(OUT_DIR, f"{name}_{suffix}.txt")
            with open(path, "w") as fh:
                fh.write(f"# {name} — {suffix} (sf_dir={SF_DIR})\n\n")
                fh.write(buf.getvalue())
            print(f"wrote {path}")
    finally:
        spark.stop()


if __name__ == "__main__":
    main()
