"""Derive the freshness-rotation stale list from recorded driver verdicts.

Usage: python tools/stale_report.py

The r6 hand-maintained rotation note drifted (it listed names the r6
window had in fact taken — judge-r6 ADVICE), so the per-round window
planning now reads the CORRECTNESS_r*.json files the driver actually
recorded and prints, per query, the last round it was driver-checked,
grouped oldest-first. The registry's rotation note must be written FROM
this output, never by hand.

r8 (judge-r7 "what's wrong" #2 + ADVICE): presence in a CORRECTNESS file
is no longer enough to count as "checked" — an ERR row (e.g. the r3
canonicalizer crash on agg_collect_order_keys_array) looked identical to
a green one, so the planner would have believed a crashed query was once
verified. Each row is now classified:

  green           err is None and rows_match is truthy (full oracle pass)
  no_oracle-clean err == "no_oracle" and spark_rows is not None
                  (rows-only by contract; the driver executed the query)
  ERR             anything else (harness crash, mismatch, exception)

Only green / no_oracle-clean verdicts advance a query's last-verified
round. ERR rows are listed separately with the round they crashed in so
the planner sees them as NEVER-CLEAN, not as stale greens.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from mapreduce_docker_spark import registry  # noqa: E402


def classify(rec: dict) -> str:
    """Classify one driver verdict row: green / no_oracle-clean / ERR."""
    err = rec.get("err")
    if err is None and rec.get("rows_match"):
        return "green"
    if err == "no_oracle" and rec.get("spark_rows") is not None:
        return "no_oracle-clean"
    return "ERR"


def last_verified() -> tuple[dict[str, tuple[int, str]], dict[str, tuple[int, str]]]:
    """(clean, dirty): per query, (round, label) of the newest CLEAN verdict
    and the newest ERR verdict. A query can appear in both (crashed once,
    clean later); planners care about clean-recency and about any query
    whose ONLY rows are ERR."""
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    clean: dict[str, tuple[int, str]] = {}
    dirty: dict[str, tuple[int, str]] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name, rec in json.load(open(path)).items():
            label = classify(rec) if isinstance(rec, dict) else "ERR"
            if label == "ERR":
                if name not in dirty or dirty[name][0] < rnd:
                    dirty[name] = (rnd, label)
            else:
                if name not in clean or clean[name][0] < rnd:
                    clean[name] = (rnd, label)
    return clean, dirty


def main() -> None:
    registry._load_all()
    clean, dirty = last_verified()
    by_round: dict[int, list[str]] = defaultdict(list)
    for name in registry._REGISTRY:
        by_round[clean.get(name, (0, ""))[0]].append(name)

    # conclusively-closed harness limitations are NOT rotation priority:
    # their window slots are guaranteed crashes (registry._DRIVER_UNVERIFIABLE
    # records the evidence; judge-r8 next-round #2)
    unverifiable = getattr(registry, "_DRIVER_UNVERIFIABLE", {})
    never_clean = sorted(
        n for n in registry._REGISTRY if n not in clean and n not in unverifiable
    )
    if unverifiable:
        print(f"DRIVER-UNVERIFIABLE (harness) ({len(unverifiable)}) — closed, do NOT rotate in:")
        for n in sorted(unverifiable):
            rows = f"  [ERR rows r{dirty[n][0]}]" if n in dirty else ""
            print(f"  {n}{rows}  — {unverifiable[n][:100]}...")
        print()
    if never_clean:
        print(f"NEVER CLEAN ({len(never_clean)}) — rotate in with priority:")
        for n in never_clean:
            note = (
                f"  [last ERR r{dirty[n][0]}]" if n in dirty else "  [never windowed]"
            )
            in_window = "  [in current window]" if n in registry._PRIORITY_WINDOW else ""
            print(f"  {n}{note}{in_window}")
        print()

    for rnd in sorted(k for k in by_round if k):
        names = sorted(by_round[rnd])
        print(f"last CLEAN verdict r{rnd} ({len(names)}):")
        for n in names:
            kind = clean[n][1]
            err_note = (
                f"  [ERR r{dirty[n][0]} superseded]"
                if n in dirty and dirty[n][0] > clean[n][0]
                else ""
            )
            in_window = "  [in current window]" if n in registry._PRIORITY_WINDOW else ""
            print(f"  {n}  [{kind}]{err_note}{in_window}")


if __name__ == "__main__":
    main()
