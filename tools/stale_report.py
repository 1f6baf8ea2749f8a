"""Derive the freshness-rotation stale list from recorded driver verdicts.

Usage: python tools/stale_report.py

The r6 hand-maintained rotation note drifted (it listed names the r6
window had in fact taken — judge-r6 ADVICE), so the per-round window
planning now reads the CORRECTNESS_r*.json files the driver actually
recorded and prints, per query, the last round it was driver-checked,
grouped oldest-first. The registry's rotation note must be written FROM
this output, never by hand.
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


def last_checked() -> dict[str, int]:
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    out: dict[str, int] = {}
    for path in sorted(glob.glob(os.path.join(root, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        for name in json.load(open(path)):
            out[name] = max(out.get(name, 0), rnd)
    return out


def main() -> None:
    registry._load_all()
    seen = last_checked()
    by_round: dict[int, list[str]] = defaultdict(list)
    for name in registry._REGISTRY:
        by_round[seen.get(name, 0)].append(name)
    for rnd in sorted(by_round):
        names = sorted(by_round[rnd])
        label = f"r{rnd}" if rnd else "NEVER DRIVER-CHECKED"
        print(f"last checked {label} ({len(names)}):")
        for n in names:
            in_window = "  [in current window]" if n in registry._PRIORITY_WINDOW else ""
            print(f"  {n}{in_window}")


if __name__ == "__main__":
    main()
