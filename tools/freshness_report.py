"""CORRECTNESS row-freshness report — the rotation policy's dashboard.

    python tools/freshness_report.py

Reads every ``CORRECTNESS_r*.json`` in the repo root plus the live
registry order and prints, without starting Spark:

- the per-round green-row histogram (how stale the board is),
- every query whose LATEST green row is older than two rounds,
- every registered query with NO driver row at all (newcomers),
- whether each of those is currently inside the checked window.

The standing rotation policy (queries.py::_DEMOTED_TAIL header) says
code-changed queries re-window first, then the oldest rows; this
report is the "oldest rows" worklist, mechanized so each round's
rotation starts from facts instead of set-differences by hand.
"""

from __future__ import annotations

import glob
import json
import os
import re
import sys
from collections import Counter

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def registry_order() -> tuple[list[str], set[str]]:
    """Registry names in window order from the live registry (imports
    pyspark for the DataFrame types but starts no JVM)."""
    sys.path.insert(0, REPO)
    from cs_tutorial_reporting_spark.queries import QUERIES

    names = list(QUERIES)
    return names, set(names[:50])


def main() -> int:
    files = sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
    latest_green: dict[str, int] = {}
    for path in files:
        rnd = int(re.search(r"_r(\d+)", path).group(1))
        for name, row in json.load(open(path)).items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if ok:
                latest_green[name] = max(latest_green.get(name, 0), rnd)
    cur = max(
        (int(re.search(r"_r(\d+)", p).group(1)) for p in files), default=0
    )
    names, window = registry_order()
    hist = Counter(latest_green.get(n, 0) for n in names)
    print(f"registered queries: {len(names)}   latest driver round: r{cur}")
    print("latest-green-row histogram (0 = never attested):")
    for rnd in sorted(hist):
        label = "never" if rnd == 0 else f"r{rnd}"
        print(f"  {label:>6}: {hist[rnd]}")
    stale = [
        (n, latest_green.get(n, 0))
        for n in names
        if latest_green.get(n, 0) < cur - 1
    ]
    if stale:
        print(f"\nowed a row (older than r{cur - 1}), oldest first:")
        for n, rnd in sorted(stale, key=lambda x: (x[1], x[0])):
            where = "WINDOW" if n in window else "tail"
            label = "never" if rnd == 0 else f"r{rnd}"
            print(f"  {label:>6}  {where:>6}  {n}")
        never_tail = [n for n, rnd in stale if rnd == 0 and n not in window]
        if never_tail:
            print(
                f"\n{len(never_tail)} never-attested entries sit in the "
                "tail — promote them next rotation"
            )
    else:
        print("\nno rotation debt: every query holds a row ≤ 1 round old")
    return 0


if __name__ == "__main__":
    sys.exit(main())
