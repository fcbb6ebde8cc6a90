"""Per-query bench regression report vs the best-ever recorded time.

    python tools/bench_compare.py [new_bench.json] [old_bench.json]

``new`` defaults to running ``bench.py`` fresh; ``old`` defaults to the
per-query BEST across every ``BENCH_r*.json`` in the repo root (latest
round's total is still shown for context). Comparing against best-ever
— not just the previous round — stops slow drift from compounding:
three rounds of +30% each stay under a 1.5× per-round gate but trip a
best-ever gate at round two. Flags any query >1.5× slower (exit 1) so
a perf regression is as loud as a correctness one. Queries present on
only one side are listed but never flagged (new/renamed queries have
no baseline).
"""

from __future__ import annotations

import glob
import json
import os
import re
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
FLAG_RATIO = 1.5


def _load_old(path: str | None) -> dict:
    if path is not None:
        with open(path) as f:
            doc = json.load(f)
        payload = doc.get("parsed", doc)
        print(f"baseline: {os.path.basename(path)} "
              f"(total {payload['value']}s at sf{payload['sf']})")
        return payload
    rounds = sorted(glob.glob(os.path.join(REPO, "BENCH_r*.json")))
    if not rounds:
        raise SystemExit("no BENCH_r*.json baseline found")
    # per-query best across every recorded round (see module docstring)
    best: dict[str, float] = {}
    payload = None
    for p in rounds:
        with open(p) as f:
            doc = json.load(f)
        payload = doc.get("parsed", doc)
        for q, sec in payload["queries"].items():
            if q not in best or sec < best[q]:
                best[q] = sec
    print(f"baseline: best-ever across {len(rounds)} rounds "
          f"(latest total {payload['value']}s at sf{payload['sf']})")
    return {**payload, "queries": best, "value": round(sum(best.values()), 3)}


def _load_new(path: str | None) -> dict:
    if path is not None:
        with open(path) as f:
            doc = json.load(f)
        return doc.get("parsed", doc)
    out = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, check=True,
    ).stdout
    line = [l for l in out.splitlines() if re.match(r'^\{"metric"', l)][-1]
    return json.loads(line)


def main(new_path: str | None, old_path: str | None) -> int:
    old, new = _load_old(old_path), _load_new(new_path)
    oq, nq = old["queries"], new["queries"]
    flagged = []
    print(f"{'query':<32} {'old':>7} {'new':>7} {'ratio':>6}")
    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        if o is None or n is None:
            print(f"{name:<32} {o or '-':>7} {n or '-':>7}   (one side only)")
            continue
        ratio = n / o if o else float("inf")
        mark = "  <-- SLOWER" if ratio > FLAG_RATIO else ""
        print(f"{name:<32} {o:>7.3f} {n:>7.3f} {ratio:>5.2f}x{mark}")
        if ratio > FLAG_RATIO:
            flagged.append(name)
    print(f"\ntotal: old={old['value']}s new={new['value']}s "
          f"({new['value'] / old['value']:.2f}x)")
    if flagged:
        print(f"REGRESSION: {flagged} exceeded {FLAG_RATIO}x")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else None,
            sys.argv[2] if len(sys.argv) > 2 else None,
        )
    )
