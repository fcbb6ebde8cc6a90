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


def registry_order() -> tuple[list[str], set[str], set[str], set[str]]:
    """Registry names in window order from the live registry (imports
    pyspark for the DataFrame types but starts no JVM). Returns
    (names, window, bench, rewindowed)."""
    sys.path.insert(0, REPO)
    from cs_tutorial_reporting_spark.queries import (
        _CHECK_WINDOW,
        QUERIES,
        REWINDOWED,
    )

    names = list(QUERIES)
    bench = {n for n, q in QUERIES.items() if q.bench}
    return names, set(names[:_CHECK_WINDOW]), bench, set(REWINDOWED)


def _latest_green() -> tuple[dict[str, int], int]:
    """Scan every ``CORRECTNESS_r*.json`` once and return
    ``(latest_green, cur)``: each query's most recent green-row round
    (rows+schema+hash all pass, no err) and the latest driver round
    recorded (0 when no files exist). Shared by gate()/main()/plan()
    so the ok-row predicate cannot drift between them (ADVICE r10)."""
    def _round(path: str) -> int | None:
        # parse the BASENAME only — a checkout directory containing
        # "_r<digits>" must not hijack the round number (review r11).
        # A glob match without the digit pattern (e.g. a stray
        # CORRECTNESS_r.json) is skipped with a warning instead of
        # taking down the gate on .group(1) (ADVICE r11).
        m = re.search(r"_r(\d+)", os.path.basename(path))
        if m is None:
            print(
                f"freshness: ignoring non-conforming file {os.path.basename(path)}",
                file=sys.stderr,
            )
            return None
        return int(m.group(1))

    rounds = {
        p: r
        for p in sorted(glob.glob(os.path.join(REPO, "CORRECTNESS_r*.json")))
        if (r := _round(p)) is not None
    }

    latest: dict[str, int] = {}
    for path, rnd in rounds.items():
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            ok = (
                row.get("rows_match")
                and row.get("schema_match")
                and row.get("hash_match") in (True, None)
                and not row.get("err")
            )
            if ok:
                latest[name] = max(latest.get(name, 0), rnd)
    cur = max(rounds.values(), default=0)
    return latest, cur


#: hard-gate budgets (tools/ship_gate.sh runs ``--gate``; VERDICT r6
#: next-round #1). The never-attested TAIL ceiling follows the debt
#: retirement schedule. NOTE the VERDICT quoted "never-count ≤ 83"
#: (109 − 26), but its own demanded 26-block contains 11 entries that
#: are STALE, not never (10 r2 rows + ngram_jaccard_consecutive's r1
#: row) — only 15 of the 26 are never-attested, so the correct
#: post-rotation tail-never count is 109 − 15 = 94, falling 27/round
#: (r8: 67, r9: 40, r10: 13, r11: 0). The row-age ceiling is the
#: steady-state refresh period: ~179 non-bench tail entries /
#: 27 slots ≈ 7 rounds.
NEVER_BASE_ROUND, NEVER_BASE = 6, 94
MAX_ROW_AGE = 7


def gate() -> int:
    """Hard freshness gate — exit 1 unless the registry rotation is on
    schedule. Three rules, all mechanical:

    1. WINDOW DISCIPLINE: every non-bench window slot must be spent on
       a query that NEEDS a row — never-attested, or latest row older
       than the latest driver round — or be explicitly listed in
       ``queries.REWINDOWED`` (rotation-policy clause (a): operator
       code changed since its last row). A slot holding a current-round
       green row is a wasted slot while debt exists.
    2. NEVER-CEILING: never-attested TAIL entries must not exceed the
       retirement schedule (new queries must be windowed immediately or
       not added — the registry freeze, mechanized).
    3. ROW-AGE: no attested tail entry's latest row may be older than
       MAX_ROW_AGE rounds — the steady-state staleness bound once the
       never-debt is retired.
    """
    latest_green, cur = _latest_green()
    names, window, bench, rewindowed = registry_order()
    if cur == 0:
        # no driver round recorded yet (fresh clone / archived rounds):
        # there is no row freshness to gate — window composition is
        # enforced by queries.py's import-time asserts
        print("freshness gate: no CORRECTNESS_r*.json found — skipped")
        return 0
    n_window = len(window)
    failures: list[str] = []

    wasted = [
        n
        for n in names[:n_window]
        if n not in bench
        and n not in rewindowed
        and latest_green.get(n, 0) >= cur
    ]
    if wasted:
        failures.append(
            f"window discipline: {len(wasted)} non-bench window slot(s) "
            f"hold a current-round (r{cur}) row while debt exists — "
            f"rotate them out: {wasted}"
        )

    tail_never = [
        n for n in names[n_window:] if latest_green.get(n, 0) == 0
    ]
    ceiling = max(0, NEVER_BASE - 27 * (cur - NEVER_BASE_ROUND))
    if len(tail_never) > ceiling:
        failures.append(
            f"never-ceiling: {len(tail_never)} never-attested tail "
            f"entries > schedule ceiling {ceiling} at r{cur} — promote "
            f"oldest-first (and don't add tail queries: registry is "
            f"frozen until the debt clears)"
        )

    overage = [
        (n, latest_green[n])
        for n in names[n_window:]
        if latest_green.get(n, 0) > 0 and cur - latest_green[n] > MAX_ROW_AGE
    ]
    if overage:
        failures.append(
            f"row-age: {len(overage)} tail entries older than "
            f"{MAX_ROW_AGE} rounds: {overage}"
        )

    if failures:
        for f in failures:
            print(f"FRESHNESS GATE FAIL — {f}")
        return 1
    print(
        f"freshness gate green: window disciplined, "
        f"{len(tail_never)}/{ceiling} never-budget, no row older than "
        f"{MAX_ROW_AGE} rounds"
    )
    return 0


def main() -> int:
    latest_green, cur = _latest_green()
    names, window, _, _ = registry_order()
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


def plan() -> int:
    """Print the NEXT rotation mechanically (``--plan``): which
    non-bench window slots hold a current-round row (demote), and
    which tail entries fill them (promote) — never-attested first in
    TAIL order, then oldest rows, tail-order within an age class.
    Clause-(a) re-windows (code changed since last row) are a manual
    judgment the tool cannot make; the reminder prints last."""
    latest_green, cur = _latest_green()
    if cur == 0:
        print("rotation plan: no CORRECTNESS_r*.json yet — nothing to rotate")
        return 0
    names, window, bench, rewindowed = registry_order()
    # rewindowed slots are exempt, matching gate()'s wasted-slot
    # predicate — a clause-(a) query holding a current-round row is
    # deliberately in the window, not demotion material (ADVICE r10)
    demote = [
        n
        for n in names
        if n in window
        and n not in bench
        and n not in rewindowed
        and latest_green.get(n, 0) >= cur
    ]
    tail = [n for n in names if n not in window]
    candidates = sorted(
        range(len(tail)), key=lambda i: (latest_green.get(tail[i], 0), i)
    )
    promote = [tail[i] for i in candidates[: len(demote)]]
    print(f"rotation plan after r{cur} (window {len(window)}, "
          f"{len(demote)} rotating slots):")
    print(f"\ndemote to tail end ({len(demote)}, hold r{cur} rows):")
    for n in demote:
        print(f"  {n}")
    print(f"\npromote into window ({len(promote)}, oldest-first in tail order):")
    for n in promote:
        rnd = latest_green.get(n, 0)
        print(f"  {'never' if rnd == 0 else f'r{rnd}':>6}  {n}")
    print(
        "\nREMINDER: clause-(a) first — any query whose operator code"
        " changed since its latest row re-windows ahead of this list"
        " (queries.REWINDOWED); apply edits to queries.py::_DEMOTED_TAIL,"
        " then run --gate."
    )
    return 0


if __name__ == "__main__":
    if "--gate" in sys.argv[1:]:
        sys.exit(gate())
    if "--plan" in sys.argv[1:]:
        sys.exit(plan())
    sys.exit(main())
