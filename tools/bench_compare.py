"""Per-query bench regression report vs the best-ever recorded time.

    python tools/bench_compare.py [new_bench.json] [old_bench.json]

``new`` defaults to running ``bench.py`` fresh; ``old`` defaults to the
per-query BEST across every ``BENCH_r*.json`` in the repo root (latest
round's total is still shown for context). Comparing against best-ever
— not just the previous round — stops slow drift from compounding:
three rounds of +30% each stay under a 1.5× per-round gate but trip a
best-ever gate at round two. Flags any query >1.5× slower BOTH in raw
ratio AND relative to the board's median drift (exit 1) so a perf
regression is as loud as a correctness one, while lock-step host drift
— the twice-observed, A/B-confirmed noise mode (BASELINE.md rounds
5-6) — is divided out instead of flagged. Median drift beyond 2× fails
outright: normalization isn't trustworthy there, run the
identical-code worktree A/B. Queries present on only one side are
listed but never flagged (new/renamed queries have no baseline).
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

#: Documented per-query comparison floors (seconds): rows whose anchor
#: value was caught on an unrepresentatively FAST run and would
#: phantom-flag every round against it. Each entry cites the evidence;
#: the comparison base becomes max(best-ever, floor) for that row.
#: semdedup_prune_report: r13 anchor caught 2.214 s, but the documented
#: quiesced solo floor is 3.35-3.40 s (r9 note + r13 verdict best-of-3
#: re-measure at 15-min load 0.50; BASELINE.md round-14 note) — the
#: operator is memory-bandwidth-bound (the r12 Arrow-scorer class) and
#: 2.2 s is a lucky-DRAM run, not the code's floor.
FLOOR_OVERRIDES: dict[str, float] = {
    "semdedup_prune_report": 3.35,
}

#: Anchor-epoch audit band (ADVICE r13): BENCH_ANCHOR_r7.json preserves
#: the previous epoch's quiesced board so the r13 epoch-reset claim
#: (same-HEAD host drift, documented 1.22-1.33x totals / 1.15x median
#: per-query) stays machine-checkable. Per-query new/old anchor ratios
#: outside this band are printed as epoch outliers — a genuine code
#: regression absorbed into the new floor would show up here.
EPOCH_BAND = (0.70, 1.65)


def _epoch_audit() -> None:
    old_p = os.path.join(REPO, "BENCH_ANCHOR_r7.json")
    new_p = os.path.join(REPO, "BENCH_ANCHOR.json")
    if not (os.path.exists(old_p) and os.path.exists(new_p)):
        return
    with open(old_p) as f:
        old = json.load(f)
    with open(new_p) as f:
        new = json.load(f)
    lo, hi = EPOCH_BAND
    outliers = []
    for q in sorted(set(old["queries"]) & set(new["queries"])):
        if q in FLOOR_OVERRIDES:
            continue  # already dispositioned by floor
        r = new["queries"][q] / old["queries"][q] if old["queries"][q] else 0
        if not lo <= r <= hi:
            outliers.append((q, round(r, 2)))
    if outliers:
        print(
            "EPOCH AUDIT: per-query anchor ratios outside the documented "
            f"{lo}-{hi}x host-drift band (regressions absorbed into the "
            f"epoch reset would appear here): {outliers}"
        )


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
    # Same-epoch baseline anchor (round 7, BASELINE.md escalation path):
    # best-evers recorded in a FASTER HOST EPOCH make every later round
    # flag spuriously (three r6 rows moved 1.43-1.60x with untouched
    # code; all re-measured <=1.22x vs best solo). BENCH_ANCHOR.json is
    # a quiesced full board recorded at epoch reset; when present, the
    # comparison base is the per-query best over {anchor} union {rounds
    # >= anchor round} — older epochs' numbers stop being the gate.
    best: dict[str, float] = {}
    floor_round = 0
    anchor_path = os.path.join(REPO, "BENCH_ANCHOR.json")
    if os.path.exists(anchor_path):
        with open(anchor_path) as f:
            anchor = json.load(f)
        floor_round = int(anchor.get("round", 0))
        best.update(anchor["queries"])
        print(f"baseline anchor: BENCH_ANCHOR.json (epoch r{floor_round}, "
              f"quiesced total {anchor.get('value')}s)")
    payload = None
    used = 0
    for p in rounds:
        rnd = int(re.search(r"_r(\d+)", p).group(1))
        with open(p) as f:
            doc = json.load(f)
        payload = doc.get("parsed", doc)
        if rnd < floor_round:
            continue  # pre-anchor epoch: context only, never the gate
        used += 1
        for q, sec in payload["queries"].items():
            if q not in best or sec < best[q]:
                best[q] = sec
    print(f"baseline: best across anchor + {used} same-epoch rounds "
          f"(latest total {payload['value']}s at sf{payload['sf']})")
    return {**payload, "queries": best, "value": round(sum(best.values()), 3)}


def _load_new(path: str | None) -> dict:
    if path is not None:
        with open(path) as f:
            doc = json.load(f)
        return doc.get("parsed", doc)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "bench.py")],
        capture_output=True, text=True, check=True,
    )
    # forward bench.py's host-conditions stamp — captured stderr would
    # otherwise swallow it, and flags are dispositioned against load
    for l in proc.stderr.splitlines():
        if "host load" in l:
            print(l)
    line = [
        l for l in proc.stdout.splitlines() if re.match(r'^\{"metric"', l)
    ][-1]
    return json.loads(line)


#: lock-step host drift beyond this is too large to normalize away —
#: demand a same-day identical-code A/B (BASELINE.md round-6 note)
#: before trusting ANY number from the run
GLOBAL_DRIFT_LIMIT = 2.0


def main(new_path: str | None, old_path: str | None) -> int:
    old, new = _load_old(old_path), _load_new(new_path)
    oq, nq = dict(old["queries"]), new["queries"]
    # documented floors replace unrepresentatively fast baseline rows
    for q, floor in FLOOR_OVERRIDES.items():
        if q in oq and oq[q] < floor:
            print(f"floor override: {q} baseline {oq[q]}s -> {floor}s "
                  "(documented quiesced solo floor, see FLOOR_OVERRIDES)")
            oq[q] = floor
    # the board's own host-conditions stamp (in-JSON since r14) — flags
    # on a board whose 15-min load was >= 0.5 are contention suspects
    stamp = new.get("load")
    if stamp:
        steal = stamp.get("steal_jiffies")
        print(f"new-board host load stamp: 1m={stamp.get('load_1m')} "
              f"15m={stamp.get('load_15m')}"
              + (f" steal={steal}j" if steal is not None else "") +
              f" ({'QUIESCED' if stamp.get('load_15m', 9) < 0.5 else 'WARM — treat flags as contention suspects'})")
    _epoch_audit()
    # Median drift across the comparable board estimates the HOST's
    # speed delta vs the rounds that recorded the best-evers: per the
    # twice-observed bench-variance rule (BASELINE.md rounds 5-6,
    # confirmed by an identical-code worktree A/B), untouched queries
    # moving in lock-step is environment, not regression. A query is
    # flagged only when it exceeds the gate AFTER dividing out that
    # shared drift — i.e. it moved relative to its peers.
    ratios = sorted(
        nq[k] / oq[k] for k in set(oq) & set(nq) if oq[k]
    )
    med = ratios[len(ratios) // 2] if ratios else 1.0
    flagged = []
    print(f"host drift (median ratio over {len(ratios)} queries): {med:.2f}x")
    if med >= 1.2:
        print(
            f"MEDIAN DRIFT {med:.2f}x LOCK-STEP: host artifact suspected "
            "REGARDLESS of the load stamp (r14: a QUIESCED-stamped board "
            "read 1.26x median during a hypervisor-neighbor burst — guest "
            "steal time is invisible to loadavg; BASELINE.md round-14 "
            "note). Disposition any flags below by solo best-of-4 "
            "reproduction; do not chase rows."
        )
    print(f"{'query':<32} {'old':>7} {'new':>7} {'ratio':>6} {'vs-board':>8}")
    for name in sorted(set(oq) | set(nq)):
        o, n = oq.get(name), nq.get(name)
        if o is None or n is None:
            print(f"{name:<32} {o or '-':>7} {n or '-':>7}   (one side only)")
            continue
        ratio = n / o if o else float("inf")
        rel = ratio / med
        mark = "  <-- SLOWER" if rel > FLAG_RATIO and ratio > FLAG_RATIO else ""
        print(f"{name:<32} {o:>7.3f} {n:>7.3f} {ratio:>5.2f}x {rel:>6.2f}x{mark}")
        if rel > FLAG_RATIO and ratio > FLAG_RATIO:
            flagged.append(name)
    # footer totals re-sum the (possibly floor-overridden) per-row
    # baselines so the quoted ratio matches the table above it
    old_total = round(sum(oq.values()), 3)
    print(f"\ntotal: old={old_total}s new={new['value']}s "
          f"({new['value'] / old_total:.2f}x)")
    if med > GLOBAL_DRIFT_LIMIT:
        print(
            f"GLOBAL SLOWDOWN: median drift {med:.2f}x > "
            f"{GLOBAL_DRIFT_LIMIT}x — normalization is not trustworthy at "
            "this magnitude; run the identical-code worktree A/B "
            "(BASELINE.md round-6 note) to attribute it"
        )
        return 1
    if flagged:
        print(f"REGRESSION: {flagged} exceeded {FLAG_RATIO}x vs the board")
    return 1 if flagged else 0


if __name__ == "__main__":
    sys.exit(
        main(
            sys.argv[1] if len(sys.argv) > 1 else None,
            sys.argv[2] if len(sys.argv) > 2 else None,
        )
    )
