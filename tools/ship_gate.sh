#!/usr/bin/env bash
# Ship gate — run as the LAST step before a round ends (round-3 lesson:
# a testdata refresh shipped a red streaming source because the final
# commits skipped these). Fails loudly on the first red surface.
#
#   bash tools/ship_gate.sh            # oracle gate at sf0.01 + pytest + bench drift
#   FULL=1 bash tools/ship_gate.sh     # also re-run the oracle gate at sf0.001 + sf0.1
#   PLAIN=1 bash tools/ship_gate.sh    # also replay the window under a PLAIN
#                                      # SparkSession (driver twin) — run this in
#                                      # any round that rotated the window
set -euo pipefail
cd "$(dirname "$0")/.."

echo "== ship gate 0/4: freshness gate (rotation on schedule) =="
python tools/freshness_report.py --gate

echo "== ship gate 1/4: oracle gate (full registry) =="
python tools/check_oracle.py /root/testdata/sf0.01
if [[ "${FULL:-0}" == "1" ]]; then
  python tools/check_oracle.py /root/testdata/sf0.001
  python tools/check_oracle.py /root/testdata/sf0.1
fi

if [[ "${PLAIN:-0}" == "1" ]]; then
  echo "== ship gate 1b/4: driver-twin window (plain SparkSession) =="
  python tools/plain_session_check.py /root/testdata/sf0.01
fi

echo "== ship gate 2/4: pytest =="
python -m pytest tests/ -q

echo "== ship gate 3/4: bench drift vs best recorded round =="
# The bench step otherwise runs minutes after a ~16-min pytest and
# flags a warm-host phantom nearly every round (r12: three raised,
# three killed by settle-and-rerun; r13: one; r14: four). Mechanize
# the settle protocol — the documented rule is "never read a bench
# above 15-min load 0.5": wait for that, bounded at 45 min (then run
# anyway and let the variance rule disposition any flag). The bound
# is sized to the physics: a 15-min load average decays from the
# post-pytest ~5 to 0.5 in 15·ln(10) ≈ 35 min, so the old 20-min cap
# timed out into a WARM board every single round (r13 and r14 both
# read at the 0.52 boundary and raised only phantoms).
for _ in $(seq 1 90); do
  load15=$(cut -d' ' -f3 /proc/loadavg)
  awk -v l="$load15" 'BEGIN {exit !(l < 0.5)}' && break
  echo "  settling: 15-min load ${load15} >= 0.5, waiting 30s"
  sleep 30
done
python tools/bench_compare.py

echo "SHIP GATE GREEN"
