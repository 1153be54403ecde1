#!/usr/bin/env bash
# Close-of-round soak of the randomized differential (VERDICT r8 item 3):
# repeatedly re-run the hypothesis suite with FRESH draws until the
# requested number of iterations completes, logging one summary line per
# iteration. Each run draws new examples (no derandomize/seed pinning in
# the settings), so every iteration is new hostile input — the round-8
# soak kept catching real bugs for 4 iterations AFTER the suite first
# went green.
#
# Each iteration logs pytest's REAL exit status (`exit=N`): a collection
# error or hard crash that prints none of the grepped summary tokens is
# still visible, never a silent empty iteration (ADVICE r9).
#
# Usage: scripts/soak_random_differential.sh [N_ITER] [LOGFILE]
set -u -o pipefail
N="${1:-12}"
LOG="${2:-/tmp/soak_r10.log}"
cd "$(dirname "$0")/.."
for i in $(seq 1 "$N"); do
  echo "=== soak iteration $i start $(date +%H:%M:%S) ===" >> "$LOG"
  python -m pytest tests/test_random_differential.py -q 2>&1 \
    | grep -E "FAILED|ERROR|diverged|passed|failed" \
    | tail -40 >> "$LOG"
  status="${PIPESTATUS[0]}"
  echo "=== soak iteration $i exit=$status $(date +%H:%M:%S) ===" >> "$LOG"
done
echo "=== soak done $(date +%H:%M:%S) ===" >> "$LOG"
