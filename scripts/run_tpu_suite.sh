#!/bin/bash
# Real-TPU test-suite artifact (VERDICT r2 weak #6): run the suite against
# the attached chip and record the summary in TESTS_TPU.md.
#
# CHUNKED: one pytest subprocess per test file. Measured (r4, 2026-08-19):
# a single-process full-suite run dies ~75-80% through with
# "ABORTED: TPU backend error" on BOTH attempts — the axon tunnel client
# leaks per-dispatched-executable state (docs/perf.md §11) and a whole
# suite's worth of compiles kills the terminal; every later test then
# fails in cascade. Per-file processes recycle the client exactly like
# scripts/train_chunked.py recycles it for long training runs.
#
# Usage: bash scripts/run_tpu_suite.sh [pytest-args...]
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_suite_$(date +%Y%m%d_%H%M%S).log
echo "running suite on TPU (per-file chunks) -> $OUT"
FAIL=0
for f in tests/test_*.py; do
  echo "=== $f ===" | tee -a "$OUT"
  LSI_TPU_TEST_TPU=1 python -m pytest "$f" -q --tb=short "$@" 2>&1 | tee -a "$OUT" | tail -2
  rc=${PIPESTATUS[0]}
  if [ "$rc" -ne 0 ] && [ "$rc" -ne 5 ]; then FAIL=1; fi  # 5 = no tests ran
done
echo "=== totals ===" | tee -a "$OUT"
grep -hE "[0-9]+ (passed|failed|skipped)" "$OUT" | grep -oE "[0-9]+ (passed|failed|skipped)" \
  | awk '{a[$2]+=$1} END {for (k in a) printf "%s %d\n", k, a[k]}' | tee -a "$OUT"
echo "log: $OUT"
exit $FAIL
