#!/bin/sh
# Merge gate: full pytest suite + ALL registered queries vs the DuckDB
# oracle (the driver only re-checks a 50-entry window per round; this
# covers everything, including demoted/rotated-out queries).
set -e
cd "$(dirname "$0")/.."
# Perf-gate freshness first: test_perf_gate SKIPS on stale
# expectations (correct inside pytest), so the gate itself must fail
# loudly instead of passing with the perf gate silently disabled.
python tools/check_bench_fresh.py
python -m pytest tests/ -q
python tools/check_correctness.py "${1:-/root/testdata/sf0.01}"
