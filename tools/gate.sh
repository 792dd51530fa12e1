#!/bin/sh
# Merge gate: full pytest suite + ALL registered queries vs the DuckDB
# oracle (the driver only re-checks a 50-entry window per round; this
# covers everything, including demoted/rotated-out queries).
set -e
cd "$(dirname "$0")/.."
python -m pytest tests/ -q
python tools/check_correctness.py "${1:-/root/testdata/sf0.01}"
