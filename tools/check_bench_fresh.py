"""Fail (loudly) when bench_expectations.json is stale.

tests/test_perf_gate.py SKIPS on a fixture-fingerprint mismatch — the
right call inside pytest (workload drift is not a code regression),
but a silent skip disables the perf gate for the whole round (VERDICT
r4).  This check makes staleness a merge-gate failure instead: when
the fixtures under the recorded sf_dir no longer match the recorded
fingerprint (or the file is missing / covers a different bench set),
it exits non-zero with instructions, so `tools/gate.sh` cannot pass
with a disabled perf gate.

Usage: python tools/check_bench_fresh.py
"""

from __future__ import annotations

import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

BANNER = "!" * 72


def fail(msg: str) -> int:
    print(BANNER, file=sys.stderr)
    print(f"PERF GATE DISABLED: {msg}", file=sys.stderr)
    print("Re-record with:  python bench.py --update-expectations",
          file=sys.stderr)
    print("(runs the suite twice, records per-query maxima)",
          file=sys.stderr)
    print(BANNER, file=sys.stderr)
    return 1


def main() -> int:
    import bench

    path = bench.EXPECTATIONS_PATH
    if not os.path.exists(path):
        return fail("bench_expectations.json does not exist")
    with open(path) as f:
        exp = json.load(f)
    sf_dir = exp.get("sf_dir", "")
    if not os.path.isdir(sf_dir):
        return fail(f"recorded sf_dir {sf_dir!r} is missing")
    if bench.fixture_fingerprint(sf_dir) != exp.get("fingerprint"):
        return fail(f"fixtures under {sf_dir} were regenerated after "
                    "expectations were recorded")

    from rados_timestore_spark import registry

    missing = sorted(set(registry.bench_queries()) - set(exp["queries"]))
    if missing:
        return fail(f"bench queries without expectations: {missing}")
    print(f"bench_expectations.json fresh "
          f"({len(exp['queries'])} queries @ {sf_dir})")
    return 0


if __name__ == "__main__":
    sys.exit(main())
