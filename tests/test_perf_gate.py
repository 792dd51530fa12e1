"""Perf-regression gate over the bench suite.

r3 shipped a 2.3x per-query regression undetected because nothing
asserted bench times (VERDICT r3 item 1).  This test re-runs
``bench.py`` (same methodology: min-of-2, cache cleared per run) and
fails when any benched query exceeds 2x its recorded expectation from
``bench_expectations.json``.

Guards against false alarms:

* fixture fingerprint mismatch (the driver regenerates testdata
  between rounds) -> SKIP with instructions, never a spurious fail;
* an absolute slack floor (0.75 s) so sub-second queries aren't
  flunked by scheduler jitter;
* queries over threshold get one re-measure (best-of keeps the min)
  before the verdict, absorbing one-off machine-load spikes.

Refresh expectations after an intentional perf change:
``python bench.py --update-expectations``.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

#: Regression threshold vs recorded expectation.
FACTOR = 2.0
#: Absolute slack (s) added to every bound — jitter floor for sub-second
#: queries.
SLACK = 0.75


@pytest.mark.slow
def test_bench_queries_within_expectations():
    exp_path = os.path.join(REPO, "bench_expectations.json")
    if not os.path.exists(exp_path):
        pytest.skip("no bench_expectations.json — run "
                    "`python bench.py --update-expectations` to create it")
    with open(exp_path) as f:
        exp = json.load(f)

    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", exp["sf_dir"])
    if sf_dir != exp["sf_dir"]:
        pytest.skip(f"expectations recorded at {exp['sf_dir']}, "
                    f"running at {sf_dir}")
    if not os.path.isdir(sf_dir):
        pytest.skip(f"fixture dir {sf_dir} missing")

    sys.path.insert(0, REPO)
    import bench

    if bench.fixture_fingerprint(sf_dir) != exp["fingerprint"]:
        pytest.skip("fixtures regenerated since expectations were "
                    "recorded — rerun `python bench.py "
                    "--update-expectations` (workload drift is not a "
                    "code regression)")

    def run_bench() -> dict[str, float]:
        # Pin parallelism to what the expectations were recorded at —
        # conftest sets SPARK_GRAFT_CPUS=4 for the unit-test session
        # and that must not leak into the bench subprocess.
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir,
                   SPARK_GRAFT_CPUS=str(exp.get("cpus", 32)))
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            capture_output=True, text=True, env=env, cwd=REPO,
            timeout=1200,
        )
        assert proc.returncode == 0, f"bench.py failed:\n{proc.stderr[-4000:]}"
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)["queries"]

    got = run_bench()

    expected = exp["queries"]
    # Queries added to the bench set after expectations were recorded
    # are reported but cannot regress yet.
    missing = sorted(set(got) - set(expected))
    bound = {q: FACTOR * t + SLACK for q, t in expected.items()}
    over = {q: (got[q], round(bound[q], 2))
            for q in expected if q in got and got[q] > bound[q]}
    if over:
        # One re-measure: bench.py is min-of-2 already, so this gives
        # min-of-4 for suspects — a persistent 2x is a real regression.
        retry = run_bench()
        got = {q: min(got.get(q, 9e9), retry.get(q, 9e9)) for q in got}
        over = {q: (got[q], round(bound[q], 2))
                for q in expected if q in got and got[q] > bound[q]}
    assert not over, (
        f"bench regressions (got, bound): {over}; if intentional, rerun "
        f"`python bench.py --update-expectations`"
    )
    if missing:
        print(f"note: benched queries without expectations: {missing}")
