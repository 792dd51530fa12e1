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
``python bench.py --update-expectations`` (foreground only).  Since
r14 the recorded expectation is the per-query MEDIAN over the last 5
update sessions (bench.updated_expectations), not a lifetime max — a
slow box loosens the gate only until newer clean sessions outvote it
(VERDICT r13 #4).
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


def test_expectation_protocol_deratchets():
    # VERDICT r13 #4: one slow session must not permanently loosen the
    # gate.  Pure arithmetic over bench.updated_expectations — no
    # suite runs.
    sys.path.insert(0, REPO)
    from bench import EXPECTATION_WINDOW, updated_expectations

    fp = {"x.parquet": 1}
    sf = "/sf"

    # legacy lifetime-max file migrates as one synthetic session
    legacy = {"sf_dir": sf, "fingerprint": fp, "queries": {"q": 10.0}}
    doc = updated_expectations(legacy, {"q": 2.0}, fp, sf, now=1.0)
    assert [h["queries"]["q"] for h in doc["history"]] == [10.0, 2.0]
    assert doc["queries"]["q"] == 6.0          # median of {10, 2}

    # clean sessions outvote the slow one: after two more 2.0s, the
    # median re-tightens to 2.0 even though 10.0 is still in window
    for t in (2.0, 2.0):
        doc = updated_expectations(doc, {"q": t}, fp, sf, now=2.0)
    assert doc["queries"]["q"] == 2.0
    # ...and the slow session eventually AGES OUT entirely
    for t in (2.0, 2.0, 2.0):
        doc = updated_expectations(doc, {"q": t}, fp, sf, now=3.0)
    assert len(doc["history"]) == EXPECTATION_WINDOW
    assert all(h["queries"]["q"] == 2.0 for h in doc["history"])

    # a fingerprint change starts a fresh window (new baseline)
    doc2 = updated_expectations(doc, {"q": 5.0}, {"x.parquet": 2},
                                sf, now=4.0)
    assert len(doc2["history"]) == 1 and doc2["queries"]["q"] == 5.0

    # a query added mid-window medians over the sessions that have it
    doc3 = updated_expectations(doc, {"q": 2.0, "new_q": 7.0},
                                fp, sf, now=5.0)
    assert doc3["queries"]["new_q"] == 7.0
