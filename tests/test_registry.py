"""Registry contract sanity: every query has a callable, every oracle
parses in DuckDB against the driver's view set, bench set is non-empty.
Catches oracle SQL typos without paying for Spark execution."""

import duckdb
import pytest

from rados_timestore_spark import registry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def test_no_load_errors():
    registry.queries()
    assert registry.LOAD_ERRORS == {}


def test_every_query_is_callable():
    qs = registry.queries()
    assert len(qs) >= 50
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_cover_queries_and_parse(con):
    qs, oracles = registry.queries(), registry.oracle_sql()
    assert set(oracles) <= set(qs)
    # the vast majority must have oracles (rows-only is the exception)
    assert len(oracles) >= len(qs) - 3
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover
            pytest.fail(f"oracle for {name} fails to plan: {exc}")


def test_bench_set_nonempty():
    bench = registry.bench_queries()
    assert 10 <= len(bench) <= len(registry.queries())


def test_driver_window_composition():
    # The external driver verifies only the first 50 registry entries
    # per round (registry.register docstring).  Guard the rotation
    # invariants: every query family keeps at least one entry inside
    # the window, and the window is exactly full (an accidental
    # demotion that leaves unused slots wastes driver evidence).
    from rados_timestore_spark import registry

    ordered = registry._ordered()
    window = ordered[:50]
    families = {
        "ts_": False, "streaming_": False, "text_": False,
        "dedup_": False, "sim_": False, "mm_": False, "tpch_": False,
    }
    for name, _q in window:
        for fam in families:
            if name.startswith(fam):
                families[fam] = True
    missing = [f for f, seen in families.items() if not seen]
    assert not missing, f"families with no driver-window entry: {missing}"
    # Exactly-full window: entry 50 and 51 must both exist (the
    # registry is larger than the window) and every demoted entry
    # must carry priority > default so the cut is intentional.
    assert len(ordered) > 50
    assert all(q.priority <= 100 for _n, q in window)


def test_demoted_queries_have_prior_green_or_local_note():
    # Demotion policy (registry.register): only queries that already
    # have driver evidence may sit past the window; new queries land
    # at default priority and rotate IN next round, never straight to
    # demoted.  Enforce the mechanical half: priority>100 entries must
    # not be bench-tagged (bench queries are the headline set and
    # must stay driver-visible).
    from rados_timestore_spark import registry

    for name, q in registry._ordered()[50:]:
        assert not (q.priority > 100 and q.bench), (
            f"{name}: bench-tagged query demoted past the driver window"
        )
