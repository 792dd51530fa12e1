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
