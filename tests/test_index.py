"""Index stab/range lookup — golden cases from tests/UnitTests.hs and
the Index.hs semantics (SURVEY.md §2 Q1/Q2)."""

import pytest

from rados_timestore_spark.index import Index


def test_stab_basic():
    idx = Index(((0, 4), (6, 10)))
    assert idx.stab(0) == (0, 4)
    assert idx.stab(5) == (0, 4)
    assert idx.stab(6) == (6, 10)
    assert idx.stab(100) == (6, 10)


def test_stab_before_all_epochs_returns_leftmost():
    # Index.hs:71-88: leftmost entry if t precedes all epochs.
    idx = Index(((10, 4), (20, 8)))
    assert idx.stab(3) == (10, 4)


def test_range_lookup():
    # UnitTests.hs rollover index [(0,4),(6,10),(8,10)].
    idx = Index(((0, 4), (6, 10), (8, 10)))
    assert idx.range_lookup(0, 5) == [(0, 4)]
    assert idx.range_lookup(0, 6) == [(0, 4), (6, 10)]
    assert idx.range_lookup(7, 100) == [(6, 10), (8, 10)]
    assert idx.range_lookup(9, 9) == [(8, 10)]


def test_epoch_col_matches_stab(spark):
    idx = Index(((0, 4), (6, 10), (8, 12)))
    df = spark.range(0, 12).selectExpr("id as time")
    got = {r["time"]: (r["e"], r["b"]) for r in df.select(
        "time", idx.epoch_col("time").alias("e"),
        idx.bucket_count_col("time").alias("b")).collect()}
    for t in range(12):
        assert got[t] == idx.stab(t), t


def test_index_validation():
    with pytest.raises(ValueError):
        Index(())
    with pytest.raises(ValueError):
        Index(((0, 4), (0, 8)))
