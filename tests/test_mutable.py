"""Mutable KV laws — ports tests/UnitTests.hs:75-88 and the
propMutableStore law (tests/FuzzyTests.hs:122-147)."""

import random

from rados_timestore_spark.mutable import MutableKV


def test_insert_overwrite_lookup(store):
    # UnitTests.hs:75-88: insert "Hi." then "I'm a duck" at key 0.
    store.register_namespace("PONY", buckets=4)
    kv = MutableKV(store, "PONY")
    kv.insert(0, b"Hi.")
    kv.insert(0, b"I'm a duck")
    assert kv.lookup(0) == b"I'm a duck"


def test_lookup_missing_is_none(store):
    store.register_namespace("PONY", buckets=4)
    kv = MutableKV(store, "PONY")
    assert kv.lookup(42) is None


def test_insert_with_merge(store):
    # Mutable.hs:83-103: written value = merge(new, existing).
    store.register_namespace("PONY", buckets=4)
    kv = MutableKV(store, "PONY")
    kv.insert(4, b"a")
    out = kv.insert_with(lambda new, old: old + new, 4, b"b")
    assert out == b"ab"
    assert kv.lookup(4) == b"ab"


def test_enumerate_latest_per_key(store):
    # propMutableStore: lookup/enumerate return the LAST insert per key.
    store.register_namespace("PONY", buckets=4)
    kv = MutableKV(store, "PONY")
    rng = random.Random(42)
    expected = {}
    rows = []
    for i in range(40):
        k = rng.randrange(8)
        v = bytes(f"v{i}", "ascii")
        expected[k | 1] = v
        rows.append((k, v))
    # Bulk path (scalable variant of repeated insert).
    for k, v in rows:
        df = store.spark.createDataFrame([(k, bytearray(v))], "key long, value binary")
        kv.insert_bulk(df)
    got = {r.key: bytes(r.value) for r in kv.enumerate().collect()}
    assert got == expected


def test_merge_with_folds_whole_chain(store):
    # Deferred-merge pattern: append raw deltas cheaply (no read-
    # modify-write like insertWith does), fold the chain at read time.
    # Equivalent end state to insertWith-per-delta, one Arrow pass.
    store.register_namespace("PONY", buckets=4)
    kv = MutableKV(store, "PONY")
    kv.insert(2, b"a")
    kv.insert(2, b"b")
    kv.insert(2, b"c")
    got = {r.key: bytes(r.value) for r in
           kv.merge_with(lambda new, old: old + new).collect()}
    assert got == {3: b"abc"}
