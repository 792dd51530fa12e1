"""Backend-contract suite under object-store (non-atomic-rename)
semantics — VERDICT r6 "What's missing" #2.

The reference runs its Store typeclass laws against real Ceph under a
flag (tests/StoreTests.hs:61-81): absent object (101-104), namespace
isolation (106-120), append ≡ mconcat (173-185), overwrite-after-
append (187-203), sizes (161-171).  This port's Memory/Rados duality
is a Hadoop-FS path swap, and the sandbox has no MinIO/s3a endpoint,
so the suite runs the SAME laws with ``fsutil.ObjectStoreFS`` — a
shim that reproduces s3a's rename emulation (copy-then-delete, never
atomic, no directory rename) over the local FS, with fault injection
for the crash windows a real object store exposes.

What this proves: nothing in the metadata machinery
(``write_text_atomic``'s tmp+backup scheme, ``exists_or_recover``,
meta CAS, rollover size probes, compaction generation flips) relies
on POSIX rename atomicity.  What it deliberately does NOT cover: the
bulk-parquet task-commit path, which belongs to Spark's committer
(S3A committer on a real deployment — a Spark conf, not store code).
"""

import pytest

from rados_timestore_spark.fsutil import ObjectStoreFS, SimulatedCrash
from rados_timestore_spark.store import (
    NamespaceNotRegistered, TimeStore,
)


@pytest.fixture()
def ostore(spark, tmp_path):
    """TimeStore whose metadata FS has object-store semantics."""
    return TimeStore(spark, str(tmp_path / "objstore"),
                     fs_class=ObjectStoreFS)


def _write(store, ns, rows):
    df = store.spark.createDataFrame(
        rows, "address long, time long, value long")
    store.write_points(ns, df)


def _vals(store, ns, lo=0, hi=1 << 40, addrs=(0, 2, 4, 8)):
    rows = store.read_simple(ns, lo, hi, list(addrs),
                             global_order=True).collect()
    return sorted((r.address, r.time, r.value) for r in rows)


def test_fs_is_object_store(ostore):
    assert isinstance(ostore.fs, ObjectStoreFS)


def test_absent_object(ostore):
    # StoreTests.hs:101-104 (fetchs of "wat" -> [Nothing]).
    ostore.register_namespace("PONIES", buckets=4)
    assert _vals(ostore, "PONIES") == []
    with pytest.raises(NamespaceNotRegistered):
        ostore.read_simple("nope", 0, 10, [2])


def test_namespace_isolation(ostore):
    # StoreTests.hs:106-120: same object name, two namespaces.
    ostore.register_namespace("a", buckets=4)
    ostore.register_namespace("b", buckets=4)
    _write(ostore, "a", [(2, 1, 100)])
    _write(ostore, "b", [(2, 1, 200)])
    assert _vals(ostore, "a") == [(2, 1, 100)]
    assert _vals(ostore, "b") == [(2, 1, 200)]


def test_append_equals_mconcat(ostore):
    # StoreTests.hs:173-185: N appends fetch back as the concatenation.
    ostore.register_namespace("PONIES", buckets=4)
    batches = [[(0, 0, 1), (2, 2, 2)], [(4, 4, 3)], [(8, 8, 4), (0, 9, 5)]]
    for b in batches:
        _write(ostore, "PONIES", b)
    assert _vals(ostore, "PONIES") == sorted(
        (a, t, v) for b in batches for (a, t, v) in b)


def test_overwrite_after_append(ostore):
    # StoreTests.hs:187-203 analog: the overwrite path (compact = the
    # port's S2 "write") after appends preserves content, and a later
    # append still lands on the new generation.
    ostore.register_namespace("PONIES", buckets=4)
    _write(ostore, "PONIES", [(0, 0, 1), (2, 2, 2)])
    _write(ostore, "PONIES", [(4, 4, 3)])
    before = _vals(ostore, "PONIES")
    ostore.compact("PONIES")
    assert _vals(ostore, "PONIES") == before
    _write(ostore, "PONIES", [(8, 8, 9)])
    assert _vals(ostore, "PONIES") == before + [(8, 8, 9)]


def test_sizes(ostore):
    # StoreTests.hs:161-171: sizes reflect written bytes and grow
    # monotonically with appends (dir-granular here — the rollover
    # probe's actual consumer).
    ostore.register_namespace("PONIES", buckets=4)
    pdir = ostore._points_dir("PONIES")
    assert ostore.fs.dir_size(pdir) == 0
    _write(ostore, "PONIES", [(0, 0, 1)])
    s1 = ostore.fs.dir_size(pdir)
    assert s1 > 0
    _write(ostore, "PONIES", [(2, 2, 2), (4, 4, 3)])
    assert ostore.fs.dir_size(pdir) > s1


def test_rollover_and_gc_under_object_semantics(spark, tmp_path):
    # Epoch cut + compaction + gc — every meta flip goes through the
    # copy-then-delete rename path.
    store = TimeStore(spark, str(tmp_path / "objroll"),
                      rollover_bytes=1, fs_class=ObjectStoreFS)
    store.register_namespace("r", buckets=4)
    for day in range(3):
        _write(store, "r", [(2, day * 100 + 1, day)])
    assert len(store.index("r").entries) >= 2  # rollover cut epochs
    before = _vals(store, "r")
    store.compact("r")
    store.gc("r")
    assert _vals(store, "r") == before
    assert store.fs.renames > 0  # the shim actually carried the metas


# ------------------------------------------------------- crash windows

def test_crash_before_copy_loses_nothing(ostore):
    ostore.register_namespace("c", buckets=4)
    _write(ostore, "c", [(2, 1, 1)])
    meta_p = ostore._meta_path("c")
    # Crash at the start of the backup rename: primary still intact.
    ostore.fs.crash_before_copy = True
    with pytest.raises(SimulatedCrash):
        _write(ostore, "c", [(2, 2, 2)])
    assert ostore.fs.exists_or_recover(meta_p)
    # The crashed write's DATA may have landed (the parquet append
    # precedes the meta flip and appends are additive by design) but
    # the meta document survived intact and the store keeps serving
    # reads and accepting writes.
    got = _vals(ostore, "c")
    assert [(2, 1, 1)] == [r for r in got if r[1] == 1]
    _write(ostore, "c", [(2, 3, 3)])
    assert (2, 3, 3) in _vals(ostore, "c")


def test_crash_between_copy_and_delete_recovers(ostore):
    # The object-store-specific window: meta exists at BOTH _meta.json
    # and _meta.json.bak (copy done, delete pending).  One complete
    # copy must survive and reads must keep working.
    ostore.register_namespace("c", buckets=4)
    _write(ostore, "c", [(2, 1, 1)])
    meta_p = ostore._meta_path("c")
    ostore.fs.crash_before_delete = True
    with pytest.raises(SimulatedCrash):
        _write(ostore, "c", [(2, 2, 2)])
    assert ostore.fs.exists_or_recover(meta_p)
    got = _vals(ostore, "c")
    # The crashed write's DATA may have landed (appends are additive)
    # but the meta is one of the two complete versions — never torn.
    assert [(2, 1, 1)] == [r for r in got if r[1] == 1]
    _write(ostore, "c", [(2, 3, 3)])
    assert (2, 3, 3) in _vals(ostore, "c")


def test_recover_from_backup_only(ostore):
    # Primary deleted outright (the delete half of a failed replace):
    # exists_or_recover restores from .bak via the non-atomic rename.
    ostore.register_namespace("c", buckets=4)
    _write(ostore, "c", [(2, 1, 1)])
    meta_p = ostore._meta_path("c")
    text = ostore.fs.read_text(meta_p)
    # Simulate: backup exists, primary gone.
    ostore.fs.write_text_atomic(meta_p + ".bak", text)
    ostore.fs.delete(meta_p, False)
    assert ostore.fs.exists_or_recover(meta_p)
    assert _vals(ostore, "c") == [(2, 1, 1)]


def test_directory_rename_refused(ostore, tmp_path):
    ostore.fs.mkdirs(str(tmp_path / "objstore" / "adir"))
    with pytest.raises(IOError):
        ostore.fs.rename(str(tmp_path / "objstore" / "adir"),
                         str(tmp_path / "objstore" / "bdir"))


def test_mutable_kv_under_object_semantics(spark, tmp_path):
    # The KV view rides the same meta/flip machinery — prove the whole
    # insert/lookup/enumerate surface under object-store rename.
    from rados_timestore_spark.mutable import MutableKV

    store = TimeStore(spark, str(tmp_path / "objkv"),
                      fs_class=ObjectStoreFS)
    store.register_namespace("kv", buckets=4)
    kv = MutableKV(store, "kv")
    kv.insert(7, b"alpha")
    kv.insert(9, b"beta")
    kv.insert(7, b"gamma")          # last-write-wins
    assert kv.lookup(7) == b"gamma"
    assert kv.lookup(9) == b"beta"
    assert kv.lookup(11) is None
    got = {(r.key, bytes(r.value)) for r in kv.enumerate().collect()}
    assert got == {(7, b"gamma"), (9, b"beta")}
    assert store.fs.renames > 0


def test_full_maintenance_lifecycle_under_object_semantics(spark, tmp_path):
    # Every maintenance verb — rollover, expire (TTL partition drop),
    # rescale, dedup compaction, gc — through the copy-then-delete
    # rename semantics, with reads law-checked at each step.  This is
    # the operational loop a real object-store deployment runs.
    store = TimeStore(spark, str(tmp_path / "objlife"),
                      rollover_bytes=1, fs_class=ObjectStoreFS)
    store.register_namespace("L", buckets=4)
    day = 100
    for d in range(4):
        _write(store, "L", [(2, d * day + i, d * 10 + i)
                            for i in range(3)])
    assert _vals(store, "L") == sorted(
        (2, d * day + i, d * 10 + i) for d in range(4) for i in range(3))
    # TTL: drop everything before day 2 (days 0 and 1 are whole epochs)
    dropped = store.expire("L", 2 * day)
    assert len(dropped) == 2
    want = sorted(
        (2, d * day + i, d * 10 + i) for d in (2, 3) for i in range(3))
    assert _vals(store, "L") == want
    # forward rescale + replayed duplicate + dedup compaction + gc
    store.rescale("L", 8)
    _write(store, "L", [(2, 2 * day, 999)])  # first-wins loser
    store.compact("L", dedup=True)
    store.gc("L")
    assert _vals(store, "L") == want  # original (2, 200, 20) won
    assert store.fs.renames > 0
