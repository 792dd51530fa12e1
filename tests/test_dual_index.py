"""Dual per-kind index laws — reference parity for the two-index
namespace model (TimeStore.hs:74-90 registers separate simple/extended
bucket counts; Index.hs:45-49 keeps simple_days/extended_days as
separate documents; StoreHelpers.hs:194-221 rolls each over
independently).  Headline law: tests/UnitTests.hs:62-73
``extAfterSimple`` — an extended write after a simple-only rollover
reads back correctly."""

import pytest
from pyspark.sql import functions as F

from rados_timestore_spark.store import TimeStore


def _pts(spark, rows):
    return spark.createDataFrame(
        rows, "address long, time long, value long, payload binary, seq long"
    )


def _simple(spark, rows):
    # (address, time, value); address must have bit0 clear
    return spark.createDataFrame(rows, "address long, time long, value long")


def _extended(spark, rows):
    return spark.createDataFrame(
        [(a | 1, t, bytearray(p)) for a, t, p in rows],
        "address long, time long, payload binary",
    )


@pytest.fixture()
def dual(spark, tmp_path):
    store = TimeStore(spark, str(tmp_path / "wh"))
    store.register_namespace("PONIES", buckets=4, extended_buckets=5)
    return store


def test_register_dual_is_idempotent_and_exposes_both_indexes(dual):
    meta = dual._read_meta("PONIES")
    assert meta.dual
    assert meta.index.entries == ((0, 4),)
    assert meta.index_extended.entries == ((0, 5),)
    dual.register_namespace("PONIES", buckets=9, extended_buckets=9)  # no-op
    assert dual.index("PONIES").entries == ((0, 4),)
    assert dual.index("PONIES", extended=True).entries == ((0, 5),)
    # unified namespaces answer both with the same index
    dual.register_namespace("UNI", buckets=7)
    assert dual.index("UNI", extended=True).entries == ((0, 7),)


def test_ext_write_after_simple_rollover(spark, tmp_path):
    # UnitTests.hs:62-73 extAfterSimple: memoryStore rollover=0,
    # registerNamespace 4 5; simple write rolls the SIMPLE index over;
    # the extended write that follows must still read back — it routes
    # under the extended index's own (un-rolled) epoch layout.
    store = TimeStore(spark, str(tmp_path / "wh"), rollover_bytes=0)
    store.register_namespace("PONIES", buckets=4, extended_buckets=5)
    store.write_points("PONIES", _simple(spark, [(6, 6, 3)]))
    # the simple volume cut a new simple epoch ...
    assert len(store.index("PONIES").entries) == 2
    assert store.index("PONIES").entries[1][0] == 7  # watermark 6 + 1
    # ... and left the extended index alone
    assert store.index("PONIES", extended=True).entries == ((0, 5),)

    store.write_points("PONIES", _extended(spark, [(6, 7, b"yayyy")]))
    got = store.read_extended("PONIES", 0, 1 << 62, [7]).collect()
    assert [(r.address, r.time, bytes(r.payload)) for r in got] == [
        (7, 7, b"yayyy")
    ]
    # the extended write's OWN volume may roll the extended index
    # (threshold is 0), but any cut derives from the EXTENDED
    # watermark (7 + 1), never from the simple cut at 7
    xe = store.index("PONIES", extended=True).entries
    assert xe[0] == (0, 5) and all(e == 8 for e, _b in xe[1:])
    rep = store.verify("PONIES")
    assert rep["ok"], rep


def test_rollovers_are_independent_per_kind(spark, tmp_path):
    # Heavy simple volume rolls the simple index repeatedly; the
    # extended layout (epochs AND bucket count) never moves, and both
    # kinds read back exactly.
    store = TimeStore(spark, str(tmp_path / "wh"), rollover_bytes=0)
    store.register_namespace("NS", buckets=4, extended_buckets=2)
    expected_simple = []
    for batch in range(3):
        rows = [(a * 2, batch * 100 + t, a + t)
                for a in range(4) for t in range(10)]
        expected_simple += rows
        store.write_points("NS", _simple(store.spark, rows))
    # three simple rollovers later, the extended index has not moved
    assert len(store.index("NS").entries) >= 3
    assert store.index("NS", extended=True).entries == ((0, 2),)
    n_simple_entries = len(store.index("NS").entries)

    store.write_points(
        "NS", _extended(store.spark, [(2, 5, b"early"), (2, 250, b"late")]))

    # the extended write's own volume may cut the extended index at
    # ITS watermark (251) — and must not touch the simple one
    xe = store.index("NS", extended=True).entries
    assert xe[0] == (0, 2) and all(e == 251 for e, _b in xe[1:])
    assert len(store.index("NS").entries) == n_simple_entries

    got_s = {(r.address, r.time, r.value)
             for r in store.read_simple(
                 "NS", 0, 1 << 62, [0, 2, 4, 6]).collect()}
    assert got_s == set(expected_simple)
    got_x = {(r.address, r.time, bytes(r.payload))
             for r in store.read_extended("NS", 0, 1 << 62, [2]).collect()}
    assert got_x == {(3, 5, b"early"), (3, 250, b"late")}
    rep = store.verify("NS")
    assert rep["ok"], rep


def test_dual_reads_prune_kind_partition(dual, spark):
    dual.write_points("PONIES", _simple(spark, [(2, 10, 1), (4, 20, 2)]))
    dual.write_points("PONIES", _extended(spark, [(2, 10, b"x")]))
    plan = dual.read_simple(
        "PONIES", 0, 1 << 62, [2, 4])._jdf.queryExecution().executedPlan() \
        .toString()
    # kind leads the physical layout, so the kind filter is a
    # PartitionFilter: the extended tree is never listed, let alone read
    assert "PartitionFilters" in plan
    assert "kind" in plan.split("PartitionFilters", 1)[1][:400]


def test_rescale_extended_only_touches_extended_index(dual, spark):
    dual.write_points("PONIES", _simple(spark, [(2, 10, 1)]))
    dual.write_points("PONIES", _extended(spark, [(2, 10, b"x")]))
    dual.rescale("PONIES", 9, extended=True)
    assert dual.index("PONIES").entries == ((0, 4),)
    xe = dual.index("PONIES", extended=True).entries
    assert xe[0] == (0, 5) and xe[1][1] == 9
    # boundary derives from the EXTENDED watermark (10), not simple's
    assert xe[1][0] == 11
    dual.write_points("PONIES", _extended(spark, [(2, 100, b"y")]))
    got = {(r.time, bytes(r.payload))
           for r in dual.read_extended("PONIES", 0, 1 << 62, [2]).collect()}
    assert got == {(10, b"x"), (100, b"y")}
    rep = dual.verify("PONIES")
    assert rep["ok"], rep
    # rescaling the extended index of a unified namespace is an error
    dual.register_namespace("UNI", buckets=4)
    with pytest.raises(ValueError, match="extended"):
        dual.rescale("UNI", 8, extended=True)


def test_expire_drops_epochs_per_kind(spark, tmp_path):
    # Default threshold (no auto-cuts); cut ONLY the simple index via
    # rescale so the two kinds' epoch boundaries genuinely differ.
    store = TimeStore(spark, str(tmp_path / "wh"))
    store.register_namespace("NS", buckets=2, extended_buckets=2)
    store.write_points("NS", _simple(spark, [(2, 10, 1)]))
    store.write_points("NS", _extended(spark, [(2, 10, b"x")]))
    store.rescale("NS", 3)  # simple cut at 11; extended stays open
    store.write_points("NS", _simple(spark, [(2, 1000, 2)]))
    dropped = store.expire("NS", older_than_us=500)
    # simple epoch 0 covered [0, 11) -> fully expired; the extended
    # index has no cut so ITS epoch 0 is open-ended and survives,
    # even though its directory is also named epoch=0
    assert dropped == [0]
    got_s = store.read_simple("NS", 0, 1 << 62, [2]).collect()
    assert [(r.time, r.value) for r in got_s] == [(1000, 2)]
    got_x = store.read_extended("NS", 0, 1 << 62, [2]).collect()
    assert [(r.time, bytes(r.payload)) for r in got_x] == [(10, b"x")]


def test_compact_preserves_dual_layout_and_reads(dual, spark):
    for t in range(3):
        dual.write_points(
            "PONIES", _simple(spark, [(2, 10 + t, t), (4, 20 + t, t)]))
    dual.write_points(
        "PONIES", _extended(spark, [(2, 10, b"x"), (4, 11, b"y")]))
    before_s = {(r.address, r.time, r.value) for r in
                dual.read_simple("PONIES", 0, 1 << 62, [2, 4]).collect()}
    before_x = {(r.address, r.time, bytes(r.payload)) for r in
                dual.read_extended("PONIES", 0, 1 << 62, [2, 4]).collect()}
    dual.compact("PONIES")
    after_s = {(r.address, r.time, r.value) for r in
               dual.read_simple("PONIES", 0, 1 << 62, [2, 4]).collect()}
    after_x = {(r.address, r.time, bytes(r.payload)) for r in
               dual.read_extended("PONIES", 0, 1 << 62, [2, 4]).collect()}
    assert after_s == before_s and after_x == before_x
    # the rewritten generation keeps the kind-led layout
    pdir = dual._points_dir("PONIES")
    assert {d.split("=")[0] for d in dual.fs.list_dirs(pdir)} == {"kind"}
    rep = dual.verify("PONIES")
    assert rep["ok"], rep


@pytest.mark.slow  # soak/fuzz: excluded from the default run (see pytest.ini)
def test_write_points_batched_dual_matches_sequential_loop(spark, tmp_path):
    # VERDICT r10 #9 (closes the r10 refusal): the batched backfill on
    # a dual namespace replays the per-kind fold — identical per-kind
    # indexes, watermarks, physical placement, and reads to a
    # per-batch write_points loop on an always-rolling store.  The
    # batch set exercises the UnitTests.hs:62-73 corner: batch 1 is
    # simple-only (cuts ONLY the simple index), batch 2's extended
    # row must still route under the extended index's original epoch.
    schema = "batch long, address long, time long, value long, payload binary"
    batches = [
        [(0, 2, 10, 1, None), (0, 3, 12, None, bytearray(b"a"))],
        [(1, 4, 20, 2, None)],                      # simple-only cut
        [(2, 3, 14, None, bytearray(b"b")),         # ext under epoch 0
         (2, 2, 30, 3, None)],
        [(3, 5, 40, None, bytearray(b"c"))],        # extended-only cut
    ]
    seq_store = TimeStore(spark, str(tmp_path / "seq"), rollover_bytes=1)
    seq_store.register_namespace("A", buckets=4, extended_buckets=5)
    for b in batches:
        seq_store.write_points(
            "A", spark.createDataFrame(b, schema).drop("batch"))
    bat_store = TimeStore(spark, str(tmp_path / "bat"))
    bat_store.register_namespace("A", buckets=4, extended_buckets=5)
    allrows = spark.createDataFrame([r for b in batches for r in b], schema)
    bat_store.write_points_batched("A", allrows, "batch")

    for ext in (False, True):
        assert (bat_store.index("A", extended=ext).entries
                == seq_store.index("A", extended=ext).entries)
    assert bat_store.latest("A") == seq_store.latest("A")
    # the two kinds rolled over independently: their epoch boundaries
    # diverged (each kind cut at its OWN watermark progression)
    assert bat_store.index("A").entries \
        != bat_store.index("A", extended=True).entries

    def placement(st):
        df = spark.read.parquet(st._points_dir("A"))
        return sorted((r.kind, r.epoch, r.bucket, r.address, r.time)
                      for r in df.collect())

    assert placement(bat_store) == placement(seq_store)

    def reads(st):
        s = [(r.address, r.time, r.value) for r in st.read_simple(
            "A", 0, 1000, [2, 4], global_order=True).collect()]
        x = [(r.address, r.time, bytes(r.payload)) for r in
             st.read_extended("A", 0, 1000, [3, 5], global_order=True)
             .collect()]
        return s, x

    assert reads(bat_store) == reads(seq_store)
    for st in (bat_store, seq_store):
        rep = st.verify("A")
        assert rep["ok"], rep


@pytest.mark.slow  # soak/fuzz: excluded from the default run (see pytest.ini)
def test_streaming_ingest_into_dual_namespace(spark, tmp_path):
    # stream_points rides write_points, so dual routing comes free —
    # certify it: micro-batched mixed-kind ingest reads back exactly,
    # and the simple rollover mid-stream leaves extended routing alone.
    import os

    from rados_timestore_spark.streaming.ingest import stream_points

    store = TimeStore(spark, str(tmp_path / "wh"), rollover_bytes=0)
    store.register_namespace("S", buckets=4, extended_buckets=3)
    rows = []
    for t in range(6):
        rows.append((2, 10 + t, t, None))              # simple
        rows.append((3, 10 + t, None, bytearray(b"p%d" % t)))  # extended
    df = spark.createDataFrame(
        rows, "address long, time long, value long, payload binary")
    src = str(tmp_path / "src")
    os.makedirs(src)
    for i in range(3):  # 3 micro-batches of 4 rows
        (df.filter((F.col("time") - 10) % 3 == i).coalesce(1)
         .write.parquet(f"{src}/b{i}", mode="overwrite"))
    stream = (
        spark.readStream.schema(df.schema)
        .option("maxFilesPerTrigger", 1).parquet(f"{src}/b*")
    )
    q = stream_points(store, "S", stream, str(tmp_path / "ck"),
                      trigger={"availableNow": True})
    assert q.awaitTermination(180)

    got_s = {(r.time, r.value)
             for r in store.read_simple("S", 0, 1 << 62, [2]).collect()}
    assert got_s == {(10 + t, t) for t in range(6)}
    got_x = {(r.time, bytes(r.payload))
             for r in store.read_extended("S", 0, 1 << 62, [3]).collect()}
    assert got_x == {(10 + t, b"p%d" % t) for t in range(6)}
    # per-kind rollovers fired independently per micro-batch
    assert len(store.index("S").entries) >= 2
    xe = store.index("S", extended=True).entries
    assert xe[0] == (0, 3)
    rep = store.verify("S")
    assert rep["ok"], rep
