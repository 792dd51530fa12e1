"""Strided kill-point crash fuzz for the TimeStore verb alphabet —
the store-side sibling of tests/test_index_crash_fuzz.py.  Harness +
rationale: tests/crash_fuzz_harness.py; the exhaustive every-boundary
sweep is tools/store_crash_fuzz.py (run per round, recorded in
BENCH_NOTES.md).

Law: after a kill at ANY FS-mutation boundary (staged-promote
renames, meta CAS tmp+backup dance, flip locks, generation swaps),
sweeping the stale flip lock (the 60 s stale-break, accelerated) and
replaying the WHOLE script on a cold store converges at the READ
level — rows, watermarks, verify().ok, KV latest view.  Physical
layout may legitimately differ (replayed appends duplicate rows that
first-wins dedup collapses; rollover may cut differently under the
transient double bytes) — that freedom is exactly why the law is
stated over reads.
"""

import glob
import os
import shutil

import pytest
from pyspark.sql import functions as F

from rados_timestore_spark.fsutil import SimulatedCrash
from rados_timestore_spark.mutable import MutableKV
from rados_timestore_spark.queries_common import event_us
from rados_timestore_spark.store import TimeStore
from tests.crash_fuzz_harness import countdown_fs_class

SF = "/root/testdata/sf0.001"


def _strides(total: int, points: int = 5) -> list[int]:
    ks = {0, total - 1}
    for i in range(1, points - 1):
        ks.add(i * total // (points - 1))
    return sorted(ks)


@pytest.mark.slow  # soak/fuzz: excluded from the default run (see pytest.ini)
def test_store_crash_fuzz_strided(spark, tmp_path):
    FSC = countdown_fs_class()
    ev = spark.read.parquet(f"{SF}/events.parquet")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        event_us(ev).alias("time"),
        F.col("value").cast("long").alias("value"),
        F.col("event_id").alias("seq"))
    p0 = pts.filter(F.col("seq") % 3 == 0)
    p1 = pts.filter(F.col("seq") % 3 == 1)
    p2 = pts.filter(F.col("seq") % 3 == 2)
    cutoff = int(pts.agg(
        F.expr("percentile(time, 0.25)")).collect()[0][0])
    kv1 = spark.range(0, 40).select(
        (F.col("id") * 2).alias("key"),
        F.encode(F.concat(F.lit("v"), F.col("id").cast("string")),
                 "utf-8").alias("value"),
        F.col("id").alias("seq"))
    dels = spark.range(0, 10).select((F.col("id") * 2).alias("key"))
    addrs = [r.address for r in
             pts.select("address").distinct().limit(6).collect()]
    kvseed = spark.range(100, 120).select(
        (F.col("id") * 2).alias("key"),
        F.encode(F.concat(F.lit("s"), F.col("id").cast("string")),
                 "utf-8").alias("value"),
        F.col("id").alias("seq"))
    mb0 = spark.range(100, 112).select(
        (F.col("id") * 2).alias("key"),
        F.encode(F.concat(F.lit("m"), F.col("id").cast("string")),
                 "utf-8").alias("value"),
        F.col("id").alias("seq"))
    mb1 = spark.range(106, 125).select(
        (F.col("id") * 2).alias("key"),
        F.encode(F.concat(F.lit("n"), F.col("id").cast("string")),
                 "utf-8").alias("value"),
        F.col("id").alias("seq"))
    mrg = (lambda new, old: old + b"|" + new)

    def make(root, fuel=None):
        st = TimeStore(spark, root, fs_class=FSC)
        st.fs.fuel = fuel
        return st

    tmpl = str(tmp_path / "tmpl")
    st = make(tmpl)
    st.register_namespace("p", buckets=8)
    st.write_points("p", p0)
    MutableKV(st, "k").insert_bulk(kvseed)

    def script(store):
        store.gc("p")
        store.gc("k_INTERNAL")
        store.write_points("p", p1)
        store.write_points("p", p2)
        kv = MutableKV(store, "k")
        # fenced MERGEs (r11): exactly-once under crash-replay; they
        # sit BEFORE insert_bulk on DISJOINT keys (a replayed
        # insert_bulk re-stacks its values above whatever is live,
        # so merging into the same keys afterward would legitimately
        # differ)
        kv.merge_into(mb0, mrg, batch_id=0)
        kv.merge_into(mb1, mrg, batch_id=1)
        store.compact("p")
        store.expire("p", cutoff)
        kv.insert_bulk(kv1)
        kv.delete_bulk(dels)
        kv.vacuum()

    def probe(store):
        kv = MutableKV(store, "k")
        reads = tuple(sorted(map(tuple,
                      store.read_simple("p", 0, 1 << 62,
                                        addrs).collect())))
        lat = store.latest("p")
        v1 = store.verify("p")["ok"]
        kvs = tuple(sorted((r.key, bytes(r.value))
                           for r in kv.enumerate().collect()))
        v2 = store.verify("k_INTERNAL")["ok"]
        return reads, lat, v1, kvs, v2

    fin = str(tmp_path / "fin")
    shutil.copytree(tmpl, fin)
    dry = make(fin)
    script(dry)
    total = dry.fs.ops
    want = probe(make(fin))
    assert len(want[0]) > 0 and want[2] and want[4]

    for fuel in _strides(total):
        work = str(tmp_path / f"k{fuel}")
        shutil.copytree(tmpl, work)
        with pytest.raises(SimulatedCrash):
            script(make(work, fuel=fuel))
        for lk in glob.glob(f"{work}/**/*.lock", recursive=True):
            os.remove(lk)   # the 60 s stale-break, accelerated
        script(make(work))
        got = probe(make(work))
        assert got == want, f"fuel={fuel}"
        shutil.rmtree(work, ignore_errors=True)


@pytest.mark.slow  # soak/fuzz: excluded from the default run (see pytest.ini)
def test_store_rollover_crash_fuzz_strided(spark, tmp_path):
    # rollover_bytes=1: every write triggers _maybe_rollover's epoch
    # cut + CAS, so the kill points land inside the R1 maintenance
    # machinery (plus a mid-script rescale).  Same read-level law.
    FSC = countdown_fs_class()

    def make(root, fuel=None):
        st = TimeStore(spark, root, rollover_bytes=1, fs_class=FSC)
        st.fs.fuel = fuel
        return st

    ev = spark.read.parquet(f"{SF}/events.parquet")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        event_us(ev).alias("time"),
        F.col("value").cast("long").alias("value"),
        F.col("event_id").alias("seq"))
    p0 = pts.filter(F.col("seq") % 3 == 0)
    p1 = pts.filter(F.col("seq") % 3 == 1)
    p2 = pts.filter(F.col("seq") % 3 == 2)
    cutoff = int(pts.agg(
        F.expr("percentile(time, 0.25)")).collect()[0][0])
    addrs = [r.address for r in
             pts.select("address").distinct().limit(6).collect()]

    tmpl = str(tmp_path / "tmpl")
    st = make(tmpl)
    st.register_namespace("p", buckets=4)
    st.write_points("p", p0)

    def script(store):
        store.gc("p")
        store.write_points("p", p1)
        store.rescale("p", 8)
        store.write_points("p", p2)
        store.compact("p")
        store.expire("p", cutoff)

    def probe(store):
        rs = tuple(sorted(map(tuple,
                   store.read_simple("p", 0, 1 << 62,
                                     addrs).collect())))
        return rs, store.latest("p"), store.verify("p")["ok"]

    fin = str(tmp_path / "fin")
    shutil.copytree(tmpl, fin)
    dry = make(fin)
    script(dry)
    total = dry.fs.ops
    want = probe(make(fin))
    assert len(want[0]) > 0 and want[2]

    for fuel in _strides(total):
        work = str(tmp_path / f"k{fuel}")
        shutil.copytree(tmpl, work)
        try:
            script(make(work, fuel=fuel))
            # op counts can vary by a couple between runs
            # (write_text_atomic's replace loop is state-dependent):
            # a no-crash fuel near the total is a clean run; far
            # from it means the countdown FS saw no mutations — a
            # fuel-plumbing regression, not variance (review finding)
            assert fuel >= total - 3, f"no crash at fuel={fuel}"
        except SimulatedCrash:
            for lk in glob.glob(f"{work}/**/*.lock", recursive=True):
                os.remove(lk)
            script(make(work))
        assert probe(make(work)) == want, f"fuel={fuel}"
        shutil.rmtree(work, ignore_errors=True)
