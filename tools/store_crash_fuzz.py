"""Exhaustive kill-at-EVERY-FS-boundary crash fuzz for the TimeStore
core verbs — the store-side sibling of tools/index_crash_fuzz.py
(harness + rationale: tests/crash_fuzz_harness.py; strided pytest
subset: tests/test_store_crash_fuzz.py).

Three scenarios, each killing at every FS mutation (staged-promote
renames, meta CAS tmp+backup dance, flip locks, generation swaps,
stage sweeps):

  unified (~60 boundaries):
    gc -> write_points x2 -> kv.merge_into(batch_id=0,1) -> compact
       -> expire -> kv.insert_bulk -> kv.delete_bulk -> kv.vacuum
  dual (~32 boundaries), on an extended_buckets namespace:
    gc -> mixed write -> rescale(simple) -> rescale(extended)
       -> write_points_batched -> compact
  rollover (~29 boundaries), rollover_bytes=1 so EVERY write triggers
  _maybe_rollover's epoch cut + CAS:
    gc -> write -> rescale -> write -> compact -> expire

Recovery models the documented runbook: sweep the stale flip lock
(production: the 60 s stale-break in _flip_lock — the fuzz can't wait
per boundary), then replay the WHOLE script on a cold store.

Convergence is asserted at the READ level, which is the store's
actual contract — physical layout may legitimately differ after a
crash-replay (a replayed write_points appends a second copy under a
fresh batch tag; first-wins dedup collapses it at read; the replayed
compact collapses it on disk; rollover may cut epochs differently
under the transiently-doubled bytes):

    read_simple/read_extended rows == no-crash rows,
    watermarks ==, verify().ok, KV latest view ==.

merge_into rides with ``batch_id=`` (r11): the fence commits inside
the same CAS flip as the merged generation, making the crashed-and-
replayed MERGE exactly-once.  UNFENCED merge_into stays out of the
scripts — without a fence the fold double-applies on replay, which
is the caller's contract (pass the foreachBatch micro-batch id).
The fenced merges sit BEFORE the insert_bulk: a replayed insert_bulk
re-stacks its values above whatever is live, so anything merged into
those same keys afterward would legitimately differ — disjoint key
ranges keep the law exact.

    python tools/store_crash_fuzz.py [stride]   # default 1 = all
"""

import glob
import os
import shutil
import sys
import tempfile
import time

from pyspark.sql import functions as F

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

from crash_fuzz_harness import countdown_fs_class  # noqa: E402
from rados_timestore_spark import MutableKV, TimeStore, get_spark  # noqa: E402
from rados_timestore_spark.fsutil import SimulatedCrash  # noqa: E402
from rados_timestore_spark.queries_common import event_us  # noqa: E402

SF = "/root/testdata/sf0.001"


def _sweep(name, make, tmpl, script, probe, stride, root):
    fin = f"{root}/{name}_fin"
    shutil.copytree(tmpl, fin)
    d = make(fin)
    script(d)
    total = d.fs.ops
    want = probe(make(fin))
    print(f"[{name}] boundaries={total}", flush=True)
    bad = 0
    t0 = time.time()
    for fuel in range(0, total, stride):
        w = f"{root}/{name}_k{fuel}"
        shutil.rmtree(w, ignore_errors=True)
        shutil.copytree(tmpl, w)
        where = "?"
        try:
            script(make(w, fuel=fuel))
            # FS-op counts can vary by one or two between otherwise
            # identical runs (write_text_atomic's bounded replace
            # loop is state-dependent): a fuel at/past this run's
            # total is simply a clean run — still compare, skip the
            # replay.  Gated to the last few boundaries (review
            # finding): accepting ANY non-crash would let a
            # fuel-plumbing regression turn the whole sweep
            # vacuously green.
            if fuel < total - 3:
                raise AssertionError(
                    f"fuel={fuel} did not crash but is far from the "
                    f"dry-run total {total} — the countdown FS is "
                    f"not seeing this scenario's mutations")
            where = "no crash (op-count variance) — clean run"
            got = probe(make(w))
            ok = got == want
            bad += not ok
            print(f"[{name}] fuel={fuel:3d} "
                  f"{'OK' if ok else 'DIVERGED'}  ({where})", flush=True)
            shutil.rmtree(w, ignore_errors=True)
            continue
        except SimulatedCrash as e:
            where = str(e)[:70]
        for lk in glob.glob(f"{w}/**/*.lock", recursive=True):
            os.remove(lk)   # models the 60s stale-break
        script(make(w))
        got = probe(make(w))
        ok = got == want
        bad += not ok
        print(f"[{name}] fuel={fuel:3d} "
              f"{'OK' if ok else 'DIVERGED'}  ({where})", flush=True)
        shutil.rmtree(w, ignore_errors=True)
    print(f"[{name}] {'ALL CONVERGED' if not bad else f'{bad} DIVERGED'}"
          f" over {total} boundaries (stride {stride}) "
          f"in {time.time() - t0:.0f}s", flush=True)
    return bad


def unified(spark, make, root, stride):
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

    tmpl = f"{root}/unified_tmpl"
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

    return _sweep("unified", make, tmpl, script, probe, stride, root)


def dual(spark, make, root, stride):
    ev = spark.read.parquet(f"{SF}/events.parquet")
    base = ev.select(
        (F.col("user_id") * 2).alias("saddr"),
        event_us(ev).alias("time"),
        F.col("value").cast("long").alias("value"),
        F.col("event_id").alias("seq"))
    mixed = base.select(
        F.when(F.col("seq") % 2 == 0, F.col("saddr"))
        .otherwise(F.col("saddr") + 1).alias("address"),
        "time",
        F.when(F.col("seq") % 2 == 0, F.col("value")).alias("value"),
        F.when(F.col("seq") % 2 == 1,
               F.encode(F.col("value").cast("string"), "utf-8"))
        .alias("payload"),
        "seq")
    m0 = mixed.filter(F.col("seq") % 3 == 0)
    m1 = mixed.filter(F.col("seq") % 3 == 1)
    m2 = (mixed.filter(F.col("seq") % 3 == 2)
          .withColumn("batch", F.col("seq") % 4))
    saddrs = [r.address for r in
              mixed.filter(F.col("address") % 2 == 0)
              .select("address").distinct().limit(4).collect()]
    xaddrs = [r.address for r in
              mixed.filter(F.col("address") % 2 == 1)
              .select("address").distinct().limit(4).collect()]

    tmpl = f"{root}/dual_tmpl"
    st = make(tmpl)
    st.register_namespace("d", buckets=4, extended_buckets=4)
    st.write_points("d", m0)

    def script(store):
        store.gc("d")
        store.write_points("d", m1)
        store.rescale("d", 8)
        store.rescale("d", 8, extended=True)
        store.write_points_batched("d", m2, "batch")
        store.compact("d")

    def probe(store):
        rs = tuple(sorted(map(tuple,
                   store.read_simple("d", 0, 1 << 62,
                                     saddrs).collect())))
        rx = tuple(sorted(
            (r.address, r.time, bytes(r.payload)) for r in
            store.read_extended("d", 0, 1 << 62, xaddrs).collect()))
        return rs, rx, store.latest("d"), store.verify("d")["ok"]

    return _sweep("dual", make, tmpl, script, probe, stride, root)


def rollover(spark, root, stride):
    """Third scenario: rollover_bytes=1 makes EVERY write trigger
    _maybe_rollover's epoch cut + CAS — the R1 maintenance machinery
    under kill-at-every-boundary, plus a rescale mid-script."""
    from rados_timestore_spark.fsutil import HadoopFS  # noqa: F401

    FSC = countdown_fs_class()

    def make(r, fuel=None):
        st = TimeStore(spark, r, rollover_bytes=1, fs_class=FSC)
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

    tmpl = f"{root}/rollover_tmpl"
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

    return _sweep("rollover", make, tmpl, script, probe, stride, root)


def main():
    stride = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark(master="local[16]", shuffle_partitions=8)
    FSC = countdown_fs_class()
    root = tempfile.mkdtemp(prefix="store_crash_fuzz_")

    def make(r, fuel=None):
        st = TimeStore(spark, r, fs_class=FSC)
        st.fs.fuel = fuel
        return st

    bad = unified(spark, make, root, stride)
    bad += dual(spark, make, root, stride)
    bad += rollover(spark, root, stride)
    print(f"TOTAL DIVERGED: {bad}")
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
