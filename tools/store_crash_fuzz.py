"""Exhaustive kill-at-EVERY-FS-boundary crash fuzz for the TimeStore
core verbs — the store-side sibling of tools/index_crash_fuzz.py
(harness + rationale: tests/crash_fuzz_harness.py; strided pytest
subset: tests/test_store_crash_fuzz.py).

The verb script covers the full maintenance alphabet on one points
namespace and one MutableKV namespace:

    gc -> write_points x2 -> compact -> expire
       -> kv.insert_bulk -> kv.delete_bulk -> kv.vacuum

Every FS mutation (~44: staged-promote renames, meta CAS tmp+backup
dance, flip locks, generation swaps, stage sweeps) is a kill point.
Recovery models the documented runbook: the stale flip lock is swept
(the production path is the 60 s stale-break in _flip_lock — the
fuzz can't wait that long per boundary), then the WHOLE script
replays on a cold store.

Convergence is asserted at the READ level, which is the store's
actual contract — physical layout may legitimately differ after a
crash-replay (a replayed write_points appends a second copy under a
fresh batch tag; first-wins dedup collapses it at read; the replayed
compact collapses it on disk; rollover may cut epochs differently
under the transiently-doubled bytes):

    read_simple rows == no-crash rows,
    watermarks ==, verify().ok on BOTH namespaces,
    KV latest view ==.

NOT in the script: merge_into — its fold is order-dependent and
carries no batch fence, so crash-replay exactly-once is the CALLER's
job (pair it with a fenced source such as foreachBatch, like
VectorIndex.append vs append_batch).  Documented in PLANS.md r10.

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


def main():
    stride = int(sys.argv[1]) if len(sys.argv) > 1 else 1
    spark = get_spark(master="local[16]", shuffle_partitions=8)
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

    root = tempfile.mkdtemp(prefix="store_crash_fuzz_")
    tmpl = f"{root}/tmpl"

    def make(r, fuel=None):
        st = TimeStore(spark, r, fs_class=FSC)
        st.fs.fuel = fuel
        return st

    st = make(tmpl)
    st.register_namespace("p", buckets=8)
    st.write_points("p", p0)
    MutableKV(st, "k")

    def script(store):
        store.gc("p")
        store.gc("k_INTERNAL")
        store.write_points("p", p1)
        store.write_points("p", p2)
        store.compact("p")
        store.expire("p", cutoff)
        kv = MutableKV(store, "k")
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

    fin = f"{root}/fin"
    shutil.copytree(tmpl, fin)
    d = make(fin)
    script(d)
    total = d.fs.ops
    want = probe(make(fin))
    print(f"[store] boundaries={total} want_rows={len(want[0])} "
          f"kv={len(want[3])}", flush=True)

    bad = 0
    t0 = time.time()
    for fuel in range(0, total, stride):
        w = f"{root}/k{fuel}"
        shutil.rmtree(w, ignore_errors=True)
        shutil.copytree(tmpl, w)
        crashed = make(w, fuel=fuel)
        where = "no-crash?"
        try:
            script(crashed)
            raise AssertionError(f"fuel={fuel} did not crash")
        except SimulatedCrash as e:
            where = str(e)[:70]
        for lk in glob.glob(f"{w}/**/*.lock", recursive=True):
            os.remove(lk)   # models the 60s stale-break
        script(make(w))
        got = probe(make(w))
        ok = got == want
        bad += not ok
        print(f"[store] fuel={fuel:3d} "
              f"{'OK' if ok else 'DIVERGED'}  ({where})", flush=True)
        shutil.rmtree(w, ignore_errors=True)
    print(f"[store] {'ALL CONVERGED' if not bad else f'{bad} DIVERGED'}"
          f" over {total} boundaries (stride {stride}) "
          f"in {time.time() - t0:.0f}s", flush=True)
    sys.exit(1 if bad else 0)


if __name__ == "__main__":
    main()
