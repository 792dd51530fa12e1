"""Structured Streaming ingest: micro-batched writes must read back
identically to one batch write (SURVEY.md §7.2 step 5; reference
continuous ingest lib/TimeStore.hs:98-137)."""

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from rados_timestore_spark.queries_common import event_us
from rados_timestore_spark.store import TimeStore
from rados_timestore_spark.streaming.ingest import stream_points


def _deliver_file(tmp_path, src, i, df):
    """Land ``df`` as the i-th single-file micro-batch under ``src``
    with a strictly increasing mtime.  The file source orders batches
    by MODIFICATION TIME, so the utime bump is load-bearing — it is
    what makes multi-batch delivery deterministic and chronological
    (one shared implementation; the copies it replaced could drift,
    r8 review finding)."""
    import glob as _glob
    import os as _os
    import shutil as _shutil
    import time as _time

    tmp = str(tmp_path / f"w{i}")
    df.coalesce(1).write.parquet(tmp)
    part = _glob.glob(f"{tmp}/part-*.parquet")[0]
    dest = f"{src}/b{i}.parquet"
    _shutil.move(part, dest)
    _os.utime(dest, (_time.time() + i, _time.time() + i))



def test_streaming_ingest_matches_batch(spark, tmp_path):
    # Source: the sf0.001 events as a rate-limited file stream —
    # split into several parquet files so multiple micro-batches fire.
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        event_us(ev).alias("time"),
        F.col("event_id").alias("value"),
        F.col("event_id").alias("seq"),
    )
    src_dir = str(tmp_path / "src")
    pts.repartition(4).write.parquet(src_dir)

    # Batch reference store.
    batch_store = TimeStore(spark, str(tmp_path / "batch"))
    batch_store.register_namespace("ns", buckets=8)
    batch_store.write_points("ns", pts)

    # Streaming store: one file per micro-batch.
    stream_store = TimeStore(spark, str(tmp_path / "stream"))
    stream_store.register_namespace("ns", buckets=8)
    source = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(src_dir)
    )
    q = stream_points(
        stream_store, "ns", source,
        checkpoint_dir=str(tmp_path / "ckpt"),
        trigger={"availableNow": True},
    )
    q.awaitTermination(120)

    lo, hi = 0, 1 << 62
    addrs = [r.address for r in pts.select("address").distinct().collect()]
    got = stream_store.read_simple("ns", lo, hi, addrs, global_order=True)
    want = batch_store.read_simple("ns", lo, hi, addrs, global_order=True)
    g = [(r.address, r.time, r.value) for r in got.collect()]
    w = [(r.address, r.time, r.value) for r in want.collect()]
    assert g == w
    assert len(g) > 0
    # Watermarks advanced identically.
    assert stream_store.latest("ns") == batch_store.latest("ns")


def test_streaming_rejects_batch_df(spark, tmp_path):
    store = TimeStore(spark, str(tmp_path / "s"))
    store.register_namespace("ns", buckets=8)
    df = spark.createDataFrame([(2, 1, 1, 0)],
                               "address long, time long, value long, seq long")
    with pytest.raises(ValueError):
        stream_points(store, "ns", df, checkpoint_dir=str(tmp_path / "c"))


def test_stream_rollup_matches_batch(spark, tmp_path):
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        event_us(ev).alias("time"),
        F.col("event_id").alias("value"),
        F.col("event_id").alias("seq"),
    )
    src = str(tmp_path / "src")
    pts.repartition(3).write.parquet(src)

    from rados_timestore_spark.streaming.windows import stream_rollup

    # One micro-batch for all files: multi-batch file order is not
    # chronological, so the watermark would (correctly) drop late rows
    # and the batch comparison would no longer be exact.
    stream = spark.readStream.schema(pts.schema).parquet(src)
    out = str(tmp_path / "out")
    q = (
        stream_rollup(stream, window="1 hour", watermark="10 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # Append mode only emits windows the watermark has closed; every
    # emitted window must match the batch aggregate exactly.
    got = spark.read.parquet(out).select(
        F.col("window.start").alias("ws"), "address", "n", "sum_value")
    want = (
        pts.withColumn("event_ts", F.timestamp_micros(F.col("time")))
        .groupBy(F.window("event_ts", "1 hour"), F.col("address"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("ws"), "address", "n",
                "sum_value")
    )
    g = {(r.ws, r.address): (r.n, r.sum_value) for r in got.collect()}
    w = {(r.ws, r.address): (r.n, r.sum_value) for r in want.collect()}
    assert g, "watermark closed no windows — bad test setup"
    for key, val in g.items():
        assert w[key] == val


def test_stream_latest_per_key_stateful(spark, tmp_path):
    from rados_timestore_spark.core import latest_per_key
    from rados_timestore_spark.streaming.windows import stream_latest_per_key

    rows = [(2, 10, 100, 0), (2, 30, 300, 1), (4, 5, 50, 2),
            (2, 30, 999, 3), (4, 7, 70, 4)]
    pts = spark.createDataFrame(
        rows, "address long, time long, value long, seq long")
    src = str(tmp_path / "src")
    pts.repartition(2).write.parquet(src)
    stream = (
        spark.readStream.schema(pts.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_latest_per_key(stream)
        .writeStream.format("memory").queryName("latest_out")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck2"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    # Last emitted row per key == batch latest-per-key (time DESC,
    # seq ASC tiebreak: (2,30) keeps seq 1 / value 300).
    emitted = spark.sql("SELECT * FROM latest_out").collect()
    assert emitted
    final = {}
    for r in emitted:  # memory sink appends per batch; later wins
        final[r.address] = (r.time, r.value, r.seq)
    want = {
        r["address"]: (r["time"], r["value"], r["seq"])
        for r in latest_per_key(pts, payload_cols=("value",)).collect()
    }
    assert final == want


def test_stream_rollup_multibatch_chronological(spark, tmp_path):
    # Multi-batch watermark semantics, made deterministic: one file per
    # day written with increasing mtimes (the file source orders
    # batches by modification time), so batches arrive chronologically
    # and append mode must emit every window the final watermark
    # closed, with counts matching batch exactly.
    import os
    import time as _t

    from rados_timestore_spark.streaming.windows import stream_rollup

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        event_us(ev).alias("time"),
        F.col("event_id").alias("value"),
    ).withColumn("day", F.expr("time div 86400000000"))
    days = sorted(r.day for r in pts.select("day").distinct().collect())[:3]
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = _t.time()
    for i, day in enumerate(days):
        import glob
        import shutil

        _deliver_file(tmp_path, src, i,
                      pts.filter(F.col("day") == day).drop("day"))
    used = pts.filter(F.col("day").isin([int(d) for d in days])).drop("day")

    stream = (
        spark.readStream.schema(used.schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream_rollup(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = {
        (r.ws, r.address): (r.n, r.sum_value)
        for r in spark.read.parquet(out).select(
            F.col("window.start").alias("ws"), "address", "n", "sum_value"
        ).collect()
    }
    assert got
    want_all = (
        used.withColumn("event_ts", F.timestamp_micros(F.col("time")))
        .groupBy(F.window("event_ts", "1 hour"), F.col("address"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.col("window.start").alias("ws"), "address", "n",
                "sum_value")
    )
    want = {(r.ws, r.address): (r.n, r.sum_value)
            for r in want_all.collect()}
    # chronological batches => no late-beyond-watermark drops: every
    # emitted window matches batch exactly
    for key, val in got.items():
        assert want[key] == val, key
    # and all windows the final watermark closed were emitted
    max_us = used.agg(F.max("time")).collect()[0][0]
    wm_us = max_us - 30 * 60 * 1_000_000
    n_closed = sum(
        1 for (ws, _a) in want
        if (ws.timestamp() + 3600) * 1_000_000 <= wm_us
    )
    assert len(got) == n_closed


def test_stream_asof_join_multibatch_state(spark, tmp_path):
    # The as-of view buffer must persist in state across micro-batches:
    # batch 1 delivers only views, batch 2 only purchases — matches
    # must still resolve against batch-1 views.  Also checks the
    # horizon prune (a view farther back than horizon_us never wins)
    # and the >=/largest-event-id tie rules.
    import glob
    import os
    import shutil
    import time as _t

    from rados_timestore_spark.streaming.windows import stream_asof_join

    views = [(1, 100, 10), (1, 100, 11), (1, 500, 12), (2, 50, 20)]
    purchases = [(1, 100, 31), (1, 600, 32), (2, 5000, 33), (3, 700, 34)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = _t.time()
    for i, rows in enumerate((views, purchases)):
        tmp = str(tmp_path / f"w{i}")
        spark.createDataFrame(
            [r + ("view" if i == 0 else "purchase",) for r in rows],
            "user_id long, t long, event_id long, event_type string",
        ).coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/b{i}.parquet"
        shutil.move(part, dest)
        os.utime(dest, (now + i, now + i))

    schema = "user_id long, t long, event_id long, event_type string"
    left = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .filter(F.col("event_type") == "purchase")
    )
    right = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .filter(F.col("event_type") == "view")
    )
    out = str(tmp_path / "out")
    q = (
        stream_asof_join(left, right, horizon_us=1000)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.purchase_id, r.user_id, r.purchase_t, r.view_id, r.view_t)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        # purchase@100 matches the t==100 view (>= rule), largest id
        (31, 1, 100, 11, 100),
        # purchase@600 matches the latest view <= 600
        (32, 1, 600, 12, 500),
        # user 2's only view is 4950us back — beyond horizon: no row
        # user 3 has no views: no row
    ]


def test_stream_asof_join_right_side_late(spark, tmp_path):
    # The r4 contract: a left (purchase) row whose matching right
    # (view) rows arrive in a LATER micro-batch must still emit the
    # batch-oracle match — unmatched lefts persist in state and are
    # re-injected when the views show up.  This is the reverse
    # delivery order of test_stream_asof_join_multibatch_state.
    import glob
    import os
    import shutil
    import time as _t

    from rados_timestore_spark.streaming.windows import stream_asof_join

    purchases = [(1, 100, 31), (1, 600, 32), (2, 5000, 33), (3, 700, 34)]
    views = [(1, 100, 10), (1, 100, 11), (1, 500, 12), (2, 50, 20)]
    src = str(tmp_path / "src")
    os.makedirs(src)
    now = _t.time()
    for i, rows in enumerate((purchases, views)):
        tmp = str(tmp_path / f"w{i}")
        spark.createDataFrame(
            [r + ("purchase" if i == 0 else "view",) for r in rows],
            "user_id long, t long, event_id long, event_type string",
        ).coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/b{i}.parquet"
        shutil.move(part, dest)
        os.utime(dest, (now + i, now + i))

    schema = "user_id long, t long, event_id long, event_type string"
    left = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .filter(F.col("event_type") == "purchase")
    )
    right = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
        .filter(F.col("event_type") == "view")
    )
    out = str(tmp_path / "out")
    q = (
        stream_asof_join(left, right, horizon_us=1000)
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.purchase_id, r.user_id, r.purchase_t, r.view_id, r.view_t)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        # identical to the batch oracle, despite views arriving a
        # batch after every purchase:
        (31, 1, 100, 11, 100),
        (32, 1, 600, 12, 500),
        # user 2's view is beyond the horizon; user 3 has none.
    ]


def _write_batches(spark, tmp_path, batches, schema):
    """One parquet file per batch with strictly increasing mtimes, so
    the file source (ordered by modification time, maxFilesPerTrigger=1)
    delivers them as separate chronological micro-batches."""
    import glob
    import os
    import shutil
    import time as _t

    src = str(tmp_path / "src")
    os.makedirs(src)
    now = _t.time()
    for i, rows in enumerate(batches):
        tmp = str(tmp_path / f"w{i}")
        spark.createDataFrame(rows, schema).coalesce(1).write.parquet(tmp)
        part = glob.glob(f"{tmp}/part-*.parquet")[0]
        dest = f"{src}/b{i}.parquet"
        shutil.move(part, dest)
        os.utime(dest, (now + i, now + i))
    return src


def test_stream_asof_exact_late_better_view_is_incorporated(
        spark, tmp_path):
    # THE r4 residual (VERDICT item 4): a right row arriving one batch
    # late that IMPROVES on a match the eager operator would already
    # have emitted.  The exact variant must end with the batch-oracle
    # answer: purchase@200 matches view@150 (the late, better one),
    # not view@100.
    from rados_timestore_spark.streaming.windows import (
        stream_asof_join, stream_asof_join_exact)

    schema = "user_id long, t long, event_id long, event_type string"
    batches = [
        # batch 0: an early view and the purchase — an eager join
        # emits (purchase@200 -> view@100) here
        [(1, 100, 10, "view"), (1, 200, 31, "purchase")],
        # batch 1: the better view, one batch late (t=150 <= 200)
        [(1, 150, 11, "view")],
        # batch 2: flush — frontier past purchase.t + delay
        [(1, 10_000, -1, "__flush__")],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)

    def run(joined, out_name):
        out = str(tmp_path / out_name)
        q = (
            joined.writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", str(tmp_path / f"ck_{out_name}"))
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)
        return sorted(
            (r.purchase_id, r.view_id, r.view_t)
            for r in spark.read.parquet(out).collect()
        )

    def sources():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        return (stream.filter(F.col("event_type") == "purchase"),
                stream.filter(F.col("event_type") == "view"),
                stream.filter(F.col("event_type") == "__flush__"))

    # exact variant: the late better view wins — batch-oracle answer
    p, v, fl = sources()
    got = run(stream_asof_join_exact(p, v, horizon_us=1000,
                                     delay_us=500, flush=fl), "out_exact")
    assert got == [(31, 11, 150)]

    # the eager operator demonstrates the gap being closed: it already
    # emitted the inferior match before the better view arrived
    p, v, _fl = sources()
    eager = run(stream_asof_join(p, v, horizon_us=1000), "out_eager")
    assert eager == [(31, 10, 100)]


def test_stream_asof_exact_unmatched_and_horizon_rules(spark, tmp_path):
    # Same scenario matrix as the eager operator's tests: >=/largest-id
    # ties, horizon exclusion, keys with no views — all under delayed
    # finalization, plus a purchase whose ONLY views arrive later.
    from rados_timestore_spark.streaming.windows import stream_asof_join_exact

    schema = "user_id long, t long, event_id long, event_type string"
    batches = [
        [(1, 100, 31, "purchase"), (2, 5000, 33, "purchase"),
         (3, 700, 34, "purchase")],
        [(1, 100, 10, "view"), (1, 100, 11, "view"), (2, 50, 20, "view")],
        [(1, 600, 32, "purchase"), (1, 500, 12, "view")],
        [(1, 50_000, -1, "__flush__"), (2, 50_000, -1, "__flush__"),
         (3, 50_000, -1, "__flush__")],
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream_asof_join_exact(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "view"),
            horizon_us=1000, delay_us=10_000,
            flush=stream.filter(F.col("event_type") == "__flush__"),
        )
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted(
        (r.purchase_id, r.user_id, r.purchase_t, r.view_id, r.view_t)
        for r in spark.read.parquet(out).collect()
    )
    assert got == [
        # purchase@100: equal-t views arrived later; largest id wins
        (31, 1, 100, 11, 100),
        # purchase@600 matches latest view <= 600 from a mixed batch
        (32, 1, 600, 12, 500),
        # user 2: view 4950us back — beyond horizon; user 3: none
    ]


def test_stream_asof_timeout_finalize_no_per_key_sentinels(
        spark, tmp_path):
    # finalize='timeout': same late-better-view scenario as the
    # sentinel-exact test, but finalization comes from Spark's GLOBAL
    # event-time watermark + EventTimeTimeout — no per-key flush rows.
    # The only extra input is ONE far-future watermark-carrier row
    # under an UNRELATED key; the purchase's key never sees a sentinel
    # yet still finalizes (timeout fires in the final no-data batch).
    from rados_timestore_spark.streaming.windows import stream_asof_join

    schema = "user_id long, t long, event_id long, event_type string"
    batches = [
        [(1, 100, 10, "view"), (1, 200, 31, "purchase")],
        [(1, 150, 11, "view")],  # the better view, one batch late
        [(99, 10**12, -1, "__flush__")],  # single GLOBAL wm carrier
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    out = str(tmp_path / "out")
    q = (
        stream_asof_join(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "view"),
            horizon_us=1000, emit="watermark", finalize="timeout",
            wm_delay="1 second",  # covers the fixture's delivery disorder
            flush=stream.filter(F.col("event_type") == "__flush__"),
        )
        .writeStream.format("parquet").option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .outputMode("append").trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    got = sorted((r.purchase_id, r.view_id, r.view_t)
                 for r in spark.read.parquet(out).collect())
    assert got == [(31, 11, 150)]


def test_stream_asof_knob_validation(spark):
    import pytest as _pytest

    from rados_timestore_spark.streaming.windows import stream_asof_join

    df = spark.createDataFrame([], "user_id long, t long, event_id long")
    with _pytest.raises(ValueError, match="emit"):
        stream_asof_join(df, df, emit="bogus")
    with _pytest.raises(ValueError, match="finalize"):
        stream_asof_join(df, df, emit="watermark", finalize="bogus")
    with _pytest.raises(ValueError, match="delay_us"):
        stream_asof_join(df, df, emit="watermark")
    with _pytest.raises(ValueError, match="flush"):
        stream_asof_join(df, df, emit="eager", flush=df)


def test_stream_asof_update_mode_emits_corrections(spark, tmp_path):
    # emit='update': the late-better-view scenario again, but now the
    # operator emits BOTH the eager first match and a correction when
    # the better view lands — an upsert sink keyed on purchase_id
    # converges to the batch-oracle answer without delaying the first
    # emission.
    from rados_timestore_spark.streaming.windows import stream_asof_join

    schema = "user_id long, t long, event_id long, event_type string"
    batches = [
        [(1, 100, 10, "view"), (1, 200, 31, "purchase")],
        [(1, 150, 11, "view")],   # better view, one batch late
        [(1, 120, 12, "view")],   # worse view later still: NO emission
    ]
    src = _write_batches(spark, tmp_path, batches, schema)
    stream = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", 1).parquet(src)
    )
    q = (
        stream_asof_join(
            stream.filter(F.col("event_type") == "purchase"),
            stream.filter(F.col("event_type") == "view"),
            horizon_us=1000, emit="update", delay_us=10_000,
        )
        .writeStream.format("memory").queryName("asof_upd")
        .outputMode("update")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True).start()
    )
    q.awaitTermination(180)
    rows = spark.sql(
        "SELECT purchase_id, view_id, view_t FROM asof_upd").collect()
    got = [(r.purchase_id, r.view_id, r.view_t) for r in rows]
    # exactly two emissions: eager first match, then the correction
    assert sorted(got) == [(31, 10, 100), (31, 11, 150)]


def test_stream_asof_checkpoint_recovery(spark, tmp_path):
    # The stateful as-of operator must survive a query RESTART: run
    # availableNow over the first files to termination, then deliver
    # more files and start a SECOND query on the SAME checkpoint.
    # The restored state must still hold the pending unmatched
    # purchase and the view buffer, so a view delivered only after
    # the restart completes the match — equal to a single run.
    import glob
    import os
    import shutil
    import time as _t

    from rados_timestore_spark.streaming.windows import stream_asof_join

    schema = "user_id long, t long, event_id long, event_type string"
    src = str(tmp_path / "src")
    os.makedirs(src)

    def deliver(i, rows):
        _deliver_file(tmp_path, src, i,
                      spark.createDataFrame(rows, schema))

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            stream_asof_join(
                stream.filter(F.col("event_type") == "purchase"),
                stream.filter(F.col("event_type") == "view"),
                horizon_us=1000,
            )
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    # Phase 1: a view, a matched purchase, and an UNMATCHED purchase
    # whose view hasn't been delivered yet.
    deliver(0, [(1, 100, 10, "view")])
    deliver(1, [(1, 200, 31, "purchase"), (2, 500, 32, "purchase")])
    run_once()
    got1 = sorted((r.purchase_id, r.view_id)
                  for r in spark.read.parquet(out).collect())
    assert got1 == [(31, 10)]  # 32 is pending in checkpointed state

    # Phase 2: restart on the same checkpoint; the late view must
    # match the RESTORED pending purchase.
    deliver(2, [(2, 450, 20, "view")])
    run_once()
    got2 = sorted((r.purchase_id, r.view_id)
                  for r in spark.read.parquet(out).collect())
    assert got2 == [(31, 10), (32, 20)]


def _deliver_files(spark, tmp_path, src, schema, batches):
    """Write each rows-list as one parquet file into ``src`` with
    increasing mtimes, so maxFilesPerTrigger=1 replays them as ordered
    micro-batches (same rig as the as-of recovery test)."""
    import glob
    import os
    import shutil
    import time as _t

    os.makedirs(src, exist_ok=True)
    base = len(glob.glob(f"{src}/b*.parquet"))
    for i, rows in enumerate(batches, start=base):
        _deliver_file(tmp_path, src, i,
                      spark.createDataFrame(rows, schema))


def test_stream_latest_per_key_checkpoint_recovery(spark, tmp_path):
    # VERDICT r5 #5: kill-and-resume for stream_latest_per_key.  The
    # per-key (time DESC, seq ASC) winner lives in GroupState; a
    # restarted query that lost it would crown a STALE row the winner.
    from rados_timestore_spark.streaming.windows import stream_latest_per_key

    schema = "address long, time long, value long, seq long"
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once():
        # memory sinks can't recover from a checkpoint — foreachBatch
        # is the recovery-capable sink for update-mode stateful output.
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )

        def sink(df, bid):
            df.withColumn("batch_id", F.lit(bid)) \
                .write.mode("append").parquet(out)

        q = (
            stream_latest_per_key(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("update")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    def winners():
        # latest emission per key (highest batch_id) = current view
        rows = spark.read.parquet(out).collect()
        best = {}
        for r in rows:
            if r.address not in best or r.batch_id > best[r.address][0]:
                best[r.address] = (r.batch_id, r.time, r.value, r.seq)
        return {k: v[1:] for k, v in best.items()}

    _deliver_files(spark, tmp_path, src, schema,
                   [[(2, 30, 300, 1), (4, 5, 50, 2)]])
    run_once()
    assert winners() == {2: (30, 300, 1), 4: (5, 50, 2)}

    # Phase 2: only OLDER rows for key 2 arrive after the restart.
    # With restored state the winner stays (30, 300, 1); with lost
    # state the restart would emit the stale (25, 888, 6).
    _deliver_files(spark, tmp_path, src, schema,
                   [[(2, 20, 999, 5), (2, 25, 888, 6), (4, 9, 90, 7)]])
    run_once()
    assert winners() == {2: (30, 300, 1), 4: (9, 90, 7)}


def test_stream_sessionize_checkpoint_recovery(spark, tmp_path):
    # Session state (open windows + watermark) must survive a restart:
    # events delivered after the resume MERGE into the restored open
    # session instead of opening a fresh one.
    from rados_timestore_spark.streaming.windows import stream_sessionize

    S = 1_000_000  # 1 s in µs
    schema = "address long, time long"
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    out = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            stream_sessionize(stream, gap="30 minutes",
                              watermark="30 minutes")
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    # Phase 1: key 2's session [0, 60 s]; key 9 opens a session at
    # 4000 s (watermark pusher); a second pusher batch makes the
    # wm advance visible so key 2's session closes and emits.
    _deliver_files(spark, tmp_path, src, schema, [
        [(2, 0), (2, 60 * S)],
        [(9, 4000 * S), (9, 4200 * S)],
        [(9, 4300 * S)],
    ])
    run_once()
    got1 = sorted((r.address, r.n, r.first_t, r.last_t)
                  for r in spark.read.parquet(out).collect())
    assert got1 == [(2, 2, 0, 60 * S)]  # key 9's session still open

    # Phase 2 (after restart): 5000 s is within gap of the restored
    # open session's end (4300 s + 30 min), so it must MERGE (n=4);
    # two pusher batches on key 2 close it.  Lost state would emit a
    # fresh n=1 session instead.
    _deliver_files(spark, tmp_path, src, schema, [
        [(9, 5000 * S)],
        [(2, 20000 * S)],
        [(2, 25000 * S)],
    ])
    run_once()
    got2 = sorted((r.address, r.n, r.first_t, r.last_t)
                  for r in spark.read.parquet(out).collect())
    key9 = [g for g in got2 if g[0] == 9]
    assert key9 == [(9, 4, 4000 * S, 5000 * S)]


def test_streaming_hll_checkpoint_recovery(spark, tmp_path):
    # The 256-register HLL state is a complete-mode streaming agg; a
    # restart must resume from the checkpointed registers so the final
    # sketch equals the batch sketch over BOTH phases' documents.
    from rados_timestore_spark.queries_sketch import trigram_hll_registers

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    schema = docs.schema
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    import glob
    import os
    import shutil
    import time as _t

    os.makedirs(src)

    def deliver(i, df):
        _deliver_file(tmp_path, src, i, df)

    out = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )

        def sink(df, bid):
            # complete mode: every batch carries the FULL register set
            df.write.mode("overwrite").parquet(out)

        q = (
            trigram_hll_registers(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(300)

    deliver(0, docs.filter(F.col("doc_id") % 2 == 0))
    run_once()
    deliver(1, docs.filter(F.col("doc_id") % 2 == 1))
    run_once()

    streamed = {(r.bucket, r.rho)
                for r in spark.read.parquet(out).collect()}
    batch = {(r.bucket, r.rho)
             for r in trigram_hll_registers(docs).collect()}
    assert streamed == batch


def test_streaming_cms_checkpoint_recovery(spark, tmp_path):
    # The d x w CMS cell state is a complete-mode streaming agg; a
    # restart must resume from the checkpointed counts so the final
    # cells equal the batch cells over BOTH phases' documents (counts
    # are additive — a lost batch would undercount, a replayed one
    # would overcount; equality pins exactly-once recovery).
    from rados_timestore_spark.queries_sketch import trigram_cms_cells

    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet") \
        .select("doc_id", "text")
    schema = docs.schema
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    import glob
    import os
    import shutil
    import time as _t

    os.makedirs(src)

    def deliver(i, df):
        _deliver_file(tmp_path, src, i, df)

    out = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )

        def sink(df, bid):
            df.write.mode("overwrite").parquet(out)

        q = (
            trigram_cms_cells(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(300)

    deliver(0, docs.filter(F.col("doc_id") % 2 == 0))
    run_once()
    deliver(1, docs.filter(F.col("doc_id") % 2 == 1))
    run_once()

    streamed = {(r.j, r.p): r.c
                for r in spark.read.parquet(out).collect()}
    batch = {(r.j, r.p): r.c
             for r in trigram_cms_cells(docs).collect()}
    assert streamed == batch


def test_stream_sliding_counts_checkpoint_recovery(spark, tmp_path):
    # VERDICT r7 #8: kill-and-resume for the sliding-window aggregate.
    # Two chronological phases run as SEPARATE queries over one
    # checkpoint (the restart boundary); windows straddling the
    # boundary only come out right if the second run restores the
    # first run's partial window state, and append mode must not
    # re-emit windows the first run already closed.  Final sink ==
    # batch sliding aggregation restricted to watermark-closed
    # windows, as exact multisets.
    import glob
    import os
    import shutil
    import time as _t

    from rados_timestore_spark.streaming.windows import (
        stream_rollup_sliding,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        event_us(ev).alias("time"),
        F.col("event_id").alias("value"),
    )
    mid = pts.approxQuantile("time", [0.5], 0.0)[0]
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    os.makedirs(src)
    now = _t.time()

    def deliver(i, df):
        _deliver_file(tmp_path, src, i, df)

    def run_once():
        stream = (
            spark.readStream.schema(pts.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            stream_rollup_sliding(
                stream, window="1 hour", slide="15 minutes",
                watermark="30 minutes",
            )
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    deliver(0, pts.filter(F.col("time") <= mid))
    run_once()
    deliver(1, pts.filter(F.col("time") > mid))
    run_once()

    got = {
        (r.ws, r.address): (r.n, r.sum_value)
        for r in spark.read.parquet(out).select(
            F.unix_micros(F.col("window.start")).alias("ws"),
            "address", "n", "sum_value",
        ).collect()
    }
    assert got
    want_all = (
        pts.withColumn("event_ts", F.timestamp_micros(F.col("time")))
        .groupBy(F.window("event_ts", "1 hour", "15 minutes"),
                 F.col("address"))
        .agg(F.count("*").alias("n"), F.sum("value").alias("sum_value"))
        .select(F.unix_micros(F.col("window.start")).alias("ws"),
                "address", "n", "sum_value")
    )
    max_us = pts.agg(F.max("time")).collect()[0][0]
    wm_us = max_us - 30 * 60 * 1_000_000
    hour_us = 3600 * 1_000_000
    want = {
        (r.ws, r.address): (r.n, r.sum_value)
        for r in want_all.collect()
        if r.ws + hour_us <= wm_us
    }
    assert got == want


def test_stream_workdir_under_shared_root(spark, tmp_path):
    # VERDICT r6 #6: the streaming queries must be drivable with
    # staging/checkpoint under a configured shared path (warehouse
    # dir / s3a on a cluster) instead of the driver's /tmp.
    from rados_timestore_spark import registry
    from rados_timestore_spark.queries_streaming import stream_workdir

    shared = str(tmp_path / "warehouse" / "streaming")
    spark.conf.set("spark.rados_timestore.stream_dir", shared)
    try:
        w = stream_workdir(spark, "probe_")
        assert w.startswith(shared)
        import os

        assert os.path.isdir(w)  # created through the Hadoop FS layer
        # One real streaming job end-to-end with staging under the
        # shared root: replay-dedup at sf0.001.
        out = registry.queries()["streaming_dedup_replay"](
            spark, "/root/testdata/sf0.001")
        n = out.count()
        assert n > 0
        assert out.select("address", "time").distinct().count() == n
        staged = os.listdir(shared)
        assert any(name.startswith("ts_stream_dd_") for name in staged)
    finally:
        spark.conf.unset("spark.rados_timestore.stream_dir")


def test_streaming_hdr_checkpoint_recovery(spark, tmp_path):
    # The per-(series, bucket) histogram is a complete-mode streaming
    # agg; a restart must resume from the checkpointed counts so the
    # final histogram equals the batch histogram over BOTH phases'
    # events (counts are additive — a lost batch undercounts, a
    # replayed one overcounts; equality pins exactly-once recovery).
    from rados_timestore_spark.queries_sketch import hdr_histogram

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet") \
        .select("event_id", "event_type", "value")
    schema = ev.schema
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    import glob
    import os
    import shutil
    import time as _t

    os.makedirs(src)

    def deliver(i, df):
        _deliver_file(tmp_path, src, i, df)

    out = str(tmp_path / "out")

    def run_once():
        stream = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )

        def sink(df, bid):
            df.write.mode("overwrite").parquet(out)

        q = (
            hdr_histogram(stream)
            .writeStream.foreachBatch(sink)
            .outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        assert q.awaitTermination(300)

    deliver(0, ev.filter(F.col("event_id") % 2 == 0))
    run_once()
    deliver(1, ev.filter(F.col("event_id") % 2 == 1))
    run_once()

    streamed = {(r.event_type, r.lb): r.c
                for r in spark.read.parquet(out).collect()}
    batch = {(r.event_type, r.lb): r.c
             for r in hdr_histogram(ev).collect()}
    assert streamed == batch


def test_stream_interval_coalesce_checkpoint_recovery(spark, tmp_path):
    # Kill-and-resume for the dynamic-gap session window: islands
    # straddling the restart boundary only come out right if the
    # second run restores the first run's open-session state (and
    # merges late-arriving overlaps into it).  Final sink == batch
    # islands (strict-overlap rule, matching half-open session
    # semantics) restricted to watermark-closed islands.
    import os

    from pyspark.sql import Window
    from rados_timestore_spark.streaming.windows import (
        stream_interval_coalesce,
    )

    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.select(
        "user_id",
        event_us(ev).alias("time"),
        (F.col("event_id") % 300 + 60).alias("dur_s"),
    )
    mid = pts.approxQuantile("time", [0.5], 0.0)[0]
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    os.makedirs(src)

    def deliver(i, df):
        _deliver_file(tmp_path, src, i, df)

    def run_once():
        stream = (
            spark.readStream.schema(pts.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            stream_interval_coalesce(stream, watermark="30 minutes")
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    deliver(0, pts.filter(F.col("time") <= mid))
    run_once()
    deliver(1, pts.filter(F.col("time") > mid))
    run_once()

    got = {
        (r.user_id, r.start_us, r.end_us, r.n_intervals)
        for r in spark.read.parquet(out).select(
            "user_id", "start_us",
            F.unix_micros(F.col("session_window.end")).alias("end_us"),
            "n_intervals",
        ).collect()
    }
    assert got
    # batch truth: strict-overlap cumulative-max islands + watermark
    iv = pts.select(
        "user_id", F.col("time").alias("t"),
        (F.col("time") + F.col("dur_s") * 1_000_000).alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id").orderBy("t", "e")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "is_start",
        F.when(F.max("e").over(w_prev) > F.col("t"), 0).otherwise(1),
    )
    run = (
        Window.partitionBy("user_id").orderBy("t", "e")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = marked.withColumn("island_no", F.sum("is_start").over(run))
    agg = isl.groupBy("user_id", "island_no").agg(
        F.min("t").alias("start_us"), F.max("e").alias("end_us"),
        F.count("*").alias("n_intervals"),
    )
    max_us = pts.agg(F.max("time")).collect()[0][0]
    wm_us = max_us - 30 * 60 * 1_000_000
    want = {
        (r.user_id, r.start_us, r.end_us, r.n_intervals)
        for r in agg.collect() if r.end_us <= wm_us
    }
    assert got == want


def test_stream_ewma_checkpoint_recovery(spark, tmp_path):
    # Kill-and-resume for the order-dependent smoother: rows that
    # finalized in run 1 leave their depth-1 TAIL values in the
    # checkpoint; run 2's first finalizations are correct only if
    # that tail (and the pending buffer) survive the restart.  Final
    # sink == the batch ts_ewma_smooth row for row.
    from rados_timestore_spark.queries_timeseries import ts_ewma_smooth
    from rados_timestore_spark.streaming.windows import stream_ewma

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    pts = ev.select(
        "user_id",
        event_us(ev).alias("t"),
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )
    lo, hi = pts.agg(F.min("t"), F.max("t")).collect()[0]
    span = int(hi) - int(lo)
    delay_us = span // 4 + 1  # small enough that run 1 finalizes rows
    mid = int(lo) + span // 2
    sent_t = int(hi) + delay_us + 1
    sentinels = pts.select("user_id").distinct().select(
        "user_id", F.lit(sent_t).alias("t"),
        F.lit(-1).alias("event_id"), F.lit(0).cast("long").alias("v"),
    )
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    os.makedirs(src)

    def run_once():
        stream = (
            spark.readStream.schema(pts.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            stream_ewma(stream.filter(F.col("event_id") >= 0),
                        delay_us=delay_us,
                        flush=stream.filter(F.col("event_id") < 0))
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    _deliver_file(tmp_path, src, 0, pts.filter(F.col("t") <= mid))
    run_once()
    n_first = spark.read.parquet(out).count()
    assert n_first > 0  # run 1 really finalized a prefix
    _deliver_file(tmp_path, src, 1, pts.filter(F.col("t") > mid))
    _deliver_file(tmp_path, src, 2, sentinels)
    run_once()

    got = {
        (r.event_id, r.user_id, r.t, r.v, r.ewma_x65536)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.event_id, r.user_id, r.t, r.v, r.ewma_x65536)
        for r in ts_ewma_smooth(spark, sf).collect()
    }
    assert got == want


def test_stream_rolling_median_checkpoint_recovery(spark, tmp_path):
    # the second fold on the shared tail-window kernel: frames
    # straddling the restart (rows finalized in run 2 whose 7-frame
    # reaches back into run-1 values) only come out right if the
    # 6-value tail survived the checkpoint
    from rados_timestore_spark.queries_timeseries import (
        ts_rolling_median,
    )
    from rados_timestore_spark.streaming.windows import (
        stream_rolling_median,
    )

    sf = "/root/testdata/sf0.001"
    ev = spark.read.parquet(f"{sf}/events.parquet")
    pts = ev.select(
        "user_id",
        event_us(ev).alias("t"),
        "event_id",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )
    lo, hi = pts.agg(F.min("t"), F.max("t")).collect()[0]
    span = int(hi) - int(lo)
    delay_us = span // 4 + 1
    mid = int(lo) + span // 2
    sent_t = int(hi) + delay_us + 1
    sentinels = pts.select("user_id").distinct().select(
        "user_id", F.lit(sent_t).alias("t"),
        F.lit(-1).alias("event_id"), F.lit(0).cast("long").alias("v"),
    )
    src, out, ck = (str(tmp_path / d) for d in ("src", "out", "ck"))
    os.makedirs(src)

    def run_once():
        stream = (
            spark.readStream.schema(pts.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        q = (
            stream_rolling_median(
                stream.filter(F.col("event_id") >= 0),
                delay_us=delay_us,
                flush=stream.filter(F.col("event_id") < 0))
            .writeStream.format("parquet").option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    _deliver_file(tmp_path, src, 0, pts.filter(F.col("t") <= mid))
    run_once()
    assert spark.read.parquet(out).count() > 0
    _deliver_file(tmp_path, src, 1, pts.filter(F.col("t") > mid))
    _deliver_file(tmp_path, src, 2, sentinels)
    run_once()

    got = {
        (r.event_id, r.user_id, r.t, r.n_win, r.median2x)
        for r in spark.read.parquet(out).collect()
    }
    want = {
        (r.event_id, r.user_id, r.t, r.n_win, r.median2x)
        for r in ts_rolling_median(spark, sf).collect()
    }
    assert got == want


def test_stream_interval_coalesce_clamps_nonpositive_gap(spark):
    # ADVICE r9: Spark's dynamic-gap session_window silently FILTERS
    # rows with a non-positive gap, so zero-length intervals would
    # vanish from the streaming result while the batch twin counts
    # them.  The helper clamps the gap to >= 1 s; session_window also
    # runs in batch mode, which is enough to prove the rows survive.
    from rados_timestore_spark.streaming.windows import (
        stream_interval_coalesce,
    )

    pts = spark.createDataFrame(
        [(1, 1_000_000, 0), (1, 100_000_000, 0), (2, 1_000_000, 5)],
        "user_id long, time long, dur_s long",
    )
    got = (
        stream_interval_coalesce(pts, watermark="30 minutes")
        .select("user_id", "n_intervals").collect()
    )
    per_user = {}
    for r in got:
        per_user[r.user_id] = per_user.get(r.user_id, 0) + r.n_intervals
    # both zero-duration intervals of user 1 survive as islands
    assert per_user == {1: 2, 2: 1}


def test_stream_period_over_period_checkpoint_recovery(spark, tmp_path):
    # Kill-and-resume for the additive (event_type, day) grid behind
    # streaming_period_over_period: run 2 starts from the SAME
    # checkpoint, so the file source skips run-1's files — the final
    # complete-mode grid equals the batch truth over ALL rows only if
    # run-1's aggregation state was restored from the checkpoint.
    sf = "/root/testdata/sf0.001"
    ev0 = spark.read.parquet(f"{sf}/events.parquet")
    ev = ev0.select(
        "event_id", "event_type",
        event_us(ev0).alias("t"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )
    src, ck = (str(tmp_path / d) for d in ("src", "ck"))
    os.makedirs(src)

    def run_once(name):
        stream = (
            spark.readStream.schema(ev.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )
        grid = stream.groupBy(
            "event_type", F.expr("t div 86400000000").alias("day")
        ).agg(
            F.count("*").alias("n"),
            F.sum("v").cast("long").alias("sum_centi"),
        )
        q = (
            grid.writeStream.format("memory").queryName(name)
            .option("checkpointLocation", ck)
            .outputMode("complete").trigger(availableNow=True).start()
        )
        assert q.awaitTermination(180)

    _deliver_file(tmp_path, src, 0, ev.filter(F.col("event_id") % 2 == 0))
    run_once("pop_ckpt_run1")
    n_first = spark.table("pop_ckpt_run1").agg(F.sum("n")).collect()[0][0]
    assert n_first and n_first > 0
    spark.catalog.dropTempView("pop_ckpt_run1")

    _deliver_file(tmp_path, src, 1, ev.filter(F.col("event_id") % 2 == 1))
    run_once("pop_ckpt_run2")
    got = {
        (r.event_type, r.day, r.n, r.sum_centi)
        for r in spark.table("pop_ckpt_run2").collect()
    }
    spark.catalog.dropTempView("pop_ckpt_run2")

    want = {
        (r.event_type, r.day, r.n, r.sum_centi)
        for r in ev.groupBy(
            "event_type", F.expr("t div 86400000000").alias("day")
        ).agg(
            F.count("*").alias("n"),
            F.sum("v").cast("long").alias("sum_centi"),
        ).collect()
    }
    assert got == want
    # run 2 genuinely resumed (its grid covers run-1-only rows)
    assert sum(n for _t, _d, n, _s in got) > n_first


def test_stream_kv_merges_kill_and_resume_exactly_once(spark, tmp_path):
    # r11: continuous MERGE ingest via the merge_into batch fence —
    # two availableNow runs over one checkpoint (the restart
    # boundary) plus a third no-new-data run and a manual stale
    # redelivery; every key's value must equal single application of
    # every batch.
    import os
    import time as _t

    from rados_timestore_spark.mutable import MutableKV
    from rados_timestore_spark.streaming.ingest import stream_kv_merges

    mrg = (lambda new, old: bytes([(new[0] + old[0]) % 256]))
    store = TimeStore(spark, str(tmp_path / "wh"))
    store.register_namespace("K", buckets=4)
    kv = MutableKV(store, "K")
    keys = list(range(0, 12, 2))
    kv.insert_bulk(spark.createDataFrame(
        [(k, bytearray([1]), k) for k in keys],
        "key long, value binary, seq long"))

    schema = "key long, value binary, seq long"
    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)

    def deliver(i):
        (spark.createDataFrame(
            [(k, bytearray([10 + i]), k) for k in keys], schema)
         .coalesce(1).write.parquet(f"{src}/b{i}"))
        _t.sleep(0.05)
        os.utime(src)

    def run_once():
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/b*"))
        q = stream_kv_merges(kv, mrg, stream, ck,
                             trigger={"availableNow": True})
        assert q.awaitTermination(180)

    deliver(0)
    run_once()            # batch 0 commits; query stops (the "kill")
    deliver(1)
    deliver(2)
    run_once()            # resume: replays nothing, applies 1 and 2
    run_once()            # no new data: fenced no-ops all the way
    want = bytes([1 + 10 + 11 + 12])
    assert {k: kv.lookup(k) for k in keys} == {k: want for k in keys}
    # the helper fenced under the checkpoint's lineage id (r12) —
    # ONE app key, high-water mark = batch 2
    fences = store._read_meta(kv.ns).merge_fences
    assert list(fences.values()) == [2]
    (lineage,) = fences
    # a stale out-of-band redelivery of an already-committed batch id
    # UNDER THE SAME LINEAGE is a fenced no-op
    kv.merge_into(spark.createDataFrame(
        [(k, bytearray([11]), k) for k in keys], schema),
        mrg, batch_id=1, app_id=lineage)
    assert kv.lookup(0) == want
    assert store.verify(kv.ns)["ok"]


def test_stream_kv_merges_new_checkpoint_lineage_not_skipped(
        spark, tmp_path):
    # r12 (ADVICE r11): restarting the MERGE stream with a FRESH
    # checkpoint directory restarts micro-batch ids at 0; the
    # lineage-keyed fence must APPLY them — the old unscoped fence
    # skipped everything at or below the previous high-water mark
    # (silent data loss).
    import os
    import time as _t

    from rados_timestore_spark.mutable import MutableKV
    from rados_timestore_spark.streaming.ingest import stream_kv_merges

    mrg = (lambda new, old: old + b"|" + new)
    store = TimeStore(spark, str(tmp_path / "wh"))
    store.register_namespace("K", buckets=4)
    kv = MutableKV(store, "K")
    kv.insert(2, b"s")
    schema = "key long, value binary, seq long"

    def run(tag, payloads):
        src, ck = str(tmp_path / f"src{tag}"), str(tmp_path / f"ck{tag}")
        os.makedirs(src, exist_ok=True)
        for i, p in enumerate(payloads):
            (spark.createDataFrame([(2, bytearray(p), 0)], schema)
             .coalesce(1).write.parquet(f"{src}/b{i}"))
            _t.sleep(0.05)
        stream = (spark.readStream.schema(schema)
                  .option("maxFilesPerTrigger", 1).parquet(f"{src}/b*"))
        q = stream_kv_merges(kv, mrg, stream, ck,
                             trigger={"availableNow": True})
        assert q.awaitTermination(180)

    run("A", [b"a0", b"a1"])          # lineage A: batches 0, 1
    assert kv.lookup(2) == b"s|a0|a1"
    run("B", [b"b0"])                 # lineage B: batch 0 AGAIN
    assert kv.lookup(2) == b"s|a0|a1|b0"   # applied, not skipped
    assert len(store._read_meta(kv.ns).merge_fences) == 2
    assert store.verify(kv.ns)["ok"]


def test_checkpoint_app_id_reads_query_id_and_falls_back(spark, tmp_path):
    # the lineage key is the checkpoint's persisted query id; an
    # unreadable/missing metadata file degrades to the path itself
    # (still separates distinct checkpoint locations)
    import os

    from rados_timestore_spark.streaming.ingest import checkpoint_app_id

    ck = str(tmp_path / "ck")
    os.makedirs(ck)
    with open(f"{ck}/metadata", "w") as fh:
        fh.write('{"id":"abc-123"}')
    assert checkpoint_app_id(spark, ck) == "q-abc-123"
    missing = str(tmp_path / "nope")
    assert checkpoint_app_id(spark, missing) == f"ckpt-{missing}"
    # corrupt metadata: LOUD refusal (ADVICE r12 #5 + r13 review) —
    # the r12 path-derived fallback silently shared one fence across
    # a delete-and-recreate at the same path, and any replacement key
    # orphans fences stored under the old one; no silent key is safe
    import pytest as _pytest

    with open(f"{ck}/metadata", "w") as fh:
        fh.write("not json {")
    with _pytest.raises(ValueError, match="no.*parseable query id"):
        checkpoint_app_id(spark, ck)
    # parseable-but-id-less metadata is the same corrupt class
    with open(f"{ck}/metadata", "w") as fh:
        fh.write('{"version": 1}')
    with _pytest.raises(ValueError, match="no.*parseable query id"):
        checkpoint_app_id(spark, ck)
