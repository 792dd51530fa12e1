"""Structured Streaming ingest: micro-batched writes must read back
identically to one batch write (SURVEY.md §7.2 step 5; reference
continuous ingest lib/TimeStore.hs:98-137)."""

import os
import tempfile
import time

import pytest
from pyspark.sql import functions as F

from rados_timestore_spark.store import TimeStore
from rados_timestore_spark.streaming.ingest import stream_points


def test_streaming_ingest_matches_batch(spark, tmp_path):
    # Source: the sf0.001 events as a rate-limited file stream —
    # split into several parquet files so multiple micro-batches fire.
    ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        F.col("ts").alias("time"),
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
