"""Structured Streaming ingest — the reference's continuous
``writeEncoded`` daemon (lib/TimeStore.hs:98-137) as a streaming query.

The reference runs many writer daemons coordinated by advisory locks
(Core.hs:128-164); Spark's model replaces that with ONE streaming
query per namespace whose micro-batches call the same batch ingest
path (``TimeStore.write_points``) via ``foreachBatch``:

* routing/partitioning (groupMixed, Algorithms.hs:111-178) — same code
  as batch;
* watermark maintenance (updateLatest, StoreHelpers.hs:227-265) — the
  observe()-based monotone merge inside write_points;
* rollover (maybeRollover, StoreHelpers.hs:194-221) — checked after
  every micro-batch, exactly like the reference checks after every
  write;
* late data needs NO special handling: any time value may arrive in
  any batch (the reference accepts arbitrary times too) because reads
  dedup/sort on the fly — dedup-on-read IS the late-data story
  (SURVEY.md §3.1).

Exactly-once: parquet appends are atomic per task commit and the
first-wins dedup on (address, time) makes replayed micro-batches
idempotent for reads — a replayed duplicate loses to the original's
lower seq.  Checkpointing the streaming query bounds replays.

Scale notes: one streaming query scales by executor count (each batch
is a normal distributed write); per-batch driver work is O(#epochs) —
metadata only.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQuery

from rados_timestore_spark.store import TimeStore


def checkpoint_app_id(spark: SparkSession, checkpoint_dir: str) -> str:
    """Stable identifier of a checkpoint LINEAGE, for keying
    exactly-once batch fences (ADVICE r11): Spark persists the
    streaming query id in ``<checkpoint>/metadata`` at first start —
    stable across every restart from the same checkpoint, fresh
    whenever the checkpoint directory is new OR deleted-and-recreated.
    Keying a fence on ``(this id, batch_id)`` is Delta's
    ``(txnAppId, txnVersion)`` idempotent-write pattern: a new
    lineage restarts micro-batch ids at 0, and an unscoped fence
    would silently skip all of them as completed replays.

    Falls back to a path-derived key ONLY when the metadata file does
    not exist (called before the query's first start — informational
    use; inside a running micro-batch the file always exists).
    Corrupt-but-readable metadata RAISES (ADVICE r12 #5): no silent
    key derivation is safe there — the r12 path-derived fallback
    mapped a deleted-and-recreated checkpoint at the SAME path to one
    shared fence (silent skip), and any replacement key (e.g. mixing
    the file's mtime) orphans fences an existing deployment already
    stored under the old key (silent double-apply on upgrade — r13
    review finding).  Failing loudly forces the operator to recreate
    the checkpoint (whose fresh metadata parses) or pass an explicit
    ``app_id``.  A TRANSIENT read failure (FS hiccup, throttling)
    raises too, for the r12 reason: the batch retries under the same
    id.
    """
    from rados_timestore_spark.fsutil import HadoopFS

    fs = HadoopFS(spark, checkpoint_dir)
    meta_path = f"{checkpoint_dir}/metadata"
    if not fs.exists(meta_path):
        return f"ckpt-{checkpoint_dir.rstrip('/')}"
    text = fs.read_text(meta_path)
    try:
        for line in text.splitlines():
            line = line.strip()
            if line.startswith("{"):
                qid = json.loads(line).get("id")
                if qid:
                    return f"q-{qid}"
    except ValueError:
        pass  # unparseable: fall through to the loud refusal
    raise ValueError(
        f"checkpoint {checkpoint_dir!r}: metadata exists but holds no "
        f"parseable query id — cannot derive a fence lineage key.  "
        f"Recreate the checkpoint (Spark rewrites metadata at first "
        f"start) or pass an explicit app_id."
    )


def stream_points(
    store: TimeStore,
    ns: str,
    source: DataFrame,
    checkpoint_dir: str,
    trigger: dict | None = None,
    query_name: str | None = None,
) -> StreamingQuery:
    """Attach a streaming source to a namespace.

    ``source`` must be a *streaming* DataFrame with the point columns
    (address, time, plus value and/or payload; seq optional — batches
    without it get monotone per-batch blocks, preserving cross-batch
    first-write-wins order).

    Returns the started :class:`StreamingQuery`; callers own its
    lifecycle (``awaitTermination``/``stop``).
    """
    if not source.isStreaming:
        raise ValueError("source must be a streaming DataFrame")

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        # Empty micro-batches skip all metadata churn.
        if batch_df.isEmpty():
            return
        store.write_points(ns, batch_df)

    writer = (
        source.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()


def stream_kv_merges(
    kv,
    merge,
    source: DataFrame,
    checkpoint_dir: str,
    associative: bool = False,
    trigger: dict | None = None,
    query_name: str | None = None,
    app_id: str | None = "auto",
) -> StreamingQuery:
    """Continuous MERGE ingest into a :class:`MutableKV` — each
    micro-batch runs ``kv.merge_into(batch, merge,
    batch_id=micro_batch_id, app_id=<lineage id>)``.

    Exactly-once comes from the r11 batch fence: foreachBatch
    redelivers a failed micro-batch under the SAME id, and
    ``merge_into`` skips any batch at or below the committed fence —
    the fence advances inside the same CAS flip that commits the
    merged generation, so a crash at any point replays to
    single-application state (crash-fuzz swept,
    tools/store_crash_fuzz.py).  This is the pairing the unfenced
    ``merge_into`` docstring demands for at-least-once sources.

    ``app_id`` (r12, ADVICE r11): by default (``"auto"``) the fence
    is keyed on the checkpoint lineage via
    :func:`checkpoint_app_id`, so restarting the stream with a NEW
    checkpoint directory — whose micro-batch ids restart at 0 —
    starts a fresh fence instead of silently skipping every batch at
    or below the old high-water mark.  Pass an explicit string to
    name the lineage yourself, or ``None`` for the legacy unscoped
    fence (then the checkpoint must NEVER be reset against an
    existing namespace).

    ``source``: streaming (key long, value binary[, seq long]).
    """
    if not source.isStreaming:
        raise ValueError("source must be a streaming DataFrame")

    resolved: list[str | None] = []

    def write_batch(batch_df: DataFrame, batch_id: int) -> None:
        if batch_df.isEmpty():
            return
        if not resolved:
            resolved.append(
                checkpoint_app_id(batch_df.sparkSession, checkpoint_dir)
                if app_id == "auto" else app_id)
        kv.merge_into(batch_df, merge, associative=associative,
                      batch_id=batch_id, app_id=resolved[0])

    writer = (
        source.writeStream.foreachBatch(write_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("update")
    )
    if query_name:
        writer = writer.queryName(query_name)
    if trigger:
        writer = writer.trigger(**trigger)
    return writer.start()
