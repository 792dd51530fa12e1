"""Structured Streaming ingest for the persisted vector index — the
continuous twin of ``VectorIndex.append``, mirroring how
``streaming/ingest.py`` wraps the store's batch ingest in a
``foreachBatch`` daemon (the reference's continuous writeEncoded
daemon model, lib/TimeStore.hs:98-137).

Exactly-once: each micro-batch routes new vectors against the
PERSISTED centroid table (no retrain — routing stability is what
makes streaming ANN ingest sound) and applies them through
``VectorIndex.append_batch``, whose monotone batch-id fence plus
deterministic per-batch file prefixes make crash-replays converge to
single-copy state.  A restart therefore never double-counts a vector
and never loses a committed batch — the checkpoint replays at-least-
once, the fence turns it into exactly-once (kill-and-resume tested in
tests/test_vector_ingest.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

from rados_timestore_spark.vector_index import VectorIndex


def stream_vectors(vi: VectorIndex, ns: str, stream: DataFrame,
                   checkpoint: str, id_col: str = "vec_id",
                   vec_col: str = "embedding",
                   trigger_available_now: bool = True,
                   app_id: str | None = "auto"):
    """Start a streaming query appending ``stream``'s vectors to the
    index; the index must be built first (routing is fixed at build
    time).  Returns the StreamingQuery.

    ``app_id`` (r12, ADVICE r11): ``"auto"`` keys the batch fence on
    the checkpoint lineage (:func:`streaming.ingest.checkpoint_app_id`)
    so a stream restarted with a new checkpoint — batch ids back at
    0 — is not silently skipped; ``None`` keeps the legacy unscoped
    ``last_batch_id`` fence."""
    vi.meta(ns)  # fail fast if never built
    from rados_timestore_spark.streaming.ingest import checkpoint_app_id

    resolved: list[str | None] = []

    def sink(df: DataFrame, batch_id: int) -> None:
        if not resolved:
            resolved.append(
                checkpoint_app_id(df.sparkSession, checkpoint)
                if app_id == "auto" else app_id)
        vi.append_batch(ns, df, batch_id, id_col=id_col,
                        vec_col=vec_col, app_id=resolved[0])

    w = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()


def stream_hnsw_vectors(hi, ns: str, stream: DataFrame,
                        checkpoint: str, id_col: str = "vec_id",
                        vec_col: str = "embedding",
                        trigger_available_now: bool = True,
                        app_id: str | None = "auto"):
    """The graph-index twin of :func:`stream_vectors`: continuous
    exactly-once ingest into a persisted :class:`hnsw.HNSWIndex` via
    ``HNSWIndex.append_batch`` (monotone batch-id fence + per-batch
    vector-file prefixes + already-present graph reinsert filter, so
    checkpoint replays converge to single-copy state).  The index must
    be built first (shard routing is fixed at build time).

    ``app_id``: same lineage-scoped fencing as :func:`stream_vectors`
    (r12, ADVICE r11)."""
    hi.meta(ns)  # fail fast if never built
    from rados_timestore_spark.streaming.ingest import checkpoint_app_id

    resolved: list[str | None] = []

    def sink(df: DataFrame, batch_id: int) -> None:
        if not resolved:
            resolved.append(
                checkpoint_app_id(df.sparkSession, checkpoint)
                if app_id == "auto" else app_id)
        hi.append_batch(ns, df, batch_id, id_col=id_col,
                        vec_col=vec_col, app_id=resolved[0])

    w = (
        stream.writeStream.foreachBatch(sink)
        .option("checkpointLocation", checkpoint)
    )
    if trigger_available_now:
        w = w.trigger(availableNow=True)
    return w.start()
