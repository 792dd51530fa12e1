"""Streaming windowed aggregation + custom stateful operators.

The reference's streaming surface is ordered chunk delivery +
watermarks (SURVEY.md §2.3); Spark adds real windowed semantics on
top.  These helpers wire them timestore-style:

* :func:`stream_rollup` — tumbling event-time windows with a
  late-data watermark: the streaming version of the hourly rollup
  (queries_timeseries.ts_rollup_hourly).  Late rows inside the
  watermark update their window; rows later than the watermark are
  dropped by Spark — the bounded-state trade the reference never has
  to make because it re-sorts on read (dedup-on-read handles ALL
  lateness in the batch path; use the watermark only when state must
  stay bounded).
* :func:`stream_latest_per_key` — custom stateful operator via
  ``applyInPandasWithState``: the Mutable-KV latest-per-key view
  maintained incrementally (per-key state = (time, seq, value)),
  emitting changed keys each micro-batch.  State is partitioned by
  key across executors — the 100 TB shape for continuously-maintained
  aggregates.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    LongType,
    StructField,
    StructType,
)


def stream_rollup(
    points: DataFrame,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    time_col: str = "time",
) -> DataFrame:
    """Tumbling event-time rollup over a streaming points DataFrame.

    ``time_col`` is the engine's µs-long event time; it's lifted to a
    TIMESTAMP for Spark's window machinery.  Returns the streaming
    aggregate (caller attaches the sink): per (window, address) count
    and value sum, state bounded by the watermark.
    """
    ts = F.timestamp_micros(F.col(time_col)).alias("event_ts")
    return (
        points.withColumn("event_ts", ts)
        .withWatermark("event_ts", watermark)
        .groupBy(F.window("event_ts", window), F.col("address"))
        .agg(
            F.count("*").alias("n"),
            F.sum("value").alias("sum_value"),
            F.max(time_col).alias("max_time"),
        )
    )


def stream_dedup(
    points: DataFrame,
    watermark: str = "30 minutes",
    keys: tuple[str, ...] = ("address", "time"),
    time_col: str = "time",
) -> DataFrame:
    """Bounded-state streaming dedup on the point identity (address,
    time) — the streaming face of the engine's dedup-on-read rule
    (core.first_wins_dedup) for the replay case: a re-delivered
    micro-batch's duplicates are dropped as long as they arrive within
    the watermark, so state stays bounded while exactly-once ingest
    survives source replays.  (Batch reads still dedup on read; this
    operator is for pipelines that must emit downstream exactly once.)

    Uses ``dropDuplicatesWithinWatermark`` so two duplicates only need
    to arrive within ``watermark`` of each other — state per key is
    evicted after that horizon, the 100 TB-friendly contract (a plain
    streaming ``dropDuplicates`` would keep every key forever).
    """
    ts = F.timestamp_micros(F.col(time_col)).alias("event_ts")
    return (
        points.withColumn("event_ts", ts)
        .withWatermark("event_ts", watermark)
        .dropDuplicatesWithinWatermark(list(keys))
    )


def stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lower_us: int,
    upper_us: int,
    watermark: str = "30 minutes",
    time_col: str = "time",
    suffixes: tuple[str, str] = ("_l", "_r"),
) -> DataFrame:
    """Stream-stream inner join on ``key`` equality + an event-time
    interval: right rows within ``[left.time + lower_us, left.time +
    upper_us]`` of each left row.  Both sides are watermarked so Spark
    can bound join state (rows outside the interval + watermark are
    evicted) — the streaming analog of the batch bucketed range join
    (queries_timeseries.ts_range_join), e.g. "events in the 5 minutes
    leading up to each error".

    Columns are suffixed to keep both sides addressable; the joined
    event-time columns come back as ``event_ts{suffix}``.
    """
    ls, rs = suffixes

    def prep(df: DataFrame, s: str) -> DataFrame:
        out = df.withColumn(
            f"event_ts{s}", F.timestamp_micros(F.col(time_col))
        ).withWatermark(f"event_ts{s}", watermark)
        for c in df.columns:
            if c != key:
                out = out.withColumnRenamed(c, f"{c}{s}")
        return out

    lf, rf = prep(left, ls), prep(right, rs)
    cond = (
        (lf[key] == rf[key])
        & (
            F.col(f"event_ts{rs}")
            >= F.col(f"event_ts{ls}") + F.expr(f"INTERVAL {lower_us} MICROSECOND")
        )
        & (
            F.col(f"event_ts{rs}")
            <= F.col(f"event_ts{ls}") + F.expr(f"INTERVAL {upper_us} MICROSECOND")
        )
    )
    return lf.join(rf, cond, "inner").drop(rf[key])


_LATEST_OUT = StructType([
    StructField("address", LongType()),
    StructField("time", LongType()),
    StructField("value", LongType()),
    StructField("seq", LongType()),
])
_LATEST_STATE = StructType([
    StructField("time", LongType()),
    StructField("value", LongType()),
    StructField("seq", LongType()),
])


def _latest_update(key, pdfs, state: GroupState):
    """Per-key reducer: keep the (time DESC, seq ASC) winner — the
    latestUniques rule (Algorithms.hs:250-262) — across micro-batches."""
    if state.exists:
        best_t, best_v, best_s = state.get
    else:
        best_t, best_v, best_s = None, None, None
    for pdf in pdfs:
        for t, v, s in zip(pdf["time"], pdf["value"], pdf["seq"]):
            t, s = int(t), int(s)
            v = None if pd.isna(v) else int(v)
            if (
                best_t is None
                or t > best_t
                or (t == best_t and s < best_s)
            ):
                best_t, best_v, best_s = t, v, s
    state.update((best_t, best_v, best_s))
    yield pd.DataFrame(
        {
            "address": [key[0]],
            "time": [best_t],
            "value": [best_v],
            "seq": [best_s],
        }
    )


def stream_latest_per_key(points: DataFrame) -> DataFrame:
    """Continuously-maintained latest-per-key view (Mutable KV M6) as a
    custom stateful streaming operator: emits the current winner for
    every key that saw new data in the micro-batch."""
    return points.groupBy("address").applyInPandasWithState(
        _latest_update,
        outputStructType=_LATEST_OUT,
        stateStructType=_LATEST_STATE,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
