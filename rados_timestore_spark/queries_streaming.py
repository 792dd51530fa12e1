"""Driver-contract queries that execute REAL Structured Streaming jobs
(availableNow trigger) and return their materialized output.

Determinism for the oracle: with every input file in one micro-batch,
the final watermark is ``max(event_time) - delay`` and append mode
emits exactly the windows whose end <= watermark — a pure function of
the data that plain SQL can reproduce.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rados_timestore_spark.registry import register

_DELAY_US = 30 * 60 * 1_000_000   # 30 min watermark
_HOUR_US = 3_600_000_000


@register(
    "streaming_rollup_hourly",
    oracle=f"""
WITH pts AS (
  SELECT user_id * 2 AS address, epoch_us(ts) AS t, event_id AS value
  FROM events
),
wm AS (SELECT max(t) - {_DELAY_US} AS watermark FROM pts),
agg AS (
  SELECT t // {_HOUR_US} AS hour, address, count(*) AS n,
         CAST(sum(value) AS BIGINT) AS sum_value
  FROM pts GROUP BY 1, 2
)
SELECT hour * {_HOUR_US} AS window_start_us, address, n, sum_value
FROM agg, wm
WHERE (hour + 1) * {_HOUR_US} <= watermark
""",
    tags=("streaming",),
)
def streaming_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """End-to-end Structured Streaming rollup: events flow through a
    file source -> watermark -> tumbling 1h window aggregate -> parquet
    sink (availableNow), and the sink's contents are returned.  Append
    mode emits exactly the watermark-closed windows, which the oracle
    reproduces relationally."""
    from rados_timestore_spark.queries_common import load
    from rados_timestore_spark.streaming.windows import stream_rollup

    ev = load(spark, sf_dir, "events")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        F.expr("ts div 1000").alias("time"),
        F.col("event_id").alias("value"),
    )
    work = tempfile.mkdtemp(prefix="ts_stream_q_")
    src, out, ck = f"{work}/src", f"{work}/out", f"{work}/ck"
    pts.write.parquet(src)

    stream = spark.readStream.schema(pts.schema).parquet(src)
    q = (
        stream_rollup(stream, window="1 hour", watermark="30 minutes")
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(300)
    got = spark.read.parquet(out)
    return got.select(
        F.unix_micros(F.col("window.start")).alias("window_start_us"),
        "address", "n", "sum_value",
    )
