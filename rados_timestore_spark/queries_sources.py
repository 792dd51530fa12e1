"""Source/sink format breadth: CSV and JSON-lines ingestion paths.

The engine's native table format is Parquet (the reference's object
blobs re-expressed as columnar storage, SURVEY §1), but a pipeline's
EDGE is rarely parquet — logs arrive as CSV/JSONL.  These queries
prove the text-source ingestion path end-to-end: project the events
fixture to the Point model, write it through the text format, read it
back with an explicit schema, and aggregate — the DuckDB oracle
computes the same aggregate straight from parquet, so a hash match
certifies the text round-trip was lossless.

Determinism: only INTEGER columns cross the text boundary (epoch-µs
time, ids) — no float formatting, no timestamp-zone parsing, nothing
locale-dependent.  Scale shape: the staged file is written once and
both sides of the comparison are single-scan aggregates; on a cluster
the staging path comes from ``spark.rados_timestore.stream_dir``
exactly like the streaming demos (local tempdir default).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rados_timestore_spark.queries_common import event_us, load
from rados_timestore_spark.registry import register

#: The aggregate both round-trips certify with (all-integer).
_AGG_SQL = """
SELECT address, count(*) AS n,
       CAST(sum(t) AS BIGINT) AS sum_time,
       CAST(sum(value) AS BIGINT) AS sum_value,
       min(t) AS min_time, max(t) AS max_time
FROM pts GROUP BY address
"""

_PTS_SQL = """
WITH pts AS (
  SELECT user_id * 2 AS address, epoch_us(ts) AS t, event_id AS value
  FROM events
)
"""


def _points(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load(spark, sf_dir, "events")
    return ev.select(
        (F.col("user_id") * 2).alias("address"),
        event_us(ev).alias("t"),
        F.col("event_id").alias("value"),
    )


def _agg(df: DataFrame) -> DataFrame:
    return df.groupBy("address").agg(
        F.count("*").alias("n"),
        F.sum("t").cast("long").alias("sum_time"),
        F.sum("value").cast("long").alias("sum_value"),
        F.min("t").alias("min_time"),
        F.max("t").alias("max_time"),
    )


def _roundtrip(spark: SparkSession, sf_dir: str, fmt: str) -> DataFrame:
    from rados_timestore_spark.queries_streaming import stream_workdir

    pts = _points(spark, sf_dir)
    work = stream_workdir(spark, f"ts_src_{fmt}_")
    path = f"{work}/pts"
    writer = pts.coalesce(4).write.mode("overwrite")
    if fmt == "csv":
        writer.option("header", True).csv(path)
        back = (
            spark.read.schema("address long, t long, value long")
            .option("header", True).csv(path)
        )
    elif fmt == "orc":
        writer.orc(path)
        back = spark.read.orc(path)
    else:
        writer.json(path)
        back = spark.read.schema("address long, t long, value long") \
            .json(path)
    return _agg(back)


@register(
    "src_csv_roundtrip",
    oracle=_PTS_SQL + _AGG_SQL,
    tags=("sources",),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def src_csv_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CSV source/sink round-trip (module doc): the aggregate computed
    through write-CSV -> read-CSV must hash-match the oracle's
    straight-from-parquet aggregate."""
    return _roundtrip(spark, sf_dir, "csv")


@register(
    "src_jsonl_roundtrip",
    oracle=_PTS_SQL + _AGG_SQL,
    tags=("sources",),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def src_jsonl_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-lines source/sink round-trip — same certificate as
    :func:`src_csv_roundtrip` through the JSON text path."""
    return _roundtrip(spark, sf_dir, "json")


@register(
    "src_orc_roundtrip",
    oracle=_PTS_SQL + _AGG_SQL,
    tags=("sources",),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def src_orc_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ORC source/sink round-trip — the columnar sibling certificate
    (Spark reads ORC natively with its own schema; the oracle still
    aggregates straight from parquet)."""
    return _roundtrip(spark, sf_dir, "orc")


_US_PER_DAY = 86_400_000_000
#: 2024-01-04 / 2024-01-07 00:00 UTC as day ordinals — the pruned
#: read's closed day range.
_DAY_LO = 1_704_326_400_000_000 // _US_PER_DAY
_DAY_HI = 1_704_585_600_000_000 // _US_PER_DAY


@register(
    "src_partitioned_roundtrip",
    oracle=_PTS_SQL + f"""
SELECT t // {_US_PER_DAY} AS day, address, count(*) AS n,
       CAST(sum(value) AS BIGINT) AS sum_value
FROM pts
WHERE t // {_US_PER_DAY} BETWEEN {_DAY_LO} AND {_DAY_HI}
GROUP BY 1, 2
""",
    tags=("sources",),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def src_partitioned_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hive-partitioned dataset round-trip with PARTITION PRUNING:
    write the point projection partitioned by day
    (``partitionBy("day")`` — the directory layout every lake-house
    ingest lands in), read it back through partition discovery with a
    closed day-range predicate, and aggregate per (day, address).

    The certificate is two-sided: values hash-match the oracle's
    straight-from-parquet aggregate (the partition column round-trips
    losslessly through its directory-name encoding), and the range
    predicate resolves against DIRECTORY names, never data files —
    ``PartitionFilters`` in the scan, asserted by
    tests/test_plans.py::test_partitioned_source_scan_prunes — which
    is what makes a day-ranged query on a year of 100 TB ingest read
    3 directories instead of 365."""
    from rados_timestore_spark.queries_streaming import stream_workdir

    pts = _points(spark, sf_dir).withColumn(
        "day", F.expr(f"t div {_US_PER_DAY}")
    )
    work = stream_workdir(spark, "ts_src_part_")
    path = f"{work}/pts"
    pts.write.mode("overwrite").partitionBy("day").parquet(path)
    back = spark.read.parquet(path).filter(
        F.col("day").between(_DAY_LO, _DAY_HI)
    )
    return back.groupBy("day", "address").agg(
        F.count("*").alias("n"),
        F.sum("value").cast("long").alias("sum_value"),
    ).select(
        # partition-column discovery types day int32; the oracle's
        # integer division is BIGINT — unify
        F.col("day").cast("long").alias("day"),
        "address", "n", "sum_value",
    )


@register(
    "src_schema_evolution",
    oracle=_PTS_SQL + """
SELECT address, count(*) AS n,
       CAST(sum(value) AS BIGINT) AS sum_value,
       CAST(count(quality) AS BIGINT) AS n_quality,
       CAST(sum(quality) AS BIGINT) AS sum_quality
FROM (
  SELECT address, t, value, NULL AS quality
  FROM pts WHERE value % 2 = 0
  UNION ALL
  SELECT address, t, value, value % 100 AS quality
  FROM pts WHERE value % 2 = 1) u
GROUP BY address
""",
    tags=("sources",),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def src_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution ingest certificate: an early batch lands
    WITHOUT the ``quality`` column, a later batch lands WITH it (the
    add-a-column evolution every long-lived ingest pipeline goes
    through), both into one dataset directory; the read resolves the
    union schema via parquet footer merging (``mergeSchema``) and the
    aggregate proves old rows surface the new column as NULL while
    new rows round-trip it losslessly — exactly the semantics the
    oracle states with a NULL-padded UNION.

    Scale note: ``mergeSchema`` reads every file footer at planning
    time — the certificate of CORRECTNESS here; at 100 TB you pin the
    merged schema in a metastore/table format and pay the footer
    sweep never — but the NULL-fill read semantics this query hashes
    are identical either way."""
    from rados_timestore_spark.queries_streaming import stream_workdir

    pts = _points(spark, sf_dir)
    work = stream_workdir(spark, "ts_src_evo_")
    path = f"{work}/pts"
    old = pts.filter(F.col("value") % 2 == 0)
    new = pts.filter(F.col("value") % 2 == 1).withColumn(
        "quality", F.col("value") % 100)
    old.coalesce(2).write.mode("overwrite").parquet(path)
    new.coalesce(2).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", True).parquet(path)
    return back.groupBy("address").agg(
        F.count("*").alias("n"),
        F.sum("value").cast("long").alias("sum_value"),
        F.count("quality").cast("long").alias("n_quality"),
        F.sum("quality").cast("long").alias("sum_quality"),
    )
