"""Shared helpers for the driver-contract query modules.

The driver runs each ``queries()[name]`` on Spark and the matching
``oracle_sql()[name]`` on DuckDB over the same parquet tables, then
compares row-count + schema + order-insensitive value hash.  These
helpers keep the two sides bit-identical:

* event time: epoch µs on both sides.  The driver fixtures have
  shipped ``events.ts`` both as parquet TIMESTAMP(NANOS) (read as a
  ns long under ``nanosAsLong`` and ``div 1000``-ed) and as
  TIMESTAMP(MICROS) (read as TIMESTAMP_NTZ; ``unix_micros`` under the
  pinned-UTC session) — :func:`event_us` handles either, and DuckDB's
  ``epoch_us(ts)`` matches both exactly.
* the events table maps onto the reference's Point model
  (SURVEY.md §1.1, lib/TimeStore/Core.hs:245-249) as::

      address = user_id * 2 + (event_type = 'error')   -- LSB = kind
      time    = epoch_us(ts)
      value   = event_id          (simple payload, Word64-ish)
      payload_str = props         (extended payload, utf-8)
      seq     = event_id          (ingest order -> first-wins dedup)

  'error' events play the role of extended points so both kinds exist.
* floats are kept out of driver-compared outputs except as exact
  DECIMAL sums cast to double (order-independent, identical bits in
  both engines).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# ------------------------------------------------------------------ time
# events span 2024-01; constants in µs since epoch.
T_JAN10 = 1_704_844_800_000_000  # 2024-01-10 00:00:00 UTC
T_JAN20 = 1_705_708_800_000_000  # 2024-01-20 00:00:00 UTC
US_PER_DAY = 86_400_000_000

#: Fixed address set for point-lookup queries (even = simple kind).
#: Includes 4 and 14 — the reference's bucket-collision test pair
#: (tests/UnitTests.hs:93-114: both hash to bucket 4 mod 10).
ADDRS = (0, 2, 4, 14, 46, 92, 150, 288)

#: SQL literal for ADDRS.
ADDRS_SQL = ", ".join(str(a) for a in ADDRS)

#: CTE shared by every events-based oracle: events -> points.
PTS_CTE = """
WITH pts AS (
  SELECT user_id * 2 + CASE WHEN event_type = 'error' THEN 1 ELSE 0 END
           AS address,
         epoch_us(ts) AS time,
         event_id     AS value,
         props        AS payload_str,
         event_id     AS seq
  FROM events
)
"""


def event_us(df: DataFrame, col: str = "ts") -> "F.Column":
    """Epoch-µs column for the events timestamp, robust to the fixture
    representation: ns-long (TIMESTAMP(NANOS) under ``nanosAsLong``)
    or TIMESTAMP_NTZ (TIMESTAMP(MICROS); NTZ->TZ cast is identity
    under the pinned-UTC session).  Both equal DuckDB ``epoch_us``."""
    from pyspark.sql.types import LongType

    if isinstance(df.schema[col].dataType, LongType):
        return F.expr(f"{col} div 1000")
    return F.unix_micros(F.col(col).cast("timestamp"))


def ts_us(col: str) -> "F.Column":
    """Epoch microseconds from a TIMESTAMP_NTZ column (lineitem/orders
    store µs precision; session zone is pinned UTC so the NTZ->TZ cast
    is identity) — matches DuckDB ``epoch_us(col)``."""
    return F.unix_micros(F.col(col).cast("timestamp"))


def ts_lit(us: int) -> "F.Column":
    """A TIMESTAMP_NTZ literal from epoch µs, for direct comparisons
    against NTZ columns: ``col <= ts_lit(...)`` keeps the raw column
    in the predicate so it pushes into the parquet scan (row-group
    stats), unlike ``unix_micros(col) <= n`` which wraps the column in
    an expression Catalyst cannot push."""
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(us / 1_000_000, tz=timezone.utc)
    iso = dt.strftime("%Y-%m-%d %H:%M:%S.%f")
    return F.expr(f"TIMESTAMP_NTZ '{iso}'")


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Read one driver test table with the engine's session confs."""
    from rados_timestore_spark.session import configure_session

    configure_session(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def load_parallel(
    spark: SparkSession, sf_dir: str, table: str, key: str
) -> DataFrame:
    """Load + spread across all cores.

    The driver fixtures are single-row-group parquet files, so Spark's
    file splitting yields ONE scan partition and any CPU-heavy per-row
    derivation (shingling, hyperplane dots, pandas UDF decode) runs on
    one core.  A hash repartition on ``key`` costs one small shuffle
    and unlocks the other 31.  On a real multi-file/multi-row-group
    table the scan is already split and this repartition is a cheap
    rebalance.
    """
    df = load(spark, sf_dir, table)
    return df.repartition(spark.sparkContext.defaultParallelism, key)


def events_points(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The events table projected onto the Point model (see module doc).

    Mirrors PTS_CTE exactly — any change must be made in both places.
    """
    ev = load(spark, sf_dir, "events")
    return ev.select(
        (
            F.col("user_id") * 2
            + F.when(F.col("event_type") == "error", 1).otherwise(0)
        ).alias("address"),
        event_us(ev).alias("time"),
        F.col("event_id").alias("value"),
        F.col("props").alias("payload_str"),
        F.col("event_id").alias("seq"),
    )


# ---------------------------------------------------------------- cache pins
#: DataFrames persisted by the CURRENT query invocation (see pin()).
_PINNED: list[DataFrame] = []


def pin(df: DataFrame) -> DataFrame:
    """``persist()`` a query intermediate and record it for release.

    Query functions return lazily — the caller runs the action after
    the function returns — so an in-function ``unpersist()`` would
    evict the block before it is ever used.  Instead every persist in
    the query modules goes through ``pin``; the registry wrapper
    releases the *previous* query's pins when the next query starts
    (the earliest moment they are provably no longer needed), and
    harnesses call :func:`release_pins` after their final action, so a
    long-lived session never accumulates cached blocks (VERDICT r6
    "What's wrong" #1).
    """
    _PINNED.append(df.persist())
    return df


def pin_stats(df: DataFrame) -> DataFrame:
    """:func:`pin`, then MATERIALIZE the cache eagerly (one count).

    For a pinned relation consumed by several later joins, planning
    those joins before the cache exists makes the broadcast decision
    from column-width ESTIMATES — at 100x corpus the minhash shingle
    table (arrays per row) planned as a broadcast build on both verify
    joins: a serial driver-side hash-relation build that was the
    flat-with-cores phase of the scaling probe, and an outright OOM at
    real scale.  Materializing first lets every downstream join plan
    against the TRUE cached byte size, so the small-corpus plan keeps
    its broadcasts and a large corpus demotes to a shuffle join
    automatically — the same actual-size-over-estimate principle AQE
    applies at shuffle boundaries.  The count is not an extra pass:
    the cache had to be built by whichever consumer ran first anyway.
    """
    pin(df)
    df.count()
    return df


def release_pins() -> int:
    """Unpersist every pinned intermediate; returns the count released.

    ``blocking=False``: eviction is async and safe — Spark recomputes
    any block that a still-running action needs after an unpersist.
    """
    n = len(_PINNED)
    for df in _PINNED:
        try:
            df.unpersist()
        except Exception:  # session already stopped — nothing to free
            pass
    _PINNED.clear()
    n += _release_staged()
    return n


#: Staged directories (spark, path) awaiting release — see
#: :func:`stage_for_release`.
_STAGED: list[tuple["SparkSession", str]] = []


def stage_for_release(spark: "SparkSession", path: str) -> None:
    """Register a staging directory for deletion at the next
    :func:`release_pins` (i.e. when the next registered query starts,
    or when a harness finishes) — the staged-files twin of
    :func:`pin`: queries returning lazy frames over staged output
    cannot delete it before the caller's action runs.

    This encodes the ONE-ACTION-PER-QUERY contract (documented at the
    registry wrapper): a caller must run its action on query A's frame
    before invoking query B, because B's entry deletes A's staging.
    Materializing staged frames driver-side instead would remove the
    contract but caps sink size at driver memory — wrong at scale, so
    only queries whose output is a small certificate do it (e.g.
    streaming_dedup_docs)."""
    _STAGED.append((spark, path))


def _release_staged() -> int:
    n = len(_STAGED)
    for spark, path in _STAGED:
        try:
            from rados_timestore_spark.fsutil import HadoopFS

            HadoopFS(spark, path).delete(path, recursive=True)
        except Exception:
            pass  # session stopped or already removed
    _STAGED.clear()
    return n
