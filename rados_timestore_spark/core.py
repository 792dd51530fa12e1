"""Core data model: the Point schema and its derived columns.

Reference mapping (SURVEY.md §1):

* Point = (address: Word64, time: Word64 ns, payload: Word64)
  — ``lib/TimeStore/Core.hs:245-270``.  Here: one row of the ``points``
  DataFrame with nullable ``value`` (simple) / ``payload`` (extended)
  columns instead of the reference's pointer/offset split storage.
* address LSB discriminates simple (0) vs extended (1) points
  — ``lib/TimeStore/Algorithms.hs:133``.
* bucket placement = ``(addr & ~1) mod max_buckets``
  — ``lib/TimeStore/Core.hs:272-276``; clearing bit 0 keeps an extended
  point and its pointer in the same shard.
* canonical ordering compares time first then address so adjacent
  comparison deduplicates — ``lib/TimeStore/Core.hs:252-258``.
* first-write-wins dedup on (address, time)
  — ``lib/TimeStore/Algorithms.hs:198-217`` (stable sort + adjacent
  compaction keeps the earliest-appended record).  Spark shuffles are
  unordered, so determinism requires an explicit ingest-sequence
  column ``seq``; ``row_number() over (partition by address, time
  order by seq) = 1`` reproduces the reference's semantics exactly.
"""

from __future__ import annotations

from typing import Iterable, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

KIND_SIMPLE = 0
KIND_EXTENDED = 1

#: Schema of the engine's fundamental table (FIXTURES.md §1).
POINTS_SCHEMA = T.StructType(
    [
        T.StructField("address", T.LongType(), False),
        T.StructField("time", T.LongType(), False),   # nanoseconds
        T.StructField("value", T.LongType(), True),   # simple payload
        T.StructField("payload", T.BinaryType(), True),  # extended blob
        T.StructField("seq", T.LongType(), False),    # ingest sequence
    ]
)


def one_slice_df(spark, rows, schema) -> DataFrame:
    """``createDataFrame`` for SMALL driver-side tables, in ONE slice.

    ``SparkSession.createDataFrame(list)`` parallelizes the rows into
    ``defaultParallelism`` pickled slices; every later evaluation then
    spins up one Python worker per slice just to unpickle a handful of
    rows — and a ``coalesce(1)`` (the natural shape for writing a
    centroid/codebook table as one file) runs those 32 deserializer
    invocations SERIALLY in a single task: measured 3.5 s to write a
    256-row centroid table at local[32], vs 0.35 s with one slice.
    Driver-built relations in query paths (centroids, PQ codebooks,
    probe query vectors, ADC LUTs) are all ≤ a few thousand rows by
    construction, so one slice is always the right shape; Spark
    re-parallelizes downstream wherever a shuffle needs to.
    """
    rows = rows if isinstance(rows, list) else list(rows)
    if not rows:
        return spark.createDataFrame([], schema)
    return spark.createDataFrame(
        spark.sparkContext.parallelize(rows, 1), schema)


def kind_col(address: Column | str = "address") -> Column:
    """Point kind from the address LSB (Algorithms.hs:133)."""
    address = F.col(address) if isinstance(address, str) else address
    return (address.bitwiseAND(F.lit(1))).cast("int")


def word64_pmod(x: Column, n: Column) -> Column:
    """``x mod n`` where the signed-i64 column ``x`` is reinterpreted
    as Word64 (the reference's address/time domain).

    For x >= 0 this is plain ``pmod``.  For x < 0 the unsigned value is
    ``x + 2^64``, so the result is ``(pmod(x, n) + 2^64 mod n) mod n``;
    ``2^64 mod n`` is computed as ``(2^32 mod n)^2 mod n`` to stay in
    i64 range for any bucket count.  Matches Haskell Word64 ``mod`` for
    every n, not just powers of two.
    """
    base = F.pmod(x, n)
    c32 = F.pmod(F.lit(1 << 32), n)
    corr = F.pmod(c32 * c32, n)
    return F.when(x >= 0, base).otherwise(F.pmod(base + corr, n))


def place_bucket(n_buckets: int, address: Column | str = "address") -> Column:
    """Shard placement: ``(addr clearBit 0) mod n`` (Core.hs:272-276).

    Word64 semantics: addresses >= 2^63 arrive as negative i64; the
    unsigned reinterpretation keeps placement identical to the
    reference for any bucket count (non-power-of-two included).
    """
    address = F.col(address) if isinstance(address, str) else address
    return word64_pmod(address.bitwiseAND(F.lit(-2)), F.lit(n_buckets))


def first_wins_dedup(
    df: DataFrame,
    keys: Sequence[str] = ("address", "time"),
    seq: str = "seq",
) -> DataFrame:
    """Deterministic first-write-wins dedup (Algorithms.hs:198-217).

    The reference stable-sorts by (time, address) and keeps the first
    record of each (address, time) run — i.e. the earliest *appended*
    duplicate wins.  ``dropDuplicates`` would be nondeterministic under
    shuffles, so we pick by the ingest sequence explicitly.

    Implemented as ``min_by(col, seq)`` hash aggregates (seq is unique,
    so every min_by picks the same winning row): ONE shuffle with
    map-side partial aggregation and no per-partition sort — cheaper
    than the equivalent ``row_number() == 1`` window at scale.
    """
    key_set = set(keys) | {seq}
    payload = [c for c in df.columns if c not in key_set]
    out = df.groupBy(*[F.col(k) for k in keys]).agg(
        *[F.min_by(c, seq).alias(c) for c in payload],
        F.min(seq).alias(seq),
    )
    return out.select(*df.columns)


def latest_per_key(
    df: DataFrame,
    key: str = "address",
    time: str = "time",
    seq: str = "seq",
    payload_cols: Iterable[str] = ("value", "payload"),
) -> DataFrame:
    """Argmax-per-group: max-time record per key (``latestUniques``,
    lib/TimeStore/Algorithms.hs:250-262).

    The reference sorts (address ASC, time DESC) and keeps the first
    per address; stability makes the earliest-appended win among equal
    (addr, time) pairs — hence ordering by (time DESC, seq ASC).

    Implemented as ``max_by(struct, ord)`` — a hash aggregate with
    map-side partial aggregation, which beats a window + filter at
    scale (one shuffle, no full sort of each partition).
    """
    # struct ordering is lexicographic: max time wins; among equal
    # times, max(-seq) = min seq = first-written wins.
    ord_col = F.struct(F.col(time).alias("t"), (-F.col(seq)).alias("negseq"))
    payload_struct = F.struct(*[F.col(c) for c in [time, *payload_cols, seq]])
    agg = df.groupBy(key).agg(F.max_by(payload_struct, ord_col).alias("__best"))
    out = agg.select(
        key,
        *[F.col(f"__best.{c}").alias(c) for c in [time, *payload_cols, seq]],
    )
    return out
