"""Query registry: every operator exposed through the driver contract.

Each entry pairs a Spark implementation (``(spark, sf_dir) ->
DataFrame``) with an equivalent ANSI-SQL oracle that DuckDB runs on the
same parquet tables.  Column names/aliases are kept identical on both
sides (the driver's compare sorts columns by name before hashing).

Cross-engine determinism rules used throughout:

* event time = microseconds.  The test parquet stores TIMESTAMP(NANOS);
  Spark reads it as a ns long (``nanosAsLong``) and we ``div 1000``,
  DuckDB truncates to µs natively (``epoch_us``).
* every floating-point aggregate is computed as an exact DECIMAL sum
  (order-independent) and only then cast to double — identical bits in
  both engines regardless of shuffle/accumulation order.
* hashing strings cross-engine uses md5 (bit-identical everywhere);
  64-bit values derive from hex prefixes: Spark
  ``conv(substr(md5(x),1,15),16,10)`` == DuckDB
  ``('0x' || substr(md5(x),1,15))::BIGINT`` (60 bits, fits signed i64).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass
class Query:
    fn: QueryFn
    oracle: str | None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


QUERIES: dict[str, Query] = {}


def register(name: str, oracle: str | None = None, tags: tuple[str, ...] = (),
             bench: bool = False):
    def deco(fn: QueryFn) -> QueryFn:
        QUERIES[name] = Query(fn=fn, oracle=oracle, tags=tags, bench=bench)
        return fn
    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    from rados_timestore_spark.session import configure_session

    configure_session(spark)
    return spark.read.parquet(f"{sf_dir}/{table}.parquet")


def queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {name: q.fn for name, q in QUERIES.items()}


def oracle_sql() -> dict[str, str]:
    _ensure_loaded()
    return {n: q.oracle for n, q in QUERIES.items() if q.oracle is not None}


def bench_queries() -> dict[str, QueryFn]:
    _ensure_loaded()
    return {n: q.fn for n, q in QUERIES.items() if q.bench}


_loaded = False


#: Import errors collected by _ensure_loaded (module -> repr(error)).
#: One broken module must never zero the whole driver contract, but
#: the failure has to stay visible for debugging.
LOAD_ERRORS: dict[str, str] = {}

_QUERY_MODULES = (
    "rados_timestore_spark.queries_core",
    "rados_timestore_spark.queries_timeseries",
    "rados_timestore_spark.queries_streaming",
    "rados_timestore_spark.queries_tpch",
    "rados_timestore_spark.queries_tpch2",
    "rados_timestore_spark.queries_text",
    "rados_timestore_spark.queries_dedup",
    "rados_timestore_spark.queries_similarity",
    "rados_timestore_spark.queries_multimodal",
)


def _ensure_loaded() -> None:
    """Import every module that registers queries (import side effects)."""
    global _loaded
    if _loaded:
        return
    for mod in _QUERY_MODULES:
        try:
            __import__(mod)
        except Exception as exc:  # noqa: BLE001 — record, don't crash
            LOAD_ERRORS[mod] = repr(exc)
    _loaded = True
