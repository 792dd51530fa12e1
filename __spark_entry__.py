"""Driver contract for the spark-graft builder (PySpark target).

Delegates to :mod:`rados_timestore_spark.registry`, which collects one
query + DuckDB oracle per implemented operator from SURVEY.md §2 (see
``rados_timestore_spark/queries_*.py``).
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

# Make the package importable when the driver runs this file from an
# arbitrary working directory.
_REPO = os.path.dirname(os.path.abspath(__file__))
if _REPO not in sys.path:
    sys.path.insert(0, _REPO)

from rados_timestore_spark import registry  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: end-to-end TimeStore ingest + pruned read on
    sf0.001 (write_points -> partitioned parquet -> read_simple)."""
    from rados_timestore_spark.queries_core import ts_store_roundtrip

    return ts_store_roundtrip(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-equivalent SQL for EVERY registered query — including
    the LSH clustering pipelines (recursive-CTE transitive closure)
    and the streaming jobs (watermark reproduced relationally); zero
    rows-only checks."""
    return registry.oracle_sql()
