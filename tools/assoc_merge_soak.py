"""Hot-chain soak for MutableKV.merge_into's associative fast path
(VERDICT r10 #4): one key holds 50% of an N-row chain — the
pathological shape the default order-dependent fold serializes into a
single task.  Times the default vs ``associative=True`` paths at 1x
and 10x and reports each path's scaling exponent
``log(t_10x / t_1x) / log(10)``.

The merge is bytes-min (commutative + associative + idempotent), so
both paths are semantically identical on this workload — asserted on
the hot key's folded value before timing is reported.

Usage: python tools/assoc_merge_soak.py [n_1x]   (default 200_000)
"""

from __future__ import annotations

import json
import math
import os
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    n1 = int(sys.argv[1]) if len(sys.argv) > 1 else 200_000
    from pyspark.sql import functions as F

    from rados_timestore_spark.mutable import MutableKV
    from rados_timestore_spark.session import get_spark
    from rados_timestore_spark.store import TimeStore

    spark = get_spark(app_name="assoc-merge-soak")

    # Warmup: JVM + codegen + the Python worker pool, like bench.py —
    # the first pandas-UDF stage otherwise pays worker fork + imports.
    import pandas as pd

    def _warm(x):
        return x

    _warm.__annotations__ = {"x": pd.Series, "return": pd.Series}
    spark.range(1000, numPartitions=32) \
        .select(F.pandas_udf(_warm, "long")("id")).count()

    def mrg(new: bytes, old: bytes) -> bytes:
        return new if new < old else old

    def run(n: int, assoc: bool) -> float:
        root = tempfile.mkdtemp(prefix="assoc_soak_")
        store = TimeStore(spark, root)
        store.register_namespace("s", buckets=32)
        kv = MutableKV(store, "s")
        # hot key 1 takes every even id (50% of the chain); the rest
        # spread over 1000 cold keys
        rows = spark.range(n).select(
            F.when(F.col("id") % 2 == 0, F.lit(1))
            .otherwise((F.col("id") % 1000) * 2 + 1).alias("key"),
            F.encode(F.conv(F.col("id").cast("string"), 10, 16),
                     "UTF-8").alias("value"),
            F.col("id").alias("seq"),
        )
        kv.insert_bulk(rows)
        batch = spark.range(1000).select(
            (F.col("id") * 2 + 1).alias("key"),
            F.encode(F.lit("0"), "UTF-8").alias("value"),
            F.col("id").alias("seq"),
        )
        t0 = time.time()
        kv.merge_into(batch, mrg, associative=assoc)
        dt = time.time() - t0
        # semantic check: hot key folded to the minimum token ("0"
        # from the update batch beats every hex chain value)
        assert kv.lookup(1) == b"0", (n, assoc)
        import shutil

        shutil.rmtree(root, ignore_errors=True)
        return round(dt, 3)

    out: dict = {}
    for assoc in (False, True):
        # min-of-2 per point: this box shows up to 2.3x run-to-run
        # noise (BENCH_NOTES protocol)
        t1 = min(run(n1, assoc) for _ in range(2))
        t10 = min(run(n1 * 10, assoc) for _ in range(2))
        expo = math.log(max(t10, 1e-3) / max(t1, 1e-3)) / math.log(10)
        out["associative" if assoc else "default"] = {
            "t_1x": t1, "t_10x": t10, "exponent": round(expo, 2),
        }
    print(json.dumps({"metric": "assoc_merge_soak", "n_1x": n1,
                      "hot_share": 0.5, "paths": out}))


if __name__ == "__main__":
    main()
