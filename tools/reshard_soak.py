"""10x soak for the HNSW re-shard path (VERDICT r12 #5).

The shard-growth story: `HNSWIndex.probe_*` reconstructs one whole
shard's graph inside each Arrow task, so probe latency and task memory
are proportional to PER-SHARD rows, not corpus rows.  `reshard(ns, N)`
is the escape hatch that keeps per-shard size bounded as the corpus
grows.  This soak proves the mechanism end to end:

* 1x corpus (sf0.01 embeddings), build shards=4, reshard -> 8;
* 10x corpus (vec_id-shifted copies, the scale_soak convention),
  build shards=4 — deliberately under-sharded, the "grown index"
  state — then reshard -> 40 so per-shard rows return to ~1x-at-8
  density;
* time the same 5-query probe (probe_candidates + probe_df) on each
  resharded index.

Report: per-path wall times and the 10x/1x ratio.  The expectation is
near-flat probes (exponent ~0: per-shard work constant, shard tasks
parallel across the 32 cores) while the under-sharded 10x index (also
timed, for contrast) pays the whole growth in per-task graph size.

Usage: python tools/reshard_soak.py [workdir]  (defaults /tmp/reshard_soak)
Records go to BENCH_NOTES.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SRC = os.environ.get("SPARK_GRAFT_SOAK_SRC", "/root/testdata/sf0.01")
COPIES = int(os.environ.get("COPIES", "10"))


def build_embeddings_10x(spark, out: str) -> None:
    from pyspark.sql import functions as F

    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    parts = [emb.select((F.col("vec_id") + F.lit(k * n)).alias("vec_id"),
                        *[c for c in emb.columns if c != "vec_id"])
             for k in range(COPIES)]
    allv = parts[0]
    for p in parts[1:]:
        allv = allv.unionByName(p)
    os.makedirs(out, exist_ok=True)
    (allv.repartition(16).write.mode("overwrite")
     .parquet(f"{out}/embeddings.parquet"))


def time_probes(ix, ns, qs, qdf) -> dict[str, float]:
    out = {}
    for name, fn in (
        ("probe_candidates", lambda: ix.probe_candidates(
            ns, qs, k=16, ef_search=64).count()),
        ("probe_df", lambda: ix.probe_df(
            ns, qdf, topk=5, k=16, ef_search=64).count()),
    ):
        best = None
        for _ in range(2):
            ix.spark.catalog.clearCache()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/reshard_soak"
    from pyspark.sql import functions as F

    from rados_timestore_spark.hnsw import HNSWIndex
    from rados_timestore_spark.session import get_spark

    spark = get_spark(app_name="reshard-soak")
    big = f"{work}/emb10x"
    if not os.path.exists(f"{big}/embeddings.parquet"):
        print(f"# building {COPIES}x embeddings ...", file=sys.stderr)
        build_embeddings_10x(spark, big)

    emb1 = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb10 = spark.read.parquet(f"{big}/embeddings.parquet")
    qrows = emb1.filter(F.col("vec_id") < 5).collect()
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in qrows]
    qdf = emb1.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"))

    results = {}
    # 1x: build 4, reshard to 8 (the law path at baseline scale)
    ix1 = HNSWIndex(spark, f"{work}/idx1x")
    ix1.build("e", emb1, shards=4)
    ix1.reshard("e", shards=8)
    results["1x_resharded_8"] = time_probes(ix1, "e", qs, qdf)

    # 10x grown-but-under-sharded: the problem state
    ix10a = HNSWIndex(spark, f"{work}/idx10x_under")
    ix10a.build("e", emb10, shards=4)
    results["10x_undersharded_4"] = time_probes(ix10a, "e", qs, qdf)

    # 10x resharded to 40: per-shard rows back to the 1x-at-8 density
    ix10b = HNSWIndex(spark, f"{work}/idx10x_resharded")
    ix10b.build("e", emb10, shards=4)
    t0 = time.time()
    ix10b.reshard("e", shards=40)
    reshard_s = round(time.time() - t0, 3)
    results["10x_resharded_40"] = time_probes(ix10b, "e", qs, qdf)
    results["reshard_40_wall_s"] = reshard_s

    for path in ("probe_candidates", "probe_df"):
        r = (results["10x_resharded_40"][path]
             / results["1x_resharded_8"][path])
        exp = math.log10(max(r, 1e-9))
        print(f"{path}: 1x(8sh)={results['1x_resharded_8'][path]}s "
              f"10x(40sh)={results['10x_resharded_40'][path]}s "
              f"10x-under(4sh)={results['10x_undersharded_4'][path]}s "
              f"ratio={r:.2f} exponent={exp:.2f}")
    print(results)


if __name__ == "__main__":
    main()
