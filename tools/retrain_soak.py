"""10x soak for the IVF retrain path (VERDICT r13 #2).

The bucket-growth story: `VectorIndex.probe` scans nprobe buckets per
query, so probe cost is proportional to PER-BUCKET rows — at a fixed
centroid count a 10x corpus makes every bucket 10x fatter and probes
degrade linearly.  `retrain(ns, k=N)` is the escape hatch that keeps
per-bucket density bounded as the corpus grows.  This soak proves the
mechanism end to end (the reshard_soak convention, cluster-index
twin):

* 1x corpus, build k=K1 (bucket density D = n/K1), retrain in place
  (the law path exercised at baseline scale);
* 10x corpus (vec_id-shifted copies), build at the SAME k=K1 — the
  "grown index" state, buckets 10x fatter — probe it for contrast;
* retrain the 10x index to 10*K1, returning buckets to density D;
* time the same 5-query probe (probe + probe_df) on each state with
  nprobe FIXED: probe cost is nprobe x bucket size, so the grown
  index scans 10x the rows per probe and the retrained one scans the
  1x amount again — exactly the operational story (fixed probe
  budget, growing corpus, retrain as the density escape hatch).

Report: per-path wall times and the 10x-retrained/1x ratio.
Expectation: near-flat after retrain (exponent ~0) while the
under-clustered 10x index pays the bucket growth.  At the fixture's
micro scale absolute times carry fixed per-stage overhead (more
bucket DIRECTORIES after retrain => more listed files), so the
exponent is the signal, not the constants.

Usage: python tools/retrain_soak.py [workdir]
(defaults /tmp/retrain_soak).  Records go to BENCH_NOTES.md.
"""

from __future__ import annotations

import math
import os
import sys
import time

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


def time_probes(vi, ns, qs, qdf, nprobe) -> dict[str, float]:
    out = {}
    for name, fn in (
        ("probe", lambda: vi.probe(
            ns, qs, topk=5, nprobe=nprobe).count()),
        ("probe_df", lambda: vi.probe_df(
            ns, qdf, topk=5, nprobe=nprobe).count()),
    ):
        best = None
        for _ in range(2):
            vi.spark.catalog.clearCache()
            t0 = time.time()
            fn()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
    return out


def main() -> None:
    work = sys.argv[1] if len(sys.argv) > 1 else "/tmp/retrain_soak"
    from pyspark.sql import functions as F

    from rados_timestore_spark.session import get_spark
    from rados_timestore_spark.vector_index import VectorIndex

    spark = get_spark(app_name="retrain-soak")
    big = f"{work}/emb10x"
    if not os.path.exists(f"{big}/embeddings.parquet"):
        print(f"# building {COPIES}x embeddings ...", file=sys.stderr)
        build_embeddings_10x(spark, big)

    emb1 = spark.read.parquet(f"{SRC}/embeddings.parquet")
    emb10 = spark.read.parquet(f"{big}/embeddings.parquet")
    qrows = emb1.filter(F.col("vec_id") < 5).collect()
    qs = [(r.vec_id, list(map(float, r.embedding))) for r in qrows]
    qdf = emb1.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"))

    K1 = int(os.environ.get("K1", "50"))
    NPROBE = 4
    results = {}
    # 1x at density D = n/K1 (retrain exercised on the law path: an
    # under-clustered build healed in place)
    vi1 = VectorIndex(spark, f"{work}/idx1x")
    vi1.build("e", emb1, k=K1 // 2)
    vi1.retrain("e", k=K1)
    results["1x"] = time_probes(vi1, "e", qs, qdf, NPROBE)

    # 10x grown-but-under-clustered: SAME k, buckets 10x fatter — the
    # problem state a fixed-k index reaches as the corpus grows
    vi10a = VectorIndex(spark, f"{work}/idx10x_under")
    vi10a.build("e", emb10, k=K1)
    results["10x_under"] = time_probes(vi10a, "e", qs, qdf, NPROBE)

    # 10x retrained to 10*K1: buckets back to density D
    t0 = time.time()
    vi10a.retrain("e", k=10 * K1)
    retrain_s = round(time.time() - t0, 3)
    results["10x_retrained"] = time_probes(vi10a, "e", qs, qdf, NPROBE)
    results["retrain_wall_s"] = retrain_s
    st = vi10a.stats("e")
    results["10x_retrained_mean_bucket"] = (
        st["n_vectors"] // max(len(st["per_bucket"]), 1))

    for path in ("probe", "probe_df"):
        r = results["10x_retrained"][path] / results["1x"][path]
        exp = math.log10(max(r, 1e-9))
        print(f"{path}: 1x(k={K1})={results['1x'][path]}s "
              f"10x-under(k={K1})={results['10x_under'][path]}s "
              f"10x-retrained(k={10*K1})={results['10x_retrained'][path]}s "
              f"ratio={r:.2f} exponent={exp:.2f}")
    print(results)


if __name__ == "__main__":
    main()
