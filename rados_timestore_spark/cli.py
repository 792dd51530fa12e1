"""CLI parity with the reference's ``store`` executable (src/Store.hs).

The reference ships one subcommand — ``register`` with per-kind bucket
counts against a Ceph pool (Store.hs:30-88) — plus the implicit admin
surface its daemons expose.  This CLI maps ``--pool`` to ``--root``
(any Hadoop-FS URI: file:///, s3a://) and adds the read-side verbs a
store operator actually runs (``latest``, ``read``, ``write``,
``compact``, ``gc``), all thin wrappers over :class:`TimeStore` —
plus ``query`` (r6): run ANY registered analytics query (sketches,
dedup, similarity, TPC-H, ...) against a parquet table directory and
print JSON lines, so the whole SURVEY §2.3 surface is scriptable from
the operational loop the reference's ``store`` executable covers.

Usage::

    python -m rados_timestore_spark --root file:///tmp/ts --ns PONY \
        register --buckets 128
    python -m rados_timestore_spark --root ... --ns PONY \
        read --start 0 --end 9999999 --addresses 2,4 [--extended]
"""

from __future__ import annotations

import argparse
import json
import sys
from typing import Sequence

from pyspark.sql import SparkSession


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="rados_timestore_spark",
        description="Operate a timestore warehouse (Store.hs parity).",
    )
    p.add_argument("--root",
                   help="warehouse URI (file:///..., s3a://...); "
                        "required for every store verb, unused by "
                        "'query'")
    p.add_argument("--ns", "-o",
                   help="namespace (reference: origin); required for "
                        "every store verb, unused by 'query'")
    sub = p.add_subparsers(dest="cmd", required=True)

    reg = sub.add_parser("register", help="register a namespace")
    reg.add_argument("--buckets", "-s", type=int, default=128,
                     help="bucket count (reference default 128)")
    reg.add_argument("--extended-buckets", "-e", type=int, default=None,
                     help="separate extended-kind bucket count — enables "
                          "the dual per-kind index with independent "
                          "rollover (Store.hs:30-88 takes both counts)")

    sub.add_parser("latest", help="print (simple, extended) watermarks")

    rd = sub.add_parser("read", help="read points as JSON lines")
    rd.add_argument("--start", type=int, required=True)
    rd.add_argument("--end", type=int, required=True)
    rd.add_argument("--addresses", required=True,
                    help="comma-separated address list")
    rd.add_argument("--extended", action="store_true")
    rd.add_argument("--limit", type=int, default=1000)

    wr = sub.add_parser("write", help="ingest a parquet file of points")
    wr.add_argument("--parquet", required=True,
                    help="path with address/time/value[/payload] columns")

    bf = sub.add_parser(
        "backfill",
        help="bulk-ingest history in one pass (write_points_batched)")
    bf.add_argument("--parquet", required=True,
                    help="path with address/time/value[/payload] columns")
    bf.add_argument("--batch-us", type=int, default=86_400_000_000,
                    help="epoch chunk width in microseconds of event "
                         "time (default: one epoch per day)")
    bf.add_argument("--rollover-rows", type=int, default=None,
                    help="optional per-bucket row threshold: cut only "
                         "when the latest epoch's fullest bucket "
                         "exceeds it (default: every batch cuts)")

    rs = sub.add_parser(
        "rescale", help="cut a new epoch with a different bucket count")
    rs.add_argument("--buckets", type=int, required=True)
    sub.add_parser("compact", help="rewrite live generation compacted")
    sub.add_parser("gc", help="delete stale compaction generations")
    sub.add_parser(
        "stats",
        help="per-(epoch,bucket) parquet-file counts vs the "
             "small-file bound + crash debts (stale generations, "
             "tmp/lock remnants)")
    sub.add_parser(
        "maintain",
        help="stats + heal in one verb: gc crash debts, compact "
             "over-bound partitions; strict no-op when healthy")
    sub.add_parser(
        "verify",
        help="read-only integrity scrub: routing/watermark/seq "
             "invariants over every live row + orphan report")

    ex = sub.add_parser(
        "expire",
        help="drop every epoch fully older than the cutoff (TTL "
             "retention by partition delete; the open epoch survives)")
    ex.add_argument("--older-than-us", type=int, required=True,
                    help="epoch-microsecond cutoff; an epoch is "
                         "dropped iff its NEXT boundary is <= this")

    vb = sub.add_parser(
        "vecidx-build",
        help="build (or rebuild) a persisted IVF vector index from a "
             "parquet table with (vec_id, embedding) columns")
    vb.add_argument("--parquet", required=True)
    vb.add_argument("--k", type=int, default=256,
                    help="coarse-quantizer size (constant in corpus)")
    vb.add_argument("--trainer", choices=("sample", "kmeans"),
                    default="sample",
                    help="sample = k lowest-id vectors; kmeans = "
                         "distributed Lloyd seeded from that sample")
    vb.add_argument("--iters", type=int, default=2,
                    help="Lloyd iterations (kmeans trainer only)")

    va = sub.add_parser(
        "vecidx-append",
        help="assign new vectors to the existing routing table and "
             "append (no retrain)")
    va.add_argument("--parquet", required=True)

    vp = sub.add_parser(
        "vecidx-probe",
        help="ANN top-k for query vec_ids drawn from a parquet table")
    vp.add_argument("--parquet", required=True,
                    help="table holding the query vectors")
    vp.add_argument("--ids", required=True,
                    help="comma-separated query vec_id list")
    vp.add_argument("--topk", type=int, default=5)
    vp.add_argument("--nprobe", type=int, default=4)

    vd = sub.add_parser(
        "vecidx-delete",
        help="retract vectors by id (rewrites only affected buckets)")
    vd.add_argument("--ids", required=True,
                    help="comma-separated vec_id list")

    sub.add_parser(
        "vecidx-compact",
        help="collapse each bucket's append files into one file")

    vq = sub.add_parser(
        "vecidx-enable-pq",
        help="add product-quantization codes to the index (persisted "
             "sub-codebooks + a pq_code column; one rewrite)")
    vq.add_argument("--m", type=int, default=4,
                    help="subspaces (dim must divide evenly)")
    vq.add_argument("--ksub", type=int, default=16,
                    help="codewords per subspace")
    vq.add_argument("--residual", action="store_true",
                    help="quantize embedding - assigned centroid "
                         "(FAISS by_residual=True)")

    vr = sub.add_parser(
        "vecidx-retrain",
        help="retrain the coarse quantizer at a new centroid count "
             "(bucket growth: probe cost is nprobe x bucket size; "
             "keep buckets under ~1M vectors); law-equal to a fresh "
             "build over the stored vectors, ingest fences preserved")
    vr.add_argument("--k", type=int, required=True,
                    help="new centroid count")
    vr.add_argument("--trainer", choices=("sample", "kmeans"),
                    default=None,
                    help="override the built trainer (default: keep)")
    vr.add_argument("--iters", type=int, default=2,
                    help="Lloyd iterations (kmeans trainer only)")

    sub.add_parser(
        "vecidx-stats",
        help="per-bucket row counts vs the ~1M sizing rule "
             "(over-bound buckets => run vecidx-retrain)")

    sub.add_parser(
        "vecidx-maintain",
        help="stats + heal in one verb: retrain at a derived k when "
             "the sizing rule is violated, strict no-op when healthy")

    vpq = sub.add_parser(
        "vecidx-probe-pq",
        help="compressed ADC probe over the persisted codes "
             "(optionally exact-reranked)")
    vpq.add_argument("--parquet", required=True,
                     help="table holding the query vectors")
    vpq.add_argument("--ids", required=True,
                     help="comma-separated query vec_id list")
    vpq.add_argument("--topk", type=int, default=5)
    vpq.add_argument("--nprobe", type=int, default=4)
    vpq.add_argument("--rerank", type=int, default=None,
                     help="widen the ADC cut to N candidates and "
                          "re-rank them by exact cosine")

    hb = sub.add_parser(
        "hnsw-build",
        help="build a persisted sharded-HNSW graph index from a "
             "parquet table with (vec_id, embedding) columns")
    hb.add_argument("--parquet", required=True)
    hb.add_argument("--shards", type=int, default=8)
    hb.add_argument("--m", type=int, default=8,
                    help="max out-degree per layer (layer 0 allows 2x)")
    hb.add_argument("--ef", type=int, default=64,
                    help="construction beam width")

    ha = sub.add_parser(
        "hnsw-append",
        help="insert new vectors into their persisted-routing shards "
             "(only affected shard graphs are re-opened)")
    ha.add_argument("--parquet", required=True)

    hd = sub.add_parser(
        "hnsw-delete",
        help="retract vectors by id (affected shards rebuild from "
             "survivors: delete(A, V) == build(A minus V) exactly)")
    hd.add_argument("--ids", required=True,
                    help="comma-separated vec_id list")

    sub.add_parser(
        "hnsw-compact",
        help="collapse each shard's vector append files into one file")

    hr = sub.add_parser(
        "hnsw-reshard",
        help="change the shard count of a built graph index (shard "
             "growth: keep shards under ~1M vectors so a probe task "
             "holds one shard's graph); byte-equal to a fresh build "
             "at the new count")
    hr.add_argument("--shards", type=int, required=True)

    sub.add_parser(
        "hnsw-stats",
        help="per-shard row counts vs the ~1M sizing rule "
             "(over-bound shards => run hnsw-reshard)")

    sub.add_parser(
        "hnsw-maintain",
        help="stats + heal in one verb: reshard at a derived count "
             "when the sizing rule is violated, strict no-op when "
             "healthy")

    hp = sub.add_parser(
        "hnsw-probe",
        help="beam-search every shard graph for query vec_ids and "
             "print the exact-reranked top-k")
    hp.add_argument("--parquet", required=True,
                    help="table holding the query vectors")
    hp.add_argument("--ids", required=True,
                    help="comma-separated query vec_id list")
    hp.add_argument("--topk", type=int, default=5)
    hp.add_argument("--ef", type=int, default=64,
                    help="search beam width per shard")

    q = sub.add_parser(
        "query",
        help="run a registered analytics query (sketch_*, dedup_*, "
             "sim_*, text_*, tpch_*, ...) and print JSON lines")
    q.add_argument("--name", help="registry query name")
    q.add_argument("--list", action="store_true",
                   help="list registered query names and exit")
    q.add_argument("--sf-dir", default=None,
                   help="table directory (default: $SPARK_GRAFT_SF_DIR "
                        "or /root/testdata/sf0.1)")
    q.add_argument("--limit", type=int, default=100)
    return p


def main(argv: Sequence[str] | None = None,
         spark: SparkSession | None = None) -> int:
    from rados_timestore_spark.session import configure_session, get_spark
    from rados_timestore_spark.store import TimeStore

    args = _parser().parse_args(argv)
    spark = configure_session(spark) if spark is not None else get_spark()

    if args.cmd == "query":
        import os

        from rados_timestore_spark import registry

        qs = registry.queries()
        if args.list:
            for name in qs:
                print(name)
            return 0
        if not args.name or args.name not in qs:
            print(f"unknown query: {args.name!r} (use --list)",
                  file=sys.stderr)
            return 1
        sf_dir = args.sf_dir or os.environ.get(
            "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        for row in qs[args.name](spark, sf_dir).limit(args.limit).collect():
            d = row.asDict(recursive=True)
            for k, v in d.items():
                if isinstance(v, (bytes, bytearray)):
                    d[k] = bytes(v).hex()
            print(json.dumps(d, default=str))
        return 0

    if args.ns is None or args.root is None:
        print("--root and --ns are required for store commands",
              file=sys.stderr)
        return 1

    if args.cmd.startswith("vecidx-"):
        from pyspark.sql import functions as F

        from rados_timestore_spark.vector_index import VectorIndex

        vi = VectorIndex(spark, args.root)
        if args.cmd == "vecidx-build":
            print(json.dumps(vi.build(
                args.ns, spark.read.parquet(args.parquet), k=args.k,
                trainer=args.trainer, iters=args.iters)))
        elif args.cmd == "vecidx-append":
            print(json.dumps(vi.append(
                args.ns, spark.read.parquet(args.parquet))))
        elif args.cmd == "vecidx-probe":
            ids = [int(a) for a in args.ids.split(",") if a]
            rows = (spark.read.parquet(args.parquet)
                    .filter(F.col("vec_id").isin(ids)).collect())
            qs = [(r.vec_id, list(r.embedding)) for r in rows]
            out = vi.probe(args.ns, qs, topk=args.topk,
                           nprobe=args.nprobe)
            for row in out.collect():
                print(json.dumps(row.asDict()))
        elif args.cmd == "vecidx-delete":
            ids = [int(a) for a in args.ids.split(",") if a]
            print(json.dumps({"removed": vi.delete(args.ns, ids)}))
        elif args.cmd == "vecidx-compact":
            print(json.dumps({"files": vi.compact(args.ns)}))
        elif args.cmd == "vecidx-retrain":
            print(json.dumps(vi.retrain(
                args.ns, k=args.k, trainer=args.trainer,
                iters=args.iters)))
        elif args.cmd == "vecidx-stats":
            print(json.dumps(vi.stats(args.ns)))
        elif args.cmd == "vecidx-maintain":
            print(json.dumps(vi.maintain(args.ns)))
        elif args.cmd == "vecidx-enable-pq":
            print(json.dumps(vi.enable_pq(
                args.ns, m=args.m, ksub=args.ksub,
                residual=args.residual)))
        elif args.cmd == "vecidx-probe-pq":
            ids = [int(a) for a in args.ids.split(",") if a]
            rows = (spark.read.parquet(args.parquet)
                    .filter(F.col("vec_id").isin(ids)).collect())
            qs = [(r.vec_id, list(r.embedding)) for r in rows]
            out = vi.probe_pq(args.ns, qs, topk=args.topk,
                              nprobe=args.nprobe, rerank=args.rerank)
            for row in out.collect():
                print(json.dumps(row.asDict()))
        return 0

    if args.cmd.startswith("hnsw-"):
        import numpy as np
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        from rados_timestore_spark.hnsw import HNSWIndex

        hi = HNSWIndex(spark, args.root)
        if args.cmd == "hnsw-build":
            print(json.dumps(hi.build(
                args.ns, spark.read.parquet(args.parquet),
                shards=args.shards, m=args.m,
                ef_construction=args.ef)))
        elif args.cmd == "hnsw-append":
            print(json.dumps({"appended": hi.append(
                args.ns, spark.read.parquet(args.parquet))}))
        elif args.cmd == "hnsw-delete":
            ids = [int(a) for a in args.ids.split(",") if a]
            print(json.dumps({"removed": hi.delete(args.ns, ids)}))
        elif args.cmd == "hnsw-compact":
            print(json.dumps({"files": hi.compact(args.ns)}))
        elif args.cmd == "hnsw-reshard":
            print(json.dumps(hi.reshard(args.ns, shards=args.shards)))
        elif args.cmd == "hnsw-stats":
            print(json.dumps(hi.stats(args.ns)))
        elif args.cmd == "hnsw-maintain":
            print(json.dumps(hi.maintain(args.ns)))
        elif args.cmd == "hnsw-probe":
            ids = [int(a) for a in args.ids.split(",") if a]
            emb = spark.read.parquet(args.parquet)
            rows = emb.filter(F.col("vec_id").isin(ids)).collect()
            qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
                  for r in rows]
            cand = hi.probe_candidates(
                args.ns, qs, k=max(args.topk, 16), ef_search=args.ef)
            qdf = (emb.filter(F.col("vec_id").isin(ids))
                   .select(F.col("vec_id").alias("query_id"),
                           F.col("embedding").alias("qe")))
            from rados_timestore_spark.queries_similarity import _cos_seq

            scored = (
                cand.join(emb.select(
                    F.col("vec_id").alias("neighbor_id"), "embedding"),
                    "neighbor_id")
                .join(F.broadcast(qdf), "query_id")
                .select("query_id", "neighbor_id",
                        _cos_seq(F.col("embedding"),
                                 F.col("qe")).alias("cos"))
            )
            w = Window.partitionBy("query_id").orderBy(
                F.desc("cos"), "neighbor_id")
            out = (scored.withColumn("rank", F.row_number().over(w))
                   .filter(F.col("rank") <= args.topk))
            for row in out.collect():
                print(json.dumps(row.asDict()))
        return 0

    store = TimeStore(spark, args.root)

    if args.cmd == "register":
        if store.is_registered(args.ns):
            print(f"namespace {args.ns} already registered")
            return 1
        store.register_namespace(args.ns, buckets=args.buckets,
                                 extended_buckets=args.extended_buckets)
        kinds = (f"{args.buckets} buckets"
                 if args.extended_buckets is None else
                 f"{args.buckets} simple / {args.extended_buckets} "
                 f"extended buckets")
        print(f"registered {args.ns} ({kinds})")
    elif args.cmd == "latest":
        simple, extended = store.latest(args.ns)
        print(json.dumps({"simple": simple, "extended": extended}))
    elif args.cmd == "read":
        addrs = [int(a) for a in args.addresses.split(",") if a]
        df = (store.read_extended if args.extended else store.read_simple)(
            args.ns, args.start, args.end, addrs
        )
        for row in df.limit(args.limit).collect():
            d = row.asDict()
            if isinstance(d.get("payload"), (bytes, bytearray)):
                d["payload"] = bytes(d["payload"]).hex()
            print(json.dumps(d))
    elif args.cmd == "write":
        store.write_points(args.ns, spark.read.parquet(args.parquet))
        print("ok")
    elif args.cmd == "backfill":
        from pyspark.sql import functions as F

        df = spark.read.parquet(args.parquet).withColumn(
            "__batch", F.expr(f"time div {args.batch_us}")
        )
        store.write_points_batched(
            args.ns, df, "__batch", rollover_rows=args.rollover_rows
        )
        print(json.dumps({"epochs": len(store.index(args.ns).entries)}))
    elif args.cmd == "rescale":
        store.rescale(args.ns, args.buckets)
        print(json.dumps({"index": store.index(args.ns).to_json()}))
    elif args.cmd == "compact":
        store.compact(args.ns)
        print("ok")
    elif args.cmd == "gc":
        print(json.dumps(store.gc(args.ns)))
    elif args.cmd == "stats":
        print(json.dumps(store.stats(args.ns)))
    elif args.cmd == "maintain":
        print(json.dumps(store.maintain(args.ns)))
    elif args.cmd == "verify":
        report = store.verify(args.ns)
        print(json.dumps(report))
        return 0 if report["ok"] else 3
    elif args.cmd == "expire":
        print(json.dumps(store.expire(args.ns, args.older_than_us)))
    return 0


if __name__ == "__main__":
    sys.exit(main())
