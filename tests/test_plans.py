"""Physical-plan regression tests — PLANS.md's manual `.explain`
audit, automated.

PLANS.md records the plans we WANT at 100 TB (partition pruning on the
store read path, parquet predicate pushdown, column pruning, codegen'd
single-shuffle dedup, no Cartesian products).  A refactor can silently
lose any of them while every value-level oracle stays green — these
tests pin the load-bearing plan properties so the regression fails
loudly instead of shipping as a 100x scan at scale.

String-matching explain output is inherently version-coupled; every
assertion targets a stable Spark plan vocabulary token
(``PartitionFilters``, ``PushedFilters``, ``CartesianProduct``,
``HashAggregate``) rather than full plan shapes.
"""

import pyspark.sql.functions as F
import pytest

from rados_timestore_spark.queries_common import event_us
from tests.conftest import SF_DIR


def plan_str(df, mode: str = "formatted") -> str:
    jvm = df.sparkSession._jvm
    return df._jdf.queryExecution().explainString(
        jvm.org.apache.spark.sql.execution.ExplainMode.fromString(mode)
    )


@pytest.fixture(scope="module")
def filled_store(spark, tmp_path_factory):
    from rados_timestore_spark.store import TimeStore

    store = TimeStore(
        spark, str(tmp_path_factory.mktemp("plans") / "warehouse")
    )
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet")
    pts = ev.select(
        (F.col("user_id") * 2).alias("address"),
        event_us(ev).alias("time"),
        F.col("event_id").alias("value"),
        F.col("event_id").alias("seq"),
    )
    store.register_namespace("p", buckets=16)
    store.write_points("p", pts)
    return store


def test_store_read_prunes_partitions_and_pushes_predicates(filled_store):
    # PLANS.md "Store read path": the (epoch, bucket) directory
    # predicates from _scan must be PartitionFilters (the targetObjs
    # analog — unmatched dirs never listed) and the address/time
    # predicates must reach the parquet row-group stats.
    t0, t1 = 1704067200000000, 1704326400000000
    df = filled_store.read_simple("p", t0, t1, [2, 4, 26])
    plan = plan_str(df)
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters", 1)[1][:400]
    assert "bucket" in part and "epoch" in part, part
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:400]
    assert "address" in pushed, pushed
    assert "GreaterThanOrEqual(time" in pushed, pushed
    assert "LessThanOrEqual(time" in pushed, pushed


def test_store_dedup_is_single_codegen_hash_aggregate(filled_store):
    # PLANS.md: first-wins dedup = scalar min_by HashAggregate (one
    # shuffle, map-side partial agg, whole-stage codegen) — a struct
    # payload or sort-based rewrite demotes it to SortAggregate.
    df = filled_store.read_simple("p", 0, 1 << 62, [2, 4])
    plan = plan_str(df)
    assert "HashAggregate" in plan
    assert "min_by" in plan
    assert "SortAggregate" not in plan
    # codegen + shuffle count live in the FINAL adaptive plan — the
    # pre-execution AQE plan shows neither (isFinalPlan=false)
    df.collect()
    # executedPlan prints "== Final Plan ==" then "== Initial Plan ==";
    # only the final section reflects what ran
    final = (df._jdf.queryExecution().executedPlan().toString()
             .split("== Initial Plan ==", 1)[0])
    # "*(n) Operator" is the whole-stage-codegen marker in plan strings
    assert "*(" in final, final
    # exactly ONE shuffle for the dedup (no extra global sort)
    n_shuffles = final.count("Exchange hashpartitioning")
    assert n_shuffles == 1, final


def test_documents_scan_prunes_unused_columns(spark):
    # Column pruning: dedup_exact needs doc_id+text only; lang/
    # source/n_chars must not reach the parquet ReadSchema (a scan
    # reading all columns for a 2-column projection is wrong at
    # 100 TB).
    from rados_timestore_spark import registry

    df = registry.queries()["dedup_exact"](spark, SF_DIR)
    plan = plan_str(df)
    read = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "text" in read, read
    for unused in ("lang", "source", "n_chars"):
        assert unused not in read, (unused, read)


def test_tpch_q1_pushes_shipdate_filter(spark):
    from rados_timestore_spark import registry

    df = registry.queries()["tpch_q1_pricing_summary"](spark, SF_DIR)
    plan = plan_str(df)
    assert "PushedFilters" in plan
    pushed = plan.split("PushedFilters", 1)[1][:300]
    assert "l_shipdate" in pushed, pushed
    # and the scan does not drag the wide comment column along
    read = plan.split("ReadSchema", 1)[1].splitlines()[0]
    assert "l_comment" not in read, read


def test_partitioned_source_scan_prunes(spark, tmp_path):
    # src_partitioned_roundtrip's claim: a day-range predicate on a
    # hive-partitioned dataset resolves against directory names
    # (PartitionFilters), so a 3-day query on a year of ingest lists 3
    # directories — it must never appear as a post-scan data filter.
    df = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 10).alias("day")
    )
    path = str(tmp_path / "part")
    df.write.partitionBy("day").parquet(path)
    back = spark.read.parquet(path).filter(F.col("day").between(2, 4))
    plan = plan_str(back)
    part = plan.split("PartitionFilters", 1)[1][:300]
    assert "day" in part, part
    # the predicate must be FULLY absorbed by pruning: no data-side
    # filter on day (a pure partition predicate produces no
    # PushedFilters line at all)
    if "PushedFilters" in plan:
        pushed = plan.split("PushedFilters", 1)[1][:200]
        assert "day" not in pushed, pushed


def test_no_cartesian_product_in_any_bench_plan(spark):
    # Every crossJoin in the repo broadcasts a bounded side
    # (BroadcastNestedLoopJoin); an unconstrained CartesianProduct in
    # a headline query would be a quadratic shuffle at scale.  Build
    # (don't run) every bench plan and sweep.
    from rados_timestore_spark import registry

    offenders = []
    for name, fn in registry.bench_queries().items():
        df = fn(spark, SF_DIR)
        if "CartesianProduct" in plan_str(df, "simple"):
            offenders.append(name)
    assert offenders == [], offenders


def test_rrf_rank_filters_plan_as_take_ordered(spark):
    # PLANS.md "sim_rrf_fusion": both depth-50 rank lists are built as
    # row_number() over an UNPARTITIONED Window followed by
    # filter(rank <= 50).  The scale-safety of that shape rests
    # entirely on Catalyst's LimitPushDownThroughWindow rewrite
    # (rank-filter -> Sort+Limit BELOW the window), which plans each
    # branch as a distributed TakeOrderedAndProject feeding a
    # single-partition window over only 50 rows.  If a refactor ever
    # consumes the rank in another expression or adds a second window
    # function, the rewrite silently stops firing and the query
    # degrades to a full single-partition sort of every candidate —
    # with every value-level oracle still green (VERDICT r8).  Pin it:
    # three TakeOrderedAndProject nodes (two rank branches + the final
    # top-10) and no full-width Sort left anywhere in the plan.
    from rados_timestore_spark.queries_similarity import sim_rrf_fusion

    plan = plan_str(sim_rrf_fusion(spark, SF_DIR))
    import re

    takes = re.findall(r"\(\d+\) TakeOrderedAndProject", plan)
    assert len(takes) == 3, f"expected 3 TakeOrderedAndProject: {takes}"
    windows = re.findall(r"\(\d+\) Window\b", plan)
    assert len(windows) == 2, f"expected 2 Window nodes: {windows}"
    # (the plan's only Sort nodes belong to the <=100-row fusion
    # SortMergeJoin, which is bounded; the degradation signature is a
    # TakeOrderedAndProject count of 1 — the final top-10 only — with
    # the candidate scans sorted whole under each Window instead)


def test_vector_index_probe_prunes_bucket_partitions(spark, tmp_path):
    # PLANS.md "sim_vecidx_probe": the persisted-index probe must read
    # ONLY the probed bucket directories — the literal bucket IN (...)
    # predicate resolves to PartitionFilters on the hive-partitioned
    # assignment table (the whole point of persisting the routing:
    # probe cost ~nprobe/k of the corpus, not a full scan).
    from rados_timestore_spark.vector_index import VectorIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vi = VectorIndex(spark, str(tmp_path / "idx"))
    vi.build("e", emb, k=32)
    rows = emb.filter(F.col("vec_id") < 2).collect()
    df = vi.probe("e", [(r.vec_id, list(r.embedding)) for r in rows],
                  topk=3, nprobe=2)
    plan = plan_str(df)
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters", 1)[1][:200]
    assert "bucket" in part and " IN " in part, part


def test_vector_index_probe_df_uses_dynamic_partition_pruning(
        spark, tmp_path):
    # probe_df keeps queries distributed, so the bucket predicate is
    # only known at runtime — the scan must carry a DPP expression on
    # the partition column (unprobed bucket directories skipped at
    # execution), the distributed analog of probe()'s literal IN.
    from rados_timestore_spark.vector_index import VectorIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vi = VectorIndex(spark, str(tmp_path / "idxdf"))
    vi.build("e", emb, k=32)
    qdf = emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"),
    )
    plan = plan_str(vi.probe_df("e", qdf, topk=3, nprobe=2))
    part = plan.split("PartitionFilters", 1)[1][:300]
    assert "dynamicpruning" in part, part


def test_vector_index_probe_pq_prunes_and_projects_codes_only(
        spark, tmp_path):
    # PLANS.md "sim_vecidxpq_probe": the ADC probe must (a) keep the
    # literal bucket IN (...) PartitionFilters of the plain probe and
    # (b) read ONLY (vec_id, pq_code) from the bucket files — the raw
    # embedding column absent from the scan's ReadSchema is the
    # parquet column projection that delivers the PQ bandwidth win
    # (m*2 B instead of dim*4 B per vector).
    from rados_timestore_spark.vector_index import VectorIndex

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    vi = VectorIndex(spark, str(tmp_path / "idxpq"))
    vi.build("e", emb, k=32)
    vi.enable_pq("e", m=4, ksub=16)
    rows = emb.filter(F.col("vec_id") < 2).collect()
    df = vi.probe_pq("e", [(r.vec_id, list(r.embedding))
                           for r in rows], topk=3, nprobe=2)
    plan = plan_str(df)
    assert "PartitionFilters" in plan
    part = plan.split("PartitionFilters", 1)[1][:200]
    assert "bucket" in part and " IN " in part, part
    scan = plan.split("ReadSchema", 1)[1][:300]
    assert "pq_code" in scan and "embedding" not in scan, scan


def test_smoothers_plan_one_window_one_exchange(spark):
    # PLANS.md "Closing-r9 batch": both exact smoothers must stay ONE
    # Window operator over ONE Exchange — 16 lag expressions fusing
    # into a single ordered pass is the whole cost model of
    # ts_ewma_smooth, and a refactor that splits the window spec (or
    # adds a second sort) would silently double the shuffle.
    from rados_timestore_spark.queries_timeseries import (
        ts_ewma_smooth, ts_rolling_median,
    )

    for q in (ts_ewma_smooth, ts_rolling_median):
        p = plan_str(q(spark, SF_DIR))
        assert p.count("Window") >= 1
        # one Window operator: the formatted plan numbers operators,
        # count the "Window" node headers
        import re

        windows = re.findall(r"\(\d+\) Window", p)
        exchanges = re.findall(r"\(\d+\) Exchange", p)
        assert len(windows) == 1, (q.__name__, p[:800])
        assert len(exchanges) == 1, (q.__name__, p[:800])


def test_hnsw_plans_are_bounded_no_cartesian(spark):
    # The HNSW family: candidates come from mapInPandas /
    # FlatMapCoGroupsInPandas (shard-local graph walks), and the exact
    # rerank joins a BOUNDED candidate set against broadcast queries —
    # no CartesianProduct may appear at any stage.
    from rados_timestore_spark.queries_similarity import (
        sim_hnsw_ann, sim_hnswidx_probe,
    )

    p1 = plan_str(sim_hnsw_ann(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p1
    p2 = plan_str(sim_hnswidx_probe(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p2
    # the persisted probe serves from cogrouped per-shard scans, never
    # a rebuild (no shuffling of the whole corpus back through a
    # repartition-for-build)
    assert "FlatMapCoGroupsInPandas" in p2
    # r12 additions keep the same contract: the frame-path probe's
    # query replication is a BroadcastNestedLoopJoin against the
    # bounded shard-id list (never a CartesianProduct of data), and
    # the filtered probe is the plain probe + a bounded semi-join
    from rados_timestore_spark.queries_similarity import (
        sim_hnswidx_filtered_probe, sim_hnswidx_probe_df,
    )

    p3 = plan_str(sim_hnswidx_probe_df(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p3
    assert "FlatMapCoGroupsInPandas" in p3
    p4 = plan_str(sim_hnswidx_filtered_probe(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p4
    assert "FlatMapCoGroupsInPandas" in p4  # cogrouped scan, no rebuild


def test_bpe_encode_plan_is_one_corpus_scan(spark):
    # The trainer loop runs over the word-frequency relation; the
    # corpus-scale work is exactly ONE word-count aggregate.  The
    # final plan must contain no CartesianProduct and no join at all —
    # merges are baked in as literal replace() chains.
    from rados_timestore_spark.queries_text import text_bpe_encode

    p = plan_str(text_bpe_encode(spark, SF_DIR), "simple")
    assert "CartesianProduct" not in p
    assert "Join" not in p


def test_rewrite_shape_scales_with_layout_columns(spark):
    # PLANS.md r11 "generation-rewrite parallelism": the rewrite
    # exchange (compact / vacuum / merge_into / expire all ride
    # _rewrite_generation) must hash-partition by the LAYOUT COLUMNS
    # so task count scales with the cluster.  A regression to
    # repartition(1, ...) — the r2-r10 shape, one task rewriting the
    # whole namespace — shows up as SinglePartition or a
    # RoundRobinPartitioning(1)/hashpartitioning(..., 1) exchange.
    from rados_timestore_spark.store import shape_rewrite

    df = (
        spark.range(0, 1000)
        .select(
            (F.col("id") % 7).alias("epoch"),
            (F.col("id") % 16).alias("bucket"),
            (F.col("id") * 2).alias("address"),
            F.col("id").alias("time"),
            F.col("id").alias("value"),
            F.col("id").alias("seq"),
        )
    )
    p = plan_str(shape_rewrite(df, ("epoch", "bucket")))
    assert "SinglePartition" not in p, p[:800]
    assert "RoundRobinPartitioning" not in p, p[:800]
    hp = p.split("hashpartitioning", 1)
    assert len(hp) == 2, p[:800]
    keys = hp[1][:200]
    assert "epoch" in keys and "bucket" in keys, keys
    # salted variant: the address-derived salt joins the hash keys
    # (a bucket may split into target files) and is dropped from the
    # output schema
    salted = shape_rewrite(df, ("epoch", "bucket"),
                           target_partitions_per_bucket=4)
    ps = plan_str(salted)
    assert "__file" in ps.split("hashpartitioning", 1)[1][:300], ps[:800]
    assert "__file" not in salted.columns


def test_kv_chain_stats_plan_one_shuffle_no_python(spark, tmp_path):
    # late-r14: the KV stats aggregate must stay JVM-side (no
    # Arrow/Python fold — that's vacuum's job), join-free, and
    # hash-partitioned by the chain key so the corpus-scale work is
    # ONE shuffle with map-side partials; the global reduce above it
    # is a single-row SinglePartition exchange, which is expected.
    from rados_timestore_spark.mutable import MutableKV
    from rados_timestore_spark.store import TimeStore

    store = TimeStore(spark, str(tmp_path / "wh"))
    store.register_namespace("K", buckets=4)
    kv = MutableKV(store, "K")
    kv.insert(0, b"a")
    kv.insert(0, b"b")
    p = plan_str(kv._chain_stats_df(store._points_dir(kv.ns)))
    assert "CartesianProduct" not in p
    assert "Join" not in p
    assert "InMemoryTableScan" not in p
    assert "ArrowEvalPython" not in p and "BatchEvalPython" not in p
    hp = p.split("hashpartitioning", 1)
    assert len(hp) == 2, p[:800]
    assert "address" in hp[1][:120], hp[1][:120]
