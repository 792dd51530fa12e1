"""Sharded-HNSW laws (rados_timestore_spark/hnsw.py; Malkov &
Yashunin 2018): deterministic builds, shard-graph recall floors, and
the VERDICT r9 #3 law — HNSW recall >= IVF recall on the same
queries."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rados_timestore_spark.hnsw import _ShardGraph, shard_candidates

SF = "/root/testdata/sf0.001"


def _brute_top5(vecs, ids, q):
    V = vecs / np.linalg.norm(vecs, axis=1)[:, None]
    qn = q / np.linalg.norm(q)
    sims = V @ qn
    order = np.lexsort((ids, -sims))
    return [int(i) for i in ids[order[:5]]]


def test_shard_graph_is_deterministic_and_connected():
    rng = np.random.RandomState(11)
    vecs = rng.randn(400, 64)
    ids = np.arange(400, dtype=np.int64) * 2 + 7
    a = _ShardGraph(ids, vecs, m=8, ef_construction=64)
    b = _ShardGraph(ids.copy(), vecs.copy(), m=8, ef_construction=64)
    for s in range(5):
        q = np.random.RandomState(100 + s).randn(64)
        assert a.search(q, 10, ef=64) == b.search(q, 10, ef=64)
    # layer-0 graph reaches every node (no orphan: each inserted node
    # keeps at least one edge unless it is the very first)
    deg0 = {n: len(v) for n, v in a.adj[0].items()}
    assert len(deg0) == 400
    assert min(deg0[n] for n in deg0 if n != 0) >= 1
    # degree bound: Mmax0 == 2 * M
    assert max(deg0.values()) <= 16


def test_shard_graph_beam_recall_floor():
    rng = np.random.RandomState(13)
    vecs = rng.randn(600, 64)
    ids = np.arange(600, dtype=np.int64)
    g = _ShardGraph(ids, vecs, m=8, ef_construction=128)
    hits = total = 0
    for s in range(20):
        q = np.random.RandomState(200 + s).randn(64)
        true = set(_brute_top5(vecs, ids, q))
        got = set(g.search(q, 5, ef=128))
        hits += len(true & got)
        total += 5
    assert hits / total >= 0.95  # gaussian data, the hard case


def test_shard_candidates_cover_global_top5(spark):
    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    rows = emb.filter(F.col("vec_id") < 5).collect()
    queries = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
               for r in rows]
    cand = shard_candidates(emb, queries, shards=8, k=16,
                            ef_construction=128, ef_search=128)
    got = {(r.query_id, r.neighbor_id) for r in cand.collect()}
    all_ids = emb.select("vec_id", "embedding").collect()
    ids = np.array([r.vec_id for r in all_ids], dtype=np.int64)
    vecs = np.stack([np.asarray(r.embedding, dtype=np.float64)
                     for r in all_ids])
    for qid, qv in queries:
        mask = ids != qid
        true = _brute_top5(vecs[mask], ids[mask], qv)
        missing = [n for n in true if (qid, n) not in got]
        assert not missing, (qid, missing)


def test_hnsw_recall_at_least_ivf(spark):
    # VERDICT r9 #3's law: the graph index must not sit below the
    # cluster index on the recall curve for the standard query set.
    from rados_timestore_spark.queries_similarity import (
        sim_hnsw_recall, sim_ivf_recall,
    )

    hnsw = {r.query_id: r.n_hit for r in sim_hnsw_recall(spark, SF).collect()}
    ivf = {r.query_id: r.n_hit for r in sim_ivf_recall(spark, SF).collect()}
    assert set(hnsw) == set(ivf) == {0, 1, 2, 3, 4}
    assert sum(hnsw.values()) >= sum(ivf.values())
    assert sum(hnsw.values()) == 25  # the equality contract: 5/5 each


def test_hnswidx_build_probe_and_reconstruction(spark, tmp_path):
    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vi = HNSWIndex(spark, str(tmp_path / "hx"))
    doc = vi.build("e", emb, shards=4, m=8, ef_construction=128)
    assert doc["n_vectors"] == emb.count()
    rows = emb.filter(F.col("vec_id") < 3).collect()
    queries = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
               for r in rows]
    cand = {(r.query_id, r.neighbor_id)
            for r in vi.probe_candidates(
                "e", queries, k=16, ef_search=128).collect()}
    # candidates cover the global exact top-5 for every query
    allr = emb.collect()
    ids = np.array([r.vec_id for r in allr], dtype=np.int64)
    vecs = np.stack([np.asarray(r.embedding, dtype=np.float64)
                     for r in allr])
    for qid, qv in queries:
        mask = ids != qid
        for n in _brute_top5(vecs[mask], ids[mask], qv):
            assert (qid, n) in cand, (qid, n)
    # probes are deterministic across reconstructions
    again = {(r.query_id, r.neighbor_id)
             for r in vi.probe_candidates(
                 "e", queries, k=16, ef_search=128).collect()}
    assert again == cand


def test_hnswidx_append_preserves_untouched_shards_and_exactness(
        spark, tmp_path):
    import glob
    import os

    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vi = HNSWIndex(spark, str(tmp_path / "hx"))
    vi.build("e", emb.filter(F.col("vec_id") % 2 == 0),
             shards=4, m=8, ef_construction=128)
    # append only vectors routed to a subset of shards: pick odd ids
    # in shard 0 under the persisted routing
    odd = emb.filter(F.col("vec_id") % 2 == 1).withColumn(
        "shard", F.pmod(F.hash("vec_id"), F.lit(4)))
    batch = odd.filter(F.col("shard") == 0).drop("shard")
    n_batch = batch.count()
    assert n_batch > 0
    untouched = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{vi._graph_dir('e')}/shard=*/part-*")
        if "/shard=0/" not in p
    }
    assert vi.append("e", batch) == n_batch
    for p, mtime in untouched.items():
        assert os.path.getmtime(p) == mtime, p
    assert vi.meta("e")["n_vectors"] == \
        emb.filter(F.col("vec_id") % 2 == 0).count() + n_batch
    # appended vectors are probe-visible: global exact top-5 over the
    # indexed subset must come back
    indexed = emb.filter(
        (F.col("vec_id") % 2 == 0)
        | (F.pmod(F.hash("vec_id"), F.lit(4)) == 0))
    rows = emb.filter(F.col("vec_id") < 3).collect()
    queries = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
               for r in rows]
    cand = {(r.query_id, r.neighbor_id)
            for r in vi.probe_candidates(
                "e", queries, k=16, ef_search=128).collect()}
    allr = indexed.collect()
    ids = np.array([r.vec_id for r in allr], dtype=np.int64)
    vecs = np.stack([np.asarray(r.embedding, dtype=np.float64)
                     for r in allr])
    for qid, qv in queries:
        mask = ids != qid
        for n in _brute_top5(vecs[mask], ids[mask], qv):
            assert (qid, n) in cand, (qid, n)


def test_hnswidx_delete_equals_build_of_survivors(spark, tmp_path):
    # The exact law: shard graphs are pure functions of shard content,
    # so delete(A, V) == build(A \ V) byte-for-byte (adjacency rows),
    # and untouched shards' files never move.
    import glob
    import os

    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = HNSWIndex(spark, str(tmp_path / "a"))
    a.build("e", emb, shards=4, m=8, ef_construction=64)
    # victims: every vec_id % 7 == 3, delivered as a DataFrame
    victims = emb.filter(F.col("vec_id") % 7 == 3).select("vec_id")
    n_victims = victims.count()
    victim_shards = {
        r.shard for r in emb.filter(F.col("vec_id") % 7 == 3)
        .select(F.pmod(F.hash("vec_id"), F.lit(4)).alias("shard"))
        .distinct().collect()
    }
    untouched = {
        p: os.path.getmtime(p)
        for p in glob.glob(f"{a._graph_dir('e')}/shard=*/part-*")
        if int(p.split("shard=")[1].split("/")[0]) not in victim_shards
    }
    assert a.delete("e", victims) == n_victims
    for p, mtime in untouched.items():
        assert os.path.getmtime(p) == mtime, p

    b = HNSWIndex(spark, str(tmp_path / "b"))
    b.build("e", emb.filter(F.col("vec_id") % 7 != 3),
            shards=4, m=8, ef_construction=64)
    cols = ["shard", "vec_id", "level", "layer", "neighbors"]

    def rows(vi):
        return sorted(
            (int(r.shard), r.vec_id, r.level, r.layer, tuple(r.neighbors))
            for r in spark.read.parquet(vi._graph_dir("e"))
            .select(*cols).collect()
        )

    assert rows(a) == rows(b)
    assert a.meta("e")["n_vectors"] == b.meta("e")["n_vectors"]
    # deleting absent ids is a no-op
    assert a.delete("e", [10 ** 9]) == 0
    # victims never come back from a probe
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    got = a.probe_candidates("e", qs, k=16, ef_search=64)
    assert got.join(
        victims.withColumnRenamed("vec_id", "neighbor_id"),
        "neighbor_id").count() == 0


def test_hnswidx_compact_preserves_probes(spark, tmp_path):
    import glob

    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vi = HNSWIndex(spark, str(tmp_path / "hx"))
    vi.build("e", emb.filter(F.col("vec_id") % 3 == 0),
             shards=4, m=8, ef_construction=64)
    vi.append("e", emb.filter(F.col("vec_id") % 3 == 1))
    vi.append("e", emb.filter(F.col("vec_id") % 3 == 2))
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    before = {(r.query_id, r.neighbor_id) for r in
              vi.probe_candidates("e", qs, k=16, ef_search=64).collect()}
    n_before = len(glob.glob(f"{vi._vectors_dir('e')}/shard=*/part-*"))
    assert vi.compact("e") == n_before
    n_after = len(glob.glob(f"{vi._vectors_dir('e')}/shard=*/part-*"))
    assert n_after <= 4 < n_before
    after = {(r.query_id, r.neighbor_id) for r in
             vi.probe_candidates("e", qs, k=16, ef_search=64).collect()}
    assert after == before
    assert spark.read.parquet(vi._vectors_dir("e")).count() == emb.count()


def test_shard_graph_entry_canonical_after_low_id_append():
    # ADVICE r10: an append landing a LOWER id at the existing top
    # layer must move the live entry to it — _from_rows re-derives the
    # entry as the lowest id at the top layer, so live and
    # reconstructed graphs must agree or a same-session probe differs
    # from every later one.  ids picked so _levels(233)==3 ==
    # max(_levels(1000..1399)) — the exact flagged case.
    from rados_timestore_spark.hnsw import HNSWIndex, _levels

    rng = np.random.RandomState(17)
    base_ids = np.arange(1000, 1400, dtype=np.int64)
    assert int(_levels(np.array([233], dtype=np.int64), 8)[0]) \
        == int(_levels(base_ids, 8).max()) == 3
    g = _ShardGraph(base_ids, rng.randn(400, 32), m=8,
                    ef_construction=64)
    g._append_node(233, rng.randn(32))
    assert int(g.ids[g.entry]) == 233
    import pandas as pd

    rows = HNSWIndex._graph_rows(g, 0)
    all_ids = np.append(base_ids, np.int64(233))
    vec_by_id = {int(i): g.vecs[k] for k, i in enumerate(g.ids)}
    vpdf = pd.DataFrame({
        "vec_id": sorted(vec_by_id),
        "embedding": [vec_by_id[i] for i in sorted(vec_by_id)],
    })
    assert set(vpdf["vec_id"]) == set(int(i) for i in all_ids)
    r = HNSWIndex._from_rows(rows, vpdf, 8, 64)
    assert int(r.ids[r.entry]) == 233
    # live and reconstructed probes agree exactly
    for s in range(5):
        q = np.random.RandomState(300 + s).randn(32)
        assert g.search(q, 10, ef=64) == r.search(q, 10, ef=64)


def test_hnswidx_swap_crash_window_restores_lost_shard(spark, tmp_path):
    # ADVICE r10 (medium): a crash BETWEEN the two shard-swap renames
    # leaves no live shard=S; the next verb (or probe) must restore
    # the .old remnant instead of silently rebuilding the shard from
    # only the next batch's vectors.
    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in emb.filter(F.col("vec_id") < 3).collect()]

    def probe(ix):
        return {(r.query_id, r.neighbor_id) for r in
                ix.probe_candidates("e", qs, k=16,
                                    ef_search=128).collect()}

    crashed = HNSWIndex(spark, str(tmp_path / "hcw"))
    crashed.build("e", a, shards=4, m=8, ef_construction=128)
    pre = probe(crashed)
    # simulate the window: rename1 done (live -> .old), rename2 lost
    gdir = crashed._graph_dir("e")
    import os
    shard = sorted(os.listdir(gdir))[0]
    assert os.rename(f"{gdir}/{shard}", f"{gdir}/{shard}.old") is None
    # probes see the restored pre-crash state, not a vanished shard
    assert probe(crashed) == pre
    # a replayed batch then runs against the restored state and
    # converges to the same index an uncrashed run produces
    crashed.append_batch("e", b, 0)
    ref = HNSWIndex(spark, str(tmp_path / "href"))
    ref.build("e", a, shards=4, m=8, ef_construction=128)
    ref.append_batch("e", b, 0)
    assert probe(crashed) == probe(ref)
    assert crashed.meta("e")["n_vectors"] == a.count() + b.count()


def test_hnswidx_append_batch_cross_batch_redelivery(spark, tmp_path):
    # ADVICE r10 (low): a vec_id redelivered under a DIFFERENT batch
    # id must neither inflate n_vectors nor duplicate its vector row.
    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    c = emb.filter(F.col("vec_id") % 3 == 2)

    hi = HNSWIndex(spark, str(tmp_path / "hrd"))
    hi.build("e", a, shards=4, m=8, ef_construction=128)
    hi.append_batch("e", b, 0)
    # batch 1 redelivers ALL of b alongside the genuinely-new c
    hi.append_batch("e", b.unionByName(c), 1)
    assert hi.meta("e")["n_vectors"] == emb.count()
    vec = spark.read.parquet(hi._vectors_dir("e"))
    assert vec.count() == emb.count()
    assert vec.select("vec_id").distinct().count() == emb.count()
    # and the index equals the no-redelivery reference
    ref = HNSWIndex(spark, str(tmp_path / "hrdref"))
    ref.build("e", a, shards=4, m=8, ef_construction=128)
    ref.append_batch("e", b, 0)
    ref.append_batch("e", c, 1)
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    got = {(r.query_id, r.neighbor_id) for r in
           hi.probe_candidates("e", qs, k=16, ef_search=128).collect()}
    want = {(r.query_id, r.neighbor_id) for r in
            ref.probe_candidates("e", qs, k=16, ef_search=128).collect()}
    assert got == want


def test_hnswidx_delete_crash_before_meta_write_recounts(spark, tmp_path):
    # Crash-fuzz finding (r11, mirrored from VectorIndex): a kill
    # between delete()'s last shard swap and its meta write leaves
    # files final but n_vectors stale; the replayed delete finds no
    # victims and must heal the meta instead of returning early.
    import shutil

    from rados_timestore_spark.fsutil import SimulatedCrash
    from rados_timestore_spark.hnsw import HNSWIndex
    from tests.crash_fuzz_harness import CountdownFS

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 200)
    victims = [r.vec_id for r in
               emb.filter(F.col("vec_id") % 10 == 4)
               .select("vec_id").collect()]
    tmpl = str(tmp_path / "tmpl")
    HNSWIndex(spark, tmpl).build("e", emb, shards=2, m=8,
                                 ef_construction=64)

    dry_root = str(tmp_path / "dry")
    shutil.copytree(tmpl, dry_root)
    dry = HNSWIndex(spark, dry_root)
    dry.fs = CountdownFS(dry.fs)
    dry.delete("e", victims)
    total = dry.fs.ops
    want = dry.meta("e")["n_vectors"]
    assert want == emb.count() - len(victims)

    work = str(tmp_path / "crash")
    shutil.copytree(tmpl, work)
    ix = HNSWIndex(spark, work)
    # the last TWO counted mutations are the meta write and the CAS
    # flip lock's release delete (r13, _commit_meta) — kill just
    # before the meta write itself
    ix.fs = CountdownFS(ix.fs, fuel=total - 2)
    with pytest.raises(SimulatedCrash):
        ix.delete("e", victims)
    # the kill lands inside the CAS commit window, leaving the flip
    # lock held — sweep it like the crash runbook's accelerated
    # stale-break (see crash_fuzz_harness.recover_and_replay)
    import glob
    import os

    for lk in glob.glob(f"{work}/**/*.lock", recursive=True):
        os.remove(lk)
    cold = HNSWIndex(spark, work)
    assert cold.delete("e", victims) == 0
    assert cold.meta("e")["n_vectors"] == want


def test_hnswidx_compact_crash_window_restores_whole_dir(spark, tmp_path):
    # Crash-fuzz finding (r11): a kill between compact()'s two
    # whole-dir renames leaves no live vectors dir; every verb and
    # probe entry (not just compact's) must roll the swap back.
    import os

    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 200)
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    ix = HNSWIndex(spark, str(tmp_path / "cc"))
    ix.build("e", emb, shards=2, m=8, ef_construction=64)
    pre = {(r.query_id, r.neighbor_id) for r in
           ix.probe_candidates("e", qs, k=10, ef_search=64).collect()}
    vdir = ix._vectors_dir("e")
    os.rename(vdir, f"{vdir}.old")   # the between-renames window
    # probe (not compact) must restore and serve the pre-crash state
    assert {(r.query_id, r.neighbor_id) for r in
            ix.probe_candidates("e", qs, k=10,
                                ef_search=64).collect()} == pre
    assert os.path.isdir(vdir)
    # stale remnant BESIDE a live dir (crash after the second
    # rename): swept at the next verb entry
    os.makedirs(f"{vdir}.old")
    assert ix.delete("e", [999999999]) == 0
    assert not os.path.exists(f"{vdir}.old")


def test_hnswidx_probe_df_equals_probe_candidates_rerank(spark, tmp_path):
    # r12: probe_df (unbounded query FRAME, cogrouped per-shard beams
    # + distributed exact rerank) must return exactly what the
    # driver-list path returns after the same rerank — same beams,
    # same cosine, same tie rule.
    from pyspark.sql import Window

    from rados_timestore_spark.hnsw import HNSWIndex
    from rados_timestore_spark.queries_similarity import _cos_seq

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vi = HNSWIndex(spark, str(tmp_path / "pdf"))
    vi.build("e", emb, shards=4, m=8, ef_construction=128)

    qdf = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"))
    got = {(r.query_id, r.rank): (r.neighbor_id, round(r.cos, 9))
           for r in vi.probe_df("e", qdf, topk=5, k=16,
                                ef_search=128).collect()}

    # reference: the driver-list candidates + the same exact rerank
    rows = qdf.collect()
    queries = [(r.query_id, np.asarray(r.qe, dtype=np.float64))
               for r in rows]
    cand = vi.probe_candidates("e", queries, k=16, ef_search=128)
    hits = (cand.join(emb.select(F.col("vec_id").alias("neighbor_id"),
                                 "embedding"), "neighbor_id")
            .join(F.broadcast(qdf), "query_id")
            .select("query_id", "neighbor_id",
                    _cos_seq(F.col("embedding"), F.col("qe")).alias("cos")))
    w = Window.partitionBy("query_id").orderBy(F.desc("cos"), "neighbor_id")
    want = {(r.query_id, r.rank): (r.neighbor_id, round(r.cos, 9))
            for r in hits.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= 5).collect()}
    assert got == want and len(got) == 4 * 5

    # empty-index lifecycle: probe_df over a fully-deleted index is
    # empty, not an exception (the shared empty-dir guard)
    vi.delete("e", emb.select("vec_id"))
    assert vi.probe_df("e", qdf).count() == 0


def test_probe_df_tolerates_duplicate_vector_rows(spark, tmp_path):
    # r12 review finding: crash-replay windows can leave duplicate
    # vec_ids in the vectors dir (probe_candidates' _from_rows dedups
    # first-wins); probe_df's exact rerank must dedup too, or one
    # neighbor takes two top-k ranks and pushes a true one out.
    import glob
    import shutil

    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    vi = HNSWIndex(spark, str(tmp_path / "dup"))
    vi.build("e", emb, shards=4, m=8, ef_construction=128)
    qdf = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"))
    want = {(r.query_id, r.rank): r.neighbor_id
            for r in vi.probe_df("e", qdf, topk=5, k=16,
                                 ef_search=128).collect()}
    # duplicate one shard's vector file under a crashed-batch prefix
    # (byte-identical rows — dedup_ids_deterministic's guarantee)
    shard_dir = sorted(glob.glob(f"{vi._vectors_dir('e')}/shard=*"))[0]
    src = glob.glob(f"{shard_dir}/*.parquet")[0]
    shutil.copy(src, f"{shard_dir}/b99-dup.parquet")
    got = {(r.query_id, r.rank): r.neighbor_id
           for r in vi.probe_df("e", qdf, topk=5, k=16,
                                ef_search=128).collect()}
    assert got == want


# ------------------------------------------------------------ reshard


def test_reshard_equals_fresh_build(spark, tmp_path):
    # r13 law (VERDICT r12 #5): reshard(ns, N) must produce the
    # BYTE-IDENTICAL graph + vector tables a fresh build(shards=N)
    # over the same vectors would — the per-shard graphs are pure
    # functions of (member ids, vectors, m, ef), so the law holds by
    # shared kernel (_graphs_for).  Probes on the resharded index are
    # therefore exactly fresh-build probes.
    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 250)
    vi = HNSWIndex(spark, str(tmp_path / "rs"))
    vi.build("e", emb, shards=2, m=8, ef_construction=64)

    qdf = emb.filter(F.col("vec_id") < 4).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe"))
    before = {(r.query_id, r.rank): r.neighbor_id
              for r in vi.probe_df("e", qdf, topk=5, k=16,
                                   ef_search=128).collect()}

    doc = vi.reshard("e", shards=5)
    assert doc["shards"] == 5
    assert doc["n_vectors"] == emb.count()
    assert doc["version"] == 2

    fresh = HNSWIndex(spark, str(tmp_path / "fb"))
    fresh.build("e", emb, shards=5, m=8, ef_construction=64)

    def graph_rows(ix):
        return sorted(
            (r.shard, r.vec_id, r.level, r.layer, tuple(r.neighbors))
            for r in spark.read.parquet(ix._graph_dir("e")).collect())

    def vec_rows(ix):
        return sorted(
            (r.shard, r.vec_id, tuple(r.embedding))
            for r in spark.read.parquet(ix._vectors_dir("e")).collect())

    assert graph_rows(vi) == graph_rows(fresh)
    assert vec_rows(vi) == vec_rows(fresh)
    for key in ("shards", "m", "ef_construction", "dim", "n_vectors"):
        assert vi.meta("e")[key] == fresh.meta("e")[key]

    # probe equality before/after: the exact rerank saturates recall
    # on this fixture, so the top-k is stable across shardings AND
    # equals the fresh build's
    after = {(r.query_id, r.rank): r.neighbor_id
             for r in vi.probe_df("e", qdf, topk=5, k=16,
                                  ef_search=128).collect()}
    fresh_probe = {(r.query_id, r.rank): r.neighbor_id
                   for r in fresh.probe_df("e", qdf, topk=5, k=16,
                                           ef_search=128).collect()}
    assert after == fresh_probe
    assert after == before

    # no staging/marker remnants survive a clean reshard
    import os

    ns_dir = vi._ns_dir("e")
    assert not os.path.exists(f"{ns_dir}/_reshard.json")
    for base in (vi._graph_dir("e"), vi._vectors_dir("e")):
        assert not os.path.exists(f"{base}.resharding")
        assert not os.path.exists(f"{base}.preshard")


def test_reshard_shrink_and_lifecycle(spark, tmp_path):
    # shrink works too, and the resharded index keeps serving the
    # full verb set (append lands in the NEW layout)
    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 200)
    vi = HNSWIndex(spark, str(tmp_path / "sh"))
    vi.build("e", emb.filter(F.col("vec_id") < 150), shards=6)
    vi.reshard("e", shards=2)
    assert vi.meta("e")["shards"] == 2
    assert vi.append(
        "e", emb.filter(F.col("vec_id").between(150, 199))) == 50
    assert vi.meta("e")["n_vectors"] == 200
    shards_on_disk = {d for d in vi.fs.list_dirs(vi._graph_dir("e"))
                      if d.startswith("shard=")}
    assert shards_on_disk <= {"shard=0", "shard=1"}
    # delete keeps working against the new layout
    assert vi.delete("e", [3, 13]) == 2
    assert vi.meta("e")["n_vectors"] == 198


def test_reshard_empty_index_commits_layout_only(spark, tmp_path):
    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 50)
    vi = HNSWIndex(spark, str(tmp_path / "em"))
    vi.build("e", emb, shards=2)
    vi.delete("e", emb.select("vec_id"))   # delete everything
    assert vi.meta("e")["n_vectors"] == 0
    vi.reshard("e", shards=4)
    assert vi.meta("e")["shards"] == 4
    # the next ingest lands in the new layout
    vi.append_batch("e", emb.filter(F.col("vec_id") < 20), 0)
    assert vi.meta("e")["n_vectors"] == 20


def test_reshard_crash_rolls_forward_at_probe_entry(spark, tmp_path):
    # kill reshard right after its marker write (the commit point):
    # the next PROBE entry must complete the swaps and serve the new
    # layout — never a vanished dir or a mixed sharding
    import shutil

    import numpy as np

    from rados_timestore_spark.fsutil import SimulatedCrash
    from rados_timestore_spark.hnsw import HNSWIndex
    from tests.crash_fuzz_harness import CountdownFS

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 150)
    tmpl = str(tmp_path / "tmpl")
    HNSWIndex(spark, tmpl).build("e", emb, shards=2)

    dry_root = str(tmp_path / "dry")
    shutil.copytree(tmpl, dry_root)
    dry = HNSWIndex(spark, dry_root)
    dry.fs = CountdownFS(dry.fs)
    dry.reshard("e", shards=5)
    total = dry.fs.ops

    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in emb.filter(F.col("vec_id") < 3).collect()]
    want = {(r.query_id, r.neighbor_id) for r in
            dry.probe_candidates("e", qs, k=10, ef_search=64).collect()}

    # sweep every boundary AFTER the marker write (the roll-forward
    # window: two dir swaps + meta commit + marker delete)
    marker_op = None
    for fuel in range(total):
        work = str(tmp_path / f"c{fuel}")
        shutil.copytree(tmpl, work)
        ix = HNSWIndex(spark, work)
        ix.fs = CountdownFS(ix.fs, fuel=fuel)
        try:
            ix.reshard("e", shards=5)
            continue  # swallowed kill (best-effort path): completed
        except SimulatedCrash:
            pass
        import glob
        import os

        for lk in glob.glob(f"{work}/**/*.lock", recursive=True):
            os.remove(lk)
        cold = HNSWIndex(spark, work)
        has_marker = os.path.exists(f"{work}/e/_reshard.json")
        if marker_op is None and has_marker:
            marker_op = fuel
        got = {(r.query_id, r.neighbor_id) for r in
               cold.probe_candidates("e", qs, k=10,
                                     ef_search=64).collect()}
        meta = cold.meta("e")
        if has_marker or meta["shards"] == 5:
            # past the commit point: rolled FORWARD to the new layout
            assert cold.meta("e")["shards"] == 5
            assert got == want
        else:
            # before it: the old index intact, replay completes
            assert meta["shards"] == 2
            cold2 = HNSWIndex(spark, work)
            cold2.reshard("e", shards=5)
            assert cold2.meta("e")["shards"] == 5
    assert marker_op is not None  # the sweep crossed the commit point


def test_build_after_crashed_reshard_is_not_clobbered(spark, tmp_path):
    # r13 review finding: build() was the only entry point that
    # skipped crash recovery, so a reshard killed after its marker
    # write would roll FORWARD at the next probe entry and replace a
    # FRESH rebuild with the pre-crash staging (silent loss of the
    # rebuild).  build() now completes the pending reshard first.
    import numpy as np
    import shutil

    from rados_timestore_spark.fsutil import SimulatedCrash
    from rados_timestore_spark.hnsw import HNSWIndex
    from tests.crash_fuzz_harness import CountdownFS

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    old_corpus = emb.filter(F.col("vec_id") < 100)
    new_corpus = emb.filter(F.col("vec_id").between(100, 199))

    root = str(tmp_path / "bc")
    vi = HNSWIndex(spark, root)
    vi.build("e", old_corpus, shards=2)

    # count the mutations of a clean reshard, then kill just after
    # the marker write (the first mutation AFTER both staging writes)
    probe_root = str(tmp_path / "dry")
    shutil.copytree(root, probe_root)
    dry = HNSWIndex(spark, probe_root)
    dry.fs = CountdownFS(dry.fs)
    dry.reshard("e", shards=4)
    total = dry.fs.ops

    crashed = None
    for fuel in range(total):
        work = str(tmp_path / f"w{fuel}")
        shutil.copytree(root, work)
        ix = HNSWIndex(spark, work)
        ix.fs = CountdownFS(ix.fs, fuel=fuel)
        try:
            ix.reshard("e", shards=4)
        except SimulatedCrash:
            import os

            if os.path.exists(f"{work}/e/_reshard.json"):
                crashed = work
                break
        shutil.rmtree(work, ignore_errors=True)
    assert crashed is not None, "no boundary left the marker behind"
    import glob
    import os

    for lk in glob.glob(f"{crashed}/**/*.lock", recursive=True):
        os.remove(lk)

    # operator recovers with a FULL REBUILD over a different corpus
    cold = HNSWIndex(spark, crashed)
    cold.build("e", new_corpus, shards=2)
    assert not os.path.exists(f"{crashed}/e/_reshard.json")
    # probes serve the REBUILD, not the resurrected pre-crash corpus
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in new_corpus.filter(F.col("vec_id") < 103).collect()]
    got = {r.neighbor_id for r in
           cold.probe_candidates("e", qs, k=10, ef_search=64).collect()}
    new_ids = {r.vec_id for r in new_corpus.select("vec_id").collect()}
    assert got and got <= new_ids
    assert cold.meta("e")["n_vectors"] == 100


def test_probe_entry_does_not_sweep_live_reshard_staging(spark, tmp_path):
    # r13 review finding: a LIVE reshard spends its whole
    # staging-build window before the marker exists; probes run
    # concurrently with the single maintainer and must NOT sweep the
    # in-progress staging as an orphan.  Verbs (serial with reshard
    # by contract) do sweep it.
    import os

    import numpy as np

    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 100)
    vi = HNSWIndex(spark, str(tmp_path / "ps"))
    vi.build("e", emb, shards=2)
    staging = f"{vi._graph_dir('e')}.resharding"
    os.makedirs(f"{staging}/shard=0")
    with open(f"{staging}/shard=0/part-0.parquet", "wb") as fh:
        fh.write(b"in-progress")

    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in emb.filter(F.col("vec_id") < 2).collect()]
    vi.probe_candidates("e", qs, k=5, ef_search=64).collect()
    assert os.path.exists(staging)          # probe left it alone
    vi.probe_df("e", emb.filter(F.col("vec_id") < 2).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("qe")), topk=3).collect()
    assert os.path.exists(staging)          # frame probe too
    vi.compact("e")                          # a VERB sweeps the orphan
    assert not os.path.exists(staging)


def test_hnsw_rebuild_crash_windows_never_serve_mixed_state(
        spark, tmp_path):
    # r13: the HNSW twin of the VectorIndex rebuild guard — a rebuild
    # overwrites graphs, then vectors, then commits meta; a kill
    # between leaves a NEW graph servable against OLD vectors/meta
    # (wrong shard pairing/count — silently wrong probes).  The graph
    # build-generation marker makes every such window a loud
    # retryable refusal.  Sweep every rebuild boundary.
    import glob
    import os
    import shutil

    import numpy as np

    from rados_timestore_spark.fsutil import SimulatedCrash
    from rados_timestore_spark.hnsw import HNSWIndex
    from tests.crash_fuzz_harness import CountdownFS

    emb = spark.read.parquet(f"{SF}/embeddings.parquet")
    old_corpus = emb.filter((F.col("vec_id") % 2 == 0)
                            & (F.col("vec_id") < 200))
    new_corpus = emb.filter((F.col("vec_id") % 2 == 1)
                            & (F.col("vec_id") < 200))
    evens = {r.vec_id for r in old_corpus.select("vec_id").collect()}
    odds = {r.vec_id for r in new_corpus.select("vec_id").collect()}
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in emb.filter(F.col("vec_id") < 2).collect()]

    tmpl = str(tmp_path / "tmpl")
    HNSWIndex(spark, tmpl).build("e", old_corpus, shards=2)

    dry_root = str(tmp_path / "dry")
    shutil.copytree(tmpl, dry_root)
    dry = HNSWIndex(spark, dry_root)
    dry.fs = CountdownFS(dry.fs)
    dry.build("e", new_corpus, shards=4)
    total = dry.fs.ops
    want_new = {(r.query_id, r.neighbor_id) for r in
                dry.probe_candidates("e", qs, k=10,
                                     ef_search=64).collect()}

    guard_fired = False
    for fuel in range(total):
        work = str(tmp_path / f"w{fuel}")
        shutil.copytree(tmpl, work)
        ix = HNSWIndex(spark, work)
        ix.fs = CountdownFS(ix.fs, fuel=fuel)
        try:
            ix.build("e", new_corpus, shards=4)
            shutil.rmtree(work, ignore_errors=True)
            continue  # swallowed boundary: build completed
        except SimulatedCrash:
            pass
        for lk in glob.glob(f"{work}/**/*.lock", recursive=True):
            os.remove(lk)
        cold = HNSWIndex(spark, work)
        try:
            got = {r.neighbor_id for r in
                   cold.probe_candidates("e", qs, k=10,
                                         ef_search=64).collect()}
            assert got and (got <= evens or got <= odds), \
                f"fuel={fuel}: mixed-corpus serve {got}"
        except IOError as exc:
            assert "re-run build()" in str(exc)
            guard_fired = True
        replay = HNSWIndex(spark, work)
        replay.build("e", new_corpus, shards=4)
        got = {(r.query_id, r.neighbor_id) for r in
               replay.probe_candidates("e", qs, k=10,
                                       ef_search=64).collect()}
        assert got == want_new, f"fuel={fuel}"
        shutil.rmtree(work, ignore_errors=True)
    assert guard_fired


def test_unbuilt_namespace_raises_not_built_everywhere(spark, tmp_path):
    # ADVICE r14 #2: the sweep_stagings clockprobe sweep ran
    # listStatus on the namespace dir unguarded, so a never-built
    # namespace surfaced a raw Py4J FileNotFoundException from verb
    # entries instead of HNSWIndexNotBuilt.
    from rados_timestore_spark.hnsw import HNSWIndex, HNSWIndexNotBuilt

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 5)
    vi = HNSWIndex(spark, str(tmp_path / "nb"))
    with pytest.raises(HNSWIndexNotBuilt):
        vi.append("nope", emb)
    with pytest.raises(HNSWIndexNotBuilt):
        vi.append_batch("nope", emb, batch_id=0)
    with pytest.raises(HNSWIndexNotBuilt):
        vi.delete("nope", [1])
    with pytest.raises(HNSWIndexNotBuilt):
        vi.compact("nope")
    with pytest.raises(HNSWIndexNotBuilt):
        vi.reshard("nope", shards=2)
    with pytest.raises(HNSWIndexNotBuilt):
        vi.probe_candidates("nope", [])


def test_probe_snapshot_retries_then_raises_on_persistent_race(
        spark, tmp_path, monkeypatch):
    # ADVICE r14 #3: a probe overlapping a reshard roll-forward could
    # pair new graphs with old vectors.  The snapshot check re-reads
    # the LIVE graph marker after both file listings; a persistent
    # mismatch (simulated here by pinning a future build_gen into the
    # marker and silencing the entry-time marker check) must raise
    # after bounded retries, never serve a mixed snapshot.
    import json

    from rados_timestore_spark.hnsw import _GRAPH_MARKER, HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 60)
    vi = HNSWIndex(spark, str(tmp_path / "psr"))
    vi.build("e", emb, shards=2, m=8, ef_construction=64)

    marker = f"{vi._graph_dir('e')}/{_GRAPH_MARKER}"
    assert vi.fs.exists(marker)
    gen = json.loads(vi.fs.read_text(marker))["build_gen"]
    vi.fs.write_text_atomic(marker,
                            json.dumps({"build_gen": int(gen) + 1}))
    monkeypatch.setattr(HNSWIndex, "_check_build_marker",
                        lambda self, ns, doc: None)
    with pytest.raises(IOError, match="racing a reshard swap"):
        vi.probe_candidates("e", [(0, np.zeros(8))])
    # restoring the marker heals the probe path
    vi.fs.write_text_atomic(marker, json.dumps({"build_gen": int(gen)}))
    qr = emb.filter(F.col("vec_id") < 1).collect()[0]
    got = vi.probe_candidates(
        "e", [(int(qr.vec_id),
               np.asarray(qr.embedding, dtype=np.float64))], k=8)
    assert got.count() > 0


def test_stats_and_overgrowth_warning(spark, tmp_path, monkeypatch):
    # VERDICT r13 "What's missing" #2: the ~1M-vector shard rule is
    # now measured (stats) and enforced as an append-time warning
    # (mean density, meta-only).  The bound is a class attr so the
    # test exercises the tripwire without a million-row fixture.
    import warnings

    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 120)
    vi = HNSWIndex(spark, str(tmp_path / "st"))
    vi.build("e", emb.filter(F.col("vec_id") < 80), shards=4)

    st = vi.stats("e")
    assert st["shards"] == 4 and st["n_vectors"] == 80
    assert sum(st["per_shard"].values()) == 80
    assert st["over_bound"] == [] and st["bound"] == 1_000_000

    # under the bound: appends stay silent
    with warnings.catch_warnings():
        warnings.simplefilter("error")
        vi.append("e", emb.filter(F.col("vec_id").between(80, 99)))

    # shrink the bound under the mean density: the next append warns
    monkeypatch.setattr(HNSWIndex, "SHARD_BOUND", 20)
    with pytest.warns(UserWarning, match="mean shard density"):
        vi.append("e", emb.filter(F.col("vec_id").between(100, 119)))
    st = vi.stats("e")
    assert st["n_vectors"] == 120
    assert st["over_bound"]          # exact counts exceed 20 too


def test_maintain_noop_when_healthy_heals_when_overgrown(
        spark, tmp_path, monkeypatch):
    # r14: measure-then-heal (VectorIndex.maintain mirrored) —
    # healthy index is a BYTE-untouched no-op; an over-bound index
    # reshards at the strictly-grown count the shared pure rule
    # derives, after which maintain converges to no-op.
    import os

    from rados_timestore_spark.hnsw import HNSWIndex

    emb = spark.read.parquet(f"{SF}/embeddings.parquet") \
        .filter(F.col("vec_id") < 120)
    root = str(tmp_path / "hmt")
    vi = HNSWIndex(spark, root)
    vi.build("e", emb, shards=4)

    def snapshot():
        out = []
        for dirp, _dirs, files in os.walk(root):
            for f in files:
                p = os.path.join(dirp, f)
                s = os.stat(p)
                out.append((p, s.st_size, s.st_mtime_ns))
        return sorted(out)

    before = snapshot()
    res = vi.maintain("e")
    assert res["action"] == "none"
    assert res["stats"]["n_vectors"] == 120
    assert snapshot() == before                 # strict no-op

    monkeypatch.setattr(HNSWIndex, "SHARD_BOUND", 20)
    res = vi.maintain("e")
    assert res["action"] == "reshard"
    assert res["shards"] == 12                  # ceil(120 / (20//2))
    doc = vi.meta("e")
    assert doc["shards"] == 12 and doc["n_vectors"] == 120
    qr = emb.filter(F.col("vec_id") < 1).collect()[0]
    got = vi.probe_candidates(
        "e", [(int(qr.vec_id),
               np.asarray(qr.embedding, dtype=np.float64))], k=8)
    assert got.count() > 0
    # healed: the next maintain converges to a no-op
    res2 = vi.maintain("e")
    assert res2["action"] == "none"
