"""Streaming vector-index ingest laws: exactly-once append through
append_batch's batch-id fence + deterministic file prefixes, and
kill-and-resume equivalence with a one-shot build."""

import pyspark.sql.functions as F
import pytest

from rados_timestore_spark.vector_index import VectorIndex
from tests.conftest import SF_DIR

K = 32


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF_DIR}/embeddings.parquet")


def _probe_all(vi, emb, n=3):
    rows = emb.filter(F.col("vec_id") < n).collect()
    qs = [(r.vec_id, list(r.embedding)) for r in rows]
    return {(r.query_id, r.rank): (r.neighbor_id, r.cos)
            for r in vi.probe("e", qs, topk=5, nprobe=4).collect()}


def test_append_batch_is_idempotent(spark, emb, tmp_path):
    vi = VectorIndex(spark, str(tmp_path / "ab"))
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    vi.build("e", a, k=K)
    vi.append_batch("e", b, 0)
    n1 = vi.meta("e")["n_vectors"]
    snap = _probe_all(vi, emb)
    # replaying the SAME batch id is a complete no-op
    vi.append_batch("e", b, 0)
    assert vi.meta("e")["n_vectors"] == n1
    assert _probe_all(vi, emb) == snap


def test_append_batch_recovers_from_crash_mid_promote(
        spark, emb, tmp_path):
    # Simulate a writer that died after promoting SOME of a batch's
    # files but before the meta commit: replaying the batch must sweep
    # the partial files and converge to exactly one copy.
    import glob

    vi = VectorIndex(spark, str(tmp_path / "cr"))
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    vi.build("e", a, k=K)

    # plant fake partial files from a "crashed" attempt of batch 0
    live = vi._assignments_dir("e")
    victims = sorted(glob.glob(f"{live}/bucket=*"))[:2]
    for d in victims:
        with open(f"{d}/b0-part-crashed.parquet", "wb") as fh:
            fh.write(b"partial")
    vi.append_batch("e", b, 0)
    assert glob.glob(f"{live}/bucket=*/b0-part-crashed.parquet") == []
    # every surviving b0- file is valid parquet: the full table reads
    total = spark.read.parquet(live).count()
    assert total == a.count() + b.count()
    assert vi.meta("e")["n_vectors"] == total


def test_stream_vectors_kill_and_resume_equals_one_shot(
        spark, emb, tmp_path):
    # Two availableNow runs over one checkpoint (the restart
    # boundary), three micro-batch files; the final probe state must
    # equal a single build+append of everything under the same
    # routing.
    import os
    import time as _t

    from rados_timestore_spark.streaming.vector_ingest import (
        stream_vectors,
    )

    base = emb.filter(F.col("vec_id") % 4 == 0)
    parts = [emb.filter(F.col("vec_id") % 4 == r) for r in (1, 2, 3)]

    vi = VectorIndex(spark, str(tmp_path / "sv"))
    vi.build("e", base, k=K)

    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)

    def deliver(i, df):
        df.coalesce(1).write.parquet(f"{src}/b{i}")
        _t.sleep(0.05)
        os.utime(src)

    def run_once():
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
        )
        q = stream_vectors(vi, "e", stream, ck)
        assert q.awaitTermination(180)

    deliver(0, parts[0])
    run_once()
    deliver(1, parts[1])
    deliver(2, parts[2])
    run_once()

    assert vi.meta("e")["n_vectors"] == emb.count()
    got = _probe_all(vi, emb)

    ref = VectorIndex(spark, str(tmp_path / "ref"))
    ref.build("e", base, k=K)
    for i, p in enumerate(parts):
        ref.append("e", p)
    assert got == _probe_all(ref, emb)


def test_stream_vectors_requires_built_index(spark, emb, tmp_path):
    from rados_timestore_spark.streaming.vector_ingest import (
        stream_vectors,
    )
    from rados_timestore_spark.vector_index import VectorIndexNotBuilt

    vi = VectorIndex(spark, str(tmp_path / "nb"))
    import os

    src = str(tmp_path / "empty_src")
    os.makedirs(src)
    stream = (
        spark.readStream.schema(emb.schema).parquet(src)
    )
    with pytest.raises(VectorIndexNotBuilt):
        stream_vectors(vi, "e", stream, str(tmp_path / "ck"))


def test_append_batch_encodes_pq_inline(spark, emb, tmp_path):
    # exactly-once streaming ingest into a PQ-ENABLED index: the
    # micro-batch path must encode codes inline with the persisted
    # codebooks (append_batch loads them when meta has pq), so the
    # code column never goes stale under continuous ingest — and the
    # idempotent replay keeps single-copy state with codes intact
    from rados_timestore_spark.queries_similarity import _sq_dists

    import numpy as np

    vi = VectorIndex(spark, str(tmp_path / "pqab"))
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    vi.build("e", a, k=K)
    doc = vi.enable_pq("e", m=4, ksub=16)
    vi.append_batch("e", b, 0)
    vi.append_batch("e", b, 0)  # replay — must stay single-copy
    rows = spark.read.parquet(vi._assignments_dir("e"))
    assert rows.count() == a.count() + b.count()
    assert rows.filter(F.col("pq_code").isNull()).count() == 0
    # appended rows' codes equal a direct re-encode with the
    # persisted codebooks
    CBm = vi._load_pq("e", doc)
    pdf = (rows.filter(F.col("vec_id") % 3 == 1)
           .select("embedding", "pq_code").toPandas())
    E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)
    dsub = doc["pq"]["dsub"]
    for s in range(doc["pq"]["m"]):
        want = np.argmin(
            _sq_dists(E[:, s * dsub:(s + 1) * dsub], CBm[s]), axis=1)
        got = np.array([c[s] for c in pdf["pq_code"]])
        assert (got == want).all()


# ------------------------------------------- r10: HNSW ingest twins


def _hnsw_probe_all(hi, emb, n=3):
    import numpy as np

    rows = emb.filter(F.col("vec_id") < n).collect()
    qs = [(r.vec_id, np.asarray(r.embedding, dtype=np.float64))
          for r in rows]
    return {(r.query_id, r.neighbor_id) for r in
            hi.probe_candidates("e", qs, k=16, ef_search=128).collect()}


def test_hnsw_append_batch_is_idempotent(spark, emb, tmp_path):
    from rados_timestore_spark.hnsw import HNSWIndex

    hi = HNSWIndex(spark, str(tmp_path / "hab"))
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    hi.build("e", a, shards=4, m=8, ef_construction=128)
    hi.append_batch("e", b, 0)
    n1 = hi.meta("e")["n_vectors"]
    assert n1 == a.count() + b.count()
    snap = _hnsw_probe_all(hi, emb)
    hi.append_batch("e", b, 0)  # replay: complete no-op
    assert hi.meta("e")["n_vectors"] == n1
    assert _hnsw_probe_all(hi, emb) == snap
    # single-copy vectors on disk
    assert spark.read.parquet(hi._vectors_dir("e")).count() == n1


def test_hnsw_append_batch_recovers_from_crash_windows(
        spark, emb, tmp_path):
    # Crash window 1: partial vector files of THIS batch are swept and
    # re-promoted.  Crash window 2: the graph already swapped (batch
    # nodes present) but meta never committed — the replay's reinsert
    # filter makes the graph rewrite a no-op and the commit lands once.
    import glob

    from rados_timestore_spark.hnsw import HNSWIndex

    hi = HNSWIndex(spark, str(tmp_path / "hcr"))
    a = emb.filter(F.col("vec_id") % 3 == 0)
    b = emb.filter(F.col("vec_id") % 3 == 1)
    hi.build("e", a, shards=4, m=8, ef_construction=128)

    # window 1: plant a fake partial vector file from a crashed batch 0
    vdir = hi._vectors_dir("e")
    victim = sorted(glob.glob(f"{vdir}/shard=*"))[0]
    with open(f"{victim}/b0-part-crashed.parquet", "wb") as fh:
        fh.write(b"partial")
    hi.append_batch("e", b, 0)
    assert glob.glob(f"{vdir}/shard=*/b0-part-crashed.parquet") == []
    assert spark.read.parquet(vdir).count() == a.count() + b.count()
    n1 = hi.meta("e")["n_vectors"]
    snap = _hnsw_probe_all(hi, emb)

    # window 2: simulate crash-after-swap-before-commit for batch 1 by
    # running it fully, then REWINDING the meta fence and replaying
    c = emb.filter(F.col("vec_id") % 3 == 2)
    hi.append_batch("e", c, 1)
    done = _hnsw_probe_all(hi, emb)
    doc = hi.meta("e")
    doc["last_batch_id"] = 0
    doc["n_vectors"] = int(doc["n_vectors"]) - c.count()
    hi._write_meta("e", doc)
    hi.append_batch("e", c, 1)  # replay with vectors+graph already live
    assert hi.meta("e")["n_vectors"] == n1 + c.count() == emb.count()
    assert spark.read.parquet(vdir).count() == emb.count()
    # the replay converged bit-exactly to the pre-rewind state (beam
    # candidates are NOT monotone in corpus growth, so equality with
    # `done` is the right law, not superset of `snap`)
    assert _hnsw_probe_all(hi, emb) == done
    assert snap  # the window-1 state was actually probed


def test_stream_hnsw_vectors_kill_and_resume_equals_batches(
        spark, emb, tmp_path):
    import os
    import time as _t

    from rados_timestore_spark.hnsw import HNSWIndex
    from rados_timestore_spark.streaming.vector_ingest import (
        stream_hnsw_vectors,
    )

    base = emb.filter(F.col("vec_id") % 4 == 0)
    parts = [emb.filter(F.col("vec_id") % 4 == r) for r in (1, 2, 3)]

    hi = HNSWIndex(spark, str(tmp_path / "shv"))
    hi.build("e", base, shards=4, m=8, ef_construction=128)

    src, ck = str(tmp_path / "src"), str(tmp_path / "ck")
    os.makedirs(src)

    def deliver(i, df):
        df.coalesce(1).write.parquet(f"{src}/b{i}")
        _t.sleep(0.05)
        os.utime(src)

    def run_once():
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
        )
        q = stream_hnsw_vectors(hi, "e", stream, ck)
        assert q.awaitTermination(180)

    deliver(0, parts[0])
    run_once()
    deliver(1, parts[1])
    deliver(2, parts[2])
    run_once()

    assert hi.meta("e")["n_vectors"] == emb.count()
    assert spark.read.parquet(hi._vectors_dir("e")).count() == emb.count()
    got = _hnsw_probe_all(hi, emb)

    ref = HNSWIndex(spark, str(tmp_path / "href"))
    ref.build("e", base, shards=4, m=8, ef_construction=128)
    for i, p in enumerate(parts):
        ref.append_batch("e", p, i)
    assert got == _hnsw_probe_all(ref, emb)


def test_append_batch_app_scoped_fence(spark, emb, tmp_path):
    # r12 (ADVICE r11): batch ids restart at 0 under a NEW checkpoint
    # lineage; app_id keys the fence per lineage so the new stream's
    # early batches apply instead of skipping as "completed replays".
    from rados_timestore_spark.hnsw import HNSWIndex

    a = emb.filter(F.col("vec_id") % 4 == 0)
    b = emb.filter(F.col("vec_id") % 4 == 1)
    c = emb.filter(F.col("vec_id") % 4 == 2)

    vi = VectorIndex(spark, str(tmp_path / "af"))
    vi.build("e", a, k=K)
    vi.append_batch("e", b, 7, app_id="L1")
    n1 = vi.meta("e")["n_vectors"]
    assert n1 == a.count() + b.count()
    # same lineage: stale/replayed ids are no-ops
    vi.append_batch("e", b, 7, app_id="L1")
    vi.append_batch("e", b, 0, app_id="L1")
    assert vi.meta("e")["n_vectors"] == n1
    # NEW lineage at batch 0 APPLIES (the silent-loss case)
    vi.append_batch("e", c, 0, app_id="L2")
    assert vi.meta("e")["n_vectors"] == n1 + c.count()
    assert vi.meta("e")["batch_fences"] == {"L1": 7, "L2": 0}
    assert int(vi.meta("e").get("last_batch_id", -1)) == -1

    hi = HNSWIndex(spark, str(tmp_path / "ahf"))
    hi.build("e", a, shards=4, m=8, ef_construction=64)
    hi.append_batch("e", b, 7, app_id="L1")
    m1 = hi.meta("e")["n_vectors"]
    hi.append_batch("e", b, 0, app_id="L1")        # stale: no-op
    assert hi.meta("e")["n_vectors"] == m1
    hi.append_batch("e", c, 0, app_id="L2")        # new lineage: applies
    assert hi.meta("e")["n_vectors"] == m1 + c.count()
    assert hi.meta("e")["batch_fences"] == {"L1": 7, "L2": 0}


def test_stream_vectors_new_checkpoint_lineage_not_skipped(
        spark, emb, tmp_path):
    # End-to-end ADVICE r11 scenario: ingest via checkpoint A, then
    # restart with a FRESH checkpoint directory (standard recovery
    # after checkpoint loss) delivering new data — whose micro-batch
    # ids restart at 0.  The auto lineage-keyed fence must apply
    # them; the old unscoped fence silently dropped them.
    import os
    from rados_timestore_spark.streaming.vector_ingest import (
        stream_vectors,
    )

    base = emb.filter(F.col("vec_id") % 4 == 0)
    p1 = emb.filter(F.col("vec_id") % 4 == 1)
    p2 = emb.filter(F.col("vec_id") % 4 == 2)

    vi = VectorIndex(spark, str(tmp_path / "nl"))
    vi.build("e", base, k=K)

    def run(src, ck, parts):
        os.makedirs(src, exist_ok=True)
        for i, df in enumerate(parts):
            df.coalesce(1).write.parquet(f"{src}/b{i}")
        stream = (
            spark.readStream.schema(base.schema)
            .option("maxFilesPerTrigger", 1)
            .parquet(f"{src}/b*")
        )
        q = stream_vectors(vi, "e", stream, ck)
        assert q.awaitTermination(180)

    # lineage A: two micro-batches (ids 0, 1) -> fence at 1
    run(str(tmp_path / "srcA"), str(tmp_path / "ckA"), [p1, p2])
    n_after_a = vi.meta("e")["n_vectors"]
    assert n_after_a == base.count() + p1.count() + p2.count()
    # lineage B (fresh checkpoint): one micro-batch, id 0 again
    p3 = emb.filter(F.col("vec_id") % 4 == 3)
    run(str(tmp_path / "srcB"), str(tmp_path / "ckB"), [p3])
    assert vi.meta("e")["n_vectors"] == n_after_a + p3.count()
    # two distinct lineage fences recorded
    assert len(vi.meta("e").get("batch_fences", {})) == 2
