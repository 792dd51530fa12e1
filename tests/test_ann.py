"""ANN compression-stack laws: PQ/IVF-PQ encode must be partition-
invariant (bit-identical codes under any physical layout) and
internally consistent (the IVF-PQ bucket column equals the k-means
assignment kernel's output for every vector)."""

from tests.conftest import SF_DIR


def _codes(df):
    return {r["vec_id"]: tuple(v for k, v in sorted(r.asDict().items())
                               if k.startswith("c"))
            for r in df.collect()}


def test_pq_encode_partition_invariant(spark):
    from rados_timestore_spark.queries_similarity import (
        _PQ_M, _make_pq_encode, _pq_codebooks)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    CB = _pq_codebooks(spark, SF_DIR)
    ddl = "vec_id long, " + ", ".join(f"c{s} long" for s in range(_PQ_M))
    a = _codes(emb.select("vec_id", "embedding").repartition(1)
               .mapInPandas(_make_pq_encode(CB), ddl))
    b = _codes(emb.select("vec_id", "embedding").repartition(9, "vec_id")
               .mapInPandas(_make_pq_encode(CB), ddl))
    assert a == b and len(a) == emb.count()
    from rados_timestore_spark.queries_similarity import _PQ_K

    assert all(0 <= c < _PQ_K for codes in a.values() for c in codes)


def test_ivfpq_bucket_equals_kmeans_assignment(spark):
    import numpy as np

    from rados_timestore_spark.queries_similarity import (
        _PQ_M, _ivfpq_codebooks, _kmeans_fit, _make_ivfpq_encode,
        _make_km_assign)

    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    cids, C, _counts = _kmeans_fit(spark, SF_DIR)
    Cm = np.asarray(C, dtype=np.float64)
    CB = _ivfpq_codebooks(spark, SF_DIR, Cm)

    enc_ddl = ("vec_id long, cid long, "
               + ", ".join(f"c{s} long" for s in range(_PQ_M)))
    encoded = {
        r["vec_id"]: r["cid"]
        for r in emb.select("vec_id", "embedding")
        .mapInPandas(_make_ivfpq_encode(cids, C, CB), enc_ddl).collect()
    }
    assigned = {
        r["vec_id"]: r["cid"]
        for r in emb.select("vec_id", "embedding")
        .mapInPandas(_make_km_assign(cids, C),
                     "vec_id long, embedding array<float>, cid long")
        .collect()
    }
    assert encoded == assigned
