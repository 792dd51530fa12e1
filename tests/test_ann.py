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


def test_lsh_band_count_table_meets_recall_target():
    # r6 (VERDICT r5 item 7): the band COUNT is derived from a recall
    # target at the design cosine.  Pin the law analytically: for every
    # derivable width, recall(bits, bands) = 1-(1-p0^bits)^bands must
    # clear the target, bands must be MINIMAL (bands-1 fails), and the
    # plane pool must cover the widest geometry.
    import math

    from rados_timestore_spark.queries_similarity import (
        _BANDS_FOR_BITS, _LSH_DESIGN_COS, _LSH_TARGET_RECALL, _MAX_BITS,
        _MIN_BITS, _N_PLANES,
    )

    p0 = 1.0 - math.acos(_LSH_DESIGN_COS) / math.pi
    for bits in range(_MIN_BITS, _MAX_BITS + 1):
        bands = _BANDS_FOR_BITS[bits]
        pb = p0 ** bits
        assert 1 - (1 - pb) ** bands >= _LSH_TARGET_RECALL, (bits, bands)
        assert 1 - (1 - pb) ** (bands - 1) < _LSH_TARGET_RECALL or bands == 1
        assert bands * bits <= _N_PLANES


def test_lsh_empirical_recall_across_scale_geometries():
    # Empirical twin of the analytic law, with the REAL md5 plane pool:
    # plant pairs at exactly the design cosine and measure candidate
    # recall (any band fully equal) at every geometry the auto-scaler
    # can select — bits=8 is the small-corpus geometry, bits=16 the
    # 100 TB one.  r5's fixed bands=8 drops to ~50% at bits=16; the
    # derived counts must hold the target at every width (0.03 slack
    # for the fixed-plane sampling noise of 500 pairs).
    import numpy as np

    from rados_timestore_spark.queries_similarity import (
        _BANDS_FOR_BITS, _LSH_DESIGN_COS, _LSH_TARGET_RECALL, _MIN_BITS,
        _MAX_BITS, _PLANES, DIM,
    )

    rng = np.random.default_rng(7)
    n_pairs = 500
    a = rng.normal(size=(n_pairs, DIM))
    a /= np.linalg.norm(a, axis=1, keepdims=True)
    w = rng.normal(size=(n_pairs, DIM))
    w -= (w * a).sum(1, keepdims=True) * a  # orthogonalize
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    c = _LSH_DESIGN_COS
    b = c * a + np.sqrt(1 - c * c) * w
    assert np.allclose((a * b).sum(1), c)

    for bits in range(_MIN_BITS, _MAX_BITS + 1, 2):
        bands = _BANDS_FOR_BITS[bits]
        used = bands * bits
        planes = np.array(_PLANES[:used], dtype=np.float64).T
        sa = (a @ planes) >= 0
        sb = (b @ planes) >= 0
        hit = np.zeros(n_pairs, dtype=bool)
        for k in range(bands):
            seg = slice(k * bits, (k + 1) * bits)
            hit |= (sa[:, seg] == sb[:, seg]).all(axis=1)
        recall = hit.mean()
        assert recall >= _LSH_TARGET_RECALL - 0.03, (bits, bands, recall)


def test_pq_rerank_refines_within_candidates(spark):
    """The refine stage's contract: rerank output is a subset of the
    ADC candidate list, exactly 5 per query, ordered by exact L2."""
    from rados_timestore_spark.queries_similarity import (
        _RERANK_CAND, _pq_ann, sim_pq_rerank)

    cand = {(r["query_id"], r["neighbor_id"])
            for r in _pq_ann(spark, SF_DIR, k=_RERANK_CAND).collect()}
    rows = sim_pq_rerank(spark, SF_DIR).collect()
    assert len(rows) == 25  # 5 queries x top-5
    per_q = {}
    for r in rows:
        assert (r["query_id"], r["neighbor_id"]) in cand
        per_q.setdefault(r["query_id"], []).append(
            (r["rank"], r["exact_d2"], r["neighbor_id"]))
    for q, lst in per_q.items():
        lst.sort()
        assert [rk for rk, _, _ in lst] == [1, 2, 3, 4, 5]
        d2s = [d for _, d, _ in lst]
        assert d2s == sorted(d2s)


def test_pq_rerank_recall_dominates_plain_pq(spark):
    """The refine stage must pay for itself: per-query recall@5 of the
    re-ranked path >= the plain ADC path on the fixture corpus (exact
    re-sorting of a candidate superset of the ADC top-5 should only
    ever fix ranking mistakes, and empirically does: 13 vs 6 total
    hits at sf0.001)."""
    from rados_timestore_spark import registry

    q = registry.queries()
    pq = {r["query_id"]: r["n_hit"]
          for r in q["sim_pq_recall"](spark, SF_DIR).collect()}
    rr = {r["query_id"]: r["n_hit"]
          for r in q["sim_pq_rerank_recall"](spark, SF_DIR).collect()}
    assert set(pq) == set(rr) == {0, 1, 2, 3, 4}
    for qid in pq:
        assert rr[qid] >= pq[qid], (qid, rr[qid], pq[qid])
    assert sum(rr.values()) > sum(pq.values())


def test_range_search_laws(spark):
    # Range results respect the floor, exclude self-matches, and
    # contain every knn_join top-3 hit that clears the floor (range
    # search must never MISS a neighbor top-k would return).
    from rados_timestore_spark.queries_similarity import (
        _RANGE_TAU100, sim_knn_join, sim_range_search,
    )
    from tests.conftest import SF_DIR

    out = sim_range_search(spark, SF_DIR).toPandas()
    assert (out["cos"] * 100 >= _RANGE_TAU100).all()
    assert (out["query_id"] != out["neighbor_id"]).all()
    got = set(zip(out["query_id"], out["neighbor_id"]))
    knn = sim_knn_join(spark, SF_DIR).toPandas()
    must = knn[knn["cos"] * 100 >= _RANGE_TAU100]
    assert set(zip(must["query_id"], must["neighbor_id"])) <= got
