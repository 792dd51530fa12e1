"""k-means quantizer laws: the distributed Lloyd fit must partition
the corpus, keep its objective non-increasing across iterations (the
k-means convergence guarantee, up to the documented 2^-20 fixed-point
centroid quantization), and be exactly reproducible run-to-run (the
property the fixed-point accumulation buys — see the section comment
in queries_similarity.py)."""

import numpy as np

from tests.conftest import SF_DIR


def _sse(E, cids, C, assign_fn):
    import pandas as pd

    out = list(assign_fn([pd.DataFrame(
        {"vec_id": range(len(E)), "embedding": list(E)})]))[0]
    Cm = np.asarray(C)
    idx = {c: i for i, c in enumerate(cids)}
    rows = np.array([idx[c] for c in out["cid"]])
    return float(((E - Cm[rows]) ** 2).sum())


def test_kmeans_partitions_corpus_and_objective_decreases(spark):
    from rados_timestore_spark.queries_similarity import (
        _KM_K,
        _kmeans_fit,
        _make_km_assign,
        load_parallel,
    )

    emb = load_parallel(spark, SF_DIR, "embeddings", "vec_id")
    n = emb.count()
    pdf = emb.select("vec_id", "embedding").toPandas()
    E = np.stack(pdf["embedding"].to_numpy()).astype(np.float64)

    cids, C, counts = _kmeans_fit(spark, SF_DIR)
    assert len(cids) <= _KM_K
    assert sum(counts) == n  # every vector lands in exactly one cluster
    assert all(c > 0 for c in counts)  # empty clusters are dropped

    # Objective non-increasing: SSE under the trained centroids must
    # not exceed SSE under the init centroids (tolerance: the per-
    # coordinate 2^-20 quantization of the fixed-point means).
    init = pdf[pdf["vec_id"] < _KM_K].sort_values("vec_id")
    C0 = np.stack(init["embedding"].to_numpy()).astype(np.float64)
    cids0 = [int(v) for v in init["vec_id"]]
    sse0 = _sse(E, cids0, C0, _make_km_assign(cids0, C0))
    sse2 = _sse(E, cids, C, _make_km_assign(cids, C))
    assert sse2 <= sse0 * (1 + 1e-6)

    # Bit-exact reproducibility: a second FRESH fit (cache cleared —
    # a cache hit would make this assertion vacuous) returns identical
    # centroids — integer sums can't depend on shuffle order.
    from rados_timestore_spark.queries_similarity import _KM_FIT_CACHE

    _KM_FIT_CACHE.clear()
    cids_b, C_b, counts_b = _kmeans_fit(spark, SF_DIR)
    assert cids_b == cids and counts_b == counts
    assert np.array_equal(C, C_b)
