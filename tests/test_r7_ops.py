"""Law tests for the r7 operator batch (beyond their DuckDB oracles):
SQ8 quantization, filtered ANN, BPE mining, streaming CMS, and the
registered connected-components query."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from rados_timestore_spark import (
    queries_dedup as qd,
    queries_similarity as qs,
    queries_sketch as qk,
)
from rados_timestore_spark import registry
from tests.conftest import SF_DIR


def _q(name):
    return registry.queries()[name]


# ------------------------------------------------------------- SQ8


def test_sq8_codes_are_int8_range(spark):
    codes = qs._sq8_codes(spark, SF_DIR)
    mm = codes.select(
        F.min(F.array_min("code")).alias("lo"),
        F.max(F.array_max("code")).alias("hi"),
    ).collect()[0]
    assert -128 <= mm.lo and mm.hi <= 127


def test_sq8_score_partition_invariant(spark):
    # Integer dots are associative: re-partitioning the corpus must
    # reproduce the identical ranked lists.
    a = _q("sim_sq8_ann")(spark, SF_DIR).collect()
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        b = _q("sim_sq8_ann")(spark, SF_DIR).collect()
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
    key = lambda r: (r.query_id, r.rank)
    assert sorted([(r.query_id, r.rank, r.neighbor_id, r.score)
                   for r in a]) == \
           sorted([(r.query_id, r.rank, r.neighbor_id, r.score)
                   for r in b])


def test_sq8_matches_numpy_reference(spark):
    # End-to-end against a straight numpy reimplementation at sf0.001.
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet").toPandas()
    E = np.stack(emb["embedding"].to_numpy()).astype(np.float64)
    ids = emb["vec_id"].to_numpy()
    vmax = np.abs(E).max()
    C = np.floor(E * 127 / vmax).astype(np.int64)
    got = {(r.query_id, r.rank): (r.neighbor_id, r.score)
           for r in _q("sim_sq8_ann")(spark, SF_DIR).collect()}
    for qid in range(5):
        qi = np.where(ids == qid)[0][0]
        scores = C @ C[qi]
        order = sorted(
            [(int(-scores[i]), int(ids[i])) for i in range(len(ids))
             if ids[i] != qid]
        )[:5]
        for rank, (neg, nid) in enumerate(order, start=1):
            assert got[(qid, rank)] == (nid, -neg)


# ------------------------------------------------- filtered ANN


def test_filtered_ann_is_subset_with_matching_label(spark):
    emb = spark.read.parquet(f"{SF_DIR}/embeddings.parquet")
    labels = {
        r.vec_id for r in
        emb.filter(F.col("label").isin(*qs._FILTER_LABELS)).collect()
    }
    rows = _q("sim_ivf_ann_filtered")(spark, SF_DIR).collect()
    assert all(r.neighbor_id in labels for r in rows)
    # and the filter only prunes: every filtered hit appears in the
    # unfiltered bucket scan's candidate ORDER (cos equal for shared
    # neighbors)
    unfiltered = {
        (r.query_id, r.neighbor_id): r.cos
        for r in _q("sim_ivf_ann")(spark, SF_DIR).collect()
    }
    for r in rows:
        if (r.query_id, r.neighbor_id) in unfiltered:
            assert unfiltered[(r.query_id, r.neighbor_id)] == r.cos


# ------------------------------------------------------------- BPE


def test_bpe_pairs_match_python_reference(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("text").toPandas()
    from collections import Counter

    ref = Counter()
    for text in docs["text"]:
        for w in text.strip().lower().split():
            for i in range(len(w) - 1):
                ref[w[i:i + 2]] += 1
    got = _q("text_bpe_merge_candidates")(spark, SF_DIR).collect()
    want = sorted(ref.items(), key=lambda kv: (-kv[1], kv[0]))[:25]
    assert [(r.pair, r.n) for r in got] == want


# --------------------------------------------------- streaming CMS


def test_streaming_cms_equals_batch_cells(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    batch = {
        (r.j, r.p): r.c
        for r in qk.trigram_cms_cells(docs).collect()
    }
    streamed = {
        (r.j, r.p): r.c
        for r in _q("streaming_cms_cells")(spark, SF_DIR).collect()
    }
    assert streamed == batch


# ------------------------------------------- connected components


def test_registered_cc_matches_union_find(spark):
    pairs = [
        (r.doc_a, r.doc_b)
        for r in qd.dedup_fuzzy_prefix(spark, SF_DIR)
        .select("doc_a", "doc_b").collect()
    ]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    for a, b in pairs:
        union(a, b)
    # canonical representative = min member, matching min-label
    comp = {}
    for x in parent:
        comp.setdefault(find(x), []).append(x)
    want = {x: min(members) for members in comp.values() for x in members}
    rows = _q("graph_connected_components")(spark, SF_DIR).collect()
    assert {r.node: r.component for r in rows} == want
    assert all(r.n_unconverged == 0 for r in rows)
    sizes = {min(m): len(m) for m in comp.values()}
    assert {r.component: r.comp_size for r in rows} == sizes
