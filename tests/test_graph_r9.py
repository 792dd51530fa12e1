"""Semantic laws for the late-r9 graph batch (k-core peeling,
common-neighbor Jaccard link prediction) on hand-crafted corpora whose
fuzzy-prefix graph is known exactly, plus fixture invariants."""

import pandas as pd
import pyspark.sql.functions as F

from rados_timestore_spark.queries_dedup import (
    _KCORE_K,
    dedup_fuzzy_prefix,
    graph_jaccard_neighbors,
    graph_kcore,
    graph_label_propagation,
)

SF = "/root/testdata/sf0.001"


def _corpus(tmp_path, texts):
    pdf = pd.DataFrame({
        "doc_id": list(range(len(texts))),
        "text": texts,
        "lang": ["en"] * len(texts),
        "source": ["t"] * len(texts),
        "n_chars": [len(t) for t in texts],
    })
    pdf.to_parquet(tmp_path / "documents.parquet", index=False)
    return str(tmp_path)


# A 3-path (a-b-c: a~b and b~c within Levenshtein 10 on the 5-word
# prefix, a and c at distance 12 — NOT an edge) plus a disjoint
# triangle (d-e-f pairwise within distance).  First-word blocking
# keeps the two gadgets in separate blocks.
_PATH_TRIANGLE = [
    "k aaaaaa bbbbbb cccccc dddddd",    # 0: a
    "k zzzzzz bbbbbb cccccc dddddd",    # 1: b  (a<->b dist 6)
    "k zzzzzz yyyyyy cccccc dddddd",    # 2: c  (b<->c 6, a<->c 12)
    "m aaaaaa bbbbbb cccccc dddddd",    # 3: d
    "m aazzaa bbbbbb cccccc dddddd",    # 4: e  (d<->e dist 2)
    "m aaaaaa bbzzbb cccccc dddddd",    # 5: f  (d<->f 2, e<->f 4)
]


def test_gadget_edges_are_as_designed(spark, tmp_path):
    sf = _corpus(tmp_path, _PATH_TRIANGLE)
    got = {(r.doc_a, r.doc_b)
           for r in dedup_fuzzy_prefix(spark, sf).collect()}
    assert got == {(0, 1), (1, 2), (3, 4), (3, 5), (4, 5)}


def test_kcore_keeps_the_triangle_drops_the_path(spark, tmp_path):
    sf = _corpus(tmp_path, _PATH_TRIANGLE)
    out = {r.doc_id: r for r in graph_kcore(spark, sf).collect()}
    # path endpoints peel in round 1, the middle in round 2; the
    # triangle is the whole 2-core with induced degree 2 everywhere
    assert set(out) == {3, 4, 5}
    assert all(r.core_deg == 2 for r in out.values())
    assert all(r.n_unconverged == 0 for r in out.values())


def test_jaccard_predicts_the_path_closure_only(spark, tmp_path):
    sf = _corpus(tmp_path, _PATH_TRIANGLE)
    rows = graph_jaccard_neighbors(spark, sf).collect()
    # the only non-edge 2-path is a-c through b; the triangle's
    # wedges all close into existing edges and are anti-joined away
    assert len(rows) == 1
    r = rows[0]
    assert (r.doc_a, r.doc_b) == (0, 2)
    assert r.common_cnt == 1 and r.deg_a == 1 and r.deg_b == 1
    assert r.jaccard_ppm == 1_000_000


def test_kcore_fixture_invariants(spark):
    out = graph_kcore(spark, SF).toPandas()
    # peeling converged on the fixture
    assert (out["n_unconverged"] == 0).all()
    # every survivor's induced degree satisfies the core condition
    assert (out["core_deg"] >= _KCORE_K).all()
    # the core is a subset of nodes whose FULL degree >= K (induced
    # degree can only shrink)
    e = dedup_fuzzy_prefix(spark, SF).select("doc_a", "doc_b")
    deg = (
        e.select(F.col("doc_a").alias("u"))
        .unionByName(e.select(F.col("doc_b").alias("u")))
        .groupBy("u").count().toPandas().set_index("u")["count"]
    )
    assert all(deg[n] >= _KCORE_K for n in out["doc_id"])


def test_jaccard_fixture_invariants(spark):
    out = graph_jaccard_neighbors(spark, SF).toPandas()
    assert (out["doc_a"] < out["doc_b"]).all()
    assert (out["common_cnt"] >= 1).all()
    assert (out["common_cnt"]
            <= out[["deg_a", "deg_b"]].min(axis=1)).all()
    assert (out["jaccard_ppm"] >= 0).all()
    assert (out["jaccard_ppm"] <= 1_000_000).all()
    # predicted links are NOT edges
    e = {(r.doc_a, r.doc_b) for r in
         dedup_fuzzy_prefix(spark, SF).collect()}
    assert not (set(zip(out["doc_a"], out["doc_b"])) & e)


def test_label_propagation_refines_connected_components(spark):
    # labels only flow along edges, so a community can never span two
    # connected components; and every label is the id of some node in
    # the graph (labels originate as node ids)
    from rados_timestore_spark.queries_dedup import (
        graph_connected_components,
    )

    lpa = graph_label_propagation(spark, SF).toPandas()
    cc = graph_connected_components(spark, SF).toPandas()
    assert set(lpa["doc_id"]) == set(cc["node"])
    assert set(lpa["community"]) <= set(lpa["doc_id"])
    merged = lpa.merge(cc, left_on="doc_id", right_on="node")
    # each LPA community maps into exactly one CC component
    assert (merged.groupby("community")["component"].nunique() == 1).all()
    # comm_size is consistent with the labeling itself
    sizes = lpa.groupby("community")["doc_id"].count()
    assert all(sizes[c] == s for c, s in
               zip(lpa["community"], lpa["comm_size"]))
    assert (lpa["n_unconverged"] >= 0).all()
    # plurality refinement is REAL on this fixture: at least as many
    # communities as components (strictly more when a spurious bridge
    # is out-voted)
    assert lpa["community"].nunique() >= cc["component"].nunique()


# ------------------------------------------------ single-source BFS


def test_bfs_hops_on_the_path_gadget(spark, tmp_path):
    # source = min node = 0; the 3-path gives hops 0-1-2; the
    # disjoint triangle is unreachable and must be absent
    from rados_timestore_spark.queries_dedup import graph_bfs_hops

    sf = _corpus(tmp_path, _PATH_TRIANGLE)
    out = {r.node: r for r in graph_bfs_hops(spark, sf).collect()}
    assert {n: r.hops for n, r in out.items()} == {0: 0, 1: 1, 2: 2}
    assert all(r.n_frontier == 0 for r in out.values())


def test_bfs_takes_the_shorter_of_two_routes(spark, tmp_path):
    # a 4-cycle 0-1-2-3-0 (one block, prefixes within distance of
    # their cyclic neighbors only): node 2 is 2 hops from 0 either
    # way, nodes 1 and 3 are both 1 hop — min-propagation must not
    # accumulate the long way around
    from rados_timestore_spark.queries_dedup import graph_bfs_hops

    texts = [
        "k aaaaaa aaaaaa cccccc dddddd",    # 0
        "k zzzaaa aaaaaa cccccc dddddd",    # 1 (0<->1 close)
        "k zzzzzz aaazzz cccccc dddddd",    # 2 (1<->2 close)
        "k aaazzz aaazzz cccccc dddddd",    # 3 (2<->3, 3<->0 close)
    ]
    sf = _corpus(tmp_path, texts)
    from rados_timestore_spark.queries_dedup import dedup_fuzzy_prefix

    edges = {(r.doc_a, r.doc_b)
             for r in dedup_fuzzy_prefix(spark, sf).collect()}
    # law only meaningful if the gadget built a cycle containing 0
    assert (0, 1) in edges and (0, 3) in edges
    out = {r.node: r.hops for r in graph_bfs_hops(spark, sf).collect()}
    assert out[0] == 0 and out[1] == 1 and out[3] == 1
    assert out[2] <= 2


def test_bfs_fixture_invariants(spark):
    from rados_timestore_spark.queries_dedup import graph_bfs_hops

    out = graph_bfs_hops(spark, SF).toPandas()
    assert (out["hops"] == 0).sum() == 1        # exactly one source
    assert (out["hops"] >= 0).all()
    # hop levels are contiguous: a node at hop h>0 implies some node
    # at hop h-1 (BFS frontier cannot skip a level)
    hops = set(out["hops"])
    assert hops == set(range(max(hops) + 1))


# --------------------------------------------------- modularity


def test_modularity_on_the_gadget(spark, tmp_path):
    # path(0-1-2) + triangle(3-4-5): m=5; LPA keeps the two gadgets
    # apart, so whatever the final label split, the modularity
    # identities must hold exactly: sum(d_c) = 2m, sum(e_in) <= m,
    # and every q_num is the integer 4m*e_in - d_c^2
    from rados_timestore_spark.queries_dedup import graph_modularity

    sf = _corpus(tmp_path, _PATH_TRIANGLE)
    out = graph_modularity(spark, sf).toPandas()
    m = 5
    assert out["d_c"].sum() == 2 * m
    assert out["e_in"].sum() <= m
    assert (out["q_num_x4m2"]
            == 4 * m * out["e_in"] - out["d_c"] ** 2).all()
    # the triangle community exists and is perfectly assortative:
    # one community with e_in=3, d_c=6 -> share 4*5*3 - 36 = 24
    tri = out[(out["e_in"] == 3) & (out["d_c"] == 6)]
    assert len(tri) == 1 and int(tri["q_num_x4m2"].iloc[0]) == 24


def test_modularity_fixture_invariants(spark):
    from rados_timestore_spark.queries_dedup import graph_modularity

    out = graph_modularity(spark, SF).toPandas()
    two_m = out["d_c"].sum()
    assert two_m % 2 == 0
    m = two_m // 2
    assert out["e_in"].sum() <= m
    # Q = sum(q_num) / 4m^2 is a valid modularity (-0.5 <= Q <= 1)
    q = out["q_num_x4m2"].sum() / (4 * m * m)
    assert -0.5 <= q <= 1.0


def test_assortativity_identities(spark, tmp_path):
    # symmetrized edge list: sum(du) == sum(dv) (coinciding
    # marginals), m2 == 2*undirected edges, var_num >= 0, and on the
    # gadget the exact numerators are hand-checkable: path degrees
    # (1,2,1), triangle degrees (2,2,2)
    from rados_timestore_spark.queries_dedup import graph_assortativity

    sf = _corpus(tmp_path, _PATH_TRIANGLE)
    r = graph_assortativity(spark, sf).collect()[0]
    assert r.m2 == 10  # 5 undirected edges, both orientations
    # directed endpoint degrees: path edges contribute (1,2),(2,1),
    # (2,1),(1,2); triangle edges all (2,2) x6
    assert r.s_d == 1 + 2 + 2 + 1 + 12
    assert r.s_d2 == 1 + 4 + 4 + 1 + 24
    assert r.s_dd == 2 + 2 + 2 + 2 + 24
    assert r.cov_num == r.m2 * r.s_dd - r.s_d * r.s_d
    assert r.var_num == r.m2 * r.s_d2 - r.s_d * r.s_d
    assert r.var_num >= 0
