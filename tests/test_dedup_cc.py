"""Connected-components kernel tests (dedup_minhash_lsh's cluster
stage): local union-find vs distributed two-hop label propagation must
agree, and the two-hop shortcut must converge in O(log diameter)
rounds — the property that keeps the serial-barrier count small when
the edge set outgrows the driver."""

import pytest

from rados_timestore_spark import queries_dedup as qd


def _labels(df):
    return {r.doc_id: r.rep for r in df.collect()}


def _chain_edges(spark, n):
    return spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "doc_a long, doc_b long"
    )


def test_cc_local_chain(spark):
    got = _labels(qd._connected_components(spark, _chain_edges(spark, 20)))
    assert got == {i: 0 for i in range(20)}


def test_cc_distributed_matches_local_and_round_bound(spark, monkeypatch):
    # Force the distributed path; a 64-node chain has diameter 63, so
    # one-hop-per-round propagation would need ~63 rounds (> the 32
    # cap); the two-hop shortcut must finish well under log2(64)*2.
    monkeypatch.setattr(qd, "_CC_LOCAL_MAX_EDGES", 0)
    edges = _chain_edges(spark, 64).union(
        spark.createDataFrame(
            [(100, 101), (101, 102), (200, 100)], "doc_a long, doc_b long"
        )
    )
    got = _labels(qd._connected_components(spark, edges))
    want = {i: 0 for i in range(64)}
    want.update({100: 100, 101: 100, 102: 100, 200: 100})
    assert got == want
    assert qd._LAST_CC_ROUNDS <= 12, qd._LAST_CC_ROUNDS
