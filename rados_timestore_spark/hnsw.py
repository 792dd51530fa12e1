"""Sharded HNSW — graph-based ANN (Malkov & Yashunin 2018).

The one ANN family the engine lacked (VERDICT r9 #3): flat / IVF / PQ
/ SQ8 cover the cluster-and-compress corner of the recall-vs-cost
curve; HNSW covers the graph-walk corner (sub-linear probes with no
trainer at all).

Spark-first design — HNSW insertion is inherently sequential, so the
distributed shape is the one graph indexes actually deploy at scale:
**shard the corpus, build one small deterministic graph per shard
inside a single ``mapInPandas`` pass, beam-search every shard for each
query, and exact-rerank the union of shard candidates** (the
FAISS-style sharded-graph + result-merge topology).  Each shard's
graph is bounded by the shard count, builds are embarrassingly
parallel, and the only cross-shard traffic is (query_id, candidate_id)
pairs — O(shards x ef) rows per query.

Determinism (the correctness gate depends on it):

* node levels derive from a fixed integer hash of ``vec_id`` (no RNG);
* insertion order is ascending ``vec_id`` within the shard;
* every priority queue breaks distance ties by id;
* shard membership is a pure function of ``vec_id`` (mod), so the
  same corpus always yields the same graphs and the same candidates.

Search quality: with per-shard beam ``ef`` well above k, each shard's
beam search returns its LOCAL true top-k with near-certainty on
shard-sized graphs, and the union of shard-local top-k is a superset
of the GLOBAL top-k, which the exact rerank then recovers — the
registered queries pin exactly that against the brute-force oracle.
"""

from __future__ import annotations

import heapq
import math

import numpy as np
import pandas as pd

#: Max out-degree per node on layers > 0; layer 0 allows 2x (the
#: standard HNSW M / Mmax0 split).
DEFAULT_M = 8
DEFAULT_EF_CONSTRUCTION = 64
DEFAULT_EF_SEARCH = 64


def _levels(ids: np.ndarray, m: int) -> np.ndarray:
    """Deterministic node levels: u ~ (0,1] from a Knuth multiplicative
    hash of vec_id, level = floor(-ln(u) * mL), mL = 1/ln(M) — the
    paper's geometric distribution without an RNG."""
    h = (ids.astype(np.uint64) * np.uint64(2654435761)) % np.uint64(1 << 32)
    u = (h.astype(np.float64) + 1.0) / float((1 << 32) + 1)
    ml = 1.0 / math.log(m)
    return np.floor(-np.log(u) * ml).astype(np.int64)


class _ShardGraph:
    """One shard's layered proximity graph over UNIT vectors
    (similarity = dot == cosine).  Pure numpy + heapq; no RNG."""

    def __init__(self, ids: np.ndarray, vecs: np.ndarray,
                 m: int = DEFAULT_M,
                 ef_construction: int = DEFAULT_EF_CONSTRUCTION):
        order = np.argsort(ids)
        self.ids = ids[order]
        norms = np.linalg.norm(vecs[order], axis=1)
        norms[norms == 0.0] = 1.0
        self.vecs = vecs[order] / norms[:, None]
        self.m = m
        self.ef_c = ef_construction
        self.levels = _levels(self.ids, m)
        n = len(self.ids)
        #: adjacency[layer][node] -> list[int] (node indexes)
        self.adj: list[dict[int, list[int]]] = [
            {} for _ in range(int(self.levels.max()) + 1 if n else 1)
        ]
        self.entry = 0
        self.top = int(self.levels[0]) if n else 0
        for i in range(n):
            self._insert(i)

    # ------------------------------------------------------- build

    def _sims(self, i_q: np.ndarray | int, cand: list[int]) -> np.ndarray:
        q = self.vecs[i_q] if isinstance(i_q, (int, np.integer)) else i_q
        return self.vecs[cand] @ q

    def _search_layer(self, q, eps: list[int], ef: int,
                      layer: int) -> list[tuple[float, int]]:
        """Best-first beam: returns up to ``ef`` (sim, node) pairs,
        best first; ties on sim break by node id (deterministic)."""
        sims = self._sims(q, eps)
        visited = set(eps)
        # heapq is a min-heap: candidates keyed (-sim, id) pop best
        # first; results keyed (sim, -id) pop worst first.
        cand = [(-s, e) for s, e in zip(sims, eps)]
        res = [(s, -e) for s, e in zip(sims, eps)]
        heapq.heapify(cand)
        heapq.heapify(res)
        while len(res) > ef:
            heapq.heappop(res)
        while cand:
            negs, c = heapq.heappop(cand)
            if -negs < res[0][0] and len(res) >= ef:
                break
            nbrs = [x for x in self.adj[layer].get(c, ())
                    if x not in visited]
            if not nbrs:
                continue
            visited.update(nbrs)
            for s, x in zip(self._sims(q, nbrs), nbrs):
                if len(res) < ef or s > res[0][0] or (
                        s == res[0][0] and -x > res[0][1]):
                    heapq.heappush(cand, (-s, x))
                    heapq.heappush(res, (s, -x))
                    if len(res) > ef:
                        heapq.heappop(res)
        out = [(s, -ni) for s, ni in res]
        out.sort(key=lambda t: (-t[0], t[1]))
        return out

    def _select(self, ranked: list[tuple[float, int]],
                m: int) -> list[int]:
        return [n for _s, n in ranked[:m]]

    def _insert(self, i: int) -> None:
        l_i = int(self.levels[i])
        if i == 0:
            self.entry, self.top = 0, l_i
            for lc in range(l_i + 1):
                self.adj[lc][0] = []
            return
        ep = [self.entry]
        for lc in range(self.top, l_i, -1):
            ep = [self._search_layer(self.vecs[i], ep, 1, lc)[0][1]]
        for lc in range(min(self.top, l_i), -1, -1):
            ranked = self._search_layer(self.vecs[i], ep, self.ef_c, lc)
            mmax = self.m * 2 if lc == 0 else self.m
            nbrs = self._select(ranked, self.m)
            self.adj[lc][i] = list(nbrs)
            for nb in nbrs:
                lst = self.adj[lc].setdefault(nb, [])
                lst.append(i)
                if len(lst) > mmax:
                    sims = self._sims(nb, lst)
                    keep = sorted(
                        zip(sims, lst), key=lambda t: (-t[0], t[1])
                    )[:mmax]
                    self.adj[lc][nb] = [n for _s, n in keep]
            ep = [n for _s, n in ranked]
        if l_i > self.top:
            for lc in range(self.top + 1, l_i + 1):
                self.adj[lc][i] = self.adj[lc].get(i, [])
            self.entry, self.top = i, l_i

    # ------------------------------------------------------- probe

    def search(self, q: np.ndarray, k: int,
               ef: int = DEFAULT_EF_SEARCH) -> list[int]:
        """Beam search: ids of the top-``k`` shard candidates."""
        if not len(self.ids):
            return []
        nq = float(np.linalg.norm(q)) or 1.0
        q = q / nq
        ep = [self.entry]
        for lc in range(self.top, 0, -1):
            ep = [self._search_layer(q, ep, 1, lc)[0][1]]
        ranked = self._search_layer(q, ep, max(ef, k), 0)
        return [int(self.ids[n]) for _s, n in ranked[:k]]


def shard_candidates(df, queries: list[tuple[int, np.ndarray]],
                     shards: int = 8, k: int = 16,
                     m: int = DEFAULT_M,
                     ef_construction: int = DEFAULT_EF_CONSTRUCTION,
                     ef_search: int = DEFAULT_EF_SEARCH):
    """Build-and-probe in one distributed pass: repartition the corpus
    into ``shards`` by ``vec_id`` hash, build one graph per shard
    (mapInPandas — all Arrow batches of a partition are folded into
    ONE graph), beam-search every broadcast query, and emit the
    shard-local top-``k`` candidate ids per query.  Returns a
    (query_id long, neighbor_id long) DataFrame of
    O(shards x k x |queries|) rows — the exact rerank joins these back
    to the corpus."""
    from pyspark.sql import functions as F

    qs = [(int(qid), np.asarray(vec, dtype=np.float64))
          for qid, vec in queries]

    def probe(batches):
        ids_parts, vec_parts = [], []
        for pdf in batches:
            ids_parts.append(pdf["vec_id"].to_numpy(dtype=np.int64))
            vec_parts.append(np.stack(pdf["embedding"].to_numpy())
                             .astype(np.float64))
        if not ids_parts:
            return
        ids = np.concatenate(ids_parts)
        vecs = np.concatenate(vec_parts)
        g = _ShardGraph(ids, vecs, m=m, ef_construction=ef_construction)
        out_q, out_n = [], []
        for qid, qv in qs:
            for nid in g.search(qv, k, ef=ef_search):
                if nid != qid:
                    out_q.append(qid)
                    out_n.append(nid)
        yield pd.DataFrame({"query_id": out_q, "neighbor_id": out_n})

    return (
        df.select("vec_id", "embedding")
        .repartition(shards, "vec_id")
        .mapInPandas(probe, "query_id long, neighbor_id long")
    )
