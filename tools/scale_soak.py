"""Scale soak for the LLM-pipeline families: run the dedup/similarity/
text bench queries at sf0.1 AND at a locally-generated ~10x corpus,
and report the per-query scaling exponent  log(t_10x / t_1x) / log(10)
— ~1.0 means linear, >>1 means a quadratic constant is hiding behind
the df/bucket caps at small scale.

The 10x corpus preserves the fixtures' statistical structure instead of
naively replicating rows (10 exact copies would multiply every
shingle's document frequency by 10 and blow past the stop-shingle cap,
changing the workload, not just its size):

* documents: 10 copies; copy k's text is character-rotated with a
  per-copy ``translate`` mapping, so within-copy near-dup structure is
  IDENTICAL to the original while cross-copy shingles never collide —
  i.e. 10 independent sf0.1 corpora = one honest sf1.
* embeddings: 10 copies with the vector dimensions rolled by a
  per-copy offset — norms (and within-copy geometry) preserved,
  cross-copy cosine alignment destroyed.

Usage: python tools/scale_soak.py [out_dir] (default /tmp/scale_soak)
"""

from __future__ import annotations

import json
import math
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

COPIES = int(os.environ.get("SOAK_COPIES", "10"))
SRC = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

SOAK_QUERIES = (
    "dedup_exact",
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "sim_neardup_pairs",
    "sim_ivf_ann",
    "sim_ivf_kmeans",
    "sim_kmeans_quantizer",
    "sim_topk_bruteforce",
    "sim_pq_ann",
    "sim_ivfpq_ann",
    "sim_pq_rerank",
    "sim_ivfpq_rerank",
    "dedup_bloom",
    "text_stats",
    "text_word_freq",
    "text_winnow_fingerprint",
    "text_word_assoc",
    "text_pack_sequences",
    "text_tfidf_top_terms",
    "graph_pagerank",
    "mm_decode_png",
)

#: Engine-core queries over the events table (VERDICT r4 item 8):
#: the bench-tagged store/timeseries set.  ``SOAK_FAMILY=ts`` runs
#: these instead of the documents/embeddings set.
SOAK_TS_QUERIES = (
    "ts_read_simple",
    "ts_dedup_first_wins",
    "ts_latest_per_key",
    "ts_store_roundtrip",
    "ts_asof_join",
    "ts_rollup_hourly",
    "ts_ohlc_hourly",
    "ts_zorder_stats",
    "ts_json_props",
    "ts_pivot_event_counts",
    "ts_funnel",
    "ts_cohort_retention",
    "ts_anomaly_zscore",
    "ts_moving_window_sum",
    "ts_bulk_backfill",
    "ts_gapfill_locf",
    "ts_counter_rate",
    "ts_quantiles",
    "ts_time_weighted_avg",
    "ts_m4_downsample",
)

_ALPHA = "abcdefghijklmnopqrstuvwxyz"


def build_events(spark, out_dir: str) -> None:
    """~COPIES x events preserving statistical structure: copy k keeps
    every timestamp (per-user time densities, window/epoch populations
    unchanged) but shifts user_id by k*n_users and event_id by
    k*n_events — COPIES independent user populations over the same
    time range, i.e. an honest horizontal scale-up of the fixture."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    parts = []
    for k in range(COPIES):
        parts.append(ev.select(
            (F.col("event_id") + F.lit(k * n_events)).alias("event_id"),
            "ts",
            (F.col("user_id") + F.lit(k * n_users)).alias("user_id"),
            *[c for c in ev.columns
              if c not in ("event_id", "ts", "user_id")],
        ))
    allev = parts[0]
    for p in parts[1:]:
        allev = allev.unionByName(p)
    os.makedirs(out_dir, exist_ok=True)
    allev.repartition(8).write.mode("overwrite") \
        .parquet(f"{out_dir}/events.parquet")


def build_corpus(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    n_vecs = emb.agg(F.max("vec_id")).collect()[0][0] + 1
    dim = len(emb.select("embedding").head()[0])

    doc_parts, emb_parts = [], []
    for k in range(COPIES):
        # two-character rotation pair -> 26*26 distinct mappings, so
        # COPIES > 26 still never collides across copies
        rot = _ALPHA[k % 26:] + _ALPHA[:k % 26]
        rot = rot.translate(str.maketrans(
            _ALPHA, _ALPHA[(k // 26) % 26:] + _ALPHA[:(k // 26) % 26]))
        d = docs.select(
            (F.col("doc_id") + F.lit(k * n_docs)).alias("doc_id"),
            F.translate("text", _ALPHA, rot).alias("text"),
            *[c for c in docs.columns if c not in ("doc_id", "text")],
        )
        doc_parts.append(d)
        off = (k * 7) % dim
        e = emb.select(
            (F.col("vec_id") + F.lit(k * n_vecs)).alias("vec_id"),
            F.concat(
                F.slice("embedding", off + 1, dim - off),
                F.slice("embedding", 1, off),
            ).alias("embedding"),
            *[c for c in emb.columns if c not in ("vec_id", "embedding")],
        )
        emb_parts.append(e)

    os.makedirs(out_dir, exist_ok=True)
    all_docs = doc_parts[0]
    for d in doc_parts[1:]:
        all_docs = all_docs.unionByName(d)
    all_docs.repartition(8).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")
    all_emb = emb_parts[0]
    for e in emb_parts[1:]:
        all_emb = all_emb.unionByName(e)
    all_emb.repartition(8).write.mode("overwrite") \
        .parquet(f"{out_dir}/embeddings.parquet")


#: Queries for the constant-density soak (VERDICT r5 item 6): the
#: pair-producing shingle joins whose cost could hide behind true-pair
#: growth in the standard soak corpus.
SOAK_CONST_DENSITY_QUERIES = (
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
)

#: SOAK_FAMILY=heavy (VERDICT r6 item 7): the shuffle-heavy set, run
#: one decade deeper — COPIES=10 over sf0.1 gives an sf1-equivalent
#: corpus (~60k docs -> ~600k, embeddings alike).
SOAK_HEAVY_QUERIES = (
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "sim_pq_ann",
    "sim_ivfpq_ann",
    "sim_pq_rerank",
    "sim_ivfpq_rerank",
    "text_pack_sequences_sharded",
    # r7 additions
    "sim_sq8_ann",
    "sim_ivfsq8_ann",
    "sim_ivf_ann_filtered",
    "text_bpe_merge_candidates",
    "graph_connected_components",
    "mm_jpeg_header",
    # late-r7 additions
    "text_chunk_overlap",
    "dedup_chunk_exact",
    "text_vocab_coverage",
    "text_mixture_sample",
    "sim_label_centroids",
)

#: SOAK_FAMILY=r8 (VERDICT r7 item 6): the r7-new operators the heavy
#: soak did NOT cover — streaming (sliding windows, incremental CMS),
#: the writer-daemon/compaction store paths, the text/columnar source
#: round-trips, and the SQ8 recall variants.  Mixed input tables, so
#: this family builds BOTH the scaled events table and the scaled
#: documents/embeddings corpus.
SOAK_R8_QUERIES = (
    "streaming_sliding_counts",
    "streaming_cms_cells",
    "ts_streaming_ingest",
    "ts_compact_dedup",
    "src_csv_roundtrip",
    "src_jsonl_roundtrip",
    "src_orc_roundtrip",
    "sim_sq8_recall",
    "sim_ivfsq8_recall",
    # late-r8 additions
    "ts_ttl_expire",
    "src_partitioned_roundtrip",
    "sim_rrf_fusion",
    "sketch_hdr_quantiles",
    "streaming_hdr_quantiles",
    "graph_triangle_count",
    "ts_rollup_cascade",
    "sim_mmr_select",
    "mm_image_ahash",
    "mm_ahash_neardup_pairs",
)


#: SOAK_FAMILY=r9: the r9-new operators at 10x — exact substring
#: dedup (expected ~linear: one gram scan + hash agg, no pair
#: generator) and the persisted vector-index probes (expected ~linear
#: in probed-bucket bytes: k is fixed, so buckets grow with the
#: corpus; the win vs in-query ANN is the nprobe/k fraction and the
#: absent trainer/assignment, not sub-linear probing).
SOAK_R9_QUERIES = (
    "dedup_substring_spans",
    "dedup_substring_scrub",
    "sim_vecidx_probe",
    "sim_vecidx_append_probe",
)

#: SOAK_FAMILY=r9b: the late-r9 operator batch at 10x — downsampling
#: /changepoint/seasonal (expected ~linear: windows and hash aggs
#: partitioned by series key), the graph additions (k-core peeling is
#: O(edges) per round; jaccard wedges bounded by the center cap), and
#: the index retraction probe (delete cost is victim-bucket-bounded;
#: the probe is the usual nprobe fraction).
SOAK_R9B_QUERIES = (
    "ts_lttb_downsample",
    "ts_cusum_changepoint",
    "ts_seasonal_baseline",
    "graph_kcore",
    "graph_jaccard_neighbors",
    "sim_vecidx_delete_probe",
    "sim_range_search",
    "ts_rolling_active_users",
    "mm_wav_zero_crossings",
    "ts_rolling_volatility",
)

#: SOAK_FAMILY=r9c: the final late-r9 batch at 10x — the persisted
#: PQ probes + recall (expected ~linear in probed-bucket CODE bytes:
#: the ADC scan reads m*2 B per vector of nprobe/k of the corpus;
#: rerank adds a bounded Q x 20 semi-join; recall adds the broadcast
#: brute-force ground truth), the audio autocorrelation and BMP
#: decode (one map stage each), label propagation (3 rounds of edge
#: join + count agg + per-node top-1 — O(edges) per round like CC),
#: batch + streaming interval coalescing (one exchange on user_id /
#: watermark-bounded session state), and curated packing (the
#: curation stages' id-keyed joins + the one global cumulative window
#: that concat-and-chunk semantics require).
SOAK_R9C_QUERIES = (
    "sim_vecidxpq_probe",
    "sim_vecidxpq_rerank",
    "sim_vecidxpq_recall",
    "mm_wav_autocorr",
    "mm_decode_bmp",
    "graph_label_propagation",
    "ts_interval_coalesce",
    "streaming_interval_coalesce",
    "pipeline_curated_packing",
)

#: SOAK_FAMILY=r9d: the closing-r9 exact smoothers at 10x — both are
#: one-exchange single-Window ops with CONSTANT per-row state (a
#: 16-lag ring buffer / a 7-row frame), so the expected exponent is
#: ~log-linear in rows like the other per-series window family; the
#: streaming twin adds the stateful applyInPandasWithState pass whose
#: cost tracks micro-batch count like streaming_interval_coalesce.
SOAK_R9D_QUERIES = (
    "ts_ewma_smooth",
    "ts_rolling_median",
    "streaming_ewma",
)

#: SOAK_FAMILY=r9e: the closing-r9 document-table ops at 10x — the
#: GIF decode is one mapInPandas map stage (cost ~ total pixels); BFS
#: is _BFS_ITERS edge joins whose cost tracks the fuzzy-pair edge
#: count (reached-set bounded, like CC).
SOAK_R9E_QUERIES = (
    "mm_decode_gif",
    "graph_bfs_hops",
    "text_source_overlap",
    "graph_modularity",
    "dedup_winnow_pairs",
    "sketch_moments",
)

#: SOAK_FAMILY=r10: the r10-new operators at 10x — dual-index ingest
#: + per-kind rollover, the verify_df scrub (one aggregate scan), the
#: generation-swap KV MERGE, the BPE trainer/encoder (one corpus-scale
#: word count + vocab-sized rounds), and the HNSW family (per-shard
#: graph builds are n/shards-bounded; persisted probes reconstruct
#: without rebuilding).
SOAK_R10_QUERIES = (
    "ts_dual_index_rollover",
    "ts_verify_scrub",
    "ts_kv_merge_into",
    "text_bpe_train",
    "text_bpe_encode",
    "sim_hnsw_ann",
    "sim_hnswidx_probe",
    "sim_hnswidx_append_probe",
)

#: SOAK_FAMILY=r12: the r12-new probes at 10x — the filtered graph
#: probe (same cogrouped beams, 3x candidate pool, bounded label
#: semi-join) and the unbounded-query-frame probe_df (queries x
#: shards cogroup; candidate set |Q| x shards x k).
SOAK_R12_QUERIES = (
    "sim_hnswidx_filtered_probe",
    "sim_hnswidx_probe_df",
    "sim_hnswidx_probe",  # the baseline the two variants compose on
)

#: SOAK_FAMILY=r13: the reshard certificate at 10x — its fixture
#: builds under-sharded then reshards to the standard width, so the
#: soak covers BOTH the reshard rebuild and the resharded probe (the
#: dedicated mechanism soak is tools/reshard_soak.py).
SOAK_R13_QUERIES = (
    "sim_hnswidx_reshard_probe",
    "sim_hnswidx_probe",  # fresh-build baseline
)

#: SOAK_FAMILY=merge30 (VERDICT r10 #7): ts_kv_merge_into one decade
#: deeper — the r10 10x soak put it at exponent 0.65 (the family's
#: worst); the 30x run checks the time tracks OUTPUT-ROW growth (the
#: merged latest-view is one row per surviving key, and the 10x corpus
#: multiplies keys 10x) rather than a hidden superlinear fold term.
#: Run with ``SOAK_COPIES=30``.
SOAK_MERGE30_QUERIES = (
    "ts_kv_merge_into",
)

#: SOAK_FAMILY=graph30 (VERDICT r9 #9): the graph family one decade
#: deeper — the 10x soak put bfs_hops/modularity at exponent 0.45,
#: explained as tracking the fuzzy-pair edge count; the 30x run
#: confirms the exponent holds (i.e. the 0.45 is edge-density-driven,
#: not a hidden superlinear term whose knee sits past 10x).  Run with
#: ``SOAK_COPIES=30``.
SOAK_GRAPH30_QUERIES = (
    "graph_bfs_hops",
    "graph_modularity",
    "graph_kcore",
    "graph_label_propagation",
    "graph_jaccard_neighbors",
    "graph_assortativity",
    "graph_triangle_count",
)

#: SOAK_FAMILY=skew (VERDICT r8 item 4): the shuffle-heavy set under
#: ENGINEERED key skew vs a same-size uniform corpus.  The 10x soaks
#: scale uniformly, so hot-key mitigations (LSH hot-bucket salting,
#: per-user windows, fuzzy-prefix blocking) had never been MEASURED
#: under the shape they exist for.  Skew corpus: one user owns ~50%
#: of events; one document is duplicated _SKEW_CLUSTER times
#: verbatim (a dominant exact/minhash/simhash/ahash bucket and a
#: dense similarity-graph community).  Reported metric is
#: t_skew / t_uniform at equal row counts — >3x flags a missing
#: mitigation (BENCH_NOTES r9 records the table).
SOAK_SKEW_QUERIES = (
    "ts_ewma_smooth",
    "ts_rolling_median",
    "ts_sessionize",
    "ts_latest_per_key",
    "ts_dedup_first_wins",
    "dedup_minhash_lsh",
    "dedup_simhash_pairs",
    "mm_ahash_neardup_pairs",
    "graph_connected_components",
    "graph_triangle_count",
)

_SKEW_CLUSTER = 300


def build_events_skewed(spark, out_dir: str) -> None:
    """Same row count as build_events, but the first COPIES/2 copies
    collapse every user onto user_id 0 — one user owns ~half of all
    events while the remaining copies stay an honest uniform
    scale-up.  Stresses every per-user window/aggregate with one
    giant partition key."""
    from pyspark.sql import functions as F

    ev = spark.read.parquet(f"{SRC}/events.parquet")
    n_users = ev.agg(F.max("user_id")).collect()[0][0] + 1
    n_events = ev.agg(F.max("event_id")).collect()[0][0] + 1
    parts = []
    for k in range(COPIES):
        uid = (F.lit(0) if k < COPIES // 2
               else F.col("user_id") + F.lit(k * n_users))
        parts.append(ev.select(
            (F.col("event_id") + F.lit(k * n_events)).alias("event_id"),
            "ts",
            uid.cast("int").alias("user_id"),
            *[c for c in ev.columns
              if c not in ("event_id", "ts", "user_id")],
        ))
    allev = parts[0]
    for p in parts[1:]:
        allev = allev.unionByName(p)
    os.makedirs(out_dir, exist_ok=True)
    allev.repartition(8).write.mode("overwrite") \
        .parquet(f"{out_dir}/events.parquet")


def build_corpus_skewed(spark, out_dir: str) -> None:
    """Same row count as build_corpus, but the first _SKEW_CLUSTER
    docs of copy 1 are replaced with doc 0's text VERBATIM — one
    dominant duplicate cluster that lands in a single bucket of every
    banded scheme (minhash LSH bands, simhash Hamming bands, image
    ahash bands) and forms a dense community in the fuzzy similarity
    graph.  True-pair output grows quadratically in the cluster size
    by definition (C(300,2) pairs); what must NOT explode is the time
    spent outside that legitimate output."""
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    seed_text = (docs.filter(F.col("doc_id") == 0)
                 .select("text").collect()[0][0])
    other = [c for c in docs.columns if c not in ("doc_id", "text")]
    parts = [docs]
    for k in range(1, COPIES):
        new_id = F.col("doc_id") + F.lit(k * n_docs)
        src = k * len(_ALPHA) // COPIES
        rot = _ALPHA[src:] + _ALPHA[:src]
        text = F.translate("text", _ALPHA, rot)
        if k == 1:
            text = F.when(
                F.col("doc_id") < _SKEW_CLUSTER, F.lit(seed_text)
            ).otherwise(text)
        parts.append(docs.select(
            new_id.alias("doc_id"), text.alias("text"), *other))
    alldocs = parts[0]
    for p in parts[1:]:
        alldocs = alldocs.unionByName(p)
    os.makedirs(out_dir, exist_ok=True)
    alldocs.repartition(8).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")


def build_corpus_const_density(spark, out_dir: str) -> None:
    """COPIES x documents with near-dup density held CONSTANT.

    The standard soak corpus preserves within-copy duplicate structure,
    so the number of TRUE near-dup pairs grows linearly with COPIES —
    which means a pair-producing query's runtime growth mixes plan cost
    with genuine output growth (dedup_ngram_jaccard's 30x soak showed
    9.8x / exp 0.67 for exactly this reason).  This variant separates
    the two: copy 0 is the original corpus (its duplicate pairs are the
    ONLY pairs), and every document in copies >= 1 has a per-document
    8-hex-char salt appended to EVERY word, so no two distinct
    documents anywhere share a single word shingle.  Corpus size scales
    by COPIES while the true-pair count stays at the 1x level — any
    super-constant runtime growth is now pure plan cost (shingle
    explode + hash + join probe), which should be ~linear in corpus
    size with a small exponent on the pair side.
    """
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    n_docs = docs.agg(F.max("doc_id")).collect()[0][0] + 1
    parts = [docs]
    other = [c for c in docs.columns if c not in ("doc_id", "text")]
    for k in range(1, COPIES):
        new_id = F.col("doc_id") + F.lit(k * n_docs)
        # 8 hex chars (32 bits): with ~150k salted docs at 30 copies,
        # expected same-salt collisions ~ 150k^2/2^33 < 3 — the r6 review
        # found 16-bit salts produced ~31 colliding same-origin pairs,
        # quietly re-mixing true-pair growth into the plan-cost signal.
        salt = F.substring(F.md5(new_id.cast("string")), 1, 8)
        parts.append(docs.select(
            new_id.alias("doc_id"),
            F.regexp_replace(
                "text", F.lit(r"(\S+)"), F.concat(F.lit("$1"), salt)
            ).alias("text"),
            *other,
        ))
    alldocs = parts[0]
    for p in parts[1:]:
        alldocs = alldocs.unionByName(p)
    os.makedirs(out_dir, exist_ok=True)
    alldocs.repartition(8).write.mode("overwrite") \
        .parquet(f"{out_dir}/documents.parquet")


def time_queries(spark, sf_dir: str, names=SOAK_QUERIES) -> dict[str, float]:
    from rados_timestore_spark import registry

    qs = registry.queries()
    out = {}
    for name in names:
        fn = qs[name]
        best = None
        for _ in range(2):
            spark.catalog.clearCache()
            t0 = time.time()
            n = fn(spark, sf_dir).count()
            dt = time.time() - t0
            best = dt if best is None else min(best, dt)
        out[name] = round(best, 3)
        print(f"#   {name}: {out[name]}s rows={n}", file=sys.stderr)
    return out


def main() -> None:
    out_dir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_soak"
    from pyspark.sql import functions as F

    from rados_timestore_spark.session import get_spark

    spark = get_spark(app_name="scale-soak")
    import pandas as pd

    def _warm(x):
        return x

    _warm.__annotations__ = {"x": pd.Series, "return": pd.Series}
    spark.range(1000, numPartitions=32) \
        .select(F.pandas_udf(_warm, "long")("id")).count()

    family = os.environ.get("SOAK_FAMILY", "llm")
    names = {"ts": SOAK_TS_QUERIES,
             "const_density": SOAK_CONST_DENSITY_QUERIES,
             "heavy": SOAK_HEAVY_QUERIES,
             "r8": SOAK_R8_QUERIES,
             "r9": SOAK_R9_QUERIES,
             "r9b": SOAK_R9B_QUERIES,
             "r9c": SOAK_R9C_QUERIES,
             "r9d": SOAK_R9D_QUERIES,
             "r9e": SOAK_R9E_QUERIES,
             "r10": SOAK_R10_QUERIES,
             "r12": SOAK_R12_QUERIES,
             "r13": SOAK_R13_QUERIES,
             "graph30": SOAK_GRAPH30_QUERIES,
             "merge30": SOAK_MERGE30_QUERIES,
             "skew": SOAK_SKEW_QUERIES,
             }.get(family, SOAK_QUERIES)
    if family == "skew":
        # skew-vs-uniform at EQUAL row counts (not 1x-vs-10x): build
        # both 10x corpora and report t_skew / t_uniform per query.
        uni, skw = f"{out_dir}/uniform", f"{out_dir}/skew"
        if not os.path.exists(f"{uni}/events.parquet"):
            print(f"# building {COPIES}x uniform events ...",
                  file=sys.stderr)
            build_events(spark, uni)
        if not os.path.exists(f"{uni}/documents.parquet"):
            print(f"# building {COPIES}x uniform corpus ...",
                  file=sys.stderr)
            build_corpus(spark, uni)
        if not os.path.exists(f"{skw}/events.parquet"):
            print(f"# building {COPIES}x skewed events ...",
                  file=sys.stderr)
            build_events_skewed(spark, skw)
        if not os.path.exists(f"{skw}/documents.parquet"):
            print(f"# building {COPIES}x skewed corpus ...",
                  file=sys.stderr)
            build_corpus_skewed(spark, skw)
        print("# timing uniform ...", file=sys.stderr)
        t_u = time_queries(spark, uni, names)
        print("# timing skewed ...", file=sys.stderr)
        t_s = time_queries(spark, skw, names)
        table = {
            q: {"t_uniform": t_u[q], "t_skew": t_s[q],
                "ratio": round(t_s[q] / max(t_u[q], 1e-3), 2)}
            for q in names
        }
        print(json.dumps({"metric": "skew_soak", "copies": COPIES,
                          "cluster": _SKEW_CLUSTER, "queries": table}))
        return
    if family in ("r8", "r9b", "r9c", "r10"):
        if not os.path.exists(f"{out_dir}/events.parquet"):
            print(f"# building {COPIES}x events ...", file=sys.stderr)
            build_events(spark, out_dir)
        if not os.path.exists(f"{out_dir}/documents.parquet"):
            print(f"# building {COPIES}x corpus ...", file=sys.stderr)
            build_corpus(spark, out_dir)
    elif family in ("ts", "r9d", "merge30"):
        if not os.path.exists(f"{out_dir}/events.parquet"):
            print(f"# building {COPIES}x events ...", file=sys.stderr)
            build_events(spark, out_dir)
    elif family == "const_density":
        if not os.path.exists(f"{out_dir}/documents.parquet"):
            print(f"# building {COPIES}x const-density corpus ...",
                  file=sys.stderr)
            build_corpus_const_density(spark, out_dir)
    elif family == "r12":
        # embeddings-only family: gate on embeddings.parquet, not the
        # documents file another family's build may have left behind
        # (review finding r12)
        if not os.path.exists(f"{out_dir}/embeddings.parquet"):
            print(f"# building {COPIES}x corpus ...", file=sys.stderr)
            build_corpus(spark, out_dir)
    elif not os.path.exists(f"{out_dir}/documents.parquet"):
        print(f"# building {COPIES}x corpus ...", file=sys.stderr)
        build_corpus(spark, out_dir)

    print("# timing at 1x ...", file=sys.stderr)
    t1 = time_queries(spark, SRC, names)
    print(f"# timing at {COPIES}x ...", file=sys.stderr)
    t10 = time_queries(spark, out_dir, names)

    table = {}
    for q in names:
        expo = math.log(max(t10[q], 1e-3) / max(t1[q], 1e-3)) / math.log(COPIES)
        table[q] = {"t_1x": t1[q], "t_10x": t10[q],
                    "exponent": round(expo, 2)}
    print(json.dumps({"metric": "scale_soak", "copies": COPIES,
                      "queries": table}))


if __name__ == "__main__":
    main()
