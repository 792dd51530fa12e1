"""Cross-engine differential testing on RANDOMIZED corpora.

The driver gate and tools/check_correctness.py compare Spark vs DuckDB
on the fixed fixtures — strong, but a query could pass by luck of the
fixture's shape (e.g. no empty strata, no hash-threshold boundary
values, a friendly word distribution).  This suite regenerates tiny
random documents/events tables from seeds and runs a set of cheap
scan-shaped queries through BOTH engines on each, mirroring the
checker's normalize-and-compare exactly.  Three seeds x N queries:
fixture-independent evidence that the oracle equivalences are laws,
not coincidences.
"""

import os
import random
import sys

import duckdb
import pandas as pd
import pytest

from rados_timestore_spark import registry

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
from check_correctness import normalize as _kind_normalize  # noqa: E402

#: Cheap, corpus-shaped queries worth fuzzing (single scan / small
#: agg; no minutes-long ANN or streaming rigs).
DOC_QUERIES = [
    "text_stats", "text_word_freq", "text_token_count",
    "text_quality_score", "text_fingerprint", "dedup_exact",
    "text_length_buckets", "text_repetition", "text_split_assign",
    "text_mixture_sample", "text_bpe_merge_candidates",
    "sketch_cms_heavy_hitters", "sketch_kmv_sample",
    "text_winnow_fingerprint", "dedup_bloom",
    "text_chunk_overlap", "dedup_chunk_exact", "text_vocab_coverage",
    # mm codecs: their char-vs-byte oracle precondition needs a pure
    # ASCII corpus, which _rand_docs guarantees by construction
    "mm_jpeg_header", "mm_wav_meta", "mm_decode_png",
    "mm_image_ahash", "mm_ahash_neardup_pairs",
    "mm_wav_zero_crossings",
    "mm_wav_autocorr",
    "mm_decode_bmp",
    "graph_triangle_count",
    # r9: random small-vocabulary corpora produce accidental cross-doc
    # K-gram runs, probing span-boundary arithmetic off the fixture
    "dedup_substring_spans",
    "dedup_substring_scrub",
    # r9: the random corpora's accidental fuzzy-prefix graph probes
    # the peeling fixed point and the wedge/anti-join pair space
    "graph_kcore",
    "graph_jaccard_neighbors",
    # late r9: random ASCII drives the REAL LZW encoder through
    # arbitrary dictionary dynamics (width bumps at random points),
    # and the random fuzzy-prefix graph probes the BFS min-distance
    # fixed point from an arbitrary min-id source
    "mm_decode_gif",
    "graph_bfs_hops",
    # late r9: random source assignment probes the pair-space and
    # empty-text exclusion of the vocabulary-overlap join
    "text_source_overlap",
    # late r9: random community structure probes the exact
    # modularity identities (4m*e_in - d_c^2 shares, LEFT-join zeros)
    "graph_modularity",
    # late r9: random small-vocab corpora produce accidental shared
    # winnow fingerprints, probing the df cap + threshold boundary
    "dedup_winnow_pairs",
    # late r9: random degree structure probes the assortativity
    # numerator identities (symmetrized marginals coincide)
    "graph_assortativity",
]
EVENT_QUERIES = [
    "ts_rollup_hourly", "ts_value_histogram", "ts_ohlc_hourly",
    "ts_pivot_event_counts", "ts_moving_window_sum", "ts_quantiles",
    "ts_m4_downsample", "ts_counter_rate",
    "ts_funnel", "ts_cohort_retention", "ts_anomaly_zscore",
    "ts_gapfill_locf", "ts_time_weighted_avg", "ts_delta_encode",
    "ts_topk_per_series", "ts_sessionize", "ts_value_percentiles",
    # r8 additions: quantile histogram (random value distribution
    # probes bucket boundaries), partitioned round-trip (random day
    # spread), TTL expiry (random per-day epoch populations)
    "sketch_hdr_quantiles", "src_partitioned_roundtrip",
    "ts_ttl_expire", "ts_rollup_cascade", "ts_gapfill_interpolate",
    "sketch_hll_daily_users", "sketch_kmv_set_ops",
    "ts_ooo_lateness", "ts_heartbeat_gaps",
    # r9: random timestamps/values probe the LTTB area arithmetic
    # (DECIMAL cross-products, neighbor-mean anchors) off the fixture
    "ts_lttb_downsample",
    # r9: random values probe the CUSUM cross-multiplied argmax and
    # the seasonal-cell residual ranking off the fixture
    "ts_cusum_changepoint", "ts_seasonal_baseline",
    # r9: random day spreads probe the 7-day contribution explosion
    "ts_rolling_active_users",
    # r9: random values/timestamps probe the sliding-frame variance
    # numerator (n*sumsq - sum^2 over a RANGE frame)
    "ts_rolling_volatility",
    # late r9: random (t, event_id) interval layouts probe the
    # cumulative-max islands rule (swallowed intervals, touching ends)
    "ts_interval_coalesce",
    # late r9: random values probe the dyadic lag-weight unroll and
    # the sorted-frame 2x-median indexing at every frame size 1..7
    "ts_ewma_smooth", "ts_rolling_median",
    # late r9: random (possibly extreme) values probe the power-sum
    # overflow headroom and floor semantics cross-engine, and the
    # NULL-padded union of the schema-evolution certificate
    "sketch_moments", "src_schema_evolution",
    # late r9: random day spreads probe the observed-lag vs
    # calendar-lag distinction (NULL across gaps)
    "ts_period_over_period",
]
#: Embedding-driven queries: random float32 vectors probe the
#: float-determinism choreography (sequential-fold cosine, SQ8
#: floor/vmax, fixed-point centroid means) off the fixture's geometry.
EMB_QUERIES = [
    "sim_topk_bruteforce", "sim_sq8_ann", "sim_sq8_recall",
    "sim_label_centroids",
    # docs + embeddings: fusion join across both random tables
    "sim_rrf_fusion",
    "sim_mmr_select", "sim_centroid_drift",
    # r9: random geometry probes the threshold comparison (cos*100
    # vs integer floor) right at the boundary
    "sim_range_search",
]

WORDS = ("the a of and to in is on for data spark query time "
         "point store row alpha beta gamma delta".split())
EVENT_TYPES = ["view", "click", "purchase", "error"]


def _rand_docs(rng, n):
    rows = []
    for i in range(n):
        kind = rng.random()
        if kind < 0.05:
            text = ""
        elif kind < 0.15:
            text = rng.choice(WORDS)
        elif kind < 0.25:  # exact duplicate of an earlier doc
            text = rows[rng.randrange(len(rows))][1] if rows else "dup"
        else:
            text = " ".join(
                rng.choice(WORDS) for _ in range(rng.randrange(2, 60))
            )
        rows.append((
            i, text, rng.choice(["en", "de", "fr", "es"]),
            f"src{rng.randrange(20)}", len(text),
        ))
    return pd.DataFrame(
        rows, columns=["doc_id", "text", "lang", "source", "n_chars"]
    )


def _rand_emb(rng, n, dim=64):
    import numpy as np

    rows = []
    for i in range(n):
        if rng.random() < 0.03:
            v = [0.0] * dim          # zero vector (vmax-clamp path)
        else:
            v = [np.float32(rng.uniform(-1, 1)) for _ in range(dim)]
        rows.append((i, [float(np.float32(x)) for x in v],
                     rng.randrange(10)))
    df = pd.DataFrame(rows, columns=["vec_id", "embedding", "label"])
    return df


def _rand_events(rng, n):
    base = 1_704_067_200_000_000  # 2024-01-01 in µs
    rows = []
    for i in range(n):
        t = base + rng.randrange(0, 30 * 86_400_000_000)
        rows.append((
            i,
            pd.Timestamp(t, unit="us"),
            rng.randrange(0, 40),
            rng.choice(EVENT_TYPES),
            rng.randrange(0, 1000),
            '{"k": %d}' % rng.randrange(10),
        ))
    # Guaranteed SINGLE-EVENT user: empty lag/lead frames produce
    # all-NULL groups whose Spark sums return NULL where a CASE ELSE 0
    # oracle returns 0 — the r8 review bug class in ts_ooo_lateness /
    # ts_heartbeat_gaps that 40-user random draws rarely exercise.
    rows.append((
        n, pd.Timestamp(base + 12_345, unit="us"), 991,
        rng.choice(EVENT_TYPES), rng.randrange(0, 1000), '{"k": 0}',
    ))
    df = pd.DataFrame(rows, columns=[
        "event_id", "ts", "user_id", "event_type", "value", "props"])
    df["ts"] = df["ts"].astype("datetime64[us]")
    return df


# dtype-kind-preserving normalize shared with the merge gate — the
# old float-widening local copy would mask exactly the HUGEINT->float
# class the r7 driver caught (VERDICT r7 "What's wrong" #2)
def _normalize(df):
    return _kind_normalize(df)


TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module", params=[11, 23, 47])
def corpus(request, spark, tmp_path_factory):
    rng = random.Random(request.param)
    root = tmp_path_factory.mktemp(f"fuzz{request.param}")
    docs = _rand_docs(rng, 120)
    events = _rand_events(rng, 400)
    emb = _rand_emb(rng, 80)
    spark.createDataFrame(docs).coalesce(1) \
        .write.parquet(f"{root}/documents.parquet")
    spark.createDataFrame(events).coalesce(1) \
        .write.parquet(f"{root}/events.parquet")
    from pyspark.sql.types import (
        ArrayType, FloatType, IntegerType, LongType, StructField,
        StructType,
    )

    emb_schema = StructType([
        StructField("vec_id", LongType()),
        StructField("embedding", ArrayType(FloatType())),
        StructField("label", IntegerType()),
    ])
    spark.createDataFrame(emb, schema=emb_schema).coalesce(1) \
        .write.parquet(f"{root}/embeddings.parquet")
    # satisfy loaders for tables these queries never read
    for t in TABLES:
        if t in ("documents", "events", "embeddings"):
            continue
        spark.createDataFrame(
            pd.DataFrame({"dummy": [0]})
        ).write.mode("overwrite").parquet(f"{root}/{t}.parquet")
    con = duckdb.connect()
    # Spark writes each table as a directory of part files.
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM "
        f"'{root}/documents.parquet/*.parquet'")
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM "
        f"'{root}/events.parquet/*.parquet'")
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM "
        f"'{root}/embeddings.parquet/*.parquet'")
    return str(root), con


@pytest.mark.slow  # soak/fuzz: excluded from the default run (see pytest.ini)
@pytest.mark.parametrize("name", DOC_QUERIES + EVENT_QUERIES + EMB_QUERIES)
def test_cross_engine_on_random_corpus(corpus, spark, name):
    root, con = corpus
    qs, oracles = registry.queries(), registry.oracle_sql()
    got, gk = _normalize(qs[name](spark, root).toPandas())
    want, wk = _normalize(con.execute(oracles[name]).fetchdf())
    assert list(got.columns) == list(want.columns), name
    assert gk == wk, (name, gk, wk)  # int-vs-float kind = driver hash miss
    assert len(got) == len(want), name
    pd.testing.assert_frame_equal(got, want, check_dtype=False,
                                  check_exact=True)
