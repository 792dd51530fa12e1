"""Registry contract sanity: every query has a callable, every oracle
parses in DuckDB against the driver's view set, bench set is non-empty.
Catches oracle SQL typos without paying for Spark execution."""

import duckdb
import pytest

from rados_timestore_spark import registry

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


@pytest.fixture(scope="module")
def con():
    con = duckdb.connect()
    sf = "/root/testdata/sf0.001"
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf}/{t}.parquet'")
    return con


def test_no_load_errors():
    registry.queries()
    assert registry.LOAD_ERRORS == {}


def test_every_query_is_callable():
    qs = registry.queries()
    assert len(qs) >= 50
    for name, fn in qs.items():
        assert callable(fn), name


def test_oracles_cover_queries_and_parse(con):
    qs, oracles = registry.queries(), registry.oracle_sql()
    assert set(oracles) <= set(qs)
    # the vast majority must have oracles (rows-only is the exception)
    assert len(oracles) >= len(qs) - 3
    for name, sql in oracles.items():
        try:
            con.execute(f"EXPLAIN {sql}")
        except Exception as exc:  # pragma: no cover
            pytest.fail(f"oracle for {name} fails to plan: {exc}")


def test_bench_set_nonempty():
    bench = registry.bench_queries()
    assert 10 <= len(bench) <= len(registry.queries())


# The r7 driver window, pinned exactly.  A misplaced priority= line
# once silently broke a rotation (ADVICE r4: text_lang_id's demotion
# parsed as dead code and pushed bench-tagged tpch_q1 out of the
# window) — membership drift must fail loudly, so any intentional
# rotation edits this set in the same commit.
EXPECTED_WINDOW = {
    # r7 rotation part 1 (p=60): the 17 r6 carve-out queries, promoted
    # for their FIRST driver evidence; 27 non-bench r6-green incumbents
    # were demoted in exchange (VERDICT r6 "Next round" #1)
    "ts_cas_writer_guard", "ts_gapfill_locf", "ts_counter_rate",
    "ts_quantiles", "ts_time_weighted_avg", "ts_m4_downsample",
    "streaming_dedup_docs", "text_pack_sequences",
    "text_pack_sequences_sharded", "text_tfidf_top_terms",
    "text_bigram_surprisal", "sim_pq_rerank", "sim_pq_rerank_recall",
    "sim_ivfpq_rerank", "sim_ivfpq_rerank_recall",
    "sim_matryoshka_recall", "mm_wav_rms",
    # r7 rotation part 2 (p=70): the 10 queries with the OLDEST driver
    # evidence (r2/r3-green, unseen since), re-promoted so rotation
    # periodically refreshes old evidence (registry policy bullet 3)
    "tpch_q10_returned_items", "ts_closed_interval", "ts_delta_encode",
    "ts_empty_addresses", "ts_value_histogram", "dedup_exact_prefix",
    "mm_modality_routing", "text_quality_score", "text_token_count",
    "ts_bucket_placement",
    # the bench/headline set (must always be driver-visible)
    "ts_bulk_backfill", "text_winnow_fingerprint", "sim_ivf_kmeans",
    "sim_pq_ann", "sim_ivfpq_ann",
    "ts_read_simple", "ts_dedup_first_wins", "ts_latest_per_key",
    "ts_store_roundtrip", "ts_asof_join", "ts_rollup_hourly",
    "text_stats", "text_word_freq", "dedup_exact", "dedup_ngram_jaccard",
    "dedup_simhash_pairs", "dedup_minhash_lsh", "sim_topk_bruteforce",
    "sim_neardup_pairs", "sim_ivf_ann",
    "tpch_q1_pricing_summary", "tpch_q3_shipping_priority",
    "tpch_q5_local_supplier_volume",
}

# Queries registered past the window under the carve-out (100 < p < 900)
# that still lack a driver row.  MUST shrink to only same-round NEW
# registrations at the end of a rotation round (ADVICE r5: "consider a
# registry test asserting no query stays past the window for more than
# one round") — any name added here is a standing debt that the next
# round's rotation has to clear.
# r7 rotation cleared the whole 17-query r6 backlog (all promoted to
# p=60 for first driver evidence).  The entries below are NEW in r7
# (the window is full of never-checked promotions) and MUST be rotated
# into the driver window in r8.
EXPECTED_CARVEOUT_BACKLOG: set[str] = {
    "tpch_q2_partsupp", "tpch_q11_partsupp", "tpch_q20_partsupp",
    "sim_ivf_ann_filtered", "sim_sq8_ann", "sim_sq8_recall",
    "text_bpe_merge_candidates", "streaming_cms_cells",
    "graph_connected_components", "sim_ivfsq8_ann", "sim_ivfsq8_recall",
    "mm_jpeg_header", "streaming_sliding_counts",
    "src_csv_roundtrip", "src_jsonl_roundtrip", "text_mixture_sample",
    "tpch_q9_partsupp", "text_chunk_overlap", "sim_label_centroids",
    "ts_streaming_ingest", "src_orc_roundtrip", "dedup_chunk_exact",
    "ts_compact_dedup", "text_vocab_coverage",
}


def test_carveout_backlog_is_rotated():
    backlog = {
        n for n, q in registry._ordered() if 100 < q.priority < 900
    }
    assert backlog == EXPECTED_CARVEOUT_BACKLOG, (
        f"carve-out queries awaiting driver evidence drifted: "
        f"{sorted(backlog ^ EXPECTED_CARVEOUT_BACKLOG)} — rotate them "
        f"into the window (or update the pinned backlog with a comment "
        f"naming the round that will)"
    )


def test_driver_window_membership_pinned():
    from rados_timestore_spark import registry

    window = {n for n, _q in registry._ordered()[:50]}
    assert window == EXPECTED_WINDOW, (
        f"unexpected in window: {sorted(window - EXPECTED_WINDOW)}; "
        f"missing from window: {sorted(EXPECTED_WINDOW - window)}"
    )


def test_driver_window_composition():
    # The external driver verifies only the first 50 registry entries
    # per round (registry.register docstring).  Guard the rotation
    # invariants: every query family keeps at least one entry inside
    # the window, and the window is exactly full (an accidental
    # demotion that leaves unused slots wastes driver evidence).
    from rados_timestore_spark import registry

    ordered = registry._ordered()
    window = ordered[:50]
    families = {
        "ts_": False, "streaming_": False, "text_": False,
        "dedup_": False, "sim_": False, "mm_": False, "tpch_": False,
    }
    for name, _q in window:
        for fam in families:
            if name.startswith(fam):
                families[fam] = True
    missing = [f for f, seen in families.items() if not seen]
    assert not missing, f"families with no driver-window entry: {missing}"
    # Exactly-full window: entry 50 and 51 must both exist (the
    # registry is larger than the window) and every demoted entry
    # must carry priority > default so the cut is intentional.
    assert len(ordered) > 50
    assert all(q.priority <= 100 for _n, q in window)


def test_demoted_queries_have_prior_green_or_local_note():
    # Demotion policy (registry.register): only queries that already
    # have driver evidence may sit past the window.  Bench-tagged
    # queries are the headline set and must stay driver-visible:
    # NO entry past the window may be bench-tagged, regardless of
    # its priority value (a default-priority bench query squeezed out
    # by over-promotion is just as invisible as a demoted one —
    # exactly what the r4 text_lang_id bug caused).
    from rados_timestore_spark import registry

    for name, q in registry._ordered()[50:]:
        assert not q.bench, (
            f"{name}: bench-tagged query outside the driver window"
        )
        assert q.priority > 100, (
            f"{name}: outside the window without an explicit demotion"
        )
