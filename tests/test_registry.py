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


def test_oracle_output_types_are_hashable(con):
    # The driver hashes TYPED values: DuckDB HUGEINT/DECIMAL columns
    # render as float64 in pandas, so `3` hashes as "3.0" against
    # Spark's "3" and the row mismatches even when values agree — the
    # r7 driver catch (text_pack_sequences bin_id = HUGEINT quotient
    # of a sum() OVER).  Planning is enough to get output types; no
    # oracle may expose HUGEINT/UHUGEINT/DECIMAL — cast in the SQL.
    import sys, os
    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from check_correctness import oracle_type_errors

    bad = {}
    for name, sql in registry.oracle_sql().items():
        errs = oracle_type_errors(con, sql)
        if errs:
            bad[name] = errs
    assert not bad, f"oracles with non-hashable output types: {bad}"


def test_bench_set_nonempty():
    bench = registry.bench_queries()
    assert 10 <= len(bench) <= len(registry.queries())


# The r8 driver window, pinned exactly.  A misplaced priority= line
# once silently broke a rotation (ADVICE r4: text_lang_id's demotion
# parsed as dead code and pushed bench-tagged tpch_q1 out of the
# window) — membership drift must fail loudly, so any intentional
# rotation edits this set in the same commit.
EXPECTED_WINDOW = {
    # r12 rotation: the two NEW r11 certificates promoted for their
    # FIRST driver evidence (exactly-once streaming MERGE / HNSW
    # streaming ingest — ROADMAP r11 #14 and #8); the 19 non-bench
    # r11-green backlog promotions were demoted in exchange.
    "ts_kv_merge_stream", "sim_hnswidx_stream_probe",
    # oldest-evidence refreshes (VERDICT r10 #6 rotation, resumed):
    # these 19 queries' newest driver rows all date to r4 — the
    # oldest evidence in the registry after r11 refreshed mm_resize +
    # ts_codec_roundtrip.  Remaining r4 rows (streaming_sessionize,
    # text_lang_id/length_buckets/repetition/split_assign, tpch
    # part-2) queue for r13.
    "ts_epoch_stab", "ts_find_last", "ts_kv_enumerate",
    "ts_kv_merge_fold", "ts_kv_roundtrip", "ts_range_pruning",
    "ts_read_extended", "ts_rollover", "ts_store_roundtrip_extended",
    "ts_watermark", "dedup_contamination", "dedup_simhash",
    "mm_frame_sample", "mm_payload_stats", "sim_knn_join",
    "streaming_dedup_replay", "streaming_interval_join",
    "streaming_latest_per_key", "streaming_rollup_hourly",
    # the bench/headline set (must always be driver-visible)
    "ts_kv_merge_into", "sim_hnswidx_probe",
    "streaming_ewma", "graph_connected_components",
    "dedup_substring_spans",
    "ts_bulk_backfill", "text_winnow_fingerprint", "sim_ivf_kmeans",
    "sim_pq_ann", "sim_ivfpq_ann", "sim_vecidx_probe",
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
# r12 rotation promoted both r11 certificates into the window.  Only
# same-round NEW registrations may appear here; each MUST be rotated
# into the window next round.
EXPECTED_CARVEOUT_BACKLOG: set[str] = {
    # NEW r12 registrations — rotate into the r13 window
    "sim_hnswidx_filtered_probe",
    "sim_hnswidx_probe_df",
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


def test_registered_name_matches_function_name():
    # r10 regression guard: a refactor once left @register("x")
    # attached to a helper defined where x used to be — the registry
    # served the helper (wrong return type) under x's name.  The
    # wrapper preserves __name__ via functools.wraps, so key ==
    # function name holds for every correctly-attached registration.
    mismatched = {
        name: q.fn.__name__ for name, q in registry.QUERIES.items()
        if q.fn.__name__ != name
    }
    assert not mismatched, (
        f"registry key != decorated function name: {mismatched}"
    )
