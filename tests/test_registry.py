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
    # r13 rotation (VERDICT r12 #1, plan pinned in ROADMAP r12): the
    # two NEW r12 registrations promoted for their FIRST driver
    # evidence (filtered HNSW probe / unbounded-frame probe_df); the
    # 21 r12-green non-bench incumbents demoted in exchange.
    "sim_hnswidx_filtered_probe", "sim_hnswidx_probe_df",
    # oldest-evidence refreshes (oldest-first rotation): the 12
    # remaining r4-evidence queries + the 7 oldest r5-evidence
    # queries (by registration order).  The remaining 19 r5-evidence
    # queries roll to r14 — pinned in R14_REFRESH_PLAN below.
    "streaming_sessionize", "text_lang_id", "text_length_buckets",
    "text_repetition", "text_split_assign", "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock", "tpch_q12_late_shipments",
    "tpch_q17_small_quantity_revenue", "tpch_q20_dominant_suppliers",
    "tpch_q21_waiting_suppliers", "tpch_q22_global_sales_opportunity",
    # (mm_feature_extract takes the seventh r5 seat in place of
    # sim_kmeans_quantizer — the mm_ family-coverage invariant below
    # requires a multimodal entry and the plan's seven had none; both
    # hold r5 evidence, so oldest-first is preserved.)
    "streaming_asof_join", "streaming_asof_exact", "streaming_asof_update",
    "text_filter_pipeline", "dedup_minhash_pairs", "sim_ivf_recall",
    "mm_feature_extract",
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
# r13 rotation promoted both r12 registrations into the window.  Only
# same-round NEW registrations may appear here; each MUST be rotated
# into the window next round.
EXPECTED_CARVEOUT_BACKLOG: set[str] = {
    # NEW r13 registration (the reshard certificate) — rotate into
    # the r14 window; it takes one of the two r6-refresh seats, so
    # ts_ohlc_hourly rolls to r15 (ROADMAP r13 arithmetic).
    "sim_hnswidx_reshard_probe",
}


# The 19 r5-evidence queries that did not fit r13's 21 non-bench
# seats (ROADMAP r12 #1 arithmetic; VERDICT r12 #8).  The r14 rotation
# MUST promote these — test_rotation_takes_oldest_evidence below goes
# red at r14 if the rotation skips any of them, because they will then
# hold the registry's oldest evidence.  The remaining 2 seats:
# sim_hnswidx_reshard_probe (the r13 backlog above) +
# ts_compact_roundtrip (oldest-registered r6 evidence).
R14_REFRESH_PLAN = {
    "dedup_semantic", "sim_kmeans_quantizer", "mm_decode_ppm",
    "pipeline_corpus_curation", "tpch_window_top_orders_per_customer",
    "tpch_agg_distinct_priority", "tpch_semijoin_open_orders",
    "tpch_antijoin_silent_customers", "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority", "tpch_q18_large_orders",
    "tpch_rollup_revenue", "tpch_q14_promo_effect",
    "tpch_q19_disjunctive_predicates", "tpch_q7_volume_shipping",
    "tpch_q9_product_profit", "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
}


def _newest_green_rounds() -> dict[str, int]:
    """name -> newest round with a fully-green driver row, from the
    CORRECTNESS_r*.json history the repo carries."""
    import glob
    import json
    import os
    import re

    here = os.path.join(os.path.dirname(__file__), "..")
    newest: dict[str, int] = {}
    for path in glob.glob(os.path.join(here, "CORRECTNESS_r*.json")):
        rnd = int(re.search(r"r(\d+)\.json$", path).group(1))
        with open(path) as fh:
            rows = json.load(fh)
        for name, row in rows.items():
            if not isinstance(row, dict) or row.get("err"):
                continue
            if all(row.get(k) is not False
                   for k in ("rows_match", "schema_match", "hash_match")):
                newest[name] = max(newest.get(name, 0), rnd)
    return newest


def test_rotation_takes_oldest_evidence():
    # Evidence-age SLA (VERDICT r12 #2).  The backlog test above only
    # guards never-driver-checked queries; between r5 and r12, age
    # debt silently re-accumulated to 38 queries because nothing
    # forced each round's refresh seats to be the OLDEST evidence.
    # This pins the oldest-first invariant structurally: every
    # non-bench refresh seat inside the 50-entry driver window must
    # hold evidence no newer than any query left outside it.  A
    # rotation that skips an old query (refreshing something newer
    # instead) goes red immediately — debt can no longer accumulate
    # silently.
    #
    # Window arithmetic (VERDICT r12 #7): 29 bench-pinned seats leave
    # 21 refresh seats per round for the non-bench remainder, so the
    # full refresh cycle is ceil(non_bench / 21) rounds — ~10 at 239
    # registered queries.  A fixed small age cap (e.g. 6 rounds) is
    # mathematically unsatisfiable at this registry size; the
    # oldest-first invariant is the strongest enforceable guarantee,
    # and the absolute cap below tracks the feasible cycle length.
    import math

    newest = _newest_green_rounds()
    ordered = registry._ordered()
    in_window = ordered[:50]
    out_window = ordered[50:]

    refresh_evidence = [
        newest[n] for n, q in in_window
        if not q.bench and n in newest
    ]
    outside_evidence = {
        n: newest[n] for n, q in out_window if n in newest
    }
    assert refresh_evidence and outside_evidence
    stale_cut = max(refresh_evidence)
    skipped = {
        n: r for n, r in outside_evidence.items() if r < stale_cut
    }
    assert not skipped, (
        f"rotation skipped older evidence: window refreshes a query "
        f"last green in r{stale_cut} while these sit outside with "
        f"older rows: {sorted(skipped.items(), key=lambda kv: kv[1])}"
    )

    # Absolute backstop: no query's evidence may be older than one
    # full refresh cycle + 2 rounds of slack (new-certificate seats).
    current = max(newest.values())
    non_bench = sum(1 for _n, q in ordered if not q.bench)
    cycle = math.ceil(non_bench / 21)
    too_old = {
        n: r for n, r in newest.items()
        if n in dict(ordered) and current - r > cycle + 2
    }
    assert not too_old, f"evidence older than the feasible cycle: {too_old}"


def test_r14_refresh_plan_is_the_oldest_evidence():
    # The r14 plan must name exactly the queries holding the oldest
    # evidence once this round's window lands (VERDICT r12 #8) — the
    # pin and the history must agree, or the plan is stale.
    newest = _newest_green_rounds()
    window = {n for n, _q in registry._ordered()[:50]}
    oldest_outside = min(
        r for n, r in newest.items() if n not in window
    )
    plan_rounds = {n: newest.get(n) for n in R14_REFRESH_PLAN}
    assert all(r == oldest_outside for r in plan_rounds.values()), (
        f"R14_REFRESH_PLAN drifted from the evidence history: "
        f"{plan_rounds} vs oldest outside-window round {oldest_outside}"
    )
    # and it must be complete: nothing else outside the window shares
    # that oldest round.
    extra = {
        n for n, r in newest.items()
        if r == oldest_outside and n not in window
        and n not in R14_REFRESH_PLAN
    }
    assert not extra, f"oldest-evidence queries missing from the plan: {extra}"


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
