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
    # r14 rotation (VERDICT r13 #1, plan pinned in ROADMAP r13
    # R14_REFRESH_PLAN): the 19 r5-evidence queries + the r13
    # carve-out certificate (sim_hnswidx_reshard_probe, first driver
    # evidence) + ts_compact_roundtrip (oldest-registered r6
    # evidence); the 21 r13-green non-bench incumbents demoted in
    # exchange.  ts_ohlc_hourly et al. (r6) roll to r15 — pinned in
    # R15_REFRESH_PLAN below.
    "dedup_semantic", "sim_kmeans_quantizer", "mm_decode_ppm",
    "pipeline_corpus_curation", "tpch_window_top_orders_per_customer",
    "tpch_agg_distinct_priority", "tpch_semijoin_open_orders",
    "tpch_antijoin_silent_customers", "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority", "tpch_q18_large_orders",
    "tpch_rollup_revenue", "tpch_q14_promo_effect",
    "tpch_q19_disjunctive_predicates", "tpch_q7_volume_shipping",
    "tpch_q9_product_profit", "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    "sim_hnswidx_reshard_probe", "ts_compact_roundtrip",
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
# r14 rotation promoted the r13 registration (sim_hnswidx_reshard_probe)
# into the window.  Only same-round NEW registrations may appear here;
# each MUST be rotated into the window next round.
EXPECTED_CARVEOUT_BACKLOG: set[str] = {
    # NEW r14 registration (the IVF retrain certificate, VERDICT r13
    # #2) — rotate into the r15 window; it takes the carve-out seat
    # counted in R15_REFRESH_PLAN below.
    "sim_vecidx_retrain_probe",
}


# The r15 rotation, pinned (VERDICT r13 #7): 21 non-bench seats =
# sim_vecidx_retrain_probe (the r14 backlog above) + 20 of the 26
# r6-evidence queries, chosen oldest-registration-first with ONE
# family-coverage swap: mm_wav_meta (registration position 21 of the
# 26) takes the twentieth seat in place of sim_ivfpq_recall, because
# the bench set has no mm_ entry and the window invariant
# (test_driver_window_composition) requires one — both hold r6
# evidence, so oldest-first is preserved (same precedent as r13's
# mm_feature_extract swap).  Rolling to r16: sim_ivfpq_recall,
# mm_decode_png, sketch_hll_ngrams, sketch_cms_heavy_hitters,
# sketch_kmv_sample, streaming_hll_registers.
R15_REFRESH_PLAN = {
    "ts_ohlc_hourly", "ts_zorder_stats", "ts_json_props",
    "ts_pivot_event_counts", "ts_funnel", "ts_cohort_retention",
    "ts_anomaly_zscore", "ts_moving_window_sum",
    "streaming_asof_watermark", "text_dup_spans", "text_pii_scrub",
    "text_unigram_surprisal", "text_stratified_sample",
    "text_word_assoc", "dedup_bloom", "dedup_fuzzy_prefix",
    "graph_pagerank", "sim_ivf_kmeans_recall", "sim_pq_recall",
    "mm_wav_meta",
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


def _oldest_first_skips(newest: dict[str, int],
                        window_refresh: list[str],
                        outside: list[str]) -> dict[str, int]:
    """Pure core of the oldest-first invariant (so a synthetic test can
    prove the tripwire still bites after the just-refreshed exclusion).

    Returns the outside-window queries whose evidence is older than the
    newest NON-just-refreshed in-window refresh seat — i.e. evidence a
    rotation commit skipped.  Empty dict = invariant holds.
    """
    current = max(newest.values())
    refresh_evidence = [
        newest[n] for n in window_refresh
        if n in newest and newest[n] != current
    ]
    if not refresh_evidence:
        return {}
    stale_cut = max(refresh_evidence)
    return {
        n: newest[n] for n in outside
        if n in newest and newest[n] < stale_cut
    }


def test_oldest_first_tripwire_bites_on_a_skipping_rotation():
    # VERDICT r13 #1 done-criterion: the reworked invariant must stay
    # RED when a rotation commit skips older evidence, and stay GREEN
    # when the only newer-than-outside evidence in the window is the
    # driver's own just-landed refresh.
    newest = {"a": 5, "b": 5, "c": 6, "d": 13, "e": 13}
    # driver just refreshed d,e (r13 = current max); window refreshes
    # a (r5) and c (r6) while b (r5) sits outside: c's seat skipped b.
    assert _oldest_first_skips(newest, ["a", "c", "d"], ["b", "e"]) == \
        {"b": 5}
    # same window but the non-refreshed seats hold the OLDEST rows —
    # no skip; d's r13 row is the driver's refresh, not a decision.
    assert _oldest_first_skips(newest, ["a", "b", "d"], ["c", "e"]) == {}
    # all in-window seats just refreshed (start-of-round state after
    # the driver file lands): nothing to compare, invariant holds.
    assert _oldest_first_skips(newest, ["d", "e"], ["a", "b", "c"]) == {}


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

    # _oldest_first_skips excludes seats whose newest evidence IS the
    # current max round: those were just refreshed by the driver —
    # inevitable at the start of every round, not a rotation decision.
    # Without the exclusion the suite was red on every judged tree
    # between the driver's CORRECTNESS file landing and the next
    # rotation commit (VERDICT r13 "What's wrong" #1): the assertion
    # couldn't distinguish "driver refreshed the window" (good) from
    # "a rotation commit skipped older evidence" (bad).  With it, the
    # test bites exactly when a rotation PROMOTES a query holding
    # newer evidence while older evidence sits outside the window
    # (proven by the synthetic test above).
    window_refresh = [n for n, q in in_window if not q.bench]
    outside = [n for n, _q in out_window]
    assert any(n in newest for n in outside)
    skipped = _oldest_first_skips(newest, window_refresh, outside)
    assert not skipped, (
        f"rotation skipped older evidence: these sit outside the "
        f"window with rows older than an in-window refresh seat: "
        f"{sorted(skipped.items(), key=lambda kv: kv[1])}"
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


def test_r15_refresh_plan_is_the_oldest_evidence():
    # The r15 plan must be drawn from the queries holding the oldest
    # outside-window evidence (VERDICT r13 #7) — the pin and the
    # history must agree, or the plan is stale.  Unlike r14 (19 r5
    # queries = ALL of the oldest round, so the plan was complete by
    # construction), the oldest round now holds 26 queries for 20
    # seats, so the selection rule is pinned instead: the plan is the
    # first 20 in registration order, modulo the one documented
    # family-coverage swap (mm_wav_meta for sim_ivfpq_recall).
    newest = _newest_green_rounds()
    window = {n for n, _q in registry._ordered()[:50]}
    oldest_outside = min(
        r for n, r in newest.items() if n not in window
    )
    plan_rounds = {n: newest.get(n) for n in R15_REFRESH_PLAN}
    assert all(r == oldest_outside for r in plan_rounds.values()), (
        f"R15_REFRESH_PLAN drifted from the evidence history: "
        f"{plan_rounds} vs oldest outside-window round {oldest_outside}"
    )
    # The plan + the named r16 roll-overs must PARTITION the
    # oldest-evidence set exactly — an order-independent pin
    # (in-process registration order shifts when another test imports
    # a query module directly, so a "first-N in registration order"
    # check is flaky inside the full suite; the partition is not).
    oldest = {
        n for n, _q in registry._ordered()
        if n not in window and newest.get(n) == oldest_outside
    }
    r16_rollover = {
        "sim_ivfpq_recall", "mm_decode_png", "sketch_hll_ngrams",
        "sketch_cms_heavy_hitters", "sketch_kmv_sample",
        "streaming_hll_registers",
    }
    assert R15_REFRESH_PLAN <= oldest
    assert len(R15_REFRESH_PLAN) == 20
    assert any(n.startswith("mm_") for n in R15_REFRESH_PLAN)
    assert oldest - R15_REFRESH_PLAN == r16_rollover, (
        f"r16 roll-over drifted: {sorted(oldest - R15_REFRESH_PLAN)}"
    )


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


def test_ordered_is_import_order_independent():
    # r14: the full suite exposed _ordered() as dependent on which
    # query module a process happened to import first (dict insertion
    # order), flaking any first-N-of-equal-priority reasoning.  The
    # canonical (priority, module rank, source position) key must make
    # a polluted-import process agree with a fresh one exactly.
    import os
    import subprocess
    import sys

    code = (
        "import sys; sys.path.insert(0, '.')\n"
        "import rados_timestore_spark.queries_sketch  # pollute first\n"
        "import rados_timestore_spark.queries_tpch2\n"
        "from rados_timestore_spark import registry\n"
        "print('\\n'.join(n for n, _q in registry._ordered()))\n"
    )
    polluted = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        cwd=os.path.join(os.path.dirname(__file__), ".."), timeout=120)
    assert polluted.returncode == 0, polluted.stderr[-2000:]
    here = [n for n, _q in registry._ordered()]
    assert polluted.stdout.split() == here
