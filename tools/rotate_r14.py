"""One-shot r14 rotation executor (ROADMAP r13 plan, VERDICT r13 #1).

Edits priority= lines inside @register(...) decorators:
  * promotes the 19 R14_REFRESH_PLAN queries + sim_hnswidx_reshard_probe
    + ts_compact_roundtrip to priority=70
  * demotes the 21 r13 non-bench incumbents to priority=900

Run once from the repo root; idempotent (re-running makes no further
changes because the target lines are already rewritten).
"""

import glob
import re

PROMOTE = {
    # 19 r5-evidence refreshes (R14_REFRESH_PLAN, tests/test_registry.py)
    "dedup_semantic", "sim_kmeans_quantizer", "mm_decode_ppm",
    "pipeline_corpus_curation", "tpch_window_top_orders_per_customer",
    "tpch_agg_distinct_priority", "tpch_semijoin_open_orders",
    "tpch_antijoin_silent_customers", "tpch_q6_forecast_revenue",
    "tpch_q4_order_priority", "tpch_q18_large_orders",
    "tpch_rollup_revenue", "tpch_q14_promo_effect",
    "tpch_q19_disjunctive_predicates", "tpch_q7_volume_shipping",
    "tpch_q9_product_profit", "tpch_q13_customer_distribution",
    "tpch_q15_top_supplier", "tpch_q16_supplier_part_counts",
    # the r13 carve-out certificate (EXPECTED_CARVEOUT_BACKLOG)
    "sim_hnswidx_reshard_probe",
    # oldest-registered r6 evidence (ROADMAP r13 arithmetic)
    "ts_compact_roundtrip",
}
PROMOTE_COMMENT = {
    "sim_hnswidx_reshard_probe": (
        "priority=70,  # promoted in r14 for first driver evidence "
        "(r13 carve-out certificate; VERDICT r13 #1)"
    ),
}
PROMOTE_DEFAULT = (
    "priority=70,  # evidence refresh r14: oldest driver evidence "
    "(R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)"
)

DEMOTE = {
    "sim_hnswidx_filtered_probe", "sim_hnswidx_probe_df",
    "streaming_sessionize", "text_lang_id", "text_length_buckets",
    "text_repetition", "text_split_assign", "tpch_q2_min_cost_supplier",
    "tpch_q11_important_stock", "tpch_q12_late_shipments",
    "tpch_q17_small_quantity_revenue", "tpch_q20_dominant_suppliers",
    "tpch_q21_waiting_suppliers", "tpch_q22_global_sales_opportunity",
    "streaming_asof_join", "streaming_asof_exact", "streaming_asof_update",
    "text_filter_pipeline", "dedup_minhash_pairs", "sim_ivf_recall",
    "mm_feature_extract",
}
DEMOTE_COMMENT = (
    "priority=900,  # demoted in r14 after r13 driver green, to rotate "
    "the r13 certificate + oldest-evidence refreshes into the window "
    "(verified locally by tools/check_correctness.py)"
)


def rewrite(path: str) -> int:
    """Rewrite priority lines decorator-by-decorator.

    The span of each @register(...) decorator runs from its opening
    line to the `def <fn_name>(` line that follows it — scanning for a
    bare `)` is WRONG because multi-line oracle SQL strings contain
    such lines.  Within the span, only a line indented exactly four
    spaces and starting with `priority=` is the decorator's own
    priority argument (SQL bodies never match that shape); if none
    exists (defaulted priority=100), insert one just before the span's
    final line, which is the decorator's closing `)` at column 0.
    """
    with open(path) as fh:
        lines = fh.readlines()
    changed = 0
    i = 0
    while i < len(lines):
        m = re.match(r'\s*"(\w+)",\s*$', lines[i])
        if m and i > 0 and "@register(" in lines[i - 1]:
            name = m.group(1)
            if name in PROMOTE or name in DEMOTE:
                # find the decorated def — the decorator ends right above
                j = i + 1
                def_at = None
                while j < len(lines):
                    if re.match(r"def \w+\(", lines[j]):
                        def_at = j
                        break
                    j += 1
                assert def_at is not None, (path, name)
                span = range(i + 1, def_at)
                pri_at = None
                for k in span:
                    if re.match(r"    priority=\d+", lines[k]) and \
                            not lines[k].startswith("     "):
                        pri_at = k
                        break
                new = (PROMOTE_COMMENT.get(name, PROMOTE_DEFAULT)
                       if name in PROMOTE else DEMOTE_COMMENT)
                if pri_at is not None:
                    if lines[pri_at].strip() != new:
                        lines[pri_at] = f"    {new}\n"
                        changed += 1
                else:
                    close_at = def_at - 1
                    assert lines[close_at].rstrip() == ")", (
                        path, name, lines[close_at])
                    lines.insert(close_at, f"    {new}\n")
                    changed += 1
        i += 1
    if changed:
        with open(path, "w") as fh:
            fh.writelines(lines)
    return changed


if __name__ == "__main__":
    total = 0
    hit: dict[str, int] = {}
    for path in sorted(glob.glob("rados_timestore_spark/queries_*.py")):
        n = rewrite(path)
        if n:
            hit[path] = n
            total += n
    print(f"rewrote {total} priority lines: {hit}")
    expected = len(PROMOTE) + len(DEMOTE)
    if total != expected:
        # text_lang_id's decorator packs name/oracle/tags on one line,
        # so the scanner skips it — its r14 demotion was hand-edited
        # (queries_text.py).  Any other shortfall needs a hand check;
        # tests/test_registry.py pins the resulting window exactly.
        print(f"NOTE: expected {expected} rewrites, got {total} — "
              f"verify the remainder by hand (see docstring)")
