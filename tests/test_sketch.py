"""Sketch-family laws: partition invariance (determinism under any
physical layout), the CMS over-estimate guarantee, the KMV error
bound, and streamed-sketch == batch-sketch equality."""

import os

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def _rows(df):
    return sorted(tuple(r) for r in df.collect())


def test_hll_partition_invariance(spark):
    """HLL registers (and therefore the estimate) must be identical
    under different shuffle layouts — the integer register sums are
    order-independent by construction."""
    from rados_timestore_spark.queries_sketch import sketch_hll_ngrams

    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = _rows(sketch_hll_ngrams(spark, SF_DIR))
        spark.catalog.clearCache()
        spark.conf.set("spark.sql.shuffle.partitions", "13")
        b = _rows(sketch_hll_ngrams(spark, SF_DIR))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)
        spark.catalog.clearCache()
    assert a == b


def test_cms_never_underestimates(spark):
    """Count-Min estimates are >= the exact count for every query
    point (the sketch's one-sided error guarantee)."""
    from rados_timestore_spark.queries_sketch import \
        sketch_cms_heavy_hitters

    rows = sketch_cms_heavy_hitters(spark, SF_DIR).collect()
    assert len(rows) == 25
    assert all(r["cms_est"] >= r["n_exact"] for r in rows)


def test_kmv_estimate_within_bound(spark):
    """KMV's (k-1)/h_k estimator lands within ~1/sqrt(k) of the true
    distinct-trigram cardinality (deterministic, so a fixed 35% bound
    is stable, not flaky)."""
    from rados_timestore_spark.queries_sketch import (
        _trigrams, sketch_kmv_sample)

    df = sketch_kmv_sample(spark, SF_DIR)
    est = df.select("kmv_estimate").head()[0]
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    true_n = _trigrams(docs).distinct().count()
    assert abs(est - true_n) / true_n < 0.35, (est, true_n)


def test_streaming_hll_equals_batch(spark):
    """The incrementally-maintained registers (two micro-batches)
    must equal the batch registers over the same corpus — the
    associative-merge law that makes sketches streamable."""
    from rados_timestore_spark.queries_sketch import (
        streaming_hll_registers, trigram_hll_registers)

    streamed = _rows(streaming_hll_registers(spark, SF_DIR))
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    assert streamed == _rows(trigram_hll_registers(docs))


def test_streaming_hll_checkpoint_recovery(spark, tmp_path):
    """The register state must survive a query RESTART: stream half
    the corpus to termination, then deliver the other half and start
    a SECOND query on the SAME checkpoint — the restored registers
    must fold the new batch in, ending equal to the batch sketch of
    the full corpus."""
    import pyspark.sql.functions as F

    from rados_timestore_spark.queries_sketch import \
        trigram_hll_registers

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet") \
        .select("doc_id", "text")
    src = str(tmp_path / "src")
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")

    def run_once():
        stream = (
            spark.readStream.schema(docs.schema)
            .option("maxFilesPerTrigger", 1).parquet(src)
        )

        def sink(batch_df, _epoch):
            batch_df.write.mode("overwrite").parquet(out)

        q = (
            trigram_hll_registers(stream)
            .writeStream.foreachBatch(sink).outputMode("complete")
            .option("checkpointLocation", ck)
            .trigger(availableNow=True).start()
        )
        q.awaitTermination(180)

    half_a = docs.filter(F.col("doc_id") % 2 == 0)
    half_b = docs.filter(F.col("doc_id") % 2 == 1)
    half_a.coalesce(1).write.parquet(src)
    run_once()
    partial = _rows(spark.read.parquet(out))
    assert partial == _rows(trigram_hll_registers(half_a))

    half_b.coalesce(1).write.mode("append").parquet(src)
    run_once()  # restart: recovers state from ck, folds half_b in
    final = _rows(spark.read.parquet(out))
    assert final == _rows(trigram_hll_registers(docs))


# ------------------------------------------- HDR quantile histogram (r8)


def test_hdr_quantile_estimate_brackets_exact(spark):
    # The pXX estimate is the lower bound of the bucket holding the
    # exact ceil-rank quantile: lb <= exact < lb + bucket_width, with
    # relative width 2^-P = 1/16.  lb(v) is monotone in v, so the
    # k-th smallest value lies in exactly the bucket the cumulative
    # rule selects — the bracket is a theorem, this pins the code to it.
    from rados_timestore_spark.queries_sketch import _HDR_P, hdr_lb
    from rados_timestore_spark.registry import queries

    sf = SF_DIR
    out = {r.event_type: r for r in
           queries()["sketch_hdr_quantiles"](spark, sf).collect()}
    ev = spark.read.parquet(f"{sf}/events.parquet").select(
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )
    rows = ev.collect()
    by_type = {}
    for r in rows:
        by_type.setdefault(r.event_type, []).append(r.v)
    assert set(by_type) == set(out)
    for et, vals in by_type.items():
        vals.sort()
        n = len(vals)
        for pct in (50, 90, 99):
            k = (n * pct + 99) // 100
            exact = vals[k - 1]
            lb = getattr(out[et], f"p{pct}_lb")
            e = exact.bit_length() - 1
            width = 1 << max(e - _HDR_P, 0)
            assert lb <= exact < lb + width, (et, pct, lb, exact, width)


def test_hdr_histogram_is_mergeable(spark):
    # Bucket counts are associative: histogram(A) + histogram(B) ==
    # histogram(A union B) — the property that lets per-day/per-tier
    # sketches roll up without touching raw data.
    from rados_timestore_spark.queries_sketch import hdr_lb

    df = spark.range(1, 2001).select(
        (F.col("id") * 37 % 5000 + 1).alias("v"))
    a = df.filter(F.col("v") % 2 == 0)
    b = df.filter(F.col("v") % 2 == 1)

    def hist(d):
        return {
            r.lb: r.c
            for r in d.select(hdr_lb("v").alias("lb"))
            .groupBy("lb").agg(F.count("*").alias("c")).collect()
        }

    ha, hb, hu = hist(a), hist(b), hist(df)
    merged = {k: ha.get(k, 0) + hb.get(k, 0) for k in set(ha) | set(hb)}
    assert merged == hu


def test_hdr_negative_value_fails_loudly(spark):
    # Signed input breaks the two's-complement bin() bucket math in
    # DIFFERENT ways per engine (DuckDB raises, Spark would wrap) —
    # the Spark side must fail the job, not hash garbage.
    import pytest
    from pyspark.sql import functions as F2

    from rados_timestore_spark.queries_sketch import hdr_lb

    df = spark.createDataFrame([(7,), (-5,)], "v long")
    with pytest.raises(Exception, match="negative"):
        df.select(hdr_lb("v").alias("lb")).collect()
    ok = spark.createDataFrame([(7,), (5,)], "v long")
    assert ok.select(hdr_lb("v").alias("lb")).count() == 2


def test_hdr_null_value_passes_through_and_is_filtered(spark):
    # ADVICE r8: NULL >= 0 is NULL, so the original guard took the
    # raise_error branch on NULL metrics — failing the whole Spark job
    # while the DuckDB oracle emitted a NULL-bucket row.  Policy now:
    # hdr_lb is NULL-transparent (NULL in -> NULL out, no error), and
    # hdr_histogram filters NULL values before bucketing (as does the
    # oracle's iv CTE), so the two engines agree by construction.
    from rados_timestore_spark.queries_sketch import hdr_histogram, hdr_lb

    df = spark.createDataFrame([(7,), (None,), (5,)], "v long")
    lbs = [r.lb for r in df.select(hdr_lb("v").alias("lb")).collect()]
    assert sorted(x for x in lbs if x is not None) == [5, 7]
    assert lbs.count(None) == 1

    ev = spark.createDataFrame(
        [("a", 1.0), ("a", None), ("b", 2.0)],
        "event_type string, value double",
    )
    h = hdr_histogram(ev)
    assert h.agg(F.sum("c")).collect()[0][0] == 2  # NULL row dropped
    assert h.filter(F.col("lb").isNull()).count() == 0


def test_moment_sketch_merges_by_addition(spark):
    # the mergeability certificate: power sums of two disjoint shards
    # ADD to the whole corpus's sums (the property that replaces a
    # per-group shuffle with map-side partials at scale), and the
    # derived variance numerator obeys Cauchy-Schwarz
    import pyspark.sql.functions as F

    from rados_timestore_spark.queries_sketch import sketch_moments

    sf = "/root/testdata/sf0.001"
    whole = {r.event_type: r for r in
             sketch_moments(spark, sf).collect()}

    ev = spark.read.parquet(f"{sf}/events.parquet")
    v = F.floor(F.col("value")).cast("long").alias("v")
    sums = ["n", "s1", "s2", "s3", "s4"]

    def shard(pred):
        x = ev.filter(pred).select("event_type", v)
        return {r.event_type: r for r in x.groupBy("event_type").agg(
            F.count("*").alias("n"), F.sum("v").alias("s1"),
            F.sum(F.expr("v*v")).alias("s2"),
            F.sum(F.expr("v*v*v")).alias("s3"),
            F.sum(F.expr("v*v*v*v")).alias("s4")).collect()}

    a = shard(F.col("event_id") % 2 == 0)
    b = shard(F.col("event_id") % 2 == 1)
    for et, w in whole.items():
        for c in sums:
            merged = (a[et][c] if et in a else 0) + \
                     (b[et][c] if et in b else 0)
            assert merged == w[c], (et, c)
        assert w.m2_num == w.n * w.s2 - w.s1 * w.s1
        assert w.m2_num >= 0
