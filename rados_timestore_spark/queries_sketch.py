"""Sketch operators — HyperLogLog cardinality and Count-Min heavy
hitters — built DETERMINISTICALLY so the approximate answers
themselves hash-match a DuckDB oracle.

Spark's own approx sketches (``approx_count_distinct``,
``count_min_sketch``) are implementation-defined and can't be oracle-
checked; these re-derive the classic algorithms (Flajolet et al. 2007;
Cormode & Muthukrishnan 2005) from the repo's md5-based 60-bit hashes
(registry.py docstring), with every float kept out of aggregation:

* HLL register sums accumulate ``2^(54 - rho)`` as EXACT integers
  (rho <= 53, 256 registers * 2^54 < 2^63), so the shuffle order
  can't perturb the harmonic mean; the final estimate is one fixed
  left-associated IEEE expression over that integer.
* CMS cells and estimates are pure integer counts/mins.

Scale: both sketches are one explode + one hash aggregate of BOUNDED
state (256 registers; 4x512 cells) per group — the mergeable-summary
shape that replaces exact distinct/top-k shuffles at 100 TB (registers
and cells merge associatively across partitions/days, which exact
count-distinct does not).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rados_timestore_spark.queries_common import load_parallel, pin
from rados_timestore_spark.registry import register

_WORDS_SQL = "regexp_split_to_array(trim(lower(text)), '\\s+')"

#: HLL geometry: p=8 -> m=256 registers; 60-bit hash => 52 suffix
#: bits, rho in [1, 53]; integer scale 2^54 (sum <= 2^62).  Every
#: derived literal below (suffix shift, rho0, m^2, 2^scale) is
#: COMPUTED from these constants in both engines, so retuning m or
#: the scale cannot silently leave the estimate on stale constants
#: while still hash-matching (r5 review finding).
_HLL_M = 256
_HLL_P = _HLL_M.bit_length() - 1          # index bits (8)
_HLL_RHO0 = 60 - _HLL_P + 1               # rho for an all-zero suffix
_HLL_SCALE_POW = 54
assert _HLL_M * (1 << _HLL_SCALE_POW) < (1 << 63)  # int64 sum bound
assert _HLL_M & (_HLL_M - 1) == 0  # m must be a power of two

#: CMS geometry: d=4 rows x w=512 columns; row j's position is bits
#: [12j, 12j+9) of the gram hash.
_CMS_D = 4
_CMS_W = 512
_CMS_SHIFT = 12

_HASH_SQL = "('0x' || substr(md5(g), 1, 15))::BIGINT"


#: 60-bit user hash ("u" || user_id through md5) — shared by the
#: daily-users HLL and the KMV set-ops queries, Spark twin below.
_USER_HASH_SQL = "('0x' || substr(md5('u' || user_id), 1, 15))::BIGINT"


def _user_hash_col():
    """Spark twin of :data:`_USER_HASH_SQL`."""
    return F.conv(
        F.substring(
            F.md5(F.concat(F.lit("u"), F.col("user_id").cast("string"))),
            1, 15),
        16, 10,
    ).cast("long")


def _hll_rho_col():
    """rho(h) as a Column over column ``h`` — ONE definition for every
    HLL register builder (ngrams, streaming registers, daily users);
    a retune of the geometry constants must hit all of them at once
    (r8 review finding)."""
    suffix = F.shiftrightunsigned("h", _HLL_P)
    return F.when(suffix == 0, _HLL_RHO0).otherwise(
        _HLL_RHO0 - F.length(F.bin(suffix))
    )


def _hll_s_scaled_agg():
    """The two aggregate columns (s_scaled, n_registers) over a
    register frame with column ``rho`` — shared by every estimator."""
    return [
        (
            F.sum(F.expr(
                f"shiftleft(1L, CAST({_HLL_SCALE_POW} - rho AS INT))"))
            + (_HLL_M - F.count("*"))
            * F.lit(1 << _HLL_SCALE_POW).cast("long")
        ).cast("long").alias("s_scaled"),
        F.count("*").alias("n_registers"),
    ]


def _hll_est_col():
    """The raw-HLL estimate over column ``s_scaled`` — the Spark twin
    of ``_HLL_EST_SQL`` (one fixed left-associated IEEE chain)."""
    return (
        F.lit(0.7213) / (F.lit(1.0) + F.lit(1.079) / F.lit(float(_HLL_M)))
        * F.lit(float(_HLL_M * _HLL_M))
        * F.lit(float(1 << _HLL_SCALE_POW))
        / F.col("s_scaled").cast("double")
    )


def _cms_positions(col: str = "h") -> "F.Column":
    """Exploded (row j, column p) CMS cell coordinates for one gram
    hash — shared by the batch sketch, its point queries, and the
    streaming cell maintenance."""
    return F.explode(F.array(*[
        F.struct(
            F.lit(j).alias("j"),
            F.shiftrightunsigned(col, _CMS_SHIFT * j)
            .bitwiseAND(_CMS_W - 1).alias("p"),
        )
        for j in range(_CMS_D)
    ]))


def _grams_sql(n: int) -> str:
    """DuckDB n-gram list over the standard word split."""
    if n == 1:
        return "ws"
    join = " || ' ' || ".join(f"ws[i+{k}]" for k in range(n))
    return f"[{join} for i in generate_series(1, len(ws)-{n - 1})]"


def _trigrams(df: "DataFrame") -> "DataFrame":
    """(g) — every word-trigram occurrence of a documents-like frame
    with a ``text`` column.  The ONE definition of the trigram
    pipeline shared by CMS, KMV, and the HLL register build (r5
    review finding: three drifting copies)."""
    ws = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    grams = F.expr(
        "transform(sequence(0, size(ws) - 3), "
        "i -> array_join(slice(ws, i + 1, 3), ' '))"
    )
    return (
        df.select(ws.alias("ws")).filter(F.size("ws") >= 3)
        .select(F.explode(grams).alias("g"))
    )


def _hash_grams(df: "DataFrame") -> "DataFrame":
    """Attach the 60-bit md5 hash column ``h`` to a grams frame."""
    return df.select(
        "g",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
        .alias("h"),
    )


def _trigram_hashes(df: "DataFrame") -> "DataFrame":
    """(g, h) — trigram occurrences with hashes (see _trigrams)."""
    return _hash_grams(_trigrams(df))



_HLL_GRAMS_CTE = f"""
gx AS (
  SELECT 1 AS n, unnest({_grams_sql(1)}) AS g
  FROM (SELECT {_WORDS_SQL} AS ws FROM documents) t
  UNION ALL
  SELECT 2, unnest({_grams_sql(2)})
  FROM (SELECT {_WORDS_SQL} AS ws FROM documents) t
  UNION ALL
  SELECT 3, unnest({_grams_sql(3)})
  FROM (SELECT {_WORDS_SQL} AS ws FROM documents) t)
"""

#: One fixed left-associated IEEE expression; alpha_m =
#: 0.7213 / (1 + 1.079 / m) (Flajolet et al. 2007, m >= 128).
_HLL_EST_SQL = (
    f"0.7213 / (1.0 + 1.079 / {_HLL_M}.0) * {_HLL_M * _HLL_M}.0 * "
    f"{1 << _HLL_SCALE_POW}.0 / CAST(s_scaled AS DOUBLE)"
)


@register(
    "sketch_hll_ngrams",
    oracle=f"""
WITH {_HLL_GRAMS_CTE},
hx AS (SELECT DISTINCT n, {_HASH_SQL} AS h FROM gx),
reg AS (
  SELECT n, h & {_HLL_M - 1} AS bucket,
         max(CASE WHEN (h >> {_HLL_P}) = 0 THEN {_HLL_RHO0}
                  ELSE {_HLL_RHO0}
                       - length(format('{{:b}}', h >> {_HLL_P}))
             END) AS rho
  FROM hx GROUP BY n, bucket),
s AS (
  SELECT n,
         CAST(sum(1::BIGINT << ({_HLL_SCALE_POW} - rho)) AS BIGINT)
           + ({_HLL_M} - count(*))
             * (1::BIGINT << {_HLL_SCALE_POW}) AS s_scaled,
         count(*) AS n_registers
  FROM reg GROUP BY n),
ex AS (SELECT n, count(DISTINCT g) AS n_exact FROM gx GROUP BY n)
SELECT ex.n AS gram_n, ex.n_exact, s.n_registers,
       s.s_scaled, {_HLL_EST_SQL} AS n_hll
FROM ex JOIN s ON s.n = ex.n
""",
    tags=("sketch", "text"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def sketch_hll_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct-count of word 1/2/3-grams, side by side
    with the exact cardinality (31 / ~1k / ~16k in the fixtures — the
    three rows show the raw sketch under-range, near-range, and in its
    working regime; no small-range correction is applied, so the
    gram_n=1 row deliberately exhibits the documented raw-HLL bias).
    Registers merge associatively, so at 100 TB this is one map-side-
    combined aggregate of 256 longs per group, replacing the full
    distinct shuffle of exact count-distinct."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    ws = F.split(F.trim(F.lower(F.col("text"))), r"\s+")
    # ONE scan + ONE Generate for all three gram widths: each doc's
    # tagged (n, gram) structs concatenated and exploded together
    # (the naive 3-branch union re-scans the corpus per width).  The
    # CASE guards keep sequence() from going negative on short docs.
    gram_structs = F.expr(
        "concat("
        "  transform(ws, w -> struct(1 AS n, w AS g)),"
        "  CASE WHEN size(ws) >= 2 THEN transform("
        "    sequence(0, size(ws) - 2),"
        "    i -> struct(2 AS n, array_join(slice(ws, i + 1, 2), ' ')"
        "                AS g)) ELSE array() END,"
        "  CASE WHEN size(ws) >= 3 THEN transform("
        "    sequence(0, size(ws) - 3),"
        "    i -> struct(3 AS n, array_join(slice(ws, i + 1, 3), ' ')"
        "                AS g)) ELSE array() END)"
    )
    gx = (
        docs.select(ws.alias("ws"))
        .select(F.explode(gram_structs).alias("t"))
        .select(F.col("t.n").alias("n"), F.col("t.g").alias("g"))
        .transform(pin)  # feeds the register build AND the exact counts
    )
    hx = gx.select(
        "n",
        F.conv(F.substring(F.md5("g"), 1, 15), 16, 10).cast("long")
        .alias("h"),
    ).distinct()
    rho = _hll_rho_col()
    reg = (
        hx.select("n", F.col("h").bitwiseAND(_HLL_M - 1).alias("bucket"),
                  rho.alias("rho"))
        .groupBy("n", "bucket").agg(F.max("rho").alias("rho"))
    )
    s = reg.groupBy("n").agg(*_hll_s_scaled_agg())
    ex = gx.groupBy("n").agg(F.countDistinct("g").alias("n_exact"))
    est = _hll_est_col()
    return (
        ex.join(s, "n")
        .select(F.col("n").alias("gram_n"), "n_exact", "n_registers",
                "s_scaled", est.alias("n_hll"))
    )


@register(
    "sketch_cms_heavy_hitters",
    oracle=f"""
WITH occ AS (
  SELECT g, {_HASH_SQL} AS h
  FROM (SELECT unnest({_grams_sql(3)}) AS g
        FROM (SELECT {_WORDS_SQL} AS ws FROM documents) s) t),
cells AS (
  SELECT j, (h >> ({_CMS_SHIFT} * j)) & {_CMS_W - 1} AS p,
         count(*) AS c
  FROM occ, generate_series(0, {_CMS_D - 1}) gs(j)
  GROUP BY j, p),
top AS (
  SELECT g, h, count(*) AS n FROM occ GROUP BY g, h
  ORDER BY n DESC, g LIMIT 25),
est AS (
  SELECT t.g, t.n, min(c.c) AS cms_est
  FROM top t JOIN cells c
    ON c.p = ((t.h >> ({_CMS_SHIFT} * c.j)) & {_CMS_W - 1})
  GROUP BY t.g, t.n)
SELECT g AS gram, CAST(n AS BIGINT) AS n_exact,
       CAST(cms_est AS BIGINT) AS cms_est
FROM est
""",
    tags=("sketch", "text"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def sketch_cms_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min sketch frequency estimation for the top-25 word
    trigrams: build the d x w cell array (one hash aggregate of
    bounded state), then answer point queries with the row-wise
    minimum — estimates are >= exact by construction, and with ~16k
    distinct trigrams in 512 columns the fixture genuinely exercises
    collision inflation (cms_est > n_exact on some rows).  At 100 TB
    the cells are a 4x512 mergeable summary per partition — the
    heavy-hitter shape that avoids shuffling the full (gram, count)
    distribution."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    # one corpus scan feeds cells AND the top-k counts
    occ = _trigram_hashes(docs).transform(pin)

    cells = (
        occ.select(_cms_positions().alias("jp"))
        .groupBy("jp.j", "jp.p").agg(F.count("*").alias("c"))
    )
    top = (
        occ.groupBy("g", "h").agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "g").limit(25)
    )
    # Point queries probe with the same exploded (j, p) pairs so the
    # lookup is a broadcast EQUI-join on (j, p) — 25 x _CMS_D probe
    # rows against the d x w cell summary, bounded at any scale.
    probes = top.select("g", "n", _cms_positions().alias("jp")) \
        .select("g", "n", F.col("jp.j").alias("j"), F.col("jp.p").alias("p"))
    est = (
        probes.join(F.broadcast(cells), ["j", "p"])
        .groupBy("g", "n").agg(F.min("c").alias("cms_est"))
    )
    return est.select(
        F.col("g").alias("gram"),
        F.col("n").cast("long").alias("n_exact"),
        F.col("cms_est").cast("long").alias("cms_est"),
    )


#: KMV geometry: keep the k smallest distinct hash values.
_KMV_K = 64


@register(
    "sketch_kmv_sample",
    oracle=f"""
WITH occ AS (
  SELECT DISTINCT unnest({_grams_sql(3)}) AS g
  FROM (SELECT {_WORDS_SQL} AS ws FROM documents) t),
hx AS (SELECT g, {_HASH_SQL} AS h FROM occ),
bk AS (SELECT g, h, row_number() OVER (ORDER BY h, g) AS rk FROM hx
       QUALIFY rk <= {_KMV_K}),
kth AS (SELECT max(h) AS hk, count(*) AS k FROM bk)
SELECT bk.rk, bk.g AS gram, bk.h AS gram_hash,
       CAST((SELECT k FROM kth) AS BIGINT) AS k,
       (CAST((SELECT k FROM kth) AS DOUBLE) - 1.0)
         / (CAST((SELECT hk FROM kth) AS DOUBLE)
            / 1152921504606846976.0) AS kmv_estimate
FROM bk
""",
    tags=("sketch", "text"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def sketch_kmv_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch over distinct trigrams: the
    ``_KMV_K`` smallest md5 hash values ARE a uniform sample of the
    distinct-gram universe (hash-order sampling — the mergeable,
    rerun-stable alternative to random sampling), and the k-th minimum
    doubles as a cardinality estimator
    (``(k-1) / (h_k / 2^60)`` — Bar-Yossef et al. 2002; within ~1/√k
    of the truth, ~5% here against the 16k fixture trigrams).  Plan:
    one scan -> distinct -> ``TakeOrdered`` (per-partition heaps of k
    rows, no global sort) -> 64-row window; every shuffled row is one
    (hash, gram) pair.  Both the sample membership and the float
    estimate hash-match the oracle exactly."""
    docs = load_parallel(spark, sf_dir, "documents", "doc_id")
    # distinct grams FIRST, hash once per survivor (hashing per
    # occurrence would do md5 work proportional to repetition)
    hx = _hash_grams(_trigrams(docs).distinct())
    bk = hx.orderBy("h", "g").limit(_KMV_K)
    from pyspark.sql import Window

    w = Window.orderBy("h", "g")
    bk = bk.withColumn("rk", F.row_number().over(w))
    kth = bk.agg(F.max("h").alias("hk"),
                 F.count("*").cast("long").alias("k"))
    # (k-1)/h_k with the ACTUAL retained k, not the _KMV_K constant —
    # on corpora with fewer than _KMV_K distinct grams the constant
    # overestimates by construction (r5 review finding)
    est = (F.col("k").cast("double") - F.lit(1.0)) / (
        F.col("hk").cast("double") / F.lit(1152921504606846976.0)
    )
    return bk.crossJoin(F.broadcast(kth)).select(
        "rk", F.col("g").alias("gram"), F.col("h").alias("gram_hash"),
        "k", est.alias("kmv_estimate"),
    )


#: Per-invocation memory-sink suffix (concurrent-run isolation).
_HLL_SINK_IDS = __import__("itertools").count()


@register(
    "streaming_hll_registers",
    oracle=f"""
WITH occ AS (
  SELECT unnest({_grams_sql(3)}) AS g
  FROM (SELECT {_WORDS_SQL} AS ws FROM documents) t),
hx AS (SELECT {_HASH_SQL} AS h FROM occ)
SELECT h & {_HLL_M - 1} AS bucket,
       max(CASE WHEN (h >> {_HLL_P}) = 0 THEN {_HLL_RHO0}
                ELSE {_HLL_RHO0}
                     - length(format('{{:b}}', h >> {_HLL_P}))
           END) AS rho
FROM hx GROUP BY bucket
""",
    tags=("sketch", "streaming"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def streaming_hll_registers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL registers maintained INCREMENTALLY by a real Structured
    Streaming job: the corpus arrives as two parquet files processed
    as separate micro-batches (``maxFilesPerTrigger=1``), each batch
    explodes its documents' trigrams and folds them into the running
    ``max(rho)`` per register (complete-mode streaming aggregation,
    256-row state).  Because registers merge associatively and max is
    idempotent, the streamed sketch is IDENTICAL to the batch sketch
    over the union — the property that makes sketch dashboards
    (cardinality-over-time) incrementally maintainable at 100 TB,
    verified here against the batch-SQL oracle.  max over occurrences
    == max over distinct grams, so no streaming dedup state is
    needed.

    LOCAL-MODE CONTRACT (ADVICE r5): the micro-batch source is staged
    through a driver-local ``tempfile.mkdtemp``, which executors can
    only read when driver and executors share a filesystem — true in
    local mode (where this demonstration query runs) and on any
    shared-FS cluster, NOT on a multi-node object-store deployment.
    The production path for the same computation is
    :func:`trigram_hll_registers` over an ordinary ``readStream``
    source; only this self-contained staging harness is local-mode.
    The memory-sink name is suffixed per invocation so concurrent runs
    in one session can't collide on the sink table."""
    from rados_timestore_spark.queries_common import load
    from rados_timestore_spark.queries_streaming import stream_workdir

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    work = stream_workdir(spark, "ts_stream_hll_")
    src = f"{work}/src"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    from rados_timestore_spark.queries_streaming import \
        _few_state_partitions

    name = f"hll_registers_sink_{next(_HLL_SINK_IDS)}"
    try:
        with _few_state_partitions(spark):
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
            )
            q = (
                trigram_hll_registers(stream)
                .writeStream.format("memory").queryName(name)
                .outputMode("complete").trigger(availableNow=True).start()
            )
            from rados_timestore_spark.queries_streaming import _await
            _await(q)
        # the memory sink holds the final registers; the staged source
        # files are no longer needed (r5 review finding: mkdtemp leak).
        # Materialize + drop the per-invocation sink view so repeated
        # calls can't accumulate temp views (r6 review finding).
        out = spark.table(name).select("bucket", "rho")
        pdf = out.toPandas()
        spark.catalog.dropTempView(name)
        return spark.createDataFrame(pdf, schema=out.schema)
    finally:
        from rados_timestore_spark.queries_streaming import _rm_work

        _rm_work(spark, work)


def trigram_hll_registers(df: DataFrame) -> DataFrame:
    """(bucket, rho) -> max HLL register aggregation over a documents-
    like frame with a ``text`` column.  Works identically on batch and
    streaming frames (the streamed-equals-batch law and the
    checkpoint-recovery test both pin it)."""
    hx = _trigram_hashes(df).select("h")
    rho = _hll_rho_col()
    return (
        hx.select(F.col("h").bitwiseAND(_HLL_M - 1).alias("bucket"),
                  rho.alias("rho"))
        .groupBy("bucket").agg(F.max("rho").alias("rho"))
    )


@register(
    "streaming_cms_cells",
    oracle=f"""
WITH occ AS (
  SELECT {_HASH_SQL} AS h
  FROM (SELECT unnest({_grams_sql(3)}) AS g
        FROM (SELECT {_WORDS_SQL} AS ws FROM documents) s) t)
SELECT j, (h >> ({_CMS_SHIFT} * j)) & {_CMS_W - 1} AS p,
       count(*) AS c
FROM occ, generate_series(0, {_CMS_D - 1}) gs(j)
GROUP BY j, p
""",
    tags=("sketch", "streaming"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def streaming_cms_cells(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-Min cells maintained INCREMENTALLY by a real Structured
    Streaming job — the CMS twin of :func:`streaming_hll_registers`:
    two micro-batches of documents fold into the running per-cell
    counts (complete-mode streaming aggregation, d x w bounded state).
    Cell counts are additive, so the streamed sketch is IDENTICAL to
    the batch sketch over the union — heavy-hitter dashboards stay
    incrementally maintainable at 100 TB.  Same LOCAL-MODE staging
    contract as the HLL twin (stream_workdir: shared-path staging on a
    cluster)."""
    from rados_timestore_spark.queries_common import load
    from rados_timestore_spark.queries_streaming import (
        _await, _few_state_partitions, stream_workdir,
    )

    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    work = stream_workdir(spark, "ts_stream_cms_")
    src = f"{work}/src"
    docs.filter(F.col("doc_id") % 2 == 0).coalesce(1) \
        .write.parquet(src)
    docs.filter(F.col("doc_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    name = f"cms_cells_sink_{next(_HLL_SINK_IDS)}"
    try:
        with _few_state_partitions(spark):
            stream = (
                spark.readStream.schema(docs.schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
            )
            q = (
                trigram_cms_cells(stream)
                .writeStream.format("memory").queryName(name)
                .outputMode("complete").trigger(availableNow=True).start()
            )
            _await(q)
        out = spark.table(name).select("j", "p", "c")
        pdf = out.toPandas()
        spark.catalog.dropTempView(name)
        return spark.createDataFrame(pdf, schema=out.schema)
    finally:
        from rados_timestore_spark.queries_streaming import _rm_work

        _rm_work(spark, work)


def trigram_cms_cells(df: DataFrame) -> DataFrame:
    """(j, p) -> additive CMS cell counts over a documents-like frame
    with a ``text`` column; identical on batch and streaming frames
    (sums merge associatively across micro-batches)."""
    occ = _trigram_hashes(df).select("h")
    return (
        occ.select(_cms_positions().alias("jp"))
        .select(F.col("jp.j").alias("j"), F.col("jp.p").alias("p"))
        .groupBy("j", "p").agg(F.count("*").alias("c"))
    )


# ---------------------------------------------- r8: quantile histogram

#: Significant-bit precision of the log-bucketed quantile histogram:
#: values are quantized to their top P+1 significant bits, so the
#: relative bucket width (and the quantile estimate's one-sided
#: relative error bound) is 2^-P = 1/16.
_HDR_P = 4


def hdr_lb(v: str = "v"):
    """Bucket lower bound: ``v`` quantized to its top P+1 significant
    bits (pure integer shift math — shared by the registered query and
    the law tests so the two can't drift).

    PRECONDITION: ``v >= 0``.  bin() of a negative BIGINT is the
    64-char two's complement in both engines, so s becomes 59 and the
    engines DIVERGE (DuckDB raises on the negative left-shift, Spark
    wraps) — guard loudly on the Spark side so a signed metric fails
    the job instead of hashing garbage (r8 review finding).  Signed
    metrics need an offset or a sign-split histogram first.

    NULL passes through as NULL (ADVICE r8: ``NULL >= 0`` is NULL, so
    without the explicit IS NULL arm the guard took the raise_error
    branch and a NULL metric failed the whole Spark job while DuckDB
    emitted a NULL-bucket row — an engine divergence).  Callers decide
    NULL policy explicitly: ``hdr_histogram`` and the oracle both
    FILTER NULL values before bucketing, so the engines agree by
    construction."""
    v = (f"IF({v} IS NULL OR {v} >= 0, {v}, "
         f"raise_error('hdr_lb: negative value — the log-bucketed "
         f"histogram requires nonnegative input'))")
    s = f"greatest(length(bin({v})) - 1 - {_HDR_P}, 0)"
    return F.expr(
        f"shiftleft(shiftright({v}, CAST({s} AS INT)), CAST({s} AS INT))"
    )


#: Shared oracle for the batch query and its streaming twin — the
#: batch==streaming histogram equivalence is the law, so the SQL must
#: be literally one definition (r8 review finding).
_HDR_ORACLE_SQL = f"""
WITH iv AS (
  SELECT event_type,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM events WHERE value IS NOT NULL),
b AS (
  SELECT event_type, v,
         greatest(length(bin(v)) - 1 - {_HDR_P}, 0) AS s
  FROM iv),
h AS (
  SELECT event_type, (v >> s) << s AS lb, count(*) AS c
  FROM b GROUP BY 1, 2),
cum AS (
  SELECT event_type, lb, c,
         sum(c) OVER (PARTITION BY event_type ORDER BY lb) AS cum,
         sum(c) OVER (PARTITION BY event_type) AS n
  FROM h)
SELECT event_type,
       CAST(max(n) AS BIGINT) AS n,
       CAST(count(*) AS BIGINT) AS n_buckets,
       CAST(min(CASE WHEN cum >= (n * 50 + 99) // 100 THEN lb END)
            AS BIGINT) AS p50_lb,
       CAST(min(CASE WHEN cum >= (n * 90 + 99) // 100 THEN lb END)
            AS BIGINT) AS p90_lb,
       CAST(min(CASE WHEN cum >= (n * 99 + 99) // 100 THEN lb END)
            AS BIGINT) AS p99_lb
FROM cum GROUP BY event_type
"""


@register(
    "sketch_hdr_quantiles",
    oracle=_HDR_ORACLE_SQL,
    tags=("sketch", "timeseries"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def sketch_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mergeable log-bucketed quantile histogram (the HDR-histogram /
    Prometheus-native-histogram model): each value is quantized to its
    top P+1 = 5 significant bits (integer shift math on exact
    DECIMAL-derived centi-units — no float log2 anywhere), per-series
    bucket counts are ONE bounded hash aggregate, and pXX estimates
    are the smallest bucket lower bound whose cumulative count reaches
    ceil(q*n).  Unlike the exact rank rule (ts_quantiles: a per-series
    sort), bucket counts merge ASSOCIATIVELY — across partitions,
    days, or cluster tiers — which is what makes p99 dashboards
    maintainable over 100 TB of history: state is <= ~16 buckets per
    octave per series forever, and the one-sided relative error is
    bounded by 2^-P = 1/16 (law-tested against the exact quantile in
    tests/test_sketch.py).  Estimates are bucket LOWER bounds in
    centi-units."""
    ev = load_parallel(spark, sf_dir, "events", "event_id")
    return _hdr_quantiles(hdr_histogram(ev))


def hdr_histogram(events: DataFrame) -> DataFrame:
    """(event_type, lb) -> additive bucket counts over an events-like
    frame with a double ``value`` column; identical on batch and
    streaming frames (counts merge associatively across
    micro-batches)."""
    iv = events.where(F.col("value").isNotNull()).select(
        "event_type",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )  # NULL metrics carry no quantile information — filtered here
    #    and in the oracle's iv CTE identically (ADVICE r8)
    return (
        iv.select("event_type", hdr_lb("v").alias("lb"))
        .groupBy("event_type", "lb")
        .agg(F.count("*").alias("c"))
    )


def _hdr_quantiles(h: DataFrame) -> DataFrame:
    """Quantile extraction over a (event_type, lb, c) histogram — the
    batch-side read path shared by the batch query and the streaming
    twin (the cumulative window is not streamable; the HISTOGRAM is
    the maintained state, this is the dashboard read)."""
    from pyspark.sql import Window

    wcum = (
        Window.partitionBy("event_type").orderBy("lb")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    wall = Window.partitionBy("event_type")
    cum = h.select(
        "event_type", "lb", "c",
        F.sum("c").over(wcum).alias("cum"),
        F.sum("c").over(wall).alias("n"),
    )

    def _q(pct: int):
        thresh = F.expr(f"(n * {pct} + 99) div 100")
        return F.min(
            F.when(F.col("cum") >= thresh, F.col("lb"))
        ).cast("long").alias(f"p{pct}_lb")

    return cum.groupBy("event_type").agg(
        F.max("n").cast("long").alias("n"),
        F.count("*").cast("long").alias("n_buckets"),
        _q(50), _q(90), _q(99),
    ).select("event_type", "n", "n_buckets", "p50_lb", "p90_lb", "p99_lb")


@register(
    "streaming_hdr_quantiles",
    oracle=_HDR_ORACLE_SQL,
    tags=("sketch", "streaming"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def streaming_hdr_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The HDR quantile histogram maintained INCREMENTALLY by a real
    Structured Streaming job — the quantile twin of
    :func:`streaming_cms_cells`: two micro-batches of events fold into
    the running per-(series, bucket) counts (complete-mode streaming
    aggregation, bounded state: <= ~16 buckets per octave per series).
    Bucket counts are additive, so the streamed histogram is IDENTICAL
    to the batch histogram over the union, and the batch-side quantile
    read (:func:`_hdr_quantiles` — the cumulative walk a dashboard
    runs, not streamable and not state) yields the same p50/p90/p99 as
    :func:`sketch_hdr_quantiles` — latency dashboards stay
    incrementally maintainable at 100 TB.  Same staging contract as
    the HLL/CMS twins (stream_workdir: shared-path staging on a
    cluster)."""
    from rados_timestore_spark.queries_common import load
    from rados_timestore_spark.queries_streaming import (
        _await, _few_state_partitions, stream_workdir,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    work = stream_workdir(spark, "ts_stream_hdr_")
    src = f"{work}/src"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1) \
        .write.parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    name = f"hdr_hist_sink_{next(_HLL_SINK_IDS)}"
    try:
        with _few_state_partitions(spark):
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
            )
            q = (
                hdr_histogram(stream)
                .writeStream.format("memory").queryName(name)
                .outputMode("complete").trigger(availableNow=True).start()
            )
            _await(q)
        hist = spark.table(name).select("event_type", "lb", "c")
        pdf = hist.toPandas()
        spark.catalog.dropTempView(name)
        return _hdr_quantiles(
            spark.createDataFrame(pdf, schema=hist.schema)
        )
    finally:
        from rados_timestore_spark.queries_streaming import _rm_work

        _rm_work(spark, work)


@register(
    "sketch_hll_daily_users",
    oracle=f"""
WITH ux AS (
  SELECT DISTINCT epoch_us(ts) // 86400000000 AS day,
         {_USER_HASH_SQL} AS h
  FROM events),
reg AS (
  SELECT day, h & {_HLL_M - 1} AS bucket,
         max(CASE WHEN (h >> {_HLL_P}) = 0 THEN {_HLL_RHO0}
                  ELSE {_HLL_RHO0}
                       - length(format('{{:b}}', h >> {_HLL_P}))
             END) AS rho
  FROM ux GROUP BY day, bucket),
allreg AS (
  SELECT -1 AS day, bucket, max(rho) AS rho FROM reg GROUP BY bucket),
merged AS (SELECT * FROM reg UNION ALL SELECT * FROM allreg),
s AS (
  SELECT day,
         CAST(sum(1::BIGINT << ({_HLL_SCALE_POW} - rho)) AS BIGINT)
           + ({_HLL_M} - count(*))
             * (1::BIGINT << {_HLL_SCALE_POW}) AS s_scaled,
         count(*) AS n_registers
  FROM merged GROUP BY day),
ex AS (
  SELECT epoch_us(ts) // 86400000000 AS day,
         count(DISTINCT user_id) AS n_exact
  FROM events GROUP BY 1
  UNION ALL
  SELECT -1, count(DISTINCT user_id) FROM events)
SELECT ex.day, ex.n_exact, s.n_registers, s.s_scaled,
       {_HLL_EST_SQL} AS n_hll
FROM ex JOIN s ON s.day = ex.day
""",
    tags=("sketch", "timeseries", "streaming"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def sketch_hll_daily_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct users PER DAY by HyperLogLog, next to the exact count —
    the daily-active-users dashboard at sketch cost — plus an ALL row
    (day = -1) whose registers are RE-MERGED FROM THE DAY REGISTERS,
    never from raw data: the in-query mergeability certificate (max is
    associative per bucket, so day sketches roll up to month/all-time tiers
    exactly like ts_rollup_cascade's sums).  At 100 TB this replaces a
    per-day distinct shuffle with one map-side-combined aggregate of
    256 longs per day, and historical tiers merge without rescanning.
    Hashing is the repo's md5 60-bit rule, bit-identical cross-engine."""
    from rados_timestore_spark.queries_common import event_us

    ev0 = load_parallel(spark, sf_dir, "events", "event_id")
    # integer `div`, never a float quotient cast: truncation-toward-
    # zero would disagree with the oracle's floor division on any
    # pre-epoch timestamp AND collide with the day=-1 ALL-tier
    # sentinel (r8 review #3)
    ev = ev0.select("user_id", event_us(ev0).alias("tus"))
    day = F.expr("tus div 86400000000")
    ux = ev.select(
        day.alias("day"), _user_hash_col().alias("h")
    ).distinct()
    rho = _hll_rho_col()
    reg = (
        ux.select("day",
                  F.col("h").bitwiseAND(_HLL_M - 1).alias("bucket"),
                  rho.alias("rho"))
        .groupBy("day", "bucket").agg(F.max("rho").alias("rho"))
        .transform(pin)  # feeds the per-day AND the re-merged ALL tier
    )
    allreg = reg.groupBy("bucket").agg(F.max("rho").alias("rho")) \
        .select(F.lit(-1).cast("long").alias("day"), "bucket", "rho")
    merged = reg.unionByName(allreg)
    s = merged.groupBy("day").agg(*_hll_s_scaled_agg())
    ex = ev.select(day.alias("day"), "user_id").groupBy("day").agg(
        F.countDistinct("user_id").alias("n_exact")
    ).unionByName(
        ev.select(F.lit(-1).cast("long").alias("day"), "user_id")
        .groupBy("day").agg(F.countDistinct("user_id").alias("n_exact"))
    )
    est = _hll_est_col()
    return ex.join(s, "day").select(
        "day", "n_exact", "n_registers", "s_scaled", est.alias("n_hll"))


#: KMV set-operation sketch size and the time split for the two sets.
_KMV_SET_K = 128
_T_JAN16_US = 1_705_363_200_000_000  # 2024-01-16 00:00:00 UTC
_POW60 = "1152921504606846976.0"  # 2^60 as a double literal


@register(
    "sketch_kmv_set_ops",
    oracle=f"""
WITH ua AS (SELECT DISTINCT {_USER_HASH_SQL} AS h FROM events
            WHERE epoch_us(ts) < {_T_JAN16_US}),
ub AS (SELECT DISTINCT {_USER_HASH_SQL} AS h FROM events
       WHERE epoch_us(ts) >= {_T_JAN16_US}),
ka AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
                      FROM ua) WHERE rn <= {_KMV_SET_K}),
kb AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
                      FROM ub) WHERE rn <= {_KMV_SET_K}),
un AS (SELECT h FROM ua UNION SELECT h FROM ub),
ku AS (SELECT h FROM (SELECT h, row_number() OVER (ORDER BY h) AS rn
                      FROM un) WHERE rn <= {_KMV_SET_K}),
kth AS (SELECT max(h) AS hk, count(*) AS k FROM ku),
common AS (
  SELECT count(*) AS c
  FROM ku WHERE h IN (SELECT h FROM ka) AND h IN (SELECT h FROM kb)),
exact AS (
  SELECT (SELECT count(*) FROM ua) AS na,
         (SELECT count(*) FROM ub) AS nb,
         (SELECT count(*) FROM un) AS nu,
         (SELECT count(*) FROM ua WHERE h IN (SELECT h FROM ub)) AS ni)
SELECT CAST(na AS BIGINT) AS n_exact_a, CAST(nb AS BIGINT) AS n_exact_b,
       CAST(nu AS BIGINT) AS n_exact_union,
       CAST(ni AS BIGINT) AS n_exact_inter,
       CAST(k AS BIGINT) AS k, CAST(c AS BIGINT) AS k_common,
       (CASE WHEN k < {_KMV_SET_K} THEN CAST(k AS DOUBLE)
             ELSE ((CAST(k AS DOUBLE) - 1.0)
                   / (CAST(hk AS DOUBLE) / {_POW60}))
        END) AS est_union,
       (CAST(c AS DOUBLE) / CAST(k AS DOUBLE)) AS jaccard_est,
       ((CAST(c AS DOUBLE) / CAST(k AS DOUBLE))
        * (CASE WHEN k < {_KMV_SET_K} THEN CAST(k AS DOUBLE)
                ELSE ((CAST(k AS DOUBLE) - 1.0)
                      / (CAST(hk AS DOUBLE) / {_POW60}))
           END)) AS est_inter
FROM exact, kth, common
""",
    tags=("sketch", "timeseries"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def sketch_kmv_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SET-OPERATION estimates from KMV sketches (the theta-sketch
    capability): distinct users of the first half-month (A) vs the
    second (B), with |A∪B| from the merged bottom-k, Jaccard from the
    fraction of the union's bottom-k present in BOTH per-set sketches,
    and |A∩B| = J * |A∪B| — all next to the exact counts.  This is
    what exact distinct-counts cannot do at 100 TB: audience overlap,
    churn and retention between arbitrary segments come from merging
    two 128-hash sketches instead of re-shuffling raw history.
    Determinism: bottom-k over the md5 60-bit hash total order;
    estimates are fixed, fully-parenthesized double expressions; the
    small-regime branch (k < K) returns the sketch's exact content
    count, identically in both engines."""
    from rados_timestore_spark.queries_common import event_us

    ev = load_parallel(spark, sf_dir, "events", "event_id")
    t = event_us(ev)
    uh = _user_hash_col()
    ua = ev.filter(t < _T_JAN16_US).select(uh.alias("h")).distinct() \
        .transform(pin)
    ub = ev.filter(t >= _T_JAN16_US).select(uh.alias("h")).distinct() \
        .transform(pin)

    def bottom_k(df):
        # TakeOrdered (per-partition heaps), NOT an unpartitioned
        # row_number window that funnels every distinct hash through
        # one partition — the same choice sketch_kmv_sample made
        # (r8 review #6)
        return df.orderBy("h").limit(_KMV_SET_K)

    ka, kb = bottom_k(ua), bottom_k(ub)
    un = ua.unionByName(ub).distinct().transform(pin)
    ku = bottom_k(un)
    kth = ku.agg(F.max("h").alias("hk"), F.count("*").alias("k"))
    common = (
        ku.join(ka, "h", "left_semi").join(kb, "h", "left_semi")
        .agg(F.count("*").alias("c"))
    )
    exact = (
        ua.agg(F.count("*").alias("na"))
        .crossJoin(ub.agg(F.count("*").alias("nb")))
        .crossJoin(un.agg(F.count("*").alias("nu")))
        .crossJoin(ua.join(ub, "h", "left_semi")
                   .agg(F.count("*").alias("ni")))
    )
    est_union = F.when(
        F.col("k") < _KMV_SET_K, F.col("k").cast("double")
    ).otherwise(
        (F.col("k").cast("double") - F.lit(1.0))
        / (F.col("hk").cast("double") / F.lit(float(1 << 60)))
    )
    jac = F.col("c").cast("double") / F.col("k").cast("double")
    return (
        exact.crossJoin(kth).crossJoin(common)
        .select(
            F.col("na").alias("n_exact_a"),
            F.col("nb").alias("n_exact_b"),
            F.col("nu").alias("n_exact_union"),
            F.col("ni").alias("n_exact_inter"),
            F.col("k").cast("long").alias("k"),
            F.col("c").cast("long").alias("k_common"),
            est_union.alias("est_union"),
            jac.alias("jaccard_est"),
            (jac * est_union).alias("est_inter"),
        )
    )


# ------------------------- late r9: moment sketch (mergeable moments)


@register(
    "sketch_moments",
    oracle="""
WITH ev AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(v) AS BIGINT) AS s1,
       CAST(sum(v * v) AS BIGINT) AS s2,
       CAST(sum(v * v * v) AS BIGINT) AS s3,
       CAST(sum(v * v * v * v) AS BIGINT) AS s4,
       CAST(count(*) * sum(v * v) - sum(v) * sum(v) AS BIGINT)
         AS m2_num
FROM ev GROUP BY event_type
""",
    tags=("sketch",),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def sketch_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Moment sketch (Gan et al., VLDB 2018 — the moments-based
    quantile/statistics summary): per group, the MERGEABLE power-sum
    state (n, sum v, sum v^2, sum v^3, sum v^4) over integer-floored
    values, plus the exact variance numerator ``n*s2 - s1^2`` (= n^2
    * population variance) emitted un-divided — the same
    cross-multiplication device as ts_anomaly_zscore.  The power sums
    are the whole point at 100 TB: like the HLL registers and KMV
    bottom-k in this family, they REPLACE a per-group sort/quantile
    shuffle with constant mergeable state — partial aggregates
    combine map-side, shards merge by plain addition (the
    mergeability law test adds two halves and asserts equality with
    the whole), and downstream consumers derive variance / skewness /
    kurtosis / moment-matched quantile estimates from 5 numbers per
    group.  Integer-floored values keep every sum exact and inside
    int64 (|v| <= ~1e3 on the fixture leaves s4 headroom to n ~ 9e6
    per group; beyond that, shard the group key and merge — the sums
    are associative).

    Plan: ONE hash aggregate with map-side partial combine, nothing
    else."""
    ev = load_parallel(spark, sf_dir, "events", "event_id")
    return moment_sums(ev)


def moment_sums(ev: "DataFrame") -> "DataFrame":
    """The ONE moment-sketch aggregate (shared by the batch query and
    the streaming twin, so the two can never drift): per event_type,
    (n, s1..s4) power sums over integer-floored values plus the
    n*s2 - s1^2 variance numerator."""
    v = F.floor(F.col("value")).cast("long")
    x = ev.select("event_type", v.alias("v"))
    n = F.count("*")
    s1, s2 = F.sum("v"), F.sum(F.expr("v * v"))
    return x.groupBy("event_type").agg(
        n.cast("long").alias("n"),
        s1.cast("long").alias("s1"),
        s2.cast("long").alias("s2"),
        F.sum(F.expr("v * v * v")).cast("long").alias("s3"),
        F.sum(F.expr("v * v * v * v")).cast("long").alias("s4"),
        (n * s2 - s1 * s1).cast("long").alias("m2_num"),
    )


@register(
    "streaming_moments",
    oracle="""
WITH ev AS (
  SELECT event_type, CAST(floor(value) AS BIGINT) AS v FROM events)
SELECT event_type,
       CAST(count(*) AS BIGINT) AS n,
       CAST(sum(v) AS BIGINT) AS s1,
       CAST(sum(v * v) AS BIGINT) AS s2,
       CAST(sum(v * v * v) AS BIGINT) AS s3,
       CAST(sum(v * v * v * v) AS BIGINT) AS s4,
       CAST(count(*) * sum(v * v) - sum(v) * sum(v) AS BIGINT)
         AS m2_num
FROM ev GROUP BY event_type
""",
    tags=("sketch", "streaming"),
    priority=900,  # demoted in r11 after r10 driver green, to rotate the r10/r9 carve-out backlog into the window (verified locally by tools/check_correctness.py)
)
def streaming_moments(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The moment sketch maintained INCREMENTALLY by a real
    Structured Streaming job — power sums are additive, so the
    complete-mode streaming aggregate folds each micro-batch into the
    running (n, s1..s4) per group and the streamed state is IDENTICAL
    to the batch sums over the union (the same mergeability the
    HLL/CMS/HDR twins certify for their register states); delivered
    in two micro-batches like streaming_hdr_quantiles, hashed against
    the SAME oracle as sketch_moments.  The state that makes running
    variance / skew / kurtosis dashboards incrementally maintainable
    at 100 TB is these 5 numbers per group — nothing else."""
    from rados_timestore_spark.queries_common import load
    from rados_timestore_spark.queries_streaming import (
        _await, _few_state_partitions, _rm_work, stream_workdir,
    )

    ev = load(spark, sf_dir, "events").select(
        "event_id", "event_type", "value")
    work = stream_workdir(spark, "ts_stream_mom_")
    src = f"{work}/src"
    ev.filter(F.col("event_id") % 2 == 0).coalesce(1) \
        .write.parquet(src)
    ev.filter(F.col("event_id") % 2 == 1).coalesce(1) \
        .write.mode("append").parquet(src)

    name = f"moments_sink_{next(_HLL_SINK_IDS)}"
    try:
        with _few_state_partitions(spark):
            stream = (
                spark.readStream.schema(ev.schema)
                .option("maxFilesPerTrigger", 1).parquet(src)
            )
            q = (
                moment_sums(stream)
                .writeStream.format("memory").queryName(name)
                .outputMode("complete").trigger(availableNow=True).start()
            )
            _await(q)
        out = spark.table(name).toPandas()
        spark.catalog.dropTempView(name)
        return spark.createDataFrame(
            out,
            schema="event_type string, n long, s1 long, s2 long, "
                   "s3 long, s4 long, m2_num long",
        )
    finally:
        _rm_work(spark, work)
