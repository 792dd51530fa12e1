"""Time-series operators Spark lacks as primitives — as-of join, range
join, hypertable-style rollup, sessionization — composed from
DataFrame ops per the brief's custom-operator ladder (composition
first, never a Python loop).

All run over the ``events`` table (ns timestamps -> µs, matching the
DuckDB oracles' ``epoch_us``).

Scale design:

* **as-of join** is the union trick: tag both streams, one shuffle by
  key, one ordered window carrying the last left-side id forward —
  O(n log n/partition), no range explosion, no per-row lookup;
* **range join** buckets time into interval-width cells and equi-joins
  on (key, cell±1) — each probe touches <= 3 cells, so the shuffle key
  is (user, cell), never a cross product;
* **rollup** is a plain two-level hash aggregate (time_bucket, type);
* **sessionization** is lag + cumulative-sum-of-starts windows — the
  standard one-shuffle formulation.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from rados_timestore_spark.queries_common import load, pin
from rados_timestore_spark.registry import register

_US_PER_MIN = 60_000_000
_RANGE_US = 5 * _US_PER_MIN       # ±5 minutes
_SESSION_GAP_US = 30 * _US_PER_MIN

_EV_CTE = """
WITH ev AS (
  SELECT event_id, user_id, event_type, value, epoch_us(ts) AS t
  FROM events
)
"""


def _events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from rados_timestore_spark.queries_common import event_us

    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id", "user_id", "event_type", "value",
        event_us(ev).alias("t"),
    )


@register(
    "ts_asof_join",
    oracle=f"""{_EV_CTE}
SELECT p.event_id AS purchase_id, p.user_id, p.t AS purchase_t,
       v.event_id AS view_id, v.t AS view_t
FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
ASOF JOIN (SELECT * FROM ev WHERE event_type = 'view') v
  ON p.user_id = v.user_id AND p.t >= v.t
""",
    tags=("timeseries", "join"),
    bench=True,
)
def ts_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of (backward) join: each purchase matched to the same user's
    most recent view at-or-before it.

    Union trick: views (tag 0) and purchases (tag 1) interleave in one
    stream sorted by (t, tag); a last-non-null window carries the most
    recent view forward — exactly one shuffle on user_id, which beats
    any range-join expansion at scale.  DuckDB's native ASOF JOIN is
    the oracle.
    """
    ev = _events(spark, sf_dir)
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("t"), F.lit(0).alias("tag"),
        F.col("event_id").alias("view_id"),
        F.lit(None).cast("long").alias("purchase_id"),
    )
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", F.col("t"), F.lit(1).alias("tag"),
        F.lit(None).cast("long").alias("view_id"),
        F.col("event_id").alias("purchase_id"),
    )
    # views sort before purchases at equal t (tag order) => >= semantics
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "tag", "view_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    merged = views.unionByName(purchases).select(
        "user_id", "t", "tag", "purchase_id",
        F.last("view_id", ignorenulls=True).over(w).alias("asof_view_id"),
        F.last(
            F.when(F.col("view_id").isNotNull(), F.col("t")),
            ignorenulls=True,
        ).over(w).alias("asof_view_t"),
    )
    return (
        merged.filter(
            (F.col("tag") == 1) & F.col("asof_view_id").isNotNull()
        )
        .select(
            "purchase_id", "user_id", F.col("t").alias("purchase_t"),
            F.col("asof_view_id").alias("view_id"),
            F.col("asof_view_t").alias("view_t"),
        )
    )


@register(
    "ts_range_join",
    oracle=f"""{_EV_CTE}
SELECT p.event_id AS purchase_id, count(*) AS n_errors
FROM (SELECT * FROM ev WHERE event_type = 'purchase') p
JOIN (SELECT * FROM ev WHERE event_type = 'error') e
  ON p.user_id = e.user_id
 AND e.t BETWEEN p.t - {_RANGE_US} AND p.t + {_RANGE_US}
GROUP BY p.event_id
""",
    tags=("timeseries", "join"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (interval) join: errors within ±5 min of each purchase by
    the same user.

    Bucketed formulation: both sides land in 5-min cells; each purchase
    probes its cell ±1 via an exploded equi-join on (user, cell), then
    the exact |dt| predicate filters.  Shuffle stays linear (every row
    joins on <= 3 cell keys) instead of Spark's default cartesian-range
    fallback.
    """
    ev = _events(spark, sf_dir)
    errors = ev.filter(F.col("event_type") == "error").select(
        "user_id", F.col("t").alias("et"),
        F.expr(f"t div {_RANGE_US}").alias("cell"),
    )
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .select(
            F.col("event_id").alias("purchase_id"), "user_id",
            F.col("t").alias("pt"),
        )
        .withColumn(
            "cell",
            F.explode(
                F.array(
                    F.expr(f"pt div {_RANGE_US}") - 1,
                    F.expr(f"pt div {_RANGE_US}"),
                    F.expr(f"pt div {_RANGE_US}") + 1,
                )
            ),
        )
    )
    j = purchases.join(errors, ["user_id", "cell"]).filter(
        (F.col("et") >= F.col("pt") - _RANGE_US)
        & (F.col("et") <= F.col("pt") + _RANGE_US)
    )
    return j.groupBy("purchase_id").agg(F.count("*").alias("n_errors"))


@register(
    "ts_rollup_hourly",
    oracle=f"""{_EV_CTE}
SELECT t // 3600000000 AS hour, event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       min(t) AS first_t, max(t) AS last_t
FROM ev GROUP BY 1, 2
""",
    tags=("timeseries", "agg"),
    bench=True,
)
def ts_rollup_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: per (hour, type)
    count/sum/min/max in one hash aggregate — the materialized-rollup
    shape TimescaleDB calls a continuous aggregate."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("hour", F.expr("t div 3600000000"))
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).cast("double")
                .alias("sum_value"),
            F.min("t").alias("first_t"),
            F.max("t").alias("last_t"),
        )
    )


@register(
    "ts_sessionize",
    oracle=f"""{_EV_CTE},
marked AS (
  SELECT user_id, t, event_id,
         CASE WHEN t - lag(t) OVER w > {_SESSION_GAP_US}
                OR lag(t) OVER w IS NULL
              THEN 1 ELSE 0 END AS is_start
  FROM ev WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
),
sessions AS (
  SELECT user_id, t, event_id,
         CAST(sum(is_start) OVER (PARTITION BY user_id ORDER BY t, event_id
                                  ROWS UNBOUNDED PRECEDING)
              AS BIGINT) AS session_no
  FROM marked
)
SELECT user_id, session_no, count(*) AS n_events,
       min(t) AS session_start, max(t) - min(t) AS duration_us
FROM sessions GROUP BY user_id, session_no
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag marks
    session starts, a running sum numbers sessions, then one aggregate
    per (user, session) — the classic two-window one-shuffle plan."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    marked = ev.select(
        "user_id", "t", "event_id",
        F.when(
            (F.col("t") - F.lag("t").over(w) > _SESSION_GAP_US)
            | F.lag("t").over(w).isNull(),
            1,
        ).otherwise(0).alias("is_start"),
    )
    run = (
        Window.partitionBy("user_id").orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = marked.withColumn(
        "session_no", F.sum("is_start").over(run)
    )
    return sessions.groupBy("user_id", "session_no").agg(
        F.count("*").alias("n_events"),
        F.min("t").alias("session_start"),
        (F.max("t") - F.min("t")).alias("duration_us"),
    )


@register(
    "ts_topk_per_series",
    oracle=f"""{_EV_CTE}
SELECT user_id, event_id, t, rk FROM (
  SELECT user_id, event_id, t,
         row_number() OVER (PARTITION BY user_id
             ORDER BY value DESC, event_id) AS rk
  FROM ev) x
WHERE rk <= 3
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_topk_per_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series top-k: the highest-value events per user — one
    window shuffle keyed by series, k rows retained per group."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy(
        F.desc("value"), F.col("event_id")
    )
    return (
        ev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("user_id", "event_id", "t", "rk")
    )


@register(
    "ts_value_histogram",
    oracle=f"""{_EV_CTE}
SELECT CAST(floor(value / 5) AS BIGINT) AS bucket, count(*) AS n,
       CAST(round(min(value) * 100) AS BIGINT) AS min_v100,
       CAST(round(max(value) * 100) AS BIGINT) AS max_v100
FROM ev GROUP BY 1
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_value_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram — one hash aggregate; min/max
    reported as rounded integer centi-values (doubles in the fixture are
    2-decimal; explicit round() because DuckDB's double->BIGINT cast
    rounds while Spark's truncates)."""
    ev = _events(spark, sf_dir)
    return (
        ev.withColumn("bucket", F.floor(F.col("value") / 5).cast("long"))
        .groupBy("bucket")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("value") * 100).cast("long").alias("min_v100"),
            F.round(F.max("value") * 100).cast("long").alias("max_v100"),
        )
    )


@register(
    "ts_delta_encode",
    oracle=f"""{_EV_CTE}
SELECT user_id, event_id, t,
       t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
         AS delta_us
FROM ev
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_delta_encode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Delta encoding of per-series timestamps (the compression
    transform a timestore applies before storage): one window shuffle,
    first element per series keeps a NULL delta."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    return ev.select(
        "user_id", "event_id", "t",
        (F.col("t") - F.lag("t").over(w)).alias("delta_us"),
    )


@register(
    "ts_gap_fill",
    oracle=f"""{_EV_CTE},
hours AS (
  SELECT unnest(generate_series((SELECT min(t) // 3600000000 FROM ev),
                                (SELECT max(t) // 3600000000 FROM ev)))
    AS hour
),
agg AS (SELECT t // 3600000000 AS hour, count(*) AS n FROM ev GROUP BY 1)
SELECT h.hour, COALESCE(a.n, 0) AS n,
       CASE WHEN a.hour IS NULL THEN 1 ELSE 0 END AS filled
FROM hours h LEFT JOIN agg a ON h.hour = a.hour
""",
    tags=("timeseries",),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap filling: generate the dense hour spine between min and max
    event time, left-join the hourly counts, mark filled gaps — the
    time_bucket_gapfill shape.  The spine is generated from one
    aggregated (min, max) row via sequence+explode, so the plan is a
    scan + tiny broadcast-side generate, not a driver loop."""
    ev = _events(spark, sf_dir)
    hour = F.expr("t div 3600000000")
    bounds = ev.agg(
        F.min(hour).alias("h0"), F.max(hour).alias("h1")
    )
    spine = bounds.select(
        F.explode(F.sequence("h0", "h1")).alias("hour")
    )
    agg = ev.select(hour.alias("hour")).groupBy("hour").agg(
        F.count("*").alias("n")
    )
    j = spine.join(agg.withColumnRenamed("hour", "ahour"),
                   spine.hour == F.col("ahour"), "left")
    return j.select(
        "hour",
        F.coalesce(F.col("n"), F.lit(0)).alias("n"),
        F.when(F.col("ahour").isNull(), 1).otherwise(0).alias("filled"),
    )


@register(
    "ts_value_percentiles",
    oracle="""
SELECT event_type,
       quantile_cont(value, 0.5) AS p50,
       quantile_cont(value, 0.9) AS p90,
       quantile_cont(value, 0.99) AS p99,
       count(*) AS n
FROM events GROUP BY event_type
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_value_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per event type: Spark
    ``percentile`` and DuckDB ``quantile_cont`` share the same
    interpolation formula and match bit-for-bit (verified).  At 100 TB
    you'd switch to ``percentile_approx`` (t-digest-style mergeable
    sketch, same plan shape) and accept the approximation."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.expr("percentile(value, 0.5)").alias("p50"),
        F.expr("percentile(value, 0.9)").alias("p90"),
        F.expr("percentile(value, 0.99)").alias("p99"),
        F.count("*").alias("n"),
    )


@register(
    "ts_ohlc_hourly",
    oracle=f"""{_EV_CTE},
h AS (
  SELECT user_id, t // 3600000000 AS hour, t, event_id, value FROM ev),
w AS (
  SELECT user_id, hour, value,
         row_number() OVER (PARTITION BY user_id, hour
                            ORDER BY t, event_id) AS rn_a,
         row_number() OVER (PARTITION BY user_id, hour
                            ORDER BY t DESC, event_id DESC) AS rn_d
  FROM h)
SELECT user_id, hour,
       max(CASE WHEN rn_a = 1 THEN value END) AS open,
       max(value) AS high, min(value) AS low,
       max(CASE WHEN rn_d = 1 THEN value END) AS close,
       count(*) AS n_points
FROM w GROUP BY user_id, hour
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_ohlc_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OHLC (candlestick) hourly rollup per series: open/close are the
    first/last raw values by (t, event_id) — exact row values, so the
    doubles hash-match without any accumulation-order hazard —
    high/low/count are plain aggregates.  One shuffle on (user, hour);
    both row_number windows and the final aggregate reuse the same
    hash partitioning, so Spark plans a single exchange — the shape
    that makes per-series downsampling linear at 100 TB."""
    ev = _events(spark, sf_dir)
    h = ev.select(
        "user_id", F.expr("t div 3600000000").alias("hour"),
        "t", "event_id", "value",
    )
    wa = Window.partitionBy("user_id", "hour").orderBy("t", "event_id")
    wd = Window.partitionBy("user_id", "hour").orderBy(
        F.desc("t"), F.desc("event_id"))
    w = h.select(
        "user_id", "hour", "value",
        F.row_number().over(wa).alias("rn_a"),
        F.row_number().over(wd).alias("rn_d"),
    )
    return w.groupBy("user_id", "hour").agg(
        F.max(F.when(F.col("rn_a") == 1, F.col("value"))).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max(F.when(F.col("rn_d") == 1, F.col("value"))).alias("close"),
        F.count("*").alias("n_points"),
    )


#: Z-order geometry: the Morton interleave is a fixed 16-bit-wide
#: spread (the mask chain in _spread_bits_sql IS the width — widen it
#: by adding a (16, 0x0000FFFF0000FFFF) level); _Z_CELL_SHIFT is the
#: coarse cell width used to summarize locality.
_Z_CELL_SHIFT = 6


def _spread_bits_sql(x: str) -> str:
    """Closed-form 16->32 bit spread (insert a zero between adjacent
    bits) via the classic magic-number shift/mask chain — plain
    integer ``| & <<`` expressions that parse AND evaluate identically
    in Spark SQL and DuckDB (one shared string), and stay inside
    whole-stage codegen on the Spark side (an ``aggregate()`` fold
    over the bits would be interpreted).

    ``x`` must be a BARE COLUMN NAME (or cheap deterministic
    expression): the chain substitutes it textually twice per level,
    so an expensive operand would be evaluated up to 16 times."""
    s = x
    for shift, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                        (2, 0x33333333), (1, 0x55555555)):
        s = f"(({s} | ({s} << {shift})) & {mask})"
    return s


_ZVAL_SQL = (
    f"({_spread_bits_sql('bucket')} | ({_spread_bits_sql('hb')} << 1))"
)


@register(
    "ts_zorder_stats",
    oracle=f"""{_EV_CTE},
d AS (
  SELECT event_id, ((user_id * 2) % 64) AS bucket,
         ((t // 3600000000) % 1024) AS hb
  FROM ev),
z AS (
  SELECT event_id, bucket, hb,
         CAST({_ZVAL_SQL} AS BIGINT) AS zval
  FROM d)
SELECT zval >> {_Z_CELL_SHIFT} AS zcell, count(*) AS n,
       count(DISTINCT bucket) AS n_buckets,
       count(DISTINCT hb) AS n_hours,
       min(zval) AS z_min, max(zval) AS z_max
FROM z GROUP BY 1
""",
    tags=("timeseries", "layout"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_zorder_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) layout clustering: interleave the bits of the
    two pruning dimensions — key bucket and hour bucket — into one
    sort key, then summarize each coarse z-cell (64 consecutive
    z-values).  Every cell touches only a tiny sub-rectangle of the
    (bucket, hour) space (``n_buckets``/``n_hours`` per cell are
    small), which is exactly why writing files in z-order lets BOTH
    a key-range and a time-range predicate prune files at once — the
    multi-dimensional generalization of the store's (epoch, bucket)
    directory layout (Delta/Iceberg OPTIMIZE ZORDER's contract).
    Pure integer bit arithmetic, codegen'd JVM-side; one hash
    aggregate on the derived cell key."""
    ev = _events(spark, sf_dir)
    d = ev.select(
        "event_id",
        ((F.col("user_id") * 2) % 64).alias("bucket"),
        (F.expr("t div 3600000000") % 1024).alias("hb"),
    )
    z = d.select("event_id", "bucket", "hb",
                 F.expr(_ZVAL_SQL).cast("long").alias("zval"))
    return (
        z.groupBy(F.shiftright("zval", _Z_CELL_SHIFT).alias("zcell"))
        .agg(
            F.count("*").alias("n"),
            F.countDistinct("bucket").alias("n_buckets"),
            F.countDistinct("hb").alias("n_hours"),
            F.min("zval").alias("z_min"),
            F.max("zval").alias("z_max"),
        )
    )


@register(
    "ts_json_props",
    oracle="""
SELECT event_type, count(*) AS n,
       CAST(sum(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
       min(CAST(props->>'$.k' AS BIGINT)) AS min_k,
       max(CAST(props->>'$.k' AS BIGINT)) AS max_k,
       CAST(count(*) FILTER (CAST(props->>'$.k' AS BIGINT) >= 50)
            AS BIGINT) AS n_high
FROM events GROUP BY event_type
""",
    tags=("timeseries", "json"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_json_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured extraction: pull a typed field out of the JSON
    ``props`` column (``get_json_object`` — Jackson-based, JVM-side,
    codegen'd) and aggregate it per event type — the event-properties
    query shape every telemetry pipeline runs.  At 100 TB the
    extraction is a pure map stage over the scan; only the 5-group
    aggregate shuffles.  Equivalent DuckDB JSON-path extraction is the
    oracle, with all outputs integers."""
    ev = load(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
            F.count_if(F.col("k") >= 50).alias("n_high"),
        )
    )


#: Pivot columns: the explicit event-type list (explicit values keep
#: the Spark pivot single-pass and the output schema deterministic).
_PIVOT_TYPES = ("click", "error", "purchase", "signup", "view")


@register(
    "ts_pivot_event_counts",
    oracle=f"""
SELECT user_id,
       {", ".join(
           f"CAST(count(*) FILTER (event_type = '{t}') AS BIGINT) AS {t}"
           for t in _PIVOT_TYPES)}
FROM events GROUP BY user_id
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_pivot_event_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (long -> wide): per-user event counts with one column per
    event type, via Spark's native ``groupBy().pivot(values=...)`` —
    passing the explicit value list keeps it ONE pass (no
    distinct-values pre-query) with a fixed output schema, which is
    the only sane form at 100 TB.  Counts of absent combinations are
    0, matching the oracle's FILTER counts."""
    ev = load(spark, sf_dir, "events")
    p = (
        ev.groupBy("user_id")
        .pivot("event_type", list(_PIVOT_TYPES))
        .agg(F.count(F.lit(1)))  # count(*) is rejected inside Pivot
    )
    return p.select(
        "user_id",
        *[F.coalesce(F.col(t), F.lit(0)).cast("long").alias(t)
          for t in _PIVOT_TYPES],
    )


@register(
    "ts_funnel",
    oracle=f"""{_EV_CTE},
u1 AS (SELECT user_id, min(t) FILTER (event_type = 'view') AS v1
       FROM ev GROUP BY user_id),
u2 AS (SELECT e.user_id, min(u1.v1) AS v1,
              min(e.t) FILTER (e.event_type = 'click'
                               AND e.t > u1.v1) AS c1
       FROM ev e JOIN u1 ON u1.user_id = e.user_id GROUP BY e.user_id),
u3 AS (SELECT e.user_id, min(u2.c1) AS c1,
              min(e.t) FILTER (e.event_type = 'purchase'
                               AND e.t > u2.c1) AS p1
       FROM ev e JOIN u2 ON u2.user_id = e.user_id GROUP BY e.user_id)
SELECT count(*) AS n_users,
       CAST(count(u1.v1) AS BIGINT) AS n_view,
       CAST(count(u3.c1) AS BIGINT) AS n_view_click,
       CAST(count(u3.p1) AS BIGINT) AS n_full_funnel
FROM u3 JOIN u1 ON u1.user_id = u3.user_id
""",
    tags=("timeseries", "analytics"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis (view -> click -> purchase): per user,
    the first view, the first click strictly AFTER it, the first
    purchase strictly after that — sequence-aware conversion counting,
    not mere per-type existence.  Each stage is one aggregate joined
    back on user_id; all three joins share the user_id hash
    partitioning, so the plan is one shuffle plus map-side stages
    (production persists the evented frame across the three passes).
    Counts are integers; stage times are derived, never compared as
    floats."""
    ev = _events(spark, sf_dir)
    u1 = ev.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", F.col("t")))
        .alias("v1")
    )
    u2 = (
        ev.join(u1, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("v1").alias("v1"),
            F.min(
                F.when(
                    (F.col("event_type") == "click")
                    & (F.col("t") > F.col("v1")),
                    F.col("t"),
                )
            ).alias("c1"),
        )
    )
    u3 = (
        ev.join(u2, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("c1").alias("c1"),
            F.min(
                F.when(
                    (F.col("event_type") == "purchase")
                    & (F.col("t") > F.col("c1")),
                    F.col("t"),
                )
            ).alias("p1"),
        )
    )
    return u3.join(u1, "user_id").agg(
        F.count("*").alias("n_users"),
        F.count("v1").alias("n_view"),
        F.count("c1").alias("n_view_click"),
        F.count("p1").alias("n_full_funnel"),
    )


@register(
    "ts_cohort_retention",
    oracle=f"""{_EV_CTE},
d AS (SELECT user_id, t // 86400000000 AS day FROM ev),
c AS (SELECT user_id, min(day) AS cohort_day FROM d GROUP BY user_id)
SELECT c.cohort_day, d.day - c.cohort_day AS age_days,
       CAST(count(DISTINCT d.user_id) AS BIGINT) AS n_active
FROM d JOIN c ON c.user_id = d.user_id
GROUP BY 1, 2
""",
    tags=("timeseries", "analytics"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first active
    day, activity counted per days-since-cohort — the standard
    retention triangle.  One aggregate for cohort assignment, one
    join back (user_id partitioning reused), one distinct-count
    aggregate; all integers."""
    ev = _events(spark, sf_dir)
    d = ev.select("user_id", F.expr("t div 86400000000").alias("day"))
    c = d.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        d.join(c, "user_id")
        .groupBy(
            "cohort_day",
            (F.col("day") - F.col("cohort_day")).alias("age_days"),
        )
        .agg(F.countDistinct("user_id").alias("n_active"))
    )


@register(
    "ts_anomaly_zscore",
    oracle=f"""{_EV_CTE},
x0 AS (SELECT user_id,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS xr
       FROM ev),
mn AS (SELECT user_id, min(xr) AS mnv, max(xr) - min(xr) AS rng,
              count(*) AS n
       FROM x0 GROUP BY user_id),
x AS (SELECT x0.user_id, x0.xr - mn.mnv AS xc
      FROM x0 JOIN mn ON mn.user_id = x0.user_id),
s AS (SELECT x.user_id, min(mn.n) AS n,
             CAST(sum(x.xc) AS BIGINT) AS sx,
             CAST(sum(x.xc * x.xc) AS BIGINT) AS sxx
      FROM x JOIN mn ON mn.user_id = x.user_id
      WHERE CASE WHEN mn.n * mn.rng > 1000000000
                 THEN error('zscore int64 precondition violated')
                 ELSE TRUE END
      GROUP BY x.user_id)
SELECT x.user_id, min(s.n) AS n,
       CAST(count(*) FILTER (
         (s.n * x.xc - s.sx) * (s.n * x.xc - s.sx)
           > 9 * (s.n * s.sxx - s.sx * s.sx)) AS BIGINT) AS n_anomalies
FROM x JOIN s ON s.user_id = x.user_id
GROUP BY x.user_id
""",
    tags=("timeseries", "analytics"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-series 3-sigma anomaly counting with EXACT integer
    arithmetic: values become integer cents, and ``|x - mean| > 3
    sigma`` is evaluated as the cross-multiplied integer inequality
    ``(n*x - sum)^2 > 9*(n*sum_sq - sum^2)`` — no float mean/std whose
    accumulation order could flip a borderline comparison, so even
    this statistical filter hash-matches across engines.  Plan: one
    stats aggregate + one join back on the series key (shared
    partitioning), one counting aggregate."""
    ev = _events(spark, sf_dir)
    x0 = ev.select(
        "user_id",
        (F.col("value").cast("decimal(18,2)") * 100).cast("long")
        .alias("xr"),
    )
    # int64-safety (two r5 review findings): values are CENTERED on
    # the per-series minimum BEFORE any sum — dev and variance are
    # translation-invariant, so results are unchanged, but every
    # intermediate (xc, sx, sxx, the cross-multiplied comparison) is
    # now bounded by functions of n * range_cents alone, making the
    # loud precondition n * range <= 1e9 genuinely sufficient (an
    # absolute-magnitude corpus would otherwise overflow sum(xc*xc)
    # while passing a range-only check).
    mn = x0.groupBy("user_id").agg(
        F.min("xr").alias("mnv"),
        (F.max("xr") - F.min("xr")).alias("rng"),
        F.count("*").alias("n"),
    )
    x = x0.join(mn, "user_id").select(
        "user_id", (F.col("xr") - F.col("mnv")).alias("xc"))
    s = (
        x.join(mn, "user_id")
        .filter(F.expr(
            "CASE WHEN n * rng > 1000000000 THEN "
            "raise_error('zscore int64 precondition violated') "
            "ELSE TRUE END"
        ))
        .groupBy("user_id")
        .agg(
            F.min("n").alias("n"),
            F.sum("xc").cast("long").alias("sx"),
            F.sum(F.col("xc") * F.col("xc")).cast("long").alias("sxx"),
        )
    )
    dev = F.col("n") * F.col("xc") - F.col("sx")
    var9 = 9 * (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
    return (
        x.join(s, "user_id")
        .groupBy("user_id")
        .agg(
            F.min("n").alias("n"),
            F.count_if(dev * dev > var9).alias("n_anomalies"),
        )
    )


@register(
    "ts_moving_window_sum",
    oracle=f"""{_EV_CTE}
SELECT event_id, user_id, t,
       CAST(count(*) OVER w AS BIGINT) AS n_in_window,
       CAST(sum(CAST(value AS DECIMAL(18,2))) OVER w AS DOUBLE)
         AS win_sum
FROM ev
WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r7 after r6 driver green, to rotate the r6 carve-out batch + oldest-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_moving_window_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE-framed moving aggregate: per event, the count and
    value sum of the same series' events in the trailing hour — a
    RANGE (value-based) frame, not a ROWS frame, so irregular
    sampling and timestamp ties are handled by time distance, the
    semantics ROWS frames get wrong.  The frame is a SET of rows on
    both engines, and the sum is an exact DECIMAL over that set cast
    to double once — order-independent, hash-exact.  One shuffle on
    the series key; the frame scan is the standard sliding two-pointer
    inside each partition."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id").orderBy("t")
        .rangeBetween(-3_600_000_000, 0)
    )
    return ev.select(
        "event_id", "user_id", "t",
        F.count("*").over(w).alias("n_in_window"),
        F.sum(F.col("value").cast("decimal(18,2)")).over(w)
        .cast("double").alias("win_sum"),
    )


# ------------------------------------------------ r6: gap fill / LOCF


#: Shared gapfill scaffold (oracle side): latest-in-hour reduction,
#: per-user span, hour grid, left join — ONE definition for the locf
#: and interpolate variants so the tie-break/DECIMAL rules cannot
#: drift between them (r8 review finding).
_HOUR_GRID_CTE_SQL = """hourly AS (
  -- latest-in-hour winner via row_number (DuckDB's arg_max lacks a
  -- composite-key overload; same (t, event_id) total order as the
  -- Spark max_by struct)
  SELECT user_id, h, v, n FROM (
    SELECT user_id, t // 3600000000 AS h,
           CAST(value AS DECIMAL(12,2)) AS v,
           row_number() OVER (PARTITION BY user_id, t // 3600000000
                              ORDER BY t DESC, event_id DESC) AS rn,
           count(*) OVER (PARTITION BY user_id, t // 3600000000) AS n
    FROM ev) WHERE rn = 1),
spans AS (
  SELECT user_id, min(h) AS h0, max(h) AS h1 FROM hourly GROUP BY 1),
grid AS (
  SELECT s.user_id, g.h
  FROM spans s, unnest(generate_series(s.h0, s.h1)) AS g(h)),
joined AS (
  SELECT g.user_id, g.h, hv.v, coalesce(hv.n, 0) AS n
  FROM grid g LEFT JOIN hourly hv
    ON hv.user_id = g.user_id AND hv.h = g.h)"""


def _hour_grid(ev):
    """Spark twin of :data:`_HOUR_GRID_CTE_SQL`: (user_id, h, v, n)
    over the per-user active-hour grid, v = latest-in-hour
    DECIMAL(12,2) (max_by over (t, event_id) — same total order as
    the oracle's row_number), n = observations in the hour."""
    hourly = (
        ev.groupBy("user_id", F.expr("t div 3600000000").alias("h"))
        .agg(
            F.max_by(
                F.col("value").cast("decimal(12,2)"),
                F.struct("t", "event_id"),
            ).alias("v"),
            F.count("*").alias("n"),
        )
    )
    spans = hourly.groupBy("user_id").agg(
        F.min("h").alias("h0"), F.max("h").alias("h1"))
    grid = spans.select(
        "user_id", F.explode(F.sequence("h0", "h1")).alias("h"))
    return grid.join(hourly, ["user_id", "h"], "left").select(
        "user_id", "h", "v", F.coalesce("n", F.lit(0)).alias("n"))


@register(
    "ts_gapfill_locf",
    oracle=f"""{_EV_CTE},
{_HOUR_GRID_CTE_SQL}
SELECT user_id, h * 3600000000 AS hour_us, n,
       CAST(n = 0 AS INT) AS filled,
       CAST(last_value(v IGNORE NULLS) OVER (
         PARTITION BY user_id ORDER BY h
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS value_locf
FROM joined
""",
    tags=("timeseries",),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_gapfill_locf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap fill + last-observation-carried-forward
    (``time_bucket_gapfill`` + ``locf`` in TimescaleDB terms — the
    continuous-dashboard primitive the reference's fixed-interval
    store implies but never ships).  Per user: hourly buckets from the
    user's first to last active hour, missing hours generated with
    ``sequence()`` (bounded by the retention window, never a global
    driver loop), the latest-in-hour value picked by ``max_by`` over
    (t, event_id) (deterministic under shuffle), and gaps filled with
    ``last(..., ignorenulls)`` over the per-user hour order.

    Scale: one hash aggregate (user, hour), a per-user two-row span
    aggregate, the grid explode (rows = active span hours, O(data/
    density)), and ONE window partitioned by user — no global sort, no
    driver materialization; value arithmetic stays in DECIMAL until
    the final double cast.
    """
    ev = _events(spark, sf_dir)
    joined = _hour_grid(ev)
    w = (
        Window.partitionBy("user_id").orderBy("h")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return joined.select(
        "user_id",
        (F.col("h") * F.lit(3_600_000_000)).alias("hour_us"),
        "n",
        (F.col("n") == 0).cast("int").alias("filled"),
        F.last("v", ignorenulls=True).over(w).cast("double")
        .alias("value_locf"),
    )


# ------------------------------------------- r6: counter rate / delta


@register(
    "ts_counter_rate",
    oracle=f"""{_EV_CTE},
d AS (
  SELECT user_id, t // 86400000000 AS day,
         CAST(value AS DECIMAL(12,2))
           - lag(CAST(value AS DECIMAL(12,2))) OVER (
               PARTITION BY user_id ORDER BY t, event_id) AS delta,
         CAST(value AS DECIMAL(12,2)) AS v
  FROM ev)
SELECT user_id, day * 86400000000 AS day_us,
       CAST(sum(CASE WHEN delta IS NULL THEN CAST(0 AS DECIMAL(12,2))
                     WHEN delta >= 0 THEN delta
                     ELSE v END) AS DOUBLE) AS increase,
       CAST(sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_resets
FROM d GROUP BY 1, 2
""",
    tags=("timeseries",),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_counter_rate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PromQL-style reset-aware ``increase()``: per user per day, the
    sum of non-negative deltas between consecutive samples (ordered by
    (t, event_id) — total order, shuffle-stable), where a negative
    delta means the counter reset and the post-reset value counts from
    zero.  The first sample of a series contributes nothing (no
    predecessor).  The day attribution follows the SAMPLE's day while
    the delta spans the boundary — the standard monitoring-system
    convention, identical in both engines.

    Scale: one window (partition user, order t) + one hash aggregate
    — the same single-shuffle shape as ts_delta/lag; all arithmetic
    in DECIMAL until the final cast.
    """
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    v = F.col("value").cast("decimal(12,2)")
    d = ev.select(
        "user_id",
        F.expr("t div 86400000000").alias("day"),
        (v - F.lag(v).over(w)).alias("delta"),
        v.alias("v"),
    )
    zero = F.lit(0).cast("decimal(12,2)")
    return d.groupBy(
        "user_id",
        (F.col("day") * F.lit(86_400_000_000)).alias("day_us"),
    ).agg(
        F.sum(
            F.when(F.col("delta").isNull(), zero)
            .when(F.col("delta") >= 0, F.col("delta"))
            .otherwise(F.col("v"))
        ).cast("double").alias("increase"),
        F.sum(F.when(F.col("delta") < 0, 1).otherwise(0))
        .cast("long").alias("n_resets"),
    )


# ------------------------------------------- r6: exact quantiles


@register(
    "ts_quantiles",
    oracle=f"""{_EV_CTE},
r AS (
  SELECT event_type, CAST(value AS DECIMAL(12,2)) AS v,
         row_number() OVER (PARTITION BY event_type
                            ORDER BY CAST(value AS DECIMAL(12,2)),
                                     event_id) AS rn,
         count(*) OVER (PARTITION BY event_type) AS n
  FROM ev)
SELECT event_type, max(n) AS n,
       CAST(max(CASE WHEN rn = (n * 50 + 99) // 100 THEN v END)
            AS DOUBLE) AS p50,
       CAST(max(CASE WHEN rn = (n * 90 + 99) // 100 THEN v END)
            AS DOUBLE) AS p90,
       CAST(max(CASE WHEN rn = (n * 99 + 99) // 100 THEN v END)
            AS DOUBLE) AS p99
FROM r GROUP BY event_type
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT discrete quantiles (p50/p90/p99 of value per event type)
    with an engine-independent rank rule: the element at rank
    ``ceil(q*n)`` under the total order (value, event_id) — integer
    arithmetic only (``(n*q + 99) // 100``), so neither engine's
    built-in percentile semantics (interpolation modes, float
    rounding) can drift the result.

    Scale: one window per type + conditional aggregate — exact
    quantiles fundamentally need the per-group order; for 100 TB
    approximate pipelines the KMV/CMS sketches (queries_sketch) are
    the mergeable alternative, this is the exact batch twin.
    """
    ev = _events(spark, sf_dir)
    v = F.col("value").cast("decimal(12,2)")
    wo = Window.partitionBy("event_type").orderBy(v.asc(), "event_id")
    wn = Window.partitionBy("event_type")
    r = ev.select(
        "event_type", v.alias("v"),
        F.row_number().over(wo).alias("rn"),
        F.count("*").over(wn).alias("n"),
    )

    def pick(mult: int):
        # exact integer ceil-div (`div`, not float floor(x/100)) — the
        # cross-engine rule every bucketing expression follows
        rank = F.expr(f"(n * {mult} + 99) div 100")
        return F.max(F.when(F.col("rn") == rank, F.col("v")))

    return r.groupBy("event_type").agg(
        F.max("n").alias("n"),
        pick(50).cast("double").alias("p50"),
        pick(90).cast("double").alias("p90"),
        pick(99).cast("double").alias("p99"),
    )


# --------------------------------------- r6: time-weighted average


@register(
    "ts_time_weighted_avg",
    oracle=f"""{_EV_CTE},
s AS (
  SELECT user_id, t // 86400000000 AS day,
         CAST(value AS DECIMAL(12,2)) AS v,
         lead(t) OVER (PARTITION BY user_id, t // 86400000000
                       ORDER BY t, event_id) - t AS d
  FROM ev)
SELECT user_id, day * 86400000000 AS day_us,
       CAST(count(*) AS BIGINT) AS n_samples,
       CAST(sum(d) AS BIGINT) AS span_us,
       CAST(sum(v * d) AS DOUBLE) / CAST(sum(d) AS DOUBLE) AS twa
FROM s GROUP BY 1, 2
HAVING sum(d) > 0
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average per user per day (TimescaleDB's
    ``time_weight('LOCF', ...)`` / the monitoring-system twa) —
    irregularly-sampled gauges where the plain AVG over-counts bursty
    periods: each sample's value is weighted by how long it held,
    i.e. the µs until the next sample of the same user-day under the
    (t, event_id) total order.  The day's last sample carries no
    weight (its holding interval leaves the partition), and
    single-sample / zero-span days are excluded (``HAVING sum(d) >
    0``) rather than inventing a duration for them.

    Cross-engine exactness: weights are integer µs, values DECIMAL —
    ``sum(v*d)`` and ``sum(d)`` are both exact and order-independent,
    and the ratio is ONE IEEE divide of the two casts, so even the
    float hash matches.

    Scale: one window + one hash aggregate, both on the same
    (user_id, day) keys — the window's required partitioning is
    reused by the aggregate, so this is a single exchange end-to-end
    (same shape as ts_counter_rate).
    """
    ev = _events(spark, sf_dir)
    # day must be a projected ATTRIBUTE before the window so the
    # aggregate's (user_id, day) requirement is satisfied by the
    # window's hash partitioning — grouping on the scaled day_us
    # expression instead costs a second exchange (verified in the
    # executed plan).
    base = ev.select(
        "user_id", "event_id", "t",
        F.expr("t div 86400000000").alias("day"),
        F.col("value").cast("decimal(12,2)").alias("v"),
    )
    w = Window.partitionBy("user_id", "day").orderBy("t", "event_id")
    s = base.select(
        "user_id", "day", "v",
        (F.lead("t").over(w) - F.col("t")).alias("d"),
    )
    return (
        s.groupBy("user_id", "day")
        .agg(
            F.count("*").cast("long").alias("n_samples"),
            F.sum("d").cast("long").alias("span_us"),
            (F.sum(F.col("v") * F.col("d")).cast("double")
             / F.sum("d").cast("double")).alias("twa"),
        )
        .filter(F.col("span_us") > 0)
        .select(
            "user_id",
            (F.col("day") * F.lit(86_400_000_000)).alias("day_us"),
            "n_samples", "span_us", "twa",
        )
    )


# ----------------------------------------------- r6: M4 downsampling


@register(
    "ts_m4_downsample",
    oracle=f"""{_EV_CTE},
b AS (
  -- first/last via twin row_numbers (DuckDB's min_by/max_by lack a
  -- composite-key overload; same workaround as the gapfill oracle,
  -- same (t, event_id) total order as the Spark min_by/max_by struct)
  SELECT user_id, t // 3600000000 AS h,
         CAST(value AS DECIMAL(12,2)) AS v,
         row_number() OVER (PARTITION BY user_id, t // 3600000000
                            ORDER BY t, event_id) AS rf,
         row_number() OVER (PARTITION BY user_id, t // 3600000000
                            ORDER BY t DESC, event_id DESC) AS rl
  FROM ev)
SELECT user_id, h * 3600000000 AS hour_us,
       CAST(count(*) AS BIGINT) AS n,
       CAST(min(v) AS DOUBLE) AS v_min,
       CAST(max(v) AS DOUBLE) AS v_max,
       CAST(max(CASE WHEN rf = 1 THEN v END) AS DOUBLE) AS v_first,
       CAST(max(CASE WHEN rl = 1 THEN v END) AS DOUBLE) AS v_last
FROM b GROUP BY 1, 2
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_m4_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """M4 downsampling (Jugel et al., VLDB 2014): per (series, time
    bucket) keep exactly the four value-defining points — min, max,
    first, last — which is the smallest aggregation that renders a
    pixel-perfect line chart at the bucket resolution.  First/last are
    ``min_by``/``max_by`` over the (t, event_id) total order, so ties
    at the same timestamp resolve identically in both engines.

    Scale: ONE hash aggregate with map-side partials — every one of
    the four statistics is associative, so a 100 TB scan reduces to
    |series| x |buckets| rows with no window, no sort, and no second
    exchange; this is the query a dashboard fan-out runs over raw
    points when no rollup exists yet.
    """
    ev = _events(spark, sf_dir)
    v = F.col("value").cast("decimal(12,2)")
    ord_ = F.struct("t", "event_id")
    return (
        ev.select("user_id", F.expr("t div 3600000000").alias("h"),
                  v.alias("v"), "t", "event_id")
        .groupBy("user_id", "h")
        .agg(
            F.count("*").cast("long").alias("n"),
            F.min("v").cast("double").alias("v_min"),
            F.max("v").cast("double").alias("v_max"),
            F.min_by("v", ord_).cast("double").alias("v_first"),
            F.max_by("v", ord_).cast("double").alias("v_last"),
        )
        .select("user_id", (F.col("h") * F.lit(3_600_000_000)).alias("hour_us"),
                "n", "v_min", "v_max", "v_first", "v_last")
    )


@register(
    "ts_rollup_cascade",
    oracle=f"""{_EV_CTE}
SELECT t // 86400000000 AS day, event_type, count(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value,
       min(t) AS first_t, max(t) AS last_t
FROM ev GROUP BY 1, 2
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_rollup_cascade(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hierarchical rollup REUSE: the daily aggregate is computed FROM
    the hourly continuous aggregate (ts_rollup_hourly's shape), never
    from raw — counts add, exact DECIMAL sums add, min/max compose —
    while the oracle computes the day aggregate straight from raw.
    The hash match IS the associativity law that makes materialized
    rollup cascades (1m -> 1h -> 1d, the TimescaleDB continuous-
    aggregate / lambda-architecture pattern) sound: at 100 TB the day
    tier reads 24 hourly rows per series instead of re-scanning a day
    of raw events.  The intermediate keeps the DECIMAL sum exact and
    only the FINAL tier casts to double, so the cascade is
    bit-identical to the direct aggregate regardless of shuffle
    order."""
    ev = _events(spark, sf_dir)
    hourly = (
        ev.withColumn("hour", F.expr("t div 3600000000"))
        .groupBy("hour", "event_type")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("value").cast("decimal(18,2)")).alias("sv"),
            F.min("t").alias("first_t"),
            F.max("t").alias("last_t"),
        )
    )
    return (
        hourly.withColumn("day", F.expr("hour div 24"))
        .groupBy("day", "event_type")
        .agg(
            F.sum("n").alias("n"),
            F.sum("sv").cast("double").alias("sum_value"),
            F.min("first_t").alias("first_t"),
            F.max("last_t").alias("last_t"),
        )
        .select("day", "event_type", "n", "sum_value", "first_t",
                "last_t")
    )


@register(
    "ts_gapfill_interpolate",
    oracle=f"""{_EV_CTE},
{_HOUR_GRID_CTE_SQL},
nb AS (
  SELECT user_id, h, v, n,
         last_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS pv,
         last_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS ph,
         first_value(v IGNORE NULLS) OVER (
           PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nv,
         first_value(CASE WHEN v IS NOT NULL THEN h END IGNORE NULLS)
           OVER (PARTITION BY user_id ORDER BY h
           ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS nh
  FROM joined)
SELECT user_id, h * 3600000000 AS hour_us, n,
       CAST(n = 0 AS INT) AS interpolated,
       CASE WHEN n > 0 THEN CAST(v AS DOUBLE)
            ELSE (CAST(pv AS DOUBLE)
                  + ((CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))
                     * (CAST(h - ph AS DOUBLE)
                        / CAST(nh - ph AS DOUBLE))))
       END AS value_out
FROM nb
""",
    tags=("timeseries",),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_gapfill_interpolate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap fill by LINEAR INTERPOLATION — the ``interpolate()`` sibling
    of :func:`ts_gapfill_locf` (TimescaleDB's other gapfill mode):
    missing hours get ``pv + (nv - pv) * (h - ph)/(nh - ph)`` from the
    nearest observed neighbors on each side.  Span endpoints are
    observed by construction (the grid runs first..last ACTIVE hour),
    so every gap is interior and both neighbors always exist — the
    formula is total, no NULL doubles reach the hash.  Float
    determinism: every operand is cast to DOUBLE explicitly and the
    expression is FULLY parenthesized — * and / share precedence and
    left-associate, so an unparenthesized chain would round
    differently per engine (the sim_mmr_select lesson); with identical
    trees both engines produce identical bits.

    Scale: same shape as locf — one (user, hour) hash aggregate, span
    explode, and per-user windows (two directions); no global sort."""
    ev = _events(spark, sf_dir)
    joined = _hour_grid(ev)
    wp = (Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    wf = (Window.partitionBy("user_id").orderBy("h")
          .rowsBetween(Window.currentRow, Window.unboundedFollowing))
    obs_h = F.when(F.col("v").isNotNull(), F.col("h"))
    nb = joined.select(
        "user_id", "h", "v", "n",
        F.last("v", ignorenulls=True).over(wp).alias("pv"),
        F.last(obs_h, ignorenulls=True).over(wp).alias("ph"),
        F.first("v", ignorenulls=True).over(wf).alias("nv"),
        F.first(obs_h, ignorenulls=True).over(wf).alias("nh"),
    )
    interp = F.expr(
        "CAST(pv AS DOUBLE) + ((CAST(nv AS DOUBLE) - CAST(pv AS DOUBLE))"
        " * (CAST(h - ph AS DOUBLE) / CAST(nh - ph AS DOUBLE)))"
    )
    return nb.select(
        "user_id",
        (F.col("h") * 3_600_000_000).alias("hour_us"),
        "n",
        (F.col("n") == 0).cast("int").alias("interpolated"),
        F.when(F.col("n") > 0, F.col("v").cast("double"))
        .otherwise(interp).alias("value_out"),
    )


@register(
    "ts_ooo_lateness",
    oracle=f"""{_EV_CTE},
lat AS (
  SELECT user_id, t, event_id,
         max(t) OVER (PARTITION BY user_id ORDER BY event_id
                      ROWS BETWEEN UNBOUNDED PRECEDING
                      AND 1 PRECEDING) AS seen_max
  FROM ev)
SELECT user_id, count(*) AS n,
       CAST(sum(CASE WHEN seen_max > t THEN 1 ELSE 0 END) AS BIGINT)
         AS n_late,
       CAST(max(CASE WHEN seen_max > t THEN seen_max - t ELSE 0 END)
            AS BIGINT) AS max_lateness_us,
       CAST(sum(CASE WHEN seen_max > t THEN seen_max - t ELSE 0 END)
            AS BIGINT) AS sum_lateness_us
FROM lat GROUP BY user_id
""",
    tags=("timeseries", "streaming"),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_ooo_lateness(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order-arrival profile — the WATERMARK-SIZING report:
    treating event_id as arrival order, an event is late iff some
    earlier-arriving event of the same user carries a LARGER event
    time; its lateness is the gap to that running maximum.  Per-user
    late counts, max and total lateness (integer µs end to end) are
    exactly the numbers that justify a ``withWatermark`` bound: a 30
    minute watermark drops precisely the events whose lateness here
    exceeds 30 minutes.  One window over (user, arrival order) + one
    hash aggregate; no global sort."""
    ev = _events(spark, sf_dir)
    w = (
        Window.partitionBy("user_id").orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lat = ev.select(
        "user_id", "t", "event_id",
        F.max("t").over(w).alias("seen_max"),
    )
    late = F.col("seen_max") > F.col("t")
    gap = F.when(late, F.col("seen_max") - F.col("t")).otherwise(0)
    return lat.groupBy("user_id").agg(
        F.count("*").alias("n"),
        # when/otherwise, NOT late.cast: a single-event user's frame is
        # empty, late is NULL, and sum over an all-NULL group returns
        # NULL where the oracle's CASE ELSE 0 returns 0 (r8 review #2)
        F.sum(F.when(late, 1).otherwise(0)).cast("long").alias("n_late"),
        F.max(gap).cast("long").alias("max_lateness_us"),
        F.sum(gap).cast("long").alias("sum_lateness_us"),
    )


#: Gap threshold for ts_heartbeat_gaps: 6h of event-time silence.
_GAP_THRESHOLD_US = 6 * 3600 * 1_000_000


@register(
    "ts_heartbeat_gaps",
    oracle=f"""{_EV_CTE},
d AS (
  SELECT user_id, t,
         t - lag(t) OVER (PARTITION BY user_id ORDER BY t, event_id)
           AS gap
  FROM ev)
SELECT user_id, count(*) AS n,
       CAST(count(gap) AS BIGINT) AS n_intervals,
       CAST(max(gap) AS BIGINT) AS max_gap_us,
       CAST(sum(CASE WHEN gap > {_GAP_THRESHOLD_US} THEN 1 ELSE 0 END)
            AS BIGINT) AS n_outages,
       CAST(sum(CASE WHEN gap > {_GAP_THRESHOLD_US} THEN gap ELSE 0 END)
            AS BIGINT) AS downtime_us
FROM d GROUP BY user_id
""",
    tags=("timeseries",),
    priority=900,  # demoted in r10 after r9 driver green, to rotate the r9 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def ts_heartbeat_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heartbeat/outage detection: per series, inter-event gaps in
    event time, the largest silence, and the count/total duration of
    gaps beyond a 6h threshold — the liveness report a metrics store
    ships next to its dashboards (Prometheus' ``absent()``/staleness
    reduced to a batch certificate).  Integer µs end to end; one lag
    window over (series, time) + one hash aggregate, no global
    sort."""
    ev = _events(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    d = ev.select(
        "user_id", "t",
        (F.col("t") - F.lag("t").over(w)).alias("gap"),
    )
    big = F.col("gap") > _GAP_THRESHOLD_US
    return d.groupBy("user_id").agg(
        F.count("*").alias("n"),
        F.count("gap").cast("long").alias("n_intervals"),
        F.max("gap").cast("long").alias("max_gap_us"),
        # when/otherwise: a single-event user's gap is NULL and an
        # all-NULL sum returns NULL vs the oracle's 0 (r8 review #2)
        F.sum(F.when(big, 1).otherwise(0)).cast("long")
        .alias("n_outages"),
        F.sum(F.when(big, F.col("gap")).otherwise(0)).cast("long")
        .alias("downtime_us"),
    )


# ------------------------------------ r9: LTTB-style downsampling


@register(
    "ts_lttb_downsample",
    oracle=f"""{_EV_CTE},
iv AS (
  SELECT user_id, event_id, t, t // 86400000000 AS h,
         CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
  FROM ev),
st AS (
  SELECT user_id, h,
         CAST(count(*) AS DECIMAL(38,0)) AS n,
         CAST(sum(CAST(t AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS st,
         CAST(sum(CAST(v AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sv
  FROM iv GROUP BY 1, 2),
cand AS (
  SELECT c.user_id, c.h, c.t, c.v, c.event_id,
         abs(
           (p.st * x.n - x.st * p.n)
             * (CAST(c.v AS DECIMAL(38,0)) * p.n - p.sv)
           - (p.st - CAST(c.t AS DECIMAL(38,0)) * p.n)
             * (x.sv * p.n - p.sv * x.n)
         ) AS area
  FROM iv c
  JOIN st p ON p.user_id = c.user_id AND p.h = c.h - 1
  JOIN st x ON x.user_id = c.user_id AND x.h = c.h + 1),
pick AS (
  SELECT user_id, h, t, v,
         row_number() OVER (PARTITION BY user_id, h
                            ORDER BY area DESC, t, event_id) AS rn
  FROM cand)
SELECT user_id, h * 86400000000 AS day_us, t AS t_sel,
       CAST(v AS BIGINT) AS v_centi
FROM pick WHERE rn = 1
""",
    tags=("timeseries", "agg"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_lttb_downsample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LTTB-style downsampling (Steinarsson 2013, Largest-Triangle-
    Three-Buckets) — per (series, day bucket) keep the ONE point
    sweeping the largest triangle against the neighboring buckets,
    the perceptually-best single-point-per-bucket chart reduction
    next to :func:`ts_m4_downsample`'s four-point envelope.

    The published algorithm anchors each triangle on the PREVIOUSLY
    SELECTED point — a sequential chain that cannot parallelize; the
    standard distributed restatement (used here) anchors on the
    neighbor buckets' MEAN points instead, which drops the sequential
    dependence while keeping the area heuristic.  Determinism: the
    area comparison is EXACT — means are never materialized as
    floats; the cross-product is multiplied through by the neighbor
    counts so every term is DECIMAL(38,0) integer arithmetic
    (times in µs x counts x centi-values stay under 1e28), ties
    break on (t, event_id).  Boundary buckets (no prev or no next
    neighbor in the series) are excluded by the inner joins,
    identically in both engines.

    Scale: one hash aggregate for the per-bucket stats (|series| x
    |buckets| rows), two equi-joins of candidates against that tiny
    stats relation, one per-bucket window — no corpus-wide sort, no
    pair generation; the same shape as the rollup family."""
    ev = _events(spark, sf_dir)
    iv = ev.select(
        "user_id", "event_id", "t",
        F.expr("t div 86400000000").alias("h"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    ).transform(pin)
    d38 = "decimal(38,0)"
    st = iv.groupBy("user_id", "h").agg(
        F.count("*").cast(d38).alias("n"),
        F.sum(F.col("t").cast(d38)).cast(d38).alias("st"),
        F.sum(F.col("v").cast(d38)).cast(d38).alias("sv"),
    )
    p = st.select(F.col("user_id").alias("pu"),
                  (F.col("h") + 1).alias("ph"),
                  F.col("n").alias("pn"), F.col("st").alias("pst"),
                  F.col("sv").alias("psv"))
    x = st.select(F.col("user_id").alias("xu"),
                  (F.col("h") - 1).alias("xh"),
                  F.col("n").alias("xn"), F.col("st").alias("xst"),
                  F.col("sv").alias("xsv"))
    cand = (
        iv.join(p, (F.col("user_id") == F.col("pu"))
                & (F.col("h") == F.col("ph")))
        .join(x, (F.col("user_id") == F.col("xu"))
              & (F.col("h") == F.col("xh")))
        .select(
            "user_id", "h", "t", "v", "event_id",
            F.abs(
                (F.col("pst") * F.col("xn")
                 - F.col("xst") * F.col("pn"))
                * (F.col("v").cast(d38) * F.col("pn") - F.col("psv"))
                - (F.col("pst") - F.col("t").cast(d38) * F.col("pn"))
                * (F.col("xsv") * F.col("pn")
                   - F.col("psv") * F.col("xn"))
            ).alias("area"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("user_id", "h").orderBy(
        F.desc("area"), "t", "event_id")
    return (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            (F.col("h") * 86400000000).cast("long").alias("day_us"),
            F.col("t").alias("t_sel"),
            F.col("v").cast("long").alias("v_centi"),
        )
    )


# ------------------------------------ r9: CUSUM changepoint detection


@register(
    "ts_cusum_changepoint",
    oracle=f"""{_EV_CTE},
x0 AS (SELECT user_id, event_id, t,
              CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
       FROM ev),
mn AS (SELECT user_id, min(v) AS mnv,
              max(v) - min(v) AS rng, count(*) AS n
       FROM x0 GROUP BY user_id),
x AS (SELECT x0.user_id, x0.event_id, x0.t, x0.v - mn.mnv AS vc, mn.n
      FROM x0 JOIN mn ON mn.user_id = x0.user_id
      WHERE CASE WHEN mn.n * mn.n * greatest(mn.rng, 1)
                      > 2000000000000000000
                 THEN error('cusum int64 precondition violated')
                 ELSE TRUE END),
c AS (SELECT user_id, event_id, t, n,
             CAST(sum(vc) OVER (PARTITION BY user_id
                                ORDER BY t, event_id
                                ROWS UNBOUNDED PRECEDING)
                  AS BIGINT) AS s,
             row_number() OVER (PARTITION BY user_id
                                ORDER BY t, event_id) AS i
      FROM x),
tot AS (SELECT user_id, CAST(sum(vc) AS BIGINT) AS sn
        FROM x GROUP BY user_id),
d AS (SELECT c.user_id, c.n, c.t, c.i,
             abs(c.n * c.s - c.i * tot.sn) AS dabs
      FROM c JOIN tot ON tot.user_id = c.user_id),
pick AS (SELECT user_id, n, t, i, dabs,
                row_number() OVER (PARTITION BY user_id
                                   ORDER BY dabs DESC, t, i) AS rn
         FROM d)
SELECT user_id, CAST(n AS BIGINT) AS n, t AS t_cp,
       CAST(i AS BIGINT) AS cp_idx, CAST(dabs AS BIGINT) AS d_abs
FROM pick WHERE rn = 1
""",
    tags=("timeseries", "analytics"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Offline CUSUM changepoint detection per series (Page 1954 /
    the standard single-changepoint location statistic): the split
    point maximizing |mean(prefix) - mean(series)| weighted by the
    prefix length — evaluated as the cross-multiplied EXACT integer
    ``|n*S_i - i*S_n|`` (S = prefix sums of centi-values) so no
    float accumulation order can move the argmax across engines.
    Values are centered on the per-series minimum first (the
    statistic is translation-invariant, the intermediates then bound
    by n^2 * range — loud ``raise_error`` precondition, same device
    as :func:`ts_anomaly_zscore`); ties break on (t, event_id).

    Plan: one stats aggregate, one cumulative-sum window and one
    ranking window both partitioned by the series key (a single
    shuffle serves both), one join against the tiny per-series
    totals — no corpus-wide sort, state O(|series|)."""
    ev = _events(spark, sf_dir)
    x0 = ev.select(
        "user_id", "event_id", "t",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )
    mn = x0.groupBy("user_id").agg(
        F.min("v").alias("mnv"),
        (F.max("v") - F.min("v")).alias("rng"),
        F.count("*").alias("n"),
    )
    x = (
        x0.join(mn, "user_id")
        .filter(F.expr(
            "CASE WHEN n * n * greatest(rng, 1) > 2000000000000000000 "
            "THEN raise_error('cusum int64 precondition violated') "
            "ELSE TRUE END"
        ))
        .select("user_id", "event_id", "t",
                (F.col("v") - F.col("mnv")).alias("vc"), "n")
        .transform(pin)  # feeds the window pass AND the totals agg
    )
    wcum = (
        Window.partitionBy("user_id").orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    wseq = Window.partitionBy("user_id").orderBy("t", "event_id")
    c = x.select(
        "user_id", "event_id", "t", "n",
        F.sum("vc").over(wcum).cast("long").alias("s"),
        F.row_number().over(wseq).alias("i"),
    )
    tot = x.groupBy("user_id").agg(
        F.sum("vc").cast("long").alias("sn"))
    d = c.join(tot, "user_id").select(
        "user_id", "n", "t", "i",
        F.abs(F.col("n") * F.col("s") - F.col("i") * F.col("sn"))
        .alias("dabs"),
    )
    wr = Window.partitionBy("user_id").orderBy(
        F.desc("dabs"), "t", "i")
    return (
        d.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", F.col("n").cast("long").alias("n"),
            F.col("t").alias("t_cp"),
            F.col("i").cast("long").alias("cp_idx"),
            F.col("dabs").cast("long").alias("d_abs"),
        )
    )


# ------------------------------------ r9: seasonal (hour-of-day) baseline


@register(
    "ts_seasonal_baseline",
    oracle=f"""{_EV_CTE},
x AS (SELECT user_id, event_id, t,
             (t // 3600000000) % 24 AS hod,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM ev),
st AS (SELECT user_id, hod, count(*) AS n,
              CAST(sum(v) AS BIGINT) AS sv
       FROM x GROUP BY user_id, hod),
dev AS (SELECT x.user_id, x.hod, st.n, st.sv, x.t, x.v,
               abs(x.v * st.n - st.sv) AS dnum
        FROM x JOIN st ON st.user_id = x.user_id
                      AND st.hod = x.hod),
pick AS (SELECT user_id, hod, n, sv, t, v, dnum,
                row_number() OVER (PARTITION BY user_id, hod
                                   ORDER BY dnum DESC, t, v) AS rn
         FROM dev)
SELECT user_id, CAST(hod AS BIGINT) AS hod, CAST(n AS BIGINT) AS n,
       sv AS sum_centi, t AS t_peak, v AS v_centi_peak,
       CAST(dnum AS BIGINT) AS dev_num
FROM pick WHERE rn = 1
""",
    tags=("timeseries", "analytics"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_seasonal_baseline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hour-of-day seasonal profile with peak-residual detection —
    the classic ops decomposition (TimescaleDB time_bucket +
    seasonal baseline): per (series, hour-of-day) cell, the count,
    the value sum (the baseline numerator; baseline mean = sv/n),
    and the ONE observation deviating most from that cell's mean.
    The deviation is ranked by the cross-multiplied exact integer
    ``|v*n - sum|`` (= n * |v - mean|), so the argmax is
    float-free and hash-stable; ties break on (t, v).

    Plan: one hash aggregate for the 24-per-series profile, one join
    back on the (series, hod) key — the same partitioning, so AQE
    coalesces it — one per-cell ranking window.  State O(|series| x
    24); no corpus-wide sort."""
    ev = _events(spark, sf_dir)
    x = ev.select(
        "user_id", "event_id", "t",
        (F.expr("t div 3600000000") % 24).alias("hod"),
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    ).transform(pin)  # feeds the profile agg AND the join back
    st = x.groupBy("user_id", "hod").agg(
        F.count("*").alias("n"), F.sum("v").cast("long").alias("sv"))
    dev = x.join(st, ["user_id", "hod"]).select(
        "user_id", "hod", "n", "sv", "t", "v",
        F.abs(F.col("v") * F.col("n") - F.col("sv")).alias("dnum"),
    )
    wr = Window.partitionBy("user_id", "hod").orderBy(
        F.desc("dnum"), "t", "v")
    return (
        dev.withColumn("rn", F.row_number().over(wr))
        .filter(F.col("rn") == 1)
        .select(
            "user_id", F.col("hod").cast("long").alias("hod"),
            F.col("n").cast("long").alias("n"),
            F.col("sv").alias("sum_centi"),
            F.col("t").alias("t_peak"),
            F.col("v").alias("v_centi_peak"),
            F.col("dnum").cast("long").alias("dev_num"),
        )
    )


# ------------------------------------ r9: rolling active users (DAU/WAU)


@register(
    "ts_rolling_active_users",
    oracle=f"""{_EV_CTE},
du AS (SELECT DISTINCT user_id, t // 86400000000 AS day FROM ev),
days AS (SELECT DISTINCT day FROM du),
contrib AS (SELECT du.user_id, du.day + g.x AS day
            FROM du, (SELECT unnest(range(0, 7)) AS x) g),
wau AS (SELECT c.day, count(DISTINCT c.user_id) AS wau
        FROM contrib c JOIN days d ON d.day = c.day
        GROUP BY c.day),
dau AS (SELECT day, count(*) AS dau FROM du GROUP BY day)
SELECT dau.day * 86400000000 AS day_us,
       CAST(dau.dau AS BIGINT) AS dau, CAST(wau.wau AS BIGINT) AS wau
FROM dau JOIN wau ON wau.day = dau.day
""",
    tags=("timeseries", "analytics"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_rolling_active_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT rolling engagement counts — per active day, the distinct
    users active that day (DAU) and within the trailing 7 days (WAU)
    — the product-metric pair :func:`queries_sketch.sketch_hll_daily_
    users` answers approximately with mergeable registers; this is
    the exact counterpart, and the standard contribution-explosion
    restatement of a sliding COUNT DISTINCT (a distinct user-day
    contributes to the 7 target days it can be seen from — a bounded
    7x fan-out on the ALREADY-DEDUPLICATED user-day table, never on
    raw events).

    Plan: one distinct over (user, day) — the only event-scale
    shuffle — then a 7x explode of that small relation, a semi-join
    onto observed days, and two hash aggregates.  At 100 TB the
    user-day relation is orders of magnitude below the event count,
    and the explode factor is the window length, not the data."""
    ev = _events(spark, sf_dir)
    du = (
        ev.select("user_id", F.expr("t div 86400000000").alias("day"))
        .distinct()
        .transform(pin)  # feeds dau, the day grid, and the explode
    )
    days = du.select("day").distinct()
    contrib = du.select(
        "user_id",
        F.explode(F.sequence(F.col("day"), F.col("day") + 6))
        .alias("day"),
    )
    wau = (
        contrib.join(days, "day")
        .groupBy("day").agg(F.countDistinct("user_id").alias("wau"))
    )
    dau = du.groupBy("day").agg(F.count("*").alias("dau"))
    return (
        dau.join(wau, "day")
        .select(
            (F.col("day") * 86400000000).cast("long").alias("day_us"),
            F.col("dau").cast("long").alias("dau"),
            F.col("wau").cast("long").alias("wau"),
        )
    )


# ------------------------------------ r9: rolling volatility (control chart)


@register(
    "ts_rolling_volatility",
    oracle=f"""{_EV_CTE},
x AS (SELECT event_id, user_id, t,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM ev)
SELECT event_id, user_id, t,
       CAST(count(*) OVER w AS BIGINT) AS n_win,
       CAST(sum(v) OVER w AS BIGINT) AS sum_centi,
       CAST(count(*) OVER w * sum(v * v) OVER w
            - sum(v) OVER w * sum(v) OVER w AS BIGINT) AS var_num
FROM x
WINDOW w AS (PARTITION BY user_id ORDER BY t
             RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_rolling_volatility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling volatility / control-chart statistic: per event, the
    trailing-hour window's count, sum, and the EXACT integer variance
    numerator ``n*sum(v^2) - sum(v)^2`` (= n^2 * population variance
    in centi-units^2) — the quantity control charts threshold on,
    emitted un-divided so no float ratio enters the hash (the same
    cross-multiplication device as :func:`ts_anomaly_zscore`, here
    over a sliding RANGE frame instead of the whole series).

    Same plan as :func:`ts_moving_window_sum`: one shuffle on the
    series key, the three window aggregates share one frame scan
    (Spark evaluates same-frame functions together).  Magnitudes:
    |v| <= 1e5 centi-units, so a million-event window stays under
    int64 via n*sumsq <= n^2 * max_v^2 — the fixtures and any
    realistic per-series hourly rate are far below the 9e18 line."""
    ev = _events(spark, sf_dir)
    x = ev.select(
        "event_id", "user_id", "t",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id").orderBy("t")
        .rangeBetween(-3_600_000_000, 0)
    )
    n = F.count("*").over(w)
    s = F.sum("v").over(w)
    ss = F.sum(F.col("v") * F.col("v")).over(w)
    return x.select(
        "event_id", "user_id", "t",
        n.cast("long").alias("n_win"),
        s.cast("long").alias("sum_centi"),
        (n * ss - s * s).cast("long").alias("var_num"),
    )


@register(
    "ts_interval_coalesce",
    oracle=f"""{_EV_CTE},
iv AS (
  SELECT user_id, t, event_id,
         t + (event_id % 300 + 60) * 1000000 AS e
  FROM ev),
marked AS (
  SELECT user_id, t, event_id, e,
         CASE WHEN max(e) OVER (PARTITION BY user_id ORDER BY t, event_id
                  ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) >= t
              THEN 0 ELSE 1 END AS is_start
  FROM iv),
isl AS (
  SELECT user_id, t, e,
         CAST(sum(is_start) OVER (PARTITION BY user_id
              ORDER BY t, event_id
              ROWS UNBOUNDED PRECEDING) AS BIGINT) AS island_no
  FROM marked)
SELECT user_id, island_no, count(*) AS n_intervals,
       min(t) AS start_us, max(e) AS end_us,
       max(e) - min(t) AS duration_us
FROM isl GROUP BY user_id, island_no
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_interval_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Merge overlapping intervals per series — the maintenance-
    window / downtime / alert-dedup coalescing op (the interval twin
    of :func:`ts_sessionize`: sessions split on a GAP RULE, coalesce
    unions on ACTUAL extents).  Each event opens an interval
    [t, t + dur] with an integer-derived duration (no float enters
    the arithmetic); an interval starts a new island iff its start
    exceeds the running maximum end of every earlier interval of the
    same series (the cumulative-max gaps-and-islands form, which is
    correct even when a long interval swallows later short ones —
    lag(end) alone is not).  Touching endpoints (start == max end)
    merge.

    Plan: one shuffle on user_id feeds both analytic windows
    (cumulative max over preceding rows, running sum island
    numbering) and the final (user, island) hash aggregate — the
    same single-exchange three-stage shape as sessionize; per-series
    state is one row in flight at 100 TB."""
    ev = _events(spark, sf_dir)
    iv = ev.select(
        "user_id", "t", "event_id",
        (F.col("t") + (F.col("event_id") % 300 + 60) * 1_000_000)
        .alias("e"),
    )
    w_prev = (
        Window.partitionBy("user_id").orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "is_start",
        F.when(F.max("e").over(w_prev) >= F.col("t"), 0).otherwise(1),
    )
    run = (
        Window.partitionBy("user_id").orderBy("t", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    isl = marked.withColumn(
        "island_no", F.sum("is_start").over(run).cast("long")
    )
    return isl.groupBy("user_id", "island_no").agg(
        F.count("*").alias("n_intervals"),
        F.min("t").alias("start_us"),
        F.max("e").alias("end_us"),
        (F.max("e") - F.min("t")).alias("duration_us"),
    )


# --------------------------- r9: EWMA smoothing (dyadic, exact integers)

_EWMA_DEPTH = 16  # alpha = 1/2 truncated at 16 lags; tail weight 2^-16


def _ewma_lag_sql() -> str:
    terms = " + ".join(
        f"COALESCE(lag(v, {j}) OVER w, 0) * {1 << (_EWMA_DEPTH - 1 - j)}"
        for j in range(_EWMA_DEPTH)
    )
    return terms


@register(
    "ts_ewma_smooth",
    oracle=f"""{_EV_CTE},
x AS (SELECT event_id, user_id, t,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM ev)
SELECT event_id, user_id, t, v,
       CAST({_ewma_lag_sql()} AS BIGINT) AS ewma_x65536
FROM x
WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id)
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially-weighted moving average per series — the classic
    smoother (monitoring dashboards, EWMA control charts), stated so
    the hash is EXACT: alpha = 1/2 makes every weight a dyadic
    rational, truncating at 16 lags makes the tail weight 2^-16
    (below one centi-unit for any |v| < 655 — the smoother users see
    is unchanged), and scaling by 2^16 makes the output an INTEGER:
    ``ewma_x65536 = sum_{{j=0..15}} v_{{i-j}} * 2^(15-j)`` — the
    recurrence ``s = (v + s_prev)/2`` unrolled, with missing lags at
    a series head contributing zero (truncated-window semantics, same
    on both engines).

    Plan: one shuffle on user_id; all 16 ``lag`` expressions share
    ONE Window operator (same partition/order spec), so the cost is
    one ordered pass with a 16-row ring buffer per series — O(1)
    state at 100 TB, no frame re-scan, no float ever enters."""
    ev = _events(spark, sf_dir)
    x = ev.select(
        "event_id", "user_id", "t",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )
    w = Window.partitionBy("user_id").orderBy("t", "event_id")
    ewma = None
    for j in range(_EWMA_DEPTH):
        term = (
            F.coalesce(F.lag("v", j).over(w), F.lit(0))
            * F.lit(1 << (_EWMA_DEPTH - 1 - j))
        )
        ewma = term if ewma is None else ewma + term
    return x.select(
        "event_id", "user_id", "t", "v",
        ewma.cast("long").alias("ewma_x65536"),
    )


# ------------------------------ r9: rolling median (exact, 2x-scaled)


@register(
    "ts_rolling_median",
    oracle=f"""{_EV_CTE},
x AS (SELECT event_id, user_id, t,
             CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT) AS v
      FROM ev),
fr AS (SELECT event_id, user_id, t,
              CAST(count(*) OVER w AS BIGINT) AS n_win,
              list_sort(list(v) OVER w) AS a
       FROM x
       WINDOW w AS (PARTITION BY user_id ORDER BY t, event_id
                    ROWS BETWEEN 6 PRECEDING AND CURRENT ROW))
SELECT event_id, user_id, t, n_win,
       CAST(a[CAST((n_win + 1) // 2 AS INT)]
            + a[CAST(n_win // 2 + 1 AS INT)] AS BIGINT) AS median2x
FROM fr
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_rolling_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling median over the trailing 7 observations per series —
    the robust smoother (median filters shrug off the spikes that
    drag an EWMA), exact by the 2x device: ``median2x = a[(n+1)//2]
    + a[n//2+1]`` over the sorted frame (1-based) is twice the
    median — both middle elements summed when the frame is even, the
    middle doubled when odd — so the interpolated ``.5`` never
    becomes a float in the hash.

    Plan: one shuffle on user_id; ``collect_list`` over a ROWS
    BETWEEN 6 PRECEDING frame keeps at most 7 values in flight per
    row, and the sort is O(K log K) with K=7 CONSTANT — per-row cost
    is fixed, per-series state is the 7-row frame, and nothing about
    the plan changes at 100 TB (contrast a percentile_approx sketch:
    this is exact because the frame is bounded by construction)."""
    ev = _events(spark, sf_dir)
    x = ev.select(
        "event_id", "user_id", "t",
        F.expr("CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)")
        .alias("v"),
    )
    w = (
        Window.partitionBy("user_id").orderBy("t", "event_id")
        .rowsBetween(-6, 0)
    )
    fr = x.select(
        "event_id", "user_id", "t",
        F.count("*").over(w).cast("long").alias("n_win"),
        F.sort_array(F.collect_list("v").over(w)).alias("a"),
    )
    mid1 = ((F.col("n_win") + 1) / 2).cast("int")
    mid2 = (F.col("n_win") / 2 + 1).cast("int")
    return fr.select(
        "event_id", "user_id", "t", "n_win",
        (F.element_at("a", mid1) + F.element_at("a", mid2))
        .cast("long").alias("median2x"),
    )


# ----------------------- late r9: period-over-period (WoW/DoD delta)


@register(
    "ts_period_over_period",
    oracle=f"""{_EV_CTE},
d AS (
  SELECT event_type, t // 86400000000 AS day, count(*) AS n,
         CAST(sum(CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT))
              AS BIGINT) AS sum_centi
  FROM ev GROUP BY 1, 2)
SELECT event_type, day * 86400000000 AS day_us,
       CAST(n AS BIGINT) AS n,
       sum_centi,
       CAST(n - lag(n) OVER w AS BIGINT) AS n_delta,
       CAST(CASE WHEN lag(day) OVER w = day - 1
                 THEN n - lag(n) OVER w END AS BIGINT) AS n_delta_dod
FROM d
WINDOW w AS (PARTITION BY event_type ORDER BY day)
""",
    tags=("timeseries", "window"),
    priority=900,  # demoted in r12 after r11 driver green, to rotate the r12 certificates + r4-evidence refreshes into the window (verified locally by tools/check_correctness.py)
)
def ts_period_over_period(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Period-over-period comparison — the dashboard staple: per
    (event_type, day), the count and exact centi-sum plus the delta
    against the PREVIOUS OBSERVED period (``n_delta``) and against
    the strictly-previous CALENDAR day (``n_delta_dod`` — NULL across
    gaps, so a metric that went dark for a day never fabricates a
    day-over-day move; the distinction between observed-lag and
    calendar-lag is exactly what naive lag() dashboards get wrong).
    All-integer arithmetic.

    Plan: one hash aggregate to the (type, day) grid — the ONLY
    event-scale work — then a lag window over the tiny grid relation
    (|types| x |days| rows at any corpus size)."""
    ev = _events(spark, sf_dir)
    d = (
        ev.groupBy(
            "event_type",
            F.expr("t div 86400000000").alias("day"))
        .agg(
            F.count("*").alias("n"),
            F.sum(F.expr(
                "CAST(CAST(value AS DECIMAL(18,2)) * 100 AS BIGINT)"))
            .cast("long").alias("sum_centi"),
        )
    )
    w = Window.partitionBy("event_type").orderBy("day")
    lag_n = F.lag("n").over(w)
    lag_day = F.lag("day").over(w)
    return d.select(
        "event_type",
        (F.col("day") * 86400000000).cast("long").alias("day_us"),
        F.col("n").cast("long").alias("n"),
        "sum_centi",
        (F.col("n") - lag_n).cast("long").alias("n_delta"),
        F.when(lag_day == F.col("day") - 1, F.col("n") - lag_n)
        .cast("long").alias("n_delta_dod"),
    )
