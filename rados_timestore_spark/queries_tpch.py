"""Relational coverage queries (TPC-H-flavored) over the driver's star
schema — joins, aggregates, windows, top-k: the operator classes the
reference lacks entirely (SURVEY.md §2.3) re-expressed Spark-first.

Scale design notes (100 TB):

* every aggregate is a hash aggregate with map-side partial
  aggregation (groupBy/agg on built-in functions — no UDFs, whole
  plan stays in WholeStageCodegen);
* join strategy is size-derived: only relations bounded by
  construction (region/nation — fixed cardinality — and 1-row/k-row
  aggregate results) carry an explicit ``F.broadcast`` hint.
  Customer, orders, part and supplier all scale with SF (multi-TB at
  the 100 TB design point), so their joins carry NO hint — AQE plus
  the session's 64 MB ``autoBroadcastJoinThreshold`` pick broadcast
  when the measured side fits and shuffle-hash/sort-merge when it
  doesn't.  (r5 VERDICT: a forced ``F.broadcast`` bypasses the size
  check entirely and OOMs at scale — the hint is a promise, not an
  optimization.)
* money arithmetic runs entirely in DECIMAL (the columns hold exact
  2-decimal values) and only the final sum casts to double:
  order-independent and bit-identical to the DuckDB oracle;
* top-k is ``orderBy().limit(k)`` — Spark's TakeOrderedAndProject
  keeps a k-row heap per partition, never a full global sort.

Dates: lineitem/orders store TIMESTAMP(MICROS) (read as
TIMESTAMP_NTZ); ``ts_us`` converts to epoch µs in a UTC-pinned
session, matching DuckDB's ``epoch_us``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rados_timestore_spark.queries_common import load, ts_lit, ts_us
from rados_timestore_spark.registry import register

#: 1998-09-01 (classic Q1 cutoff region) in µs since epoch.
_Q1_CUTOFF = 904_608_000_000_000
#: 1996-03-15 for the Q3-style segment query.
_Q3_DATE = 826_848_000_000_000
#: [1996-01-01, 1997-01-01) for the Q5-style regional revenue.
_Q5_LO = 820_454_400_000_000
_Q5_HI = 852_076_800_000_000


def _revenue_sum():
    """SUM(extendedprice * (1 - discount)) computed entirely in DECIMAL
    (money columns are exact 2-decimal values) — identical bits
    cross-engine regardless of accumulation order."""
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = ext * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    return F.sum(disc).cast("double")


@register(
    "tpch_q1_pricing_summary",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS sum_disc_price,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
              * (1 - CAST(l_discount AS DECIMAL(4,2)))
              * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
       count(*) AS count_order
FROM lineitem
WHERE epoch_us(l_shipdate) <= {_Q1_CUTOFF}
GROUP BY l_returnflag, l_linestatus
""",
    tags=("agg",),
    bench=True,
)
def tpch_q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1: full-scan hash aggregate over lineitem.  One shuffle of 6
    grouped rows after map-side combine — the canonical 'aggregation
    pushes to the data' plan.

    Money columns hold exact 2-decimal values, so every product is
    computed in DECIMAL (no double rounding anywhere) — bit-identical
    across engines and accumulation orders.
    """
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(F.col("l_shipdate") <= ts_lit(_Q1_CUTOFF))
    ext = F.col("l_extendedprice").cast("decimal(12,2)")
    disc = ext * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)"))
    charge = disc * (F.lit(1) + F.col("l_tax").cast("decimal(4,2)"))
    return f.groupBy("l_returnflag", "l_linestatus").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).cast("double")
            .alias("sum_qty"),
        F.sum(ext).cast("double").alias("sum_base_price"),
        F.sum(disc).cast("double").alias("sum_disc_price"),
        F.sum(charge).cast("double").alias("sum_charge"),
        F.count("*").alias("count_order"),
    )


@register(
    "tpch_q3_shipping_priority",
    oracle=f"""
SELECT l_orderkey,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       epoch_us(o_orderdate) AS o_orderdate_us
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND epoch_us(o_orderdate) < {_Q3_DATE}
  AND epoch_us(l_shipdate) > {_Q3_DATE}
GROUP BY l_orderkey, epoch_us(o_orderdate)
ORDER BY revenue DESC, l_orderkey
LIMIT 10
""",
    tags=("join", "topk"),
    bench=True,
)
def tpch_q3_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3: selective date/segment filters pushed to both scans; join
    strategy is size-derived — orders and customer scale with SF, so no
    broadcast hint (AQE + the 64 MB autoBroadcastJoinThreshold pick
    broadcast at small SF and shuffle-hash at the 100 TB design point);
    top-10 via TakeOrderedAndProject (k-row heaps, no global sort)."""
    cust = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < ts_lit(_Q3_DATE)
    ).withColumn("o_orderdate_us", ts_us("o_orderdate"))
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > ts_lit(_Q3_DATE)
    )
    j = (
        li.join(
            orders.join(cust, orders.o_custkey == cust.c_custkey),
            li.l_orderkey == orders.o_orderkey,
        )
    )
    agg = j.groupBy("l_orderkey", "o_orderdate_us").agg(
        _revenue_sum().alias("revenue")
    )
    return agg.select("l_orderkey", "revenue", "o_orderdate_us").orderBy(
        F.desc("revenue"), "l_orderkey"
    ).limit(10)


@register(
    "tpch_q5_local_supplier_volume",
    oracle=f"""
SELECT n_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN supplier ON l_suppkey = s_suppkey
                           AND c_nationkey = s_nationkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND epoch_us(o_orderdate) >= {_Q5_LO}
  AND epoch_us(o_orderdate) < {_Q5_HI}
GROUP BY n_name
""",
    tags=("join",),
    bench=True,
)
def tpch_q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q5: five-way join.  Only the bounded-by-construction relations
    (region, nation and their composites) carry a broadcast hint;
    supplier/customer/orders scale with SF, so their join strategy is
    left to AQE + the 64 MB autoBroadcastJoinThreshold — broadcast at
    small SF, shuffle at the 100 TB design point."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit(_Q5_LO))
        & (F.col("o_orderdate") < ts_lit(_Q5_HI))
    ).withColumn("o_orderdate_us", ts_us("o_orderdate"))
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")

    nr = nation.join(F.broadcast(region),
                     nation.n_regionkey == region.r_regionkey)
    sn = supp.join(F.broadcast(nr), supp.s_nationkey == nr.n_nationkey)
    co = orders.join(cust, orders.o_custkey == cust.c_custkey)
    j = (
        li.join(sn, li.l_suppkey == sn.s_suppkey)
        .join(co,
              (li.l_orderkey == co.o_orderkey)
              & (co.c_nationkey == sn.s_nationkey))
    )
    return j.groupBy("n_name").agg(
        _revenue_sum().alias("revenue")
    )


@register(
    "tpch_q10_returned_items",
    oracle="""
SELECT c_custkey, c_name,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) *
            (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       n_name
FROM customer JOIN orders ON c_custkey = o_custkey
              JOIN lineitem ON l_orderkey = o_orderkey
              JOIN nation ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
GROUP BY c_custkey, c_name, n_name
ORDER BY revenue DESC, c_custkey
LIMIT 20
""",
    tags=("join", "topk"),
    priority=900,  # demoted in r8 after r7 driver green, to rotate the r7 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def tpch_q10_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q10: revenue lost to returns per customer, top-20."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    nation = load(spark, sf_dir, "nation")
    j = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
    )
    agg = j.groupBy("c_custkey", "c_name", "n_name").agg(
        _revenue_sum().alias("revenue")
    )
    return agg.select("c_custkey", "c_name", "revenue", "n_name").orderBy(
        F.desc("revenue"), "c_custkey"
    ).limit(20)


@register(
    "tpch_window_top_orders_per_customer",
    oracle="""
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY o_custkey
             ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk <= 2
""",
    tags=("window",),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_window_top_orders_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Window coverage: top-2 orders per customer by price (rank
    window with deterministic tiebreak)."""
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.col("o_orderkey")
    )
    return (
        orders.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 2)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


@register(
    "tpch_agg_distinct_priority",
    oracle="""
SELECT o_orderpriority, count(*) AS n,
       count(DISTINCT o_custkey) AS n_customers,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(14,2))) AS DOUBLE) AS total
FROM orders GROUP BY o_orderpriority
""",
    tags=("agg",),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_agg_distinct_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """count(DISTINCT) coverage (expand + two-phase aggregate)."""
    orders = load(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count("*").alias("n"),
        F.countDistinct("o_custkey").alias("n_customers"),
        F.sum(F.col("o_totalprice").cast("decimal(14,2)")).cast("double").alias("total"),
    )


@register(
    "tpch_semijoin_open_orders",
    oracle="""
SELECT c_custkey, c_name FROM customer
WHERE c_custkey IN (SELECT o_custkey FROM orders WHERE o_orderstatus = 'O')
  AND c_acctbal > 9000
""",
    tags=("join",),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_semijoin_open_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-join coverage (IN-subquery -> left_semi)."""
    cust = load(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 9000)
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderstatus") == "O"
    )
    return cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_semi"
    ).select("c_custkey", "c_name")


@register(
    "tpch_antijoin_silent_customers",
    oracle="""
SELECT count(*) AS n_silent FROM customer
WHERE c_custkey NOT IN (SELECT o_custkey FROM orders)
""",
    tags=("join",),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_antijoin_silent_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-join coverage: customers with no orders."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    silent = cust.join(
        orders, cust.c_custkey == orders.o_custkey, "left_anti"
    )
    return silent.agg(F.count("*").alias("n_silent"))


@register(
    "tpch_q6_forecast_revenue",
    oracle=f"""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem
WHERE epoch_us(l_shipdate) >= {_Q5_LO} AND epoch_us(l_shipdate) < {_Q5_HI}
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
""",
    tags=("agg",),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_q6_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q6: pure filter + global aggregate — every predicate pushes to
    the scan, the aggregate is a single map-side-combined row."""
    li = load(spark, sf_dir, "lineitem")
    f = li.filter(
        (F.col("l_shipdate") >= ts_lit(_Q5_LO))
        & (F.col("l_shipdate") < ts_lit(_Q5_HI))
        & F.col("l_discount").between(0.05, 0.07)
        & (F.col("l_quantity") < 24)
    )
    return f.agg(
        F.sum(
            F.col("l_extendedprice").cast("decimal(12,2)")
            * F.col("l_discount").cast("decimal(4,2)")
        ).cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )


@register(
    "tpch_q4_order_priority",
    oracle=f"""
SELECT o_orderpriority, count(*) AS order_count
FROM orders
WHERE epoch_us(o_orderdate) >= {_Q5_LO} AND epoch_us(o_orderdate) < {_Q5_HI}
  AND EXISTS (SELECT 1 FROM lineitem WHERE l_orderkey = o_orderkey
              AND l_shipdate > o_orderdate)
GROUP BY o_orderpriority
""",
    tags=("join", "agg"),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q4: EXISTS correlated subquery -> left-semi join against a
    filtered lineitem projection."""
    orders = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= ts_lit(_Q5_LO))
        & (F.col("o_orderdate") < ts_lit(_Q5_HI))
    )
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_shipdate")
    semi = orders.join(
        li,
        (orders.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > orders.o_orderdate),
        "left_semi",
    )
    return semi.groupBy("o_orderpriority").agg(
        F.count("*").alias("order_count")
    )


@register(
    "tpch_q18_large_orders",
    oracle="""
SELECT o_orderkey, o_custkey,
       CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS total_qty
FROM orders JOIN lineitem ON o_orderkey = l_orderkey
GROUP BY o_orderkey, o_custkey
HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 250
ORDER BY total_qty DESC, o_orderkey
LIMIT 20
""",
    tags=("join", "agg", "topk"),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q18: join + group + HAVING on an aggregate + top-k."""
    orders = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_quantity")
    j = li.join(orders, li.l_orderkey == orders.o_orderkey)
    agg = j.groupBy("o_orderkey", "o_custkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)")).alias("__q")
    )
    return (
        agg.filter(F.col("__q") > 250)
        .select("o_orderkey", "o_custkey",
                F.col("__q").cast("double").alias("total_qty"))
        .orderBy(F.desc("total_qty"), "o_orderkey")
        .limit(20)
    )


@register(
    "tpch_rollup_revenue",
    oracle="""
SELECT COALESCE(l_returnflag, 'ALL') AS returnflag,
       COALESCE(l_linestatus, 'ALL') AS linestatus,
       CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE)
         AS revenue,
       count(*) AS n
FROM lineitem
GROUP BY ROLLUP (l_returnflag, l_linestatus)
""",
    tags=("agg",),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets: per (flag, status), per flag, and grand
    total in ONE pass (Expand + hash aggregate) — no query union."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(
            F.sum(F.col("l_extendedprice").cast("decimal(12,2)"))
                .cast("double").alias("revenue"),
            F.count("*").alias("n"),
        )
        .select(
            F.coalesce(F.col("l_returnflag"), F.lit("ALL"))
                .alias("returnflag"),
            F.coalesce(F.col("l_linestatus"), F.lit("ALL"))
                .alias("linestatus"),
            "revenue", "n",
        )
    )


@register(
    "tpch_q14_promo_effect",
    oracle="""
SELECT CAST(100.00 * SUM(CASE WHEN p_type LIKE 'PROMO%'
            THEN CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) ELSE 0 END)
          / SUM(CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
         AS promo_revenue_pct,
       count(*) AS n
FROM lineitem JOIN part ON l_partkey = p_partkey
""",
    tags=("join", "agg"),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_q14_promo_effect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q14: conditional aggregate ratio over a part join (part scales
    with SF, so join strategy is AQE-derived, not a forced broadcast).
    Numerator/denominator both exact decimals; the single final
    division is the only float op so the quotient is bit-identical."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(part, li.l_partkey == part.p_partkey)
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    promo = F.when(F.col("p_type").like("PROMO%"), rev).otherwise(F.lit(0))
    return j.agg(
        (F.lit(100.00) * F.sum(promo) / F.sum(rev)).cast("double")
            .alias("promo_revenue_pct"),
        F.count("*").alias("n"),
    )


@register(
    "tpch_q19_disjunctive_predicates",
    oracle="""
SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
       count(*) AS n
FROM lineitem JOIN part ON p_partkey = l_partkey
WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
       AND l_quantity BETWEEN 1 AND 21)
   OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 30
       AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#34' AND p_size BETWEEN 1 AND 45
       AND l_quantity BETWEEN 20 AND 40)
""",
    tags=("join", "agg"),
    priority=70,  # evidence refresh r14: oldest driver evidence (R14_REFRESH_PLAN oldest-first rotation, VERDICT r13 #1)
)
def tpch_q19_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q19: OR-of-ANDs predicate spanning both join sides — Catalyst
    pushes the per-side conjuncts it can derive (CNF conversion) into
    each scan, the rest evaluates post-join."""
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part")
    j = li.join(part, part.p_partkey == li.l_partkey)
    cond = (
        ((F.col("p_brand") == "Brand#12") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 21))
        | ((F.col("p_brand") == "Brand#23") & F.col("p_size").between(1, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#34") & F.col("p_size").between(1, 45)
           & F.col("l_quantity").between(20, 40))
    )
    rev = (F.col("l_extendedprice").cast("decimal(12,2)")
           * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")))
    return j.filter(cond).agg(
        F.sum(rev).cast("double").alias("revenue"),
        F.count("*").alias("n"),
    )
