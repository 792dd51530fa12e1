"""TPC-H coverage, part 3 — partsupp-faithful q2/q11/q20 variants.

The driver's star schema has no ``partsupp`` table, so part 2 ships
ADAPTED q2/q11/q20 (lineitem-reconstructed supply — kept for fixture
parity).  These variants run the queries UN-adapted over a DERIVED
partsupp built deterministically from part x supplier (VERDICT r6
"Next round" #8): the official dbgen supplier-assignment formula
(4 suppliers per part, ``(p + i*(S/4 + p/S)) mod S`` — TPC-H spec
§4.2.3 / dbgen build.c, 0-based here to match the fixture keys) with
hash-derived attributes, so BOTH engines compute the identical table
from the same parquet inputs and no files are written.

Cross-engine determinism: ``ps_availqty`` and ``ps_cost_cents`` derive
from a 60-bit md5 integer (registry.py docstring idiom); supply cost
stays integer CENTS everywhere so no engine ever divides; quantity
sums go through DECIMAL.  The tiny-fixture dedup: at sf0.001 (S=10)
the assignment stride can wrap onto itself, so the pair set is
DISTINCT-ed — at dbgen's real scales (stride < S/4 guarantees 4
distinct suppliers) the DISTINCT is a no-op, and it keeps the PK
contract (partkey, suppkey) at every SF.

Scale notes: partsupp is 4x|part| rows built by an explode — no
shuffle until the consumer's join; the per-part/global aggregates
follow part 2's shapes (grouped min/sum computed once and joined
back, never per-row correlated); nation/region broadcast, everything
SF-proportional is AQE-sized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from rados_timestore_spark.queries_common import load
from rados_timestore_spark.registry import register

#: 60-bit md5 integer over the (partkey, suppkey) pair — Spark side.
_H = ("cast(conv(substr(md5(concat('ps-', cast(ps_partkey as string), "
      "'-', cast(ps_suppkey as string))), 1, 15), 16, 10) as bigint)")

#: The same partsupp, as a DuckDB CTE (string-identical md5 input).
_PARTSUPP_CTE = """
partsupp AS (
  SELECT ps_partkey, ps_suppkey,
         1 + (h % 9999) AS ps_availqty,
         100 + ((h // 9999) % 99901) AS ps_cost_cents
  FROM (
    SELECT ps_partkey, ps_suppkey,
           ('0x' || substr(md5('ps-' || ps_partkey || '-' || ps_suppkey),
                           1, 15))::BIGINT AS h
    FROM (
      SELECT DISTINCT p_partkey AS ps_partkey,
             (p_partkey + i.i * ((s.cnt // 4) + (p_partkey // s.cnt)))
               % s.cnt AS ps_suppkey
      FROM part,
           (SELECT count(*) AS cnt FROM supplier) s,
           (VALUES (0), (1), (2), (3)) AS i(i)
    )
  )
)
"""


def _partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Derived partsupp (module doc).  The supplier count is the one
    driver-side scalar (a bounded count, the k-means-centroid rule);
    the oracle recomputes it as a subquery — same value, same rows."""
    s_cnt = load(spark, sf_dir, "supplier").count()
    stride = s_cnt // 4
    pairs = (
        load(spark, sf_dir, "part")
        .select(F.col("p_partkey").alias("ps_partkey"))
        .select(
            "ps_partkey",
            F.explode(F.array(*[F.lit(i) for i in range(4)])).alias("i"),
        )
        .select(
            "ps_partkey",
            F.expr(
                f"(ps_partkey + i * ({stride} + ps_partkey div {s_cnt}))"
                f" % {s_cnt}"
            ).alias("ps_suppkey"),
        )
        .distinct()
    )
    return pairs.select(
        "ps_partkey", "ps_suppkey",
        F.expr(f"1 + ({_H} % 9999)").alias("ps_availqty"),
        F.expr(f"100 + (({_H} div 9999) % 99901)").alias("ps_cost_cents"),
    )


@register(
    "tpch_q2_partsupp",
    oracle=f"""
WITH {_PARTSUPP_CTE},
eu AS (
  SELECT s_suppkey, s_name, s_acctbal, n_name
  FROM supplier JOIN nation ON s_nationkey = n_nationkey
                JOIN region ON n_regionkey = r_regionkey
  WHERE r_name = 'EUROPE'
),
cand AS (
  SELECT p_partkey, s_suppkey, s_name, s_acctbal, n_name, ps_cost_cents
  FROM part JOIN partsupp ON p_partkey = ps_partkey
            JOIN eu ON ps_suppkey = s_suppkey
  WHERE p_size = 2
),
mn AS (SELECT p_partkey AS mk, MIN(ps_cost_cents) AS mc
       FROM cand GROUP BY 1)
SELECT s_acctbal, s_name, n_name, p_partkey, ps_cost_cents
FROM cand JOIN mn ON p_partkey = mk AND ps_cost_cents = mc
ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
LIMIT 20
""",
    tags=("join", "agg", "topk"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def tpch_q2_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2 UN-adapted over the derived partsupp: region-filtered
    min-cost supplier per part, correlated MIN decorrelated into one
    grouped aggregate joined back (the same plan the adapted variant
    proves), deterministic top-20 on a unique sort key."""
    ps = _partsupp(spark, sf_dir)
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    part = load(spark, sf_dir, "part").filter(F.col("p_size") == 2)
    eu = (
        supp.join(F.broadcast(nation),
                  supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region),
              nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    cand = (
        ps.join(part, ps.ps_partkey == part.p_partkey)
        .join(eu, ps.ps_suppkey == F.col("s_suppkey"))
        .select("p_partkey", "s_name", "s_acctbal", "n_name",
                "ps_cost_cents")
    )
    mn = cand.groupBy(F.col("p_partkey").alias("mk")).agg(
        F.min("ps_cost_cents").alias("mc")
    )
    return (
        cand.join(mn, (cand.p_partkey == mn.mk)
                  & (cand.ps_cost_cents == mn.mc))
        .select("s_acctbal", "s_name", "n_name", "p_partkey",
                "ps_cost_cents")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(20)
    )


@register(
    "tpch_q11_partsupp",
    oracle=f"""
WITH {_PARTSUPP_CTE},
nat AS (
  SELECT ps_partkey, ps_cost_cents * ps_availqty AS v
  FROM partsupp JOIN supplier ON ps_suppkey = s_suppkey
  WHERE s_nationkey = 7
),
tot AS (SELECT CAST(SUM(v) AS BIGINT) AS total,
               count(DISTINCT ps_partkey) AS np FROM nat)
SELECT ps_partkey, CAST(SUM(v) AS BIGINT) AS part_value
FROM nat, tot
GROUP BY ps_partkey, total, np
HAVING CAST(SUM(v) AS BIGINT) * np > 2 * total
""",
    tags=("join", "agg"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def tpch_q11_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q11 UN-adapted over the derived partsupp: one nation's
    inventory value per part, HAVING above 2x the mean part value
    (mean-relative like the adapted variant — TPC-H's own 0.0001/SF
    fraction bakes the scale factor into the query text, which a
    fixed-text oracle can't; the mean form is its scale-invariant
    equivalent).  Pure integer cents x quantity — no division, no
    floats anywhere."""
    ps = _partsupp(spark, sf_dir)
    supp = load(spark, sf_dir, "supplier").filter(F.col("s_nationkey") == 7)
    nat = ps.join(supp, ps.ps_suppkey == supp.s_suppkey).select(
        "ps_partkey",
        (F.col("ps_cost_cents") * F.col("ps_availqty")).alias("v"),
    )
    tot = nat.agg(
        F.sum("v").cast("long").alias("total"),
        F.countDistinct("ps_partkey").alias("np"),
    )
    return (
        nat.groupBy("ps_partkey")
        .agg(F.sum("v").cast("long").alias("part_value"))
        .crossJoin(F.broadcast(tot))
        .filter(F.col("part_value") * F.col("np") > F.col("total") * 2)
        .select("ps_partkey", "part_value")
    )


@register(
    "tpch_q20_partsupp",
    oracle=f"""
WITH {_PARTSUPP_CTE},
ship AS (
  SELECT l_partkey, l_suppkey,
         CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DECIMAL(18,2))
           AS qty
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01'
    AND l_shipdate < TIMESTAMP '1997-01-01'
  GROUP BY 1, 2
),
excess AS (
  SELECT DISTINCT ps_suppkey
  FROM partsupp
  JOIN (SELECT p_partkey FROM part WHERE p_name LIKE 'small%') sp
    ON ps_partkey = p_partkey
  JOIN ship ON l_partkey = ps_partkey AND l_suppkey = ps_suppkey
  WHERE 2 * ps_availqty > qty
)
SELECT s_suppkey, s_name, n_name
FROM supplier JOIN excess ON s_suppkey = ps_suppkey
              JOIN nation ON s_nationkey = n_nationkey
              JOIN region ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
""",
    tags=("join", "agg", "semijoin"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def tpch_q20_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q20 UN-adapted — availqty vs half the year's shipped quantity,
    exactly the official correlated predicate (decorrelated into one
    (part, supp) aggregate; the no-shipment NULL exclusion is the
    inner join): suppliers of 'small%' parts whose availability
    exceeds 50% of what they shipped in 1996, restricted to ASIA.
    DECIMAL quantity sum; the compare is ``2*availqty > qty`` so no
    engine halves anything."""
    ps = _partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01")
        & (F.col("l_shipdate") < "1997-01-01")
    )
    ship = li.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.col("l_quantity").cast("decimal(12,2)"))
        .cast("decimal(18,2)").alias("qty")
    )
    small = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("small%")
    ).select("p_partkey")
    excess = (
        ps.join(small, ps.ps_partkey == F.col("p_partkey"))
        .join(ship, (ps.ps_partkey == ship.l_partkey)
              & (ps.ps_suppkey == ship.l_suppkey))
        .filter(2 * F.col("ps_availqty") > F.col("qty"))
        .select("ps_suppkey").distinct()
    )
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        supp.join(excess, supp.s_suppkey == F.col("ps_suppkey"))
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .select("s_suppkey", "s_name", "n_name")
    )


@register(
    "tpch_q9_partsupp",
    oracle=f"""
WITH {_PARTSUPP_CTE}
SELECT n_name AS nation, year(o_orderdate) AS o_year,
       CAST(SUM(CAST(
         CAST(l_extendedprice AS DECIMAL(12,2))
           * (1 - CAST(l_discount AS DECIMAL(4,2))) * 100
         - ps_cost_cents * CAST(l_quantity AS DECIMAL(12,2))
       AS DECIMAL(28,4))) AS DOUBLE) AS profit_x100
FROM lineitem
  JOIN partsupp ON ps_partkey = l_partkey AND ps_suppkey = l_suppkey
  JOIN part     ON p_partkey = l_partkey
  JOIN supplier ON s_suppkey = l_suppkey
  JOIN orders   ON o_orderkey = l_orderkey
  JOIN nation   ON s_nationkey = n_nationkey
WHERE p_name LIKE '%red%'
GROUP BY n_name, year(o_orderdate)
""",
    tags=("join", "agg"),
    priority=900,  # demoted in r9 after r8 driver green, to rotate the r8 carve-out batch into the window (verified locally by tools/check_correctness.py)
)
def tpch_q9_partsupp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q9 with the supply-cost leg RESTORED via the derived partsupp:
    profit = revenue - ps_supplycost * quantity, exactly the official
    expression (the adapted tpch_q9_product_profit omits the cost
    term).  Everything stays exact: revenue is scaled x100 into cents
    so no engine ever divides, the sum is one DECIMAL(28,4) aggregate,
    and only the final value casts to double — the output is profit in
    CENTS (profit_x100), documented rather than rounded.  The fixture
    lineitem was not generated against the partsupp assignment, so the
    inner join keeps the lines whose (part, supplier) pair is a known
    supply relationship — the official query's semantics over this
    fixture's honest subset."""
    ps = _partsupp(spark, sf_dir)
    li = load(spark, sf_dir, "lineitem")
    part = load(spark, sf_dir, "part").filter(
        F.col("p_name").like("%red%"))
    supp = load(spark, sf_dir, "supplier")
    orders = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderdate")
    nation = load(spark, sf_dir, "nation")
    sn = supp.join(F.broadcast(nation),
                   supp.s_nationkey == nation.n_nationkey)
    j = (
        li.join(ps, (li.l_partkey == ps.ps_partkey)
                & (li.l_suppkey == ps.ps_suppkey))
        .join(part, li.l_partkey == part.p_partkey)
        .join(sn, li.l_suppkey == sn.s_suppkey)
        .join(orders, li.l_orderkey == orders.o_orderkey)
    )
    profit = (
        F.col("l_extendedprice").cast("decimal(12,2)")
        * (F.lit(1) - F.col("l_discount").cast("decimal(4,2)")) * 100
        - F.col("ps_cost_cents")
        * F.col("l_quantity").cast("decimal(12,2)")
    ).cast("decimal(28,4)")
    return j.groupBy(
        F.col("n_name").alias("nation"),
        F.year("o_orderdate").alias("o_year"),
    ).agg(F.sum(profit).cast("double").alias("profit_x100"))
