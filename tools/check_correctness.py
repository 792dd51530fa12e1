"""Local mimic of the driver's correctness gate.

Runs every ``__spark_entry__.queries()`` entry on Spark and its
``oracle_sql()`` counterpart on DuckDB over the same parquet tables,
then compares row count, column names, and order-insensitive values.

Usage: python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb
import pandas as pd

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

TABLES = (
    "region nation customer supplier part orders lineitem events "
    "documents embeddings"
).split()


#: DuckDB result types that pandas renders as float64 (or object),
#: silently changing the hashed string the driver computes.  An oracle
#: must never type an output column this way — cast to BIGINT/DOUBLE
#: in the SQL instead (r7 driver catch: pack_sequences bin_id HUGEINT).
BAD_ORACLE_TYPES = ("HUGEINT", "UHUGEINT", "DECIMAL")


def oracle_type_errors(con, sql: str) -> list[str]:
    """Plan (don't run) an oracle and flag non-hashable column types."""
    rel = con.sql(sql)
    return [
        f"{name}:{t}"
        for name, t in zip(rel.columns, (str(x) for x in rel.types))
        if any(b in t.upper() for b in BAD_ORACLE_TYPES)
    ]


def normalize(df: pd.DataFrame) -> tuple[pd.DataFrame, dict[str, str]]:
    """Canonicalize a frame and classify each column's dtype KIND.

    The driver hashes typed values — ``3`` (int) and ``3.0`` (float)
    hash differently — so the local gate must preserve int-vs-float
    identity rather than widening everything to float64 (the r7 bug:
    the old normalize cast Int64→float64, certifying green two queries
    whose oracle typed bin_id HUGEINT→float64 while Spark said int64).
    Width differences (int32 vs int64, float32 vs float64) are still
    unified: both engines' pandas reprs agree on value strings there.
    Nullable-int columns CONTAINING nulls become float (that is how
    Spark's toPandas renders them, so the driver sees float on both
    sides); null-free nullable ints stay int.
    """
    df = df[sorted(df.columns)].copy()
    kinds: dict[str, str] = {}
    for c in df.columns:
        dt = str(df[c].dtype)
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
            kinds[c] = "obj"
        elif dt.startswith("bool"):
            kinds[c] = "bool"
        elif dt in ("Int64", "Int32", "Int16", "Int8",
                    "UInt64", "UInt32", "UInt16", "UInt8"):
            if df[c].isna().any():
                df[c] = df[c].astype("float64")
                kinds[c] = "float"
            else:
                df[c] = df[c].astype("int64")
                kinds[c] = "int"
        elif dt.startswith(("int", "uint")):
            df[c] = df[c].astype("int64")
            kinds[c] = "int"
        elif dt.startswith("float"):
            df[c] = df[c].astype("float64")
            kinds[c] = "float"
        elif dt.startswith("datetime"):
            kinds[c] = "datetime"
        else:
            kinds[c] = dt
    return df.sort_values(list(df.columns), ignore_index=True), kinds


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])

    import __spark_entry__ as e
    from rados_timestore_spark.session import get_spark

    spark = get_spark(shuffle_partitions=16)
    con = duckdb.connect()
    for t in TABLES:
        p = f"{sf_dir}/{t}.parquet"
        if os.path.exists(p):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")

    qs, oracles = e.queries(), e.oracle_sql()
    from rados_timestore_spark.registry import LOAD_ERRORS

    if LOAD_ERRORS:
        print("LOAD ERRORS:", LOAD_ERRORS)
    failures = 0
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            got = fn(spark, sf_dir).toPandas()
        except Exception as exc:
            print(f"FAIL {name}: spark raised {exc!r}"[:2000])
            failures += 1
            continue
        finally:
            # Queries persist() intermediates that multiple actions
            # reuse (sketch gx, pagerank edges, word_assoc dw ...);
            # clear per query so a full-registry run can't accumulate
            # cached blocks (ADVICE r5) — same hook bench.py and
            # scale_soak.py already use.
            spark.catalog.clearCache()
        dt = time.time() - t0
        sql = oracles.get(name)
        if sql is None:
            print(f"ok?  {name}: rows={len(got)} ({dt:.1f}s) [rows-only, no oracle]")
            if len(got) == 0 and "empty" not in name:
                print(f"WARN {name}: 0 rows without an oracle")
            continue
        try:
            bad = oracle_type_errors(con, sql)
            if bad:
                print(f"FAIL {name}: oracle output types non-hashable "
                      f"(cast in SQL): {bad}")
                failures += 1
                continue
            want = con.execute(sql).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb raised {exc!r}"[:2000])
            failures += 1
            continue
        (g, gk), (w, wk) = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
            failures += 1
            continue
        kind_diff = {c: (gk[c], wk[c]) for c in g.columns if gk[c] != wk[c]}
        if kind_diff:
            print(f"FAIL {name}: dtype-kind mismatch (driver hash would "
                  f"differ) spark-vs-oracle: {kind_diff}")
            failures += 1
            continue
        if len(g) != len(w):
            print(f"FAIL {name}: rows {len(g)} != {len(w)}")
            failures += 1
            continue
        try:
            pd.testing.assert_frame_equal(
                g, w, check_dtype=False, check_exact=True
            )
        except AssertionError as exc:
            print(f"FAIL {name}: values differ\n{str(exc)[:1500]}")
            print("spark head:\n", g.head(5))
            print("duck head:\n", w.head(5))
            failures += 1
            continue
        print(f"PASS {name}: rows={len(g)} ({dt:.1f}s)")
    print(f"\n{'ALL GREEN' if failures == 0 else f'{failures} FAILURES'} "
          f"({len(qs)} queries)")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
