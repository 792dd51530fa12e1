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


def normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == object:
            df[c] = df[c].map(
                lambda v: v.hex() if isinstance(v, (bytes, bytearray)) else v
            )
        # nullable int frames (pandas Int64) -> float64 comparability
        if str(df[c].dtype) in ("Int64", "Int32"):
            df[c] = df[c].astype("float64")
        if str(df[c].dtype).startswith("int"):
            df[c] = df[c].astype("int64")
        if str(df[c].dtype) == "float32":
            df[c] = df[c].astype("float64")
    return df.sort_values(list(df.columns), ignore_index=True)


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
            want = con.execute(sql).fetchdf()
        except Exception as exc:
            print(f"FAIL {name}: duckdb raised {exc!r}"[:2000])
            failures += 1
            continue
        g, w = normalize(got), normalize(want)
        if list(g.columns) != list(w.columns):
            print(f"FAIL {name}: columns {list(g.columns)} != {list(w.columns)}")
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
