"""Capture ``explain("formatted")`` for bench-tagged registry queries.

Usage::

    python tools/capture_plans.py <suffix> [query ...]

Writes ``plans/<round>/<query>_<suffix>.txt`` (round from $PLANS_ROUND, default r15) for each selected query
(default: every bench-tagged query).  The plan is the registered
query's returned frame, captured WITHOUT executing its action — except
that query functions with eager side effects (streaming sinks, staged
stores) still run those on invocation, exactly as in the bench.
"""

from __future__ import annotations

import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    if len(sys.argv) < 2:
        sys.exit("usage: python tools/capture_plans.py <suffix> "
                 "[query ...]")
    suffix = sys.argv[1]
    only = set(sys.argv[2:])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(REPO, "plans", os.environ.get("PLANS_ROUND", "r15"))
    os.makedirs(out_dir, exist_ok=True)

    from rados_timestore_spark import registry
    from rados_timestore_spark.session import get_spark

    spark = get_spark(app_name="rados-timestore-plans")
    jvm = spark.sparkContext._jvm
    mode = jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
        "formatted")

    bench = registry.bench_queries()
    unknown = only - set(bench)
    if unknown:
        sys.exit(f"unknown bench queries: {sorted(unknown)} "
                 f"(known: {sorted(bench)})")
    for name, fn in bench.items():
        if only and name not in only:
            continue
        spark.catalog.clearCache()
        try:
            df = fn(spark, sf_dir)
            text = df._jdf.queryExecution().explainString(mode)
        except Exception as exc:  # noqa: BLE001
            text = f"ERROR capturing plan: {exc!r}"
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(text)
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
