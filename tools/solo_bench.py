#!/usr/bin/env python
"""Solo per-query measurement for the optimization rounds (guide §1).

Runs each named query SERIALLY (no pool contention) against
``$SPARK_GRAFT_SF_DIR`` (default sf0.1) with the noop sink, best-of-N,
and optionally dumps ``explain("formatted")`` to a plans directory.

Usage::

    python tools/solo_bench.py q208_theil_sen_trend,q198_triangle_count \
        [--passes 2] [--plans plans/r11] [--suffix before] [--out out.json]

Per-query output: best wall seconds + the formatted plan file
``<plans>/<query>_<suffix>.txt``.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402

from fluvii_spark.queries import registry  # noqa: E402
from fluvii_spark.session import get_session  # noqa: E402


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated query names, or 'topN:<k>'")
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--plans", default=None, help="dir for explain dumps")
    ap.add_argument("--suffix", default="before")
    ap.add_argument("--out", default=None)
    ap.add_argument(
        "--explain-only",
        action="store_true",
        help="skip timing; just dump formatted plans",
    )
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    spark = get_session("fluvii-spark-solo-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry()
    names = [n for n in args.names.split(",") if n]
    unknown = [n for n in names if n not in qs]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    # warm-up: JVM, file index, Arrow worker daemons (same as bench.py)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(args.sf_dir, "lineitem.parquet")).limit(1).collect()
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).select(_warm("id")).collect()

    if args.plans:
        os.makedirs(args.plans, exist_ok=True)

    results: dict[str, float] = {}
    for name in names:
        spark.sparkContext.setJobDescription(f"solo:{name}")
        best = None
        for _ in range(0 if args.explain_only else max(1, args.passes)):
            t0 = time.perf_counter()
            df = qs[name].fn(spark, args.sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t = time.perf_counter() - t0
            best = t if best is None else min(best, t)
        if best is not None:
            results[name] = round(best, 3)
            print(f"{name}: {best:.3f}s", flush=True)
        if args.plans:
            df = qs[name].fn(spark, args.sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
            with open(
                os.path.join(args.plans, f"{name}_{args.suffix}.txt"), "w"
            ) as fh:
                fh.write(plan)
        spark.sparkContext.setJobDescription(None)

    out = {"sf_dir": args.sf_dir, "passes": args.passes, "queries": results}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as fh:
            fh.write(line + "\n")


if __name__ == "__main__":
    main()
