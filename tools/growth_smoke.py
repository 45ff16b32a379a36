#!/usr/bin/env python
"""Full-inventory completion smoke on the TRUE-growth corpus.

The growth LADDER (tools/growth_bench.py) measures exponents for the
heavy tail; this tool answers a different question for EVERY query:
does it COMPLETE on a g× corpus at all? r9's ladder extension caught
q160 aborting with an int64 ARITHMETIC_OVERFLOW that only manifests
beyond the oracle scales — this sweep closes that class inventory-wide:
one pass per query on the grown corpus, recording wall, row count, and
any error. No oracle (duck at grown scale is a different artifact);
the CORRECTNESS gate stays at sf0.001/sf0.01.

Usage::

    python tools/growth_smoke.py [--g 10] [--out GROWTH_SMOKE_r9.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluvii_spark.queries import registry  # noqa: E402
from fluvii_spark.session import apply_runtime_confs, get_session  # noqa: E402

# Non-NULL pins (ADVICE r9 #4): the decimal-moment queries compute
# decimal(38,0)×decimal(38,0) final products; under Spark's default
# non-ANSI decimal handling an overflow beyond 1e38 yields silent NULL
# (DuckDB's HUGEINT would raise instead) — an asymmetric failure the
# completion smoke would otherwise wave through. The documented moment
# bound is ≪1e38, so ANY NULL in these columns on a grown corpus is a
# regression; the smoke fails the query rather than recording rows>0.
NONNULL_PINS: dict[str, list[str]] = {
    "q160_degree_assortativity": ["assortativity"],
    "q161_char_gini_impurity": ["gini_impurity"],
    "q162_burstiness": ["burstiness"],
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=10)
    ap.add_argument("--grown-dir", default=None)
    ap.add_argument("--out", default="-")
    args = ap.parse_args()
    grown = args.grown_dir or f"/tmp/fluvii_growth_g{args.g}"
    if not os.path.exists(os.path.join(grown, "_FLUVII_GROWTH_OK")):
        raise SystemExit(f"{grown}: no verified grown corpus")

    # a g=20 corpus in ONE local JVM needs more heap than the 8g default:
    # 32 concurrent tasks × the hot-partition state of the duplication-
    # saturated candidate joins OOMed q239 at 8g (and took the JVM with
    # it, cascading 79 spurious failures). A real cluster gives each
    # executor its own multi-GB heap; locally we emulate that by sizing
    # the single JVM to the box. Respect an explicit override.
    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "growth-smoke", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    results, failures = {}, []
    for name, q in registry().items():
        t0 = time.time()
        try:
            rows = q.fn(spark, grown).collect()
            n = len(rows)
            for col in NONNULL_PINS.get(name, ()):
                nulls = sum(1 for r in rows if r[col] is None)
                if nulls:
                    raise AssertionError(
                        f"{col}: {nulls}/{n} NULL at growth scale — "
                        "silent decimal overflow class (ADVICE r9 #4)"
                    )
            results[name] = {"rows": n, "wall_sec": round(time.time() - t0, 2)}
        except Exception as e:  # noqa: BLE001 — the whole point is to record
            msg = str(e).split("\n")[0][:300]
            results[name] = {
                "rows": None,
                "wall_sec": round(time.time() - t0, 2),
                "error": f"{type(e).__name__}: {msg}",
            }
            failures.append(name)
            print(f"FAIL {name}: {type(e).__name__}: {msg}", file=sys.stderr)
    payload = json.dumps(
        {
            "metric": "growth_smoke",
            "g": args.g,
            "grown_sf_dir": grown,
            "n_queries": len(results),
            "n_failures": len(failures),
            "failures": failures,
            "total_wall_sec": round(
                sum(r["wall_sec"] for r in results.values()), 1
            ),
            "queries": results,
        },
        indent=2,
        sort_keys=True,
    )
    if args.out == "-":
        print(payload)
    else:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
        print(
            f"wrote {args.out}: {len(results)} queries, "
            f"{len(failures)} failures: {failures}"
        )
    spark.stop()


if __name__ == "__main__":
    main()
