#!/usr/bin/env python
"""Oracle-at-scale sample: DuckDB hash-match ON THE GROWN CORPUS
(VERDICT r9 ask #2).

The growth SMOKE (tools/growth_smoke.py) proves every query COMPLETES at
g=10/g=20; it cannot prove the answers are RIGHT there — r9's q160
int64 overflow happened to ABORT, but a silent-wrap or NULL-on-overflow
variant, or an AQE plan change that alters tie-breaking, would sail
through a completion check. This tool closes that gap for a rotating
sample: it runs the Spark query AND its DuckDB oracle on the SAME grown
parquet and compares with the EXACT canonicalization the sf0.01 driver
gate uses (columns sorted by name, floats rounded 6dp, rows sorted,
sha256 value hash — shared via tools/contract_common.py so the two
gates can never drift).

Default sample (the r10 rotation, ~20 queries):
- the decimal-moment family the r9 overflow came from (q160/q161/q162)
  plus the other big-moment reducers (q202 autocovariance, q225 norm
  audit);
- q199 (the one AQE join-strategy change r9 adjudicated: BHJ→SMJ at
  scale — the exact "plan change alters results?" scenario);
- q118 (runs under the new 1e9 recursion row budget);
- the top-8 by r9 quiet-window wall (q208/q218/q120/q198/q206/q209/
  q196/q221);
- the LSH family whose oracle CTEs gained the well-formed guard this
  round AND whose adaptive plane count differs at grown scale
  (q39/q246), plus q35 minhash-LSH and two more heavy text reducers
  (q194/q190).

Deliberately excluded: q38 — its Spark side routes to the approximate
bucketed path above EXACT_EMBED_MAX_ROWS while its oracle is exact
all-pairs by design; the routing is size-dependent, so at-scale
equality is not part of its contract (its correctness home is the
sf0.01 gate + the paths-agree property tests).

Usage::

    python tools/growth_oracle.py [--g 10] [--grown-dir DIR]
        [--queries q160,...] [--out GROWTH_ORACLE_r10.json]

Needs a verified grown corpus (tools/growth_bench.py --build-only
[--plant]). DuckDB handles the sf1-equivalent parquet directly; grown
tables are directories of part files, registered with parquet_scan
globs.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from contract_common import TABLES, canon_rows, value_hash  # noqa: E402

from fluvii_spark.queries import registry  # noqa: E402
from fluvii_spark.session import apply_runtime_confs, get_session  # noqa: E402

DEFAULT_SAMPLE = [
    # decimal-moment family (the r9 overflow class) + big-moment reducers
    "q160_degree_assortativity",
    "q161_char_gini_impurity",
    "q162_burstiness",
    "q202_revenue_acf",
    "q225_embedding_norm_audit",
    # the r9 AQE strategy change and the new recursion budget
    "q199_basket_lift",
    "q118_recursive_hierarchy",
    # top-8 by r9 quiet-window wall
    "q208_theil_sen_trend",
    "q218_char_ngram_jaccard",
    "q120_prefix_filter_pairs",
    "q198_triangle_count",
    "q206_ship_latency_quantiles",
    "q209_quality_calibration",
    "q196_decile_transitions",
    "q221_interorder_gaps",
    # LSH family: guarded oracle CTEs + scale-dependent adaptive planes
    "q39_ann_lsh_topk",
    "q246_mutual_nn_pairs",
    "q35_dedup_minhash_lsh",
    # heavy text reducers
    "q194_minhash_fidelity",
    "q190_bigram_logprob",
]


def duck_views_grown(grown: str):
    """DuckDB views over a grown corpus: each table is a DIRECTORY of
    part files (what a Spark write produces), so register a glob."""
    import duckdb

    con = duckdb.connect()
    for t in TABLES:
        p = os.path.join(grown, f"{t}.parquet")
        if os.path.isdir(p):
            con.execute(
                f"CREATE VIEW {t} AS "
                f"SELECT * FROM parquet_scan('{p}/*.parquet')"
            )
        else:
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{p}'")
    return con


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=10)
    ap.add_argument("--grown-dir", default=None)
    ap.add_argument("--queries", default=",".join(DEFAULT_SAMPLE))
    ap.add_argument(
        "--max-hash-rows",
        type=int,
        default=5_000_000,
        help="results beyond this row count skip the hash gate with a "
        "loud 'too_large_for_hash_gate' status instead of grinding both "
        "engines' results through a driver-side canonicalize+hash (q37 "
        "at g=20 emits 35M rows — pick the family's aggregated audit "
        "query, e.g. q239, for such families instead)",
    )
    ap.add_argument("--out", default="-")
    args = ap.parse_args()
    grown = args.grown_dir or f"/tmp/fluvii_growth_g{args.g}"
    marker = os.path.join(grown, "_FLUVII_GROWTH_OK")
    if not os.path.exists(marker):
        raise SystemExit(f"{grown}: no verified grown corpus")
    with open(marker) as fh:
        corpus_meta = json.load(fh)

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "growth-oracle", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    con = duck_views_grown(grown)

    reg = registry()
    names = [n for n in args.queries.split(",") if n]
    unknown = [n for n in names if n not in reg]
    if unknown:
        raise SystemExit(f"unknown queries: {unknown}")

    results, failures = {}, []
    for name in names:
        q = reg[name]
        if q.oracle is None:
            results[name] = {"status": "no_oracle"}
            continue
        row: dict = {}
        t0 = time.time()
        try:
            sdf = q.fn(spark, grown)
            s_cols = list(sdf.columns)
            s_rows = [tuple(r) for r in sdf.collect()]
            row["spark_sec"] = round(time.time() - t0, 2)
            if len(s_rows) > args.max_hash_rows:
                # not an engine failure: the hash gate itself is
                # driver-bound and was never meant for multi-10M-row
                # results — surface the mis-sampling instead of grinding
                row["status"] = "too_large_for_hash_gate"
                row["rows_spark"] = len(s_rows)
                results[name] = row
                print(
                    f"SKIP {name}: {len(s_rows)} rows exceeds "
                    f"--max-hash-rows={args.max_hash_rows}",
                    file=sys.stderr,
                )
                continue
        except Exception as e:  # noqa: BLE001 — record, keep sweeping
            row["error"] = f"spark: {type(e).__name__}: {str(e)[:300]}"
            results[name] = row
            failures.append(name)
            print(f"FAIL {name}: {row['error']}", file=sys.stderr)
            continue
        finally:
            # Session hygiene: broadcast/checkpoint blocks are freed by
            # the ContextCleaner only when the DRIVER GCs, and a 48g heap
            # rarely does — without this, blocks from one query's joins
            # squeeze the next query's execution memory (measured: q120
            # 29s solo → 180-330s later in the session; back to ~30s
            # with the ref-drop + GC kick). The DataFrame reference must
            # be dropped BEFORE the GC or its JVM plan (and broadcast
            # results) survive the collection. A real cluster doesn't
            # need this — executor pools there reach steady state — it's
            # single-JVM audit-session plumbing, not engine code.
            sdf = None  # noqa: F841 — drop the py4j ref so the JVM plan dies
            try:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
            except Exception:  # noqa: BLE001 — Connect sessions: no _jvm
                pass
        t1 = time.time()
        try:
            cur = con.execute(q.oracle)
            d_cols = [d[0] for d in cur.description]
            d_rows = [tuple(r) for r in cur.fetchall()]
            row["duck_sec"] = round(time.time() - t1, 2)
        except Exception as e:  # noqa: BLE001
            row["error"] = f"duck: {type(e).__name__}: {str(e)[:300]}"
            results[name] = row
            failures.append(name)
            print(f"FAIL {name}: {row['error']}", file=sys.stderr)
            continue
        sh, dh = value_hash(s_cols, s_rows), value_hash(d_cols, d_rows)
        row.update(
            {
                "rows_spark": len(s_rows),
                "rows_duck": len(d_rows),
                "rows_match": len(s_rows) == len(d_rows),
                "schema_match": sorted(s_cols) == sorted(d_cols),
                "hash_match": sh == dh,
            }
        )
        ok = row["rows_match"] and row["schema_match"] and row["hash_match"]
        if not ok:
            failures.append(name)
            if row["schema_match"] and row["rows_match"]:
                cs, cd = canon_rows(s_cols, s_rows), canon_rows(d_cols, d_rows)
                for i, (a, b) in enumerate(zip(cs, cd)):
                    if a != b:
                        row["first_diff"] = {
                            "row": i,
                            "spark": repr(a)[:300],
                            "duck": repr(b)[:300],
                        }
                        break
        print(
            f"{'OK  ' if ok else 'FAIL'} {name}: rows="
            f"{row['rows_spark']}/{row['rows_duck']} hash="
            f"{'=' if row['hash_match'] else '!='} "
            f"(spark {row['spark_sec']}s duck {row['duck_sec']}s)",
            file=sys.stderr,
        )
        results[name] = row

    payload = json.dumps(
        {
            "metric": "growth_oracle",
            "g": args.g,
            "grown_sf_dir": grown,
            "corpus": corpus_meta,
            "n_queries": len(results),
            "n_failures": len(failures),
            "failures": failures,
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
    sys.exit(1 if failures else 0)


if __name__ == "__main__":
    main()
