#!/usr/bin/env python
"""Empirical scale-growth check (VERDICT r5 "Next round" #1): run the most
expensive inventory queries at sf0.1 AND at a K×-replicated sf0.1 corpus,
and report the per-query wall-growth exponent ``e = log(wall_K / wall_1) /
log(K)`` — the first end-to-end evidence behind the 100 TB plan-shape
arguments. e ≈ 1 is linear scaling; anything meaningfully above needs a
matching algorithmic bound (or is a bug).

Replication (the ``tests/test_scale_stress.py`` pattern, extended to every
table): each replica shifts every key column by ``i * domain_offset`` where
``domain_offset`` clears the domain's base max, so

- referential integrity holds per replica (o_custkey shifts with c_custkey,
  l_orderkey with o_orderkey, ...);
- replicas are DISJOINT in every key domain — group/join cardinality per
  key domain grows K×, per-key fan-in stays constant (the realistic "more
  data, same entity sizes" scale-up);
- VALUE columns (dates, brands, texts, embeddings) are unchanged: the
  calendar does not stretch (q208's O(days²) slope enumeration is constant
  by design), brand/lang group counts stay fixed with K× rows per group,
  and replicated texts form exact-dup clusters of size K (a harsher dedup
  candidate load than the base corpus).

Usage::

    python tools/stress_bench.py [--k 10] [--out STRESS_BENCH_r6.json]
        [--queries q198,q208] [--passes 2] [--build-only]

Env: SPARK_GRAFT_SF_DIR (base corpus, default /root/testdata/sf0.1),
SPARK_GRAFT_STRESS_DIR (replica dir, default /tmp/fluvii_stress_x{K}).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pandas as pd  # noqa: E402, F401  (pandas_udf type hints)
from pyspark.sql import functions as F  # noqa: E402

from fluvii_spark.io.readers import TABLES  # noqa: E402
from fluvii_spark.queries import registry  # noqa: E402
from fluvii_spark.session import apply_runtime_confs, get_session  # noqa: E402

# key column -> shift domain; every column of a domain shifts by the same
# per-replica offset so foreign keys stay consistent
KEY_DOMAINS: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "region"},
    "nation": {"n_nationkey": "nation", "n_regionkey": "region"},
    "customer": {"c_custkey": "customer", "c_nationkey": "nation"},
    "supplier": {"s_suppkey": "supplier", "s_nationkey": "nation"},
    "part": {"p_partkey": "part"},
    "orders": {"o_orderkey": "orders", "o_custkey": "customer"},
    "lineitem": {
        "l_orderkey": "orders",
        "l_partkey": "part",
        "l_suppkey": "supplier",
        # l_linenumber is per-order, unshifted
    },
    "events": {"event_id": "events", "user_id": "users"},
    "documents": {"doc_id": "docs"},
    "embeddings": {"vec_id": "docs"},  # probe ids (q116 vec_id=0) stay in replica 0
}

# The 20 most expensive queries by BENCH_LOCAL_r5.json plus q214 (postdates
# that artifact). Spans every heavy family: order statistics, graph,
# ppjoin, MinHash fidelity, recursion, BPE, k-NN, decorrelated TPC-H Q21.
DEFAULT_QUERIES = [
    "q208_theil_sen_trend",
    "q198_triangle_count",
    "q120_prefix_filter_pairs",
    "q194_minhash_fidelity",
    "q206_ship_latency_quantiles",
    "q171_bpe_merge_scan",
    "q118_recursive_hierarchy",
    "q146_knn_classify",
    "q190_bigram_logprob",
    "q107_semantic_rep_select",
    "q155_shingle_novelty",
    "q209_quality_calibration",
    "q196_decile_transitions",
    "q57_ann_ivf_topk",
    "q07_join_multi",
    "q11_join_broadcast",
    "q75_correlated_subquery",
    "q151_rfm_segments",
    "q187_bootstrap_ci",
    "q124_equi_depth_histogram",
    "q214_waiting_suppliers",
    "q218_char_ngram_jaccard",
    "q239_simhash_fp_audit",
]

# Queries whose documented algorithmic bound is superlinear in ROWS — none
# under this replication: q198's O(m^1.5) wedge bound applies within a
# component, and disjoint replicas grow components K× in COUNT not size, so
# expected growth is ~linear; q208's O(days²) enumeration is calendar-bound
# and constant. Recorded here so the report carries the argument.
EXPECTED_BOUNDS = {
    "q198_triangle_count": (
        "O(m^1.5) worst-case, but replicas are disjoint components: per-"
        "replica wedge work is constant, expect ~linear"
    ),
    "q208_theil_sen_trend": (
        "O(days²) pair enumeration is calendar-bound (unchanged by "
        "replication); only the daily rollup scan grows, expect ~linear "
        "in the scan with a large constant floor"
    ),
    "q218_char_ngram_jaccard": (
        "replicas are exact text duplicates, so every shingle's doc-freq "
        "multiplies by K and the FIXED df-cut (20) prunes almost all of "
        "them: candidate work SHRINKS while the shingle explode grows "
        "linearly — expect ≤linear"
    ),
    "q239_simhash_fp_audit": (
        "exact-dup replicas share identical simhashes, so half-key "
        "buckets grow K× and TRUE near-dup pairs grow K² — the flagged "
        "set itself is quadratic in the duplication factor "
        "(output-bound, not a plan defect); expect superlinear up to "
        "exponent 2 on THIS replication, linear on a distinct corpus"
    ),
}


def build_replicated(spark, base: str, out: str, k: int) -> None:
    marker = os.path.join(out, "_FLUVII_STRESS_OK")
    if os.path.exists(marker):
        # a pinned SPARK_GRAFT_STRESS_DIR can hold a PRIOR run's corpus:
        # reusing it with a different k (or base) would compute growth
        # exponents with the wrong log(K) denominator — validate, don't
        # trust (ADVICE r6)
        with open(marker) as fh:
            meta = json.load(fh)
        if meta.get("k") != k or meta.get("base") != base:
            raise SystemExit(
                f"stress corpus at {out} was built with k={meta.get('k')} "
                f"base={meta.get('base')!r} but this run wants k={k} "
                f"base={base!r} — remove the directory or point "
                "SPARK_GRAFT_STRESS_DIR elsewhere"
            )
        print(f"replica corpus exists (k={k} verified): {out}", file=sys.stderr)
        return
    os.makedirs(out, exist_ok=True)
    offsets: dict[str, int] = {}

    def offset_for(domain: str, df, col: str) -> int:
        if domain not in offsets:
            m = df.agg(F.max(col)).first()[0] or 0
            # clear the max with headroom; shared domains (docs) take the
            # larger of their members' maxima via max() below
            offsets[domain] = int(m) + 1
        else:
            m = df.agg(F.max(col)).first()[0] or 0
            offsets[domain] = max(offsets[domain], int(m) + 1)
        return offsets[domain]

    dfs = {}
    for t in TABLES:
        dfs[t] = spark.read.parquet(os.path.join(base, f"{t}.parquet"))
        for col, domain in KEY_DOMAINS.get(t, {}).items():
            offset_for(domain, dfs[t], col)

    for t in TABLES:
        df = dfs[t]
        shifted = []
        for i in range(k):
            rep = df
            for col, domain in KEY_DOMAINS.get(t, {}).items():
                rep = rep.withColumn(
                    col, (F.col(col) + F.lit(i * offsets[domain])).cast("bigint")
                )
            shifted.append(rep)
        big = shifted[0]
        for r in shifted[1:]:
            big = big.unionByName(r)
        big.write.mode("overwrite").parquet(os.path.join(out, f"{t}.parquet"))
        print(f"built {t} x{k}", file=sys.stderr)
    with open(marker, "w") as fh:
        fh.write(json.dumps({"k": k, "base": base, "offsets": offsets}))


def run_queries(spark, names: list[str], sf_dir: str, passes: int) -> dict:
    qs = registry()
    walls: dict[str, float] = {}
    for p in range(passes):
        for name in names:
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
            t0 = time.perf_counter()
            try:
                qs[name].fn(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                t = time.perf_counter() - t0
                if name not in walls or t < walls[name]:
                    walls[name] = t
            except Exception as e:  # noqa: BLE001
                print(f"STRESS ERROR {name}@{sf_dir}: {e}", file=sys.stderr)
                walls.setdefault(name, -1.0)
            print(
                f"  pass{p} {name} @{os.path.basename(sf_dir)}: "
                f"{walls[name]:.2f}s",
                file=sys.stderr,
            )
    return walls


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--out", default="STRESS_BENCH_r6.json")
    ap.add_argument("--queries", default=",".join(DEFAULT_QUERIES))
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--build-only", action="store_true")
    args = ap.parse_args()

    base = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    big_dir = os.environ.get(
        "SPARK_GRAFT_STRESS_DIR", f"/tmp/fluvii_stress_x{args.k}"
    )
    names = [n for n in args.queries.split(",") if n]

    spark = get_session("fluvii-stress-bench")
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    import math

    build_replicated(spark, base, big_dir, args.k)
    if args.build_only:
        return

    # same warm-up as bench.py so neither scale pays first-use costs
    spark.range(1_000_000).selectExpr("sum(id)").collect()

    print("== base scale ==", file=sys.stderr)
    base_walls = run_queries(spark, names, base, args.passes)
    print("== replicated scale ==", file=sys.stderr)
    big_walls = run_queries(spark, names, big_dir, args.passes)

    queries = {}
    for n in names:
        b, g = base_walls.get(n, -1.0), big_walls.get(n, -1.0)
        exp = (
            round(math.log(g / b) / math.log(args.k), 3)
            if b > 0 and g > 0
            else None
        )
        queries[n] = {
            "base_sec": round(b, 3),
            "big_sec": round(g, 3),
            "growth_exponent": exp,
            **(
                {"expected_bound": EXPECTED_BOUNDS[n]}
                if n in EXPECTED_BOUNDS
                else {}
            ),
        }

    out = {
        "metric": "scale_growth_exponent",
        "k": args.k,
        "base_sf_dir": base,
        "big_sf_dir": big_dir,
        "passes": args.passes,
        "queries": queries,
    }
    with open(args.out, "w") as fh:
        json.dump(out, fh, indent=1, sort_keys=True)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
