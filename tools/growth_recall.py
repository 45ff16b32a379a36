#!/usr/bin/env python
"""Measured recall of the APPROXIMATE paths on the grown corpus
(VERDICT r10 ask #4).

The growth ORACLE deliberately excludes q38 (its Spark side routes to the
LSH-bucketed GEMM path above EXACT_EMBED_MAX_ROWS while the oracle is
exact all-pairs) and checks the LSH top-k family only at oracle scale —
so the approximate paths' quality AT SCALE was an argument, not a
measurement. This tool turns the designed exclusion into a measured
contract: for a bounded md5-deterministic probe sample it computes

1. **embedding_near_dup candidate recall** — exact cosine-threshold
   partners of each probe (brute force: |probes| x n, linear) vs the pairs
   the bucketed path's candidate generation retains (co-bucketed in >=1 of
   the n_tables hyperplane tables). The GEMM verify inside a bucket is
   exact, so candidate recall IS end-to-end recall. Tables/planes come
   from the OPERATOR's own solve
   (operators.dedup.lsh_tables_for_target_recall at the q38 threshold),
   so the measured configuration is the deployed one.
2. **LSH top-k recall@k** (q39 single-bucket and q116 multi-probe shapes)
   vs brute-force top-k, at the ADAPTIVE plane count the index would pick
   for this corpus size. Reported overall and restricted to near-dup
   ground truth (cosine >= 0.9) — the production regime: hyperplane LSH's
   contract is near-duplicate retrieval; far-apart neighbors split planes
   with probability ~theta/pi each and are honestly not recalled.

Floors (asserted, exit 1 below):
- near-dup pair recall >= 0.9 (the operator's target_recall solve);
- multi-probe near-dup top-k recall >= 0.9; single-bucket >= 0.7
  (one table, no amplification — the formula p^planes at cosine 0.99
  gives ~0.95; 0.7 leaves room for the cosine-0.9..0.95 tail).

Bounded driver state: probe ids/vectors (n_probes x dims floats) and the
per-probe top-k lists (n_probes x k rows) — same class as the operators'
own 1-row probe fetches. Everything else is joins.

Usage::

    python tools/growth_recall.py [--g 10] [--grown-dir DIR]
        [--n-probes 64] [--k 5] [--out GROWTH_RECALL_r11.json]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fluvii_spark.operators import similarity as S  # noqa: E402
from fluvii_spark.operators.dedup import (  # noqa: E402
    lsh_tables_for_target_recall,
)
from fluvii_spark.operators.stats import parquet_row_count  # noqa: E402
from fluvii_spark.session import apply_runtime_confs, get_session  # noqa: E402

Q38_THRESHOLD = 0.4
Q38_PLANES = 8
Q38_TARGET_RECALL = 0.9
NEARDUP_COS = 0.9

FLOOR_PAIR_NEARDUP = 0.90
FLOOR_TOPK_MULTIPROBE_NEARDUP = 0.90
FLOOR_TOPK_SINGLE_NEARDUP = 0.70


def probe_sample(emb, n_probes: int) -> list[int]:
    """md5-deterministic probe ids (well-formed vectors only, so every
    probe is actually indexable)."""
    return [
        r[0]
        for r in (
            emb.where(S.well_formed_vec("embedding", 64))
            .select("vec_id")
            .withColumn("h", F.md5(F.col("vec_id").cast("string")))
            .orderBy("h", "vec_id")
            .limit(n_probes)
            .collect()
        )
    ]


def pair_recall(spark, emb, pids: list[int]) -> dict:
    """(1): candidate recall of the bucketed near-dup path for all
    threshold-partners of the probe set."""
    n_tables = lsh_tables_for_target_recall(
        Q38_THRESHOLD, Q38_PLANES, Q38_TARGET_RECALL
    )
    probes = emb.where(F.col("vec_id").isin(pids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    exact = (
        emb.where(S.well_formed_vec("embedding", 64))
        .crossJoin(F.broadcast(probes))
        .where(F.col("vec_id") != F.col("qid"))
        .select(
            "qid",
            "vec_id",
            F.expr(S.cosine_sql("embedding", "qvec")).alias("cos"),
        )
        .where(F.col("cos") >= Q38_THRESHOLD)
    )
    tabs = S.lsh_bucket_tables(
        emb, 64, "vec_id", "embedding", Q38_PLANES, n_tables
    )
    ta = tabs.select(
        F.col("vec_id").alias("qid"), "table", F.col("bucket").alias("qb")
    )
    hits = (
        exact.join(ta, "qid")
        .join(tabs, ["vec_id", "table"])
        .where(F.col("bucket") == F.col("qb"))
        .select("qid", "vec_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    marked = exact.join(hits, ["qid", "vec_id"], "left").select(
        "cos", F.coalesce("hit", F.lit(0)).alias("hit")
    )
    band = (
        F.when(F.col("cos") >= NEARDUP_COS, "neardup_ge_0.9")
        .when(F.col("cos") >= 0.6, "mid_0.6_0.9")
        .otherwise("tail_0.4_0.6")
    )
    rows = (
        marked.groupBy(band.alias("band"))
        .agg(F.count("*").alias("n"), F.sum("hit").alias("found"))
        .collect()
    )
    by_band = {
        r["band"]: {
            "n_pairs": r["n"],
            "found": r["found"],
            "recall": round(r["found"] / r["n"], 4) if r["n"] else None,
        }
        for r in rows
    }
    total = sum(r["n"] for r in rows)
    found = sum(r["found"] for r in rows)
    nd = by_band.get("neardup_ge_0.9", {"n_pairs": 0, "found": 0})
    return {
        "threshold": Q38_THRESHOLD,
        "planes": Q38_PLANES,
        "n_tables": n_tables,
        "target_recall": Q38_TARGET_RECALL,
        "n_exact_pairs": total,
        "found": found,
        "recall_overall": round(found / total, 4) if total else None,
        "recall_by_band": by_band,
        "floor_neardup": FLOOR_PAIR_NEARDUP,
        "pass": (
            nd["n_pairs"] > 0
            and nd["found"] / nd["n_pairs"] >= FLOOR_PAIR_NEARDUP
        ),
    }


def _topk_sets(df, k: int) -> dict[int, set]:
    out: dict[int, set] = {}
    for r in df.collect():  # bounded: n_probes x k rows
        out.setdefault(r["qid"], set()).add(r["vec_id"])
    return out


def topk_recall(spark, emb, pids: list[int], k: int) -> dict:
    """(2): recall@k of the single-bucket (q39) and multi-probe (q116)
    LSH shapes vs brute force, at the adaptive plane count."""
    import numpy as np
    from pyspark.sql import Window

    n = emb.count()
    planes = S.adaptive_planes(n)
    probes = emb.where(F.col("vec_id").isin(pids)).select(
        F.col("vec_id").alias("qid"), F.col("embedding").alias("qvec")
    )
    w = Window.partitionBy("qid").orderBy(
        F.col("cosine").desc(), F.col("vec_id")
    )

    def topk(cand):
        return (
            cand.select(
                "qid",
                "vec_id",
                F.expr(S.cosine_sql("embedding", "qvec")).alias("cosine"),
            )
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= k)
            .select("qid", "vec_id", "cosine")
        )

    well = emb.where(S.well_formed_vec("embedding", 64))
    brute_df = topk(
        well.crossJoin(F.broadcast(probes)).where(
            F.col("vec_id") != F.col("qid")
        )
    )
    brute_rows = brute_df.collect()
    brute = {}
    neardup_truth = {}
    for r in brute_rows:
        brute.setdefault(r["qid"], set()).add(r["vec_id"])
        if r["cosine"] >= NEARDUP_COS:
            neardup_truth.setdefault(r["qid"], set()).add(r["vec_id"])

    buckets = S.lsh_buckets(emb, 64, "vec_id", "embedding", planes)
    qb = buckets.join(
        probes.select(F.col("qid").alias("vec_id")), "vec_id"
    ).select(F.col("vec_id").alias("qid"), F.col("bucket").alias("qbucket"))

    # single-bucket (q39 shape)
    single = topk(
        well.join(buckets, "vec_id")
        .join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .where(F.col("vec_id") != F.col("qid"))
        .join(F.broadcast(probes), "qid")
    )
    single_sets = _topk_sets(single, k)

    # multi-probe (q116 shape): flip the `probes_n` lowest-|dot| planes of
    # each probe's bucket. The per-probe dots are n_probes x planes doubles
    # — computed driver-side from the SAME md5 plane weights the index
    # uses (operators.similarity.plane_weights), bounded like the
    # operator's own single-query dot fetch.
    probes_n = 3
    ws = np.array(S.plane_weights(64, planes))  # planes x dims
    pvec = {r["qid"]: np.array(r["qvec"], dtype=np.float64)
            for r in probes.collect()}
    qbuckets = {r["qid"]: r["qbucket"] for r in qb.collect()}
    probe_rows = []
    for qid, vec in pvec.items():
        if qid not in qbuckets:
            continue
        base = qbuckets[qid]
        dots = ws @ vec
        flip = np.argsort((np.abs(dots), np.arange(planes)))  # noqa: F841
        order = sorted(range(planes), key=lambda p: (abs(dots[p]), p))
        cand = {base}
        for p in order[:probes_n]:
            cand.add(base ^ (1 << p))
        probe_rows.extend((qid, int(b)) for b in cand)
    pb = spark.createDataFrame(probe_rows, "qid long, pbucket long")
    multi = topk(
        well.join(buckets, "vec_id")
        .join(F.broadcast(pb), F.col("bucket") == F.col("pbucket"))
        .where(F.col("vec_id") != F.col("qid"))
        .select("qid", "vec_id", "embedding")
        .distinct()
        .join(F.broadcast(probes), "qid")
    )
    multi_sets = _topk_sets(multi, k)

    def score(approx: dict[int, set]) -> dict:
        overall, nd = [], []
        for qid, truth in brute.items():
            got = approx.get(qid, set())
            overall.append(len(got & truth) / len(truth))
            ndt = neardup_truth.get(qid)
            if ndt:
                nd.append(len(got & ndt) / len(ndt))
        return {
            "recall_at_k_mean": round(sum(overall) / len(overall), 4)
            if overall
            else None,
            "recall_at_k_min": round(min(overall), 4) if overall else None,
            "neardup_recall_mean": round(sum(nd) / len(nd), 4) if nd else None,
            "neardup_recall_min": round(min(nd), 4) if nd else None,
            "n_probes_with_neardup_truth": len(nd),
        }

    s_single, s_multi = score(single_sets), score(multi_sets)
    return {
        "planes_adaptive": planes,
        "k": k,
        "corpus_rows": n,
        "neardup_cos": NEARDUP_COS,
        "single_bucket": {
            **s_single,
            "floor_neardup": FLOOR_TOPK_SINGLE_NEARDUP,
            "pass": (s_single["neardup_recall_mean"] or 0)
            >= FLOOR_TOPK_SINGLE_NEARDUP,
        },
        "multiprobe_3": {
            **s_multi,
            "floor_neardup": FLOOR_TOPK_MULTIPROBE_NEARDUP,
            "pass": (s_multi["neardup_recall_mean"] or 0)
            >= FLOOR_TOPK_MULTIPROBE_NEARDUP,
        },
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=10)
    ap.add_argument("--grown-dir", default=None)
    ap.add_argument("--n-probes", type=int, default=64)
    ap.add_argument("--k", type=int, default=5)
    ap.add_argument("--out", default="-")
    args = ap.parse_args()
    grown = args.grown_dir or f"/tmp/fluvii_growth_g{args.g}"
    if not os.path.exists(os.path.join(grown, "_FLUVII_GROWTH_OK")):
        raise SystemExit(f"{grown}: no verified grown corpus")

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "growth-recall", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    emb_path = os.path.join(grown, "embeddings.parquet")
    emb = spark.read.parquet(emb_path)
    n_total = parquet_row_count(emb_path, emb)

    pids = probe_sample(emb, args.n_probes)
    t0 = time.time()
    pair = pair_recall(spark, emb, pids)
    pair["wall_sec"] = round(time.time() - t0, 2)
    print(f"pair_recall: {pair}", file=sys.stderr)
    t0 = time.time()
    tk = topk_recall(spark, emb, pids, args.k)
    tk["wall_sec"] = round(time.time() - t0, 2)
    print(f"topk_recall: {tk}", file=sys.stderr)

    ok = pair["pass"] and tk["single_bucket"]["pass"] and tk["multiprobe_3"]["pass"]
    payload = json.dumps(
        {
            "metric": "growth_recall",
            "g": args.g,
            "grown_sf_dir": grown,
            "corpus_rows": n_total,
            "n_probes": len(pids),
            "embedding_near_dup": pair,
            "lsh_topk": tk,
            "pass": ok,
        },
        indent=2,
        sort_keys=True,
    )
    if args.out == "-":
        print(payload)
    else:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
        print(f"wrote {args.out}: pass={ok}")
    spark.stop()
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
