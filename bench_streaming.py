#!/usr/bin/env python
"""Streaming benchmark: throughput + state size for the stateful operators.

The batch inventory has per-query wall evidence in ``BENCH_r*.json``; this
harness produces the streaming counterpart. It replays the ``events`` table
at ``$SPARK_GRAFT_SF_DIR`` (default sf0.1, 100k rows) as a file-source
stream (N staged part files, ``maxFilesPerTrigger`` forcing multiple
micro-batches) through each stateful pipeline with a ``noop`` sink, and
records, per pipeline:

- ``rows_per_sec``  — input rows / wall seconds (end-to-end, incl. planning)
- ``processed_rows_per_sec`` — Spark's own lastProgress rate (per-batch mean)
- ``state_rows`` / ``state_bytes`` — from the state-store operator metrics
  (``stateOperators[].numRowsTotal`` / ``memoryUsedBytes``), the number that
  must stay bounded at 100 TB
- ``batches`` — micro-batch count actually executed

Pipelines (all per-arrival emission, the reference's per-message contract):
  keyed_fold     streaming_keyed_fold: running balance per user (ST1-ST3)
  kmv_distinct   streaming_kmv_distinct: O(k) distinct-user sketch per type
  hll_distinct   streaming_hll_distinct: O(m=64) register sketch per type
  heavy_hitters  streaming_heavy_hitters: O(m) Misra-Gries per type
  trending       streaming_trending: windowed MG on (type, 1h window)
  tumbling       built-in watermark+window count agg (engine baseline)
  cdc_apply      streaming_cdc_apply: LWW upsert/tombstone changelog apply
                 (the q182 MERGE-sink twin; state = one row per live key)
  funnel         streaming_funnel: q89's view->click(24h)->purchase(72h)
                 ladder, stage completions emitted as reached (O(1)/user)
  minhash_dedup  streaming_minhash_candidates over the documents table:
                 per-arrival near-dup candidates from the stateful banded
                 inverted index (state = the index itself, ~4 rows/doc)
  static_join    stream_static_join: broadcast customer-dim enrich (the
                 stream side never shuffles) + watermarked tumbling count
                 by market segment — the enrichment shape every 100 TB
                 feed runs before aggregating
  interval_join  stream_stream_interval_join: per-user view->purchase
                 pairs within 1h (self-join of the event stream; join
                 state bounded by watermark + interval horizon)

Runs ``$SPARK_GRAFT_STREAM_PASSES`` full passes (default 2, each with its
own checkpoint root so offsets never resume) and keeps the best pass per
pipeline by engine-reported rate — the same best-of-N discipline the batch
bench has used since r5, so one shared-host window's luck can't masquerade
as a regression. Cross-pass ``state_rows`` must agree (deterministic corpus
function); disagreements land in ``state_rows_pass_mismatch``.

Prints ONE JSON line; the driver may record it as BENCH_STREAM_r{N}.json.
"""
from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from pyspark.sql import functions as F  # noqa: E402

from fluvii_spark.io.readers import load_table, sf_from_dir  # noqa: E402
from fluvii_spark.session import apply_runtime_confs, get_session  # noqa: E402

N_FILES = int(os.environ.get("SPARK_GRAFT_STREAM_FILES", "8"))
FILES_PER_TRIGGER = int(os.environ.get("SPARK_GRAFT_STREAM_FPT", "2"))
DOC_REP = int(os.environ.get("SPARK_GRAFT_STREAM_DOC_REP", "8"))
# distinct-corpus replication for the steady-state throughput workload:
# 16 × 5k sf0.1 docs = 80k genuinely distinct documents (every shingle
# differs per replica), large enough that fixed micro-batch overhead is
# <10% of wall (measured via overhead_share) and rows/sec measures the
# operator itself
DOC_DISTINCT_REP = int(os.environ.get("SPARK_GRAFT_STREAM_DOC_DISTINCT_REP", "16"))


def stage_events(spark, sf_dir: str, root: str) -> tuple[str, int]:
    """Write events as N part files a file stream replays as micro-batches."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", "ts", "user_id", "event_type", "value")
        # watermarks require TIMESTAMP (not NTZ); session tz is UTC so the
        # instant is unchanged
        .withColumn("ts", F.col("ts").cast("timestamp"))
    )
    n = ev.count()
    path = os.path.join(root, "events_stream")
    ev.repartition(N_FILES).write.parquet(path)
    return path, n


def stage_documents(
    spark, sf_dir: str, root: str, rep: int, distinct: bool = False
) -> tuple[str, int]:
    """Documents as N part files — the text stream for the dedup pipeline.

    ``rep > 1`` replicates the corpus with distinct doc_ids (offset past
    the real max id, so larger tables can't collide). Two replication
    modes:

    - ``distinct=False``: replicas are EXACT text duplicates — every
      replica of a doc shares all band signatures, so the pipeline runs a
      duplicate-saturated ingest (each doc joins an rep-member LSH cluster
      and emits the corresponding candidate pairs): the stress mode of a
      duplicate-rich feed.
    - ``distinct=True``: every WORD in each replica is suffixed with the
      replica index, so every word-3-gram shingle — and therefore every
      band signature — differs across replicas: a rep× corpus of genuinely
      DISTINCT documents. This is the steady-state throughput workload
      (VERDICT r5 "What's wrong" #1): the per-micro-batch fixed overhead
      that dominated the 5k-doc rep=1 replay amortizes away, and rows/sec
      measures the signature+index work itself.

    The bench reports all three: rep=1 (comparable to BENCH_STREAM_r4's
    minhash_dedup), rep=DOC_REP duplicate-saturated, and
    rep=DOC_DISTINCT_REP distinct (≥40k docs at sf0.1).
    """
    docs = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    if rep > 1:
        offset = docs.agg(F.max("doc_id")).first()[0] + 1
        text = (
            F.array_join(
                F.transform(
                    F.split("text", " "),
                    lambda w: F.concat(w, F.lit("_"), F.col("rep")),
                ),
                " ",
            )
            if distinct
            else F.col("text")
        )
        docs = docs.crossJoin(
            spark.range(rep).withColumnRenamed("id", "rep")
        ).select(
            (F.col("doc_id") + F.col("rep") * F.lit(offset)).alias("doc_id"),
            text.alias("text"),
        )
    n = docs.count()
    suffix = "d" if distinct else ""
    path = os.path.join(root, f"documents_stream_x{rep}{suffix}")
    docs.repartition(N_FILES).write.parquet(path)
    return path, n


def run_pipeline(spark, name: str, make_out, src_path: str, n_rows: int,
                 ckroot: str) -> dict:
    schema = spark.read.parquet(src_path).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(FILES_PER_TRIGGER))
        .parquet(src_path)
    )
    out = make_out(src)
    t0 = time.time()
    q = (
        out.writeStream.format("noop")
        .outputMode("append")
        .option("checkpointLocation", os.path.join(ckroot, name))
        .start()
    )
    q.processAllAvailable()
    wall = time.time() - t0
    progress = q.recentProgress
    q.stop()
    state_rows = state_bytes = 0
    rates = []
    add_ms = trigger_ms = 0
    # state-store time split (r9 ask #6): for stateful pipelines the
    # engine reports per-batch probe/update, eviction, and commit time —
    # the breakdown that adjudicates whether a slow pipeline's cost is
    # the state-store access pattern (expected for stream-stream joins)
    # or something fixable
    upd_ms = rm_ms = commit_ms = 0
    for p in progress:
        rates.append(p.get("processedRowsPerSecond") or 0.0)
        dur = p.get("durationMs") or {}
        add_ms += dur.get("addBatch", 0)
        trigger_ms += dur.get("triggerExecution", 0)
        for op in p.get("stateOperators", []):
            state_rows = max(state_rows, op.get("numRowsTotal", 0))
            state_bytes = max(state_bytes, op.get("memoryUsedBytes", 0))
            upd_ms += op.get("allUpdatesTimeMs", 0)
            rm_ms += op.get("allRemovalsTimeMs", 0)
            commit_ms += op.get("commitTimeMs", 0)
    rates = [r for r in rates if r > 0]
    return {
        "state_update_ms": upd_ms,
        "state_removal_ms": rm_ms,
        "state_commit_ms": commit_ms,
        "wall_sec": round(wall, 3),
        "rows_per_sec": round(n_rows / wall, 1),
        "processed_rows_per_sec": round(
            sum(rates) / len(rates), 1
        ) if rates else None,
        "state_rows": state_rows,
        "state_bytes": state_bytes,
        "batches": len([p for p in progress if p.get("numInputRows")]),
        # share of trigger time NOT spent in addBatch (offset/WAL/planning
        # bookkeeping) — the fixed micro-batch overhead whose amortization
        # the distinct-corpus workload exists to demonstrate
        "overhead_share": round(1 - add_ms / trigger_ms, 3)
        if trigger_ms
        else None,
    }


def pipelines() -> dict:
    from fluvii_spark.streaming.sketch import (
        streaming_heavy_hitters,
        streaming_hll_distinct,
        streaming_kmv_distinct,
        streaming_trending,
    )
    from fluvii_spark.streaming.state import streaming_keyed_fold

    def keyed_fold(src):
        def app(txn):
            bal = txn.read_table_entry() or 0.0
            bal += txn.value()["value"] or 0.0
            txn.update_table_entry(bal)
            txn.produce({"user_id": txn.key, "balance": bal})

        return streaming_keyed_fold(
            src,
            ["user_id"],
            app,
            "user_id long, balance double",
            order_by=["ts", "event_id"],
        )

    def kmv(src):
        hashed = src.withColumn(
            "h",
            F.expr(
                "conv(substr(md5(cast(user_id as string)), 1, 8), 16, 10)"
                " / 4294967296"
            ),
        )
        return streaming_kmv_distinct(hashed, "event_type", "h", k=256)

    def hll(src):
        hashed = src.withColumn(
            "h",
            F.expr(
                "cast(conv(substr(md5(cast(user_id as string)), 1, 8),"
                " 16, 10) as bigint)"
            ),
        )
        return streaming_hll_distinct(hashed, "event_type", "h")

    def heavy_hitters(src):
        return streaming_heavy_hitters(
            src.withColumn("item", F.col("user_id").cast("string")),
            "event_type",
            "item",
            m=16,
            order_by=["ts", "event_id"],
        )

    def trending(src):
        return streaming_trending(
            src.withColumn("item", F.col("user_id").cast("string")),
            "event_type",
            "item",
            "ts",
            window="1 hour",
            m=16,
            order_by=["ts", "event_id"],
        )

    def tumbling(src):
        return (
            src.withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "event_type")
            .agg(F.count("*").alias("n"), F.sum("value").alias("total"))
        )

    def cdc_apply(src):
        from fluvii_spark.streaming.cdc import (
            events_to_cdc_changelog,
            streaming_cdc_apply,
        )

        return streaming_cdc_apply(events_to_cdc_changelog(src))

    def static_join(src):
        # broadcast dim enrich (stream side keeps its partitioning, no
        # shuffle before the agg) + watermarked tumbling count by segment
        from fluvii_spark.streaming.joins import stream_static_join

        sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
        dim = load_table(src.sparkSession, sf_dir, "customer").select(
            F.col("c_custkey").alias("user_id"), "c_mktsegment"
        )
        return (
            stream_static_join(src, dim, "user_id")
            .withWatermark("ts", "1 hour")
            .groupBy(F.window("ts", "1 hour"), "c_mktsegment")
            .agg(F.count("*").alias("n"))
        )

    def interval_join(src):
        # stream-stream self-join: purchases within 1h after a view, per
        # user — join state bounded by watermark + interval horizon
        from fluvii_spark.streaming.joins import stream_stream_interval_join

        views = src.filter(F.col("event_type") == "view").select(
            "user_id",
            F.col("ts").alias("v_ts"),
            F.col("event_id").alias("v_id"),
        )
        buys = src.filter(F.col("event_type") == "purchase").select(
            "user_id",
            F.col("ts").alias("p_ts"),
            F.col("event_id").alias("p_id"),
        )
        return stream_stream_interval_join(
            views, buys, ["user_id"], "v_ts", "p_ts",
            lower_s=0, upper_s=3600, watermark="1 hour",
        )

    def late_window(src):
        from fluvii_spark.streaming.late import streaming_late_window_counts

        return streaming_late_window_counts(
            src, delay="1 hour", window="1 hour"
        )

    def funnel(src):
        from fluvii_spark.streaming.funnel import streaming_funnel

        return streaming_funnel(src)

    def subsequences(src):
        from fluvii_spark.streaming.subsequence import (
            streaming_subsequence_count,
        )

        return streaming_subsequence_count(src)

    return {
        "keyed_fold": keyed_fold,
        "kmv_distinct": kmv,
        "hll_distinct": hll,
        "heavy_hitters": heavy_hitters,
        "trending": trending,
        "tumbling": tumbling,
        "static_join": static_join,
        "interval_join": interval_join,
        "late_window": late_window,
        "cdc_apply": cdc_apply,
        "funnel": funnel,
        "subsequences": subsequences,
    }


def doc_pipelines() -> dict:
    from fluvii_spark.streaming.dedup_stream import (
        streaming_minhash_candidates,
    )

    def minhash_dedup(src):
        return streaming_minhash_candidates(src, "doc_id", "text")

    return {"minhash_dedup": minhash_dedup}


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = sf_from_dir(sf_dir)  # None for non-sfN dir names — still benchmarks
    spark = get_session("fluvii-spark-bench-streaming")
    apply_runtime_confs(spark)
    # recentProgress keeps only the last N entries (default 100): a
    # many-micro-batch run would silently truncate the batches/state/rate
    # metrics this harness reports
    spark.conf.set(
        "spark.sql.streaming.numRecentProgressUpdates", "10000"
    )
    spark.sparkContext.setLogLevel("ERROR")

    root = tempfile.mkdtemp(prefix="fluvii_stream_bench_")
    load_before = os.getloadavg()  # VERDICT r9 ask #4: mechanical noise calls
    try:
        # stage once (pass-invariant inputs); each pass gets its OWN
        # checkpoint root so the engine reprocesses from offset zero
        # instead of resuming the prior pass's committed offsets
        src_path, n_rows = stage_events(spark, sf_dir, root)
        workloads = [(rep, False) for rep in sorted({1, DOC_REP})]
        if DOC_DISTINCT_REP > 1:
            workloads.append((DOC_DISTINCT_REP, True))
        doc_stages = []
        for rep, distinct in workloads:
            doc_path, n_docs = stage_documents(
                spark, sf_dir, root, rep, distinct=distinct
            )
            if rep == 1:
                suffix = ""
            elif distinct:
                suffix = f"_distinct_x{rep}"
            else:
                suffix = f"_x{rep}"
            doc_stages.append((suffix, doc_path, n_docs, rep, distinct))

        # best-of-N passes (VERDICT r10 ask #5): the batch bench has kept
        # best-of-2+ since r5 — one streaming pass inherits one shared-host
        # window's luck, so every round's trend adjudication re-litigated
        # pool noise. Per-pipeline best pass ends that; state_rows must be
        # IDENTICAL across passes (deterministic corpus function) and any
        # cross-pass drift is surfaced in the artifact.
        n_passes = max(1, int(os.environ.get("SPARK_GRAFT_STREAM_PASSES", "2")))
        pass_loads, pass_results = [], []
        for pi in range(n_passes):
            l0 = os.getloadavg()
            results = {}
            ckroot = os.path.join(root, f"ck_p{pi}")
            for name, make_out in pipelines().items():
                results[name] = run_pipeline(
                    spark, name, make_out, src_path, n_rows, ckroot
                )
            # the minhash pipeline's stateful operator holds ~4·n_shards=256
            # keys; 32 state-store partitions paid 32 commits per micro-batch
            # for near-empty stores. 8 matches the key cardinality here —
            # restored afterwards (a fresh checkpoint pins its own count).
            prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
            spark.conf.set("spark.sql.shuffle.partitions", "8")
            try:
                for suffix, doc_path, n_docs, rep, distinct in doc_stages:
                    for name, make_out in doc_pipelines().items():
                        key = name + suffix
                        results[key] = run_pipeline(
                            spark, key, make_out, doc_path, n_docs, ckroot
                        )
                        results[key]["rows"] = n_docs
                        results[key]["doc_rep"] = rep
                        results[key]["distinct_docs"] = distinct or rep == 1
            finally:
                spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            l1 = os.getloadavg()
            pass_loads.append(
                {
                    "before_1m": round(l0[0], 2),
                    "after_1m": round(l1[0], 2),
                    "after_5m": round(l1[1], 2),
                }
            )
            pass_results.append(results)

        # merge: per pipeline, keep the pass with the best engine-reported
        # rate (fallback: lowest wall); the kept record stays internally
        # consistent (its state timings came from the same pass)
        results, state_drift_across_passes = {}, []
        for key in pass_results[0]:
            candidates = [pr[key] for pr in pass_results if key in pr]
            best = max(
                range(len(candidates)),
                key=lambda i: (
                    candidates[i].get("processed_rows_per_sec")
                    or candidates[i].get("rows_per_sec")
                    or 0.0,
                    -candidates[i]["wall_sec"],
                ),
            )
            results[key] = dict(candidates[best], best_pass=best)
            srows = {c["state_rows"] for c in candidates}
            if len(srows) > 1:
                state_drift_across_passes.append(
                    {"pipeline": key, "state_rows_by_pass": sorted(srows)}
                )
        total = sum(r["wall_sec"] for r in results.values())
        load_after = os.getloadavg()  # one snapshot for both after_* fields
        print(
            json.dumps(
                {
                    "metric": "streaming_bench_wall_sec",
                    "value": round(total, 3),
                    "unit": "sec",
                    "rows": n_rows,
                    "sf": sf,
                    "n_files": N_FILES,
                    "files_per_trigger": FILES_PER_TRIGGER,
                    # host load around the whole run (r9 ask #4): a 1m
                    # load ≳ 4 on this 32-cpu box marks a noisy window —
                    # adjudicate movers via bench_stream_trend.py's
                    # median-ratio discipline, not raw walls
                    "loadavg": {
                        "before_1m": round(load_before[0], 2),
                        "after_1m": round(load_after[0], 2),
                        "after_5m": round(load_after[1], 2),
                    },
                    # per-pass load + best-of-N bookkeeping (r10 ask #5);
                    # per-pipeline records carry best_pass, and any
                    # cross-pass state_rows disagreement (must be empty —
                    # state is a deterministic corpus function) is listed
                    "passes": n_passes,
                    "loadavg_passes": pass_loads,
                    "state_rows_pass_mismatch": state_drift_across_passes,
                    "pipelines": results,
                }
            )
        )
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
