"""Streaming ordered-subsequence counter (streaming/subsequence.py):
parity against an independent sequential Python DP AND against the batch
q250 totals, plus checkpoint-restart invariance — the funnel/CDC proof
pattern applied to the counting (not latching) funnel family."""

from __future__ import annotations

import os
import shutil
import time

from fluvii_spark.io.readers import load_table
from fluvii_spark.streaming.subsequence import (
    Q250_STAGES,
    streaming_subsequence_count,
)

N_FILES = 4
ROW_SCHEMA = "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG, event_type STRING"


def _event_rows(spark, sf_dir) -> list[tuple]:
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .orderBy("ts", "event_id")
        .collect()
    )


def _sequential_totals(rows) -> dict:
    """Independent plain-Python DP: per-user counters, one pass in
    (ts, event_id) order — st[i] += st[i-1] on a stage-i event."""
    idx = {t: i for i, t in enumerate(Q250_STAGES)}
    state: dict = {}
    for r in rows:
        i = idx.get(r["event_type"])
        if i is None:
            continue
        st = state.setdefault(r["user_id"], [0] * len(Q250_STAGES))
        if i == 0:
            st[0] += 1
        else:
            st[i] += st[i - 1]
    return {u: st[-1] for u, st in state.items() if st[-1] > 0}


def _stage_files(spark, rows, root: str) -> str:
    staged = os.path.join(root, "staged")
    os.makedirs(staged, exist_ok=True)
    chunk = (len(rows) + N_FILES - 1) // N_FILES
    for i in range(N_FILES):
        part_rows = rows[i * chunk : (i + 1) * chunk]
        if not part_rows:
            continue
        d = os.path.join(root, f"build{i}")
        spark.createDataFrame(part_rows, ROW_SCHEMA).coalesce(
            1
        ).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copy(os.path.join(d, part), dst)
        t = time.time() - 300 + i * 10
        os.utime(dst, (t, t))
    return staged


def _run(spark, staged: str, out: str, ck: str) -> None:
    src = (
        spark.readStream.schema(ROW_SCHEMA)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    q = (
        streaming_subsequence_count(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _compact(spark, out: str) -> dict:
    """Latest (= max, the counter is monotone) n_complete per user."""
    totals: dict = {}
    for r in spark.read.parquet(out).collect():
        u, n = r["user_id"], r["n_complete"]
        totals[u] = max(totals.get(u, 0), n)
    return totals


def test_streaming_subsequences_match_sequential_and_q250(
    spark, sf_dir, tmp_path
):
    rows = _event_rows(spark, sf_dir)
    want = _sequential_totals(rows)
    assert want, "fixture must produce complete subsequences"
    staged = _stage_files(spark, rows, str(tmp_path))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, staged, out, ck)
    got = _compact(spark, out)
    assert got == want

    # batch q250 parity: its top-50 rows are exactly the 50 largest
    # streaming totals under the same (n_paths DESC, user_id) order
    from fluvii_spark.queries import registry

    batch = [
        (r["user_id"], r["n_paths"])
        for r in registry()["q250_funnel_subsequences"].fn(
            spark, sf_dir
        ).collect()
    ]
    stream_ranked = sorted(got.items(), key=lambda kv: (-kv[1], kv[0]))
    assert batch == stream_ranked[: len(batch)]


def test_streaming_subsequences_restart_invariance(spark, sf_dir, tmp_path):
    rows = _event_rows(spark, sf_dir)
    full = _stage_files(spark, rows, str(tmp_path / "full"))
    files = sorted(os.listdir(full))
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for f in files[: len(files) // 2]:
        shutil.copy2(os.path.join(full, f), os.path.join(staged, f))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, staged, out, ck)
    for f in files[len(files) // 2 :]:
        shutil.copy2(os.path.join(full, f), os.path.join(staged, f))
    _run(spark, staged, out, ck)
    assert _compact(spark, out) == _sequential_totals(rows)


def test_stage_validation():
    import pytest as _pytest

    from pyspark.sql import SparkSession  # noqa: F401

    with _pytest.raises(ValueError):
        streaming_subsequence_count(None, stages=("view",))
    with _pytest.raises(ValueError):
        streaming_subsequence_count(None, stages=("view", "view"))
