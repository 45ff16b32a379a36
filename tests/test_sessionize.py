"""Streaming dual-constraint sessionization (streaming/sessionize.py):
batch parity against an INDEPENDENT sequential Python reference (the
kmeans/packing property-oracle pattern), checkpoint-restart invariance,
and the idle-flush tail emission.

Events are staged as sequential ts-range files with pinned mtimes
(FileStreamSource orders by (modTime, path)) so cross-batch arrival order
is event-time order — the partition-ordered consumption contract the
operator documents.
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import datetime

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table
from fluvii_spark.streaming.sessionize import streaming_sessions

GAP_S = 1800
CAP_S = 1800
N_FILES = 4


def _stage_ordered(spark, sf_dir, root: str, n_files: int = N_FILES) -> str:
    """events → n_files sequential ts-range parquet files, mtime-pinned."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id")
        .orderBy("ts", "event_id")
        .collect()
    )
    staged = os.path.join(root, "staged")
    os.makedirs(staged, exist_ok=True)
    chunk = (len(ev) + n_files - 1) // n_files
    build = os.path.join(root, "build")
    for i in range(n_files):
        rows = ev[i * chunk : (i + 1) * chunk]
        if not rows:
            continue
        d = os.path.join(build, str(i))
        spark.createDataFrame(
            rows, "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG"
        ).coalesce(1).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copy(os.path.join(d, part), dst)
        t = time.time() - 300 + i * 10
        os.utime(dst, (t, t))
    return staged


def _reference_sessions(spark, sf_dir) -> list[tuple]:
    """Sequential fold with the operator's exact rules — independent
    implementation (plain Python over sorted rows), CLOSED sessions only."""
    rows = (
        load_table(spark, sf_dir, "events")
        .select("user_id", F.unix_timestamp("ts").alias("ep"), "ts", "event_id")
        .orderBy("ts", "event_id")
        .collect()
    )
    return _sequential_fold(
        [(r["user_id"], int(r["ep"])) for r in rows]
    )


def _sequential_fold(pairs: list[tuple]) -> list[tuple]:
    """q226's exact batch rules, folded sequentially: a >GAP_S idle gap
    closes and MOVES the chunk anchor; the cap closes when the event's
    fixed chunk window ((ep - origin) DIV CAP_S) differs from the open
    chunk's — anchored at the GAP session's first event, never
    re-anchored at a chunk's first event."""
    state: dict = {}
    closed: list[tuple] = []
    for u, ep in pairs:
        st = state.get(u)
        if st is None:
            state[u] = {"origin": ep, "first": ep, "last": ep, "n": 1, "sid": 0}
            continue
        if ep - st["last"] > GAP_S:
            closed.append(
                (u, st["sid"], st["n"], st["last"] - st["first"], "gap")
            )
            state[u] = {
                "origin": ep,
                "first": ep,
                "last": ep,
                "n": 1,
                "sid": st["sid"] + 1,
            }
        elif (ep - st["origin"]) // CAP_S != (st["first"] - st["origin"]) // CAP_S:
            closed.append(
                (u, st["sid"], st["n"], st["last"] - st["first"], "cap")
            )
            state[u] = {
                "origin": st["origin"],
                "first": ep,
                "last": ep,
                "n": 1,
                "sid": st["sid"] + 1,
            }
        else:
            st["last"] = ep
            st["n"] += 1
    return sorted(closed)


def _read_stream(spark, staged: str, fpt: int = 1):
    schema = spark.read.parquet(staged).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", str(fpt))
        .parquet(staged)
    )


def _run_to_parquet(spark, src, out: str, ck: str) -> None:
    q = (
        streaming_sessions(src, gap_s=GAP_S, cap_s=CAP_S)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _collect_sessions(spark, out: str) -> list[tuple]:
    return sorted(
        (
            r["user_id"],
            r["session_no"],
            r["n_events"],
            r["span_s"],
            r["closed_by"],
        )
        for r in spark.read.parquet(out).collect()
    )


def test_streaming_sessions_match_sequential_reference(
    spark, sf_dir, tmp_path
):
    staged = _stage_ordered(spark, sf_dir, str(tmp_path))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run_to_parquet(spark, _read_stream(spark, staged), out, ck)
    got = _collect_sessions(spark, out)
    want = _reference_sessions(spark, sf_dir)
    assert got == want
    assert len(got) > 0, "fixture produced no closed sessions — weak test"
    assert {c for *_, c in got} >= {"gap"}, "no gap-closed sessions"


def test_streaming_sessions_restart_invariance(spark, sf_dir, tmp_path):
    full = _stage_ordered(spark, sf_dir, str(tmp_path / "full"))
    files = sorted(os.listdir(full))
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    # phase 1: first half of the files (copy2 PRESERVES the pinned
    # mtimes — FileStreamSource orders by (modTime, path), and fresh
    # copy-time mtimes would tie, leaving the restart batch order
    # undefined)
    for f in files[: len(files) // 2]:
        shutil.copy2(os.path.join(full, f), os.path.join(staged, f))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run_to_parquet(spark, _read_stream(spark, staged), out, ck)
    # phase 2: rest of the files, SAME checkpoint
    for f in files[len(files) // 2 :]:
        shutil.copy2(os.path.join(full, f), os.path.join(staged, f))
    _run_to_parquet(spark, _read_stream(spark, staged), out, ck)
    assert _collect_sessions(spark, out) == _reference_sessions(
        spark, sf_dir
    )


def test_idle_flush_emits_open_tail(spark, tmp_path):
    """With idle_flush_ms, an idle key's open session flushes with
    closed_by='flush' and its state drops. ProcessingTimeTimeout keeps
    the engine triggering timer batches, so poll the sink (the
    test_state_timeout pattern)."""
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    rows = [(1, "2024-01-01 00:00:00", 1), (1, "2024-01-01 00:05:00", 2)]
    spark.createDataFrame(
        rows, "user_id LONG, ts STRING, event_id LONG"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_id"
    ).coalesce(1).write.parquet(staged + "/f0")
    src = (
        spark.readStream.schema("user_id LONG, ts TIMESTAMP_NTZ, event_id LONG")
        .option("maxFilesPerTrigger", "1")
        .parquet(staged + "/f0")
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = (
        streaming_sessions(src, idle_flush_ms=500)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    deadline = time.time() + 60
    got: list[tuple] = []
    while time.time() < deadline:
        try:
            got = _collect_sessions(spark, out)
        except Exception:  # noqa: BLE001 — sink not yet materialized
            got = []
        if got:
            break
        time.sleep(0.5)
    q.stop()
    assert got == [(1, 0, 2, 300, "flush")]


def test_null_user_and_ts_rows_are_dropped(spark, tmp_path):
    """NULL keys / timestamps can't session — they must be filtered, not
    crash the fold with a TypeError (the streaming-HLL NULL-guard rule)."""
    staged = str(tmp_path / "staged")
    rows = [
        (None, "2024-01-01 00:00:00", 1),
        (1, None, 2),
        (1, "2024-01-01 00:00:00", 3),
        (1, "2024-01-01 02:00:00", 4),  # >30min gap closes session 0
    ]
    spark.createDataFrame(
        rows, "user_id LONG, ts STRING, event_id LONG"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_id"
    ).coalesce(1).write.parquet(staged)
    src = (
        spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run_to_parquet(spark, src, out, ck)
    assert _collect_sessions(spark, out) == [(1, 0, 1, 0, "gap")]


def test_cap_anchor_matches_batch_chunks(spark, tmp_path):
    """The ADVICE r6 counterexample: epochs 0,1000,2500,3800 (all gaps
    <= 1800) must form THREE cap chunks anchored at the gap session's
    first event — {0,1000},{2500},{3800} — like q226's
    ``(ep - min(ep)) DIV 1800``. A fold that re-anchors the cap window
    at each chunk's first event would merge {2500,3800} into one."""
    epochs = [0, 1000, 2500, 3800]
    want = _sequential_fold([(1, ep) for ep in epochs])
    assert want == [(1, 0, 2, 1000, "cap"), (1, 1, 1, 0, "cap")]

    staged = str(tmp_path / "staged")
    rows = [
        (1, datetime.utcfromtimestamp(ep).strftime("%Y-%m-%d %H:%M:%S"), i)
        for i, ep in enumerate(epochs)
    ]
    spark.createDataFrame(
        rows, "user_id LONG, ts STRING, event_id LONG"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_id"
    ).coalesce(1).write.parquet(staged)
    src = (
        spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run_to_parquet(spark, src, out, ck)
    # {3800} stays open in state; the two cap-closed chunks must match
    assert _collect_sessions(spark, out) == want


def test_state_migration_from_pre_anchor_format():
    """A checkpoint written by the pre-r7 fold kept {'start',...}; the
    migration shim must map it onto the batch-anchored shape so a restart
    never raises KeyError or drops an open session (review r7)."""
    from fluvii_spark.streaming.sessionize import _migrate

    old = {"start": 100, "last": 900, "n": 3, "sid": 2}
    assert _migrate(old) == {
        "origin": 100,
        "first": 100,
        "last": 900,
        "n": 3,
        "sid": 2,
    }
    new = {"origin": 0, "first": 50, "last": 60, "n": 2, "sid": 1}
    assert _migrate(new) is new
    assert _migrate(None) is None
