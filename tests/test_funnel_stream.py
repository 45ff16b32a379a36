"""Streaming funnel (streaming/funnel.py): parity against an INDEPENDENT
sequential Python reference AND against the batch q89 stage counts, plus
checkpoint-restart invariance — the sessionizer/CDC proof pattern applied
to the conversion-funnel family.
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import timezone

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table
from fluvii_spark.streaming.funnel import Q89_STAGES, streaming_funnel

N_FILES = 4
ROW_SCHEMA = "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG, event_type STRING"


def _event_rows(spark, sf_dir) -> list[tuple]:
    return (
        load_table(spark, sf_dir, "events")
        .select("user_id", "ts", "event_id", "event_type")
        .orderBy("ts", "event_id")
        .collect()
    )


def _sequential_funnel(rows) -> list[tuple]:
    """Independent plain-Python latch fold → sorted stage completions."""
    state: dict = {}
    out: list[tuple] = []
    types = [t for t, _ in Q89_STAGES]
    for r in rows:
        if r["event_type"] not in types:
            continue
        u = r["user_id"]
        ep = int(
            r["ts"].replace(tzinfo=timezone.utc).timestamp() * 1_000_000
        )
        st = state.setdefault(u, [None] * len(Q89_STAGES))
        for i, (stage, horizon) in enumerate(Q89_STAGES):
            if r["event_type"] != stage or st[i] is not None:
                continue
            if i > 0:
                prev = st[i - 1]
                if prev is None or ep <= prev:
                    break
                if horizon is not None and ep - prev > horizon:
                    break
            st[i] = ep
            out.append((u, i, stage, ep))
            break
    return sorted(out)


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
        streaming_funnel(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _collect(spark, out: str) -> list[tuple]:
    return sorted(
        (r["user_id"], r["stage_idx"], r["stage"], r["reached_ep"])
        for r in spark.read.parquet(out).collect()
    )


def test_streaming_funnel_matches_sequential_and_q89(spark, sf_dir, tmp_path):
    rows = _event_rows(spark, sf_dir)
    want = _sequential_funnel(rows)
    staged = _stage_files(spark, rows, str(tmp_path))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, staged, out, ck)
    got = _collect(spark, out)
    assert got == want
    assert len(got) > 0

    # q89 parity: completions per stage == the batch funnel's n_users
    from fluvii_spark.queries import registry

    batch = {
        r["stage"]: r["n_users"]
        for r in registry()["q89_funnel"].fn(spark, sf_dir).collect()
    }
    stage_counts: dict = {}
    for _u, i, _s, _ep in got:
        stage_counts[i] = stage_counts.get(i, 0) + 1
    assert stage_counts.get(0, 0) == batch["view"]
    assert stage_counts.get(1, 0) == batch["view>click"]
    assert stage_counts.get(2, 0) == batch["view>click>purchase"]
    # drop-off must be real (the r7 degeneracy-gate q89 redefinition)
    assert stage_counts[0] > stage_counts[1] > stage_counts.get(2, 0) > 0


def test_streaming_funnel_restart_invariance(spark, sf_dir, tmp_path):
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
    assert _collect(spark, out) == _sequential_funnel(rows)


def test_horizon_and_order_rules(spark, tmp_path):
    """A click outside the 24 h horizon never converts (nor do later,
    even-further clicks); a click BEFORE the first view doesn't count;
    stage completions latch exactly once."""
    rows = [
        # user 1: click precedes view → view latches, that click ignored;
        # a later in-horizon click converts, second click ignored
        (1, "2024-01-01 00:00:00", 1, "click"),
        (1, "2024-01-01 01:00:00", 2, "view"),
        (1, "2024-01-01 02:00:00", 3, "click"),
        (1, "2024-01-01 03:00:00", 4, "click"),
        # purchase within 72 h of the click → full funnel
        (1, "2024-01-02 00:00:00", 5, "purchase"),
        # user 2: the first click after view is PAST the 24 h horizon →
        # stage 2 never completes, purchase can't either
        (2, "2024-01-01 00:00:00", 6, "view"),
        (2, "2024-01-02 01:00:00", 7, "click"),
        (2, "2024-01-02 02:00:00", 8, "purchase"),
    ]
    staged = str(tmp_path / "staged")
    spark.createDataFrame(
        rows, "user_id LONG, ts STRING, event_id LONG, event_type STRING"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_id",
        "event_type",
    ).coalesce(1).write.parquet(staged)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run(spark, staged, out, ck)
    got = [(u, i, s) for u, i, s, _ep in _collect(spark, out)]
    assert got == [
        (1, 0, "view"),
        (1, 1, "click"),
        (1, 2, "purchase"),
        (2, 0, "view"),
    ]
