"""Streaming CDC apply (streaming/cdc.py): parity against an INDEPENDENT
sequential Python reference AND against the batch q182 aggregate,
checkpoint-restart invariance, tombstone/revive semantics, and NULL-row
guards — the sessionizer's proof pattern applied to the reference's
state-table verbs (upsert/delete) as a stream.
"""

from __future__ import annotations

import os
import shutil
import time
from datetime import timezone
from decimal import Decimal

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table
from fluvii_spark.streaming.cdc import (
    cdc_snapshot,
    events_to_cdc_changelog,
    streaming_cdc_apply,
)

N_FILES = 4


def _changelog_rows(spark, sf_dir) -> list[tuple]:
    """events → the q182 changelog (the SHARED mapping the bench and demo
    also use, so the three can't drift); (ts, event_id)-ordered."""
    return (
        events_to_cdc_changelog(load_table(spark, sf_dir, "events"))
        .orderBy("ts", "event_id")
        .collect()
    )


CDC_ROW_SCHEMA = (
    "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG, op STRING, v DOUBLE"
)
SCD2_ROW_SCHEMA = "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG, k LONG"


def _stage_ordered(
    spark, rows, root: str, schema: str = CDC_ROW_SCHEMA,
    n_files: int = N_FILES,
) -> str:
    """rows → n_files sequential part files with PINNED mtimes — the
    FileStreamSource orders by (modTime, path), and fresh copy-time
    mtimes would tie, leaving micro-batch order undefined."""
    staged = os.path.join(root, "staged")
    os.makedirs(staged, exist_ok=True)
    chunk = (len(rows) + n_files - 1) // n_files
    for i in range(n_files):
        part_rows = rows[i * chunk : (i + 1) * chunk]
        if not part_rows:
            continue
        d = os.path.join(root, f"build{i}")
        spark.createDataFrame(part_rows, schema).coalesce(1).write.parquet(d)
        part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
        dst = os.path.join(staged, f"{i:02d}.parquet")
        shutil.copy(os.path.join(d, part), dst)
        t = time.time() - 300 + i * 10
        os.utime(dst, (t, t))
    return staged


def _sequential_table(rows) -> dict:
    """Independent plain-Python LWW fold → {key: (op, v, n_applied)}."""
    table: dict = {}
    for r in rows:
        k = r["user_id"]
        n = table[k][2] + 1 if k in table else 1
        if r["op"] == "delete":
            table[k] = ("delete", None, n)
        else:
            table[k] = ("upsert", r["v"], n)
    return table


def _read_stream(spark, staged: str):
    schema = spark.read.parquet(staged).schema
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(staged)
    )


def _run_to_parquet(spark, src, out: str, ck: str) -> None:
    q = (
        streaming_cdc_apply(src)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )
    q.processAllAvailable()
    q.stop()


def _snapshot_dict(spark, out: str) -> dict:
    snap = cdc_snapshot(spark.read.parquet(out), keep_tombstones=True)
    return {
        r["user_id"]: (r["op"], r["v"], r["n_applied"])
        for r in snap.collect()
    }


def test_streaming_cdc_matches_sequential_reference_and_q182(
    spark, sf_dir, tmp_path
):
    rows = _changelog_rows(spark, sf_dir)
    staged = _stage_ordered(spark, rows, str(tmp_path))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run_to_parquet(spark, _read_stream(spark, staged), out, ck)

    want = _sequential_table(rows)
    got = _snapshot_dict(spark, out)
    assert got == want
    assert len(got) > 0

    # emission volume: one row per applied change, exactly the log length
    assert spark.read.parquet(out).count() == len(rows)

    # aggregate parity with the batch q182 (live/tombstoned counts and
    # the DECIMAL-exact live total, same doubles so same decimal sum)
    from fluvii_spark.queries import registry

    batch = registry()["q182_cdc_apply"].fn(spark, sf_dir).first()
    live = [v for op, v, _ in got.values() if op == "upsert"]
    dead = [1 for op, _, _ in got.values() if op == "delete"]
    assert len(live) == batch["live_keys"]
    assert len(dead) == batch["tombstoned_keys"]
    total = sum(Decimal(str(v)).quantize(Decimal("0.000001")) for v in live)
    assert float(round(total, 2)) == batch["live_value_total"]


def test_streaming_cdc_restart_invariance(spark, sf_dir, tmp_path):
    rows = _changelog_rows(spark, sf_dir)
    full = _stage_ordered(spark, rows, str(tmp_path / "full"))
    files = sorted(os.listdir(full))
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    # phase 1 (copy2 preserves pinned mtimes — FileStreamSource orders by
    # (modTime, path))
    for f in files[: len(files) // 2]:
        shutil.copy2(os.path.join(full, f), os.path.join(staged, f))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run_to_parquet(spark, _read_stream(spark, staged), out, ck)
    # phase 2: rest of the files, SAME checkpoint
    for f in files[len(files) // 2 :]:
        shutil.copy2(os.path.join(full, f), os.path.join(staged, f))
    _run_to_parquet(spark, _read_stream(spark, staged), out, ck)
    assert _snapshot_dict(spark, out) == _sequential_table(rows)


def test_tombstone_revive_and_null_guards(spark, tmp_path):
    """A delete clears the value but is remembered (and emitted); a later
    upsert revives the key; NULL keys/ops are dropped, not applied."""
    rows = [
        (1, "2024-01-01 00:00:00", 1, "upsert", 10.5),
        (1, "2024-01-01 00:01:00", 2, "delete", None),
        (1, "2024-01-01 00:02:00", 3, "upsert", 2.25),
        (2, "2024-01-01 00:00:30", 4, "upsert", 7.0),
        (2, "2024-01-01 00:03:00", 5, "delete", None),
        (None, "2024-01-01 00:00:00", 6, "upsert", 99.0),
        (3, "2024-01-01 00:00:00", 7, None, 99.0),
    ]
    staged = str(tmp_path / "staged")
    spark.createDataFrame(
        rows, "user_id LONG, ts STRING, event_id LONG, op STRING, v DOUBLE"
    ).selectExpr(
        "user_id", "CAST(ts AS TIMESTAMP_NTZ) AS ts", "event_id", "op", "v"
    ).coalesce(1).write.parquet(staged)
    src = (
        spark.readStream.schema(
            "user_id LONG, ts TIMESTAMP_NTZ, event_id LONG, op STRING, v DOUBLE"
        )
        .parquet(staged)
    )
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    _run_to_parquet(spark, src, out, ck)

    ems = sorted(
        (r["user_id"], r["n_applied"], r["op"], r["v"])
        for r in spark.read.parquet(out).collect()
    )
    assert ems == [
        (1, 1, "upsert", 10.5),
        (1, 2, "delete", None),
        (1, 3, "upsert", 2.25),
        (2, 1, "upsert", 7.0),
        (2, 2, "delete", None),
    ]
    # the compacted table: key 1 revived, key 2 tombstoned (and dropped
    # from the default snapshot)
    snap = {
        r["user_id"]: (r["op"], r["v"])
        for r in cdc_snapshot(spark.read.parquet(out)).collect()
    }
    assert snap == {1: ("upsert", 2.25)}


# ---------------------------------------------------------------------------
# SCD2 fold twin (q126)
# ---------------------------------------------------------------------------


def _scd2_change_rows(spark, sf_dir) -> list[tuple]:
    """clicks → (user_id, ts, event_id, k) ordered — q126's change feed."""
    return [
        (r["user_id"], r["ts"], r["event_id"], r["k"])
        for r in (
            load_table(spark, sf_dir, "events")
            .filter(F.col("event_type") == "click")
            .select(
                "user_id",
                "ts",
                "event_id",
                F.get_json_object("props", "$.k").cast("bigint").alias("k"),
            )
            .orderBy("ts", "event_id")
            .collect()
        )
    ]


def _scd2_sequential(rows_with_ep) -> tuple[list, dict]:
    """Independent sequential fold → (closed versions, open state)."""
    state: dict = {}
    closed: list = []
    for u, ep, k in rows_with_ep:
        st = state.get(u)
        if st is None:
            state[u] = {"k": k, "from": ep, "ver": 1}
        elif k != st["k"]:
            closed.append((u, st["k"], st["from"], ep, st["ver"]))
            state[u] = {"k": k, "from": ep, "ver": st["ver"] + 1}
    return sorted(closed), state





def _run_scd2(spark, src, out: str, ck: str, flush_ms=None):
    from fluvii_spark.streaming.cdc import streaming_scd2_fold

    return (
        streaming_scd2_fold(src, idle_flush_ms=flush_ms)
        .writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", ck)
        .outputMode("append")
        .start()
    )


def _vkey(t: tuple) -> tuple:
    """None-safe sort key: valid_to_ep (pos 3) is NULL for open versions,
    and an open-flush checkpoint row can share (user, k, valid_from) with
    its later closed row — a plain tuple sort then compares None < int and
    raises. Open rows sort before their closed duplicate."""
    return (t[0], t[1], t[2], -1 if t[3] is None else t[3], t[4])


def _merge_versions(rows: list[tuple]) -> list[tuple]:
    """The dimension-sink MERGE keyed (user, version): a closed row
    (valid_to set) supersedes its open-flush checkpoint (valid_to NULL)."""
    best: dict = {}
    for u, k, vf, vt, ver in rows:
        cur = best.get((u, ver))
        if cur is None or (cur[3] is None and vt is not None):
            best[(u, ver)] = (u, k, vf, vt, ver)
    return sorted(best.values(), key=_vkey)


def _collect_scd2(spark, out: str) -> list[tuple]:
    return sorted(
        (
            (
                r["user_id"],
                r["k"],
                r["valid_from_ep"],
                r["valid_to_ep"],
                r["version"],
            )
            for r in spark.read.parquet(out).collect()
        ),
        key=_vkey,
    )


def test_streaming_scd2_matches_sequential_and_q126(spark, sf_dir, tmp_path):
    rows = _scd2_change_rows(spark, sf_dir)
    eps = [
        (u, int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000), k)
        for u, ts, _e, k in rows
    ]
    closed_want, open_state = _scd2_sequential(eps)
    staged = _stage_ordered(spark, rows, str(tmp_path), SCD2_ROW_SCHEMA)
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    # idle flush emits every open tail once the stream drains, so the
    # emission log becomes the COMPLETE version history. NO
    # processAllAvailable here: ProcessingTimeTimeout keeps the engine
    # running timer batches forever, so pAA never unblocks — poll the
    # sink instead (the test_idle_flush pattern)
    q = _run_scd2(spark, _read_stream(spark, staged), out, ck, flush_ms=1500)
    want_total = len(closed_want) + len(open_state)
    deadline = time.time() + 180
    while time.time() < deadline:
        try:
            if len(_merge_versions(_collect_scd2(spark, out))) >= want_total:
                break
        except Exception:  # noqa: BLE001 — sink not materialized yet
            pass
        time.sleep(0.5)
    q.stop()

    # a version flushed mid-stream (key idle > flush_ms between files) and
    # closed later holds TWO rows for (key, version): the NULL-valid_to
    # checkpoint and the closed row — apply the MERGE a dimension sink
    # runs (closed row wins) before comparing
    got = _merge_versions(_collect_scd2(spark, out))
    tails = sorted(
        (u, st["k"], st["from"], None, st["ver"])
        for u, st in open_state.items()
    )
    assert got == sorted(closed_want + tails, key=_vkey)
    assert len(closed_want) > 0 and len(tails) > 0

    # q126 parity: the open (valid_to NULL) version per key is the current
    # one; its ordinal is the key's version count
    from fluvii_spark.queries import registry

    batch = {
        r["user_id"]: (
            r["n_versions"],
            r["current_k"],
            int(
                r["current_from"]
                .replace(tzinfo=timezone.utc)
                .timestamp()
                * 1_000_000
            ),
        )
        for r in registry()["q126_scd2_versions"].fn(spark, sf_dir).collect()
    }
    stream_current = {
        u: (ver, k, vf) for u, k, vf, vt, ver in got if vt is None
    }
    assert stream_current == batch


def test_streaming_scd2_restart_invariance(spark, sf_dir, tmp_path):
    rows = _scd2_change_rows(spark, sf_dir)
    eps = [
        (u, int(ts.replace(tzinfo=timezone.utc).timestamp() * 1_000_000), k)
        for u, ts, _e, k in rows
    ]
    closed_want, _ = _scd2_sequential(eps)
    full = _stage_ordered(
        spark, rows, str(tmp_path / "full"), SCD2_ROW_SCHEMA
    )
    files = sorted(os.listdir(full))
    staged = str(tmp_path / "staged")
    os.makedirs(staged)
    for f in files[: len(files) // 2]:
        shutil.copy2(os.path.join(full, f), os.path.join(staged, f))
    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    q = _run_scd2(spark, _read_stream(spark, staged), out, ck)
    q.processAllAvailable()
    q.stop()
    for f in files[len(files) // 2 :]:
        shutil.copy2(os.path.join(full, f), os.path.join(staged, f))
    q = _run_scd2(spark, _read_stream(spark, staged), out, ck)
    q.processAllAvailable()
    q.stop()
    # no flush: the emission log is exactly the CLOSED version history
    assert _collect_scd2(spark, out) == closed_want


def test_keyed_schema_rejects_colliding_key():
    """A key_col colliding with a fold output column must fail loudly at
    build time, not silently corrupt the output schema (review r7; moved
    to streaming/state.py in r8 so the funnel shares the guard)."""
    import pytest as _pytest

    from fluvii_spark.streaming.state import keyed_schema

    assert keyed_schema("doc_id", "op STRING, v DOUBLE").startswith(
        "doc_id LONG, op"
    )
    # a non-LONG key is an explicit parameter, not a silent assumption
    assert keyed_schema("doc", "op STRING", key_type="STRING").startswith(
        "doc STRING, op"
    )
    with _pytest.raises(ValueError):
        keyed_schema("v", "op STRING, v DOUBLE, n_applied LONG")
    with _pytest.raises(ValueError):
        keyed_schema("k", "k LONG, valid_from_ep LONG")
    # the funnel's fixed columns are now behind the same guard
    with _pytest.raises(ValueError):
        keyed_schema("stage", "stage_idx INT, stage STRING, reached_ep LONG")


def test_keyed_schema_parameterized_types():
    """ADVICE r8: the collision guard must split the DDL on TOP-LEVEL
    commas only — commas inside DECIMAL(10,2) / MAP<STRING,LONG> /
    STRUCT<...> are type syntax, not column separators, so they can
    neither hide a real collision nor fake one from a type fragment."""
    import pytest

    from fluvii_spark.streaming.state import _ddl_column_names, keyed_schema

    ddl = "amount DECIMAL(10,2), m MAP<STRING,LONG>, s STRUCT<a:INT,b:INT>"
    assert _ddl_column_names(ddl) == ["amount", "m", "s"]
    # no false collision from '2)' / 'LONG>' fragments
    out = keyed_schema("user_id", ddl)
    assert out.startswith("user_id LONG, amount DECIMAL(10,2)")
    # real collision behind a parameterized neighbor is still caught
    with pytest.raises(ValueError):
        keyed_schema("m", ddl)
