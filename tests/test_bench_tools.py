"""Unit coverage for the bench/growth tooling fixed or added in r11:
the stream-trend zero-rate guard (ADVICE r10 #2), the directory
stat-fingerprint child-mtime fold (ADVICE r10 #1), and the shared LSH
table-count solve that tools/growth_recall.py measures."""
from __future__ import annotations

import math
import os
import time


def test_stream_trend_zero_rate_skipped_not_inf():
    """A pipeline whose CURRENT rate is 0 must be skipped like a missing
    rate — an inf ratio in the list poisons median_ratio and makes the
    'movers beyond median' threshold filter everything out."""
    from tools.bench_stream_trend import trend

    def rec(rate):
        return {
            "processed_rows_per_sec": rate,
            "wall_sec": 1.0,
            "state_rows": 5,
        }

    prev = {"pipelines": {"a": rec(100), "b": rec(200), "c": rec(300)}}
    cur = {"pipelines": {"a": rec(0), "b": rec(100), "c": rec(300)}}
    t = trend(prev, cur, threshold=1.5)
    assert t["skipped_no_rate"] == ["a"]
    assert all(math.isfinite(r[3]) for r in t["rows"])
    assert t["median_ratio"] == 1.5  # median of {2.0, 1.0}
    # and the zero-PREV direction still works (ratio 0 < threshold)
    t2 = trend(cur, prev, threshold=1.5)
    assert "a" in t2["skipped_no_rate"] or all(
        math.isfinite(r[3]) for r in t2["rows"]
    )


def test_stat_fingerprint_sees_partition_subdir_rewrite(tmp_path):
    """A partitioned layout rebuilt by rewriting files INSIDE a partition
    subdirectory leaves the parent dir's own mtime unchanged; the
    fingerprint must still move (it folds in immediate-child mtimes, and
    rewriting inside date=X bumps date=X's mtime)."""
    from fluvii_spark.operators.stats import _stat_fingerprint

    root = tmp_path / "t.parquet"
    sub = root / "date=2024-01-01"
    sub.mkdir(parents=True)
    f = sub / "part-0.parquet"
    f.write_bytes(b"a" * 64)
    fp1 = _stat_fingerprint(str(root))
    assert fp1 is not None
    # pin the parent dir's mtime so only the child-mtime fold can differ.
    # A REBUILD deletes + recreates part files, which bumps the partition
    # subdir's mtime (the covered case); a byte-level in-place overwrite
    # that adds/removes nothing is the documented residual needing
    # clear_parquet_rows_memo().
    st = os.stat(root)
    time.sleep(0.01)
    f.unlink()
    f.write_bytes(b"b" * 64)
    os.utime(root, ns=(st.st_atime_ns, st.st_mtime_ns))
    fp2 = _stat_fingerprint(str(root))
    assert fp2 != fp1
    # missing path stays un-memoizable
    assert _stat_fingerprint(str(tmp_path / "nope")) is None


def test_lsh_tables_solve_reaches_target_recall():
    """The shared solve must actually deliver the bound it promises:
    recall = 1-(1-p^planes)^tables >= target at the threshold cosine,
    with tables == 1 when a single table already suffices."""
    from fluvii_spark.operators.dedup import lsh_tables_for_target_recall

    for threshold in (0.4, 0.6, 0.9, 0.99):
        for planes in (4, 8):
            for target in (0.5, 0.9):
                n = lsh_tables_for_target_recall(threshold, planes, target)
                p = 1.0 - math.acos(threshold) / math.pi
                pt = p**planes
                achieved = 1 - (1 - pt) ** n
                assert n >= 1
                if n < 128:  # the cap is an honesty bound, not a promise
                    assert achieved >= target - 1e-12, (
                        threshold,
                        planes,
                        target,
                        n,
                        achieved,
                    )
                if pt >= target:
                    assert n == 1
    # near-dup regime at cosine 0.99: p^8 = 0.692, so one table covers a
    # 0.5 target but a 0.9 target needs exactly two
    assert lsh_tables_for_target_recall(0.99, 8, 0.5) == 1
    assert lsh_tables_for_target_recall(0.99, 8, 0.9) == 2
