#!/usr/bin/env python
"""Streaming-bench trend: the bench_trend.py discipline applied to
``BENCH_STREAM_r*.json`` (VERDICT r8 ask #5).

Streaming walls on the shared host swing the same 2-3× the batch bench
does, and the r8 artifact showed it: keyed_fold dropped 25.6k → 18.5k
rows/s with ZERO code change in the fold. A single round-over-round
number can't separate that from a real regression, so this tool diffs
two streaming artifacts per PIPELINE (the stable unit — pipeline sets
rarely change) on processed_rows_per_sec (the engine-reported rate,
excluding trigger-wait overhead) and wall_sec, and reports the
median ratio: a real regression moves one pipeline against the median;
host noise moves the median itself.

State ROW counts are compared EXACTLY — state_rows is a deterministic
function of the corpus, so any drift there is a real semantic change.
state_bytes is RocksDB snapshot layout (SST packing varies run to run),
so it is flagged only beyond a 5% tolerance.

Usage::

    python tools/bench_stream_trend.py BENCH_STREAM_r8.json \
        BENCH_STREAM_r9.json [--threshold 1.5] [--out BENCH_STREAM_TREND_r9.md]
"""
from __future__ import annotations

import argparse
import json
import os


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "pipelines" not in d:
        raise SystemExit(f"{path}: no 'pipelines' map — not a streaming artifact")
    return d


def trend(prev: dict, cur: dict, threshold: float) -> dict:
    pp, cp = prev["pipelines"], cur["pipelines"]
    shared = sorted(set(pp) & set(cp))
    rows, state_drift, skipped = [], [], []
    for name in shared:
        a, b = pp[name], cp[name]
        va = a.get("processed_rows_per_sec") or a.get("rows_per_sec")
        vb = b.get("processed_rows_per_sec") or b.get("rows_per_sec")
        if va is None or vb is None:
            # a pipeline record without a rate key (ADVICE r9 #3) is
            # flagged, not a crash — its state checks still run below
            skipped.append(name)
        ra = float(va) if va is not None else None
        rb = float(vb) if vb is not None else None
        if ra is not None and rb is not None:
            if rb <= 0:
                # a zero current rate would put inf into the ratio list and
                # poison median_ratio (threshold × inf filters every mover
                # out — ADVICE r10 #2); treat it like a missing rate
                skipped.append(name)
            else:
                # rate ratio < 1 means SLOWER now (mirror wall: >1 = worse)
                ratio = ra / rb
                rows.append((name, ra, rb, ratio, a["wall_sec"], b["wall_sec"]))
        if a.get("state_rows") != b.get("state_rows"):
            state_drift.append(
                (name, "state_rows", a.get("state_rows"), b.get("state_rows"))
            )
        sa, sb = a.get("state_bytes") or 0, b.get("state_bytes") or 0
        if sa and abs(sb - sa) > 0.05 * sa:
            state_drift.append((name, "state_bytes", sa, sb))
    ratios = sorted(r[3] for r in rows)
    median_ratio = (
        ratios[len(ratios) // 2]
        if len(ratios) % 2
        else (ratios[len(ratios) // 2 - 1] + ratios[len(ratios) // 2]) / 2
    ) if ratios else None
    movers = [r for r in rows if r[3] >= threshold]
    improved = [r for r in rows if r[3] <= 1 / threshold]
    return {
        "shared": shared,
        "added": sorted(set(cp) - set(pp)),
        "removed": sorted(set(pp) - set(cp)),
        "rows": rows,
        "movers": sorted(movers, key=lambda r: -r[3]),
        "improved": sorted(improved, key=lambda r: r[3]),
        "median_ratio": median_ratio,
        "state_drift": state_drift,
        "skipped_no_rate": skipped,
    }


def _load(artifact: dict) -> str:
    """Loadavg context (r9 ask #4) when the artifact carries it."""
    d = artifact.get("loadavg")
    if not d:
        return "not recorded"
    return f"{d.get('before_1m')}→{d.get('after_1m')} (1m)"


def render(prev_path, cur_path, prev, cur, t, threshold) -> str:
    lines = [
        f"# Streaming bench trend: {os.path.basename(prev_path)} → "
        f"{os.path.basename(cur_path)}",
        "",
        f"Total wall: {prev.get('value')}s → {cur.get('value')}s over "
        f"{len(prev['pipelines'])} → {len(cur['pipelines'])} pipelines "
        f"(rows={cur.get('rows')}, files_per_trigger="
        f"{cur.get('files_per_trigger')}).",
        (
            f"Host loadavg — prev: {_load(prev)}; now: {_load(cur)}. "
            f"1m load ≳ 4 on this 32-cpu box marks a noisy window: the "
            f"median moves, and only beyond-median movers are real."
        ),
        (
            f"Median per-pipeline rate ratio (prev/cur, >1 = slower now): "
            f"{t['median_ratio']:.3f} over {len(t['rows'])} shared rated "
            f"pipelines. A median far from 1.0 is HOST noise moving "
            f"everything; a single pipeline far from the median is a real "
            f"mover — adjudicate those against a quiet-window re-run."
            if t["median_ratio"] is not None
            else "No shared pipelines."
        ),
        "",
        "| pipeline | prev rows/s | now rows/s | prev/now | prev wall | now wall |",
        "|---|---|---|---|---|---|",
    ]
    for n, ra, rb, r, wa, wb in t["rows"]:
        lines.append(
            f"| {n} | {ra:.0f} | {rb:.0f} | {r:.2f}× | {wa:.1f}s | {wb:.1f}s |"
        )
    lines += ["", f"## Movers beyond median (rate ≥{threshold}× slower)", ""]
    med = t["median_ratio"] or 1.0
    real = [r for r in t["movers"] if r[3] >= threshold * med]
    if real:
        lines += [f"- {n}: {ra:.0f} → {rb:.0f} rows/s ({r:.2f}× vs median {med:.2f})"
                  for n, ra, rb, r, _, _ in real]
    else:
        lines.append(
            "None — every pipeline moves with the median (shared-host "
            "noise), no pipeline-specific regression."
        )
    lines += [
        "",
        "## State drift (state_rows exact; state_bytes beyond 5% — "
        "RocksDB SST packing wobbles a few KB run-to-run)",
        "",
    ]
    if t["state_drift"]:
        lines += [f"- {n}.{k}: {a} → {b}" for n, k, a, b in t["state_drift"]]
    else:
        lines.append(
            "None — state_rows identical per pipeline, state_bytes within "
            "storage-layout tolerance."
        )
    if t["skipped_no_rate"]:
        lines += [
            "",
            "Skipped (no rate key in one artifact): "
            + ", ".join(t["skipped_no_rate"]),
        ]
    if t["added"]:
        lines += ["", f"Added: {', '.join(t['added'])}"]
    if t["removed"]:
        lines += ["", f"Removed: {', '.join(t['removed'])}"]
    return "\n".join(lines) + "\n"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("prev")
    ap.add_argument("cur")
    ap.add_argument("--threshold", type=float, default=1.5)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    prev, cur = load(args.prev), load(args.cur)
    t = trend(prev, cur, args.threshold)
    md = render(args.prev, args.cur, prev, cur, t, args.threshold)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
        med = (
            f"{t['median_ratio']:.3f}"
            if t["median_ratio"] is not None
            else "n/a (no shared rated pipelines)"
        )
        print(
            f"wrote {args.out}: median ratio "
            f"{med}, {len(t['movers'])} raw movers, "
            f"state drift {len(t['state_drift'])}"
        )
    else:
        print(md)


if __name__ == "__main__":
    main()
