#!/usr/bin/env python
"""Per-query bench trend: adjudicate regressions between two bench JSONs.

The shared host swings identical-code walls 2-3x (documented in
FIXTURES.md), so a single round-over-round delta can't distinguish noise
from a real regression by eye. This tool diffs two ``BENCH_LOCAL_r*.json``
artifacts (the committed local runs; the driver's ``BENCH_r*.json`` wraps
its payload differently and has no per-query map) and flags movers:
queries slower than ``--threshold`` x (default 1.5) AND above ``--floor``
seconds (default 1.0) in the newer run — the same bar VERDICT r4 applied
by hand to q42.

Usage:
    python tools/bench_trend.py BENCH_LOCAL_r4.json BENCH_LOCAL_r5.json \
        [--out BENCH_TREND_r5.md]

Exit code is 0 either way (the report is evidence, not a gate — movers
need a human/judge call against the documented host noise).
"""

from __future__ import annotations

import argparse
import json
import os


def load(path: str) -> dict:
    with open(path) as f:
        d = json.load(f)
    if "queries" not in d:
        raise SystemExit(f"{path}: no 'queries' map — not a bench artifact")
    return d


def trend(prev: dict, cur: dict, threshold: float, floor: float) -> dict:
    pq, cq = prev["queries"], cur["queries"]
    shared = sorted(set(pq) & set(cq))
    rows = []
    for name in shared:
        a, b = float(pq[name]), float(cq[name])
        ratio = (b / a) if a > 0 else float("inf")
        rows.append((name, a, b, ratio))
    movers = [
        r for r in rows if r[3] >= threshold and r[2] >= floor
    ]
    improved = [r for r in rows if r[3] <= 1 / threshold and r[1] >= floor]
    # mix-adjusted signals (VERDICT r7 "What's wrong" #3): the raw
    # per-query wall shifts whenever a round ADDS a slow query, so report
    # shared-query aggregates alongside it — same query set both sides.
    ratios = sorted(r[3] for r in rows)
    median_ratio = (
        ratios[len(ratios) // 2]
        if len(ratios) % 2
        else (ratios[len(ratios) // 2 - 1] + ratios[len(ratios) // 2]) / 2
    ) if ratios else None
    return {
        "shared": shared,
        "added": sorted(set(cq) - set(pq)),
        "removed": sorted(set(pq) - set(cq)),
        "rows": rows,
        "movers": sorted(movers, key=lambda r: -r[3]),
        "improved": sorted(improved, key=lambda r: r[3]),
        "median_ratio": median_ratio,
        "shared_prev_total": sum(r[1] for r in rows),
        "shared_cur_total": sum(r[2] for r in rows),
    }


def _load_str(artifact: dict) -> str:
    """Render the per-pass loadavg field (r9 ask #4) when the artifact
    carries it — the context that makes the host-noise call mechanical."""
    loads = artifact.get("loadavg")
    if not loads:
        return "not recorded"
    if isinstance(loads, dict):  # streaming artifacts: one dict per run
        loads = [loads]
    return "; ".join(
        f"pass{i}: {d.get('before_1m')}→{d.get('after_1m')} (1m)"
        for i, d in enumerate(loads, 1)
    )


def render(prev_path, cur_path, prev, cur, t, threshold, floor) -> str:
    lines = [
        f"# Bench trend: {os.path.basename(prev_path)} → "
        f"{os.path.basename(cur_path)}",
        "",
        f"Wall: {prev.get('value')}s → {cur.get('value')}s "
        f"({prev.get('n_queries')} → {cur.get('n_queries')} queries; "
        f"per-query {prev.get('wall_per_query')} → "
        f"{cur.get('wall_per_query')}).",
        f"Host loadavg — prev: {_load_str(prev)}; now: {_load_str(cur)}. "
        f"On this 32-cpu box a 1m load ≳ 4 during a pass marks a noisy "
        f"window: expect the MEDIAN to move, and adjudicate only "
        f"beyond-median movers.",
        f"Shared queries compared: {len(t['shared'])}; "
        f"added {len(t['added'])}, removed {len(t['removed'])}.",
        (
            f"Mix-adjusted (same {len(t['shared'])} queries both sides): "
            f"total {t['shared_prev_total']:.1f}s → "
            f"{t['shared_cur_total']:.1f}s, median per-query ratio "
            f"{t['median_ratio']:.3f}. The raw per-query wall above moves "
            f"whenever a round adds or removes queries — judge trends on "
            f"the shared-set numbers."
            if t["median_ratio"] is not None
            else "No shared queries — mix-adjusted trend unavailable."
        ),
        "",
        f"## Movers (≥{threshold}× slower AND ≥{floor}s now)",
        "",
    ]
    if t["movers"]:
        lines += ["| query | prev s | now s | ratio |", "|---|---|---|---|"]
        lines += [
            f"| {n} | {a:.2f} | {b:.2f} | {r:.2f}× |"
            for n, a, b, r in t["movers"]
        ]
        lines += [
            "",
            "Adjudicate against the documented 2-3× host noise: a mover is "
            "REAL only if it reproduces across a quiet-window re-run or its "
            "plan changed (check PLANS.md diff for the query).",
        ]
    else:
        lines.append("None.")
    lines += ["", f"## Improved (≥{threshold}× faster from ≥{floor}s)", ""]
    if t["improved"]:
        lines += ["| query | prev s | now s | ratio |", "|---|---|---|---|"]
        lines += [
            f"| {n} | {a:.2f} | {b:.2f} | {r:.2f}× |"
            for n, a, b, r in t["improved"]
        ]
    else:
        lines.append("None.")
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
    ap.add_argument("--floor", type=float, default=1.0)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()
    prev, cur = load(args.prev), load(args.cur)
    t = trend(prev, cur, args.threshold, args.floor)
    md = render(args.prev, args.cur, prev, cur, t, args.threshold, args.floor)
    if args.out:
        with open(args.out, "w") as f:
            f.write(md)
        print(f"wrote {args.out}: {len(t['movers'])} movers, "
              f"{len(t['improved'])} improved over {len(t['shared'])} shared")
    else:
        print(md)


if __name__ == "__main__":
    main()
