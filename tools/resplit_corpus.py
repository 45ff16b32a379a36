#!/usr/bin/env python
"""Rewrite a verified grown corpus as MULTI-SPLIT parquet (VERDICT r11 #1).

The g=10 growth corpus (tools/growth_bench.py) writes ~one file per
replica (10-11 files/table). At sf0.1-derived sizes Spark packs those
into a handful of scan splits, so a duplicated scan branch still
parallelizes inside one job and "fewer scans" restructures measure as
losses locally even though they are strict wins at 100 TB (five such
rejections are on record in OPTIMIZATION_r11.md). Rewriting each grown
entity table into >= 2x-cores files makes every scan plan ~cores tasks
under stock session confs (maxSplitBytes = max(openCost, bytes/
defaultParallelism) packs ~2 files per split here), so a duplicated
branch now costs a full extra pass of real tasks — the at-scale cost
model, locally.

Rows are IDENTICAL to the input corpus (round-robin repartition only
relocates rows); the marker file is copied with a ``splits`` note so
growth tools accept the directory via --grown-dir.

Usage::

    python tools/resplit_corpus.py [--src /tmp/fluvii_growth_g10]
        [--out /tmp/fluvii_growth_g10_ms] [--splits 64]
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluvii_spark.io.readers import TABLES  # noqa: E402
from fluvii_spark.session import apply_runtime_confs, get_session  # noqa: E402

FIXED_DIMS = ("region", "nation")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/tmp/fluvii_growth_g10")
    ap.add_argument("--out", default="/tmp/fluvii_growth_g10_ms")
    ap.add_argument("--splits", type=int, default=64)
    args = ap.parse_args()

    marker_src = os.path.join(args.src, "_FLUVII_GROWTH_OK")
    if not os.path.exists(marker_src):
        raise SystemExit(f"{args.src}: no verified grown corpus")
    with open(marker_src) as fh:
        meta = json.load(fh)

    marker_out = os.path.join(args.out, "_FLUVII_GROWTH_OK")
    if os.path.exists(marker_out):
        with open(marker_out) as fh:
            have = json.load(fh)
        if have.get("splits") == args.splits and have.get("g") == meta.get("g"):
            print(f"multi-split corpus exists: {args.out}", file=sys.stderr)
            return
    os.makedirs(args.out, exist_ok=True)

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "resplit-corpus", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    for t in TABLES:
        df = spark.read.parquet(os.path.join(args.src, f"{t}.parquet"))
        if t not in FIXED_DIMS:
            df = df.repartition(args.splits)
        df.write.mode("overwrite").parquet(os.path.join(args.out, f"{t}.parquet"))
        n = len(
            [
                f
                for f in os.listdir(os.path.join(args.out, f"{t}.parquet"))
                if f.startswith("part-")
            ]
        )
        print(f"resplit {t}: {n} files", file=sys.stderr)

    with open(marker_out, "w") as fh:
        fh.write(json.dumps({**meta, "splits": args.splits, "src": args.src}))
    print(f"multi-split corpus ready: {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
