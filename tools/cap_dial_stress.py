#!/usr/bin/env python
"""Emission-cap dial under TRUE growth (VERDICT r8 ask #4).

``cap_pairs_per_doc`` carries a recall@cap=1.0 proof
(test_cap_pairs_recall_at_cap) but r8 shipped no SCALE measurement. This
tool makes the 100 TB claim concrete on the g=G grown corpus (the
tools/growth_bench.py corpus, where every base document gains G
perturbed near-dup replicas, so the TRUE near-dup pair count grows ~G²
while the corpus grows G×):

- run q120's operator (``prefix_filter_jaccard_pairs``, threshold 0.7,
  3-shingles) UNCAPPED on the base corpus and on the grown corpus →
  the pair counts whose ratio shows the quadratic output growth;
- run it CAPPED (``max_pairs_per_doc=CAP``) on the grown corpus → the
  count that must be ≤ 2·CAP·n_docs (each surviving pair is ranked by at
  least one of its two endpoints) — output linear in the corpus again.

Writes one JSON block intended to be merged into ``STRESS_BENCH_r{N}.json``
under ``"cap_dial"``.

Usage::

    python tools/cap_dial_stress.py [--g 10] [--cap 2]
        [--grown-dir /tmp/fluvii_growth_g10] [--out -]

Env: SPARK_GRAFT_SF_DIR (base corpus, default /root/testdata/sf0.1).
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluvii_spark.operators.dedup import prefix_filter_jaccard_pairs  # noqa: E402
from fluvii_spark.session import get_session  # noqa: E402


def _docs(spark, d):
    return spark.read.parquet(os.path.join(d, "documents.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--g", type=int, default=10)
    ap.add_argument("--cap", type=int, default=2)
    ap.add_argument("--grown-dir", default=None)
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    base_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    grown_dir = args.grown_dir or f"/tmp/fluvii_growth_g{args.g}"
    if not os.path.exists(os.path.join(grown_dir, "_FLUVII_GROWTH_OK")):
        raise SystemExit(
            f"{grown_dir}: no verified grown corpus — run tools/growth_bench.py"
            f" --g {args.g} --build-only first"
        )

    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "cap-dial-stress", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )

    def run(d: str, cap: int | None) -> tuple[int, float]:
        t0 = time.time()
        n = prefix_filter_jaccard_pairs(
            _docs(spark, d), threshold=0.7, n=3, max_pairs_per_doc=cap
        ).count()
        return n, round(time.time() - t0, 2)

    n_docs_base = _docs(spark, base_dir).count()
    n_docs_grown = _docs(spark, grown_dir).count()
    base_pairs, base_sec = run(base_dir, None)
    grown_pairs, grown_sec = run(grown_dir, None)
    capped_pairs, capped_sec = run(grown_dir, args.cap)

    bound = 2 * args.cap * n_docs_grown
    out = {
        "operator": "prefix_filter_jaccard_pairs(threshold=0.7, n=3)",
        "g": args.g,
        "cap": args.cap,
        "n_docs": {"base": n_docs_base, "grown": n_docs_grown},
        "pairs": {
            "base_uncapped": base_pairs,
            "grown_uncapped": grown_pairs,
            "grown_capped": capped_pairs,
        },
        "wall_sec": {
            "base_uncapped": base_sec,
            "grown_uncapped": grown_sec,
            "grown_capped": capped_sec,
        },
        # uncapped output grows ~g² (each base doc's g perturbed replicas
        # are a g-clique of Jaccard>=0.7 near-dups); the cap rebinds it to
        # <= 2*cap*n_docs — linear in the corpus
        "uncapped_growth_x": (
            round(grown_pairs / base_pairs, 2) if base_pairs else None
        ),
        "cap_bound_2_cap_n": bound,
        "cap_bound_holds": capped_pairs <= bound,
    }
    payload = json.dumps({"cap_dial": out}, indent=2, sort_keys=True)
    if args.out == "-":
        print(payload)
    else:
        with open(args.out, "w") as f:
            f.write(payload + "\n")
    spark.stop()


if __name__ == "__main__":
    main()
