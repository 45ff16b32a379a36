#!/usr/bin/env python
"""Data-quality & drift audit demo: the round-4 analytics family end to end.

A training-data pipeline trusts its inputs only after auditing them. This
demo runs the engine's audit suite over the testdata star schema + event
stream and prints one compact report:

- referential integrity  (q174): orphan rows across five foreign keys;
- Benford deviation      (q173): leading-digit profile of order totals —
  synthetic/fraudulent amounts bend the curve;
- distribution drift     (q165): two-sample Kolmogorov-Smirnov distance
  between event-type value distributions, integer-exact;
- watermark planning     (q177): how many events arrive >1h/24h behind the
  event-time high watermark (distributed prefix-max over the ingest
  sequence) — the number that sizes `withWatermark` for the streaming twin;
- incremental soundness  (q176): 80/20 old/delta partial aggregates merged
  (counts, DECIMAL sums, KMV k-min union) vs a direct recompute, with the
  sketch_mergeable flag proving the delta path never needs full history.

Every one of these is driver-provable (duckdb-oracle hash-matched); this
demo just runs the same registered callables a user would.

Run: python examples/data_quality_audit_demo.py [sf_dir]
"""
from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluvii_spark.queries import registry  # noqa: E402
from fluvii_spark.session import get_session  # noqa: E402

AUDITS = [
    ("referential integrity", "q174_referential_audit"),
    ("Benford first-digit", "q173_benford_deviation"),
    ("KS value drift", "q165_ks_distance"),
    ("watermark lateness", "q177_late_data_report"),
    ("incremental rollup proof", "q176_incremental_rollup"),
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("fluvii-spark-audit-demo")
    spark.sparkContext.setLogLevel("ERROR")
    reg = registry()
    for title, name in AUDITS:
        print(f"\n=== {title} ({name}) ===")
        reg[name].fn(spark, sf_dir).show(12, truncate=False)


if __name__ == "__main__":
    main()
