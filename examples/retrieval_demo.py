#!/usr/bin/env python
"""Retrieval-stack demo: the ANN ladder (brute force → single-bucket LSH →
multi-probe LSH → IVF) on the embeddings table, plus BM25 term search over
the documents corpus.

Run: python examples/retrieval_demo.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluvii_spark import get_session, load_tables  # noqa: E402
from fluvii_spark.operators.similarity import (  # noqa: E402
    brute_force_topk,
    ivf_topk,
    lsh_topk,
    lsh_topk_multiprobe,
)
from fluvii_spark.queries import registry  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("retrieval-demo")
    spark.sparkContext.setLogLevel("ERROR")
    emb = load_tables(spark, sf_dir).embeddings

    k, qid = 5, 0
    exact = brute_force_topk(emb, query_id=qid, k=k).collect()
    truth = [r["vec_id"] for r in exact]
    print(f"exact top-{k} for vec {qid}: {truth}")

    ladder = [
        ("lsh (1 bucket)", lambda: lsh_topk(emb, query_id=qid, dims=64, k=k)),
        (
            "lsh multiprobe (4 buckets)",
            lambda: lsh_topk_multiprobe(emb, query_id=qid, dims=64, k=k, probes=3),
        ),
        ("ivf (probe 4/8)", lambda: ivf_topk(emb, query_id=qid, k=k)),
    ]
    for name, fn in ladder:
        t0 = time.perf_counter()
        got = [r["vec_id"] for r in fn().collect()]
        dt = time.perf_counter() - t0
        recall = len(set(got) & set(truth)) / k
        print(f"{name:28s} recall@{k} {recall:.2f}  ({dt:.2f}s)  {got}")

    print("\nBM25 top documents for terms ('spark', 'hash', 'window'):")
    registry()["q117_bm25_search"].fn(spark, sf_dir).show(10, truncate=False)


if __name__ == "__main__":
    main()
