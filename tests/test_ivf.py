"""IVF ANN: recall against brute force, candidate pruning, determinism."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators.similarity import brute_force_topk, ivf_assignments, ivf_topk


def test_ivf_assignments_cover_corpus(spark, sf_dir):
    e = load_tables(spark, sf_dir).embeddings
    assigned, centroids = ivf_assignments(e, n_lists=8, n_iters=1)
    assert centroids.shape[0] == 8
    n = e.count()
    assert assigned.count() == n
    lists = assigned.groupBy("list_id").count().collect()
    assert sum(r["count"] for r in lists) == n
    assert all(0 <= r["list_id"] < 8 for r in lists)


def test_ivf_topk_recall_and_pruning(spark, sf_dir):
    e = load_tables(spark, sf_dir).embeddings
    exact = {
        r["vec_id"] for r in brute_force_topk(e, query_id=0, k=5).collect()
    }
    got_rows = ivf_topk(e, query_id=0, k=5, n_lists=8, n_probe=4).collect()
    got = {r["vec_id"] for r in got_rows}
    assert len(got_rows) == 5
    # cosines sorted descending with id tie-break
    cos = [r["cosine"] for r in got_rows]
    assert cos == sorted(cos, reverse=True)
    # recall@5 with half the lists probed
    assert len(exact & got) >= 3, (exact, got)


def test_ivf_deterministic(spark, sf_dir):
    e = load_tables(spark, sf_dir).embeddings
    a = [tuple(r) for r in ivf_topk(e, 0, k=5, n_lists=8, n_probe=2).collect()]
    b = [tuple(r) for r in ivf_topk(e, 0, k=5, n_lists=8, n_probe=2).collect()]
    assert a == b


def test_multiprobe_recall_dominates_single_bucket(spark, sf_dir):
    """Probing the flip buckets can only ADD candidates, so for any query
    the multi-probe top-k is at least as good (k-th cosine no smaller) as
    the single-bucket top-k, and approaches brute force from below."""
    from pyspark.sql import functions as F

    from fluvii_spark.io.readers import load_table
    from fluvii_spark.operators.similarity import (
        brute_force_topk,
        lsh_topk,
        lsh_topk_multiprobe,
    )

    emb = load_table(spark, sf_dir, "embeddings")
    for qid in (0, 7, 23):
        single = lsh_topk(emb, query_id=qid, dims=64, k=5).collect()
        multi = lsh_topk_multiprobe(
            emb, query_id=qid, dims=64, k=5, probes=3
        ).collect()
        brute = brute_force_topk(emb, query_id=qid, k=5).collect()
        if single:
            assert multi[min(len(multi), len(single)) - 1]["cosine"] >= (
                single[min(len(multi), len(single)) - 1]["cosine"] - 1e-12
            )
        # every multiprobe hit is a true neighbor score (subset of exact ranking)
        brute_scores = {r["vec_id"]: r["cosine"] for r in brute}
        top1 = brute[0]["cosine"]
        for r in multi:
            assert r["cosine"] <= top1 + 1e-12
            if r["vec_id"] in brute_scores:
                assert abs(r["cosine"] - brute_scores[r["vec_id"]]) < 1e-9
