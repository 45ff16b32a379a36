"""Persist-memo lifecycle: a long-lived session sweeping many datasets must
not accumulate persisted frames (VERDICT r5 "Next round" #7).

Every memo family (`queries/llm.py` dedup chains, `relational_ext8.py`
graph/basket relations, `llm4.py` k-means assignment) follows the
evict-then-insert `_memo_swap` contract: at most ONE persisted entry per
family, the evicted entry unpersisted. This test sweeps three distinct
datasets through every family in one session and asserts both the
per-family single-entry invariant and that the JVM's persisted-RDD count
stays flat instead of growing per dataset.
"""

from __future__ import annotations

import shutil

from fluvii_spark.io.readers import TABLES


def _persisted_rdd_count(spark) -> int:
    return int(spark.sparkContext._jsc.getPersistentRDDs().size())


def _all_memo_caches():
    from fluvii_spark.queries import llm, llm4, relational_ext8

    return {
        "ngram_stats": llm._NGRAM_STATS_CACHE,
        "simhash": llm._SIMHASH_CACHE,
        "pairs": llm._PAIRS_CACHE,
        "clusters": llm._CLUSTERS_CACHE,
        "km_assign": llm4._KM_ASSIGN_CACHE,
        "edges": relational_ext8._EDGES_CACHE,
        "order_brands": relational_ext8._OB_CACHE,
    }


def _sweep(spark, sf_dir: str) -> None:
    """Build + materialize every memoized relation for one dataset."""
    from fluvii_spark.queries import llm, llm4, relational_ext8

    llm.doc_ngram_stats(spark, sf_dir).count()
    llm.doc_simhash(spark, sf_dir).count()
    llm.doc_dedup_pairs(spark, sf_dir).count()
    llm.doc_dedup_clusters(spark, sf_dir).count()
    llm4._kmeans_assignment(spark, sf_dir).count()
    relational_ext8._copurchase_edges(spark, sf_dir).count()
    relational_ext8._order_brands(spark, sf_dir).count()


def test_memo_sweep_is_bounded(spark, sf_dir, tmp_path):
    # three distinct dataset paths (distinct memo keys) with identical
    # tiny content — the lifecycle under test is keying, not data
    datasets = []
    for i in range(3):
        d = tmp_path / f"ds{i}"
        d.mkdir()
        for t in TABLES:
            shutil.copy(f"{sf_dir}/{t}.parquet", d / f"{t}.parquet")
        datasets.append(str(d))

    counts_after = []
    for ds in datasets:
        _sweep(spark, ds)
        counts_after.append(_persisted_rdd_count(spark))
        caches = _all_memo_caches()
        for name, cache in caches.items():
            assert len(cache) == 1, (
                f"memo family {name!r} holds {len(cache)} entries after a "
                f"sweep — evict-then-insert contract broken"
            )
            (key,) = cache.keys()
            assert key[1] == ds, f"{name!r} memo kept a stale dataset key"

    # flat, not growing: each sweep evicts+unpersists the prior dataset's
    # frames, so dataset #3 must not hold more persisted RDDs than #1.
    # (Other session-scoped persists may pre-exist; growth is the signal.)
    assert counts_after[2] <= counts_after[0], (
        f"persisted-RDD count grew across dataset sweeps: {counts_after} — "
        f"a memo family is leaking evicted persists"
    )
