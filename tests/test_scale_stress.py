"""Opt-in scale stress (set FLUVII_SPARK_STRESS=1): a 10×-replicated corpus
through the dedup/similarity pipelines. Catches quadratic candidate blow-ups
and shuffle explosions that sf0.001 can't — the shapes that break at 100 TB.

Replication: union the documents/embeddings tables K times with shifted ids
(near-dup structure is preserved per replica, and every replica's text is
identical to its source → exact-dup groups of size K appear — a harsher
candidate load than the raw table)."""

from __future__ import annotations

import os
import time

import pytest
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators.dedup import (
    embedding_near_dup_pairs,
    exact_dedup,
    minhash_lsh_pairs,
    simhash_pairs,
)

STRESS = os.environ.get("FLUVII_SPARK_STRESS") == "1"
pytestmark = pytest.mark.skipif(
    not STRESS, reason="set FLUVII_SPARK_STRESS=1 to run scale stress"
)

K = 10


def _replicated_docs(spark, sf_dir):
    d = load_tables(spark, sf_dir).documents
    n = d.count()
    reps = [
        d.select(
            (F.col("doc_id") + i * n * 10).alias("doc_id"), "text"
        )
        for i in range(K)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out, n


def test_minhash_lsh_scales_linearly_in_candidates(spark, sf_dir):
    docs, n = _replicated_docs(spark, sf_dir)
    t0 = time.time()
    pairs = minhash_lsh_pairs(docs, threshold=0.5)
    n_pairs = pairs.count()
    wall = time.time() - t0
    # every replica pair of the same source doc is an exact dup → at least
    # C(K,2) * n_base_near_dup_groups pairs; and it must finish sanely
    assert n_pairs >= (K * (K - 1) // 2), n_pairs
    assert wall < 300, f"minhash-LSH blew up: {wall:.0f}s for {docs.count()} docs"


def test_exact_dedup_group_sizes(spark, sf_dir):
    docs, n = _replicated_docs(spark, sf_dir)
    groups = exact_dedup(docs, ["text"], "doc_id")
    sizes = groups.groupBy("n_copies").count().collect()
    by_size = {r["n_copies"]: r["count"] for r in sizes}
    # every base doc now has >= K exact copies (more if the base had dups)
    assert all(s >= K for s in by_size)


def test_embedding_gemm_bounded_shuffle(spark, sf_dir):
    e = load_tables(spark, sf_dir).embeddings
    n = e.count()
    reps = [
        e.select((F.col("vec_id") + i * n * 10).alias("vec_id"), "embedding")
        for i in range(K)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    t0 = time.time()
    n_pairs = embedding_near_dup_pairs(big, threshold=0.95, n_blocks=16).count()
    wall = time.time() - t0
    # identical replicas ⇒ each base vector forms C(K,2) cosine-1.0 pairs
    assert n_pairs >= n * (K * (K - 1) // 2)
    assert wall < 300, f"embedding GEMM blew up: {wall:.0f}s"


def test_simhash_pairs_complete_under_replication(spark, sf_dir):
    docs, n = _replicated_docs(spark, sf_dir)
    t0 = time.time()
    cnt = simhash_pairs(docs, max_hamming=0).count()
    wall = time.time() - t0
    assert cnt >= n * (K * (K - 1) // 2)
    assert wall < 300, f"simhash blew up: {wall:.0f}s"


def test_asof_join_under_replication(spark, sf_dir):
    """As-of join over a 10x events table: the union+window strategy's
    shuffle volume grows linearly (one exchange), and per-key ordering
    stays correct — spot-check one user's carried value."""
    from fluvii_spark.operators.asof import asof_join

    ev = load_tables(spark, sf_dir).events
    n = ev.count()
    reps = [
        ev.select(
            (F.col("event_id") + i * n * 10).alias("event_id"),
            "user_id",
            "ts",
            "event_type",
            "value",
        )
        for i in range(K)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    left = big.filter("event_type = 'purchase'").select("user_id", "ts", "event_id")
    right = (
        big.filter("event_type = 'click'")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    t0 = time.time()
    out = asof_join(left, right, ["user_id"], "ts", "ts", right_payload=["click_id"])
    got = out.count()
    assert got == left.count()  # left-join semantics: every left row kept
    assert time.time() - t0 < 120


def test_sequence_packing_sharded_parallelism(spark, sf_dir):
    """Packing a 10x corpus with shard_mod: group count (= max parallelism)
    grows by the shard factor and no bin exceeds capacity except
    single-oversize-document bins."""
    from fluvii_spark.operators.packing import pack_sequences

    docs, n = _replicated_docs(spark, sf_dir)
    sized = docs.select(
        F.lit("all").alias("lang"),
        "doc_id",
        F.size(F.split("text", " ")).cast("long").alias("n_toks"),
    )
    packed = pack_sequences(
        sized, group_cols=["lang"], order_col="doc_id", size_col="n_toks",
        capacity=512, shard_mod=64,
    )
    fills = (
        packed.groupBy((F.col("doc_id") % 64).alias("shard"), "bin")
        .agg(F.sum("n_toks").alias("fill"), F.count("*").alias("n_docs"))
    )
    bad = fills.filter("fill > 512 AND n_docs > 1").count()
    assert bad == 0
    assert packed.count() == K * n


def test_ngram_df_cut_bounds_candidates(spark, sf_dir):
    """The max_doc_freq df-cut must hold the candidate join's mass down on a
    hot-shingle corpus: Σ df² (the shared-shingle join's pair mass) shrinks
    by orders of magnitude, while exact-dup replica pairs — which share ALL
    their shingles, including rare ones — are still found."""
    from fluvii_spark.operators.dedup import ngram_jaccard_pairs, word_shingles

    docs, n = _replicated_docs(spark, sf_dir)
    cap = 3 * K  # replicas alone give every shingle df >= K

    # real corpora have boilerplate (headers/footers/licenses) on a large
    # fraction of documents — the exact hot-key case the df-cut exists for.
    # Append it by doc parity (stable across replicas, so replica copies
    # stay exact duplicates of each other).
    docs = docs.withColumn(
        "text",
        F.when(
            F.col("doc_id") % 2 == 0,
            F.concat(
                F.col("text"),
                F.lit(
                    " standard boilerplate footer shared across this entire corpus"
                ),
            ),
        ).otherwise(F.col("text")),
    )

    sh = word_shingles(docs, "doc_id", "text", 3)
    dfc = sh.groupBy("shingle").agg(F.count("*").alias("df"))
    mass = dfc.agg(
        F.max("df").alias("max_df"),
        F.sum(F.col("df") * F.col("df")).alias("all_mass"),
        F.sum(
            F.when(F.col("df") <= cap, F.col("df") * F.col("df")).otherwise(0)
        ).alias("cut_mass"),
    ).collect()[0]
    # the corpus DOES have hot shingles (the quadratic risk is the hottest
    # join key, not total mass): the cut bounds per-shingle fan-out from
    # max_df² pair candidates down to ≤ cap², and removes real mass
    assert mass["max_df"] > 10 * cap, dict(mass.asDict())
    assert mass["cut_mass"] < mass["all_mass"], dict(mass.asDict())
    hottest_uncut = mass["max_df"] ** 2
    assert cap**2 < hottest_uncut / 100  # ≥100× smaller hottest key

    t0 = time.time()
    pairs = ngram_jaccard_pairs(docs, threshold=0.95, max_doc_freq=cap)
    n_pairs = pairs.count()
    wall = time.time() - t0
    # replica copies of each base doc are exact dups (jaccard 1.0)
    assert n_pairs >= (K * (K - 1) // 2), n_pairs
    assert wall < 300, f"df-cut jaccard blew up: {wall:.0f}s"


def test_containment_shares_jaccard_chain_under_replication(spark, sf_dir):
    """The shared pair-stats stage feeds both scores; replication multiplies
    exact-dup pairs, and containment of an exact dup is exactly 1.0."""
    from fluvii_spark.operators.dedup import (
        containment_from_stats,
        jaccard_from_stats,
        ngram_pair_stats,
    )

    docs, n = _replicated_docs(spark, sf_dir)
    stats = ngram_pair_stats(docs, max_doc_freq=None).persist()
    t0 = time.time()
    cont = containment_from_stats(stats, threshold=0.99)
    n_cont = cont.count()
    jac = jaccard_from_stats(stats, threshold=0.99)
    n_jac = jac.count()
    wall = time.time() - t0
    stats.unpersist()
    # exact replicas: containment = jaccard = 1.0, so both see >= C(K,2)·n
    assert n_cont >= n * (K * (K - 1) // 2), n_cont
    assert n_cont >= n_jac  # containment can only widen the pair set
    assert wall < 300, f"containment chain blew up: {wall:.0f}s"


def test_bucket_representatives_under_replication(spark, sf_dir):
    """10× the vectors: still one representative per multi-member bucket,
    and the relational plan keeps per-task state bounded (no pandas groups
    at all — just grouped sums)."""
    from fluvii_spark.operators.similarity import bucket_representatives

    emb = load_tables(spark, sf_dir).embeddings
    n = emb.count()
    reps_input = [
        emb.select((F.col("vec_id") + i * n * 10).alias("vec_id"), "embedding")
        for i in range(K)
    ]
    big = reps_input[0]
    for r in reps_input[1:]:
        big = big.unionByName(r)
    t0 = time.time()
    out = bucket_representatives(big, dims=64).persist()
    n_buckets = out.count()
    wall = time.time() - t0
    assert n_buckets >= 1
    # replicas of one vector share its bucket, so every surfaced bucket has
    # >= K members and the member sum can't exceed the corpus
    agg = out.agg(
        F.min("n_members").alias("mn"), F.sum("n_members").alias("sm")
    ).collect()[0]
    out.unpersist()
    assert agg["mn"] >= K
    assert agg["sm"] <= K * n
    assert wall < 300, f"bucket_representatives blew up: {wall:.0f}s"


def test_skyline_local_prune_contracts(spark, sf_dir):
    """The salted local skyline prune must contract a replicated part table
    to a survivor set orders of magnitude smaller than the input before the
    global pass — the property that keeps the second (unsalted) window
    cheap at any scale."""
    from fluvii_spark.queries.relational_ext5 import _skyline_prune

    p = load_tables(spark, sf_dir).part.select(
        "p_partkey", "p_size", "p_retailprice"
    )
    n = p.count()
    reps = [
        p.select(
            (F.col("p_partkey") + i * n * 10).alias("p_partkey"),
            "p_size",
            "p_retailprice",
        )
        for i in range(K)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)
    local = _skyline_prune(
        big.withColumn(
            "salt", F.pmod(F.xxhash64("p_partkey"), F.lit(16))
        ),
        ["salt"],
    ).drop("salt")
    n_local = local.count()
    # duplicated frontier points all survive (K copies each), but the
    # survivor set must still be a tiny fraction of the replicated input
    assert n_local <= n, f"local prune kept {n_local} of {n * K}"
    frontier = _skyline_prune(local, []).count()
    assert 0 < frontier <= n_local


def test_edit_distance_banding_bounds_candidates(spark, sf_dir):
    """q134's length-band equi-join must generate candidates linear in the
    replication factor (each replica only pairs within its lang/band
    neighborhood), never the quadratic all-pairs of the oracle."""
    t = load_tables(spark, sf_dir).documents
    n = t.count()
    reps = [
        t.select(
            (F.col("doc_id") + i * n * 10).alias("doc_id"),
            "lang",
            "n_chars",
            "text",
        )
        for i in range(K)
    ]
    big = reps[0]
    for r in reps[1:]:
        big = big.unionByName(r)

    band = (F.col("n_chars") / 32).cast("bigint")
    docs = big.select(
        "doc_id", "lang", "n_chars",
        F.substring("text", 1, 64).alias("prefix"),
    )
    left = docs.withColumn(
        "bkey", F.explode(F.array(band - 1, band, band + 1))
    )
    right = (
        docs.withColumn("bkey", band)
        .withColumnRenamed("doc_id", "doc_id_b")
        .withColumnRenamed("n_chars", "n_chars_b")
        .withColumnRenamed("prefix", "prefix_b")
    )
    cands = (
        left.join(right, ["lang", "bkey"])
        .filter(
            (F.col("doc_id") < F.col("doc_id_b"))
            & (F.abs(F.col("n_chars") - F.col("n_chars_b")) <= 32)
        )
        .count()
    )
    # all-pairs would be ~(K*n)^2/2 per lang; banding must stay well under
    total = K * n
    assert cands < total * total / 20, (cands, total)
    t0 = time.time()
    pairs = (
        left.join(right, ["lang", "bkey"])
        .filter(
            (F.col("doc_id") < F.col("doc_id_b"))
            & (F.abs(F.col("n_chars") - F.col("n_chars_b")) <= 32)
            & (F.levenshtein("prefix", "prefix_b", 8) >= 0)
        )
        .count()
    )
    dt = time.time() - t0
    # every replica pair of the same source doc is distance 0 → present
    assert pairs >= K * (K - 1) // 2 * n // 2
    assert dt < 120, f"banded edit-distance took {dt:.0f}s at 10x"


def test_grouped_exact_quantiles_under_replication(spark, sf_dir):
    """r3's distributed order statistics at 10x: range-repartition +
    local-rank + broadcast-offset must stay correct (vs the built-in
    per-group percentile) and finish sanely on the replicated relation —
    no single-task window, no per-group value buffer."""
    from fluvii_spark.operators.ranking import grouped_exact_quantiles

    li = load_tables(spark, sf_dir).lineitem.select(
        "l_returnflag", "l_extendedprice"
    )
    reps = li
    for _ in range(K - 1):
        reps = reps.unionByName(li)
    ps = [0.1, 0.5, 0.9]
    t0 = time.time()
    got = {
        (r["l_returnflag"], r["p"]): r["quantile"]
        for r in grouped_exact_quantiles(
            reps, ["l_returnflag"], "l_extendedprice", ps, num_partitions=64
        ).collect()
    }
    wall = time.time() - t0
    pts = ", ".join(f"{p}D" for p in ps)
    want = {
        (r["l_returnflag"], p): v
        for r in reps.groupBy("l_returnflag")
        .agg(
            F.expr(
                f"transform(percentile(l_extendedprice, array({pts})),"
                " b -> round(b, 6))"
            ).alias("q")
        )
        .collect()
        for p, v in zip(ps, r["q"])
    }
    assert got == want
    assert wall < 300, f"grouped quantiles blew up: {wall:.0f}s"


def test_sweepline_max_concurrent_under_replication(spark, sf_dir, tmp_path):
    """q122's two-level sweep-line at 10x: replicating every event K times
    multiplies concurrency exactly by K (identical intervals overlap
    themselves), giving an exact oracle; and the plan must hold up — the
    per-(type,hour-bucket) local pass keeps window partitions bounded, the
    global pass runs on the aggregated per-bucket relation only."""
    from fluvii_spark.queries import registry

    base = {
        (r["event_type"]): r["max_concurrent"]
        for r in registry()["q122_max_concurrent"].fn(spark, sf_dir).collect()
    }
    ev = load_tables(spark, sf_dir).events
    reps = ev
    for _ in range(K - 1):
        reps = reps.unionByName(ev)
    rep_dir = str(tmp_path / "rep_sf")
    reps.write.parquet(rep_dir + "/events.parquet")
    t0 = time.time()
    got = {
        (r["event_type"]): r["max_concurrent"]
        for r in registry()["q122_max_concurrent"].fn(spark, rep_dir).collect()
    }
    wall = time.time() - t0
    assert got == {k: K * v for k, v in base.items()}
    assert wall < 300, f"sweep-line blew up: {wall:.0f}s"


def test_prefix_family_under_replication(spark, sf_dir):
    """The prefix family (distributed_running_sum / _running_max) at 10x:
    the range-repartition + broadcast-prefix construction must stay exact
    against Spark's global-window reference on the replicated relation,
    and finish sanely — no single-task window over the big input."""
    from pyspark.sql import Window as W

    from fluvii_spark.operators.ranking import (
        distributed_running_max,
        distributed_running_sum,
    )

    # micros-within-day keeps the 10x global cumsum inside LONG range
    ev = load_tables(spark, sf_dir).events.select(
        "event_id",
        F.expr(
            "unix_micros(cast(ts as timestamp)) % 86400000000"
        ).alias("t"),
    )
    reps = ev.withColumn("event_id", F.col("event_id") * 100)
    for i in range(1, K):
        reps = reps.unionByName(
            ev.withColumn("event_id", F.col("event_id") * 100 + i)
        )
    t0 = time.time()
    got = {
        r["event_id"]: (r["cum"], r["hm"])
        for r in distributed_running_sum(
            reps, ["event_id"], "t", num_partitions=64, out_col="cum"
        )
        .join(
            distributed_running_max(
                reps, ["event_id"], "t", num_partitions=64, out_col="hm"
            ).select("event_id", "hm"),
            "event_id",
        )
        .collect()
    }
    wall = time.time() - t0
    w = W.orderBy("event_id").rowsBetween(W.unboundedPreceding, W.currentRow)
    want = {
        r["event_id"]: (r["cum"], r["hm"])
        for r in reps.withColumn("cum", F.sum("t").over(w))
        .withColumn("hm", F.max("t").over(w))
        .collect()
    }
    assert got == want
    assert wall < 300, f"prefix family blew up: {wall:.0f}s"


def test_shingle_novelty_under_replication(spark, sf_dir, tmp_path):
    """q155 at 10x with an EXACT oracle: replicas carry identical text with
    shifted doc_ids, so every shingle's first owner stays the replica-0
    document — novel counts are invariant under replication while totals
    multiply exactly by K. Also guards the doc-granularity join rewrite:
    wall must stay sane because the exploded shingle relation is aggregated
    (twice) but never re-joined at shingle granularity."""
    from fluvii_spark.queries import registry

    q = registry()["q155_shingle_novelty"].fn
    base = {
        r["lang"]: (r["n_docs"], r["total_shingles"], r["novel_shingles"])
        for r in q(spark, sf_dir).collect()
    }
    rep_dir = str(tmp_path / "rep_sf")
    _replicated_docs_with_lang(spark, sf_dir).write.parquet(
        rep_dir + "/documents.parquet"
    )
    t0 = time.time()
    got = {
        r["lang"]: (r["n_docs"], r["total_shingles"], r["novel_shingles"])
        for r in q(spark, rep_dir).collect()
    }
    wall = time.time() - t0
    assert got == {
        lang: (K * nd, K * tot, nov) for lang, (nd, tot, nov) in base.items()
    }
    assert wall < 300, f"novelty blew up at {K}x: {wall:.0f}s"


def _replicated_docs_with_lang(spark, sf_dir):
    d = load_tables(spark, sf_dir).documents.select("doc_id", "lang", "text")
    n = d.count()
    reps = [
        d.select(
            (F.col("doc_id") + i * n * 10).alias("doc_id"), "lang", "text"
        )
        for i in range(K)
    ]
    out = reps[0]
    for r in reps[1:]:
        out = out.unionByName(r)
    return out
