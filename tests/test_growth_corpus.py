"""The TRUE-growth corpus builder (tools/growth_bench.py) is evidence
infrastructure: STRESS_BENCH_r7.json's growth exponents are only
meaningful if the grown corpus actually is TPC-H-faithful growth. This
suite builds a G=2 grown corpus of sf0.001 and proves the properties
that distinguish it from disjoint replication:

- fixed dimensions stay fixed (region/nation row counts unchanged) while
  entity tables scale exactly G×;
- no foreign-key orphans anywhere (lineitem→orders/part/supplier,
  orders→customer) — the FK remap never leaves the grown domain;
- the join graph is CONNECTED: replica-0 orders reference customers in
  EVERY replica (disjoint replication would keep them in replica 0);
- per-key fan-out distributions are preserved (orders per customer keeps
  its base mean — more entities, same entity sizes);
- per-nation fan-in grows G× (the fixed-dim consequence);
- texts and embeddings are perturbed per replica (all distinct — near-dup
  load, not G-sized exact-dup clusters);
- the hot-key variant redirects ~the requested fraction of lineitem rows
  to supplier key 1.
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tools.growth_bench import build_grown

G = 2


@pytest.fixture(scope="module")
def grown_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("growth"))
    build_grown(spark, sf_dir, out, G)
    return out


@pytest.fixture(scope="module")
def hot_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("growth_hot"))
    build_grown(spark, sf_dir, out, G, skew_frac=0.2)
    return out


def _t(spark, d, t):
    return spark.read.parquet(os.path.join(d, f"{t}.parquet"))


def test_fixed_dims_fixed_entities_scale(spark, sf_dir, grown_dir):
    for t in ["region", "nation"]:
        assert _t(spark, grown_dir, t).count() == _t(spark, sf_dir, t).count()
    for t in ["customer", "supplier", "part", "orders", "lineitem",
              "events", "documents", "embeddings"]:
        assert (
            _t(spark, grown_dir, t).count()
            == G * _t(spark, sf_dir, t).count()
        ), t


def test_no_fk_orphans(spark, grown_dir):
    pairs = [
        ("orders", "o_custkey", "customer", "c_custkey"),
        ("lineitem", "l_orderkey", "orders", "o_orderkey"),
        ("lineitem", "l_partkey", "part", "p_partkey"),
        ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
    ]
    for ft, fk, pt, pk in pairs:
        orphans = (
            _t(spark, grown_dir, ft)
            .join(
                _t(spark, grown_dir, pt),
                F.col(fk) == F.col(pk),
                "left_anti",
            )
            .count()
        )
        assert orphans == 0, (ft, fk)


def test_join_graph_is_connected_across_replicas(spark, sf_dir, grown_dir):
    """Replica-0 orders must reference customers in EVERY replica — the
    property disjoint replication cannot have."""
    max_cust = _t(spark, sf_dir, "customer").agg(
        F.max("c_custkey")
    ).first()[0]
    max_ord = _t(spark, sf_dir, "orders").agg(F.max("o_orderkey")).first()[0]
    reps = (
        _t(spark, grown_dir, "orders")
        .filter(F.col("o_orderkey") <= max_ord)
        .select(
            (F.col("o_custkey") / (max_cust + 1)).cast("int").alias("rep")
        )
        .distinct()
        .count()
    )
    assert reps == G, f"replica-0 orders reach only {reps} of {G} replicas"


def test_fanout_distributions_preserved(spark, sf_dir, grown_dir):
    base = (
        _t(spark, sf_dir, "orders")
        .groupBy("o_custkey")
        .count()
        .agg(F.avg("count"))
        .first()[0]
    )
    grown = (
        _t(spark, grown_dir, "orders")
        .groupBy("o_custkey")
        .count()
        .agg(F.avg("count"))
        .first()[0]
    )
    # uniform remap keeps the MEAN fan-out (variance widens slightly)
    assert abs(grown - base) / base < 0.25, (base, grown)
    # and per-nation fan-in grows exactly Gx (every customer keeps its
    # nation; only custkeys shift)
    b = dict(
        _t(spark, sf_dir, "customer")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    g = dict(
        _t(spark, grown_dir, "customer")
        .groupBy("c_nationkey")
        .count()
        .collect()
    )
    assert g == {k: G * v for k, v in b.items()}


def test_texts_and_embeddings_perturbed(spark, sf_dir, grown_dir):
    n_docs = _t(spark, sf_dir, "documents").count()
    assert (
        _t(spark, grown_dir, "documents").select("text").distinct().count()
        > n_docs
    )
    n_vecs = _t(spark, sf_dir, "embeddings").count()
    assert (
        _t(spark, grown_dir, "embeddings")
        .select(F.col("embedding").cast("string"))
        .distinct()
        .count()
        == G * n_vecs
    )
    # dtype preserved: perturbation must not widen float -> double
    assert (
        dict(_t(spark, grown_dir, "embeddings").dtypes)["embedding"]
        == dict(_t(spark, sf_dir, "embeddings").dtypes)["embedding"]
    )


def test_hot_variant_redirects_requested_fraction(spark, hot_dir):
    frac = (
        _t(spark, hot_dir, "lineitem")
        .agg(F.avg((F.col("l_suppkey") == 1).cast("double")))
        .first()[0]
    )
    assert 0.15 < frac < 0.25, frac


def test_marker_validates_g_and_base(spark, sf_dir, grown_dir):
    """Reusing a corpus built with different parameters must fail loudly
    (the stress_bench ADVICE r6 class)."""
    with pytest.raises(SystemExit):
        build_grown(spark, sf_dir, grown_dir, G + 1)


@pytest.fixture(scope="module")
def planted_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("growth_planted"))
    build_grown(spark, sf_dir, out, G, plant=True)
    return out


def test_plant_boilerplate_share_is_g_invariant(spark, sf_dir, planted_dir):
    """VERDICT r9 ask #3(a): the planted template hits every 13th BASE
    document, so its per-source df share is exactly the base share in
    EVERY replica — the property that keeps q251's ≥5% threshold
    reachable at any g."""
    from tools.growth_bench import PLANT_BP, PLANT_BP_EVERY

    docs = _t(spark, planted_dir, "documents")
    base_docs = _t(spark, sf_dir, "documents").count()
    planted = docs.filter(F.col("text").contains(PLANT_BP.strip()))
    # exact count: G x Σ_sources ⌈n_source / 13⌉ (every-13th WITHIN each
    # source stripe)
    import math

    base_per_source = [
        r["n"]
        for r in _t(spark, sf_dir, "documents")
        .groupBy("source")
        .agg(F.count("*").alias("n"))
        .collect()
    ]
    expected = G * sum(
        math.ceil(n / PLANT_BP_EVERY) for n in base_per_source
    )
    assert planted.count() == expected
    # per (source, replica) share identical across replicas
    off = base_docs
    per = {
        (r["source"], r["rep"]): r["n"]
        for r in planted.groupBy(
            "source", (F.col("doc_id") / off).cast("int").alias("rep")
        )
        .agg(F.count("*").alias("n"))
        .collect()
    }
    by_source: dict[str, set[int]] = {}
    for (src, _rep), n in per.items():
        by_source.setdefault(src, set()).add(n)
    assert all(len(v) == 1 for v in by_source.values()), by_source
    # n_chars stays consistent with the appended text
    bad = docs.filter(F.length("text") != F.col("n_chars")).count()
    assert bad == 0


def test_plant_rare_tail_df_is_two_per_replica(spark, planted_dir):
    """VERDICT r9 ask #3(b): each replica-specific rare token appears in
    EXACTLY 2 documents (the {500k, 500k+1} base pair), so its char-4-grams
    sit under q218's df-cut at any g — a replica-invariant token would
    cross the cut at g ≥ 10 and re-vacuate the smoke row."""
    docs = _t(spark, planted_dir, "documents")
    toks = (
        docs.select(
            F.explode(F.split("text", " ")).alias("tok"), "doc_id"
        )
        .filter(F.col("tok").rlike(r"^q\d+g\d+v$"))
        .groupBy("tok")
        .agg(F.count_distinct("doc_id").alias("df"))
        .collect()
    )
    assert toks, "rare tokens must be planted"
    assert all(r["df"] == 2 for r in toks), toks
    # one token family per replica
    reps = {r["tok"].split("g")[0] for r in toks}
    assert reps == {f"q{i}" for i in range(G)}


def test_planted_queries_non_vacuous(spark, planted_dir):
    """The point of the plant: q251's threshold stage must see the planted
    shingles at ≥5% per-source share, and q218 must return rows with the
    planted rare-gram pairs among its candidates.

    At this tiny test scale (25 base docs/source) NATURAL shingles still
    carry 8-12% shares and alphabetically outrank the planted ones in
    q251's top-10 — exactly the small-corpus degeneracy that inverts at
    g=10 where natural shares dilute below 5% and only the plant remains
    (proven by the per-round g=10 smoke artifact). So this test pins the
    MECHANISM: every (source, replica) planted share clears the 5% bar."""
    from fluvii_spark.operators.dedup import word_shingles
    from fluvii_spark.queries import registry

    docs = _t(spark, planted_dir, "documents")
    sh = word_shingles(docs, "doc_id", "text", n=3, distinct=True)
    src = docs.select("doc_id", "source")
    nd = src.groupBy("source").agg(F.count_distinct("doc_id").alias("n_docs"))
    planted_share = (
        sh.filter(F.col("shingle") == "scan table join")
        .join(src, "doc_id")
        .groupBy("source")
        .agg(F.count("*").alias("df"))
        .join(nd, "source")
        .select("source", (F.col("df") / F.col("n_docs")).alias("share"))
        .collect()
    )
    assert len(planted_share) == 20  # every source sees the template
    assert all(r["share"] >= 0.05 for r in planted_share), planted_share
    # q251 itself runs green on the planted corpus (top-10 membership is
    # the g=10 artifact's claim, not this scale's)
    assert reg_rows(registry(), "q251_boilerplate_shingles", spark, planted_dir) > 0
    # q218: the planted pair (base docs 0,1 per replica) shares rare grams
    q218 = registry()["q218_char_ngram_jaccard"].fn(spark, planted_dir)
    assert q218.count() > 0


def reg_rows(reg, name, spark, d) -> int:
    return len(reg[name].fn(spark, d).collect())


def test_emission_cap_bounds_near_dup_output(spark, sf_dir, grown_dir):
    """The max_pairs_per_doc dial (VERDICT r7 ask #5 / r8 ask #4): on the
    grown corpus every base document gains G perturbed near-dup replicas,
    so uncapped near-dup pair output grows ~G^2 per clique; the cap must
    (a) bound output at 2*cap*n_docs, (b) be a subset of the uncapped
    pairs, (c) keep every document's own strongest pair (recall@cap=1
    per doc by the either-endpoint rule)."""
    from fluvii_spark.operators.dedup import prefix_filter_jaccard_pairs

    docs = _t(spark, grown_dir, "documents")
    n_docs = docs.count()
    cap = 1
    uncapped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_jaccard_pairs(
            docs, threshold=0.5, n=3
        ).collect()
    }
    capped = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in prefix_filter_jaccard_pairs(
            docs, threshold=0.5, n=3, max_pairs_per_doc=cap
        ).collect()
    }
    assert uncapped, "growth corpus must produce near-dup pairs"
    assert set(capped) <= set(uncapped)
    assert len(capped) <= 2 * cap * n_docs
    # recall@cap per doc: every doc that has any pair keeps its strongest
    best: dict[int, tuple] = {}
    for (a, b), j in uncapped.items():
        for doc, partner in ((a, b), (b, a)):
            cur = best.get(doc)
            # strongest = max jaccard, tie-break smallest partner id —
            # the operator's deterministic ordering
            cand = (-j, partner)
            if cur is None or cand < cur:
                best[doc] = cand
    for doc, (negj, partner) in best.items():
        pair = (min(doc, partner), max(doc, partner))
        assert pair in capped, (doc, pair)
