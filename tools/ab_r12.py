#!/usr/bin/env python
"""Round-12 A/B harness: re-adjudicate r11's locally-rejected restructures
on the MULTI-SPLIT grown corpus (VERDICT r11 "Next round" #1).

Five restructures were proven oracle-equal in r11 but rejected on sf0.1
measurements whose single-row-group tables make duplicated scan branches
free (they parallelize inside one job). This tool carries the VARIANT
implementations, times committed-vs-variant INTERLEAVED on any corpus
(``--sf-dir``), and hash-checks the variant against the committed form
with the drive_contract canonicalizer before any timing is trusted.

Usage::

    python tools/ab_r12.py q137,q174,q197,q194,q253 \
        --sf-dir /tmp/fluvii_growth_g10_ms --passes 3 [--check] [--out f]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pandas as pd  # noqa: E402  (pandas_udf warm-up hints)
from pyspark.sql import DataFrame, SparkSession  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402

import fluvii_spark.operators.dedup as D  # noqa: E402
from contract_common import value_hash  # noqa: E402
from fluvii_spark.io.readers import load_tables  # noqa: E402
from fluvii_spark.queries import registry  # noqa: E402
from fluvii_spark.session import apply_runtime_confs, get_session  # noqa: E402


# --- variant implementations (each must be oracle-hash-equal to the
# committed query; --check enforces it on the target corpus) -------------


def q137_contraction(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-token set contraction instead of the vocab self-join (the r11
    change-#27 rejected form, verbatim from commit 3abba90^)."""
    t = load_tables(spark, sf_dir)
    lt = (
        t.documents.select(
            "lang", F.explode(F.split("text", " ")).alias("tok")
        )
        .dropDuplicates(["lang", "tok"])
        .localCheckpoint(eager=False)
    )
    sz = lt.groupBy("lang").agg(F.count("*").alias("n"))
    inter = (
        lt.groupBy("tok")
        .agg(F.sort_array(F.collect_set("lang")).alias("ls"))
        .select(
            F.explode(
                F.expr(
                    "flatten(transform(ls, (x, i) ->"
                    " transform(slice(ls, i + 2, size(ls)),"
                    " y -> struct(x as lang_a, y as lang_b))))"
                )
            ).alias("p")
        )
        .groupBy("p.lang_a", "p.lang_b")
        .agg(F.count("*").alias("n_common"))
        .select(F.col("lang_a"), F.col("lang_b"), "n_common")
    )
    sa = F.broadcast(
        sz.withColumnRenamed("lang", "lang_a").withColumnRenamed("n", "na")
    )
    sb = F.broadcast(
        sz.withColumnRenamed("lang", "lang_b").withColumnRenamed("n", "nb")
    )
    return (
        inter.join(sa, "lang_a")
        .join(sb, "lang_b")
        .select(
            "lang_a",
            "lang_b",
            F.col("n_common").cast("bigint").alias("n_common"),
            F.round(
                F.col("n_common").cast("double")
                / (F.col("na") + F.col("nb") - F.col("n_common")),
                6,
            ).alias("jaccard"),
        )
    )


def q174_single_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The three lineitem FK checks through ONE fact scan: chained left
    joins against unique-PK parent key projections, null parents counted
    in one aggregation (r11 change-#30 rejected form)."""
    t = load_tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_partkey", "l_suppkey")
    j = (
        li.join(
            t.orders.select(F.col("o_orderkey").alias("_po")),
            F.col("l_orderkey") == F.col("_po"),
            "left",
        )
        .join(
            t.part.select(F.col("p_partkey").alias("_pp")),
            F.col("l_partkey") == F.col("_pp"),
            "left",
        )
        .join(
            t.supplier.select(F.col("s_suppkey").alias("_ps")),
            F.col("l_suppkey") == F.col("_ps"),
            "left",
        )
    )
    li_checks = (
        j.agg(
            F.sum(F.when(F.col("_po").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("o_orders"),
            F.sum(F.when(F.col("_pp").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("o_part"),
            F.sum(F.when(F.col("_ps").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("o_supp"),
        )
        .select(
            F.explode(
                F.array(
                    F.struct(
                        F.lit("lineitem->orders").alias("fk"),
                        F.col("o_orders").alias("orphans"),
                    ),
                    F.struct(
                        F.lit("lineitem->part").alias("fk"),
                        F.col("o_part").alias("orphans"),
                    ),
                    F.struct(
                        F.lit("lineitem->supplier").alias("fk"),
                        F.col("o_supp").alias("orphans"),
                    ),
                )
            ).alias("x")
        )
        .select("x.fk", "x.orphans")
    )

    def orphans(child, ckey, parent, pkey, label):
        return (
            child.join(
                parent.select(F.col(pkey).alias(ckey)), ckey, "left_anti"
            )
            .agg(F.count("*").cast("bigint").alias("orphans"))
            .select(F.lit(label).alias("fk"), "orphans")
        )

    return (
        orphans(t.orders, "o_custkey", t.customer, "c_custkey",
                "orders->customer")
        .unionByName(li_checks)
        .unionByName(
            orphans(t.customer, "c_nationkey", t.nation, "n_nationkey",
                    "customer->nation")
        )
    )


def q197_single_pass(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-row explode of each lineitem row's three (key_col, key)
    memberships -> ONE grouped count (r11 change-#30 rejected form)."""
    t = load_tables(spark, sf_dir)
    m = t.lineitem.select(
        F.explode(
            F.array(
                F.struct(
                    F.lit("l_orderkey").alias("key_col"),
                    F.col("l_orderkey").alias("k"),
                ),
                F.struct(
                    F.lit("l_partkey").alias("key_col"),
                    F.col("l_partkey").alias("k"),
                ),
                F.struct(
                    F.lit("l_suppkey").alias("key_col"),
                    F.col("l_suppkey").alias("k"),
                ),
            )
        ).alias("m")
    ).select("m.key_col", "m.k")
    keys = m.groupBy("key_col", "k").agg(F.count("*").alias("c"))
    return keys.groupBy("key_col").agg(
        F.sum("c").cast("bigint").alias("n_rows"),
        F.count("*").cast("bigint").alias("n_distinct"),
        F.max("c").cast("bigint").alias("top_count"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias("top_share"),
        F.round(
            F.max("c").cast("double") * F.count("*") / F.sum("c"), 6
        ).alias("skew_ratio"),
    )


def q194_merged_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ONE checkpointed per-doc profile (16 minhash minima + the distinct
    shingle SET from the same explode) feeding band join, estimator and
    exact verify via a single cand>a>b chain (r11 rejected form (a))."""
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    docs = t.documents
    n_perms = len(D.MINHASH_PERMS)
    sh = D.word_shingles(
        fan_out_scan(docs), "doc_id", "text", 3, distinct=False
    )
    h = F.conv(F.substring(F.md5("shingle"), 1, 8), 16, 10).cast("long")
    aggs = [
        F.min((F.lit(a) * F.col("h") + F.lit(b)) % D.MINHASH_P).alias(
            f"mh{i}"
        )
        for i, (a, b) in enumerate(D.MINHASH_PERMS)
    ]
    prof = (
        sh.withColumn("h", h)
        .groupBy("doc_id")
        .agg(*aggs, F.collect_set("shingle").alias("_ss"))
        .localCheckpoint(eager=False)
    )
    cand = D.lsh_candidate_pairs(docs, wide=prof).localCheckpoint(
        eager=False
    )
    wa = prof.select(
        F.col("doc_id").alias("id_a"),
        *[F.col(f"mh{i}").alias(f"a{i}") for i in range(n_perms)],
        F.col("_ss").alias("_sa"),
    )
    wb = prof.select(
        F.col("doc_id").alias("id_b"),
        *[F.col(f"mh{i}").alias(f"b{i}") for i in range(n_perms)],
        F.col("_ss").alias("_sb"),
    )
    matches = sum(
        F.when(F.col(f"a{i}") == F.col(f"b{i}"), 1).otherwise(0)
        for i in range(n_perms)
    )
    n_int = F.size(F.array_intersect("_sa", "_sb")).cast("double")
    jac = F.when(
        F.size("_sa") + F.size("_sb") == n_int, F.lit(0.0)
    ).otherwise(n_int / (F.size("_sa") + F.size("_sb") - n_int))
    est = (matches / float(n_perms)).alias("_est")
    return (
        cand.join(wa, "id_a")
        .join(wb, "id_b")
        .select("id_a", "id_b", est, jac.alias("_jac"))
        .select(
            "id_a",
            "id_b",
            F.round("_est", 6).alias("est_jaccard"),
            F.round("_jac", 6).alias("exact_jaccard"),
            F.round(F.abs(F.col("_est") - F.col("_jac")), 6).alias(
                "abs_err"
            ),
        )
    )


def q253_no_checkpoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q253 with every localCheckpoint removed — the pre-r11 lineage
    (each sweep's median + join-back re-executes upstream, up to 2^4
    corpus joins). The r11 A/B was neutral locally; re-adjudicating on
    the multi-split corpus."""
    t = load_tables(spark, sf_dir)
    cells = (
        t.orders.join(
            t.customer, F.col("o_custkey") == F.col("c_custkey")
        )
        .join(
            F.broadcast(t.nation),
            F.col("c_nationkey") == F.col("n_nationkey"),
        )
        .groupBy(
            F.col("n_name").alias("nation"),
            (
                F.year("o_orderdate").cast("bigint") * 10
                + F.quarter("o_orderdate").cast("bigint")
            ).alias("qtr"),
        )
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,6)"))
            .cast("double")
            .alias("v")
        )
        .withColumn("re", F.lit(0.0))
        .withColumn("ce", F.lit(0.0))
    )

    def sweep(df, key, eff_col):
        med = df.groupBy(key).agg(
            F.percentile("v", F.lit(0.5)).alias("_m")
        )
        return (
            df.join(F.broadcast(med), key)
            .withColumn("v", F.col("v") - F.col("_m"))
            .withColumn(eff_col, F.col(eff_col) + F.col("_m"))
            .drop("_m")
        )

    out = cells
    for _ in range(2):
        out = sweep(out, "nation", "re")
        out = sweep(out, "qtr", "ce")
    return (
        out.select(
            "nation",
            "qtr",
            F.round("re", 6).alias("nation_effect"),
            F.round("ce", 6).alias("quarter_effect"),
            F.round("v", 6).alias("residual"),
        )
        .orderBy(F.abs(F.col("residual")).desc(), "nation", "qtr")
        .limit(15)
    )


def q230_persist_v(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q230 with the ranked input PERSISTED: repartitionByRange's range
    sampling re-executes its input, so the corpus lineitem-part join runs
    twice; persist makes the sampling job populate the cache and the
    shuffle map read it (r11 rejected a localCheckpoint variant locally;
    re-adjudicating with persist on the multi-split corpus)."""
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    v = (
        t.lineitem.join(
            t.part.select("p_partkey", "p_brand"),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .select(
            "p_brand",
            F.col("l_extendedprice").cast("double").alias("x"),
            "l_orderkey",
            "l_linenumber",
        )
        .persist()
    )
    ranked = distributed_row_number(
        v, ["p_brand", "x", "l_orderkey", "l_linenumber"], out_col="rnk"
    )
    grp = ranked.groupBy(F.col("p_brand").alias("_b")).agg(
        F.min("rnk").alias("base"), F.count("*").alias("n")
    )
    qs = (
        ranked.join(F.broadcast(grp), F.col("p_brand") == F.col("_b"))
        .groupBy("p_brand")
        .agg(
            F.max("n").alias("n"),
            F.max(
                F.when(
                    F.col("rnk")
                    == F.ceil(0.25 * F.col("n")) + F.col("base") - 1,
                    F.col("x"),
                )
            ).alias("q1"),
            F.max(
                F.when(
                    F.col("rnk")
                    == F.ceil(0.75 * F.col("n")) + F.col("base") - 1,
                    F.col("x"),
                )
            ).alias("q3"),
        )
    )
    f = qs.select(
        F.col("p_brand").alias("_fb"),
        "n",
        "q1",
        "q3",
        (F.col("q1") - 1.5 * (F.col("q3") - F.col("q1"))).alias("lo"),
        (F.col("q3") + 1.5 * (F.col("q3") - F.col("q1"))).alias("hi"),
    )
    return (
        ranked.join(F.broadcast(f), F.col("p_brand") == F.col("_fb"))
        .groupBy("p_brand", "n", "q1", "q3")
        .agg(
            F.count(
                F.when(
                    (F.col("x") < F.col("lo")) | (F.col("x") > F.col("hi")),
                    1,
                )
            )
            .cast("bigint")
            .alias("n_outliers")
        )
        .select(
            "p_brand",
            F.col("n").cast("bigint").alias("n_lines"),
            F.round("q1", 6).alias("q1"),
            F.round("q3", 6).alias("q3"),
            "n_outliers",
        )
    )


def q203_persist_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q203 with both score relations PERSISTED so each rank's range
    sampling reads the cache instead of re-running the cosine / token
    Jaccard folds."""
    from fluvii_spark.operators import similarity as S
    from fluvii_spark.operators.ranking import distributed_row_number

    t = load_tables(spark, sf_dir)
    emb = t.embeddings
    cq = emb.filter(F.col("vec_id") == 0).select(
        F.col("embedding").alias("qvec"),
        F.expr(S.norm_sql("embedding")).alias("_nq"),
    )
    cos_scored = (
        emb.filter(F.col("vec_id") != 0)
        .crossJoin(F.broadcast(cq))
        .select(
            F.col("vec_id").alias("id"),
            (
                -F.round(
                    F.expr(
                        S.cosine_hoisted_sql(
                            "embedding",
                            "qvec",
                            S.norm_sql("embedding"),
                            "_nq",
                        )
                    ),
                    6,
                )
            ).alias("neg_c"),
        )
        .persist()
    )
    cos_r = distributed_row_number(
        cos_scored, ["neg_c", "id"], out_col="r_cos"
    ).select("id", "r_cos")
    toks = t.documents.select(
        "doc_id", F.array_distinct(F.split("text", " ")).alias("dt")
    )
    tq = toks.filter(F.col("doc_id") == 0).select(F.col("dt").alias("qtok"))
    inter = F.size(F.array_intersect(F.col("dt"), F.col("qtok")))
    tok_scored = (
        toks.filter(F.col("doc_id") != 0)
        .crossJoin(F.broadcast(tq))
        .select(
            F.col("doc_id").alias("id"),
            (
                -F.round(
                    inter.cast("double")
                    / (F.size("dt") + F.size("qtok") - inter),
                    6,
                )
            ).alias("neg_j"),
        )
        .persist()
    )
    tok_r = distributed_row_number(
        tok_scored, ["neg_j", "id"], out_col="r_tok"
    ).select("id", "r_tok")
    rrf = F.lit(1.0) / (60 + F.col("r_cos")) + F.lit(1.0) / (
        60 + F.col("r_tok")
    )
    return (
        cos_r.join(tok_r, "id")
        .select(
            "id",
            F.col("r_cos").cast("bigint").alias("r_cos"),
            F.col("r_tok").cast("bigint").alias("r_tok"),
            F.round(rrf, 6).alias("rrf"),
            rrf.alias("_rrf_raw"),
        )
        .orderBy(F.col("_rrf_raw").desc(), "id")
        .limit(10)
        .drop("_rrf_raw")
    )


def q102_single_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q102 without the checkpoint OR the sk-exact join: the exact
    per-type distinct rides the SAME window stage as the KMV rank (a
    count over the window partition), so the query is one linear
    pipeline — scan -> distinct -> one exchange by type -> window ->
    filter -> agg."""
    from pyspark.sql import Window

    from fluvii_spark.queries.relational_ext4 import KMV_K

    t = load_tables(spark, sf_dir)
    pairs = t.events.select("event_type", "user_id").distinct()
    hashed = pairs.withColumn(
        "h",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        )
        .cast("long")
        / F.lit(4294967296.0),
    )
    w = Window.partitionBy("event_type").orderBy("h", "user_id")
    wc = Window.partitionBy("event_type")
    ranked = (
        hashed.withColumn("rn", F.row_number().over(w))
        .withColumn("_ex", F.count("user_id").over(wc))
        .filter(F.col("rn") <= KMV_K)
    )
    return (
        ranked.groupBy("event_type")
        .agg(
            F.count("*").alias("n_kept"),
            F.max("h").alias("h_k"),
            F.max("_ex").alias("_exd"),
        )
        .select(
            "event_type",
            F.col("_exd").cast("bigint").alias("exact_distinct"),
            F.when(F.col("n_kept") < KMV_K, F.col("n_kept").cast("double"))
            .otherwise((F.lit(KMV_K - 1)) / F.col("h_k"))
            .alias("kmv_estimate"),
        )
    )


def q129_window_contingency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q129 without the checkpoint or any join: row/column/grand totals
    attach to the schema-bounded cells relation as windows (the global
    window sees |types|x2 rows — bounded at any corpus scale)."""
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    cells = t.events.groupBy(
        "event_type", (F.col("value") < 0).alias("neg")
    ).agg(F.count("*").alias("o"))
    x = (
        cells.withColumn(
            "r", F.sum("o").over(Window.partitionBy("event_type")).cast("double")
        )
        .withColumn(
            "c", F.sum("o").over(Window.partitionBy("neg")).cast("double")
        )
        .withColumn(
            "n", F.sum("o").over(Window.partitionBy()).cast("double")
        )
    )
    e = F.col("r") * F.col("c") / F.col("n")
    return x.agg(
        F.round(F.sum((F.col("o") - e) * (F.col("o") - e) / e), 6).alias(
            "chi2"
        ),
        (
            (F.count_distinct("event_type") - 1)
            * (F.count_distinct("neg") - 1)
        )
        .cast("bigint")
        .alias("dof"),
    )


def _q103_window(spark: SparkSession, sf_dir: str, ckpt: bool) -> DataFrame:
    from pyspark.sql import Window

    t = load_tables(spark, sf_dir)
    counts = t.documents.groupBy("lang").agg(F.count("*").alias("n_docs"))
    if ckpt:
        counts = counts.localCheckpoint(eager=False)
    rates = counts.withColumn(
        "rate",
        F.min("n_docs").over(Window.partitionBy()).cast("double")
        / F.col("n_docs"),
    )
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("mix_"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        / F.lit(4294967296.0)
    )
    kept = (
        t.documents.join(F.broadcast(rates), "lang")
        .filter(h < F.col("rate"))
        .groupBy("lang")
        .agg(F.count("*").alias("n_kept"))
    )
    return rates.join(kept, "lang", "left").select(
        "lang",
        F.col("n_docs").cast("bigint").alias("n_docs"),
        F.coalesce(F.col("n_kept"), F.lit(0)).cast("bigint").alias("n_kept"),
        "rate",
    )


def q208_no_persist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The pre-r12 q208 (no slopes persist) — committed is now the
    persisted form, so 'variant' here is the OLD shape."""
    from fluvii_spark.operators.ranking import grouped_exact_quantiles

    t = load_tables(spark, sf_dir)
    daily = t.lineitem.groupBy(F.to_date("l_shipdate").alias("day")).agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(18,6)")) * 1000000
        )
        .cast("bigint")
        .alias("y")
    )
    d0 = daily.agg(F.min("day").alias("d0"))
    xy = (
        daily.crossJoin(F.broadcast(d0))
        .select(F.datediff("day", "d0").alias("x"), "y")
        .localCheckpoint(eager=False)
    )
    try:
        _n_slices = max(1, int(spark.conf.get("spark.sql.shuffle.partitions")))
    except Exception:
        _n_slices = 200
    a = xy.repartition(_n_slices, F.col("x")).select(
        F.col("x").alias("xa"), F.col("y").alias("ya")
    )
    b = xy.select(F.col("x").alias("xb"), F.col("y").alias("yb"))
    slopes = a.join(F.broadcast(b), F.col("xb") > F.col("xa")).select(
        F.try_divide(
            (F.col("yb") - F.col("ya")).cast("double"),
            F.col("xb") - F.col("xa"),
        ).alias("slope")
    )
    n_pairs = xy.agg(
        F.expr("(count(*) * (count(*) - 1)) DIV 2")
        .cast("bigint")
        .alias("n_pairs")
    )
    med = (
        grouped_exact_quantiles(
            slopes.withColumn("g", F.lit(1)),
            ["g"],
            "slope",
            [0.5],
            include_empty_groups=False,
        )
        .select(F.col("quantile").alias("m"))
        .localCheckpoint(eager=False)
    )
    resid = xy.crossJoin(F.broadcast(med)).select(
        (F.col("y") - F.col("m") * F.col("x")).alias("r")
    )
    icpt = resid.agg(
        F.round(F.percentile("r", F.lit(0.5)), 6).alias("b0")
    )
    return (
        n_pairs.crossJoin(F.broadcast(med))
        .crossJoin(F.broadcast(icpt))
        .select(
            "n_pairs",
            F.col("m").alias("slope_micro_per_day"),
            F.col("b0").alias("intercept_micro"),
        )
    )


def q190_window_c1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q190 with c1 as a window over c12's (lang, w1) partition: c12
    becomes single-consumer so ITS checkpoint and the c1 join both
    disappear (one barrier instead of two, 3 joins -> 2). Integer sums
    — order-free, bit-identical c1 values."""
    from pyspark.sql import Window

    from fluvii_spark.operators import text as T
    from fluvii_spark.operators.stats import fan_out_scan

    t = load_tables(spark, sf_dir)
    docs = fan_out_scan(t.documents)
    toks = docs.select(
        "doc_id", "lang", F.explode(F.split("text", " ")).alias("tok")
    )
    dbg = (
        docs.select(
            "doc_id", "lang", F.explode(T.bigrams("text")).alias("bigram")
        )
        .groupBy("doc_id", "lang", "bigram")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    c12 = dbg.groupBy("lang", "bigram").agg(F.sum("tf").alias("c12"))
    vocab = toks.groupBy("lang").agg(F.countDistinct("tok").alias("v"))
    sbg = (
        c12.withColumn("w1", F.expr("split_part(bigram, ' ', 1)"))
        .withColumn(
            "c1", F.sum("c12").over(Window.partitionBy("lang", "w1"))
        )
        .join(F.broadcast(vocab), "lang")
        .select(
            "lang",
            "bigram",
            (
                -F.log(
                    (F.col("c12") + 1)
                    / (F.col("c1") + F.col("v")).cast("double")
                )
            ).alias("s"),
        )
    )
    doc_nll = (
        dbg.join(sbg, ["lang", "bigram"])
        .groupBy("doc_id", "lang")
        .agg((F.sum(F.col("tf") * F.col("s")) / F.sum("tf")).alias("nll"))
    )
    return doc_nll.groupBy("lang").agg(
        F.count("*").cast("bigint").alias("n_docs"),
        F.avg("nll").alias("avg_nll"),
        F.min("nll").alias("min_nll"),
        F.max("nll").alias("max_nll"),
    )


def q103_window_ckpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q103_window(spark, sf_dir, ckpt=True)


def q103_window_nockpt(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _q103_window(spark, sf_dir, ckpt=False)


VARIANTS: dict[str, tuple[str, object]] = {
    # short key -> (committed query name, variant fn)
    "q137": ("q137_lang_vocab_jaccard", q137_contraction),
    "q174": ("q174_referential_audit", q174_single_scan),
    "q197": ("q197_join_key_skew_audit", q197_single_pass),
    "q194": ("q194_minhash_fidelity", q194_merged_profile),
    "q253": ("q253_median_polish", q253_no_checkpoint),
    "q230p": ("q230_price_iqr_fences", q230_persist_v),
    "q203p": ("q203_hybrid_rank_fusion", q203_persist_scores),
    "q102w": ("q102_kmv_distinct_sketch", q102_single_pipeline),
    "q129w": ("q129_chi2_contingency", q129_window_contingency),
    "q103w": ("q103_lang_rebalance", q103_window_ckpt),
    "q103wn": ("q103_lang_rebalance", q103_window_nockpt),
    "q208np": ("q208_theil_sen_trend", q208_no_persist),
    "q190w": ("q190_bigram_logprob", q190_window_c1),
}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("names", help="comma-separated variant keys (see VARIANTS)")
    ap.add_argument(
        "--sf-dir",
        default=os.environ.get("SPARK_GRAFT_SF_DIR", "/tmp/fluvii_growth_g10_ms"),
    )
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--check", action="store_true",
                    help="hash-compare variant vs committed before timing")
    ap.add_argument("--out", default="-")
    args = ap.parse_args()

    names = [n for n in args.names.split(",") if n]
    unknown = [n for n in names if n not in VARIANTS]
    if unknown:
        raise SystemExit(f"unknown variants: {unknown}")

    os.environ.setdefault("SPARK_DRIVER_MEMORY", "48g")
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    spark = get_session(
        "ab-r12", master=f"local[{cpus}]", shuffle_partitions=int(cpus)
    )
    apply_runtime_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry()

    # warm-up (bench.py recipe)
    spark.range(1_000_000).selectExpr("sum(id)").collect()
    spark.read.parquet(
        os.path.join(args.sf_dir, "lineitem.parquet")
    ).limit(1).collect()
    from pyspark.sql.functions import pandas_udf  # noqa: PLC0415

    @pandas_udf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    spark.range(10_000).select(_warm("id")).collect()

    results: dict[str, dict] = {}
    for key in names:
        qname, vfn = VARIANTS[key]
        row: dict = {"query": qname, "sf_dir": args.sf_dir}
        if args.check:
            sdf = qs[qname].fn(spark, args.sf_dir)
            ch = value_hash(list(sdf.columns), [tuple(r) for r in sdf.collect()])
            vdf = vfn(spark, args.sf_dir)
            vh = value_hash(list(vdf.columns), [tuple(r) for r in vdf.collect()])
            row["hash_equal"] = ch == vh
            row["committed_hash"], row["variant_hash"] = ch, vh
            if ch != vh:
                results[key] = row
                print(f"{key}: HASH MISMATCH — not timing", file=sys.stderr)
                continue
        def _steal() -> int:
            with open("/proc/stat") as fh:
                return int(fh.readline().split()[8])

        committed, variant = [], []
        steal_c, steal_v = [], []
        for p in range(max(1, args.passes)):
            for label, fn, acc, st in (
                ("committed", qs[qname].fn, committed, steal_c),
                ("variant", vfn, variant, steal_v),
            ):
                spark.sparkContext.setJobDescription(f"ab:{key}:{label}:{p}")
                s0 = _steal()
                t0 = time.perf_counter()
                fn(spark, args.sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                acc.append(round(time.perf_counter() - t0, 3))
                st.append(_steal() - s0)
        row["committed_sec"] = committed
        row["variant_sec"] = variant
        row["committed_steal"] = steal_c
        row["variant_steal"] = steal_v
        row["committed_best"] = min(committed)
        row["variant_best"] = min(variant)
        results[key] = row
        print(f"{key}: committed {committed} vs variant {variant}",
              file=sys.stderr)

    payload = json.dumps(results, indent=1)
    if args.out == "-":
        print(payload)
    else:
        with open(args.out, "w") as fh:
            fh.write(payload)
        print(f"wrote {args.out}", file=sys.stderr)


if __name__ == "__main__":
    main()
