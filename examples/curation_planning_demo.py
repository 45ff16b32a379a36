"""Demo: corpus curation planning, end to end.

Composes the round-4 analytics family the way a data-curation run would:

1. score every document with the unigram-LM negative log-likelihood
   (q185's perplexity-style filter) and keep the in-model half;
2. plan the training mixture over sources with sqrt-temperature shares and
   per-source epochs for a fixed token budget (q188);
3. draw a weighted sample of documents WITHOUT replacement, weighting by
   inverse NLL so in-distribution text is favored (q183's priority keys);
4. attach an uncertainty estimate to the kept corpus' mean document length
   via the deterministic Poisson bootstrap (q187's replica trick).

Everything is a lazy DataFrame plan until the final actions; no rand()
anywhere — md5-derived keys make the whole plan replayable bit-for-bit.

Run:  python examples/curation_planning_demo.py
(uses /root/testdata/sf0.001; set DEMO_SF_DIR for another scale)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fluvii_spark import get_session
from fluvii_spark.io.readers import load_tables

SF_DIR = os.environ.get("DEMO_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_session("curation-planning-demo")
    spark.sparkContext.setLogLevel("ERROR")
    t = load_tables(spark, SF_DIR)

    # 1) unigram-LM scoring (q185's shape: explode -> tf contraction -> join)
    clean = (
        t.documents.select(
            "doc_id", "lang", "source", F.explode(F.split("text", " ")).alias("token")
        )
        .filter(F.col("token") != "")
    )
    dt = (
        clean.groupBy("doc_id", "lang", "source", "token")
        .agg(F.count("*").alias("tf"))
        .localCheckpoint(eager=False)
    )
    vocab = dt.groupBy("token").agg(F.sum("tf").alias("cnt"))
    tot = vocab.agg(F.sum("cnt").alias("n"))
    scored = (
        dt.join(vocab, "token")
        .crossJoin(F.broadcast(tot))
        .groupBy("doc_id", "lang", "source")
        .agg(
            (
                F.sum(F.col("tf") * -F.log(F.col("cnt").cast("double") / F.col("n")))
                / F.sum("tf")
            ).alias("nll"),
            F.sum("tf").alias("n_tok"),
        )
    )
    median_nll = scored.agg(
        F.expr("percentile_approx(nll, 0.5)").alias("m")
    )
    kept = scored.crossJoin(F.broadcast(median_nll)).filter(
        F.col("nll") <= F.col("m")
    )

    print("=== 1) unigram-LM gate: kept half by NLL, per language ===")
    kept.groupBy("lang").agg(
        F.count("*").alias("n_docs"), F.round(F.avg("nll"), 3).alias("avg_nll")
    ).orderBy("lang").show()

    # 2) mixture plan over sources (q188: sqrt-temperature shares -> epochs)
    src = kept.groupBy("source").agg(
        F.count("*").alias("n_docs"), F.sum("n_tok").alias("tokens")
    )
    z = src.agg(F.sum(F.sqrt(F.col("tokens").cast("double"))).alias("z"))
    share = F.sqrt(F.col("tokens").cast("double")) / F.col("z")
    plan = src.crossJoin(F.broadcast(z)).select(
        "source",
        "tokens",
        F.round(share, 4).alias("target_share"),
        F.round(F.lit(200_000.0) * share / F.col("tokens"), 3).alias("epochs"),
    )
    print("=== 2) mixture plan: 200k-token budget, tau=2 shares ===")
    plan.orderBy(F.desc("target_share")).show(8)

    # 3) weighted sample without replacement (q183 keys; weight = 1/nll scaled
    #    to integer millis so the division is IEEE-exact)
    w = F.greatest(
        F.lit(1), (F.lit(1000.0) / F.col("nll")).cast("bigint")
    )
    h = F.conv(
        F.substring(F.md5(F.concat(F.lit("cur_"), F.col("doc_id").cast("string"))), 1, 8),
        16,
        10,
    ).cast("long")
    sample = (
        kept.select("doc_id", "lang", "source", "nll", w.alias("w"), h.alias("h"))
        .select(
            "doc_id", "lang", "source", "nll",
            (F.col("h").cast("double") / F.col("w").cast("double")).alias("key"),
        )
        .orderBy("key", "doc_id")
        .limit(10)
    )
    print("=== 3) priority sample (k=10, weight ~ 1/NLL) ===")
    sample.show(10, truncate=False)

    # 4) bootstrap CI on the kept corpus' mean token count (q187 replicas)
    digests = kept.select(
        F.col("n_tok").cast("decimal(18,2)").alias("p"),
        F.explode(F.sequence(F.lit(0), F.lit(7))).alias("g"),
        F.col("doc_id"),
    ).select(
        "g", "p",
        F.md5(F.concat(F.lit("bb"), F.col("g").cast("string"), F.lit("_"),
                       F.col("doc_id").cast("string"))).alias("hx"),
    )
    lanes = digests.select(
        "g", "p", "hx", F.explode(F.sequence(F.lit(0), F.lit(3))).alias("l")
    )
    mult = lanes.select(
        (F.col("g") * 4 + F.col("l")).alias("b"), "p",
        F.when(F.expr("substring(hx, 1 + 8 * l, 8)") < "5e2d58d8", 0)
        .when(F.expr("substring(hx, 1 + 8 * l, 8)") < "bc5ab1b0", 1)
        .when(F.expr("substring(hx, 1 + 8 * l, 8)") < "eb715e1f", 2)
        .when(F.expr("substring(hx, 1 + 8 * l, 8)") < "fb239797", 3)
        .when(F.expr("substring(hx, 1 + 8 * l, 8)") < "ff1025f5", 4)
        .otherwise(5).alias("m"),
    )
    means = mult.groupBy("b").agg(
        (F.sum(F.col("m") * F.col("p")).cast("double") / F.sum("m")).alias("rep_mean")
    )
    stats = means.agg(
        F.round(F.expr("percentile_approx(rep_mean, 0.03125)"), 2).alias("ci_lo"),
        F.round(F.avg("rep_mean"), 2).alias("mean_of_reps"),
        F.round(F.expr("percentile_approx(rep_mean, 0.96875)"), 2).alias("ci_hi"),
    )
    print("=== 4) bootstrap CI on mean tokens/doc of the kept corpus ===")
    stats.show()

    spark.stop()


if __name__ == "__main__":
    main()
