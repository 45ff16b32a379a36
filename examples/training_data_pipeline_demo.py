"""Demo: a training-data preparation pipeline, end to end.

The LLM-data surface this engine adds beyond the reference (which is a
Kafka client library with no data operators — SURVEY.md §2.2): quality
gating (incl. repetition scoring), cluster-level keep-best dedup,
train/test contamination checking, deterministic stratified splits,
sequence packing, and overlapped chunking — composed exactly as the
oracle-checked inventory queries (q33/q35/q60/q67/q79/q80/q88/q96-q100)
compose them.

Run:  python examples/training_data_pipeline_demo.py
(uses /root/testdata/sf0.001; set DEMO_SF_DIR for another scale)
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from fluvii_spark import get_session
from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators.dedup import connected_components, minhash_lsh_pairs
from fluvii_spark.operators.packing import pack_sequences, packing_stats

SF_DIR = os.environ.get("DEMO_SF_DIR", "/root/testdata/sf0.001")


def main() -> None:
    spark = get_session(app_name="training-data-pipeline-demo")
    docs = load_tables(spark, SF_DIR).documents

    # 1. quality gate: token-count floor (cheap, fully pushed-down)
    qual = docs.withColumn(
        "n_toks", F.size(F.split("text", " ")).cast("long")
    ).filter("n_toks >= 20")
    print(f"quality gate: {docs.count()} -> {qual.count()} docs")

    # 1b. repetition gate (q98): drop documents that are mostly repeated
    #     trigrams — a C4/Gopher-style quality rule, pure array HOFs
    tri = F.expr(
        "transform(sequence(0, size(split(text, ' ')) - 3),"
        " i -> concat_ws(' ', slice(split(text, ' '), i + 1, 3)))"
    )
    qual = qual.withColumn(
        "dup_tri_ratio",
        F.lit(1.0) - F.size(F.array_distinct(tri)).cast("double") / F.size(tri),
    ).filter("dup_tri_ratio < 0.98")

    # 2. fuzzy dedup, cluster-aware keep-best (q60 + q100): near-dup pairs
    #    -> connected components -> keep the LONGEST member per cluster
    #    (pairwise drop-the-higher-id can drop both docs of a chain; the
    #    cluster view keeps exactly one canonical doc per group)
    pairs = minhash_lsh_pairs(qual, threshold=0.5)
    clusters = connected_components(pairs)
    from pyspark.sql import Window

    keep_rank = F.row_number().over(
        Window.partitionBy("cluster").orderBy(F.col("n_chars").desc(), "node")
    )
    losers = (
        clusters.join(
            qual.select(F.col("doc_id").alias("node"), "n_chars"), "node"
        )
        .withColumn("rn", keep_rank)
        .filter("rn > 1")
        .select(F.col("node").alias("doc_id"))
    )
    kept = qual.join(losers, "doc_id", "left_anti")
    print(f"keep-best dedup: dropped {losers.count()} near-dups -> {kept.count()} docs")

    # 3. deterministic stratified split (stable across reruns/engines)
    h = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit("split_"), F.col("doc_id").cast("string"))),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 10
    )
    split = kept.withColumn(
        "split", F.when(h < 8, "train").when(h == 8, "val").otherwise("test")
    )

    # 4. sequence packing: fill 512-token bins per (lang, split)
    packed = pack_sequences(
        split.select("lang", "split", "doc_id", "n_toks"),
        group_cols=["lang", "split"],
        order_col="doc_id",
        size_col="n_toks",
        capacity=512,
    )
    stats = packing_stats(packed, ["lang", "split"], "n_toks").orderBy(
        "lang", "split"
    )
    print("packing stats (bins per lang x split):")
    stats.show(20, truncate=False)

    # 5. contamination check (q97): does any test doc share a 5-gram with
    #    the train split? (LEFT SEMI on distinct shingles — bounded volume)
    from fluvii_spark.operators.dedup import word_shingles

    sh5 = word_shingles(split, "doc_id", "text", n=5)
    train_sh = (
        sh5.join(split.filter("split = 'train'"), "doc_id")
        .select("shingle").distinct()
    )
    contaminated = (
        sh5.join(split.filter("split = 'test'"), "doc_id")
        .join(train_sh, "shingle", "leftsemi")
        .select("doc_id").distinct()
    )
    n_test = split.filter("split = 'test'").count()
    print(f"contamination: {contaminated.count()}/{n_test} test docs share a 5-gram with train")

    # 6. chunking for training (q96): 50-token windows, stride 40
    chunks = (
        split.select("doc_id", "split", F.split("text", " ").alias("toks"))
        .withColumn("n", F.size("toks"))
        .withColumn("s", F.explode(F.expr("sequence(0, n - 1, 40)")))
        .select(
            "split", "doc_id", F.col("s").alias("chunk_start"),
            F.concat_ws(" ", F.expr("slice(toks, s + 1, 50)")).alias("chunk"),
        )
    )
    chunks.groupBy("split").agg(
        F.count("*").alias("n_chunks"),
        F.avg(F.size(F.split("chunk", " "))).alias("avg_chunk_toks"),
    ).orderBy("split").show()

    spark.stop()


if __name__ == "__main__":
    main()
