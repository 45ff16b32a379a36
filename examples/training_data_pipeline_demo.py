"""Demo: a training-data preparation pipeline, end to end.

The LLM-data surface this engine adds beyond the reference (which is a
Kafka client library with no data operators — SURVEY.md §2.2): quality
gating, exact + fuzzy dedup, deterministic stratified splits, and sequence
packing, composed exactly as the oracle-checked inventory queries
(q33/q35/q67/q79/q80/q88) compose them.

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
from fluvii_spark.operators.dedup import minhash_lsh_pairs
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

    # 2. fuzzy dedup: MinHash-LSH candidates, exact-Jaccard verified; drop
    #    the higher doc_id of every near-dup pair
    pairs = minhash_lsh_pairs(qual, threshold=0.5)
    drop = pairs.select(F.col("id_b").alias("doc_id")).distinct()
    kept = qual.join(drop, "doc_id", "left_anti")
    print(f"fuzzy dedup: dropped {drop.count()} near-dups -> {kept.count()} docs")

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

    spark.stop()


if __name__ == "__main__":
    main()
