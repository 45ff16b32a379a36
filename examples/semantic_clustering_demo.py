#!/usr/bin/env python
"""Semantic-clustering demo: distributed Lloyd k-means over the embedding
corpus, then a cluster-balanced diversity draw — the curation recipe that
keeps one dominant topic from swamping a training mix.

Run: python examples/semantic_clustering_demo.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from fluvii_spark import get_session, load_tables  # noqa: E402
from fluvii_spark.operators.clustering import lloyd_kmeans  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_session("semantic-clustering-demo")
    spark.sparkContext.setLogLevel("ERROR")
    emb = (
        load_tables(spark, sf_dir)
        .embeddings.select(
            "vec_id", F.col("embedding").cast("array<double>").alias("v")
        )
        .filter(F.col("v").isNotNull())
    )

    t0 = time.perf_counter()
    assigned = lloyd_kmeans(
        emb, id_col="vec_id", vec_col="v", k=4, iters=2
    ).persist()
    sizes = (
        assigned.groupBy("cluster")
        .agg(
            F.count("*").alias("n"),
            F.round(F.avg("sqdist"), 4).alias("avg_sqdist"),
        )
        .orderBy("cluster")
        .collect()
    )
    dt = time.perf_counter() - t0
    print(f"k-means (k=4, 2 Lloyd updates) in {dt:.2f}s:")
    for r in sizes:
        print(
            f"  cluster {r['cluster']}: {r['n']:5d} vectors, "
            f"avg sq-dist {r['avg_sqdist']}"
        )

    # balanced draw: 3 deterministic md5-ordered representatives each —
    # every semantic region contributes, regardless of cluster size
    from pyspark.sql import Window

    w = Window.partitionBy("cluster").orderBy(
        F.md5(F.col("vec_id").cast("string")), "vec_id"
    )
    reps = (
        assigned.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("cluster", "rk", "vec_id")
        .orderBy("cluster", "rk")
        .collect()
    )
    print("balanced representatives (3 per cluster):")
    for r in reps:
        print(f"  cluster {r['cluster']} #{r['rk']}: vec {r['vec_id']}")
    assigned.unpersist()
    spark.stop()


if __name__ == "__main__":
    main()
