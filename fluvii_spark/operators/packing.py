"""Sequence packing: greedy first-fit of documents into fixed token-capacity
bins — the batch-construction step of LLM training-data pipelines (pack short
documents together so context windows aren't wasted on padding).

No reference counterpart (fluvii is a Kafka client library; SURVEY.md §2.2).
Semantics: within a group, documents are taken in a deterministic order;
a document opens a new bin when it doesn't fit in the current one (a
document longer than the capacity gets a bin of its own). This is the
sequential greedy algorithm — inherently order-dependent, so it runs as an
``applyInPandas`` fold per group, not a window function.

Scale notes: one group = one task, so group cardinality is the parallelism
(and a giant group is a straggler). At 100 TB you pack per (group, shard)
with a deterministic shard key — packing quality is unchanged (bins never
cross shards by construction) and parallelism is restored; pass
``shard_mod`` for exactly that. ``applyInPandas`` materializes a whole
group per task — another reason shards must bound group size.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    group_cols: list[str],
    order_col: str,
    size_col: str,
    capacity: int,
    shard_mod: int | None = None,
) -> DataFrame:
    """Assign each row a ``bin`` id per group (greedy first-fit in
    ``order_col`` order). Output: group cols + order col + size col + bin.

    ``shard_mod`` adds a deterministic ``shard = order_col % shard_mod``
    to the grouping — the scale path (more tasks, same packing guarantees
    within each shard).
    """
    keys = list(group_cols)
    # the applyInPandas schema mirrors the INPUT types (a hardcoded
    # "group STRING, size BIGINT" would Arrow-error on int group keys or
    # double size estimates the signature otherwise accepts)
    in_types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    out_schema = ", ".join(
        [f"{c} {in_types[c]}" for c in group_cols]
        + [
            f"{order_col} {in_types[order_col]}",
            f"{size_col} {in_types[size_col]}",
            "bin BIGINT",
        ]
    )
    if shard_mod is not None:
        df = df.withColumn("_shard", (F.col(order_col) % shard_mod).cast("long"))
        keys = keys + ["_shard"]
        out_schema = "_shard BIGINT, " + out_schema

    def fold(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col, kind="mergesort").reset_index(drop=True)
        bins, fill, b = [], 0, 0
        for n in pdf[size_col]:
            # float, not int: int(1.5) would silently truncate DOUBLE size
            # estimates and overpack; integer sizes stay exact as floats
            # (< 2^53)
            n = float(n)
            if fill > 0 and fill + n > capacity:
                b, fill = b + 1, n
            else:
                fill += n
            bins.append(b)
        pdf = pdf[keys + [order_col, size_col]].copy()
        pdf["bin"] = bins
        return pdf

    packed = df.select(*keys, order_col, size_col).groupBy(*keys).applyInPandas(
        fold, schema=out_schema
    )
    return packed.drop("_shard") if shard_mod is not None else packed


def packing_stats(packed: DataFrame, group_cols: list[str], size_col: str) -> DataFrame:
    """Per-group packing quality: bins used, mean fill, max fill."""
    per_bin = packed.groupBy(*group_cols, "bin").agg(
        F.sum(size_col).alias("fill")
    )
    return per_bin.groupBy(*group_cols).agg(
        F.count("*").alias("n_bins"),
        F.avg("fill").alias("avg_fill"),
        F.max("fill").alias("max_fill"),
    )
