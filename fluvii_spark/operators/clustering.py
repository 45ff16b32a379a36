"""Distributed Lloyd k-means over an embedding column.

The clustering stage of semantic data curation (SemDeDup cluster pools,
topic balancing, diversity sampling; reference has no counterpart —
SURVEY.md §2.2 "LLM-data ops"). Spark-first scale shape:

- **Assignment is zero-shuffle.** Centroids live as k×dims literal
  arrays inside one closed-form ``zip_with``/``aggregate`` squared-L2
  expression — pure whole-stage codegen over the corpus scan, no
  crossJoin, no per-row Python. k×dims doubles on the driver is the
  same bounded transfer the IVF ANN path uses
  (``operators/similarity.py`` centroid frames).
- **Updates contract map-side.** New centroids are
  ``posexplode → groupBy(cluster, dim) → avg``: partial aggregation
  caps every task's shuffle output at k·dims rows regardless of corpus
  size.
- **Determinism is by construction**, not luck: every centroid
  dimension and every distance is rounded to ``round_dp`` decimals
  before any comparison, and assignment breaks equal-distance ties on
  the smaller cluster id (a lexicographic ``least`` over
  ``struct(distance, cluster)``), so two engines — or two cluster
  topologies — iterating from the same seeds stay on identical numbers.
  Seeds are the rows with the k smallest ids (exact float→double
  widening), not a random init.

A cluster that receives no members simply drops out of the next
iteration's centroid set (mirroring the SQL inner-join formulation);
callers who need fixed k should pick seeds accordingly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

__all__ = ["lloyd_kmeans"]


def _dist_to(vec_col: str, c_vals: list[float], round_dp: int):
    arr = F.array(*[F.lit(float(x)) for x in c_vals])
    return F.round(
        F.aggregate(
            F.zip_with(vec_col, arr, lambda a, b: (a - b) * (a - b)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ),
        round_dp,
    )


def _assign(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    cents: dict[int, list[float]],
    round_dp: int,
) -> DataFrame:
    structs = [
        F.struct(
            _dist_to(vec_col, cents[i], round_dp).alias("d"),
            F.lit(i).alias("c"),
        )
        for i in sorted(cents)
    ]
    # F.least requires >=2 args; a single surviving centroid (k=1, or
    # every row assigned to one cluster in a previous update) is a
    # legitimate state, not an error
    best = structs[0] if len(structs) == 1 else F.least(*structs)
    return df.select(
        F.col(id_col),
        F.col(vec_col),
        best.getField("d").alias("_km_d"),
        best.getField("c").alias("_km_cluster"),
    )


def lloyd_kmeans(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "v",
    k: int = 4,
    iters: int = 2,
    round_dp: int = 6,
) -> DataFrame:
    """Run ``iters`` Lloyd updates then a final assignment.

    ``df`` needs an orderable ``id_col`` and an ``array<double>``
    ``vec_col`` (cast upstream; NULL vectors must be filtered by the
    caller — the SQL-oracle semantics drop them). Seeds are the k
    smallest ids' vectors. Returns
    ``(id_col, vec_col, cluster int, sqdist double)`` with ``sqdist``
    the ``round_dp``-rounded squared L2 distance to the final centroid.

    Each update runs one bounded-collect job (k·dims centroid means);
    assignment itself never shuffles.
    """
    seed_rows = (
        df.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(k)
        .collect()
    )
    cents: dict[int, list[float]] = {
        i: [float(x) for x in r[vec_col]]
        for i, r in enumerate(seed_rows)
    }
    if not cents:
        return df.select(
            id_col,
            vec_col,
            F.lit(None).cast("int").alias("_km_cluster"),
            F.lit(None).cast("double").alias("_km_d"),
        ).select(
            id_col,
            vec_col,
            F.col("_km_cluster").alias("cluster"),
            F.col("_km_d").alias("sqdist"),
        )
    dims = len(next(iter(cents.values())))

    for _ in range(iters):
        rows = (
            _assign(df, id_col, vec_col, cents, round_dp)
            .select(
                "_km_cluster", F.posexplode(vec_col).alias("dim", "x")
            )
            .groupBy("_km_cluster", "dim")
            .agg(F.round(F.avg("x"), round_dp).alias("c"))
            .collect()
        )
        nxt: dict[int, list[float]] = {}
        for r in rows:
            nxt.setdefault(int(r["_km_cluster"]), [0.0] * dims)[
                int(r["dim"])
            ] = float(r["c"])
        cents = nxt

    return _assign(df, id_col, vec_col, cents, round_dp).select(
        id_col,
        vec_col,
        F.col("_km_cluster").alias("cluster"),
        F.col("_km_d").alias("sqdist"),
    )
