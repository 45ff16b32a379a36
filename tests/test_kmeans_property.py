"""Property oracle for operators.clustering.lloyd_kmeans: an independent
Python/numpy Lloyd replica (same seed rule, same 6-dp rounding of
centroids and distances, same (distance, cluster-id) tie-break) must
produce identical assignments and distances on deterministic random
data — the same independent-oracle pattern as test_asof_property /
test_components / test_graph_packing_property."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from fluvii_spark.operators.clustering import lloyd_kmeans


def _py_lloyd(X: np.ndarray, k: int, iters: int, dp: int = 6):
    """Sequential-sum Lloyd with the operator's exact rounding contract.

    Distances accumulate in dimension order (matching zip_with/aggregate
    left-fold order exactly — bit-identical, not just close); centroid
    means are rounded to dp decimals before the next pass."""
    n, dims = X.shape
    cents: dict[int, list[float]] = {
        i: [float(v) for v in X[i]] for i in range(k)
    }

    def assign(cents_: dict[int, list[float]]):
        out = []
        for ridx in range(n):
            best = None
            for c in sorted(cents_):
                d = 0.0
                for a, b in zip(X[ridx], cents_[c]):
                    d = d + (float(a) - b) * (float(a) - b)
                d = round(d, dp)
                if best is None or (d, c) < best:
                    best = (d, c)
            out.append(best)
        return out

    for _ in range(iters):
        asg = assign(cents)
        sums: dict[int, np.ndarray] = {}
        counts: dict[int, int] = {}
        for ridx, (_, c) in enumerate(asg):
            if c not in sums:
                sums[c] = np.zeros(dims, dtype=np.float64)
                counts[c] = 0
            sums[c] += X[ridx]
            counts[c] += 1
        cents = {
            c: [round(float(v) / counts[c], dp) for v in sums[c]]
            for c in sums
        }
    return assign(cents)


@pytest.mark.parametrize("seed,n,dims,k,iters", [(7, 120, 8, 4, 2), (23, 60, 5, 3, 3)])
def test_lloyd_kmeans_matches_python_oracle(spark, seed, n, dims, k, iters):
    rng = np.random.default_rng(seed)
    X = rng.uniform(-0.5, 0.5, size=(n, dims)).astype(np.float64)
    rows = [(i, [float(v) for v in X[i]]) for i in range(n)]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")

    got = {
        int(r["vec_id"]): (float(r["sqdist"]), int(r["cluster"]))
        for r in lloyd_kmeans(
            df, id_col="vec_id", vec_col="v", k=k, iters=iters
        ).collect()
    }
    want = {i: (d, c) for i, (d, c) in enumerate(_py_lloyd(X, k, iters))}

    assert set(got) == set(want)
    mismatch = {
        i: (got[i], want[i]) for i in want if got[i] != want[i]
    }
    assert not mismatch, f"{len(mismatch)} rows diverge: {mismatch}"


def test_lloyd_kmeans_empty_input(spark):
    df = spark.createDataFrame([], "vec_id int, v array<double>")
    out = lloyd_kmeans(df, id_col="vec_id", vec_col="v", k=4, iters=2)
    assert out.count() == 0
    assert [f.name for f in out.schema.fields] == [
        "vec_id", "v", "cluster", "sqdist",
    ]


def test_lloyd_kmeans_single_cluster(spark):
    """k=1 (and any update that collapses every row onto one centroid)
    must assign, not crash — F.least needs >=2 args and the operator
    guards that arity."""
    rows = [(i, [float(i % 2), 0.0]) for i in range(6)]
    df = spark.createDataFrame(rows, "vec_id int, v array<double>")
    out = lloyd_kmeans(df, id_col="vec_id", vec_col="v", k=1, iters=2).collect()
    assert len(out) == 6
    assert {int(r["cluster"]) for r in out} == {0}
    # all-collapse with k=2: every vector (both seeds included) is
    # identical, so every row ties and the c_id tie-break sends all of
    # them to cluster 0 — cluster 1 empties and the next assignment
    # runs with a single centroid
    rows2 = [(0, [0.0, 0.0]), (1, [0.0, 0.0]), (2, [0.0, 0.0])]
    df2 = spark.createDataFrame(rows2, "vec_id int, v array<double>")
    out2 = lloyd_kmeans(df2, id_col="vec_id", vec_col="v", k=2, iters=2).collect()
    assert len(out2) == 3
    assert {int(r["cluster"]) for r in out2} == {0}
