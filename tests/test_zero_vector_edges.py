"""Degenerate-input regression: a single all-zero embedding (or sub-shingle
document) must neither abort a job under ANSI DIVIDE_BY_ZERO nor diverge
from the oracle. The similarity family now mirrors the oracle's own
degenerate semantics: list_cosine_similarity-backed oracles get -1.0,
manual-division oracles get NULL (try_divide), and q42 omits fingerprints
for docs too short to shingle, as its oracle does."""

from __future__ import annotations

import duckdb
import pytest

from fluvii_spark.queries import registry
from tests.harness import compare

EDGE_QUERIES = [
    "q30_cosine_topk",
    "q39_ann_lsh_topk",
    "q57_ann_ivf_topk",
    "q107_semantic_rep_select",
    "q116_ann_multiprobe",
    "q140_label_centroid_cosine",
    "q146_knn_classify",
    "q38_dedup_embedding_cosine",
]


@pytest.fixture(scope="module")
def edge_dir(spark, sf_dir, tmp_path_factory):
    """A tiny sf-layout dir whose embeddings include one ALL-ZERO vector
    (and whose documents include 1- and 2-token texts for q42)."""
    root = tmp_path_factory.mktemp("edge_sf")
    emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet").limit(40)
    cols = emb.columns
    import pyspark.sql.functions as F

    dims = len(emb.select("embedding").head()[0])
    zero = spark.createDataFrame(
        [(99999, [0.0] * dims)], "vec_id LONG, embedding ARRAY<DOUBLE>"
    )
    # align remaining columns (label etc.) with nulls
    for c in cols:
        if c not in ("vec_id", "embedding"):
            zero = zero.withColumn(
                c, F.lit(None).cast(dict(emb.dtypes)[c])
            )
    emb.unionByName(zero.select(cols)).write.parquet(
        str(root / "embeddings.parquet")
    )
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").limit(40)
    extra = spark.createDataFrame(
        [
            (88888, "one", "en", "srcA", 3),
            (88889, "two words", "en", "srcA", 9),
        ],
        "doc_id LONG, text STRING, lang STRING, source STRING, n_chars LONG",
    )
    docs.unionByName(extra.select(docs.columns)).write.parquet(
        str(root / "documents.parquet")
    )
    return str(root)


@pytest.fixture(scope="module")
def edge_duck(edge_dir):
    con = duckdb.connect()
    for t in ("embeddings", "documents"):
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{edge_dir}/{t}.parquet/*.parquet')"
        )
    return con


@pytest.mark.parametrize("name", EDGE_QUERIES)
def test_similarity_query_survives_zero_vector(name, spark, edge_dir, edge_duck):
    q = registry()[name]
    ok, msg = compare(q.fn(spark, edge_dir), edge_duck, q.oracle)
    assert ok, f"{name}: {msg}"


def test_q42_omits_short_doc_fingerprints(spark, edge_dir, edge_duck):
    q = registry()["q42_doc_fingerprint"]
    df = q.fn(spark, edge_dir)
    ids = {r["doc_id"] for r in df.collect()}
    assert 88888 not in ids and 88889 not in ids  # no NULL-fingerprint rows
    ok, msg = compare(df, edge_duck, q.oracle)
    assert ok, msg
