"""Streaming MinHash-LSH dedup: candidates over a 2-batch document stream
must equal the batch LSH candidate join, including cross-batch pairs."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators.dedup import lsh_candidate_pairs
from fluvii_spark.streaming.dedup_stream import (
    band_signatures_py,
    streaming_minhash_candidates,
)


def test_python_band_signatures_match_sql(spark, sf_dir):
    """The python signature path must be bit-identical to the batch SQL
    pipeline — the whole point of md5-anchored hashing."""
    from fluvii_spark.operators.dedup import lsh_band_signatures

    docs = load_tables(spark, sf_dir).documents.limit(50)
    sql_side = {
        (r["doc_id"], r["band"]): r["band_sig"]
        for r in lsh_band_signatures(docs).collect()
    }
    for r in docs.collect():
        sigs = band_signatures_py(r["text"])
        assert sigs is not None
        for band, sig in sigs:
            assert sql_side[(r["doc_id"], band)] == sig


def test_streaming_candidates_match_batch(spark, sf_dir, tmp_path):
    docs = load_tables(spark, sf_dir).documents
    d = str(tmp_path / "docs")
    # two batches split by id parity → near-dup pairs straddle batches
    docs.filter("doc_id % 2 = 0").coalesce(1).write.parquet(d)
    docs.filter("doc_id % 2 = 1").coalesce(1).write.mode("append").parquet(d)

    schema = spark.read.parquet(d).schema
    src = (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    cands = streaming_minhash_candidates(src)
    q = (
        cands.writeStream.format("memory")
        .outputMode("append")
        .queryName("lsh_stream")
        .option("checkpointLocation", str(tmp_path / "ck"))
        .start()
    )
    q.processAllAvailable()
    q.stop()

    got = {
        (min(r["id_new"], r["id_prior"]), max(r["id_new"], r["id_prior"]))
        for r in spark.sql("SELECT * FROM lsh_stream").collect()
    }
    expected = {
        (r["id_a"], r["id_b"]) for r in lsh_candidate_pairs(docs).collect()
    }
    assert got == expected
    assert len(got) > 0
    # cross-batch pairs exist (even id with odd id)
    assert any((a + b) % 2 == 1 for a, b in got)
