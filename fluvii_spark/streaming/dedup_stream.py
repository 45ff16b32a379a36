"""Streaming fuzzy dedup: MinHash-LSH over an unbounded document stream.

The batch operators (operators/dedup.py) find near-dups within a static
corpus; a training-data *ingest* pipeline needs the streaming form — "is
this incoming document a near-dup of anything seen so far?" — without
re-scanning history. This is the LSH state pattern:

1. per-document MinHash band signatures computed in ``mapInPandas``
   (signature depends only on the document itself — embarrassingly
   parallel, no shuffle, and BIT-IDENTICAL to the batch operator: same md5
   shingle hash, same permutation constants);
2. one row per (band, band_sig) bucket key — 4 rows per doc;
3. ``applyInPandasWithState`` keyed on the bucket: state = ids already in
   the bucket; each arriving doc emits a candidate pair per prior occupant
   and joins the bucket.

State is bounded by bucket occupancy (the corpus's near-dup structure),
not by stream length per key; across keys, total state ≈ 4 rows per
distinct document — the same inverted index a batch LSH join builds, kept
incrementally.

Candidates then flow to the same per-pair exact-Jaccard verification used
in batch (broadcast-join texts + Arrow UDF) — here left to the consumer so
the stream stays single-stateful-operator.
"""

from __future__ import annotations

import hashlib
import json
import sys
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame

from fluvii_spark.session import ensure_package_on_workers

from fluvii_spark.operators.dedup import (
    MINHASH_P,
    MINHASH_PERMS,
    N_BANDS,
    ROWS_PER_BAND,
)

try:  # executors lack the package — ship by value (see streaming/state.py)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass


def band_signatures_py(text: str, n: int = 3) -> list[tuple[int, str]] | None:
    """Pure-Python band signatures, bit-identical to the batch SQL pipeline
    (md5 first-8-hex shingle hash; (a·h + b) mod P minima; comma-joined
    bands). Returns None for NULL text or texts with no n-shingle — the
    batch operator's SQL split propagates NULL and explode drops the row,
    so the streaming twin must drop, not crash the query."""
    if text is None:
        return None
    toks = text.split(" ")
    if len(toks) < n:
        return None
    mins = [MINHASH_P] * len(MINHASH_PERMS)
    for i in range(len(toks) - n + 1):
        shingle = " ".join(toks[i : i + n])
        h = int(hashlib.md5(shingle.encode("utf-8")).hexdigest()[:8], 16)
        for j, (a, b) in enumerate(MINHASH_PERMS):
            v = (a * h + b) % MINHASH_P
            if v < mins[j]:
                mins[j] = v
    return [
        (
            k,
            ",".join(
                str(mins[i])
                for i in range(k * ROWS_PER_BAND, (k + 1) * ROWS_PER_BAND)
            ),
        )
        for k in range(N_BANDS)
    ]


def streaming_minhash_candidates(
    doc_stream: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    bucket_ttl_ms: int | None = None,
) -> DataFrame:
    """(id_new, id_prior) candidate pairs, emitted as documents arrive.

    A pair appears when the new document lands in a bucket some prior
    document already occupies (possibly emitted once per shared band —
    consumers dedup, exactly like the batch candidate dropDuplicates).

    ``bucket_ttl_ms`` bounds state for UNbounded ingest: a bucket idle that
    long forgets its members (processing-time timeout), trading "near-dup
    of anything EVER seen" for "near-dup of anything seen recently" — the
    standard memory/recall dial; without it, state is the full inverted
    index (≈4 rows per distinct document), which is the exact-recall mode
    for bounded backfills.
    """
    ensure_package_on_workers(doc_stream.sparkSession)
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def to_buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            out_ids, out_bands, out_sigs = [], [], []
            for doc_id, text in zip(pdf[id_col], pdf[text_col]):
                # NULL ids can't participate in pairs (batch joins drop
                # them); NULL text is dropped inside band_signatures_py
                if doc_id is None or pd.isna(doc_id):
                    continue
                sigs = band_signatures_py(text, n)
                if not sigs:
                    continue
                for band, sig in sigs:
                    out_ids.append(doc_id)
                    out_bands.append(band)
                    out_sigs.append(sig)
            yield pd.DataFrame(
                {"doc_id": out_ids, "band": out_bands, "band_sig": out_sigs}
            )

    buckets = doc_stream.mapInPandas(
        to_buckets, schema="doc_id LONG, band INT, band_sig STRING"
    )

    def bucket_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if bucket_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        seen: list[int] = json.loads(state.get[0]) if state.exists else []
        # membership via a set: hot buckets are exactly where LSH skews
        # (near-dup clusters share band signatures), and a list `in` scan
        # would make each arrival O(len(bucket)). The ordered list is kept
        # as the stored/emission order — determinism unchanged.
        seen_set = set(seen)
        new_a, prior_b = [], []
        for pdf in pdfs:
            for doc_id in sorted(int(x) for x in pdf["doc_id"]):
                if doc_id in seen_set:
                    continue
                new_a.extend([doc_id] * len(seen))
                prior_b.extend(seen)
                seen.append(doc_id)
                seen_set.add(doc_id)
        state.update((json.dumps(seen),))
        if bucket_ttl_ms is not None:
            state.setTimeoutDuration(bucket_ttl_ms)
        if new_a:
            yield pd.DataFrame({"id_new": new_a, "id_prior": prior_b})

    return buckets.groupBy("band", "band_sig").applyInPandasWithState(
        bucket_fn,
        outputStructType="id_new LONG, id_prior LONG",
        stateStructType="state STRING",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if bucket_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
