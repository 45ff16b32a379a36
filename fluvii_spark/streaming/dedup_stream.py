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


# Permutation constants as uint64 vectors for the batched signature path.
# Exactness: h < 2^32 (md5 first 4 bytes), a < 2^29 ⇒ a·h + b < 2^61 + 2^29
# < 2^64, so uint64 arithmetic never wraps and `% P` matches Python ints.
_PERM_A = None
_PERM_B = None


def _perm_vectors():
    global _PERM_A, _PERM_B
    if _PERM_A is None:
        import numpy as np

        _PERM_A = np.array([a for a, _ in MINHASH_PERMS], dtype=np.uint64)
        _PERM_B = np.array([b for _, b in MINHASH_PERMS], dtype=np.uint64)
    return _PERM_A, _PERM_B


def band_signatures_batch(
    ids, texts, n: int = 3
) -> tuple[list, list[int], list[str]]:
    """Vectorized band signatures over a whole Arrow batch — bit-identical
    to :func:`band_signatures_py` (property-tested), ~an order of magnitude
    faster: one md5 per shingle taken as ``digest()[:4]`` (== the hex-slice
    int), then all 16 permutation minima in numpy via ``minimum.reduceat``
    over the batch's flat shingle-hash array instead of a 16-way Python
    loop per shingle.

    Returns parallel (doc_id, band, band_sig) columns, 4 rows per doc with
    ≥1 shingle; NULL ids/texts and short texts are dropped (same rules as
    the per-doc path)."""
    import numpy as np

    md5 = hashlib.md5
    sep = b" "
    keep_ids: list = []
    starts: list[int] = []
    n_shingles = 0
    digests = bytearray()  # 4 bytes per shingle, batch-flat
    for doc_id, text in zip(ids, texts):
        if doc_id is None or pd.isna(doc_id) or not isinstance(text, str):
            continue
        # ONE encode per doc; joining byte tokens yields the same bytes
        # as encode(" ".join(str tokens)) — UTF-8 is concatenation-stable
        btoks = text.encode("utf-8").split(sep)
        if len(btoks) < n:
            continue
        starts.append(n_shingles)
        for sh in zip(*(btoks[i:] for i in range(n))):
            digests += md5(sep.join(sh)).digest()[:4]
        n_shingles = len(digests) >> 2
        keep_ids.append(doc_id)
    if not keep_ids:
        return [], [], []
    h = np.frombuffer(bytes(digests), dtype=">u4").astype(np.uint64)
    a_vec, b_vec = _perm_vectors()
    p = np.uint64(MINHASH_P)
    idx = np.array(starts, dtype=np.int64)
    # one (n_shingles,) pass per permutation keeps peak memory at
    # 8 bytes/shingle instead of a (16, n_shingles) broadcast
    mins = np.empty((len(MINHASH_PERMS), len(keep_ids)), dtype=np.uint64)
    for j in range(len(MINHASH_PERMS)):
        mins[j] = np.minimum.reduceat((a_vec[j] * h + b_vec[j]) % p, idx)
    out_ids, out_bands, out_sigs = [], [], []
    for d, doc_id in enumerate(keep_ids):
        for k in range(N_BANDS):
            out_ids.append(doc_id)
            out_bands.append(k)
            out_sigs.append(
                ",".join(
                    str(int(mins[i, d]))
                    for i in range(k * ROWS_PER_BAND, (k + 1) * ROWS_PER_BAND)
                )
            )
    return out_ids, out_bands, out_sigs


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
    n_shards: int = 64,
) -> DataFrame:
    """(id_new, id_prior) candidate pairs, emitted as documents arrive.

    A pair appears when the new document lands in a bucket some prior
    document already occupies (possibly emitted once per shared band —
    consumers dedup, exactly like the batch candidate dropDuplicates).

    State layout (r5): keyed by ``(band, crc32(band_sig) % n_shards)``, each
    key holding the sub-index ``{band_sig: [last_seen_ms, ids]}``. Keying
    state by the raw signature made almost every bucket a singleton group,
    so ``applyInPandasWithState`` paid one Python invocation + pandas frame
    per DOCUMENT-BAND — the 885 rows/s bottleneck in BENCH_STREAM_r4. With
    ~4·n_shards state keys the per-group overhead amortizes over the whole
    micro-batch; bytes stored are the same inverted index either way.
    Candidate semantics are UNCHANGED: pairs still require an exact
    (band, band_sig) match inside the shard.

    ``bucket_ttl_ms`` bounds state for UNbounded ingest: signatures idle
    that long are pruned from the shard sub-index on the next arrival (and
    a fully-idle shard times out wholesale), trading "near-dup of anything
    EVER seen" for "near-dup of anything seen recently" — the standard
    memory/recall dial; without it, state is the full inverted index (≈4
    entries per distinct document), the exact-recall mode for bounded
    backfills.

    **Rewrite amplification — size ``n_shards`` to the corpus.** Sharding
    trades per-group Python overhead for state-write granularity: each
    touched shard's whole sub-index is deserialized and re-serialized per
    micro-batch (``applyInPandasWithState`` state is one value per key), so
    the per-batch serialization cost is O(distinct_docs · N_BANDS /
    (N_BANDS · n_shards)) per touched shard — without a TTL that grows
    linearly with everything ever ingested, quadratic over the stream's
    lifetime. For unbounded ingest either set ``bucket_ttl_ms`` (bounds the
    sub-index, making rewrites O(recent docs / n_shards)) or scale
    ``n_shards ≈ expected_distinct_docs / 512`` so a shard rewrite stays a
    few tens of KB (the default 64 suits ≲50k-doc backfills). n_shards is a
    state-key namespace: changing it across restarts of the same checkpoint
    orphans old shards — pick it before first start. Re-delivery-only
    batches skip the rewrite entirely (dirty tracking below), and without a
    TTL arrivals of already-indexed docs never rewrite the shard.
    """
    ensure_package_on_workers(doc_stream.sparkSession)
    import time as _time
    import zlib

    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    def to_buckets(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # NULL ids can't participate in pairs (batch joins drop them);
            # NULL/short texts are dropped inside the signature kernel —
            # same rules as band_signatures_py, but batched+vectorized
            out_ids, out_bands, out_sigs = band_signatures_batch(
                pdf[id_col], pdf[text_col], n
            )
            yield pd.DataFrame(
                {
                    "doc_id": out_ids,
                    "band": out_bands,
                    "band_sig": out_sigs,
                    "shard": [
                        zlib.crc32(s.encode()) % n_shards for s in out_sigs
                    ],
                }
            )

    buckets = doc_stream.mapInPandas(
        to_buckets, schema="doc_id LONG, band INT, band_sig STRING, shard INT"
    )

    def shard_fn(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        if bucket_ttl_ms is not None and state.hasTimedOut:
            state.remove()
            return
        index: dict = json.loads(state.get[0]) if state.exists else {}
        now_ms = int(_time.time() * 1000)
        dirty = not state.exists  # first write must materialize the key
        if bucket_ttl_ms is not None:
            pruned = {
                s: v
                for s, v in index.items()
                if v[0] >= now_ms - bucket_ttl_ms
            }
            if len(pruned) != len(index):
                dirty = True
            index = pruned
        rows: list[tuple[str, int]] = []
        for pdf in pdfs:
            rows.extend(zip(pdf["band_sig"], (int(x) for x in pdf["doc_id"])))
        new_a, prior_b = [], []
        # membership via per-signature sets: hot signatures are exactly
        # where LSH skews (near-dup clusters share band signatures), and a
        # list `in` scan would make every arrival — including re-deliveries
        # after checkpoint recovery, which emit nothing — O(cluster size).
        # The ordered list stays the stored/emission order.
        member_sets: dict[str, set] = {}
        # (sig, id) sort keeps emission order deterministic per micro-batch,
        # exactly as the per-signature grouping did
        for sig, doc_id in sorted(rows):
            entry = index.get(sig)
            if entry is None:
                entry = index[sig] = [now_ms, []]
                dirty = True
            if bucket_ttl_ms is not None and entry[0] != now_ms:
                # last-seen freshness only matters to the TTL pruner; not
                # stamping it in no-TTL mode lets re-delivery-only batches
                # skip the shard rewrite entirely
                entry[0] = now_ms
                dirty = True
            ids = entry[1]
            seen = member_sets.get(sig)
            if seen is None:
                seen = member_sets[sig] = set(ids)
            if doc_id in seen:  # re-delivery / same-batch duplicate
                continue
            new_a.extend([doc_id] * len(ids))
            prior_b.extend(ids)
            ids.append(doc_id)
            seen.add(doc_id)
            dirty = True
        if dirty:
            state.update((json.dumps(index),))
        if bucket_ttl_ms is not None:
            state.setTimeoutDuration(bucket_ttl_ms)
        if new_a:
            yield pd.DataFrame({"id_new": new_a, "id_prior": prior_b})

    return buckets.groupBy("band", "shard").applyInPandasWithState(
        shard_fn,
        outputStructType="id_new LONG, id_prior LONG",
        stateStructType="state STRING",
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if bucket_ttl_ms is not None
            else GroupStateTimeout.NoTimeout
        ),
    )
