"""Streaming sketches: bounded-state approximate aggregates per key.

KMV (k-minimum-values) is the sketch the batch inventory checks exactly
(q102/q104: md5-uniform hashes make it bit-deterministic, so the DuckDB
oracle verifies the sketch itself). The streaming form keeps the SAME
O(k) state per key in the checkpointed state store: folding a hash into a
k-min set is commutative and idempotent, so the streaming result equals the
batch sketch on the same data regardless of arrival order, micro-batching,
or replay — the property that makes the sketch safe under Spark's
restart/recovery semantics (a replayed batch re-inserts hashes that are
already in the set).

No reference counterpart (fluvii state is a user-managed JSON blob —
SURVEY.md §2.1 ST1-ST3); this composes the reference's keyed-fold contract
with the q102 sketch definition.
"""

from __future__ import annotations

import bisect
import heapq
import math
import sys

from pyspark.sql import DataFrame

from fluvii_spark.session import ensure_package_on_workers
from pyspark.sql import functions as F

from fluvii_spark.streaming.state import streaming_keyed_fold

try:  # ship by value — executors may lack the package path (see state.py)
    from pyspark import cloudpickle as _cp

    _cp.register_pickle_by_value(sys.modules[__name__])
except Exception:  # pragma: no cover
    pass

KMV_K = 64


def _run_keyed_sketch(
    df: DataFrame,
    key_cols: str | list[str],
    value_cols: list[str],
    app,
    out_fields: str,
    order_by: list[str] | None,
    backend: str,
    timeout_ms: int | None = None,
    on_timeout=None,
) -> DataFrame:
    """Shared dispatch for every sketch fold: backend selection, key-typed
    output schema, and a projection that keeps the order_by columns — one
    place to fix instead of one copy per sketch. Accepts a single key
    column or a composite key list (the underlying folds group by
    multi-column keys natively). ``timeout_ms``/``on_timeout`` arm per-key
    idle timers (v1 backend; v2 maps timeout_ms onto its ttl contract and
    REJECTS on_timeout, which it cannot honor)."""
    ensure_package_on_workers(df.sparkSession)
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    if backend == "v2":  # transformWithStateInPandas (typed state, RocksDB)
        if on_timeout is not None:
            raise ValueError(
                "on_timeout is not supported on the v2 backend (its ttl "
                "drops state without a callback) — use backend='v1'"
            )
        from fluvii_spark.streaming.state_v2 import streaming_keyed_fold_v2

        fold = streaming_keyed_fold_v2
    else:
        fold = streaming_keyed_fold
    # derive each key's output type from the input schema — a bigint
    # user_id must not be silently re-typed to string by the output
    # contract
    key_fields = ", ".join(
        f"{c} {df.schema[c].dataType.simpleString()}" for c in keys
    )
    cols = [
        *keys,
        *value_cols,
        *(
            c
            for c in (order_by or [])
            if c not in keys and c not in value_cols
        ),
    ]
    kwargs = {}
    if timeout_ms is not None:
        if backend == "v2":
            kwargs["ttl_ms"] = timeout_ms
        else:
            kwargs["timeout_ms"] = timeout_ms
            if on_timeout is not None:
                kwargs["on_timeout"] = on_timeout
    return fold(
        df.select(*cols),
        keys,
        app,
        output_schema=f"{key_fields}, {out_fields}",
        order_by=order_by,
        **kwargs,
    )


def streaming_kmv_distinct(
    df: DataFrame,
    key_col: str,
    hash_col: str,
    k: int = KMV_K,
    order_by: list[str] | None = None,
    backend: str = "v1",
) -> DataFrame:
    """Streaming KMV distinct-count estimate per key.

    ``hash_col`` must be a uniform [0, 1) hash of the counted value (use the
    q102 convention: ``conv(substr(md5(v), 1, 8), 16, 10) / 2^32`` so batch
    and stream agree bit-for-bit). State per key is the ascending list of
    the k smallest DISTINCT hashes — O(k) forever, mergeable. Emits
    ``(key, n_kept, estimate)`` per message; ``(n_kept, estimate)`` is
    non-decreasing over a key's lifetime, so the row with the maximum
    estimate is the current one.
    """

    def app(txn) -> None:
        st = txn.read_table_entry() or []
        h = txn.value()[hash_col]
        i = bisect.bisect_left(st, h)
        if not (i < len(st) and st[i] == h):  # set-insert: replay-idempotent
            st.insert(i, h)
            del st[k:]
            txn.update_table_entry(st)
        n = len(st)
        est = float(n) if n < k else (k - 1) / st[-1]
        txn.produce({key_col: txn.key, "n_kept": n, "estimate": est})

    return _run_keyed_sketch(
        df,
        key_col,
        [hash_col],
        app,
        "n_kept long, estimate double",
        order_by,
        backend,
    )


MG_COUNTERS = 8


def misra_gries_fold(st: dict[str, int], item: str, m: int) -> dict[str, int]:
    """One Misra-Gries step: O(m) state, deterministic.

    Counter present → increment; room free → admit at 1; full → decrement
    every counter, dropping zeros (the classic frequency-bound step). After
    n arrivals every item with true count > n/m is guaranteed present, and
    est_count ∈ [true - n/m, true]. Shared by the streaming operator and
    the batch/Python parity check in tests so both run literally this code.
    """
    if item in st:
        st[item] += 1
    elif len(st) < m:
        st[item] = 1
    else:
        for t in list(st):
            st[t] -= 1
            if st[t] == 0:
                del st[t]
    return st


MRL_K = 64


def mrl_insert(levels: list[list[float]], x: float, k: int) -> None:
    """One MRL/KLL-style quantile-sketch insertion: O(k·log n) state.

    ``levels[i]`` holds values each representing ``2^i`` originals. A level
    reaching ``2k`` items is compacted: sort, promote every second element
    (fixed offset 0 — DETERMINISTIC, trading KLL's randomized-offset
    unbiasedness for the replay-stable trajectories this engine's state
    contract wants), clear, cascade. Worst-case rank error after n inserts
    is bounded by ``sum over compactions of 2^level ≤ n·log2(n/k)/(2k)``
    — the classic MRL bound; k=64 keeps it ~1-2% of n at stream scale.
    Shared by the streaming operator and the tests' Python replay so both
    run literally this code.
    """
    # every level is kept SORTED at all times: level 0 via bisect-insert
    # (len <= 2k, cheap), promotions via merge of two sorted lists — so
    # compaction needs no sort and the per-message quantile query below is
    # a merge, not an O(S log S) re-sort of the whole sketch
    bisect.insort(levels[0], x)
    i = 0
    while len(levels[i]) >= 2 * k:
        promoted = levels[i][0::2]  # already sorted
        levels[i] = []
        if i + 1 == len(levels):
            levels.append([])
        levels[i + 1] = list(heapq.merge(levels[i + 1], promoted))
        i += 1


def mrl_quantile(levels: list[list[float]], q: float) -> float | None:
    """Estimate the q-quantile: weighted rank via a merge of the (already
    sorted) levels — O(S log L) per call, no re-sort."""
    total = sum(len(buf) << lvl for lvl, buf in enumerate(levels))
    if total == 0:
        return None
    target = q * total
    acc = 0
    last = None
    # bind (lvl, buf) eagerly per level — a nested generator expression
    # would late-bind the loop variables and read every level as the last
    iters = [
        [(v, 1 << lvl) for v in buf] for lvl, buf in enumerate(levels)
    ]
    for v, w in heapq.merge(*iters):
        acc += w
        last = v
        if acc >= target:
            return v
    return last


def streaming_quantile(
    df: DataFrame,
    key_col: str,
    value_col: str,
    q: float = 0.5,
    k: int = MRL_K,
    order_by: list[str] | None = None,
    backend: str = "v1",
) -> DataFrame:
    """Streaming quantile estimate per key with bounded state — the third
    leg of the sketch trio (KMV = distinct count, Misra-Gries = frequency,
    MRL = quantiles). Exact streaming quantiles need O(n) state per key;
    the MRL sketch keeps O(k·log n) with a provable rank-error bound and a
    deterministic (fixed-offset) compaction. Emits ``(key, n_seen,
    estimate, n_stored)`` per arrival; the row with max n_seen per key is
    the current sketch state.

    Like Misra-Gries (and unlike KMV) the fold is ORDER-SENSITIVE: pass
    ``order_by`` for a deterministic, replay-stable trajectory — without
    it, per-key arrival order within a micro-batch follows shuffle
    nondeterminism and a restart can re-emit different estimates.
    NULL/NaN values are skipped entirely (no state change, no emission),
    matching percentile_cont's NULL semantics — a NaN inside the sketch
    would break sorted-order invariants silently.
    """

    def app(txn) -> None:
        raw = txn.value()[value_col]
        if raw is None:
            return
        x = float(raw)
        if math.isnan(x) or math.isinf(x):
            return
        env = txn.read_table_entry() or {"n": 0, "levels": [[]]}
        mrl_insert(env["levels"], x, k)
        env["n"] += 1
        txn.update_table_entry(env)
        txn.produce(
            {
                key_col: txn.key,
                "n_seen": env["n"],
                "estimate": mrl_quantile(env["levels"], q),
                "n_stored": sum(len(b) for b in env["levels"]),
            }
        )

    return _run_keyed_sketch(
        df,
        key_col,
        [value_col],
        app,
        "n_seen long, estimate double, n_stored long",
        order_by,
        backend,
    )


def streaming_heavy_hitters(
    df: DataFrame,
    key_col: str,
    item_col: str,
    m: int = MG_COUNTERS,
    order_by: list[str] | None = None,
    backend: str = "v1",
) -> DataFrame:
    """Streaming Misra-Gries heavy hitters per key: O(m) state forever.

    The streaming twin of the batch q142 heavy-hitter support query — where
    the batch side can afford an exact token groupBy, an unbounded stream
    cannot keep a counter per distinct item; Misra-Gries bounds state at m
    counters per key while guaranteeing every item above n/m frequency is
    tracked. Emits ``(key, item, est_count, n_seen, n_tracked)`` per arrival
    (est_count = the arriving item's current counter, 0 if it was absorbed
    by a decrement round).

    NULL items are skipped entirely (no state change, no emission), like
    :func:`streaming_quantile`'s NULL-skip. Non-string item columns are
    deliberately stringified in the output: MG counters live as dict keys in
    the JSON-serialized state entry, so the item's state identity IS its
    string form — emitting the same form keeps output == state. Cast
    upstream if a typed item column is required downstream.

    Unlike KMV (insertion commutes) the MG fold is order-sensitive, so pass
    ``order_by`` for a deterministic trajectory; state commits atomically
    with each micro-batch so restart/replay re-applies to the pre-batch
    state (no double counting) — the reference's EOS commit contract
    (fluvii/apps/transactions/transaction.py) mapped onto the state store.
    """

    return _run_keyed_sketch(
        df,
        key_col,
        [item_col],
        _mg_app(key_col, item_col, m),
        f"{item_col} string, est_count long, n_seen long, n_tracked long",
        order_by,
        backend,
    )


def _mg_app(key_cols: str | list[str], item_col: str, m: int):
    """The Misra-Gries per-message fold app, shared by the plain and the
    windowed (trending) operators. ``txn.key`` is a scalar for one key
    column and a tuple for composite keys."""
    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)

    def app(txn) -> None:
        raw = txn.value()[item_col]
        if raw is None:
            # NULL items are skipped entirely (no state change, no emission),
            # mirroring streaming_quantile's NULL-skip — str(None) would
            # count the literal 'None' as a real heavy-hitter key.
            return
        env = txn.read_table_entry() or {"n": 0, "c": {}}
        item = str(raw)
        env["c"] = misra_gries_fold(env["c"], item, m)
        env["n"] += 1
        txn.update_table_entry(env)
        kv = txn.key if isinstance(txn.key, tuple) else (txn.key,)
        row = dict(zip(keys, kv))
        row.update(
            {
                item_col: item,
                "est_count": env["c"].get(item, 0),
                "n_seen": env["n"],
                "n_tracked": len(env["c"]),
            }
        )
        txn.produce(row)

    return app


def streaming_trending(
    df: DataFrame,
    key_col: str,
    item_col: str,
    ts_col: str,
    window: str = "1 hour",
    m: int = MG_COUNTERS,
    order_by: list[str] | None = None,
    window_ttl_ms: int | None = None,
    backend: str = "v1",
) -> DataFrame:
    """Windowed heavy hitters — the "trending now" view: Misra-Gries
    counters per (key, event-time window), O(m) state per ACTIVE window.

    Runs the proven :func:`streaming_heavy_hitters` fold over the NATIVE
    composite key (key_col, window_start) — the state folds support
    multi-column keys directly, so NULL keys, arbitrary key contents, and
    the key's dtype all round-trip exactly (no string-concat encoding).
    Output columns: ``(key_col, window_start, item, est_count, n_seen,
    n_tracked)`` per arrival; rows with a NULL event time are dropped
    (they belong to no window).

    ``window_ttl_ms`` is a PROCESSING-TIME idle timer per (key, window):
    a sketch that sees no arrivals for that long is evicted, bounding
    total state by the TTL horizon instead of stream lifetime. Set it
    comfortably above the window duration plus the largest expected
    arrival gap — an ACTIVE window that idles past the TTL is evicted
    too, and its next arrival restarts the sketch from empty.
    """
    keyed = df.filter(F.col(ts_col).isNotNull()).withColumn(
        "window_start", F.window(F.col(ts_col), window).getField("start")
    )
    return _run_keyed_sketch(
        keyed,
        [key_col, "window_start"],
        [item_col],
        _mg_app([key_col, "window_start"], item_col, m),
        f"{item_col} string, est_count long, n_seen long, n_tracked long",
        order_by,
        backend,
        timeout_ms=window_ttl_ms,
    )


# HLL constants — MUST mirror queries/relational_ext6.py (q147/q213): the
# streaming registers are checked bit-equal against the batch sketch.
HLL_B = 6
HLL_M = 1 << HLL_B
HLL_W = 32 - HLL_B
HLL_DIV = 1 << HLL_W
HLL_ALPHA = 0.709


def hll_estimate_from_registers(regs: dict) -> float:
    """q147's estimator over sparse registers {idx: m_j}: alpha * m^2 /
    (sum of 2^-m_j + one 1.0 per empty register). Every term is a dyadic
    rational with exponent >= -(W+1) and the total is < m, so the double
    sum is EXACT in any order — Python here, Spark SQL in q147, DuckDB in
    the oracle all produce the identical bits."""
    z = sum(2.0 ** -mj for mj in regs.values()) + (HLL_M - len(regs)) * 1.0
    return HLL_ALPHA * HLL_M * HLL_M / z


def streaming_hll_distinct(
    df: DataFrame,
    key_col: str,
    hash_col: str,
    order_by: list[str] | None = None,
    backend: str = "v1",
) -> DataFrame:
    """Streaming HLL distinct-count estimate per key — the batch q147
    sketch kept incrementally.

    ``hash_col`` must be the q147 convention: the md5 first-8-hex 32-bit
    integer (``conv(substr(md5(v), 1, 8), 16, 10)`` as BIGINT). State per
    key is the sparse register map {index: max rank} — at most m=64
    entries forever, mergeable by register-wise max (q213 proves that
    merge lossless in batch). Folding is commutative and idempotent
    (register max), so arrival order, micro-batching, and checkpoint
    replay cannot change the result: the final registers — and therefore
    the estimate — are bit-equal to the batch sketch on the same items.
    Emits ``(key, n_regs, estimate)`` per message; both are non-decreasing
    over a key's lifetime (registers only grow), so max(estimate) is the
    current value.
    """

    def app(txn) -> None:
        st: dict = txn.read_table_entry() or {}
        raw = txn.value()[hash_col]
        # batch q147 drops NULL values via hash/distinct semantics — mirror
        # that: a NULL/NaN hash skips the fold AND the emission (no state
        # change happened, so a row here would be a duplicate no-op and
        # output counts would stop matching folded-event counts)
        if raw is None or (isinstance(raw, float) and math.isnan(raw)):
            return
        h = int(raw)
        idx = str(h // HLL_DIV)  # str keys: JSON-stable state
        rank_word = h % HLL_DIV
        rho = (
            HLL_W + 1
            if rank_word == 0
            else HLL_W - rank_word.bit_length() + 1
        )
        if rho > st.get(idx, 0):  # register-max: replay-idempotent
            st[idx] = rho
            txn.update_table_entry(st)
        txn.produce(
            {
                key_col: txn.key,
                "n_regs": len(st),
                "estimate": hll_estimate_from_registers(st),
            }
        )

    return _run_keyed_sketch(
        df,
        key_col,
        [hash_col],
        app,
        "n_regs long, estimate double",
        order_by,
        backend,
    )
