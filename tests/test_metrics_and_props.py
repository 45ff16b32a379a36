"""Metrics listener against a live streaming query + property-based Avro
codec roundtrips (hypothesis)."""

from __future__ import annotations

import time

import pytest

from hypothesis import example, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_table
from fluvii_spark.metrics import GaugeSet, FluviiMetricsListener
from fluvii_spark.serde.avro_codec import AvroCodec

# ---------------------------------------------------------------------------
# metrics listener on a real query
# ---------------------------------------------------------------------------


def test_metrics_listener_counts_consumed(spark, sf_dir, tmp_path):
    gauges = GaugeSet("test-app")
    listener = FluviiMetricsListener(gauges)
    spark.streams.addListener(listener)
    try:
        d = str(tmp_path / "ev")
        load_table(spark, sf_dir, "events").withColumn(
            "ts", F.col("ts").cast("timestamp")
        ).coalesce(2).write.parquet(d)
        schema = spark.read.parquet(d).schema
        src = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(d)
        )
        q = (
            src.writeStream.format("memory")
            .outputMode("append")
            .queryName("metrics_probe")
            .option("checkpointLocation", str(tmp_path / "ck"))
            .start()
        )
        q.processAllAvailable()
        q.stop()
        total = spark.read.parquet(d).count()
        # listener events are delivered asynchronously
        deadline = time.time() + 30
        while time.time() < deadline:
            if gauges.get("messages_consumed") >= total:
                break
            time.sleep(0.25)
        assert gauges.get("messages_consumed") == total
    finally:
        spark.streams.removeListener(listener)


# ---------------------------------------------------------------------------
# property-based codec roundtrips
# ---------------------------------------------------------------------------

RECORD_SCHEMA = {
    "type": "record",
    "name": "P",
    "fields": [
        {"name": "s", "type": "string"},
        {"name": "i", "type": "long"},
        {"name": "d", "type": "double"},
        {"name": "b", "type": "boolean"},
        {"name": "maybe", "type": ["null", "string"]},
        {"name": "tags", "type": {"type": "array", "items": "long"}},
        {"name": "attrs", "type": {"type": "map", "values": "string"}},
    ],
}

_text = st.text(max_size=80)


@settings(max_examples=200, deadline=None)
@given(
    s=_text,
    i=st.integers(min_value=-(2**62), max_value=2**62),
    d=st.floats(allow_nan=False, allow_infinity=False, width=64),
    b=st.booleans(),
    maybe=st.none() | _text,
    tags=st.lists(st.integers(min_value=-(2**31), max_value=2**31), max_size=8),
    attrs=st.dictionaries(_text.filter(bool), _text, max_size=6),
)
def test_avro_record_roundtrip_property(s, i, d, b, maybe, tags, attrs):
    c = AvroCodec(RECORD_SCHEMA)
    rec = {
        "s": s,
        "i": i,
        "d": d,
        "b": b,
        "maybe": maybe,
        "tags": tags,
        "attrs": attrs,
    }
    assert c.decode(c.encode(rec)) == rec


@settings(max_examples=200, deadline=None)
@given(st.integers(min_value=-(2**63), max_value=2**63 - 1))
def test_avro_long_roundtrip_property(v):
    c = AvroCodec("long")
    assert c.decode(c.encode(v)) == v


# ---------------------------------------------------------------------------
# metrics pushgateway loop (reference metrics_pusher.py:44-66)
# ---------------------------------------------------------------------------


def test_metrics_pusher_pushes_to_all_gateways_and_stops():
    import time

    from fluvii_spark.config import MetricsPusherConfig
    from fluvii_spark.metrics import MetricsPusher

    cfg = MetricsPusherConfig(hostname="app-1", push_rate_seconds=0.02)
    pushed = []
    pusher = MetricsPusher(
        registry=object(),
        config=cfg,
        resolve_fn=lambda: {"10.0.0.1:9091", "10.0.0.2:9091"},
        push_fn=lambda gw: pushed.append(gw),
    )
    pusher.start()
    deadline = time.time() + 2
    while time.time() < deadline and pushed.count("10.0.0.1:9091") < 2:
        time.sleep(0.01)
    pusher.stop()
    assert pushed.count("10.0.0.1:9091") >= 2
    assert pushed.count("10.0.0.2:9091") >= 2
    n = len(pushed)
    time.sleep(0.1)
    assert len(pushed) == n  # stop() actually stops the loop


def test_metrics_pusher_failed_push_triggers_reresolve():
    from fluvii_spark.config import MetricsPusherConfig
    from fluvii_spark.metrics import MetricsPusher

    cfg = MetricsPusherConfig(push_rate_seconds=999)
    resolutions = []

    def resolve():
        resolutions.append(1)
        return {"gw-a:9091", "gw-b:9091"}

    ok = []

    def push(gw):
        if gw == "gw-a:9091":
            raise ConnectionError("down")
        ok.append(gw)

    pusher = MetricsPusher(registry=object(), config=cfg, resolve_fn=resolve, push_fn=push)
    pusher._set_metrics_pod_ips()
    n0 = len(resolutions)
    pusher._push_metrics()
    assert ok == ["gw-b:9091"]
    assert len(resolutions) > n0  # failure re-resolved the service


def test_metrics_pusher_config_env(monkeypatch):
    from fluvii_spark.config import MetricsPusherConfig

    monkeypatch.setenv("FLUVII_SPARK_METRICS_PUSHER_HOSTNAME", "pod-7")
    monkeypatch.setenv("FLUVII_SPARK_METRICS_PUSHER_PUSH_RATE_SECONDS", "3")
    cfg = MetricsPusherConfig()
    assert cfg.hostname == "pod-7"
    assert cfg.push_rate_seconds == 3.0


# ---------------------------------------------------------------------------
# property: shingle pair stats == pure-Python set arithmetic
# ---------------------------------------------------------------------------

_WORDS = ["a", "b", "c", "d", "e"]


@settings(max_examples=8, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from(_WORDS), min_size=0, max_size=10),
        min_size=2,
        max_size=8,
    )
)
def test_ngram_pair_stats_matches_set_arithmetic(spark, token_lists):
    """Random tiny corpora (heavy shingle collisions by construction):
    Spark's candidate stats must equal exact per-pair set intersections,
    and Jaccard/containment must follow from them."""
    from fluvii_spark.operators.dedup import (
        containment_from_stats,
        jaccard_from_stats,
        ngram_pair_stats,
    )

    docs = [(i, " ".join(toks)) for i, toks in enumerate(token_lists)]
    py_sh = {
        i: {
            " ".join(toks[j : j + 3])
            for j in range(len(toks) - 2)
        }
        for i, toks in enumerate(token_lists)
    }
    expect = {}
    for a in py_sh:
        for b in py_sh:
            if a < b and py_sh[a] & py_sh[b]:
                expect[(a, b)] = (
                    len(py_sh[a] & py_sh[b]),
                    len(py_sh[a]),
                    len(py_sh[b]),
                )
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    stats = ngram_pair_stats(df, max_doc_freq=None).persist()
    got = {
        (r["id_a"], r["id_b"]): (r["n_common"], r["n_a"], r["n_b"])
        for r in stats.collect()
    }
    assert got == expect
    for r in jaccard_from_stats(stats, 0.0).collect():
        c, na, nb = expect[(r["id_a"], r["id_b"])]
        assert r["jaccard"] == pytest.approx(c / (na + nb - c))
    for r in containment_from_stats(stats, 0.0).collect():
        c, na, nb = expect[(r["id_a"], r["id_b"])]
        assert r["containment"] == pytest.approx(c / min(na, nb))
    stats.unpersist()


@given(
    st.lists(
        st.floats(
            min_value=-1e6,
            max_value=1e6,
            allow_nan=False,
            allow_infinity=False,
        ),
        min_size=1,
        max_size=600,
    ),
    st.sampled_from([4, 8, 16]),
    st.sampled_from([0.1, 0.5, 0.9]),
)
@example(xs=[0.0] * 6, k=4, q=0.1)
@settings(max_examples=60, deadline=None)
def test_mrl_fold_rank_error_and_state_bound(xs, k, q):
    """Property: for ANY finite input stream and probe point, the MRL fold's
    estimate is an input value whose rank error is within the classic MRL
    bound, and stored state stays O(k·log n)."""
    import math

    from fluvii_spark.streaming.sketch import mrl_insert, mrl_quantile

    levels: list[list[float]] = [[]]
    for x in xs:
        mrl_insert(levels, float(x), k)
    est = mrl_quantile(levels, q)
    n = len(xs)
    assert est in set(float(x) for x in xs)
    xs_sorted = sorted(float(x) for x in xs)
    # Duplicates make the estimate occupy a RUN of ranks
    # [lower, upper]; rank error is the distance from the target to
    # the NEAREST rank in that run (a tie-unaware upper rank falsely
    # flags any all-duplicate stream longer than ~k+1).
    lower = sum(1 for v in xs_sorted if v < est) + 1
    upper = sum(1 for v in xs_sorted if v <= est)
    target = q * n
    rank = min(max(target, lower), upper)
    eps = math.log2(max(n / k, 2)) / (2 * k)
    assert abs(rank - target) <= max(eps * n, 1) + k, (n, k, q, lower, upper)
    stored = sum(len(b) for b in levels)
    assert stored <= 2 * k * (math.log2(max(n, 2)) + 2)
    # levels stay sorted (the invariant the merge-based query relies on)
    for buf in levels:
        assert buf == sorted(buf)


@given(
    st.lists(
        st.integers(min_value=0, max_value=30).map(str),
        min_size=1,
        max_size=800,
    ),
    st.sampled_from([2, 4, 8]),
)
@settings(max_examples=60, deadline=None)
def test_misra_gries_fold_guarantees(items, m):
    """Property: after ANY stream, (a) every item with true count > n/m is
    tracked, (b) every tracked estimate lies in [true - n/m, true],
    (c) at most m counters exist."""
    from collections import Counter

    from fluvii_spark.streaming.sketch import misra_gries_fold

    st_: dict = {}
    for it in items:
        st_ = misra_gries_fold(st_, it, m)
    n = len(items)
    truth = Counter(items)
    assert len(st_) <= m
    for it, cnt in truth.items():
        if cnt > n / m:
            assert it in st_, (it, cnt, n, m)
    for it, est in st_.items():
        assert truth[it] - n / m <= est <= truth[it], (it, est, truth[it])


@given(
    st.lists(
        st.floats(
            min_value=0.0,
            max_value=1.0,
            exclude_max=True,
            allow_nan=False,
        ),
        min_size=1,
        max_size=300,
    ),
    st.randoms(use_true_random=False),
)
@settings(max_examples=60, deadline=None)
def test_kmv_fold_order_invariance(hashes, rnd):
    """Property: the KMV k-min state after ANY insertion order (with
    duplicates re-inserted) equals sorted(set(hashes))[:k] — the
    commutativity + replay-idempotence claim the streaming operator's
    exactly-once story rests on."""
    import bisect

    k = 16

    def fold(seq):
        st_: list[float] = []
        for h in seq:
            i = bisect.bisect_left(st_, h)
            if not (i < len(st_) and st_[i] == h):
                st_.insert(i, h)
                del st_[k:]
        return st_

    shuffled = list(hashes) + list(hashes)[: len(hashes) // 2]  # replays
    rnd.shuffle(shuffled)
    assert fold(shuffled) == sorted(set(hashes))[:k]
    assert fold(hashes) == fold(sorted(hashes, reverse=True))


def test_two_gaugesets_coexist():
    """Regression: gauges registered in prometheus_client's default
    REGISTRY raised 'Duplicated timeseries' on the second GaugeSet in one
    process (session restart, two apps per driver). Each set now owns a
    private CollectorRegistry exposed for the pusher."""
    from fluvii_spark.metrics import GaugeSet

    g1 = GaugeSet("app-one")
    g2 = GaugeSet("app-one")  # same name — the old code crashed here
    g1.inc("messages_consumed", 2, topic="t")
    g2.inc("messages_consumed", 5, topic="t")
    assert g1.get("messages_consumed", "t") == 2
    assert g2.get("messages_consumed", "t") == 5
    # private registries (or None without prometheus_client), never shared
    if g1.registry is not None:
        assert g1.registry is not g2.registry
