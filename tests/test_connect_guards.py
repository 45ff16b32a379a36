"""Spark Connect capability guards (VERDICT r4 "Next round" #3).

Connect DataFrames expose no ``_jdf``/``_jvm``/``_sc``/``rdd``; the
metadata-routing layer must degrade to conservative defaults instead of
crashing with AttributeError at plan-build time. No Connect server exists
in this container, so the tests drive the guards through a proxy that
hides exactly the classic-JVM attributes Connect lacks.
"""

from __future__ import annotations

import pytest

_CONNECT_MISSING = ("_jdf", "_jvm", "_sc", "rdd")


class _ConnectLike:
    """Delegates to a real DataFrame but raises AttributeError for the
    classic-JVM-only attributes, like a Connect DataFrame does."""

    def __init__(self, df):
        object.__setattr__(self, "_df", df)

    def __getattr__(self, name):
        if name in _CONNECT_MISSING:
            raise AttributeError(
                f"'ConnectDataFrame' object has no attribute '{name}'"
            )
        return getattr(object.__getattribute__(self, "_df"), name)


def test_estimate_rows_degrades_on_connect(spark):
    from fluvii_spark.operators.stats import (
        CONNECT_FALLBACK_ROWS,
        estimate_rows,
        plan_stats_available,
    )

    df = spark.range(100)
    assert plan_stats_available(df)
    assert estimate_rows(df) > 0

    proxy = _ConnectLike(df)
    assert not plan_stats_available(proxy)
    assert estimate_rows(proxy) == CONNECT_FALLBACK_ROWS


def test_partitions_for_rows_moderate_on_fallback():
    from fluvii_spark.operators.stats import (
        CONNECT_FALLBACK_ROWS,
        partitions_for_rows,
    )

    # the documented contract: the fallback yields a MODERATE hint,
    # neither a serializing 1 nor a scheduler-flooding explosion
    p = partitions_for_rows(CONNECT_FALLBACK_ROWS)
    assert 1 < p <= 64


def test_byte_budget_repartition_degrades_on_connect(spark):
    from fluvii_spark.operators.multimodal import _byte_budget_repartition

    df = spark.range(1000).selectExpr("id", "repeat('x', 100) AS payload")
    proxy = _ConnectLike(df)
    out = _byte_budget_repartition(proxy, target_partition_mb=64)
    # fallback keeps the source parallelism untouched (ADVICE r5: a blind
    # repartition to shuffle.partitions could REDUCE partition count on a
    # large media scan, reintroducing the giant-partition OOM) — the guard
    # must return the input as-is, not crash and not shuffle
    assert out is proxy
    assert out.count() == 1000


def test_explain_str_falls_back_to_printed_explain(spark):
    from fluvii_spark.planshape import audit, explain_str

    df = spark.range(10).selectExpr("id % 3 AS k").groupBy("k").count()
    fast = explain_str(df)
    slow = explain_str(_ConnectLike(df))
    assert "== Physical Plan ==" in slow
    # both paths must feed audit() the same shape
    assert audit(fast)["exchanges"] == audit(slow)["exchanges"]


def test_q118_plan_builds_without_jvm_stats(spark, sf_dir, monkeypatch):
    """q118's recursion anchor sizes its REPARTITION hint via
    estimate_rows; on Connect that must fall back, not crash."""
    import fluvii_spark.operators.stats as stats_mod
    from fluvii_spark.queries import registry

    real = stats_mod.estimate_rows

    def connectish(df, fallback_bytes_per_row: int = 100):
        return real(_ConnectLike(df), fallback_bytes_per_row)

    # q118 imports estimate_rows from the stats module at call time —
    # patch it there
    monkeypatch.setattr(stats_mod, "estimate_rows", connectish)
    q = registry()["q118_recursive_hierarchy"]
    df = q.fn(spark, sf_dir)
    assert df.count() > 0


class _ConnectSession:
    """Session-shaped double: sparkContext raises (like Connect), and the
    Connect artifact API records what was shipped."""

    def __init__(self):
        self.artifacts = []

    @property
    def sparkContext(self):
        raise Exception("sparkContext is not supported in Spark Connect")

    def addArtifact(self, path, pyfile=False):
        self.artifacts.append((path, pyfile))


def test_package_ships_via_connect_artifact_api():
    from fluvii_spark.session import ensure_package_on_workers

    s = _ConnectSession()
    ensure_package_on_workers(s)
    assert len(s.artifacts) == 1 and s.artifacts[0][1] is True
    assert s.artifacts[0][0].endswith(".zip")
    # idempotent per session object
    ensure_package_on_workers(s)
    assert len(s.artifacts) == 1


def test_package_shipping_connect_failure_warns_once():
    import warnings

    from fluvii_spark.session import ensure_package_on_workers

    class _Broken(_ConnectSession):
        def addArtifact(self, path, pyfile=False):
            raise RuntimeError("no artifact endpoint")

    s = _Broken()
    with warnings.catch_warnings(record=True) as rec:
        warnings.simplefilter("always")
        ensure_package_on_workers(s)
        assert not getattr(s, "_fluvii_pkg_shipped", False)  # retryable
        ensure_package_on_workers(s)
        assert not getattr(s, "_fluvii_pkg_shipped", False)
        ensure_package_on_workers(s)
        assert getattr(s, "_fluvii_pkg_shipped", False)  # latched on 3rd
    ship = [w for w in rec if "package shipping" in str(w.message)]
    assert len(ship) == 1


def test_memo_key_degrades_on_connect(spark):
    from fluvii_spark.queries.llm import _memo_key

    classic = _memo_key(spark, "/data/sf0.01")
    assert classic == (spark.sparkContext.applicationId, "/data/sf0.01")
    # Connect fallback: a uuid token stamped on the session object —
    # stable across calls for the SAME object, never equal for a NEW
    # session object (id() could alias a GC'd session's reused address)
    s = _ConnectSession()
    k1 = _memo_key(s, "/data/sf0.01")
    assert k1 == (_memo_key(s, "/data/sf0.01")[0], "/data/sf0.01")
    assert k1[0] == getattr(s, "_fluvii_memo_token")
    s2 = _ConnectSession()
    assert _memo_key(s2, "/data/sf0.01")[0] != k1[0]
