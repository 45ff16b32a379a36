"""Skew toolkit: salted join equivalence, skew diagnosis, bucketed
shuffle-free joins."""

from __future__ import annotations

from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.operators.skew import (
    bucketed_join,
    key_skew_profile,
    salted_join,
    write_bucketed,
)


def test_salted_join_equals_plain_join(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    li = t.lineitem.select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    orders = t.orders.select("o_orderkey", "o_orderstatus")
    plain = li.join(orders, "o_orderkey").groupBy("o_orderstatus").agg(
        F.sum("l_quantity").alias("q"), F.count("*").alias("n")
    )
    salted = salted_join(li, orders, "o_orderkey", n_salts=8).groupBy(
        "o_orderstatus"
    ).agg(F.sum("l_quantity").alias("q"), F.count("*").alias("n"))
    a = {r["o_orderstatus"]: (r["q"], r["n"]) for r in plain.collect()}
    b = {r["o_orderstatus"]: (r["q"], r["n"]) for r in salted.collect()}
    assert a == b


def test_salted_left_join_keeps_unmatched(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    orders = t.orders.select("o_orderkey", "o_orderstatus")
    li = t.lineitem.select(
        F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
    )
    plain_n = orders.join(li, "o_orderkey", "left").count()
    salted_n = salted_join(orders, li, "o_orderkey", n_salts=4, how="left").count()
    # NOTE: small side here is the fact table only for test size; semantics
    # are what's under test
    assert plain_n == salted_n


def test_salted_join_rejects_right_join(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    try:
        salted_join(t.orders, t.customer, "o_custkey", how="right")
        raise AssertionError("should have raised")
    except ValueError as e:
        assert "inner/left" in str(e)


def test_key_skew_profile(spark, sf_dir):
    t = load_tables(spark, sf_dir)
    prof = key_skew_profile(t.lineitem, "l_suppkey", top_n=5).collect()
    assert len(prof) == 5
    shares = [r["share"] for r in prof]
    assert shares == sorted(shares, reverse=True)
    assert all(0 < s <= 1 for s in shares)


def test_bucketed_join_has_no_shuffle(spark, sf_dir, tmp_path):
    spark.sql("CREATE DATABASE IF NOT EXISTS bktest")
    spark.catalog.setCurrentDatabase("bktest")
    # at test scale both tables fit the broadcast threshold, which would
    # bypass bucketing entirely; disable broadcast so the plan shows the
    # 100 TB shape (two co-located bucketed scans, no Exchange)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    prev_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold", None)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
    t = load_tables(spark, sf_dir)
    write_bucketed(
        t.orders.select("o_orderkey", "o_totalprice"),
        "orders_b",
        "o_orderkey",
        n_buckets=8,
    )
    write_bucketed(
        t.lineitem.select(
            F.col("l_orderkey").alias("o_orderkey"), "l_quantity"
        ),
        "lineitem_b",
        "o_orderkey",
        n_buckets=8,
    )
    joined = bucketed_join(spark, "lineitem_b", "orders_b", "o_orderkey")
    plan = joined._sc._jvm.PythonSQLUtils.explainString(  # noqa: SLF001
        joined._jdf.queryExecution(), "formatted"
    )
    assert "Exchange" not in plan, plan
    assert "SortMergeJoin" in plan or "ShuffledHashJoin" in plan, plan
    # and it still answers correctly
    n = joined.count()
    expected = (
        t.lineitem.join(
            t.orders, t.lineitem.l_orderkey == t.orders.o_orderkey
        ).count()
    )
    assert n == expected
    spark.catalog.setCurrentDatabase("default")
    spark.sql("DROP TABLE IF EXISTS bktest.orders_b")
    spark.sql("DROP TABLE IF EXISTS bktest.lineitem_b")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
    if prev_aqe is not None:
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", prev_aqe)
