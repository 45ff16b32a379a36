"""The stress corpus builder (tools/stress_bench.py) is evidence
infrastructure: STRESS_BENCH_r6.json's growth exponents are only
meaningful if the K×-replicated corpus actually preserves referential
integrity and scales every relation exactly K×. This suite builds a K=2
replica of sf0.001 and proves it:

- every table has exactly K× the base rows;
- no foreign-key orphans (lineitem→orders/part/supplier, orders→customer,
  nation→region) anywhere in the replica corpus;
- key domains are disjoint across replicas (shifted keys never collide);
- SEMANTIC check: q07's revenue-per-region on the replica corpus equals
  exactly K× the base revenue per region (value columns replicate, keys
  shift — so every group must scale by precisely K).
"""

from __future__ import annotations

import os
import sys

import pytest
from pyspark.sql import functions as F

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from fluvii_spark.io.readers import TABLES
from fluvii_spark.queries import registry
from tools.stress_bench import build_replicated

K = 2


@pytest.fixture(scope="module")
def replica_dir(spark, sf_dir, tmp_path_factory) -> str:
    out = str(tmp_path_factory.mktemp("stress_rep"))
    build_replicated(spark, sf_dir, out, K)
    return out


def test_row_counts_scale_exactly(spark, sf_dir, replica_dir):
    for t in TABLES:
        base = spark.read.parquet(os.path.join(sf_dir, f"{t}.parquet")).count()
        big = spark.read.parquet(os.path.join(replica_dir, f"{t}.parquet")).count()
        assert big == K * base, f"{t}: {big} != {K}x{base}"


def test_no_foreign_key_orphans(spark, replica_dir):
    def tbl(name):
        return spark.read.parquet(os.path.join(replica_dir, f"{name}.parquet"))

    li, orders = tbl("lineitem"), tbl("orders")
    part, supplier = tbl("part"), tbl("supplier")
    customer, nation, region = tbl("customer"), tbl("nation"), tbl("region")
    checks = [
        ("lineitem→orders", li.join(orders, li.l_orderkey == orders.o_orderkey, "left_anti")),
        ("lineitem→part", li.join(part, li.l_partkey == part.p_partkey, "left_anti")),
        ("lineitem→supplier", li.join(supplier, li.l_suppkey == supplier.s_suppkey, "left_anti")),
        ("orders→customer", orders.join(customer, orders.o_custkey == customer.c_custkey, "left_anti")),
        ("customer→nation", customer.join(nation, customer.c_nationkey == nation.n_nationkey, "left_anti")),
        ("nation→region", nation.join(region, nation.n_regionkey == region.r_regionkey, "left_anti")),
    ]
    bad = {name: df.count() for name, df in checks if df.count() > 0}
    assert not bad, f"FK orphans in replica corpus: {bad}"


def test_replica_key_domains_disjoint(spark, sf_dir, replica_dir):
    # keys must be unique corpus-wide where they were unique in the base
    for t, key in [
        ("orders", "o_orderkey"),
        ("customer", "c_custkey"),
        ("part", "p_partkey"),
        ("supplier", "s_suppkey"),
        ("documents", "doc_id"),
        ("embeddings", "vec_id"),
        ("events", "event_id"),
    ]:
        df = spark.read.parquet(os.path.join(replica_dir, f"{t}.parquet"))
        total, distinct = df.count(), df.select(key).distinct().count()
        assert total == distinct, f"{t}.{key}: {total} rows, {distinct} distinct"


def test_q07_revenue_scales_exactly_k_fold(spark, sf_dir, replica_dir):
    q = registry()["q07_join_multi"]
    base = {r[0]: r for r in q.fn(spark, sf_dir).collect()}
    big = {r[0]: r for r in q.fn(spark, replica_dir).collect()}
    assert set(base) == set(big)
    for name, b in base.items():
        g = big[name]
        # exact DECIMAL revenue sums: K replicas of identical values must
        # total exactly K x base — any drift means the replication changed
        # VALUES, not just keys
        for col in b.asDict():
            if col == name or isinstance(b[col], str):
                continue
            assert g[col] == pytest.approx(K * b[col], abs=1e-6), (
                f"{name}.{col}: {g[col]} != {K}x{b[col]}"
            )
