"""Extended inventory, batch 6 (q147+, round 4): second-precision sketch
parity, plus further analytics coverage.

No counterpart in the reference (a Kafka client library — SURVEY.md §2.2);
determinism rules follow FIXTURES.md (md5-derived hashes, integer/dyadic
arithmetic before any float, 6-dp rounding on float outputs).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register

# HLL layout: b=6 index bits -> m=64 registers; the remaining w=26 hash bits
# feed the leading-zero rank. alpha_64 = 0.709 (Flajolet et al. 2007).
HLL_B = 6
HLL_M = 1 << HLL_B          # 64 registers
HLL_W = 32 - HLL_B          # 26 rank bits
HLL_DIV = 1 << HLL_W        # 2^26 splits index | rank
HLL_ALPHA = 0.709


@register(
    "q147_hll_distinct_sketch",
    f"""
    WITH pairs AS (SELECT DISTINCT event_type, user_id FROM events),
    hashed AS (
      SELECT event_type,
             (('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))::BIGINT)
               AS h
      FROM pairs
    ),
    regs AS (
      SELECT event_type, h // {HLL_DIV} AS idx,
             MAX(CASE WHEN h % {HLL_DIV} = 0 THEN {HLL_W + 1}
                 ELSE instr(lpad(bin(h % {HLL_DIV}), {HLL_W}, '0'), '1')
                 END) AS m_j
      FROM hashed GROUP BY 1, 2
    ),
    sums AS (
      SELECT event_type,
             SUM(1.0 / (CAST(1 AS BIGINT) << m_j))
               + ({HLL_M} - COUNT(*)) * 1.0 AS z
      FROM regs GROUP BY event_type
    ),
    exact AS (
      SELECT event_type, COUNT(DISTINCT user_id) AS exact_distinct
      FROM events GROUP BY event_type
    )
    SELECT s.event_type,
           CAST(e.exact_distinct AS BIGINT) AS exact_distinct,
           ROUND({HLL_ALPHA} * {HLL_M * HLL_M} / s.z, 6) AS hll_estimate
    FROM sums s JOIN exact e USING (event_type)
    """,
    f"HyperLogLog distinct-count sketch (m={HLL_M} registers) next to the "
    "exact answer — the second sketch precision alongside q102's KMV. The "
    "md5-derived 32-bit hash splits into a 6-bit register index and a "
    "26-bit rank word whose leading-zero count comes from STRING ops on "
    "the zero-padded binary form (instr of first '1'), so both engines run "
    "identical integer arithmetic — no libm log2. The register sum is a "
    "<= 64-term sum of dyadic rationals with exponents >= -27, exactly "
    "representable in a double in ANY order, so the ORACLE CHECKS THE "
    "SKETCH ITSELF bit-for-bit. At 100 TB: per-group state is m=64 bytes, "
    "mergeable by register-max — the groupBy is two hash aggregates, no "
    "window, no shuffle beyond the group keys",
    ("relational", "sketch"),
)
def q147(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    pairs = t.events.select("event_type", "user_id").distinct()
    hashed = pairs.select(
        "event_type",
        F.conv(
            F.substring(F.md5(F.col("user_id").cast("string")), 1, 8), 16, 10
        )
        .cast("long")
        .alias("h"),
    )
    rank_word = F.col("h") % HLL_DIV
    rho = F.when(rank_word == 0, F.lit(HLL_W + 1)).otherwise(
        F.instr(F.lpad(F.bin(rank_word), HLL_W, "0"), "1")
    )
    regs = (
        hashed.select(
            "event_type",
            (F.col("h") / HLL_DIV).cast("long").alias("idx"),
            rho.alias("rho"),
        )
        .groupBy("event_type", "idx")
        .agg(F.max("rho").alias("m_j"))
    )
    sums = regs.groupBy("event_type").agg(
        (
            F.sum(F.expr("1.0 / shiftleft(cast(1 as bigint), m_j)"))
            + (HLL_M - F.count("*")) * F.lit(1.0)
        ).alias("z")
    )
    exact = t.events.groupBy("event_type").agg(
        F.count_distinct("user_id").cast("bigint").alias("exact_distinct")
    )
    return sums.join(exact, "event_type").select(
        "event_type",
        "exact_distinct",
        F.round(F.lit(HLL_ALPHA) * (HLL_M * HLL_M) / F.col("z"), 6).alias(
            "hll_estimate"
        ),
    )
