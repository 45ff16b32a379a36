"""Extended inventory, batch 2 (q61+): unpivot/melt, ordered string
aggregation, multi-field JSON extraction, keep-first canonical dedup,
bounded sliding frames, bucketed histograms, text normalization,
interpolated percentiles.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from fluvii_spark.io.readers import load_tables
from fluvii_spark.queries import register


@register(
    "q61_unpivot",
    """
    UNPIVOT (SELECT l_returnflag,
                    SUM(l_quantity) AS qty,
                    SUM(l_extendedprice) AS price,
                    SUM(l_discount) AS disc
             FROM lineitem GROUP BY l_returnflag)
    ON qty, price, disc INTO NAME measure VALUE val
    """,
    "unpivot/melt: wide aggregate → (key, measure, value) long form",
    ("relational", "reshape"),
)
def q61(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    wide = t.lineitem.groupBy("l_returnflag").agg(
        F.sum("l_quantity").alias("qty"),
        F.sum("l_extendedprice").alias("price"),
        F.sum("l_discount").alias("disc"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "disc"],
        variableColumnName="measure",
        valueColumnName="val",
    )


@register(
    "q62_listagg",
    """
    SELECT n_nationkey,
           string_agg(DISTINCT c_mktsegment, '|' ORDER BY c_mktsegment) AS segs
    FROM customer JOIN nation ON c_nationkey = n_nationkey
    GROUP BY n_nationkey
    """,
    "ordered string aggregation (listagg / string_agg parity)",
    ("relational", "agg", "string"),
)
def q62(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.customer.join(t.nation, F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_nationkey")
        .agg(
            F.array_join(
                F.sort_array(F.collect_set("c_mktsegment")), "|"
            ).alias("segs")
        )
    )


@register(
    "q63_json_multi_extract",
    """
    WITH doc AS (
      SELECT json_object(
               't', event_type,
               'k', CAST(json_extract_string(props, '$.k') AS INTEGER)
             ) AS j
      FROM events
    )
    SELECT CAST(json_extract_string(j, '$.k') AS INTEGER) AS k_value,
           json_extract_string(j, '$.t') AS source,
           COUNT(*) AS n
    FROM doc
    GROUP BY 1, 2
    """,
    "JSON round-trip + multi-field extraction: build a two-field document "
    "(event type + the props 'k' value) with to_json/json_object, then "
    "json_tuple both fields back out and group on them. The first form "
    "extracted a '$.source' key the synthetic props never carry, so one "
    "output column was all-NULL and the second extraction path was "
    "untested (degeneracy-gate catch, r7); integer-only payloads render "
    "identically in both engines' JSON writers",
    ("relational", "json"),
)
def q63(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    doc = t.events.select(
        F.to_json(
            F.struct(
                F.col("event_type").alias("t"),
                F.get_json_object("props", "$.k").cast("int").alias("k"),
            )
        ).alias("j")
    )
    return (
        doc.select(F.json_tuple("j", "k", "t").alias("k_raw", "source"))
        .select(F.col("k_raw").cast("int").alias("k_value"), "source")
        .groupBy("k_value", "source")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q64_dedup_keep_first",
    """
    SELECT doc_id, text_md5 FROM (
      SELECT doc_id, md5(text) AS text_md5,
             ROW_NUMBER() OVER (PARTITION BY text ORDER BY doc_id) AS rn
      FROM documents
    ) WHERE rn = 1
    """,
    "canonicalizing dedup: keep the first (min-id) row per content group — "
    "the materializing twin of q33's group summary",
    ("llm", "dedup"),
)
def q64(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    # keep-first as min(doc_id) per content group: identical row set to
    # the rn=1 window, but a hash aggregation with map-side partials
    # instead of a corpus sort window
    return t.documents.groupBy("text").agg(
        F.min("doc_id").alias("doc_id")
    ).select("doc_id", F.md5(F.encode("text", "UTF-8")).alias("text_md5"))


@register(
    "q65_sliding_frame",
    """
    SELECT event_id,
           SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS last4_sum,
           AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                            ROWS BETWEEN 3 PRECEDING AND CURRENT ROW) AS last4_avg
    FROM events
    """,
    "bounded sliding frame: trailing-4 sum/avg per user (fraud-style "
    "rolling features)",
    ("relational", "window"),
)
def q65(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-3, Window.currentRow)
    )
    return t.events.select(
        "event_id",
        F.sum("value").over(w).alias("last4_sum"),
        F.avg("value").over(w).alias("last4_avg"),
    )


@register(
    "q66_histogram",
    """
    SELECT CASE WHEN l_quantity < 0 THEN 0
                WHEN l_quantity >= 50 THEN 6
                ELSE CAST(FLOOR(l_quantity * 5 / 50) AS INTEGER) + 1 END AS bucket,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1
    """,
    "width_bucket histogram over quantity (oracle emulates width_bucket "
    "with exact integer-boundary arithmetic)",
    ("relational", "agg"),
)
def q66(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return (
        t.lineitem.select(
            F.width_bucket("l_quantity", F.lit(0.0), F.lit(50.0), F.lit(5))
            .cast("int")
            .alias("bucket")
        )
        .groupBy("bucket")
        .agg(F.count("*").alias("n"))
    )


@register(
    "q67_text_normalize_dedup",
    """
    WITH norm AS (
      SELECT doc_id,
             trim(regexp_replace(regexp_replace(lower(text), '[^a-z0-9 ]', '', 'g'),
                  ' +', ' ', 'g')) AS norm_text
      FROM documents
    )
    SELECT md5(norm_text) AS norm_md5, MIN(doc_id) AS keep_doc_id,
           COUNT(*) AS n_copies
    FROM norm GROUP BY norm_text
    """,
    "text-normalization dedup: lowercase → strip non-alnum → collapse "
    "whitespace → exact dedup on the normalized form (the cheap cleaning "
    "pass before fuzzy dedup)",
    ("llm", "text", "dedup"),
)
def q67(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col("text")), r"[^a-z0-9 ]", ""),
            r" +",
            " ",
        )
    )
    return (
        t.documents.select("doc_id", norm.alias("norm_text"))
        .groupBy("norm_text")
        .agg(F.min("doc_id").alias("keep_doc_id"), F.count("*").alias("n_copies"))
        .select(
            F.md5(F.encode("norm_text", "UTF-8")).alias("norm_md5"),
            "keep_doc_id",
            "n_copies",
        )
    )


@register(
    "q69_asof_join",
    """
    WITH l AS (SELECT user_id, ts, event_id FROM events
               WHERE event_type = 'purchase'),
         r AS (SELECT user_id, ts, MAX(event_id) AS click_id FROM events
               WHERE event_type = 'click' GROUP BY user_id, ts)
    SELECT l.event_id, l.user_id, r.click_id AS right_click_id
    FROM l ASOF LEFT JOIN r ON l.user_id = r.user_id AND r.ts <= l.ts
    """,
    "as-of join: each purchase matched to the user's latest click at-or-"
    "before it (duckdb native ASOF JOIN oracle; Spark side is the one-"
    "shuffle union+last() window strategy — no range join)",
    ("relational", "join", "asof"),
)
def q69(spark: SparkSession, sf_dir: str) -> DataFrame:
    from fluvii_spark.operators.asof import asof_join

    t = load_tables(spark, sf_dir)
    ev = t.events
    left = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "ts", "event_id"
    )
    right = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id", "ts")
        .agg(F.max("event_id").alias("click_id"))
    )
    return asof_join(
        left, right, ["user_id"], "ts", "ts", right_payload=["click_id"]
    ).select("event_id", "user_id", "right_click_id")


@register(
    "q68_percentiles",
    """
    SELECT l_returnflag,
           percentile_cont(0.25) WITHIN GROUP (ORDER BY l_quantity) AS p25,
           percentile_cont(0.50) WITHIN GROUP (ORDER BY l_quantity) AS p50,
           percentile_cont(0.90) WITHIN GROUP (ORDER BY l_quantity) AS p90
    FROM lineitem GROUP BY l_returnflag
    """,
    "exact interpolated percentiles per group (both engines use linear "
    "interpolation on the sorted set — deterministic). Declared surface = "
    "the built-in exact percentile aggregate, which buffers each group's "
    "values in one aggregation state; when a handful of groups hold "
    "billions of rows, operators/ranking.py grouped_exact_quantiles "
    "computes identical results (tested equal incl. NULLs) from one "
    "composite-order distributed ranking with no per-group buffer",
    ("relational", "agg", "stats"),
)
def q68(spark: SparkSession, sf_dir: str) -> DataFrame:
    t = load_tables(spark, sf_dir)
    return t.lineitem.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.25)").alias("p25"),
        F.expr("percentile(l_quantity, 0.50)").alias("p50"),
        F.expr("percentile(l_quantity, 0.90)").alias("p90"),
    )
