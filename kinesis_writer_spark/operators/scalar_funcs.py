"""Scalar function library coverage: string, date/time, math, array, JSON
(SURVEY.md §2.2). Every expression is a built-in ``pyspark.sql.functions``
call — JVM-side, whole-stage-codegen'd; zero Python UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables


@register(
    "q40_string_funcs",
    oracle="""
    SELECT p_partkey,
           UPPER(p_brand)                                   AS brand_upper,
           LOWER(p_type)                                    AS type_lower,
           SUBSTRING(p_name, 1, 8)                          AS name_prefix,
           LENGTH(p_name)                                   AS name_len,
           TRIM(CONCAT('  ', p_brand, '  '))                AS trimmed,
           CONCAT_WS('|', p_brand, p_type)                  AS brand_type,
           REPLACE(p_type, ' ', '_')                        AS type_snake,
           regexp_extract(p_brand, '[0-9]+', 0)             AS brand_num,
           md5(p_name)                                      AS name_md5,
           string_split(p_type, ' ')[1]                     AS first_word,
           LPAD(CAST(p_size AS VARCHAR), 4, '0')            AS size_padded,
           POSITION('BRASS' IN p_type) > 0                  AS has_brass
    FROM part
    """,
)
def q40_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String function battery over part."""
    (part,) = tables(spark, sf_dir, "part")
    return part.select(
        "p_partkey",
        F.upper("p_brand").alias("brand_upper"),
        F.lower("p_type").alias("type_lower"),
        F.substring("p_name", 1, 8).alias("name_prefix"),
        F.length("p_name").alias("name_len"),
        F.trim(F.concat(F.lit("  "), F.col("p_brand"), F.lit("  "))).alias("trimmed"),
        F.concat_ws("|", "p_brand", "p_type").alias("brand_type"),
        F.regexp_replace(F.col("p_type"), " ", "_").alias("type_snake"),
        F.regexp_extract("p_brand", "[0-9]+", 0).alias("brand_num"),
        F.md5(F.col("p_name").cast("binary")).alias("name_md5"),
        F.split("p_type", " ").getItem(0).alias("first_word"),
        F.lpad(F.col("p_size").cast("string"), 4, "0").alias("size_padded"),
        (F.instr("p_type", "BRASS") > 0).alias("has_brass"),
    )


@register(
    "q41_date_funcs",
    oracle="""
    SELECT o_orderkey,
           date_trunc('day', o_orderdate)                    AS order_date,
           date_trunc('month', o_orderdate)                  AS month_start,
           EXTRACT(year FROM o_orderdate)                    AS order_year,
           EXTRACT(month FROM o_orderdate)                   AS order_month,
           EXTRACT(day FROM o_orderdate)                     AS order_day,
           EXTRACT(dow FROM o_orderdate)                     AS day_of_week,
           date_diff('day', o_orderdate, TIMESTAMP '1998-12-31 00:00:00') AS days_to_end,
           epoch(o_orderdate)                                AS epoch_secs,
           date_trunc('day', o_orderdate + INTERVAL 90 DAY)  AS due_date,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end
    FROM orders
    """,
)
def q41_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time battery over orders.

    DOW convention aligned: both sides use Sunday=0 (Spark dayofweek is
    Sunday=1, so subtract 1).
    """
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.select(
        "o_orderkey",
        F.date_trunc("day", "o_orderdate").alias("order_date"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.year("o_orderdate").cast("bigint").alias("order_year"),
        F.month("o_orderdate").cast("bigint").alias("order_month"),
        F.dayofmonth("o_orderdate").cast("bigint").alias("order_day"),
        (F.dayofweek("o_orderdate") - 1).cast("bigint").alias("day_of_week"),
        F.datediff(F.lit("1998-12-31").cast("date"), F.col("o_orderdate")).cast("bigint").alias(
            "days_to_end"
        ),
        F.unix_timestamp("o_orderdate").cast("double").alias("epoch_secs"),
        F.date_trunc("day", F.col("o_orderdate") + F.expr("INTERVAL 90 DAY")).alias("due_date"),
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
    )


@register(
    "q42_math_funcs",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROUND(l_extendedprice, 1)                   AS price_rounded,
           ABS(l_discount - 0.05)                      AS disc_dev,
           ROUND(POWER(l_quantity, 2), 2)              AS qty_sq,
           ROUND(SQRT(l_extendedprice), 4)             AS price_sqrt,
           ROUND(LN(l_extendedprice + 1), 4)           AS price_ln,
           ROUND(LOG10(l_extendedprice + 1), 4)        AS price_log10,
           CAST(CEIL(l_quantity) AS BIGINT)            AS qty_ceil,
           CAST(FLOOR(l_quantity) AS BIGINT)           AS qty_floor,
           CAST(l_orderkey % 7 AS BIGINT)              AS key_mod,
           CAST(SIGN(l_discount - 0.05) AS BIGINT)     AS disc_sign
    FROM lineitem
    """,
)
def q42_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math function battery over lineitem."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.round("l_extendedprice", 1).alias("price_rounded"),
        F.abs(F.col("l_discount") - 0.05).alias("disc_dev"),
        F.round(F.pow("l_quantity", 2), 2).alias("qty_sq"),
        F.round(F.sqrt("l_extendedprice"), 4).alias("price_sqrt"),
        F.round(F.log(F.col("l_extendedprice") + 1), 4).alias("price_ln"),
        F.round(F.log10(F.col("l_extendedprice") + 1), 4).alias("price_log10"),
        F.ceil("l_quantity").alias("qty_ceil"),
        F.floor("l_quantity").alias("qty_floor"),
        (F.col("l_orderkey") % 7).cast("bigint").alias("key_mod"),
        F.signum(F.col("l_discount") - 0.05).cast("bigint").alias("disc_sign"),
    )


@register(
    "q43_array_funcs",
    oracle="""
    SELECT vec_id,
           len(embedding)                                            AS dim,
           ROUND(CAST(embedding[1] AS DOUBLE), 4)                    AS first_elem,
           ROUND(list_sum(embedding), 3)                             AS vec_sum,
           ROUND(CAST(list_max(embedding) AS DOUBLE), 4)             AS vec_max,
           ROUND(list_sum(list_transform(embedding, x -> x * x)), 3) AS sq_norm,
           len(list_filter(embedding, x -> x > 0))                   AS n_positive,
           ROUND(list_sum(embedding[1:8]), 3)                        AS head_sum
    FROM embeddings
    """,
)
def q43_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array battery over embeddings: size, index, higher-order transform /
    filter / aggregate, slice. All Catalyst higher-order functions — no UDFs.

    Elements are cast to double before summing so both engines accumulate in
    double precision.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    dbl = F.transform(F.col("embedding"), lambda x: x.cast("double"))
    return embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.round(F.element_at("embedding", 1).cast("double"), 4).alias("first_elem"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x), 3).alias("vec_sum"),
        F.round(F.array_max("embedding").cast("double"), 4).alias("vec_max"),
        F.round(F.aggregate(dbl, F.lit(0.0), lambda acc, x: acc + x * x), 3).alias("sq_norm"),
        F.size(F.filter("embedding", lambda x: x > 0)).alias("n_positive"),
        F.round(
            F.aggregate(F.slice(dbl, 1, 8), F.lit(0.0), lambda acc, x: acc + x), 3
        ).alias("head_sum"),
    )


@register(
    "q44_json_funcs",
    oracle="""
    SELECT event_type,
           COUNT(*)                                          AS n_events,
           CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k,
           MIN(CAST(props->>'$.k' AS BIGINT))                AS min_k,
           MAX(CAST(props->>'$.k' AS BIGINT))                AS max_k
    FROM events
    WHERE props IS NOT NULL
    GROUP BY event_type
    """,
)
def q44_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction (get_json_object) + aggregation over the parsed value."""
    (events,) = tables(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        events.filter(F.col("props").isNotNull())
        .select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )


@register(
    "q45_explode_posexplode",
    oracle="""
    SELECT t.vec_id, t.pos, ROUND(CAST(t.val AS DOUBLE), 4) AS val
    FROM (
        SELECT vec_id, generate_subscripts(embedding, 1) - 1 AS pos,
               unnest(embedding) AS val
        FROM embeddings
        WHERE vec_id < 50
    ) t
    WHERE t.pos < 4
    """,
)
def q45_explode_posexplode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode: flatten array elements with their positions."""
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    return (
        embeddings.filter(F.col("vec_id") < 50)
        .select("vec_id", F.posexplode("embedding").alias("pos", "raw_val"))
        .filter(F.col("pos") < 4)
        .select("vec_id", "pos", F.round(F.col("raw_val").cast("double"), 4).alias("val"))
    )


@register(
    "q112_variant_json",
    oracle="""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           MAX(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS max_k,
           CAST(SUM(CASE WHEN json_extract_string(props, '$.missing') IS NULL
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_missing
    FROM events
    GROUP BY event_type
    """,
)
def q112_variant_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured props via VARIANT (Spark 4): ``parse_json`` once, then
    typed ``variant_get`` path extraction — the engine's answer to schema-
    on-read JSON columns. Compared to per-path ``get_json_object`` (q44),
    the document parses once per row and every extraction reads the binary
    variant encoding; at 100 TB that is the difference between N parses and
    one. ``try_variant_get`` on an absent path returns NULL instead of
    failing, matching the oracle's json_extract semantics.
    """
    (events,) = tables(spark, sf_dir, "events")
    v = F.parse_json("props")
    k = F.variant_get(v, "$.k", "bigint")
    missing = F.try_variant_get(v, "$.missing", "string")
    return events.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(k).alias("sum_k"),
        F.max(k).alias("max_k"),
        F.sum(F.when(missing.isNull(), 1).otherwise(0)).alias("n_missing"),
    )
