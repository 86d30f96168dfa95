"""As-of join: for each event, the most recent order of the same customer at
or before the event timestamp. PySpark has no native ASOF JOIN — the engine
composes it from an equi-join on the entity key plus a windowed top-1
(SURVEY.md §2.2 "composite" operator).

Scale notes: the shuffle keys on user_id (high cardinality), so the join and
the window share one partitioning — Catalyst reuses the exchange. For
extremely hot keys, pre-bucketing both tables on the key removes the shuffle
entirely; the band variant (limit how far back the order may be) bounds the
join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables


@register(
    "q37_asof_join",
    oracle="""
    SELECT event_id, user_id, ts,
           o_orderkey AS asof_orderkey,
           ROUND(o_totalprice, 2) AS asof_totalprice
    FROM (
        SELECT e.event_id, e.user_id, e.ts, o.o_orderkey, o.o_totalprice,
               ROW_NUMBER() OVER (PARTITION BY e.event_id
                                  ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
        FROM events e
        JOIN orders o ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
    )
    WHERE rn = 1
    """,
)
def q37_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join (backward): latest order ≤ event time per event."""
    events, orders = tables(spark, sf_dir, "events", "orders")
    joined = events.join(
        orders,
        (F.col("o_custkey") == F.col("user_id")) & (F.col("o_orderdate") <= F.col("ts")),
    )
    w = Window.partitionBy("event_id").orderBy(F.col("o_orderdate").desc(), F.col("o_orderkey").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("o_orderkey").alias("asof_orderkey"),
            F.round("o_totalprice", 2).alias("asof_totalprice"),
        )
    )


@register(
    "q38_asof_join_banded",
    oracle="""
    SELECT purchase_id, user_id, prior_id, prior_type
    FROM (
        SELECT a.event_id AS purchase_id, a.user_id,
               b.event_id AS prior_id, b.event_type AS prior_type,
               ROW_NUMBER() OVER (PARTITION BY a.event_id
                                  ORDER BY b.ts DESC, b.event_id DESC) AS rn
        FROM events a
        JOIN events b
          ON b.user_id = a.user_id
         AND b.ts <  a.ts
         AND b.ts >= a.ts - INTERVAL 2 HOUR
        WHERE a.event_type = 'purchase'
    )
    WHERE rn = 1
    """,
)
def q38_asof_join_banded(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded as-of self-join: each purchase matched to the user's most
    recent prior event within 2 hours — the scale-safe as-of variant (the
    band bounds per-key fan-out so the intermediate never explodes).
    """
    (events,) = tables(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"), F.col("user_id"), F.col("ts").alias("a_ts")
    )
    b = events.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_id").alias("prior_id"),
        F.col("event_type").alias("prior_type"),
    )
    joined = a.join(
        b,
        (F.col("b_user") == F.col("user_id"))
        & (F.col("b_ts") < F.col("a_ts"))
        & (F.col("b_ts") >= F.col("a_ts") - F.expr("INTERVAL 2 HOUR")),
    )
    w = Window.partitionBy("purchase_id").orderBy(F.col("b_ts").desc(), F.col("prior_id").desc())
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("purchase_id", "user_id", "prior_id", "prior_type")
    )
