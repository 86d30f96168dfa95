"""As-of join: for each event, the most recent order of the same customer at
or before the event timestamp. PySpark has no native ASOF JOIN — the engine
composes it as a *union merge*: tag both sides, union on the entity key, and
take a running ``last(..., ignorenulls)`` over one (user, time) window
(SURVEY.md §2.2 "composite" operator).

Scale notes: the union-merge form costs exactly ONE shuffle (on user_id) and
is linear in |events| + |orders| — no join fan-out at all, unlike the naive
equi-join + rank idiom whose intermediate is sum over users of |events_u| x
|orders_u| before the rank-1 filter prunes it. At 100 TB that quadratic
blow-up is the difference between a plan that finishes and one that spills
forever; the merge form's per-row state is a single struct. For extremely
hot keys, pre-bucketing both tables on the key removes even that shuffle;
the band variant (q38) bounds fan-out where a join IS wanted.
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
    """As-of join (backward): latest order ≤ event time per event.

    Union-merge plan: orders (kind=0) sort before events (kind=1) at equal
    timestamps, so the inclusive `<=` bound falls out of the sort order; the
    running `last(struct, ignorenulls)` carries the latest order forward.
    Order-vs-order ties (same o_orderdate) break by ascending o_orderkey so
    the running last keeps the max key — identical to the oracle's
    ROW_NUMBER ... ORDER BY o_orderdate DESC, o_orderkey DESC.
    """
    events, orders = tables(spark, sf_dir, "events", "orders")
    ev = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        "ts",
        F.lit(None).cast("bigint").alias("o_orderkey"),
        F.lit(None).cast("date").alias("o_orderdate"),
        F.lit(None).cast("double").alias("o_totalprice"),
    )
    od = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast(events.schema["event_id"].dataType).alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        "o_orderkey",
        "o_orderdate",
        "o_totalprice",
    )
    merged = ev.unionByName(od)
    w = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    order_state = F.when(
        F.col("kind") == 0, F.struct("o_orderkey", "o_totalprice")
    )
    last_order = F.last(order_state, ignorenulls=True).over(w)
    return (
        merged.withColumn("asof", last_order)
        .filter((F.col("kind") == 1) & F.col("asof").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.col("asof.o_orderkey").alias("asof_orderkey"),
            F.round("asof.o_totalprice", 2).alias("asof_totalprice"),
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
