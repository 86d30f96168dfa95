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

    Executed as ONE range-frame window, not a join: events sort once per
    user by microsecond timestamp, and each row's best prior is
    ``max(struct(us, event_id, ...))`` over the frame ``[-2h, -1µs]`` —
    strictly-prior rows only (the -1 upper bound excludes same-timestamp
    events, matching the oracle's ``b.ts < a.ts``), ties broken by the
    struct order exactly like the oracle's ``ts DESC, event_id DESC`` rank.
    The previous join-then-rank formulation materialized the per-user
    banded cross product (~band x events rows) before discarding all but
    one per purchase — measured 4.4 s -> 0.6 s at sf0.1, and the window
    form's intermediate is the input size no matter how dense the band.
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-2 * 3600 * 1_000_000, -1)
    )
    prior = F.max(F.struct(F.col("us"), F.col("event_id"), F.col("event_type"))).over(w)
    return (
        events.select("event_id", "user_id", "event_type", us.alias("us"))
        .withColumn("prior", prior)
        .filter((F.col("event_type") == "purchase") & F.col("prior").isNotNull())
        .select(
            F.col("event_id").alias("purchase_id"),
            "user_id",
            F.col("prior.event_id").alias("prior_id"),
            F.col("prior.event_type").alias("prior_type"),
        )
    )


@register(
    "q117_asof_nearest",
    oracle="""
    SELECT event_id, user_id, ts, near_orderkey, direction
    FROM (
        SELECT e.event_id, e.user_id, e.ts,
               o.o_orderkey AS near_orderkey,
               CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
                    THEN 'backward' ELSE 'forward' END AS direction,
               ROW_NUMBER() OVER (
                   PARTITION BY e.event_id
                   ORDER BY ABS(epoch_us(CAST(o.o_orderdate AS TIMESTAMP)) - epoch_us(e.ts)) ASC,
                            CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) <= e.ts THEN 0 ELSE 1 END ASC,
                            CASE WHEN CAST(o.o_orderdate AS TIMESTAMP) <= e.ts
                                 THEN -o.o_orderkey ELSE o.o_orderkey END ASC) AS rn
        FROM events e JOIN orders o ON o.o_custkey = e.user_id
    )
    WHERE rn = 1
    """,
)
def q117_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-in-time as-of join: each event matched to the same customer's
    order with the smallest |order date − event time|, looking BOTH
    directions (sensor-fusion flavor; ties prefer the backward match, then
    the deterministic per-side key order).

    Same union-merge shape as q37, still ONE shuffle: the backward
    candidate is the running ``last`` over the preceding frame, the forward
    candidate the ``first`` over the following frame — two Window nodes
    sharing one (user_id, time) sort — then a per-row arbitration picks the
    nearer side. The oracle is the equi-join + global rank over both
    directions; the merge form never materializes the per-user cross
    product.
    """
    events, orders = tables(spark, sf_dir, "events", "orders")
    ev = events.select(
        "user_id",
        F.col("ts").alias("t"),
        F.lit(1).alias("kind"),
        "event_id",
        "ts",
        F.lit(None).cast("bigint").alias("o_orderkey"),
    )
    od = orders.select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").cast("timestamp").alias("t"),
        F.lit(0).alias("kind"),
        F.lit(None).cast(events.schema["event_id"].dataType).alias("event_id"),
        F.lit(None).cast("timestamp").alias("ts"),
        "o_orderkey",
    )
    merged = ev.unionByName(od)
    order_state = F.when(
        F.col("kind") == 0, F.struct(F.col("t").alias("ot"), "o_orderkey")
    )
    w_back = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "o_orderkey")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("user_id")
        .orderBy("t", "kind", "o_orderkey")
        .rowsBetween(1, Window.unboundedFollowing)
    )
    bwd = F.last(order_state, ignorenulls=True).over(w_back)
    fwd = F.first(order_state, ignorenulls=True).over(w_fwd)
    us = F.unix_micros("ts")
    bwd_abs = us - F.unix_micros(F.col("bwd.ot"))
    fwd_abs = F.unix_micros(F.col("fwd.ot")) - us
    pick_bwd = F.col("bwd").isNotNull() & (
        F.col("fwd").isNull() | (bwd_abs <= fwd_abs)
    )
    return (
        merged.withColumn("bwd", bwd)
        .withColumn("fwd", fwd)
        .filter(F.col("kind") == 1)
        .filter(F.col("bwd").isNotNull() | F.col("fwd").isNotNull())
        .select(
            "event_id",
            "user_id",
            "ts",
            F.when(pick_bwd, F.col("bwd.o_orderkey"))
            .otherwise(F.col("fwd.o_orderkey"))
            .alias("near_orderkey"),
            F.when(pick_bwd, F.lit("backward")).otherwise(F.lit("forward")).alias("direction"),
        )
    )
