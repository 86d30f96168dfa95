"""Window-function operators: ranking, analytic (lag/lead/first/last),
frames (running/moving aggregates), and batch-mode time windows
(tumbling/sliding/session) shared with the streaming layer.

Scale notes: window partitions shuffle on partitionBy keys — all queries here
partition on high-cardinality keys (orderkey, user_id) so no single partition
explodes; time windows use `F.window`/`F.session_window`, the exact operators
Structured Streaming uses, so batch results equal streaming results.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables


@register(
    "q30_window_ranking",
    oracle="""
    SELECT l_orderkey, l_linenumber,
           ROW_NUMBER() OVER w AS rn,
           RANK()       OVER w AS rnk,
           DENSE_RANK() OVER w AS drnk,
           NTILE(4)     OVER w AS quartile
    FROM lineitem
    WINDOW w AS (PARTITION BY l_orderkey ORDER BY l_extendedprice DESC, l_linenumber ASC)
    """,
)
def q30_window_ranking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking functions over per-order windows (deterministic tie-break)."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    w = Window.partitionBy("l_orderkey").orderBy(
        F.col("l_extendedprice").desc(), F.col("l_linenumber").asc()
    )
    return lineitem.select(
        "l_orderkey",
        "l_linenumber",
        F.row_number().over(w).alias("rn"),
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )


@register(
    "q31_window_analytic",
    oracle="""
    SELECT event_id, user_id,
           LAG(value)  OVER w AS prev_value,
           LEAD(value) OVER w AS next_value,
           ROUND(FIRST_VALUE(value) OVER w, 2) AS first_val,
           ROUND(LAST_VALUE(value)  OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING), 2) AS last_val
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    """,
)
def q31_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead/first/last per user ordered by time."""
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return events.select(
        "event_id",
        "user_id",
        F.lag("value").over(w).alias("prev_value"),
        F.lead("value").over(w).alias("next_value"),
        F.round(F.first("value").over(w), 2).alias("first_val"),
        F.round(F.last("value").over(w_full), 2).alias("last_val"),
    )


@register(
    "q32_window_frames",
    oracle="""
    SELECT event_id, user_id,
           ROUND(SUM(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 2) AS running_sum,
           ROUND(AVG(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW), 4) AS moving_avg_3
    FROM events
    """,
)
def q32_window_frames(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Row frames: running sum + 3-row moving average per user."""
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return events.select(
        "event_id",
        "user_id",
        F.round(F.sum("value").over(w.rowsBetween(Window.unboundedPreceding, 0)), 2).alias(
            "running_sum"
        ),
        F.round(F.avg("value").over(w.rowsBetween(-2, 0)), 4).alias("moving_avg_3"),
    )


@register(
    "q33_tumbling_window",
    oracle="""
    SELECT time_bucket(INTERVAL '1 hour', ts) AS window_start,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
)
def q33_tumbling_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour windows via F.window — identical semantics in
    Structured Streaming (epoch-aligned buckets).
    """
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.groupBy(F.window("ts", "1 hour").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


@register(
    "q34_sliding_window",
    oracle="""
    WITH offsets AS (SELECT * FROM (VALUES (0), (1)) t(k)),
    assigned AS (
        SELECT time_bucket(INTERVAL '30 minutes', e.ts) - k * INTERVAL '30 minutes' AS window_start,
               e.value
        FROM events e CROSS JOIN offsets
        WHERE e.ts >= time_bucket(INTERVAL '30 minutes', e.ts) - k * INTERVAL '30 minutes'
          AND e.ts <  time_bucket(INTERVAL '30 minutes', e.ts) - k * INTERVAL '30 minutes'
                      + INTERVAL '1 hour'
    )
    SELECT window_start, COUNT(*) AS n_events,
           CAST(FLOOR(SUM(CAST(ROUND(value * 100) AS BIGINT)) * 10.0 / COUNT(*)) AS BIGINT)
               AS avg_value_milli
    FROM assigned GROUP BY window_start
    """,
)
def q34_sliding_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding windows (1 h size, 30 min slide): each event lands in 2 windows.

    The oracle decomposes the slide into explicit offset buckets — same
    assignment rule Spark's Expand-based window implementation uses.
    """
    (events,) = tables(spark, sf_dir, "events")
    # Exactness across engines: (a) sum integer cents, not doubles (addition
    # order differs between engines); (b) FLOOR the scaled average rather
    # than ROUND — both engines floor the identical double identically,
    # while ROUND differs on representational midpoints (Spark rounds the
    # shortest decimal repr, DuckDB the double itself).
    cents = F.round(F.col("value") * 100).cast("bigint")
    return (
        events.groupBy(F.window("ts", "1 hour", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum(cents).alias("sum_cents"))
        .select(
            F.col("w.start").alias("window_start"),
            "n_events",
            F.floor(F.col("sum_cents") * 10.0 / F.col("n_events")).cast("bigint").alias(
                "avg_value_milli"
            ),
        )
    )


@register(
    "q35_session_window",
    oracle="""
    WITH ordered AS (
        SELECT user_id, ts, value,
               CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                         > INTERVAL '10 minutes'
                    THEN 1 ELSE 0 END AS new_session
        FROM events
    ),
    sessions AS (
        SELECT user_id, ts, value,
               SUM(new_session) OVER (PARTITION BY user_id ORDER BY ts
                                      ROWS UNBOUNDED PRECEDING) AS session_id
        FROM ordered
    )
    SELECT user_id, MIN(ts) AS session_start,
           COUNT(*) AS n_events, ROUND(SUM(value), 2) AS session_value
    FROM sessions
    GROUP BY user_id, session_id
    """,
)
def q35_session_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session windows (10-minute gap) per user via F.session_window; the
    oracle is the classic gaps-and-islands rewrite. Session start equals
    the first event's timestamp in both.
    """
    (events,) = tables(spark, sf_dir, "events")
    return (
        events.groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            "n_events",
            "session_value",
        )
    )


@register(
    "q36_dedup_latest",
    oracle="""
    SELECT user_id, event_type, ts AS latest_ts, ROUND(value, 2) AS latest_value
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                     ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
    )
    WHERE rn = 1
    """,
)
def q36_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-latest dedup per (user, event_type) — the deterministic version
    of dropDuplicates, expressed as a window top-1.
    """
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id", "event_type").orderBy(
        F.col("ts").desc(), F.col("event_id").desc()
    )
    return (
        events.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            "event_type",
            F.col("ts").alias("latest_ts"),
            F.round("value", 2).alias("latest_value"),
        )
    )


_HOUR_US = 3_600_000_000  # 1 hour in epoch-microseconds


@register(
    "q111_time_range_frame",
    oracle=f"""
    SELECT user_id, event_id,
           COUNT(*) OVER w AS n_last_hour,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) OVER w AS BIGINT) AS cents_last_hour
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY epoch_us(ts)
                 RANGE BETWEEN {_HOUR_US} PRECEDING AND CURRENT ROW)
    """,
)
def q111_time_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: per user, the trailing-1-hour event count and
    value sum at every event — the rolling-window feature every fraud /
    rate-limit / CTR pipeline computes.

    The frame is a RANGE over integer epoch-microseconds (never a row
    frame: simultaneous events are peers and must all join the frame —
    identical semantics on both engines). Value sums are integer cents.
    Partitioned by user_id, so at 100 TB the sort is per-user within the
    shuffle partition, never global.
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    cents = F.round(F.col("value") * 100).cast("bigint")
    w = (
        Window.partitionBy("user_id")
        .orderBy(us)
        .rangeBetween(-_HOUR_US, Window.currentRow)
    )
    return events.select(
        "user_id",
        "event_id",
        F.count(F.lit(1)).over(w).alias("n_last_hour"),
        F.sum(cents).over(w).alias("cents_last_hour"),
    )
