"""Skew-handling operators: salted two-phase aggregation.

The events table is skewed by construction (15 users own 100k+ events). A
straight groupBy(user_id) puts each hot key on one reducer; salting splits
every key across ``N_SALT`` partial groups, aggregates, then merges — the
classic manual remedy when AQE's skew handling can't apply (e.g.
aggregations, not joins). The oracle is the *unsalted* group-by: salting is
pure plumbing and must be semantically invisible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables

N_SALT = 8


@register(
    "q63_salted_agg",
    oracle="""
    SELECT user_id, COUNT(*) AS n_events,
           CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS total_cents
    FROM events
    GROUP BY user_id
    """,
)
def q63_salted_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-phase salted aggregation over a hot-keyed table.

    Phase 1 groups on (user_id, salt) — hot keys spread over N_SALT reducers;
    phase 2 merges the partials per user_id. Counts and integer sums compose
    exactly, so the result is identical to the direct group-by (the oracle).
    """
    (events,) = tables(spark, sf_dir, "events")
    cents = F.round(F.col("value") * 100).cast("bigint")
    salted = events.withColumn("salt", F.pmod(F.col("event_id"), F.lit(N_SALT)))
    partial = salted.groupBy("user_id", "salt").agg(
        F.count(F.lit(1)).alias("pn"), F.sum(cents).alias("pc")
    )
    return partial.groupBy("user_id").agg(
        F.sum("pn").alias("n_events"), F.sum("pc").alias("total_cents")
    )


_SALT_FANOUT = 8


@register(
    "q150_salted_skew_join",
    oracle="""
    WITH keyed AS (
        SELECT user_id % 5 AS hot_key, value FROM events
    ),
    dim AS (
        SELECT user_id % 5 AS hot_key,
               CAST(COUNT(*) AS BIGINT) AS key_events,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS key_cents
        FROM events GROUP BY user_id % 5
    )
    SELECT k.hot_key,
           COUNT(*) AS n_rows,
           d.key_events,
           CAST(SUM(CAST(ROUND(k.value * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
    FROM keyed k JOIN dim d ON k.hot_key = d.hot_key
    GROUP BY k.hot_key, d.key_events
    """,
)
def q150_salted_skew_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit salt-replication join for pathological key skew: the fact
    side has only FIVE distinct join keys (every row hits a hot key), so an
    unsalted shuffle join lands the entire table on five reducers. The fact
    side appends ``salt = event_id % 8``; the dim side replicates each row
    8× (``explode(sequence)``), and the join runs on (hot_key, salt) — the
    same key now spreads over 40 partitions. Salts cancel in the final
    rollup, so results are identical to the unsalted join (the oracle runs
    the plain one).

    AQE's skew-join split handles moderate skew at runtime; EXPLICIT
    salting remains the tool when a single key exceeds what one task can
    hold even after AQE splitting (it rewrites the key space itself, not
    the partition boundaries). The MERGE hint keeps the test-SF dim off
    the broadcast path so the salted-shuffle plan exercised locally is the
    one that matters at scale; a broadcastable dim would make salting moot.
    """
    (events,) = tables(spark, sf_dir, "events")
    keyed = events.select(
        (F.col("user_id") % 5).alias("hot_key"),
        (F.col("event_id") % _SALT_FANOUT).cast("int").alias("salt"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    dim = (
        events.groupBy((F.col("user_id") % 5).alias("d_key"))
        .agg(
            F.count(F.lit(1)).alias("key_events"),
            F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("key_cents"),
        )
        .select(
            "d_key",
            "key_events",
            F.explode(F.sequence(F.lit(0), F.lit(_SALT_FANOUT - 1))).alias("d_salt"),
        )
    )
    return (
        keyed.join(
            dim.hint("merge"),
            (F.col("hot_key") == F.col("d_key")) & (F.col("salt") == F.col("d_salt")),
        )
        .groupBy("hot_key", "key_events")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.sum("cents").alias("total_cents"),
        )
        .select("hot_key", "n_rows", "key_events", "total_cents")
    )
