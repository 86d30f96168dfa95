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
