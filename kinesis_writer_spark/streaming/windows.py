"""Streaming window operators over the events stream.

Batch/stream parity by construction: these use the *same* ``F.window`` /
``F.session_window`` expressions as the batch operators in
``operators/windows.py``, so an ``availableNow`` replay of a parquet
directory produces exactly the batch answer — that property is the test
strategy (tests/test_streaming.py).

Scale notes: watermarks bound state (late rows beyond the horizon are
dropped and their state evicted); windowed agg state lives in the state
store keyed by (window, group) — partitioned by group key, so 1000
executors shard state naturally. ``dropDuplicates`` keeps one key per
event_id within the watermark horizon, the standard at-least-once →
effectively-once bridge in front of the KPL sink.
"""

from __future__ import annotations

import uuid

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

EVENTS_DDL = "event_id BIGINT, ts TIMESTAMP, user_id BIGINT, event_type STRING, value DOUBLE, props STRING"


def read_event_stream(spark: SparkSession, source_dir: str, max_files_per_trigger: int | None = None) -> DataFrame:
    """File-replay stream of events-shaped parquet (micro-batch per file set)."""
    reader = spark.readStream.schema(EVENTS_DDL)
    if max_files_per_trigger is not None:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(source_dir)


def tumbling_counts(stream: DataFrame, window: str = "1 hour", watermark: str = "2 hours") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("total_value"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_value")
    )


def sliding_counts(
    stream: DataFrame, window: str = "1 hour", slide: str = "30 minutes", watermark: str = "2 hours"
) -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select(F.col("w.start").alias("window_start"), "n_events")
    )


def session_values(stream: DataFrame, gap: str = "10 minutes", watermark: str = "2 hours") -> DataFrame:
    return (
        stream.withWatermark("ts", watermark)
        .groupBy(F.session_window("ts", gap).alias("w"), "user_id")
        .agg(F.count(F.lit(1)).alias("n_events"), F.round(F.sum("value"), 2).alias("session_value"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events", "session_value")
    )


def dedup_stream(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful exactly-once-per-event_id dedup within the watermark horizon."""
    return stream.withWatermark("ts", watermark).dropDuplicates(["event_id"])


def dedup_stream_within_watermark(stream: DataFrame, watermark: str = "2 hours") -> DataFrame:
    """Stateful dedup with BOUNDED state: ``dropDuplicatesWithinWatermark``
    evicts each key's state once the watermark passes its event time, so
    duplicates are only guaranteed collapsed when they arrive within the
    watermark delay of the first occurrence.

    This is the variant an unbounded 100 TB/day stream must run: plain
    ``dropDuplicates`` on a streaming DataFrame keeps every key seen forever
    (state grows without bound unless the dedup key embeds the window),
    while this operator's state is O(keys per watermark horizon). The trade
    is at-least-once beyond the horizon — exactly the reference sink's
    delivery contract (SURVEY.md §3, replay duplicates accepted).
    """
    return stream.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(["event_id"])


def run_available_now(df: DataFrame, output_mode: str = "append") -> list:
    """Drain a streaming DataFrame with the availableNow trigger into an
    in-memory sink; returns the collected rows. Test/verification helper.
    """
    name = f"mem_{uuid.uuid4().hex[:8]}"
    query = (
        df.writeStream.format("memory")
        .queryName(name)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()
    rows = df.sparkSession.sql(f"SELECT * FROM {name}").collect()
    query.stop()
    return rows


def interval_join_streams(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    watermark: str = "2 hours",
    within: str = "30 minutes",
) -> DataFrame:
    """Stream-stream inner join: match each left event to right events of the
    same key within a bounded event-time interval (right.ts ∈ [left.ts,
    left.ts + within]).

    Both sides carry watermarks and the join condition bounds event-time
    distance — the two requirements that let Spark EVICT join state: each
    side buffers only rows younger than (watermark + interval), so state is
    bounded at 100 TB/day instead of growing with the stream. The classic
    use: impressions ⋈ clicks attribution within an attribution window.
    """
    lw = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("event_id").alias("l_event_id"),
        F.col("ts").alias("l_ts"),
    )
    rw = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("event_id").alias("r_event_id"),
        F.col("ts").alias("r_ts"),
    )
    return lw.join(
        rw,
        F.expr(
            f"l_key = r_key AND r_ts >= l_ts AND r_ts <= l_ts + INTERVAL {within}"
        ),
    )


def enrich_stream(stream: DataFrame, dim: DataFrame, stream_key: str, dim_key: str) -> DataFrame:
    """Stream-static enrichment join: every micro-batch joins against the
    static dimension, broadcast so the stream side never shuffles.

    The canonical lookup/enrichment shape: at 100 TB/day the stream stays
    partitioned as it arrives; only the (small) dim ships to executors. The
    dim snapshot is re-resolved per micro-batch, so slowly-changing
    dimensions refresh without restarting the query.
    """
    return stream.join(F.broadcast(dim), stream.__getattr__(stream_key) == dim.__getattr__(dim_key))
