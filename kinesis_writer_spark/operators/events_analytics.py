"""Event-stream analytics operators: batch sessionization (gap rule),
cohort retention, and funnel analysis over the events table.

These are the classic clickstream shapes a production event pipeline runs
next to the streaming layer: the same session semantics as
``F.session_window`` (q35) but with explicit session *identity* (lag +
running sum), cohort day-offset retention counts, and an ordered-stage
funnel via iterated conditional minima.

Scale notes (100 TB): every window partitions on user_id (high cardinality,
naturally sharded); the funnel's per-stage user tables are per-user
aggregates that only shrink down the chain, broadcast back onto events; all
time arithmetic is integer epoch-microseconds — exact on both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_md5_60bit, md5_60bit
from ..registry import register
from ._util import tables

_SESSION_GAP_US = 30 * 60 * 1_000_000  # 30 minutes in epoch-microseconds


@register(
    "q108_sessionize",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, ts, value, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    marked AS (
        SELECT user_id, event_id, ts, value, us,
               CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sessioned AS (
        SELECT user_id, ts, value, us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS session_idx
        FROM marked
    )
    SELECT user_id, session_idx,
           COUNT(*) AS n_events,
           MIN(ts) AS session_start,
           (MAX(us) - MIN(us)) // 1000000 AS duration_sec,
           ROUND(SUM(value), 2) AS session_value
    FROM sessioned
    GROUP BY user_id, session_idx
    """,
)
def q108_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch sessionization with session identity: a new session starts when
    the gap to the previous event of the same user exceeds 30 minutes
    (lag → boundary flag → running sum = session index), then per-session
    rollup. Same semantics as ``F.session_window`` but each event keeps an
    addressable (user, session_idx) key — what downstream joins need.

    All gaps are integer epoch-microsecond differences (exact cross-engine);
    event_id breaks timestamp ties deterministically.
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id", "event_id", "ts", "value", us.alias("us"),
        F.lag(us).over(w_order).alias("prev_us"),
    )
    marked = ordered.withColumn(
        "is_new",
        F.when(
            F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > _SESSION_GAP_US), 1
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessioned = marked.withColumn("session_idx", F.sum("is_new").over(w_run))
    return sessioned.groupBy("user_id", "session_idx").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.floor((F.max("us") - F.min("us")) / 1_000_000).cast("bigint").alias("duration_sec"),
        F.round(F.sum("value"), 2).alias("session_value"),
    )


@register(
    "q109_retention",
    oracle="""
    WITH activity AS (
        SELECT DISTINCT user_id, date_trunc('day', ts) AS day
        FROM events
    ),
    cohorts AS (
        SELECT user_id, MIN(day) AS cohort_day FROM activity GROUP BY user_id
    )
    SELECT c.cohort_day,
           date_diff('day', c.cohort_day, a.day) AS day_offset,
           COUNT(DISTINCT a.user_id) AS n_users
    FROM activity a JOIN cohorts c ON a.user_id = c.user_id
    GROUP BY c.cohort_day, date_diff('day', c.cohort_day, a.day)
    """,
)
def q109_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention: users grouped by first-seen day, counted per
    day-offset of later activity — the N-day-retention matrix.

    Spark shape: the activity set collapses to distinct (user, day) first
    (map-side partials shrink before the shuffle), the cohort table is a
    per-user aggregate joined back on user_id, and the final count is a
    (cohort_day, offset) aggregate — three shuffles, all on shrinking data.
    """
    (events,) = tables(spark, sf_dir, "events")
    # day stays a truncated TIMESTAMP (not DATE): engines disagree on how
    # DATE round-trips to pandas, and datediff on day-truncated timestamps
    # is identical arithmetic
    activity = events.select(
        "user_id", F.date_trunc("day", "ts").alias("day")
    ).distinct()
    cohorts = activity.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    return (
        activity.join(cohorts, "user_id")
        .select("user_id", "cohort_day", F.datediff("day", "cohort_day").alias("day_offset"))
        .groupBy("cohort_day", "day_offset")
        .agg(F.countDistinct("user_id").alias("n_users"))
    )


_FUNNEL = ("signup", "view", "click", "purchase")


@register(
    "q110_funnel",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t FROM events
        WHERE event_type = '{_FUNNEL[0]}' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = '{_FUNNEL[1]}' AND e.ts > s1.t GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = '{_FUNNEL[2]}' AND e.ts > s2.t GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, MIN(e.ts) AS t FROM events e JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = '{_FUNNEL[3]}' AND e.ts > s3.t GROUP BY e.user_id
    )
    SELECT 1 AS stage, '{_FUNNEL[0]}' AS event_type, COUNT(*) AS n_users FROM s1
    UNION ALL
    SELECT 2, '{_FUNNEL[1]}', COUNT(*) FROM s2
    UNION ALL
    SELECT 3, '{_FUNNEL[2]}', COUNT(*) FROM s3
    UNION ALL
    SELECT 4, '{_FUNNEL[3]}', COUNT(*) FROM s4
    """,
)
def q110_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered funnel analysis: how many users progressed signup → view →
    click → purchase, where each stage must occur strictly after the user's
    previous stage time (iterated conditional minimum).

    Spark shape: each stage is a per-user MIN aggregate; the stage table
    only shrinks down the chain and is broadcast onto the (pre-filtered)
    events scan for the next stage — four broadcast joins, no fact-fact
    shuffle, one narrow union of four 1-row counts at the end.
    """
    (events,) = tables(spark, sf_dir, "events")
    stage = (
        events.filter(F.col("event_type") == _FUNNEL[0])
        .groupBy("user_id")
        .agg(F.min("ts").alias("t"))
    )
    counts = [stage.agg(F.count(F.lit(1)).alias("n_users"))]
    for name in _FUNNEL[1:]:
        prev = stage.select("user_id", F.col("t").alias("prev_t"))
        stage = (
            events.filter(F.col("event_type") == name)
            .join(F.broadcast(prev), "user_id")
            .filter(F.col("ts") > F.col("prev_t"))
            .groupBy("user_id")
            .agg(F.min("ts").alias("t"))
        )
        counts.append(stage.agg(F.count(F.lit(1)).alias("n_users")))
    out = None
    for i, (name, c) in enumerate(zip(_FUNNEL, counts), start=1):
        row = c.select(
            F.lit(i).alias("stage"), F.lit(name).alias("event_type"), "n_users"
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "q116_scd2_intervals",
    oracle="""
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER w AS prev_type,
               LEAD(ts) OVER w AS next_ts
        FROM events
        WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ),
    versions AS (
        SELECT user_id, event_type, ts AS valid_from, next_ts AS valid_to
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    )
    SELECT user_id, event_type, valid_from,
           CASE WHEN valid_to IS NULL THEN 1 ELSE 0 END AS is_current
    FROM versions
    """,
)
def q116_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 dimension assembly from a changelog: collapse consecutive equal
    states per user, emit one validity interval per state change (lag to
    detect the change, lead for the closing timestamp; open interval =
    current version) — the slowly-changing-dimension build every warehouse
    runs from CDC feeds.

    Note the open-interval semantics: ``valid_to`` is the NEXT event's
    timestamp (even if that event carries the same type and was collapsed),
    so intervals tile the user's timeline exactly. Both windows share one
    (user_id)-partitioned sort — one shuffle total.
    """
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.select(
        "user_id",
        "ts",
        "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
        F.lead("ts").over(w).alias("next_ts"),
    )
    versions = changes.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    )
    return versions.select(
        "user_id",
        "event_type",
        F.col("ts").alias("valid_from"),
        F.when(F.col("next_ts").isNull(), 1).otherwise(0).alias("is_current"),
    )


@register(
    "q119_gapfill_ffill",
    oracle="""
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               ROUND(SUM(value), 2) AS hour_value, COUNT(*) AS n_events
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM hourly),
    grid AS (
        SELECT t.event_type, g.hr
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
                    FROM bounds) g
    )
    SELECT g.event_type, g.hr,
           COALESCE(h.n_events, 0) AS n_events,
           last_value(h.hour_value IGNORE NULLS) OVER (
               PARTITION BY g.event_type ORDER BY g.hr
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS filled_value
    FROM grid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hr = h.hr
    """,
)
def q119_gapfill_ffill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-series gap filling: densify per-type hourly rollups onto a
    complete hour grid, then forward-fill the last observed value across
    the gaps (``last(..., ignorenulls=True)`` over an unbounded-preceding
    frame — the standard Spark ffill idiom).

    The grid is built from a 1-row min/max aggregate cross-joined with the
    distinct type dim and exploded in-line via ``sequence(mn, mx, interval
    1 hour)`` — at any corpus size its cardinality is types x hours, so
    both the grid and the hourly rollup are broadcast-safe; the only scan
    of the raw events table is the initial aggregate. Leading gaps (before
    a type's first observation) stay NULL, matching SQL ``IGNORE NULLS``
    semantics on both engines.
    """
    events = tables(spark, sf_dir, "events")[0]
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.round(F.sum("value"), 2).alias("hour_value"),
        F.count(F.lit(1)).alias("n_events"),
    )
    bounds = hourly.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hr"),
        )
    )
    ffill = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    return (
        grid.join(F.broadcast(hourly), ["event_type", "hr"], "left")
        .select(
            "event_type",
            "hr",
            F.coalesce(F.col("n_events"), F.lit(0)).alias("n_events"),
            F.last("hour_value", ignorenulls=True).over(ffill).alias("filled_value"),
        )
    )


@register(
    "q122_time_weighted_avg",
    oracle="""
    WITH stamped AS (
        SELECT user_id,
               CAST(ROUND(value * 100) AS BIGINT) AS cents,
               epoch_us(ts) AS us,
               LEAD(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY epoch_us(ts))
                   AS next_us
        FROM events
    )
    SELECT user_id,
           COUNT(*) AS n_events,
           ROUND(SUM(cents * (next_us - us))::DOUBLE
                 / SUM(next_us - us) / 100, 4) AS twa_value,
           ROUND((MAX(us) - MIN(us)) / 3600000000.0, 2) AS span_hours
    FROM stamped
    GROUP BY user_id
    HAVING SUM(next_us - us) > 0
    """,
)
def q122_time_weighted_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average value per user over an irregularly-sampled
    event series (LOCF weighting: each observation holds until the next
    one, so its weight is the gap to its successor) — the hypertable
    ``time_weight('LOCF')`` aggregate shape.

    Exactness: values are 2-decimal, so they scale to integer cents; gaps
    are integer epoch-microseconds; the weighted numerator is a BIGINT sum
    (cents x µs stays far under 2^63 here), making the result independent
    of partial-aggregation order on both engines. One window + one
    aggregate, both partitioned on user_id — fully parallel at any scale.
    """
    events = tables(spark, sf_dir, "events")[0]
    us = (F.unix_micros("ts")).alias("us")
    w = Window.partitionBy("user_id").orderBy("us")
    stamped = events.select(
        "user_id",
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
        us,
    ).withColumn("next_us", F.lead("us").over(w))
    gap = F.col("next_us") - F.col("us")
    return (
        stamped.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(
                F.sum(F.col("cents") * gap).cast("double") / F.sum(gap) / 100, 4
            ).alias("twa_value"),
            F.round((F.max("us") - F.min("us")) / 3600000000.0, 2).alias("span_hours"),
        )
        .filter(F.sum(gap) > 0)
    )


_ROLLING_DAYS = 7  # trailing window width in days (WAU-style)
_US_PER_DAY = 86_400_000_000


@register(
    "q123_rolling_distinct",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(date_trunc('day', ts)) // {_US_PER_DAY} AS dayno
        FROM events
    ),
    expanded AS (
        SELECT user_id, unnest(generate_series(dayno, dayno + {_ROLLING_DAYS - 1}))
                   AS w FROM ud
    ),
    bounds AS (SELECT MIN(dayno) AS mn, MAX(dayno) AS mx FROM ud)
    SELECT TIMESTAMP '1970-01-01' + w * INTERVAL 1 DAY AS window_day,
           COUNT(DISTINCT user_id) AS users_7d
    FROM expanded, bounds
    WHERE w BETWEEN mn AND mx
    GROUP BY 1
    """,
)
def q123_rolling_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct active users per day (rolling WAU) — the
    sliding-window COUNT(DISTINCT) that plain window frames cannot express
    (distinct counts don't compose across frame rows).

    Shape: dedupe to (user, active-day) pairs first (the only touch of raw
    events), then each pair votes for the {_ROLLING_DAYS} window-end days
    it belongs to via an in-scan integer `sequence` explode — a bounded x7
    narrow expansion — and one distinct-agg per window-end day does the
    rest. Day arithmetic is integer epoch-days end-to-end. At 100 TB the
    same lattice feeds `hll_sketch_agg` per day + a sliding
    `hll_union_agg` (q121) instead of the exact distinct, trading 2% error
    for a shuffle of sketch blobs instead of user ids.
    """
    events = tables(spark, sf_dir, "events")[0]
    ud = (
        events.select(
            "user_id",
            (F.unix_micros(F.date_trunc("day", "ts")) / _US_PER_DAY)
            .cast("bigint")
            .alias("dayno"),
        )
        .distinct()
    )
    bounds = ud.agg(F.min("dayno").alias("mn"), F.max("dayno").alias("mx"))
    expanded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("dayno"), F.col("dayno") + (_ROLLING_DAYS - 1))
        ).alias("w"),
    )
    return (
        expanded.crossJoin(F.broadcast(bounds))
        .filter(F.col("w").between(F.col("mn"), F.col("mx")))
        .groupBy(F.timestamp_micros(F.col("w") * _US_PER_DAY).alias("window_day"))
        .agg(F.countDistinct("user_id").alias("users_7d"))
    )


@register(
    "q129_mad_outliers",
    oracle="""
    WITH v AS (
        SELECT event_type, CAST(ROUND(value * 1000, 0) AS BIGINT) AS v_m
        FROM events
    ),
    med AS (
        SELECT event_type, quantile_cont(v_m, 0.5) AS med_m
        FROM v GROUP BY event_type
    ),
    dev AS (
        SELECT v.event_type, v.v_m, m.med_m, ABS(v.v_m - m.med_m) AS dev_m
        FROM v JOIN med m ON v.event_type = m.event_type
    ),
    mad AS (
        SELECT event_type, quantile_cont(dev_m, 0.5) AS mad_m
        FROM dev GROUP BY event_type
    )
    SELECT d.event_type,
           d.med_m AS median_milli,
           ma.mad_m AS mad_milli,
           COUNT(*) AS n_events,
           CAST(SUM(CASE WHEN d.dev_m > 3 * ma.mad_m THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM dev d JOIN mad ma ON d.event_type = ma.event_type
    GROUP BY d.event_type, d.med_m, ma.mad_m
    """,
)
def q129_mad_outliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust anomaly detection: per event type, the median / MAD (median
    absolute deviation) of `value`, and how many events sit more than
    3 MADs from the median — the standard robust-z outlier rule, immune to
    the outliers it hunts (unlike mean/stddev z-scores).

    Exactness: values quantize to integer millis first, so every median is
    an interpolated midpoint of integers (exactly representable, ergo the
    `> 3·MAD` boundary is bit-stable across engines — oracle uses
    ``quantile_cont``, Spark continuous ``percentile``). Scale shape: two
    tiny per-type aggregates broadcast back onto the stream; at 100 TB the
    exact per-group percentile (which gathers each group's values) swaps
    for ``approx_percentile`` with the same pipeline — the rule tolerates
    sketch error by construction.
    """
    events = tables(spark, sf_dir, "events")[0]
    v = events.select(
        "event_type", F.round(F.col("value") * 1000, 0).cast("bigint").alias("v_m")
    )
    med = v.groupBy("event_type").agg(F.percentile("v_m", 0.5).alias("med_m"))
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type",
        "med_m",
        F.abs(F.col("v_m") - F.col("med_m")).alias("dev_m"),
    )
    mad = dev.groupBy(F.col("event_type").alias("m_type")).agg(
        F.percentile("dev_m", 0.5).alias("mad_m")
    )
    return (
        dev.join(F.broadcast(mad), F.col("event_type") == F.col("m_type"))
        .groupBy(
            "event_type",
            F.col("med_m").alias("median_milli"),
            F.col("mad_m").alias("mad_milli"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum(
                F.when(F.col("dev_m") > 3 * F.col("mad_m"), 1).otherwise(0)
            ).alias("n_outliers"),
        )
    )


@register(
    "q157_transition_matrix",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type
        FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           CAST(COUNT(*) AS BIGINT) AS n_transitions,
           CAST((1000000 * COUNT(*))
                // SUM(COUNT(*)) OVER (PARTITION BY event_type) AS BIGINT)
               AS share_ppm
    FROM seq WHERE next_type IS NOT NULL
    GROUP BY event_type, next_type
    """,
)
def q157_transition_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over per-user event sequences:
    for each (from_type → to_type) pair, the transition count and its ppm
    share of all transitions leaving ``from_type`` — the behavioral-flow
    primitive behind next-action prediction and funnel discovery.

    Shape: one LEAD window partitioned by user (the entity key — never a
    global sort), one grouped count, and the share normalizer is a window
    over the |types|² matrix, not the corpus. Integer-ppm division keeps
    the shares bit-exact. Deterministic sequence order ties on event_id.
    """
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).filter(F.col("next_type").isNotNull())
    counted = seq.groupBy(
        F.col("event_type").alias("from_type"), F.col("next_type").alias("to_type")
    ).agg(F.count(F.lit(1)).alias("n_transitions"))
    return counted.select(
        "from_type",
        "to_type",
        "n_transitions",
        F.expr(
            "(1000000 * n_transitions) DIV SUM(n_transitions) OVER (PARTITION BY from_type)"
        ).alias("share_ppm"),
    )


@register(
    "q158_dwell_time",
    oracle="""
    WITH spans AS (
        SELECT user_id, event_type,
               (epoch_us(LEAD(ts) OVER (PARTITION BY user_id
                                        ORDER BY ts, event_id))
                - epoch_us(ts)) // 1000000 AS dwell_s
        FROM events
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n_spans,
           CAST(SUM(dwell_s) AS BIGINT) AS total_dwell_s,
           CAST(SUM(dwell_s) // COUNT(*) AS BIGINT) AS avg_dwell_s
    FROM spans WHERE dwell_s IS NOT NULL
    GROUP BY event_type
    """,
)
def q158_dwell_time(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-in-state analytics: how long users dwell in each event type
    before their next action (span = gap to the user's next event). The
    state-duration primitive for engagement and ops dashboards.

    One LEAD window on the user key, spans in integer epoch-seconds (exact
    BIGINT sums — no float duration drift), one grouped rollup. The final
    average uses integer division so both engines floor identically.
    """
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # exact epoch-micros difference floored to seconds: unix_timestamp would
    # truncate each endpoint BEFORE subtracting and drift vs the oracle
    dwell = F.expr(
        "(unix_micros(lead(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id))"
        " - unix_micros(ts)) DIV 1000000"
    )
    spans = events.select("event_type", dwell.alias("dwell_s")).filter(
        F.col("dwell_s").isNotNull()
    )
    return spans.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_spans"),
        F.sum("dwell_s").alias("total_dwell_s"),
        F.expr("SUM(dwell_s) DIV COUNT(*)").alias("avg_dwell_s"),
    )


_WF_DAYS = 7  # each stage must follow the previous within this window


@register(
    "q159_windowed_funnel",
    oracle=f"""
    WITH s1 AS (
        SELECT user_id, MIN(ts) AS t1 FROM events
        WHERE event_type = 'signup' GROUP BY user_id
    ),
    s2 AS (
        SELECT e.user_id, MIN(e.ts) AS t2
        FROM events e JOIN s1 ON e.user_id = s1.user_id
        WHERE e.event_type = 'view' AND e.ts > s1.t1
          AND e.ts <= s1.t1 + INTERVAL {_WF_DAYS} DAY
        GROUP BY e.user_id
    ),
    s3 AS (
        SELECT e.user_id, MIN(e.ts) AS t3
        FROM events e JOIN s2 ON e.user_id = s2.user_id
        WHERE e.event_type = 'click' AND e.ts > s2.t2
          AND e.ts <= s2.t2 + INTERVAL {_WF_DAYS} DAY
        GROUP BY e.user_id
    ),
    s4 AS (
        SELECT e.user_id, MIN(e.ts) AS t4
        FROM events e JOIN s3 ON e.user_id = s3.user_id
        WHERE e.event_type = 'purchase' AND e.ts > s3.t3
          AND e.ts <= s3.t3 + INTERVAL {_WF_DAYS} DAY
        GROUP BY e.user_id
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM s1) AS n_signup,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s2) AS n_view_7d,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s3) AS n_click_7d,
           (SELECT CAST(COUNT(*) AS BIGINT) FROM s4) AS n_purchase_7d
    """,
)
def q159_windowed_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-constrained sequential funnel: signup → view → click → purchase
    where each stage must happen within {days} days of the user's PREVIOUS
    stage completion (q110 is the unconstrained ordered funnel; real
    conversion windows look like this). Earliest-qualifying-event
    semantics at every stage.

    Shape: four grouped MINs chained by equi-joins on user_id — every
    stage reuses the same hash partitioning (AQE plans one exchange per
    stage side, no window over raw events, no per-user sort). Timestamp
    bounds compare at full microsecond precision on both engines. At
    100 TB each stage's survivor table shrinks monotonically, and the
    event scan is pruned to the stage's event type before its join.
    """
    (events,) = tables(spark, sf_dir, "events")

    def stage(evt: str, prev, tcol: str):
        e = events.filter(F.col("event_type") == evt).select("user_id", "ts")
        if prev is None:
            return e.groupBy("user_id").agg(F.min("ts").alias(tcol))
        prev_t = prev.columns[1]
        return (
            e.join(prev, "user_id")
            .filter(
                (F.col("ts") > F.col(prev_t))
                & (F.col("ts") <= F.col(prev_t) + F.expr(f"INTERVAL {_WF_DAYS} DAY"))
            )
            .groupBy("user_id")
            .agg(F.min("ts").alias(tcol))
        )

    s1 = stage("signup", None, "t1")
    s2 = stage("view", s1, "t2")
    s3 = stage("click", s2, "t3")
    s4 = stage("purchase", s3, "t4")
    counts = [
        df.agg(F.count(F.lit(1)).alias(name))
        for df, name in [
            (s1, "n_signup"),
            (s2, "n_view_7d"),
            (s3, "n_click_7d"),
            (s4, "n_purchase_7d"),
        ]
    ]
    out = counts[0]
    for c in counts[1:]:
        out = out.crossJoin(c)
    return out


@register(
    "q163_event_streaks",
    oracle="""
    WITH numbered AS (
        SELECT user_id, event_type,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts, event_id) AS rn,
               ROW_NUMBER() OVER (PARTITION BY user_id, event_type
                                  ORDER BY ts, event_id) AS rn_type
        FROM events
    ),
    islands AS (
        SELECT user_id, event_type, rn - rn_type AS island,
               CAST(COUNT(*) AS BIGINT) AS streak_len
        FROM numbered
        GROUP BY user_id, event_type, rn - rn_type
    )
    SELECT event_type,
           CAST(MAX(streak_len) AS BIGINT) AS longest_streak,
           CAST(COUNT(*) AS BIGINT) AS n_streaks,
           CAST(SUM(CASE WHEN streak_len >= 3 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_streaks_3plus
    FROM islands
    GROUP BY event_type
    """,
)
def q163_event_streaks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: the longest run of CONSECUTIVE same-type events per
    user (engagement streaks, repeated-failure detection), via the
    row_number-difference trick — rn over the user's full sequence minus rn
    over the user's per-type sequence is constant exactly within a
    consecutive run, so islands fall out of a GROUP BY with no self-join
    and no iterative logic.

    Shape: two window passes over the same (user) partitioning (Catalyst
    shares the exchange; the second window only adds a sort key), then two
    grouped rollups. Deterministic sequence order ties on event_id. At
    100 TB this is the standard islands shape — the naive alternative
    (self-join on adjacency) is quadratic within hot users.
    """
    (events,) = tables(spark, sf_dir, "events")
    w_all = Window.partitionBy("user_id").orderBy("ts", "event_id")
    w_type = Window.partitionBy("user_id", "event_type").orderBy("ts", "event_id")
    numbered = events.select(
        "user_id",
        "event_type",
        (F.row_number().over(w_all) - F.row_number().over(w_type)).alias("island"),
    )
    islands = numbered.groupBy("user_id", "event_type", "island").agg(
        F.count(F.lit(1)).alias("streak_len")
    )
    return islands.groupBy("event_type").agg(
        F.max("streak_len").alias("longest_streak"),
        F.count(F.lit(1)).alias("n_streaks"),
        F.sum(F.when(F.col("streak_len") >= 3, 1).otherwise(0)).alias("n_streaks_3plus"),
    )


@register(
    "q166_linear_interpolation",
    oracle="""
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS cents,
               COUNT(*) AS n
        FROM events GROUP BY 1, 2
    ),
    bounds AS (SELECT MIN(hr) AS mn, MAX(hr) AS mx FROM hourly),
    grid AS (
        SELECT t.event_type, g.hr
        FROM (SELECT DISTINCT event_type FROM events) t
        CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 1 HOUR)) AS hr
                    FROM bounds) g
    ),
    joined AS (
        SELECT g.event_type, g.hr,
               epoch_us(g.hr) // 3600000000 AS hnum,
               CASE WHEN h.n IS NULL THEN NULL
                    ELSE CAST(h.cents AS DOUBLE) / h.n END AS obs
        FROM grid g LEFT JOIN hourly h
          ON g.event_type = h.event_type AND g.hr = h.hr
    ),
    ctx AS (
        SELECT event_type, hr, hnum, obs,
               last_value(CASE WHEN obs IS NOT NULL THEN hnum END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_h,
               last_value(obs IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS prev_v,
               first_value(CASE WHEN obs IS NOT NULL THEN hnum END IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_h,
               first_value(obs IGNORE NULLS)
                   OVER (PARTITION BY event_type ORDER BY hr
                         ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING) AS next_v
        FROM joined
    )
    SELECT event_type, hr,
           CASE WHEN obs IS NOT NULL THEN ROUND(obs, 4)
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN
                    ROUND(prev_v + (next_v - prev_v) * (hnum - prev_h)
                          / (next_h - prev_h), 4)
                ELSE ROUND(COALESCE(prev_v, next_v), 4) END AS interp_value,
           CASE WHEN obs IS NOT NULL THEN 'observed'
                WHEN prev_v IS NOT NULL AND next_v IS NOT NULL THEN 'interpolated'
                ELSE 'edge_filled' END AS fill_kind
    FROM ctx
    """,
)
def q166_linear_interpolation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Linear gap interpolation on the dense hour grid — the interpolation
    twin of q119's forward fill: missing hours take the straight line
    between the surrounding observed hours (sensor/metric reconstruction
    semantics); grid edges beyond the first/last observation fall back to
    the nearest value.

    Determinism: the observed value is SUM(exact cents)/count evaluated in
    double from exact integers; the interpolation fraction divides exact
    integer hour numbers; both engines evaluate the identical expression
    tree, so ROUND(…, 4) agrees. Shape: q119's grid (types × hours,
    corpus-size independent) + four IGNORE-NULLS window passes sharing ONE
    per-type partitioning — the raw events table is scanned exactly once
    for the hourly rollup.
    """
    events = tables(spark, sf_dir, "events")[0]
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(
        F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("cents"),
        F.count(F.lit(1)).alias("n"),
    )
    bounds = hourly.agg(F.min("hr").alias("mn"), F.max("hr").alias("mx"))
    grid = (
        events.select("event_type")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "event_type",
            F.explode(F.expr("sequence(mn, mx, interval 1 hour)")).alias("hr"),
        )
    )
    joined = grid.join(F.broadcast(hourly), ["event_type", "hr"], "left").select(
        "event_type",
        "hr",
        F.expr("unix_micros(hr) DIV 3600000000").alias("hnum"),
        F.when(
            F.col("n").isNotNull(), F.col("cents").cast("double") / F.col("n")
        ).alias("obs"),
    )
    w_prev = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        Window.unboundedPreceding, 0
    )
    w_next = Window.partitionBy("event_type").orderBy("hr").rowsBetween(
        0, Window.unboundedFollowing
    )
    marked = F.when(F.col("obs").isNotNull(), F.col("hnum"))
    ctx = joined.select(
        "event_type",
        "hr",
        "hnum",
        "obs",
        F.last(marked, ignorenulls=True).over(w_prev).alias("prev_h"),
        F.last("obs", ignorenulls=True).over(w_prev).alias("prev_v"),
        F.first(marked, ignorenulls=True).over(w_next).alias("next_h"),
        F.first("obs", ignorenulls=True).over(w_next).alias("next_v"),
    )
    both = F.col("prev_v").isNotNull() & F.col("next_v").isNotNull()
    interp = F.col("prev_v") + (F.col("next_v") - F.col("prev_v")) * (
        F.col("hnum") - F.col("prev_h")
    ) / (F.col("next_h") - F.col("prev_h"))
    return ctx.select(
        "event_type",
        "hr",
        F.when(F.col("obs").isNotNull(), F.round(F.col("obs"), 4))
        .when(both, F.round(interp, 4))
        .otherwise(F.round(F.coalesce("prev_v", "next_v"), 4))
        .alias("interp_value"),
        F.when(F.col("obs").isNotNull(), "observed")
        .when(both, "interpolated")
        .otherwise("edge_filled")
        .alias("fill_kind"),
    )


_ANOM_K = 2  # flag when |x - mean| > K * stddev over the trailing frame
_ANOM_FRAME = 24  # trailing hours (exclusive of the current hour)


@register(
    "q167_rolling_anomaly",
    oracle=f"""
    WITH hourly AS (
        SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hr,
               CAST(SUM(CAST(ROUND(value * 100, 0) AS BIGINT)) AS BIGINT) AS x
        FROM events GROUP BY 1, 2
    ),
    framed AS (
        SELECT event_type, hr, x,
               COUNT(*) OVER w AS n,
               CAST(SUM(x) OVER w AS BIGINT) AS s,
               CAST(SUM(x * x) OVER w AS BIGINT) AS q
        FROM hourly
        WINDOW w AS (PARTITION BY event_type ORDER BY hr
                     ROWS BETWEEN {_ANOM_FRAME} PRECEDING AND 1 PRECEDING)
    )
    SELECT event_type, hr, x,
           CASE WHEN n >= 6 AND (n * x - s) * (n * x - s)
                    > {_ANOM_K * _ANOM_K} * (n * q - s * s)
                THEN 1 ELSE 0 END AS is_anomaly
    FROM framed
    WHERE n >= 6 AND (n * x - s) * (n * x - s) > {_ANOM_K * _ANOM_K} * (n * q - s * s)
    """,
)
def q167_rolling_anomaly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-window anomaly detection on the hourly revenue series: an
    hour is anomalous when it deviates from its trailing-24h mean by more
    than {k}σ — the monitoring primitive behind alerting on metric streams.

    The test |x−μ| > Kσ is evaluated ENTIRELY in integers by
    cross-multiplication: (n·x−S)² > K²·(n·Q−S²) with S=Σx, Q=Σx² as exact
    BIGINT frame sums — no float mean, no sqrt, no division, so the flag
    is bit-identical across engines and partition orders (a float stddev
    recurrence would drift at the boundary). Requires ≥6 trailing hours.
    One grouped rollup scans the corpus; the window runs over the tiny
    hourly series per type. At larger magnitudes the moments switch to
    DECIMAL(38) like q147 before int64 could wrap.
    """
    events = tables(spark, sf_dir, "events")[0]
    hourly = events.groupBy(
        "event_type", F.date_trunc("hour", "ts").alias("hr")
    ).agg(F.sum(F.round(F.col("value") * 100, 0).cast("bigint")).alias("x"))
    w = (
        Window.partitionBy("event_type")
        .orderBy("hr")
        .rowsBetween(-_ANOM_FRAME, -1)
    )
    framed = hourly.select(
        "event_type",
        "hr",
        "x",
        F.count(F.lit(1)).over(w).alias("n"),
        F.sum("x").over(w).alias("s"),
        F.sum(F.col("x") * F.col("x")).over(w).alias("q"),
    )
    dev = F.col("n") * F.col("x") - F.col("s")
    var_n2 = F.col("n") * F.col("q") - F.col("s") * F.col("s")
    flagged = (F.col("n") >= 6) & (dev * dev > _ANOM_K * _ANOM_K * var_n2)
    return framed.filter(flagged).select(
        "event_type", "hr", "x", F.lit(1).alias("is_anomaly")
    )


@register(
    "q168_daily_percentile_bands",
    oracle="""
    WITH vals AS (
        SELECT CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
               CAST(ROUND(value * 100, 0) AS BIGINT) AS cents
        FROM events
    ),
    h AS (SELECT day, cents, COUNT(*) AS c FROM vals GROUP BY day, cents),
    cum AS (
        SELECT day, cents,
               SUM(c) OVER (PARTITION BY day ORDER BY cents) AS cum,
               SUM(c) OVER (PARTITION BY day) AS cnt
        FROM h
    )
    SELECT day,
           CAST(MAX(cnt) AS BIGINT) AS n_events,
           MIN(CASE WHEN 2 * cum >= cnt THEN cents END) AS p50_cents,
           MIN(CASE WHEN 10 * cum >= 9 * cnt THEN cents END) AS p90_cents,
           MIN(CASE WHEN 100 * cum >= 99 * cnt THEN cents END) AS p99_cents
    FROM cum GROUP BY day
    """,
)
def q168_daily_percentile_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily p50/p90/p99 value bands — the latency/value dashboard query —
    computed EXACTLY via the q140 histogram-cumulative shape: group counts
    per (day, integer cents), cumulative window over distinct values only,
    integer rank rules (``2·cum ≥ cnt`` etc.), so thresholds are
    bit-identical across engines and no day ever funnels through a
    single-task sort. At 100 TB the only corpus-sized operation is the
    grouped count with map-side combine; `approx_percentile` is the
    documented swap-in when the value domain itself is huge.
    """
    events = tables(spark, sf_dir, "events")[0]
    vals = events.select(
        F.date_trunc("day", "ts").alias("day"),
        F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
    )
    h = vals.groupBy("day", "cents").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy("day").orderBy("cents")
    w_all = Window.partitionBy("day")
    cum = h.select(
        "day",
        "cents",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("cnt"),
    )
    def thresh(mult_cum: int, mult_cnt: int):
        return F.min(
            F.when(mult_cum * F.col("cum") >= mult_cnt * F.col("cnt"), F.col("cents"))
        )
    return cum.groupBy("day").agg(
        F.max("cnt").alias("n_events"),
        thresh(2, 1).alias("p50_cents"),
        thresh(10, 9).alias("p90_cents"),
        thresh(100, 99).alias("p99_cents"),
    )


@register(
    "q169_dq_rules",
    oracle="""
    SELECT 'orders_null_custkey' AS rule,
           CAST(COUNT(*) AS BIGINT) AS n_checked,
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_violations
    FROM orders
    UNION ALL
    SELECT 'orders_nonpositive_price',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders
    UNION ALL
    SELECT 'orders_orphan_custkey',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN c.c_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
    FROM orders o LEFT JOIN customer c ON o.o_custkey = c.c_custkey
    UNION ALL
    SELECT 'lineitem_discount_range',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_discount < 0 OR l_discount > 0.5 THEN 1 ELSE 0 END)
               AS BIGINT)
    FROM lineitem
    UNION ALL
    SELECT 'lineitem_date_bounds',
           CAST(COUNT(*) AS BIGINT),
           CAST(SUM(CASE WHEN l_shipdate < TIMESTAMP '1990-01-01'
                          OR l_shipdate > TIMESTAMP '2030-01-01'
                    THEN 1 ELSE 0 END) AS BIGINT)
    FROM lineitem
    """,
)
def q169_dq_rules(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Data-quality rule suite (the dbt-tests / great-expectations shape):
    null checks, range checks, date bounds, and a referential-integrity
    check (orders → customer), each emitting (rule, n_checked,
    n_violations) — the audit table a pipeline gates its publishes on.

    Shape: per-table rules fuse into ONE conditional-aggregation scan per
    table (never one scan per rule); the FK check is a broadcast LEFT
    join counted in the same pass. Runtime-metrics twin: plans/metrics.py
    computes the same counters via ``Dataset.observe`` INSIDE a production
    action, zero extra scans — this query is the standalone audit the
    oracle can check.
    """
    orders, customer, lineitem = tables(spark, sf_dir, "orders", "customer", "lineitem")

    def rule(df, name, cond):
        return df.agg(
            F.lit(name).alias("rule"),
            F.count(F.lit(1)).alias("n_checked"),
            F.sum(F.when(cond, 1).otherwise(0)).alias("n_violations"),
        )

    orphan = orders.join(
        F.broadcast(customer.select("c_custkey")),
        F.col("o_custkey") == F.col("c_custkey"),
        "left",
    )
    parts = [
        rule(orders, "orders_null_custkey", F.col("o_custkey").isNull()),
        rule(orders, "orders_nonpositive_price", F.col("o_totalprice") <= 0),
        rule(orphan, "orders_orphan_custkey", F.col("c_custkey").isNull()),
        rule(
            lineitem,
            "lineitem_discount_range",
            (F.col("l_discount") < 0) | (F.col("l_discount") > 0.5),
        ),
        rule(
            lineitem,
            "lineitem_date_bounds",
            (F.col("l_shipdate") < F.lit("1990-01-01").cast("timestamp"))
            | (F.col("l_shipdate") > F.lit("2030-01-01").cast("timestamp")),
        ),
    ]
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


_ATTR_WINDOW_US = 3 * 24 * 3600 * 1_000_000  # 3-day lookback, epoch-micros


@register(
    "q171_last_touch_attribution",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, epoch_us(ts) AS p_us
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT user_id, event_type AS channel, epoch_us(ts) AS t_us
        FROM events WHERE event_type IN ('click', 'view')
    ),
    attributed AS (
        SELECT p.event_id,
               (SELECT t.channel FROM touches t
                WHERE t.user_id = p.user_id
                  AND t.t_us < p.p_us
                  AND t.t_us >= p.p_us - {_ATTR_WINDOW_US}
                ORDER BY t.t_us DESC, t.channel ASC LIMIT 1) AS channel
        FROM purchases p
    )
    SELECT COALESCE(channel, 'unattributed') AS channel,
           CAST(COUNT(*) AS BIGINT) AS n_purchases
    FROM attributed GROUP BY 1
    """,
)
def q171_last_touch_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Last-touch marketing attribution: each purchase is credited to the
    user's most recent click/view within a 3-day lookback (ties to the
    channel name); purchases with no qualifying touch stay unattributed.

    The as-of-join shape (q37) applied to a stream against itself: both
    sides hash-partition on user_id, candidate (purchase, touch) rows
    filter to the lookback band, and a per-purchase top-1 window picks the
    latest touch — the window and the join share one user partitioning.
    Per-purchase fan-out is bounded by the lookback window, not stream
    length; timestamps compare as exact epoch-micros. The oracle's
    correlated subquery is the same semantics the optimizer-friendly form
    avoids at scale.
    """
    events = tables(spark, sf_dir, "events")[0]
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", F.expr("unix_micros(ts)").alias("p_us")
    )
    touches = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.expr("unix_micros(ts)").alias("t_us"),
    )
    cand = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - _ATTR_WINDOW_US),
    )
    w = Window.partitionBy("event_id").orderBy(
        F.col("t_us").desc(), F.col("channel").asc()
    )
    attributed = (
        cand.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("event_id", "channel")
    )
    return (
        purchases.join(attributed, "event_id", "left")
        .select(F.coalesce(F.col("channel"), F.lit("unattributed")).alias("channel"))
        .groupBy("channel")
        .agg(F.count(F.lit(1)).alias("n_purchases"))
    )


@register(
    "q172_cohort_ltv",
    oracle="""
    WITH firsts AS (
        SELECT user_id, CAST(date_trunc('week', MIN(ts)) AS TIMESTAMP) AS cohort_week
        FROM events GROUP BY user_id
    ),
    purchases AS (
        SELECT e.user_id, f.cohort_week,
               CAST((epoch_us(date_trunc('week', e.ts))
                     - epoch_us(f.cohort_week)) // 604800000000 AS BIGINT)
                   AS week_offset,
               CAST(ROUND(e.value * 100, 0) AS BIGINT) AS cents
        FROM events e JOIN firsts f ON e.user_id = f.user_id
        WHERE e.event_type = 'purchase'
    )
    SELECT cohort_week, week_offset,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_buyers,
           CAST(SUM(cents) AS BIGINT) AS value_cents
    FROM purchases
    GROUP BY cohort_week, week_offset
    """,
)
def q172_cohort_ltv(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime value: users cohorted by first-activity week, then
    purchase value rolled up by (cohort, weeks-since-cohort) — the
    value-weighted big sibling of q109's retention counts, and the table
    behind every LTV curve.

    Shape: first-touch is one grouped MIN on user_id; the cohort dim joins
    back on the same user partitioning; the rollup is a grouped sum of
    exact integer cents with a distinct-buyer count. Week offsets divide
    exact epoch-micros by the week constant — no date arithmetic
    ambiguity between engines.
    """
    events = tables(spark, sf_dir, "events")[0]
    firsts = events.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).alias("cohort_week")
    )
    week_us = 7 * 24 * 3600 * 1_000_000
    purchases = (
        events.filter(F.col("event_type") == "purchase")
        .join(firsts, "user_id")
        .select(
            "user_id",
            "cohort_week",
            (
                (
                    F.expr("unix_micros(date_trunc('week', ts))")
                    - F.expr("unix_micros(cohort_week)")
                )
                / week_us
            )
            .cast("bigint")
            .alias("week_offset"),
            F.round(F.col("value") * 100, 0).cast("bigint").alias("cents"),
        )
    )
    return purchases.groupBy("cohort_week", "week_offset").agg(
        F.count_distinct("user_id").alias("n_buyers"),
        F.sum("cents").alias("value_cents"),
    )


@register(
    "q179_session_paths",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev_us
        FROM events
    ),
    marked AS (
        SELECT *,
               CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sessioned AS (
        SELECT user_id, event_id, event_type, us,
               SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                                 ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM marked
    ),
    paths AS (
        SELECT user_id, session_idx,
               array_to_string(list(event_type ORDER BY us, event_id), '>') AS path
        FROM sessioned
        GROUP BY user_id, session_idx
    )
    SELECT path, CAST(COUNT(*) AS BIGINT) AS n_sessions
    FROM paths
    GROUP BY path
    ORDER BY n_sessions DESC, path ASC
    LIMIT 10
    """,
)
def q179_session_paths(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Session path mining: the 10 most common within-session event-type
    sequences (the product-analytics "what do users actually do" table,
    and the input to q157's transition matrix at path granularity).
    Sessions come from q108's 30-minute-gap rule.

    Determinism: ``collect_list`` has NO ordering guarantee, so the path
    assembles via ``array_sort`` of (us, event_id, type) structs before
    the types are joined — the struct sort pins the order the oracle's
    ``list(... ORDER BY)`` declares. Top-10 is TakeOrdered with a path
    tiebreak. Path cardinality is bounded by behavior, not corpus size;
    the heavy operations are the session window and one grouped
    aggregation per (user, session).
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id", "event_id", "event_type", us.alias("us"),
        F.lag(us).over(w_order).alias("prev_us"),
    )
    marked = ordered.withColumn(
        "is_new",
        F.when(
            F.col("prev_us").isNull()
            | (F.col("us") - F.col("prev_us") > _SESSION_GAP_US),
            1,
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessioned = marked.withColumn("session_idx", F.sum("is_new").over(w_run))
    paths = sessioned.groupBy("user_id", "session_idx").agg(
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("us", "event_id", "event_type"))
                ),
                lambda s: s.event_type,
            ),
            ">",
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count(F.lit(1)).alias("n_sessions"))
        .orderBy(F.col("n_sessions").desc(), F.col("path").asc())
        .limit(10)
    )


@register(
    "q181_rolling_distinct_hll",
    oracle=f"""
    WITH ud AS (
        SELECT DISTINCT user_id,
               epoch_us(date_trunc('day', ts)) // {_US_PER_DAY} AS dayno
        FROM events
    ),
    expanded AS (
        SELECT user_id, unnest(generate_series(dayno, dayno + {_ROLLING_DAYS - 1}))
                   AS w FROM ud
    ),
    bounds AS (SELECT MIN(dayno) AS mn, MAX(dayno) AS mx FROM ud)
    SELECT TIMESTAMP '1970-01-01' + w * INTERVAL 1 DAY AS window_day,
           COUNT(DISTINCT user_id) AS exact_users_7d,
           TRUE AS hll_within_2pct
    FROM expanded, bounds
    WHERE w BETWEEN mn AND mx
    GROUP BY 1, 3
    """,
)
def q181_rolling_distinct_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q123's documented 100 TB swap-in, MADE REAL and accuracy-gated: the
    trailing {d}-day distinct users computed as per-day ``hll_sketch_agg``
    blobs unioned by a sliding ``hll_union_agg`` — the shuffle carries
    fixed-size sketches instead of user ids, which is what survives when
    daily actives outgrow an exact distinct. The query emits the EXACT
    rolling count (oracle-checkable) plus a boolean asserting the sketch
    estimate landed within 2% — the q16/q121 pattern, so a drifting
    sketch fails the hash gate, not just a unit test.

    Shape: ONE dedup of (user, day) feeds both paths; the sketch path is
    per-day sketches (31 rows) + a 7-row sliding union window; the exact
    path is the q123 lattice. At 100 TB you ship only the sketch path.
    """
    events = tables(spark, sf_dir, "events")[0]
    ud = (
        events.select(
            "user_id",
            (F.unix_micros(F.date_trunc("day", "ts")) / _US_PER_DAY)
            .cast("bigint")
            .alias("dayno"),
        )
        .distinct()
        .localCheckpoint()
    )
    # sketch path: per-day HLL blobs, sliding union over the trailing week
    daily = ud.groupBy("dayno").agg(F.expr("hll_sketch_agg(user_id)").alias("sk"))
    w_slide = (
        Window.orderBy("dayno").rowsBetween(-(_ROLLING_DAYS - 1), 0)
    )
    unioned = daily.select(
        "dayno", F.expr("hll_union_agg(sk)").over(w_slide).alias("usk")
    )
    est = unioned.select(
        "dayno", F.expr("hll_sketch_estimate(usk)").alias("hll_users_7d")
    )
    # exact path: the q123 lattice
    bounds = ud.agg(F.min("dayno").alias("mn"), F.max("dayno").alias("mx"))
    expanded = ud.select(
        "user_id",
        F.explode(
            F.sequence(F.col("dayno"), F.col("dayno") + (_ROLLING_DAYS - 1))
        ).alias("w"),
    )
    exact = (
        expanded.crossJoin(F.broadcast(bounds))
        .filter(F.col("w").between(F.col("mn"), F.col("mx")))
        .groupBy(F.col("w").alias("dayno"))
        .agg(F.countDistinct("user_id").alias("exact_users_7d"))
    )
    return (
        exact.join(F.broadcast(est), "dayno")
        .select(
            F.timestamp_micros(F.col("dayno") * _US_PER_DAY).alias("window_day"),
            "exact_users_7d",
            (
                F.abs(F.col("hll_users_7d") - F.col("exact_users_7d"))
                <= 0.02 * F.col("exact_users_7d")
            ).alias("hll_within_2pct"),
        )
    )


@register(
    "q182_scd2_validity_audit",
    oracle="""
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    versions AS (
        SELECT user_id, ts AS valid_from, event_id,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to,
               ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts, event_id) AS rn
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    corrupted AS (
        SELECT user_id,
               valid_from,
               CASE WHEN rn % 7 = 3 THEN valid_to + INTERVAL 1 HOUR
                    ELSE valid_to END AS valid_to
        FROM versions WHERE rn % 5 <> 0
    ),
    audit_clean AS (
        SELECT 'clean' AS dataset, user_id, valid_from, valid_to,
               LAG(valid_to) OVER (PARTITION BY user_id ORDER BY valid_from)
                   AS prev_to
        FROM versions
    ),
    audit_corrupted AS (
        SELECT 'corrupted' AS dataset, user_id, valid_from, valid_to,
               LAG(valid_to) OVER (PARTITION BY user_id ORDER BY valid_from)
                   AS prev_to
        FROM corrupted
    ),
    audits AS (SELECT * FROM audit_clean UNION ALL SELECT * FROM audit_corrupted)
    SELECT dataset,
           CAST(COUNT(*) AS BIGINT) AS n_versions,
           CAST(SUM(CASE WHEN prev_to IS NOT NULL AND prev_to > valid_from
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_overlaps,
           CAST(SUM(CASE WHEN prev_to IS NOT NULL AND prev_to < valid_from
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_gaps
    FROM audits
    GROUP BY dataset
    """,
)
def q182_scd2_validity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD2 validity auditing — the structural checks a dimension table
    must pass before anyone trusts AS-OF queries against it: within each
    key, consecutive versions must neither overlap (prev valid_to >
    valid_from) nor gap (prev valid_to < valid_from). The audit runs over
    the CLEAN q116-style version table (expected: zero violations — the
    tiling proof) AND a deliberately corrupted copy (every 5th version
    dropped → gaps; every 7th surviving valid_to stretched 1h → overlaps),
    proving the checker detects both defect classes rather than trivially
    passing.

    One (key)-partitioned sort serves version assembly and the audit lag;
    per-dataset rollups are conditional counts in one pass. This is the
    dimension-table counterpart of q169's fact-table rule suite.
    """
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    versions = (
        changes.filter(
            F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
        )
        .select(
            "user_id",
            F.col("ts").alias("valid_from"),
            "event_id",
            F.lead("ts").over(w).alias("valid_to"),
            F.row_number().over(w).alias("rn"),
        )
    )
    corrupted = versions.filter(F.col("rn") % 5 != 0).select(
        "user_id",
        "valid_from",
        F.when(
            F.col("rn") % 7 == 3, F.col("valid_to") + F.expr("INTERVAL 1 HOUR")
        )
        .otherwise(F.col("valid_to"))
        .alias("valid_to"),
    )

    def audit(df: DataFrame, name: str) -> DataFrame:
        w_a = Window.partitionBy("user_id").orderBy("valid_from")
        a = df.select(
            F.lit(name).alias("dataset"),
            "valid_from",
            "valid_to",
            F.lag("valid_to").over(w_a).alias("prev_to"),
        )
        return a.groupBy("dataset").agg(
            F.count(F.lit(1)).alias("n_versions"),
            F.sum(
                F.when(
                    F.col("prev_to").isNotNull()
                    & (F.col("prev_to") > F.col("valid_from")),
                    1,
                ).otherwise(0)
            ).alias("n_overlaps"),
            F.sum(
                F.when(
                    F.col("prev_to").isNotNull()
                    & (F.col("prev_to") < F.col("valid_from")),
                    1,
                ).otherwise(0)
            ).alias("n_gaps"),
        )

    return audit(
        versions.select("user_id", "valid_from", "valid_to"), "clean"
    ).unionByName(audit(corrupted, "corrupted"))


@register(
    "q183_point_in_time_lookup",
    oracle=f"""
    WITH changes AS (
        SELECT user_id, ts, event_id, event_type,
               LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS prev_type
        FROM events
    ),
    versions AS (
        SELECT user_id, event_type, ts AS valid_from,
               LEAD(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id)
                   AS valid_to
        FROM changes
        WHERE prev_type IS NULL OR prev_type <> event_type
    ),
    bounds AS (SELECT MIN(ts) AS mn, MAX(ts) AS mx FROM events),
    probes AS (
        SELECT u.user_id, g.t
        FROM (SELECT DISTINCT user_id FROM events WHERE user_id % 50 = 0) u
        CROSS JOIN (SELECT unnest(generate_series(mn, mx, INTERVAL 6 HOUR)) AS t
                    FROM bounds) g
    )
    SELECT v.event_type AS state,
           CAST(COUNT(*) AS BIGINT) AS n_probe_hits
    FROM probes p JOIN versions v
      ON v.user_id = p.user_id
     AND v.valid_from <= p.t
     AND (v.valid_to IS NULL OR p.t < v.valid_to)
    GROUP BY v.event_type
    """,
)
def q183_point_in_time_lookup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time dimension lookup against the SCD2 table — THE query
    pattern SCD2 exists for: sample every 50th user's state at 6-hour
    probe times and count probes per state (the "what fraction of users
    were in state X at time T" dashboard series). A probe matches the
    version whose [valid_from, valid_to) interval contains it; open
    intervals catch probes after the last change.

    Shape: the q12 range-join rule — the join keys on the USER equality
    predicate (hash join); interval containment is a post-filter, never a
    nested loop. The probe grid is (sampled users × hours), built from a
    1-row bounds aggregate like q119's grid. Exactly-one-match semantics
    come from q182's audited tiling (no overlaps, no gaps), which is what
    makes per-probe counts trustworthy.
    """
    (events,) = tables(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changes = events.select(
        "user_id", "ts", "event_id", "event_type",
        F.lag("event_type").over(w).alias("prev_type"),
    )
    versions = changes.filter(
        F.col("prev_type").isNull() | (F.col("prev_type") != F.col("event_type"))
    ).select(
        F.col("user_id").alias("v_user"),
        F.col("event_type").alias("state"),
        F.col("ts").alias("valid_from"),
        F.lead("ts").over(w).alias("valid_to"),
    )
    bounds = events.agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"))
    probes = (
        events.filter(F.col("user_id") % 50 == 0)
        .select("user_id")
        .distinct()
        .crossJoin(F.broadcast(bounds))
        .select(
            "user_id",
            F.explode(F.expr("sequence(mn, mx, interval 6 hours)")).alias("t"),
        )
    )
    return (
        probes.join(
            versions,
            (F.col("v_user") == F.col("user_id"))
            & (F.col("valid_from") <= F.col("t"))
            & (F.col("valid_to").isNull() | (F.col("t") < F.col("valid_to"))),
        )
        .groupBy("state")
        .agg(F.count(F.lit(1)).alias("n_probe_hits"))
    )


@register(
    "q190_session_pmi",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, event_id, event_type, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY epoch_us(ts), event_id) AS prev_us
        FROM events
    ),
    sessioned AS (
        SELECT user_id, event_type,
               SUM(CASE WHEN prev_us IS NULL OR us - prev_us > {_SESSION_GAP_US}
                        THEN 1 ELSE 0 END)
                   OVER (PARTITION BY user_id ORDER BY us, event_id
                         ROWS UNBOUNDED PRECEDING) AS session_idx
        FROM ordered
    ),
    membership AS (
        SELECT DISTINCT user_id, session_idx, event_type FROM sessioned
    ),
    n_sessions AS (
        SELECT COUNT(*) AS ns FROM (SELECT DISTINCT user_id, session_idx FROM membership)
    ),
    singles AS (
        SELECT event_type, COUNT(*) AS c FROM membership GROUP BY event_type
    ),
    pairs AS (
        SELECT a.event_type AS type_a, b.event_type AS type_b, COUNT(*) AS cab
        FROM membership a JOIN membership b
          ON a.user_id = b.user_id AND a.session_idx = b.session_idx
         AND a.event_type < b.event_type
        GROUP BY a.event_type, b.event_type
    )
    SELECT p.type_a, p.type_b,
           CAST(p.cab AS BIGINT) AS n_cooccur,
           CAST(FLOOR(10000 * LN((CAST(p.cab AS DOUBLE) * ns.ns)
                / (CAST(sa.c AS DOUBLE) * sb.c))) AS BIGINT) AS pmi_1e4
    FROM pairs p
    JOIN singles sa ON sa.event_type = p.type_a
    JOIN singles sb ON sb.event_type = p.type_b
    CROSS JOIN n_sessions ns
    """,
)
def q190_session_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pointwise mutual information between event types co-occurring in the
    same session — which behaviors genuinely travel together vs merely
    being common (raw co-occurrence counts conflate the two; PMI
    normalizes by marginal session frequency). The association-mining
    primitive behind "users who X also Y".

    Shape: q108's sessionization → DISTINCT (session, type) membership —
    the only corpus-sized reduction — then the pair space is a
    membership self-join on the session key with per-key fan-out ≤
    |types|, and singles/total are tiny aggregates joined back broadcast.
    PMI evaluates in double from exact integer counts and floors at 1e4
    (coarse enough that a last-ulp LN difference cannot flip it).
    """
    events = tables(spark, sf_dir, "events")[0]
    us = F.unix_micros("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    ordered = events.select(
        "user_id", "event_id", "event_type", us.alias("us"),
        F.lag(us).over(w_order).alias("prev_us"),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessioned = ordered.select(
        "user_id",
        "event_type",
        F.sum(
            F.when(
                F.col("prev_us").isNull()
                | (F.col("us") - F.col("prev_us") > _SESSION_GAP_US),
                1,
            ).otherwise(0)
        )
        .over(w_run)
        .alias("session_idx"),
    )
    membership = sessioned.select("user_id", "session_idx", "event_type").distinct()
    n_sessions = (
        membership.select("user_id", "session_idx")
        .distinct()
        .agg(F.count(F.lit(1)).alias("ns"))
    )
    singles = membership.groupBy("event_type").agg(F.count(F.lit(1)).alias("c"))
    b = membership.select(
        F.col("user_id").alias("b_user"),
        F.col("session_idx").alias("b_session"),
        F.col("event_type").alias("type_b"),
    )
    pairs = (
        membership.join(
            b,
            (F.col("user_id") == F.col("b_user"))
            & (F.col("session_idx") == F.col("b_session"))
            & (F.col("event_type") < F.col("type_b")),
        )
        .groupBy(F.col("event_type").alias("type_a"), F.col("type_b"))
        .agg(F.count(F.lit(1)).alias("cab"))
    )
    sa = singles.select(F.col("event_type").alias("type_a"), F.col("c").alias("ca"))
    sb = singles.select(F.col("event_type").alias("type_b"), F.col("c").alias("cb"))
    pmi = F.floor(
        10000
        * F.log(
            (F.col("cab").cast("double") * F.col("ns"))
            / (F.col("ca").cast("double") * F.col("cb"))
        )
    ).cast("bigint")
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(n_sessions))
        .select(
            "type_a",
            "type_b",
            F.col("cab").alias("n_cooccur"),
            pmi.alias("pmi_1e4"),
        )
    )


@register(
    "q191_ab_experiment_readout",
    oracle=f"""
    WITH assigned AS (
        SELECT DISTINCT user_id,
               CASE WHEN {duckdb_md5_60bit("CAST(user_id AS VARCHAR)", salt='exp1')}
                         % 2 = 0 THEN 'control' ELSE 'treatment' END AS arm
        FROM events
    ),
    converted AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    per_user AS (
        SELECT a.arm, CASE WHEN c.user_id IS NULL THEN 0 ELSE 1 END AS conv
        FROM assigned a LEFT JOIN converted c ON c.user_id = a.user_id
    )
    SELECT arm,
           CAST(COUNT(*) AS BIGINT) AS n_users,
           CAST(SUM(conv) AS BIGINT) AS n_converted,
           CAST((1000000 * SUM(conv)) // COUNT(*) AS BIGINT) AS conv_ppm
    FROM per_user GROUP BY arm
    """,
)
def q191_ab_experiment_readout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B experiment readout: users deterministically hash-assigned to
    control/treatment (the q65/q66 consistent-bucketing family — the
    SAME user lands in the SAME arm across runs, sessions, and backfills,
    which is what makes an experiment analyzable at all), conversion =
    any purchase event; per arm: users, converters, conversion ppm. The
    two-proportion significance test runs downstream on these exact
    integer counts (q151's chi-square machinery applied to the 2×2
    table).

    Shape: one distinct pass for assignment, one for converters, a LEFT
    join on user_id, and a 2-row rollup — every number integer-exact.
    """
    events = tables(spark, sf_dir, "events")[0]
    assigned = events.select(
        "user_id",
        F.when(
            md5_60bit(F.col("user_id").cast("string"), salt="exp1") % 2 == 0,
            "control",
        )
        .otherwise("treatment")
        .alias("arm"),
    ).distinct()
    converted = (
        events.filter(F.col("event_type") == "purchase")
        .select(F.col("user_id").alias("c_user"))
        .distinct()
        .withColumn("conv", F.lit(1))
    )
    per_user = assigned.join(
        converted, F.col("user_id") == F.col("c_user"), "left"
    ).select("arm", F.coalesce(F.col("conv"), F.lit(0)).alias("conv"))
    return per_user.groupBy("arm").agg(
        F.count(F.lit(1)).alias("n_users"),
        F.sum("conv").alias("n_converted"),
        F.expr("(1000000 * SUM(conv)) DIV COUNT(*)").alias("conv_ppm"),
    )
