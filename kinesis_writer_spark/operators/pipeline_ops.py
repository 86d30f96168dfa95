"""Corpus-maintenance operators (round 3, batch 4): the jobs a training-data
pipeline runs BETWEEN full rebuilds — boilerplate detection, incremental
(batch-vs-corpus) dedup, peak-concurrency capacity profiling, semi-structured
schema profiling, and robust (winsorized) statistics.

House rules as everywhere in the registry: cross-engine MD5-60bit hashes for
any value that feeds a join or a comparison, integer-only thresholds and
ratios (ppm / cents), and `(ts, id)` tie-breaks so no window is
order-ambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_60bit
from ..registry import register
from ._util import tables

# ---------------------------------------------------------------------------
# q205: boilerplate n-gram profile (cross-document repeated 5-grams)
# ---------------------------------------------------------------------------

_BP_W = 5  # shingle width (words)
_BP_DF = 2  # a shingle present in >= this many docs is boilerplate

#: DuckDB: distinct 5-gram shingles per doc, hashed to 60-bit ints.
#: generate_series(1, n) is empty for n < 1, so short docs yield no rows.
_BP_SHINGLES_DUCK = f"""
    w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws
          FROM documents),
    sh AS (
        SELECT DISTINCT doc_id, lang, source,
               CAST(('0x' || substr(md5(tok5), 1, 15)) AS BIGINT) AS tok
        FROM (
            SELECT doc_id, lang, source,
                   unnest(list_transform(
                       generate_series(1, len(ws) - {_BP_W - 1}),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                            || ' ' || ws[i+3] || ' ' || ws[i+4])) AS tok5
            FROM w
        )
    )
"""


@register(
    "q205_boilerplate_ngrams",
    oracle=f"""
    WITH {_BP_SHINGLES_DUCK},
    dfq AS (SELECT tok, count(*) AS df FROM sh GROUP BY tok),
    boiler AS (SELECT tok FROM dfq WHERE df >= {_BP_DF}),
    per_doc AS (
        SELECT doc_id, lang, source, count(*) AS n_sh
        FROM sh GROUP BY doc_id, lang, source
    ),
    bpd AS (
        SELECT doc_id, count(*) AS n_boiler
        FROM sh JOIN boiler USING (tok) GROUP BY doc_id
    )
    SELECT lang, source,
           count(*) AS n_docs,
           CAST(SUM(CASE WHEN coalesce(n_boiler, 0) > 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_docs_affected,
           CAST(SUM(n_sh) AS BIGINT) AS n_shingles,
           CAST(SUM(coalesce(n_boiler, 0)) AS BIGINT) AS n_boiler,
           CAST(SUM(coalesce(n_boiler, 0)) * 1000000 // SUM(n_sh) AS BIGINT)
               AS boiler_ppm
    FROM per_doc LEFT JOIN bpd USING (doc_id)
    GROUP BY lang, source
    """,
)
def q205_boilerplate_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boilerplate profile: 5-word shingles that recur across >= 2 distinct
    documents (headers, footers, licence blocks, templated intros) and each
    (lang, source) slice's boilerplate fraction — the CCNet-style signal
    for "this source needs a boilerplate strip before training".

    Scale shape: shingles are hashed to 60-bit ints before any shuffle
    (8-byte keys); the document-frequency aggregate is map-side combined;
    the boilerplate set is bounded by *duplicate density*, not corpus size
    (a shingle enters it only if two documents share it), and the join
    back to per-doc counts is an equi-join on the hash. Nothing here is
    all-pairs; the expensive row count is the shingle explosion, which is
    O(total tokens) — the same cost every shingling operator in the
    registry (q52/q55/q193) already pays once.

    The empty-array guard on short docs (size(ws) >= 5) mirrors DuckDB's
    empty generate_series — without it Spark's sequence(0, n) would
    produce a DESCENDING range for n < 0 and element_at would throw (the
    q132 lesson).
    """
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.withColumn("ws", F.split("text", " "))
    sh5 = F.expr(
        f"""
        CASE WHEN size(ws) >= {_BP_W} THEN
            array_distinct(transform(sequence(0, size(ws) - {_BP_W}),
                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4])))
        ELSE array() END
        """
    )
    tok = docs.select(
        "doc_id", "lang", "source", F.explode(sh5).alias("tok5")
    ).select("doc_id", "lang", "source", md5_60bit(F.col("tok5")).alias("tok"))
    # attach each shingle's document frequency with a WINDOW over the tok
    # key instead of a df-aggregate + join-back: the join form re-executes
    # the explode lineage once per consumer (measured 3 Generate branches);
    # the window form is ONE explode, one shuffle on the 8-byte hash, then
    # a straight per-doc rollup
    tok_df = tok.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
    joined = tok_df.groupBy("doc_id", "lang", "source").agg(
        F.count(F.lit(1)).alias("n_sh"),
        F.sum(F.when(F.col("df") >= _BP_DF, 1).otherwise(0)).alias("n_boiler"),
    )
    return joined.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.when(F.col("n_boiler") > 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_docs_affected"),
        F.sum("n_sh").cast("bigint").alias("n_shingles"),
        F.sum("n_boiler").cast("bigint").alias("n_boiler"),
        F.expr("CAST(SUM(n_boiler) * 1000000 DIV SUM(n_sh) AS BIGINT)").alias(
            "boiler_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# q206: incremental dedup — new batch vs existing corpus
# ---------------------------------------------------------------------------

_INC_MOD = 7  # doc_id % 7 == 0 plays the "incoming batch" role
_INC_J_NUM, _INC_J_DEN = 4, 5  # near-dup verify: 3-gram shingle Jaccard >= 0.8


def _q206_oracle() -> str:
    from .dedup import _band_exprs_sql, _minhash_sig_sql, _MINHASH_MASK
    from ..functions.hashing import duckdb_md5_60bit

    tok3 = duckdb_md5_60bit("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")
    return f"""
    WITH w AS (SELECT doc_id, lang, text, string_split(text, ' ') AS ws
               FROM documents),
    base AS (
        SELECT doc_id, lang, md5(text) AS h,
               list_distinct(list_transform(generate_series(1, len(ws) - 2),
                   i -> {tok3})) AS toks
        FROM w
    ),
    incoming AS (SELECT * FROM base WHERE doc_id % {_INC_MOD} = 0),
    corpus AS (SELECT * FROM base WHERE doc_id % {_INC_MOD} <> 0),
    exact AS (
        SELECT DISTINCT i.doc_id
        FROM incoming i JOIN corpus c ON i.h = c.h
    ),
    inc_sigs AS (
        SELECT doc_id,
               [{", ".join(_minhash_sig_sql())}] AS signature
        FROM (SELECT doc_id,
                     list_transform(toks, t -> t & {_MINHASH_MASK}) AS hashes
              FROM incoming WHERE len(toks) > 0)
    ),
    corp_sigs AS (
        SELECT doc_id AS corp_id,
               [{", ".join(_minhash_sig_sql())}] AS signature
        FROM (SELECT doc_id,
                     list_transform(toks, t -> t & {_MINHASH_MASK}) AS hashes
              FROM corpus WHERE len(toks) > 0)
    ),
    inc_bands AS (
        SELECT doc_id, unnest([{", ".join(_band_exprs_sql())}]) AS band_key
        FROM inc_sigs
    ),
    corp_bands AS (
        SELECT corp_id, unnest([{", ".join(_band_exprs_sql())}]) AS band_key
        FROM corp_sigs
    ),
    cand AS (
        SELECT DISTINCT i.doc_id, c.corp_id
        FROM inc_bands i JOIN corp_bands c USING (band_key)
    ),
    near AS (
        SELECT DISTINCT cd.doc_id
        FROM cand cd
        JOIN incoming a ON a.doc_id = cd.doc_id
        JOIN corpus b ON b.doc_id = cd.corp_id
        WHERE len(list_intersect(a.toks, b.toks)) * {_INC_J_DEN}
              >= (len(a.toks) + len(b.toks)
                  - len(list_intersect(a.toks, b.toks))) * {_INC_J_NUM}
    )
    SELECT i.lang,
           count(*) AS n_incoming,
           CAST(SUM(CASE WHEN e.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_exact,
           CAST(SUM(CASE WHEN e.doc_id IS NULL AND n.doc_id IS NOT NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_near,
           CAST(SUM(CASE WHEN e.doc_id IS NULL AND n.doc_id IS NULL
                         THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM incoming i
    LEFT JOIN exact e ON i.doc_id = e.doc_id
    LEFT JOIN near n ON i.doc_id = n.doc_id
    GROUP BY i.lang
    """


@register("q206_incremental_dedup", oracle=_q206_oracle())
def q206_incremental_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup: an incoming batch (doc_id % 7 == 0) is checked
    against the EXISTING corpus (the rest) — exact content-hash match
    first, then shingle-MinHash band candidates verified by 3-gram
    shingle-set Jaccard >= 0.8 — and every incoming doc gets a verdict
    (exact_dup / near_dup / kept), rolled up per lang.

    This is the shape that makes dedup affordable at 100 TB: the corpus is
    deduped ONCE, and each new batch costs O(|batch|) — never a corpus x
    corpus rescan. Physically: the incoming side (hashes and band keys) is
    small enough to BROADCAST, so the corpus is streamed exactly twice
    (once past the digest broadcast, once past the band-key broadcast) with
    no corpus-side shuffle at all; in production the corpus digest/band
    tables are a persisted index, making incremental dedup a pure
    batch-side computation plus two broadcast probes.

    Verification joins corpus word-sets only for candidate corp_ids —
    bounded by candidate count, not corpus size.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    incoming_docs = documents.filter(F.col("doc_id") % _INC_MOD == 0)
    corpus_docs = documents.filter(F.col("doc_id") % _INC_MOD != 0)
    verdict = incremental_verdicts(incoming_docs, corpus_docs).select(
        "lang", "verdict"
    )
    return verdict.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_incoming"),
        F.sum(F.when(F.col("verdict") == "exact_dup", 1).otherwise(0))
        .cast("bigint")
        .alias("n_exact"),
        F.sum(F.when(F.col("verdict") == "near_dup", 1).otherwise(0))
        .cast("bigint")
        .alias("n_near"),
        F.sum(F.when(F.col("verdict") == "kept", 1).otherwise(0))
        .cast("bigint")
        .alias("n_kept"),
    )


def incremental_verdicts(incoming_docs: DataFrame, corpus_docs: DataFrame) -> DataFrame:
    """Per-doc dedup verdicts for an incoming batch against a corpus: both
    inputs need (doc_id, text, lang); returns (doc_id, lang, verdict) with
    verdict in {exact_dup, near_dup, kept}. The incoming side is assumed
    SMALL (a batch/micro-batch): its digests, band keys, and shingle
    arrays broadcast, so the corpus is only streamed, never shuffled.
    Reused by q206 (batch) and streaming.incremental (foreachBatch).

    The similarity unit is the 3-GRAM SHINGLE set (60-bit hashed), both
    for the MinHash bands and the Jaccard verify — the q193 lesson
    measured directly here: word-set bands on this small-vocabulary corpus
    put nearly every doc in some shared bucket (493k candidates for 519
    true matches at sf0.1, 4.8 s mostly spent verifying junk); shingle
    bands cut candidates to roughly the true near-dups.
    """
    from .dedup import (
        _band_exprs_spark,
        _minhash_sig_spark,
        _MINHASH_MASK,
    )
    from ..functions.hashing import md5_60bit

    def prep(df: DataFrame) -> DataFrame:
        ws = F.split("text", " ")
        inner = F.zip_with(
            F.slice(ws, 2, F.size(ws) - 2),
            F.slice(ws, 3, F.size(ws) - 2),
            lambda b, c: F.concat_ws(" ", b, c),
        )
        sh3 = F.zip_with(
            F.slice(ws, 1, F.size(ws) - 2), inner, lambda a, bc: F.concat_ws(" ", a, bc)
        )
        toks = F.when(
            F.size(ws) >= 3,
            F.array_distinct(F.transform(sh3, lambda s: md5_60bit(s))),
        ).otherwise(F.array().cast("array<bigint>"))
        return df.select(
            "doc_id",
            "lang",
            F.md5(F.col("text").cast("binary")).alias("h"),
            toks.alias("toks"),
        )

    # the batch side feeds four consumers (digest broadcast, band
    # broadcast, verify arrays, final verdict join) — persist it so the
    # md5+shingle prep runs once; it's micro-batch-sized by contract
    from pyspark import StorageLevel

    incoming = prep(incoming_docs).persist(StorageLevel.MEMORY_AND_DISK)
    corpus = prep(corpus_docs)

    # --- exact: stream the corpus past a broadcast of incoming digests ---
    inc_digests = incoming.select("doc_id", "h")
    exact = (
        corpus.select("h")
        .join(F.broadcast(inc_digests), "h")
        .select("doc_id")
        .distinct()
    )

    # --- near: corpus band keys probe a broadcast of incoming band keys ---
    def bands_of(df: DataFrame, id_col: str, carry_toks: bool) -> DataFrame:
        hs = df.filter(F.size("toks") > 0).select(
            F.col("doc_id").alias(id_col),
            "toks",
            F.transform(
                "toks", lambda t: t.bitwiseAND(F.lit(_MINHASH_MASK))
            ).alias("hashes"),
        )
        sigs = hs.select(
            id_col,
            "toks",
            F.array(*_minhash_sig_spark(F.col("hashes"))).alias("signature"),
        )
        cols = [id_col, F.explode(F.array(*_band_exprs_spark())).alias("band_key")]
        if carry_toks:
            cols.insert(1, F.col("toks"))
        return sigs.select(*cols)

    # the corpus side CARRIES its shingle arrays through the band probe:
    # the probe is a broadcast hash join (no corpus shuffle), so the extra
    # column rides along and removes what would be a second full corpus
    # pass just to fetch verify arrays for candidate ids
    inc_bands = bands_of(incoming, "doc_id", carry_toks=False)
    corp_bands = bands_of(corpus, "corp_id", carry_toks=True)
    cand = (
        corp_bands.withColumnRenamed("toks", "toks_b")
        .join(F.broadcast(inc_bands), "band_key")
        .select("doc_id", "corp_id", "toks_b")
        .dropDuplicates(["doc_id", "corp_id"])
    )
    wa = incoming.select("doc_id", F.col("toks").alias("toks_a"))
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    uni = F.size("toks_a") + F.size("toks_b") - inter
    near = (
        cand.join(F.broadcast(wa), "doc_id")
        .filter(inter * _INC_J_DEN >= uni * _INC_J_NUM)
        .select("doc_id")
        .distinct()
    )

    return (
        incoming.select("doc_id", "lang")
        .join(exact.withColumn("is_exact", F.lit(1)), "doc_id", "left")
        .join(near.withColumn("is_near", F.lit(1)), "doc_id", "left")
        .select(
            "doc_id",
            "lang",
            F.when(F.col("is_exact") == 1, F.lit("exact_dup"))
            .when(F.col("is_near") == 1, F.lit("near_dup"))
            .otherwise(F.lit("kept"))
            .alias("verdict"),
        )
    )


# ---------------------------------------------------------------------------
# q207: peak session concurrency per hour (two-level sweep line)
# ---------------------------------------------------------------------------

_GAP_US = 30 * 60 * 1_000_000
_HOUR_US = 3_600 * 1_000_000


@register(
    "q207_concurrency_peak",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, epoch_us(ts) AS us,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us,
               event_id
        FROM events
    ),
    marked AS (
        SELECT user_id, us, event_id,
               CASE WHEN prev_us IS NULL OR us - prev_us > {_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sessioned AS (
        SELECT user_id, us,
               CAST(SUM(is_new) OVER (PARTITION BY user_id ORDER BY us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS session_idx
        FROM marked
    ),
    sessions AS (
        SELECT user_id, session_idx, MIN(us) AS start_us, MAX(us) AS end_us
        FROM sessioned GROUP BY user_id, session_idx
    ),
    deltas AS (
        SELECT start_us AS us, 1 AS delta FROM sessions
        UNION ALL
        SELECT end_us AS us, -1 AS delta FROM sessions
    ),
    running AS (
        SELECT us // {_HOUR_US} AS hour_idx, delta,
               CAST(SUM(delta) OVER (ORDER BY us, delta
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS live
        FROM deltas
    )
    SELECT hour_idx,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_starts,
           CAST(SUM(CASE WHEN delta = -1 THEN 1 ELSE 0 END) AS BIGINT) AS n_ends,
           MAX(live) AS peak_concurrency
    FROM running
    GROUP BY hour_idx
    """,
)
def q207_concurrency_peak(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Peak concurrent sessions per hour — the capacity-planning twin of
    q108: sessionize (30-min gap), emit +1/-1 at session start/end
    (half-open: a session ending at instant t closes before one starting
    at t opens — the ORDER BY (us, delta) tie rule, delta=-1 first), and
    take the max of the running live-session count within each hour.

    The oracle computes the running sum with ONE global window; the Spark
    plan must not (a no-partition window is a single-task bottleneck at
    100 TB). Instead the classic two-level prefix sum: (1) running sum
    WITHIN each hour partition, (2) per-hour delta totals — an
    hours-cardinality METADATA table — cumulated exclusively and added
    back as each hour's offset. Identical result, and the only
    unpartitioned window runs over ~hours rows, not events.

    Per-hour max is deterministic despite equal-(us, delta) tie freedom:
    within such a run the prefix values are s+d, s+2d, ..., s+kd in every
    permutation, so their max is permutation-invariant.
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id", "event_id", us.alias("us"), F.lag(us).over(w_order).alias("prev_us")
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > _GAP_US), 1
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        marked.withColumn("session_idx", F.sum("is_new").over(w_run))
        .groupBy("user_id", "session_idx")
        .agg(F.min("us").alias("start_us"), F.max("us").alias("end_us"))
    )
    # explode, not UNION ALL: a union of two selects over `sessions` would
    # execute the whole sessionize pipeline twice (measured in the plan —
    # two full Window+Exchange branches); one 2-struct explode keeps it to
    # a single pass.
    deltas = sessions.select(
        F.explode(
            F.array(
                F.struct(F.col("start_us").alias("us"), F.lit(1).alias("delta")),
                F.struct(F.col("end_us").alias("us"), F.lit(-1).alias("delta")),
            )
        ).alias("e")
    ).select("e.us", "e.delta")
    deltas = deltas.withColumn("hour_idx", F.expr(f"us DIV {_HOUR_US}"))

    # level 1: running sum within each hour partition
    w_hour = (
        Window.partitionBy("hour_idx")
        .orderBy("us", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    within = deltas.withColumn("run_in_hour", F.sum("delta").over(w_hour))
    per_hour = within.groupBy("hour_idx").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_starts"),
        F.sum(F.when(F.col("delta") == -1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_ends"),
        F.max("run_in_hour").cast("bigint").alias("max_in_hour"),
        F.sum("delta").cast("bigint").alias("hour_total"),
    )
    # level 2: exclusive prefix of hour totals over the tiny hour table
    w_hours = (
        Window.orderBy("hour_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    offs = per_hour.withColumn(
        "offset", F.coalesce(F.sum("hour_total").over(w_hours), F.lit(0))
    )
    return offs.select(
        "hour_idx",
        "n_starts",
        "n_ends",
        (F.col("offset") + F.col("max_in_hour")).cast("bigint").alias(
            "peak_concurrency"
        ),
    )


# ---------------------------------------------------------------------------
# q208: semi-structured schema profile of the props JSON column
# ---------------------------------------------------------------------------


@register(
    "q208_json_schema_profile",
    oracle="""
    WITH kv AS (
        SELECT event_type,
               unnest(json_keys(props)) AS key,
               props
        FROM events
    ),
    vals AS (
        SELECT event_type, key,
               TRY_CAST(json_extract_string(props, '$.' || key) AS BIGINT) AS num
        FROM kv
    ),
    totals AS (SELECT event_type, count(*) AS n_rows FROM events GROUP BY event_type)
    SELECT v.event_type, v.key,
           count(*) AS n_present,
           CAST(count(*) * 1000000 // t.n_rows AS BIGINT) AS present_ppm,
           CAST(count(num) AS BIGINT) AS n_numeric,
           MIN(num) AS min_num, MAX(num) AS max_num,
           CAST(SUM(num) AS BIGINT) AS sum_num
    FROM vals v JOIN totals t USING (event_type)
    GROUP BY v.event_type, v.key, t.n_rows
    """,
)
def q208_json_schema_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema profile of a semi-structured JSON column: per (event_type,
    json key) — presence rate, how many values parse as integers, and
    integer min/max/sum. This is the "what's actually in props?" audit
    that precedes promoting a JSON key to a typed column (the VARIANT
    workflow q112 consumes).

    Spark side parses each row ONCE into a map<string,string> and explodes
    it (JVM from_json, no per-key re-parse, no Python); the per-type
    totals table is type-cardinality and broadcasts back for the ppm. At
    100 TB this is one explode + one map-side-combined aggregate — the
    same cost envelope as a token count.
    """
    (events,) = tables(spark, sf_dir, "events")
    kv = events.select(
        "event_type",
        F.explode(F.from_json("props", "map<string,string>")).alias("key", "val"),
    ).withColumn("num", F.expr("TRY_CAST(val AS BIGINT)"))
    totals = events.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_rows"))
    prof = kv.groupBy("event_type", "key").agg(
        F.count(F.lit(1)).alias("n_present"),
        F.count("num").cast("bigint").alias("n_numeric"),
        F.min("num").alias("min_num"),
        F.max("num").alias("max_num"),
        F.sum("num").cast("bigint").alias("sum_num"),
    )
    return prof.join(F.broadcast(totals), "event_type").select(
        "event_type",
        "key",
        "n_present",
        F.expr("CAST(n_present * 1000000 DIV n_rows AS BIGINT)").alias("present_ppm"),
        "n_numeric",
        "min_num",
        "max_num",
        "sum_num",
    )


# ---------------------------------------------------------------------------
# q209: winsorized statistics per group (robust mean via exact p10/p90 clips)
# ---------------------------------------------------------------------------


@register(
    "q209_winsorized_stats",
    oracle="""
    WITH cents AS (
        SELECT o_orderpriority AS priority, o_orderkey,
               CAST(ROUND(o_totalprice * 100, 0) AS BIGINT) AS c
        FROM orders
    ),
    ranked AS (
        SELECT priority, c,
               row_number() OVER (PARTITION BY priority ORDER BY c, o_orderkey)
                   AS rn,
               count(*) OVER (PARTITION BY priority) AS n
        FROM cents
    ),
    cuts AS (
        SELECT priority,
               MAX(CASE WHEN rn = (n + 9) // 10 THEN c END) AS lo,
               MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN c END) AS hi
        FROM ranked GROUP BY priority
    )
    SELECT r.priority,
           CAST(MAX(r.n) AS BIGINT) AS n_orders,
           MAX(k.lo) AS p10_cents,
           MAX(k.hi) AS p90_cents,
           CAST(SUM(CASE WHEN r.c < k.lo THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_low,
           CAST(SUM(CASE WHEN r.c > k.hi THEN 1 ELSE 0 END) AS BIGINT)
               AS n_clipped_high,
           CAST(SUM(GREATEST(k.lo, LEAST(k.hi, r.c))) // MAX(r.n) AS BIGINT)
               AS winsor_mean_cents,
           CAST(SUM(r.c) // MAX(r.n) AS BIGINT) AS raw_mean_cents
    FROM ranked r JOIN cuts k USING (priority)
    GROUP BY r.priority
    """,
)
def q209_winsorized_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winsorized mean per order priority: clip each order's total to the
    group's exact [p10, p90] (rank arithmetic — value at row_number
    ceil(n/10) / ceil(9n/10) on the (cents, orderkey) total order) and
    compare the robust mean against the raw mean — the outlier-resistant
    summary a metrics pipeline publishes when a few whale rows would
    otherwise move the average.

    Exactness: money is integer cents before any sum; cut ranks are
    integer ceils; the clip is GREATEST/LEAST on integers; both means are
    integer-floored — no float crosses a row boundary, so engines agree
    bit-for-bit regardless of partitioning.

    Scale shape: one per-group sort window for ranks (single shuffle on
    the group key), a group-cardinality cuts table joined back on the same
    key (no second shuffle — the partitioning is reused), and one final
    rollup. At truly global scale the exact ranks swap for
    approx_percentile the way q136 gates it; the clip/rollup stays as-is.
    """
    (orders,) = tables(spark, sf_dir, "orders")
    cents = orders.select(
        F.col("o_orderpriority").alias("priority"),
        "o_orderkey",
        F.round(F.col("o_totalprice") * 100, 0).cast("bigint").alias("c"),
    )
    w = Window.partitionBy("priority").orderBy("c", "o_orderkey")
    ranked = cents.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy("priority"))
    )
    cuts = ranked.groupBy("priority").agg(
        F.max(F.when(F.col("rn") == F.expr("(n + 9) DIV 10"), F.col("c"))).alias("lo"),
        F.max(F.when(F.col("rn") == F.expr("(9 * n + 9) DIV 10"), F.col("c"))).alias(
            "hi"
        ),
    )
    # join the RAW cents back to the broadcast cuts — joining `ranked` would
    # execute the sort window a second time (measured: two Window+Exchange
    # branches in the plan); the final rollup recomputes n as count(*).
    return (
        cents.join(F.broadcast(cuts), "priority")
        .groupBy("priority")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_orders"),
            F.max("lo").alias("p10_cents"),
            F.max("hi").alias("p90_cents"),
            F.sum(F.when(F.col("c") < F.col("lo"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_low"),
            F.sum(F.when(F.col("c") > F.col("hi"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_clipped_high"),
            F.expr(
                "CAST(SUM(GREATEST(lo, LEAST(hi, c))) DIV COUNT(*) AS BIGINT)"
            ).alias("winsor_mean_cents"),
            F.expr("CAST(SUM(c) DIV COUNT(*) AS BIGINT)").alias("raw_mean_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q210: daily activity coverage (merged-interval sweep, day-partitioned)
# ---------------------------------------------------------------------------

_DAY_US = 24 * _HOUR_US


@register(
    "q210_daily_coverage",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               LAG(epoch_us(ts)) OVER (PARTITION BY user_id
                                       ORDER BY ts, event_id) AS prev_us
        FROM events
    ),
    marked AS (
        SELECT user_id, us, event_id,
               CASE WHEN prev_us IS NULL OR us - prev_us > {_GAP_US}
                    THEN 1 ELSE 0 END AS is_new
        FROM ordered
    ),
    sessions AS (
        SELECT user_id, session_idx, MIN(us) AS start_us, MAX(us) AS end_us
        FROM (
            SELECT user_id, us,
                   CAST(SUM(is_new) OVER (PARTITION BY user_id
                        ORDER BY us, event_id
                        ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                       AS BIGINT) AS session_idx
            FROM marked
        )
        GROUP BY user_id, session_idx
    ),
    clipped AS (
        SELECT dayno,
               GREATEST(start_us, dayno * {_DAY_US}) AS s,
               LEAST(end_us, (dayno + 1) * {_DAY_US}) AS e
        FROM (
            SELECT start_us, end_us,
                   unnest(generate_series(start_us // {_DAY_US},
                                          end_us // {_DAY_US})) AS dayno
            FROM sessions
        )
    ),
    deltas AS (
        SELECT dayno, s AS us, 1 AS delta FROM clipped
        UNION ALL
        SELECT dayno, e AS us, -1 AS delta FROM clipped
    ),
    swept AS (
        SELECT dayno, us, delta,
               CAST(SUM(delta) OVER (PARTITION BY dayno ORDER BY us, delta
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS live,
               LEAD(us) OVER (PARTITION BY dayno ORDER BY us, delta) AS next_us
        FROM deltas
    )
    SELECT dayno,
           CAST(SUM(CASE WHEN delta = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_intervals,
           CAST(SUM(CASE WHEN live > 0 AND next_us IS NOT NULL
                         THEN next_us - us ELSE 0 END) AS BIGINT) AS covered_us,
           CAST(SUM(CASE WHEN live > 0 AND next_us IS NOT NULL
                         THEN next_us - us ELSE 0 END) * 1000000 // {_DAY_US}
               AS BIGINT) AS coverage_ppm
    FROM swept
    GROUP BY dayno
    """,
)
def q210_daily_coverage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily activity coverage: the fraction of each day during which AT
    LEAST ONE session (any user) was live — the union length of
    overlapping intervals, the metric behind "was the platform ever idle?"
    and SLA-style uptime reporting.

    Scale design: instead of one global sweep line (an unpartitionable
    total order over every interval endpoint), sessions are CLIPPED to the
    days they span first — sessions are gap-bounded, so the explode factor
    is tiny — and then each day runs its own independent sweep (running
    live-count + LEAD gap, two functions over ONE window spec). The sweep
    partitions by day, so parallelism grows with the time range; no
    single-task window anywhere — unlike q207 this needs no second-level
    offset pass at all, because coverage resets at day boundaries by
    construction.

    Tie discipline: ORDER BY (us, delta) closes intervals before opening
    new ones at the same instant (half-open semantics); equal-(us, delta)
    runs contribute zero-length gaps, so the covered sum is
    permutation-invariant and the oracle hash matches bit-for-bit.
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w_order = Window.partitionBy("user_id").orderBy("ts", "event_id")
    marked = events.select(
        "user_id", "event_id", us.alias("us"), F.lag(us).over(w_order).alias("prev_us")
    ).withColumn(
        "is_new",
        F.when(
            F.col("prev_us").isNull() | (F.col("us") - F.col("prev_us") > _GAP_US), 1
        ).otherwise(0),
    )
    w_run = (
        Window.partitionBy("user_id")
        .orderBy("us", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    sessions = (
        marked.withColumn("session_idx", F.sum("is_new").over(w_run))
        .groupBy("user_id", "session_idx")
        .agg(F.min("us").alias("start_us"), F.max("us").alias("end_us"))
    )
    clipped = sessions.select(
        F.explode(
            F.sequence(
                F.expr(f"start_us DIV {_DAY_US}"), F.expr(f"end_us DIV {_DAY_US}")
            )
        ).alias("dayno"),
        "start_us",
        "end_us",
    ).select(
        "dayno",
        F.greatest("start_us", F.expr(f"dayno * {_DAY_US}")).alias("s"),
        F.least("end_us", F.expr(f"(dayno + 1) * {_DAY_US}")).alias("e"),
    )
    deltas = clipped.select(
        "dayno",
        F.explode(
            F.array(
                F.struct(F.col("s").alias("us"), F.lit(1).alias("delta")),
                F.struct(F.col("e").alias("us"), F.lit(-1).alias("delta")),
            )
        ).alias("ev"),
    ).select("dayno", "ev.us", "ev.delta")
    w_day = Window.partitionBy("dayno").orderBy("us", "delta")
    swept = deltas.select(
        "dayno",
        "us",
        "delta",
        F.sum("delta")
        .over(w_day.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .cast("bigint")
        .alias("live"),
        F.lead("us").over(w_day).alias("next_us"),
    )
    gap = F.when(
        (F.col("live") > 0) & F.col("next_us").isNotNull(),
        F.col("next_us") - F.col("us"),
    ).otherwise(0)
    return swept.groupBy("dayno").agg(
        F.sum(F.when(F.col("delta") == 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_intervals"),
        F.sum(gap).cast("bigint").alias("covered_us"),
        F.expr(
            f"CAST(SUM(CASE WHEN live > 0 AND next_us IS NOT NULL "
            f"THEN next_us - us ELSE 0 END) * 1000000 DIV {_DAY_US} AS BIGINT)"
        ).alias("coverage_ppm"),
    )


# ---------------------------------------------------------------------------
# q211: containment (excerpt) detection — directional near-dup
# ---------------------------------------------------------------------------

_CT_W = 5  # shingle width
_CT_DF_CAP = 8  # candidate shingles must appear in <= this many docs
_CT_NUM, _CT_DEN = 9, 10  # containment >= 0.9 of the smaller set


@register(
    "q211_containment_pairs",
    oracle=f"""
    WITH {_BP_SHINGLES_DUCK},
    docs AS (SELECT doc_id, list(tok ORDER BY tok) AS toks
             FROM sh GROUP BY doc_id),
    dfq AS (SELECT tok, count(*) AS df FROM sh GROUP BY tok),
    rare AS (SELECT tok FROM dfq WHERE df BETWEEN 2 AND {_CT_DF_CAP}),
    cand AS (
        SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
        FROM (SELECT doc_id, tok FROM sh JOIN rare USING (tok)) a
        JOIN (SELECT doc_id, tok FROM sh JOIN rare USING (tok)) b
          ON a.tok = b.tok AND a.doc_id < b.doc_id
    ),
    verify AS (
        SELECT c.id_a, c.id_b,
               len(list_intersect(da.toks, db.toks)) AS inter,
               len(da.toks) AS na, len(db.toks) AS nb
        FROM cand c
        JOIN docs da ON c.id_a = da.doc_id
        JOIN docs db ON c.id_b = db.doc_id
    )
    SELECT CASE WHEN na <= nb THEN id_a ELSE id_b END AS contained_id,
           CASE WHEN na <= nb THEN id_b ELSE id_a END AS container_id,
           CAST(inter * 1000000 // LEAST(na, nb) AS BIGINT) AS containment_ppm
    FROM verify
    WHERE inter * {_CT_DEN} >= LEAST(na, nb) * {_CT_NUM}
    """,
)
def q211_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directional containment (excerpt) detection: pairs where >= 90% of
    the SMALLER document's 5-gram shingles appear in the larger one — the
    quote/excerpt/superset duplication that symmetric Jaccard misses (a
    page embedded in a longer page has high containment but low Jaccard).

    Candidates are pairs sharing a RARE shingle (2 <= df <= {_CT_DF_CAP}):
    the df floor excludes unique shingles (no pair), the cap bounds
    per-shingle fan-out to df^2 <= {_CT_DF_CAP}^2 so candidate volume is
    duplicate-density-bounded, never corpus^2. Recall caveat (documented,
    same class as q52's banding): a pair whose every shared shingle is
    more common than the cap is missed — for excerpt detection rare
    shingles are precisely the informative ones, so this is the standard
    trade.

    Shape at 100 TB: shingle hashes are 8-byte ints before any shuffle;
    df aggregate is map-side combined; the verify joins the per-doc sorted
    shingle arrays only for candidate ids.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.withColumn("ws", F.split("text", " "))
    sh5 = F.expr(
        f"""
        CASE WHEN size(ws) >= {_CT_W} THEN
            array_distinct(transform(sequence(0, size(ws) - {_CT_W}),
                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4])))
        ELSE array() END
        """
    )
    tok = docs.select("doc_id", F.explode(sh5).alias("tok5")).select(
        "doc_id", md5_60bit(F.col("tok5")).alias("tok")
    )
    # one lineage: per-shingle df via window (no df-agg + join-back, which
    # would re-run the explode), then ONE per-doc groupBy collects BOTH the
    # full sorted array and the rare subset; the compact per-doc table is
    # persisted because three downstream consumers (both self-join sides
    # and the verify) would otherwise re-execute the whole shingle lineage
    from pyspark import StorageLevel

    tok_df = tok.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
    arrs = (
        tok_df.groupBy("doc_id")
        .agg(
            F.sort_array(F.collect_list("tok")).alias("toks"),
            F.sort_array(
                F.collect_list(
                    F.when(
                        (F.col("df") >= 2) & (F.col("df") <= _CT_DF_CAP), F.col("tok")
                    )
                )
            ).alias("rares"),
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    rare_tok = arrs.select("doc_id", F.explode("rares").alias("tok"))
    cand = (
        rare_tok.alias("a")
        .join(
            rare_tok.select(
                F.col("doc_id").alias("id_b"), F.col("tok").alias("tok_b")
            ),
            (F.col("tok") == F.col("tok_b")) & (F.col("doc_id") < F.col("id_b")),
        )
        .select(F.col("doc_id").alias("id_a"), "id_b")
        .distinct()
    )
    verify = (
        cand.join(
            arrs.select(F.col("doc_id").alias("id_a"), F.col("toks").alias("toks_a")),
            "id_a",
        )
        .join(
            arrs.select(F.col("doc_id").alias("id_b"), F.col("toks").alias("toks_b")),
            "id_b",
        )
        .select(
            "id_a",
            "id_b",
            F.size(F.array_intersect("toks_a", "toks_b")).alias("inter"),
            F.size("toks_a").alias("na"),
            F.size("toks_b").alias("nb"),
        )
    )
    return verify.filter(
        F.col("inter") * _CT_DEN >= F.least("na", "nb") * _CT_NUM
    ).select(
        F.when(F.col("na") <= F.col("nb"), F.col("id_a"))
        .otherwise(F.col("id_b"))
        .alias("contained_id"),
        F.when(F.col("na") <= F.col("nb"), F.col("id_b"))
        .otherwise(F.col("id_a"))
        .alias("container_id"),
        F.expr("CAST(inter * 1000000 DIV LEAST(na, nb) AS BIGINT)").alias(
            "containment_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# q212: effective sample size of the temperature-reweighted mixture
# ---------------------------------------------------------------------------


@register(
    "q212_effective_sample_size",
    oracle="""
    WITH slices AS (
        SELECT lang, source,
               count(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang, source
    ),
    scaled AS (
        SELECT lang, source, n_docs, n_tokens,
               CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
                   AS s_micros,
               CAST(SUM(n_tokens) OVER (PARTITION BY lang) AS BIGINT)
                   AS lang_tokens,
               CAST(SUM(CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000)
                             AS BIGINT)) OVER (PARTITION BY lang) AS BIGINT)
                   AS lang_micros
        FROM slices
    ),
    weighted AS (
        SELECT lang, n_docs,
               (s_micros * 1000000 // lang_micros) * 1000
                   // (n_tokens * 1000000 // lang_tokens) AS w_permille
        FROM scaled
    )
    SELECT lang,
           CAST(SUM(n_docs) AS BIGINT) AS n_docs,
           CAST(FLOOR(
               CAST(SUM(n_docs * w_permille) AS DOUBLE)
               * CAST(SUM(n_docs * w_permille) AS DOUBLE)
               / CAST(SUM(n_docs * w_permille * w_permille) AS DOUBLE)
               * 1000) AS BIGINT) AS ess_milli,
           CAST(FLOOR(
               CAST(SUM(n_docs * w_permille) AS DOUBLE)
               * CAST(SUM(n_docs * w_permille) AS DOUBLE)
               / CAST(SUM(n_docs * w_permille * w_permille) AS DOUBLE)
               / SUM(n_docs) * 1000000) AS BIGINT) AS ess_ratio_ppm
    FROM weighted
    GROUP BY lang
    """,
)
def q212_effective_sample_size(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Effective sample size of the temperature-reweighted mixture (q200's
    tau = 0.5 rule applied within each language): when a slice is sampled
    at weight w relative to its natural share, the Kish ESS
    (Σw)² / Σw² says how many *equivalent uniform* documents the
    reweighted corpus is worth — ESS/n near 1 means reweighting is mild,
    near 0 means a few slices dominate and training will effectively see
    far less data than the row count suggests.

    Everything computes on the SLICE table (one map-side-combined
    aggregate over documents, then arithmetic on ~|lang×source| rows):
    per-doc weights are constant within a slice, so Σw over docs is
    Σ n_s·w_s over slices — the data-scale pass never carries a weight.
    The two final divisions run in DOUBLE on exact integer inputs
    (exactly-rounded IEEE, identical cross-engine); every SUM is integer.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    slices = documents.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens"),
    )
    w_lang = Window.partitionBy("lang")
    scaled = (
        slices.withColumn(
            "s_micros",
            F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast(
                "bigint"
            ),
        )
        .withColumn("lang_tokens", F.sum("n_tokens").over(w_lang).cast("bigint"))
        .withColumn("lang_micros", F.sum("s_micros").over(w_lang).cast("bigint"))
    )
    weighted = scaled.select(
        "lang",
        "n_docs",
        F.expr(
            "(s_micros * 1000000 DIV lang_micros) * 1000"
            " DIV (n_tokens * 1000000 DIV lang_tokens)"
        ).alias("w_permille"),
    )
    ess = (
        "CAST(SUM(n_docs * w_permille) AS DOUBLE)"
        " * CAST(SUM(n_docs * w_permille) AS DOUBLE)"
        " / CAST(SUM(n_docs * w_permille * w_permille) AS DOUBLE)"
    )
    return weighted.groupBy("lang").agg(
        F.sum("n_docs").cast("bigint").alias("n_docs"),
        F.expr(f"CAST(FLOOR({ess} * 1000) AS BIGINT)").alias("ess_milli"),
        F.expr(f"CAST(FLOOR({ess} / SUM(n_docs) * 1000000) AS BIGINT)").alias(
            "ess_ratio_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# q213: adaptive rare-bigram quality gate (per-slice p90 threshold)
# ---------------------------------------------------------------------------

_RARITY_SCALE = 1_000_000_000


@register(
    "q213_rare_bigram_gate",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws
               FROM documents),
    bg AS (
        SELECT doc_id, lang, source,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i+1])) AS b
        FROM w
    ),
    counted AS (
        SELECT doc_id, lang, source, b,
               count(*) OVER (PARTITION BY lang, b) AS cb
        FROM bg
    ),
    scored AS (
        SELECT doc_id, lang, source,
               CAST(SUM({_RARITY_SCALE} // cb) // count(*) AS BIGINT) AS rarity
        FROM counted
        GROUP BY doc_id, lang, source
    ),
    ranked AS (
        SELECT lang, source, doc_id, rarity,
               row_number() OVER (PARTITION BY lang, source
                                  ORDER BY rarity, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang, source) AS n
        FROM scored
    ),
    cuts AS (
        SELECT lang, source,
               MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN rarity END) AS p90
        FROM ranked GROUP BY lang, source
    )
    SELECT s.lang, s.source,
           count(*) AS n_docs,
           MAX(k.p90) AS p90_rarity,
           CAST(SUM(CASE WHEN s.rarity > k.p90 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_flagged
    FROM scored s JOIN cuts k ON s.lang = k.lang AND s.source = k.source
    GROUP BY s.lang, s.source
    """,
)
def q213_rare_bigram_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Adaptive quality gate: score each document by mean harmonic bigram
    rarity (Σ 1e9/c(bigram) / n — rare word sequences score high, the
    integer-exact stand-in for the perplexity filters q79 models with
    floats), then flag documents above their OWN (lang, source) slice's
    p90 — adaptive thresholds, because a fixed global cutoff would flag
    whole low-resource slices wholesale.

    Exactness: the score is built from integer corpus counts only
    (integer division per bigram, integer mean), so ranking it for the
    percentile cut can never be flipped by a float ulp — the q209 percentile
    machinery requires an integer-exact score to be hash-stable.

    Shape at 100 TB: one exploded-bigram lineage feeds the per-(lang,
    bigram) count window (vocabulary-sized keys, the q79 single-lineage
    lesson), one per-doc rollup, one per-slice sort window for the cut,
    and a slice-cardinality cuts table joined back on the slice key.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    pairs = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 1),
        F.slice(ws, 2, F.size(ws) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = documents.select(
        "doc_id", "lang", "source", F.explode(pairs).alias("b")
    )
    counted = bg.withColumn(
        "cb", F.count(F.lit(1)).over(Window.partitionBy("lang", "b"))
    )
    scored = counted.groupBy("doc_id", "lang", "source").agg(
        F.expr(f"CAST(SUM({_RARITY_SCALE} DIV cb) DIV COUNT(*) AS BIGINT)").alias(
            "rarity"
        )
    )
    # attach the p90 cut with a THIRD window over the same slice
    # partitioning instead of a cuts-table join-back: a join would execute
    # the whole explode+count-window lineage twice (measured: two Generate
    # nodes in the plan); window-chaining keeps it single-pass and all four
    # window functions share one Exchange on the slice key
    w_slice = Window.partitionBy("lang", "source").orderBy("rarity", "doc_id")
    w_flat = Window.partitionBy("lang", "source")
    ranked = (
        scored.withColumn("rn", F.row_number().over(w_slice))
        .withColumn("n", F.count(F.lit(1)).over(w_flat))
        .withColumn(
            "p90",
            F.max(
                F.when(F.col("rn") == F.expr("(9 * n + 9) DIV 10"), F.col("rarity"))
            ).over(w_flat),
        )
    )
    return ranked.groupBy("lang", "source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("p90").alias("p90_rarity"),
        F.sum(F.when(F.col("rarity") > F.col("p90"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_flagged"),
    )


# ---------------------------------------------------------------------------
# q214: pairwise cosine-distance histogram (threshold calibration)
# ---------------------------------------------------------------------------

_DH_SCALE = 1_000  # embeddings quantize to 1e-3-scaled BIGINTs


def _cos_bucket_sql() -> str:
    """Bucket index floor(cos*10) in [-10, 9] as a sum of 19 integer-only
    threshold indicators (cos >= t/10 decided by sign analysis plus one
    cross-multiplied square comparison — no sqrt, no float), minus 10.
    Engine-neutral SQL: only *, >=, AND/OR/CASE.
    """
    terms = []
    for t in range(-9, 10):
        t2 = t * t
        if t >= 0:
            cond = f"(dot >= 0 AND dot * dot * 100 >= {t2} * na * nb)"
        else:
            cond = f"(dot >= 0 OR dot * dot * 100 <= {t2} * na * nb)"
        terms.append(f"CASE WHEN {cond} THEN 1 ELSE 0 END")
    return "(" + " + ".join(terms) + ") - 10"


@register(
    "q214_distance_histogram",
    oracle=f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * {_DH_SCALE}) AS BIGINT))
                   AS qv
        FROM embeddings
    ),
    pairs AS (
        SELECT a.vec_id // 2 AS pair_id, a.qv AS qa, b.qv AS qb
        FROM q a JOIN q b ON b.vec_id = a.vec_id + 1
        WHERE a.vec_id % 2 = 0
    ),
    dotted AS (
        SELECT pair_id,
               CAST(list_sum(list_transform(generate_series(1, len(qa)),
                    i -> qa[i] * qb[i])) AS BIGINT) AS dot,
               CAST(list_sum(list_transform(qa, x -> x * x)) AS BIGINT) AS na,
               CAST(list_sum(list_transform(qb, x -> x * x)) AS BIGINT) AS nb
        FROM pairs
    )
    SELECT {_cos_bucket_sql()} AS bucket,
           count(*) AS n_pairs
    FROM dotted
    WHERE na > 0 AND nb > 0
    GROUP BY bucket
    """,
)
def q214_distance_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise cosine-similarity histogram over a deterministic 1-in-2
    pairing (vec 2k vs 2k+1): the similarity-distribution calibration that
    picks LSH thresholds (q202's S-curves need to know where the corpus
    actually lives on the similarity axis) and sanity-checks embedding
    models after retraining.

    Float-free: vectors are floor-quantized to 1e-3-scaled BIGINTs (the
    established _KM_SCALE pattern), the dot product and norms are integer,
    and the bucket floor(cos*10) is decided by 19 cross-multiplied integer
    comparisons (dot² vs t²·‖a‖²·‖b‖²) — no sqrt ever happens, so the
    histogram is bit-identical across engines. Scale bound: |q| <= 1000
    over 64 dims keeps dot² * 100 < 2^63.

    Shape at 100 TB: the pairing is an equi-join on pair id (narrow,
    shuffle on an 8-byte key), the rest is per-row arithmetic + one
    map-side-combined 20-bucket aggregate. Swap the id-pairing for a
    hash-bucketed random pairing at production scale; the plan is
    unchanged.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    q = embeddings.select(
        "vec_id",
        F.transform(
            "embedding",
            lambda x: F.floor(x.cast("double") * _DH_SCALE).cast("bigint"),
        ).alias("qv"),
    )
    a = q.filter(F.col("vec_id") % 2 == 0).select(
        F.expr("vec_id DIV 2").alias("pair_id"), F.col("qv").alias("qa")
    )
    b = q.filter(F.col("vec_id") % 2 == 1).select(
        F.expr("(vec_id - 1) DIV 2").alias("pair_id"), F.col("qv").alias("qb")
    )
    zero = F.lit(0).cast("bigint")
    dotted = a.join(b, "pair_id").select(
        "pair_id",
        F.aggregate(
            F.zip_with("qa", "qb", lambda x, y: x * y), zero, lambda acc, v: acc + v
        ).alias("dot"),
        F.aggregate(
            F.transform("qa", lambda x: x * x), zero, lambda acc, v: acc + v
        ).alias("na"),
        F.aggregate(
            F.transform("qb", lambda x: x * x), zero, lambda acc, v: acc + v
        ).alias("nb"),
    )
    return (
        dotted.filter((F.col("na") > 0) & (F.col("nb") > 0))
        .select(F.expr(_cos_bucket_sql()).alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )


# ---------------------------------------------------------------------------
# q215: exact ROC-AUC via grouped rank sums (Mann-Whitney U)
# ---------------------------------------------------------------------------


def _q215_oracle() -> str:
    from .similarity import _LM_W

    return f"""
    WITH q AS (
        SELECT vec_id, label,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings
    ),
    scored AS (
        SELECT vec_id,
               CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS pos,
               CAST(list_sum(list_transform(list_zip(qv, {list(_LM_W)}),
                    p -> p[1] * p[2])) AS BIGINT) AS score
        FROM q
    ),
    grouped AS (
        SELECT score, count(*) AS c, CAST(SUM(pos) AS BIGINT) AS p
        FROM scored GROUP BY score
    ),
    cum AS (
        SELECT score, c, p,
               CAST(COALESCE(SUM(c) OVER (ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
                   AS BIGINT) AS cum_before
        FROM grouped
    ),
    agg AS (
        SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(c - p) AS BIGINT) AS n_neg,
               CAST(SUM(p * (2 * cum_before + c + 1)) AS BIGINT) AS two_ranksum
        FROM cum
    )
    SELECT n_pos, n_neg,
           CAST((two_ranksum - n_pos * (n_pos + 1)) * 1000000
                // (2 * n_pos * n_neg) AS BIGINT) AS auc_ppm
    FROM agg
    """


@register("q215_auc_rank", oracle=_q215_oracle())
def q215_auc_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact ROC-AUC of the q160 linear model (positive class: odd label)
    computed as the tie-corrected Mann-Whitney rank sum — the model-eval
    primitive a training pipeline runs on every scored eval table.

    Scores are INTEGER (1e-3-quantized embedding · integer weight vector,
    the q214 discipline), so ranking can't be flipped by a float ulp.
    Tie handling is exact: for a score group of size c with p positives
    and C rows below it, twice the average-rank sum of its positives is
    p·(2C + c + 1) — summing that over groups gives the textbook
    tie-averaged U without ever materializing per-row ranks.

    Scale shape: one map-side-combined GROUP BY score collapses the
    corpus to the distinct-score table before any ordering happens; the
    cumulative window then runs over that table, not the corpus. Scores
    here are already coarse integers; at 100 TB you bucket them (fixed-
    width score bins) so the ordered table is bounded-size metadata —
    binned AUC is the standard production trade and the plan is identical.
    """
    from .similarity import _LM_W

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    w_arr = F.lit([int(w) for w in _LM_W])  # one array<bigint> literal node
    zero = F.lit(0).cast("bigint")
    scored = embeddings.select(
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("pos"),
        F.aggregate(
            F.zip_with(qv, w_arr, lambda x, w: x * w), zero, lambda a, v: a + v
        ).alias("score"),
    )
    grouped = scored.groupBy("score").agg(
        F.count(F.lit(1)).alias("c"), F.sum("pos").cast("bigint").alias("p")
    )
    w_cum = Window.orderBy("score").rowsBetween(Window.unboundedPreceding, -1)
    cum = grouped.withColumn(
        "cum_before", F.coalesce(F.sum("c").over(w_cum), F.lit(0)).cast("bigint")
    )
    agg = cum.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).cast("bigint").alias("n_neg"),
        F.sum(F.col("p") * (2 * F.col("cum_before") + F.col("c") + 1))
        .cast("bigint")
        .alias("two_ranksum"),
    )
    return agg.select(
        "n_pos",
        "n_neg",
        F.expr(
            "CAST((two_ranksum - n_pos * (n_pos + 1)) * 1000000"
            " DIV (2 * n_pos * n_neg) AS BIGINT)"
        ).alias("auc_ppm"),
    )


# ---------------------------------------------------------------------------
# q216: leakage-aware train/test split (group-level assignment)
# ---------------------------------------------------------------------------

_SPLIT_SALT = "split"
_SPLIT_TRAIN_BUCKETS = 8  # hash % 10 < 8 -> train (80/20)


def _q216_oracle() -> str:
    from ..functions.hashing import duckdb_md5_60bit
    from .dedup import _DOUBLED_SQL

    ghash = duckdb_md5_60bit("g.grp", salt=_SPLIT_SALT)
    dhash = duckdb_md5_60bit("CAST(g.doc_id AS VARCHAR)", salt=_SPLIT_SALT)
    return f"""
    WITH corpus AS ({_DOUBLED_SQL}),
    g AS (SELECT doc_id, lang, md5(text) AS grp FROM corpus),
    sides AS (
        SELECT doc_id, lang, grp,
               CASE WHEN {ghash} % 10 < {_SPLIT_TRAIN_BUCKETS}
                    THEN 1 ELSE 0 END AS grp_train,
               CASE WHEN {dhash} % 10 < {_SPLIT_TRAIN_BUCKETS}
                    THEN 1 ELSE 0 END AS naive_train
        FROM g
    ),
    pairs AS (
        SELECT a.lang,
               a.grp_train AS ga, b.grp_train AS gb,
               a.naive_train AS na, b.naive_train AS nb
        FROM sides a JOIN sides b
          ON a.grp = b.grp AND a.doc_id < b.doc_id
    ),
    viol AS (
        SELECT lang,
               CAST(SUM(CASE WHEN ga <> gb THEN 1 ELSE 0 END) AS BIGINT)
                   AS viol_group,
               CAST(SUM(CASE WHEN na <> nb THEN 1 ELSE 0 END) AS BIGINT)
                   AS viol_naive
        FROM pairs GROUP BY lang
    ),
    counts AS (
        SELECT lang,
               CAST(SUM(grp_train) AS BIGINT) AS n_train,
               CAST(SUM(1 - grp_train) AS BIGINT) AS n_test
        FROM sides GROUP BY lang
    )
    SELECT c.lang, c.n_train, c.n_test,
           COALESCE(v.viol_group, 0) AS viol_group,
           COALESCE(v.viol_naive, 0) AS viol_naive
    FROM counts c LEFT JOIN viol v ON c.lang = v.lang
    """


@register("q216_group_split", oracle=_q216_oracle())
def q216_group_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-aware train/test split: assign each DUPLICATE GROUP (content
    digest on the doubled corpus, where every doc has an exact twin) to a
    side by hashing the group key — and prove the point by counting
    same-group pairs that land on different sides under (a) the group
    split — structurally zero — vs (b) a naive per-doc hash split, which
    leaks ~2·0.8·0.2 of duplicate pairs across the boundary. Train/test
    contamination through duplicates is the classic eval-inflation bug in
    LLM pipelines; splitting on the dedup-group key is the fix.

    The group key here is the exact digest; a production pipeline swaps in
    q96's connected-component id (near-dup clusters) — same split logic,
    same plan shape. Scale: one digest shuffle for groups, the salted-hash
    sides are narrow projections, and the violation count joins pairs
    WITHIN groups only (bounded by duplicate density, never corpus²).
    """
    from ..functions.hashing import md5_60bit
    from .dedup import _doubled_docs

    corpus = _doubled_docs(spark, sf_dir)
    g = corpus.select(
        "doc_id", "lang", F.md5(F.col("text").cast("binary")).alias("grp")
    )
    sides = g.select(
        "doc_id",
        "lang",
        "grp",
        F.when(md5_60bit(F.col("grp"), salt=_SPLIT_SALT) % 10 < _SPLIT_TRAIN_BUCKETS, 1)
        .otherwise(0)
        .alias("grp_train"),
        F.when(
            md5_60bit(F.col("doc_id").cast("string"), salt=_SPLIT_SALT) % 10
            < _SPLIT_TRAIN_BUCKETS,
            1,
        )
        .otherwise(0)
        .alias("naive_train"),
    )
    pairs = (
        sides.alias("a")
        .join(
            sides.select(
                F.col("doc_id").alias("doc_b"),
                F.col("grp").alias("grp_b"),
                F.col("grp_train").alias("gb"),
                F.col("naive_train").alias("nb"),
            ),
            (F.col("grp") == F.col("grp_b")) & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(
            "lang",
            (F.col("grp_train") != F.col("gb")).cast("int").alias("vg"),
            (F.col("naive_train") != F.col("nb")).cast("int").alias("vn"),
        )
    )
    viol = pairs.groupBy("lang").agg(
        F.sum("vg").cast("bigint").alias("viol_group"),
        F.sum("vn").cast("bigint").alias("viol_naive"),
    )
    counts = sides.groupBy("lang").agg(
        F.sum("grp_train").cast("bigint").alias("n_train"),
        F.sum(1 - F.col("grp_train")).cast("bigint").alias("n_test"),
    )
    return counts.join(viol, "lang", "left").select(
        "lang",
        "n_train",
        "n_test",
        F.coalesce("viol_group", F.lit(0)).alias("viol_group"),
        F.coalesce("viol_naive", F.lit(0)).alias("viol_naive"),
    )


# ---------------------------------------------------------------------------
# q218: U-shaped (position-based) multi-touch attribution
# ---------------------------------------------------------------------------

_MT_WINDOW_US = 3 * 24 * 3_600 * 1_000_000  # 3-day lookback
# U-shaped credit in basis points: 40% first, 40% last, 20% split across
# middles (integer DIV — the dropped remainder is documented, not hidden)
_MT_FIRST_BP, _MT_LAST_BP, _MT_MID_POOL_BP = 4000, 4000, 2000

_MT_CREDIT_CASE = f"""
    CASE WHEN k = 1 THEN 10000
         WHEN k = 2 THEN 5000
         WHEN rn = 1 THEN {_MT_FIRST_BP}
         WHEN rn = k THEN {_MT_LAST_BP}
         ELSE {_MT_MID_POOL_BP} DIV (k - 2) END
"""


@register(
    "q218_position_attribution",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, user_id, epoch_us(ts) AS p_us,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events WHERE event_type = 'purchase'
    ),
    touches AS (
        SELECT event_id AS t_id, user_id, event_type AS channel,
               epoch_us(ts) AS t_us
        FROM events WHERE event_type IN ('click', 'view')
    ),
    banded AS (
        SELECT p.event_id, p.cents, t.channel, t.t_us, t.t_id
        FROM purchases p JOIN touches t
          ON p.user_id = t.user_id
         AND t.t_us < p.p_us
         AND t.t_us >= p.p_us - {_MT_WINDOW_US}
    ),
    positioned AS (
        SELECT event_id, cents, channel,
               row_number() OVER (PARTITION BY event_id
                                  ORDER BY t_us, t_id) AS rn,
               count(*) OVER (PARTITION BY event_id) AS k
        FROM banded
    ),
    credited AS (
        SELECT channel, cents,
               {_MT_CREDIT_CASE.replace("DIV", "//")} AS bp
        FROM positioned
    )
    SELECT channel,
           count(*) AS n_credited_touches,
           CAST(SUM(bp) AS BIGINT) AS credit_bp_total,
           CAST(SUM(cents * bp) AS BIGINT) AS revenue_credit_cbp
    FROM credited GROUP BY channel
    """,
)
def q218_position_attribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U-shaped (position-based) multi-touch attribution — the multi-touch
    counterpart of q171's last-touch: every click/view in the purchase's
    3-day lookback gets credit, 40% to the first touch, 40% to the last,
    20% split evenly over the middles (single-touch journeys take 100%,
    two-touch 50/50). Revenue credit is cents x basis points, all integer;
    the middle split's integer-division remainder is dropped by both
    engines identically rather than floated.

    Shape: the q171 banded user-key join (purchase x its own lookback
    window, fan-out bounded by window length) feeds TWO window functions
    over the same per-purchase partitioning (position + journey length),
    then one channel rollup. At 100 TB: same partitioning discipline as
    the as-of family — join and windows share the user/purchase hash, the
    rollup is map-side combined.
    """
    (events,) = tables(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("p_us"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    touches = events.filter(F.col("event_type").isin("click", "view")).select(
        F.col("event_id").alias("t_id"),
        F.col("user_id").alias("t_user"),
        F.col("event_type").alias("channel"),
        F.unix_micros("ts").alias("t_us"),
    )
    banded = purchases.join(
        touches,
        (F.col("user_id") == F.col("t_user"))
        & (F.col("t_us") < F.col("p_us"))
        & (F.col("t_us") >= F.col("p_us") - _MT_WINDOW_US),
    ).select("event_id", "cents", "channel", "t_us", "t_id")
    w_pos = Window.partitionBy("event_id").orderBy("t_us", "t_id")
    positioned = banded.withColumn("rn", F.row_number().over(w_pos)).withColumn(
        "k", F.count(F.lit(1)).over(Window.partitionBy("event_id"))
    )
    credited = positioned.select(
        "channel", "cents", F.expr(_MT_CREDIT_CASE).alias("bp")
    )
    return credited.groupBy("channel").agg(
        F.count(F.lit(1)).alias("n_credited_touches"),
        F.sum("bp").cast("bigint").alias("credit_bp_total"),
        F.sum(F.col("cents") * F.col("bp")).cast("bigint").alias("revenue_credit_cbp"),
    )


# ---------------------------------------------------------------------------
# q219: deterministic random walks over the co-purchase graph
# ---------------------------------------------------------------------------

_WALK_STEPS = 3
_WALK_SUPPORT = 2  # reuse q199's support threshold


def _q219_oracle() -> str:
    from ..functions.hashing import duckdb_md5_60bit

    step_ctes = []
    prev = "starts"
    prev_col = "v0"
    for s in range(1, _WALK_STEPS + 1):
        h = duckdb_md5_60bit(
            "CAST(src AS VARCHAR) || '#' || CAST(dst AS VARCHAR)", salt=f"walk{s}"
        )
        step_ctes.append(
            f"""
    choice{s} AS (
        SELECT src, arg_min(dst, {h}) AS nxt FROM edges GROUP BY src
    ),
    walk{s} AS (
        SELECT w.*, c.nxt AS v{s}
        FROM {prev} w LEFT JOIN choice{s} c ON w.{prev_col} = c.src
    )"""
        )
        prev = f"walk{s}"
        prev_col = f"v{s}"
    return f"""
    WITH pl AS (
        SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
    ),
    copurchase AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb, count(*) AS w
        FROM pl a JOIN pl b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= {_WALK_SUPPORT}
    ),
    edges AS (
        SELECT pa AS src, pb AS dst FROM copurchase
        UNION ALL
        SELECT pb AS src, pa AS dst FROM copurchase
    ),
    starts AS (SELECT DISTINCT src AS v0 FROM edges),
    {", ".join(step_ctes)}
    SELECT v0, v1, v2, v3,
           CAST(CASE WHEN v3 IS NOT NULL THEN 3
                     WHEN v2 IS NOT NULL THEN 2
                     WHEN v1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT) AS walk_len
    FROM walk{_WALK_STEPS}
    """


@register("q219_random_walks", oracle=_q219_oracle())
def q219_random_walks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 'random' walks (length 3) from every node of the
    co-purchase graph — the DeepWalk/node2vec sampling primitive that
    turns a graph into training sequences, made reproducible by replacing
    the RNG with a salted-hash choice: step s from node v follows the
    neighbor minimizing md5_60bit('walk{{s}}#' || v || '#' || n). Same
    graph, same walks, on every engine and every rerun — the property a
    training pipeline needs for cacheable, diffable walk corpora.

    Shape at 100 TB: ALL step choices come out of ONE min_by aggregate
    over the edge table (three salted argmins in the same groupBy — one
    shuffle, not one per step), producing a vocabulary-sized choice table
    that broadcast-joins the walk frontier forward three times. Never a
    per-walk loop; the walk table stays one row per start node. Dead ends
    LEFT-join to NULL and the walk simply stops.
    """
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    pl = lineitem.select("l_orderkey", "l_partkey").distinct()
    cop = (
        pl.alias("a")
        .join(
            pl.select(
                F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("pb")
            ),
            (F.col("l_orderkey") == F.col("ok_b"))
            & (F.col("l_partkey") < F.col("pb")),
        )
        .groupBy(F.col("l_partkey").alias("pa"), "pb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= _WALK_SUPPORT)
        .select("pa", "pb")
    )
    edges = cop.select(F.col("pa").alias("src"), F.col("pb").alias("dst")).unionByName(
        cop.select(F.col("pb").alias("src"), F.col("pa").alias("dst"))
    )

    def h(s: int):
        return md5_60bit(
            F.concat_ws("#", F.col("src").cast("string"), F.col("dst").cast("string")),
            salt=f"walk{s}",
        )

    # the choice table feeds the walk base plus one broadcast per step —
    # persist it or the co-purchase self-join lineage re-runs per consumer
    from pyspark import StorageLevel

    choice = (
        edges.groupBy("src")
        .agg(
            *[
                F.min_by("dst", h(s)).alias(f"nxt{s}")
                for s in range(1, _WALK_STEPS + 1)
            ]
        )
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    walk = choice.select(F.col("src").alias("v0"))
    prev_col = "v0"
    for s in range(1, _WALK_STEPS + 1):
        step = choice.select(
            F.col("src").alias(prev_col), F.col(f"nxt{s}").alias(f"v{s}")
        )
        walk = walk.join(F.broadcast(step), prev_col, "left")
        prev_col = f"v{s}"
    return walk.select(
        "v0",
        "v1",
        "v2",
        "v3",
        F.expr(
            "CAST(CASE WHEN v3 IS NOT NULL THEN 3 WHEN v2 IS NOT NULL THEN 2 "
            "WHEN v1 IS NOT NULL THEN 1 ELSE 0 END AS BIGINT)"
        ).alias("walk_len"),
    )


# ---------------------------------------------------------------------------
# q217: token rank drift between corpus snapshots ("trending tokens")
# ---------------------------------------------------------------------------

_DRIFT_MIN_COUNT = 5
_DRIFT_TOP_K = 20


@register(
    "q217_token_rank_drift",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id % 2 AS half,
               unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    counted AS (
        SELECT half, token, count(*) AS c
        FROM tok GROUP BY half, token
        HAVING count(*) >= {_DRIFT_MIN_COUNT}
    ),
    ranked AS (
        SELECT half, token, c,
               row_number() OVER (PARTITION BY half
                                  ORDER BY c DESC, token) AS rnk
        FROM counted
    )
    SELECT a.token,
           a.rnk AS rank_old, b.rnk AS rank_new,
           CAST(a.rnk - b.rnk AS BIGINT) AS rank_climb,
           a.c AS count_old, b.c AS count_new
    FROM ranked a JOIN ranked b ON a.token = b.token
    WHERE a.half = 0 AND b.half = 1
    ORDER BY a.rnk - b.rnk DESC, a.token
    LIMIT {_DRIFT_TOP_K}
    """,
)
def q217_token_rank_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trending tokens: rank every token by frequency in two corpus
    snapshots (even/odd doc ids standing in for consecutive crawls) and
    report the top climbers — the drift signal that flags new entities /
    topics between snapshot ingests, complementing q192 (KL divergence:
    HOW MUCH drift) with WHAT is drifting.

    Rank ties break on the token text so both engines produce the same
    total order; the min-count floor keeps one-off tokens from dominating
    climb deltas. Shape: one map-side-combined (half, token) count, one
    rank window per half over the VOCABULARY-sized count table (data
    collapses before any ordering — the q215 rule), a self-join on the
    token key, and a TakeOrdered top-k instead of a global sort.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    tok = documents.select(
        (F.col("doc_id") % 2).alias("half"),
        F.explode(F.split("text", " ")).alias("token"),
    )
    counted = (
        tok.groupBy("half", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") >= _DRIFT_MIN_COUNT)
    )
    w = Window.partitionBy("half").orderBy(F.col("c").desc(), "token")
    ranked = counted.withColumn("rnk", F.row_number().over(w))
    a = ranked.filter(F.col("half") == 0).select(
        "token", F.col("rnk").alias("rank_old"), F.col("c").alias("count_old")
    )
    b = ranked.filter(F.col("half") == 1).select(
        "token", F.col("rnk").alias("rank_new"), F.col("c").alias("count_new")
    )
    return (
        a.join(b, "token")
        .select(
            "token",
            "rank_old",
            "rank_new",
            (F.col("rank_old") - F.col("rank_new")).cast("bigint").alias("rank_climb"),
            "count_old",
            "count_new",
        )
        .orderBy(F.col("rank_climb").desc(), "token")
        .limit(_DRIFT_TOP_K)
    )


# ---------------------------------------------------------------------------
# q220: LSH dedup quality eval — band recall/precision vs exact ground truth
# ---------------------------------------------------------------------------


def _q220_oracle() -> str:
    from .dedup import _band_exprs_sql, _minhash_sig_sql, _MINHASH_MASK
    from ..functions.hashing import duckdb_md5_60bit
    from ..registry import get

    truth_sql = get("q193_prefix_filter_join").oracle
    tok3 = duckdb_md5_60bit("ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]")
    return f"""
    WITH truth AS ({truth_sql}),
    w2 AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    toksrc AS (
        SELECT doc_id,
               list_distinct(list_transform(generate_series(1, len(ws) - 2),
                   i -> {tok3})) AS toks
        FROM w2
    ),
    sigs AS (
        SELECT doc_id, [{", ".join(_minhash_sig_sql())}] AS signature
        FROM (SELECT doc_id,
                     list_transform(toks, t -> t & {_MINHASH_MASK}) AS hashes
              FROM toksrc WHERE len(toks) > 0)
    ),
    bands AS (
        SELECT doc_id, unnest([{", ".join(_band_exprs_sql())}]) AS band_key
        FROM sigs
    ),
    cands AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM bands a JOIN bands b
          ON a.band_key = b.band_key AND a.doc_id < b.doc_id
    ),
    hit AS (
        SELECT count(*) AS n_hit
        FROM cands c JOIN truth t ON c.doc_a = t.doc_a AND c.doc_b = t.doc_b
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM truth) AS n_truth,
           (SELECT CAST(count(*) AS BIGINT) FROM cands) AS n_candidates,
           CAST(n_hit AS BIGINT) AS n_hit,
           CAST(n_hit * 1000000 // (SELECT count(*) FROM truth) AS BIGINT)
               AS recall_ppm,
           CAST(n_hit * 1000000 // (SELECT count(*) FROM cands) AS BIGINT)
               AS precision_ppm
    FROM hit
    """


@register("q220_lsh_recall_eval", oracle=_q220_oracle())
def q220_lsh_recall_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Empirical LSH quality evaluation: how many of the EXACT Jaccard>=0.8
    shingle pairs (ground truth = q193's prefix-filter join, which has no
    false negatives) does the 16-perm / 2x8-band shingle-MinHash scheme
    actually surface as candidates — measured recall and precision, the
    numbers q202's S-curve predicts analytically. A dedup pipeline should
    publish this eval on every corpus whose token distribution shifts;
    banding parameters tuned on one corpus silently lose recall on another.

    Shape: ground truth comes from the registered exact operator (reused
    function, reused plan); the candidate side is one signature pass +
    band self-join (same machinery q206 probes with); the comparison is
    two tiny COUNT aggregates and an equi-join on the pair key. Nothing
    here is all-pairs; the expensive inputs are both already
    linear-in-corpus.
    """
    from .dedup import _band_exprs_spark, _minhash_sig_spark, _MINHASH_MASK
    from .scale_ops import q193_prefix_filter_join

    truth = q193_prefix_filter_join(spark, sf_dir).select("doc_a", "doc_b")

    (documents,) = tables(spark, sf_dir, "documents")
    ws = F.split("text", " ")
    inner = F.zip_with(
        F.slice(ws, 2, F.size(ws) - 2),
        F.slice(ws, 3, F.size(ws) - 2),
        lambda b, c: F.concat_ws(" ", b, c),
    )
    sh3 = F.zip_with(
        F.slice(ws, 1, F.size(ws) - 2), inner, lambda a, bc: F.concat_ws(" ", a, bc)
    )
    toks = F.when(
        F.size(ws) >= 3, F.array_distinct(F.transform(sh3, lambda s: md5_60bit(s)))
    ).otherwise(F.array().cast("array<bigint>"))
    toksrc = documents.select("doc_id", toks.alias("toks")).filter(
        F.size("toks") > 0
    )
    hs = toksrc.select(
        "doc_id",
        F.transform("toks", lambda t: t.bitwiseAND(F.lit(_MINHASH_MASK))).alias(
            "hashes"
        ),
    )
    sigs = hs.select(
        "doc_id", F.array(*_minhash_sig_spark(F.col("hashes"))).alias("signature")
    )
    bands = sigs.select(
        "doc_id", F.explode(F.array(*_band_exprs_spark())).alias("band_key")
    )
    cands = (
        bands.alias("a")
        .join(
            bands.select(
                F.col("doc_id").alias("doc_b"), F.col("band_key").alias("bk")
            ),
            (F.col("band_key") == F.col("bk")) & (F.col("doc_id") < F.col("doc_b")),
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    # Single-pass comparison: a FULL OUTER join of the two (unique) pair
    # sets with presence flags, folded by one global aggregate. The prior
    # shape (three separate 1-row aggregates cross-joined) planned `truth`
    # and `cands` as TWO subtrees each — both expensive inputs were
    # computed twice, and the duplication was the dominant superlinear
    # term in the r6 sf1.0 spot-bench (q220 ratio 11.76x vs 6.2x for the
    # truth operator alone). Here each input is computed once, shuffled
    # once on the pair key, and everything downstream is one exchange.
    flagged = (
        cands.withColumn("is_cand", F.lit(1))
        .join(
            truth.withColumn("is_truth", F.lit(1)),
            ["doc_a", "doc_b"],
            "full_outer",
        )
    )
    # coalesce: SUM over zero matching rows is NULL, but the oracle's
    # COUNT(*)-style side counts an empty truth/candidate set as 0.
    stats = flagged.agg(
        F.coalesce(F.sum("is_truth"), F.lit(0)).cast("bigint").alias("n_truth"),
        F.coalesce(F.sum("is_cand"), F.lit(0)).cast("bigint").alias("n_candidates"),
        F.count(F.when(F.col("is_cand").isNotNull() & F.col("is_truth").isNotNull(), 1))
        .cast("bigint")
        .alias("n_hit"),
    )
    return stats.select(
        "n_truth",
        "n_candidates",
        "n_hit",
        F.expr("CAST(n_hit * 1000000 DIV n_truth AS BIGINT)").alias("recall_ppm"),
        F.expr("CAST(n_hit * 1000000 DIV n_candidates AS BIGINT)").alias(
            "precision_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# q221: per-column table statistics (ANALYZE TABLE / CBO stats collection)
# ---------------------------------------------------------------------------

#: (stat row name, integer-valued SQL expression over lineitem)
_STATS_COLS = [
    ("l_orderkey", "l_orderkey"),
    ("l_partkey", "l_partkey"),
    ("l_suppkey", "l_suppkey"),
    ("l_quantity", "CAST(l_quantity AS BIGINT)"),
    ("l_extendedprice_cents", "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"),
]


@register(
    "q221_table_stats",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS column_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(count(*) - count({expr}) AS BIGINT) AS n_nulls,
           CAST(count(DISTINCT {expr}) AS BIGINT) AS ndv_exact,
           TRUE AS ndv_within_5pct,
           CAST(MIN({expr}) AS BIGINT) AS min_val,
           CAST(MAX({expr}) AS BIGINT) AS max_val
    FROM lineitem"""
        for name, expr in _STATS_COLS
    ),
)
def q221_table_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE-TABLE-style statistics collection: one row per column with
    row count, null count, distinct count, and min/max — the inputs a
    cost-based optimizer (and every capacity-planning spreadsheet) needs.
    NDV is gathered the production way (HLL approx, single pass, constant
    memory) and gated against exact within 5% via the q16 boolean
    pattern, so a drifting sketch fails the hash gate.

    Shape: ONE fact-table pass computes count/nulls/min/max/approx-NDV
    for every column simultaneously (plain aggregates — no Expand), plus
    one exact-NDV pass for the gate (COUNT DISTINCT x5 plans an Expand x5;
    that pass is the TEST apparatus, dropped at 100 TB where the approx
    value IS the stat). The per-column layout is a stack() unpivot of the
    two 1-row aggregates joined by cross — metadata-scale from there on.
    """
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    one_pass = lineitem.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        *[
            c
            for name, expr in _STATS_COLS
            for c in (
                F.count(F.expr(expr)).cast("bigint").alias(f"cnt_{name}"),
                F.approx_count_distinct(F.expr(expr), 0.02)
                .cast("bigint")
                .alias(f"andv_{name}"),
                F.min(F.expr(expr)).cast("bigint").alias(f"min_{name}"),
                F.max(F.expr(expr)).cast("bigint").alias(f"max_{name}"),
            )
        ],
    )
    exact_pass = lineitem.agg(
        *[
            F.countDistinct(F.expr(expr)).cast("bigint").alias(f"ndv_{name}")
            for name, expr in _STATS_COLS
        ]
    )
    joined = one_pass.crossJoin(F.broadcast(exact_pass))
    stack_args = ", ".join(
        f"'{name}', n_rows - cnt_{name}, ndv_{name}, "
        f"(andv_{name} * 100 <= ndv_{name} * 105 AND "
        f" andv_{name} * 100 >= ndv_{name} * 95), min_{name}, max_{name}"
        for name, _ in _STATS_COLS
    )
    return joined.select(
        "n_rows",
        F.expr(
            f"stack({len(_STATS_COLS)}, {stack_args}) AS "
            "(column_name, n_nulls, ndv_exact, ndv_within_5pct, min_val, max_val)"
        ),
    ).select(
        "column_name",
        "n_rows",
        "n_nulls",
        "ndv_exact",
        "ndv_within_5pct",
        "min_val",
        "max_val",
    )


# ---------------------------------------------------------------------------
# q222: distributed batch-perceptron training (2 unrolled epochs)
# ---------------------------------------------------------------------------

_PCT_EPOCHS = 2
_PCT_DIM = 64

from ..memo import register as _register_memo

#: (sf_dir) -> (per-epoch error counts, per-epoch weight vectors)
_PCT_CACHE: dict = _register_memo({})


def _pct_train(spark: SparkSession, sf_dir: str):
    """Driver loop of the batch perceptron: per epoch, ONE distributed
    aggregate computes the misclassified-row count and the 64 gradient
    sums; the 64-int weight vector is collected and inlined as literals
    for the next epoch (the q97/q134 tiny-model pattern). Memoized per
    dataset."""
    if sf_dir in _PCT_CACHE:
        return _PCT_CACHE[sf_dir]
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    q = embeddings.select(
        F.when(F.col("label") % 2 == 1, 1).otherwise(-1).alias("y"),
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
        ).alias("qv"),
    )
    w = [0] * _PCT_DIM
    zero = F.lit(0).cast("bigint")
    counts, weights = [], []
    for _epoch in range(_PCT_EPOCHS):
        w_arr = F.lit([int(v) for v in w])  # one array<bigint> literal node
        margin = F.col("y") * F.aggregate(
            F.zip_with("qv", w_arr, lambda x, wv: x * wv), zero, lambda a, v: a + v
        )
        miss = q.withColumn("margin", margin).filter(F.col("margin") <= 0)
        row = miss.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.col("y") * F.element_at("qv", d + 1))
                .cast("bigint")
                .alias(f"g{d}")
                for d in range(_PCT_DIM)
            ],
        ).collect()[0]
        counts.append(int(row["n"]))
        w = [w[d] + int(row[f"g{d}"] or 0) for d in range(_PCT_DIM)]
        weights.append(list(w))
    _PCT_CACHE[sf_dir] = (counts, weights)
    return _PCT_CACHE[sf_dir]


def _q222_oracle() -> str:
    flat = f"""
    q AS (
        SELECT vec_id,
               CASE WHEN label % 2 = 1 THEN 1 ELSE -1 END AS y,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings
    ),
    flat AS (
        SELECT vec_id, y, i + 1 AS d, qv[i + 1] AS v
        FROM q, LATERAL unnest(range(0, {_PCT_DIM})) t(i)
    ),
    g1 AS (SELECT d, CAST(SUM(y * v) AS BIGINT) AS w FROM flat GROUP BY d),
    w1 AS (SELECT list(w ORDER BY d) AS wv,
                  CAST(SUM(d * w) AS BIGINT) AS cks FROM g1),
    m2 AS (
        SELECT q.vec_id, q.y,
               q.y * CAST(list_sum(list_transform(range(1, {_PCT_DIM} + 1),
                     i -> qv[i] * wv[i])) AS BIGINT) AS margin
        FROM q, w1
    ),
    e2 AS (SELECT CAST(count(*) FILTER (WHERE margin <= 0) AS BIGINT) AS n FROM m2),
    g2 AS (
        SELECT f.d, CAST(SUM(f.y * f.v) AS BIGINT) AS gw
        FROM flat f JOIN m2 ON f.vec_id = m2.vec_id
        WHERE m2.margin <= 0 GROUP BY f.d
    ),
    w2 AS (
        SELECT list(g1.w + COALESCE(g2.gw, 0) ORDER BY g1.d) AS wv,
               CAST(SUM(g1.d * (g1.w + COALESCE(g2.gw, 0))) AS BIGINT) AS cks
        FROM g1 LEFT JOIN g2 ON g1.d = g2.d
    ),
    m3 AS (
        SELECT q.y * CAST(list_sum(list_transform(range(1, {_PCT_DIM} + 1),
                     i -> qv[i] * wv[i])) AS BIGINT) AS margin
        FROM q, (SELECT wv FROM w2) w
    ),
    e3 AS (SELECT CAST(count(*) FILTER (WHERE margin <= 0) AS BIGINT) AS n FROM m3)
    """
    return f"""
    WITH {flat}
    SELECT 1 AS epoch, (SELECT CAST(count(*) AS BIGINT) FROM q) AS n_errors,
           CAST(0 AS BIGINT) AS w_checksum
    UNION ALL
    SELECT 2, e2.n, w1.cks FROM e2, w1
    UNION ALL
    SELECT 3, e3.n, w2.cks FROM e3, w2
    """


@register("q222_perceptron_train", oracle=_q222_oracle())
def q222_perceptron_train(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed batch-perceptron training over the embeddings (positive
    class: odd label) — the simplest real TRAINING loop, run the way a
    100 TB pipeline must: per epoch ONE map-side-combined aggregate
    produces the misclassified count and all 64 gradient components, the
    65-number model is collected driver-side and inlined as literals for
    the next epoch (the q97/q134 tiny-model pattern — the data never
    shuffles, the model never exceeds a broadcast). Two epochs unrolled;
    each output row reports the error count measured with the PREVIOUS
    epoch's weights plus that weight vector's checksum, so the oracle
    verifies the whole training trajectory bit-for-bit.

    Everything is integer: 1e-3-quantized features, ±1 labels, integer
    weight sums — no learning-rate float, because the perceptron update
    rule is scale-free. A row with margin exactly 0 counts as an error
    (w0 = 0 makes epoch 1's error count = n, a deliberate fixed point
    the gate checks).
    """
    counts, weights = _pct_train(spark, sf_dir)

    def cks(w):
        return sum((d + 1) * v for d, v in enumerate(w))

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    q = embeddings.select(
        F.when(F.col("label") % 2 == 1, 1).otherwise(-1).alias("y"),
        F.transform(
            "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
        ).alias("qv"),
    )
    zero = F.lit(0).cast("bigint")
    w_final = F.lit([int(v) for v in weights[-1]])  # one array<bigint> literal
    margin = F.col("y") * F.aggregate(
        F.zip_with("qv", w_final, lambda x, wv: x * wv), zero, lambda a, v: a + v
    )
    final_row = q.select(margin.alias("margin")).agg(
        F.lit(_PCT_EPOCHS + 1).alias("epoch"),
        F.sum(F.when(F.col("margin") <= 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_errors"),
        F.lit(cks(weights[-1])).cast("bigint").alias("w_checksum"),
    )
    hist = spark.createDataFrame(
        [
            (e + 1, counts[e], cks(weights[e - 1]) if e > 0 else 0)
            for e in range(_PCT_EPOCHS)
        ],
        "epoch int, n_errors bigint, w_checksum bigint",
    )
    return hist.unionByName(final_row)


# ---------------------------------------------------------------------------
# q223: k-anonymity audit over a generalization ladder
# ---------------------------------------------------------------------------

_KA_K = 5  # groups smaller than this are re-identification risks
_KA_BUCKET = 1000  # acctbal band width (coarsest quasi-identifier)


@register(
    "q223_k_anonymity",
    oracle=f"""
    WITH quasi AS (
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               CAST(FLOOR(c.c_acctbal / {_KA_BUCKET}) AS BIGINT) AS bal_band
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    groups AS (
        SELECT CASE WHEN GROUPING(bal_band) = 0 THEN 0
                    WHEN GROUPING(segment) = 0 THEN 1
                    ELSE 2 END AS level,
               count(*) AS grp_n
        FROM quasi
        GROUP BY GROUPING SETS ((nation, segment, bal_band),
                                (nation, segment), (nation))
    )
    SELECT level,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(SUM(CASE WHEN grp_n < {_KA_K} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_small_groups,
           CAST(SUM(CASE WHEN grp_n < {_KA_K} THEN grp_n ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk,
           CAST(SUM(CASE WHEN grp_n < {_KA_K} THEN grp_n ELSE 0 END) * 1000000
                // SUM(grp_n) AS BIGINT) AS risk_ppm
    FROM groups GROUP BY level
    """,
)
def q223_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit: how many quasi-identifier groups (nation,
    market segment, account-balance band) contain fewer than k={_KA_K}
    customers — the re-identification risk check a pipeline runs before
    releasing "anonymized" training data — evaluated over the whole
    GENERALIZATION LADDER at once: level 0 = all three attributes,
    level 1 drops the balance band, level 2 keeps only nation. The level
    where risk_ppm reaches an acceptable floor is the generalization the
    release needs.

    Shape: ONE pass with GROUPING SETS computes every ladder level (a
    single Expand ×3 instead of three scans); grouping() flags identify
    the level; the risk rollup then runs on the group-cardinality table.
    The nation dim broadcasts into the quasi-identifier projection.
    """
    (customer, nation) = tables(spark, sf_dir, "customer", "nation")
    quasi = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / _KA_BUCKET).cast("bigint").alias("bal_band"),
    )
    groups = (
        quasi.groupingSets(
            [["nation", "segment", "bal_band"], ["nation", "segment"], ["nation"]],
            "nation",
            "segment",
            "bal_band",
        )
        .agg(
            F.count(F.lit(1)).alias("grp_n"),
            F.expr(
                "CASE WHEN GROUPING(bal_band) = 0 THEN 0 "
                "WHEN GROUPING(segment) = 0 THEN 1 ELSE 2 END"
            ).alias("level"),
        )
        .select("level", "grp_n")
    )
    return groups.groupBy("level").agg(
        F.count(F.lit(1)).alias("n_groups"),
        F.sum(F.when(F.col("grp_n") < _KA_K, 1).otherwise(0))
        .cast("bigint")
        .alias("n_small_groups"),
        F.sum(F.when(F.col("grp_n") < _KA_K, F.col("grp_n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
        F.expr(
            f"CAST(SUM(CASE WHEN grp_n < {_KA_K} THEN grp_n ELSE 0 END) * 1000000"
            " DIV SUM(grp_n) AS BIGINT)"
        ).alias("risk_ppm"),
    )


# ---------------------------------------------------------------------------
# q224: exact two-sample Kolmogorov-Smirnov statistic
# ---------------------------------------------------------------------------

_KS_A, _KS_B = "click", "view"


@register(
    "q224_ks_statistic",
    oracle=f"""
    WITH vals AS (
        SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events WHERE event_type IN ('{_KS_A}', '{_KS_B}')
    ),
    grouped AS (
        SELECT c,
               CAST(SUM(CASE WHEN event_type = '{_KS_A}' THEN 1 ELSE 0 END)
                   AS BIGINT) AS na_here,
               CAST(SUM(CASE WHEN event_type = '{_KS_B}' THEN 1 ELSE 0 END)
                   AS BIGINT) AS nb_here
        FROM vals GROUP BY c
    ),
    cum AS (
        SELECT c,
               CAST(SUM(na_here) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS ca,
               CAST(SUM(nb_here) OVER (ORDER BY c
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cb
        FROM grouped
    ),
    tot AS (
        SELECT CAST(SUM(na_here) AS BIGINT) AS na,
               CAST(SUM(nb_here) AS BIGINT) AS nb
        FROM grouped
    ),
    scored AS (
        SELECT c, ABS(ca * nb - cb * na) AS d_scaled FROM cum, tot
    )
    SELECT t.na, t.nb,
           (SELECT CAST(MAX(d_scaled) * 1000000 // (t.na * t.nb) AS BIGINT)
            FROM scored) AS ks_ppm,
           (SELECT CAST(MIN(c) AS BIGINT) FROM scored
            WHERE d_scaled = (SELECT MAX(d_scaled) FROM scored)) AS ks_at_cents
    FROM tot t
    """,
)
def q224_ks_statistic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact two-sample Kolmogorov-Smirnov statistic between the click and
    view value distributions — the distribution-shift test (train-vs-serve
    feature drift, A/B invariance checks) done integer-exactly: the KS
    supremum over |F_a - F_b| is max |ca·nb - cb·na| / (na·nb) where
    ca/cb are cumulative counts, so no float CDF ever exists; ks_at_cents
    reports WHERE the distributions diverge most (min such value on ties).

    The q215 collapse rule: values group to the distinct-cents table
    (map-side combined) BEFORE the single cumulative window, so the
    ordered pass runs over value cardinality, not event count — and at
    100 TB values bin to fixed-width cents buckets first, bounding the
    table; the binned KS is the standard production trade.
    """
    (events,) = tables(spark, sf_dir, "events")
    vals = events.filter(F.col("event_type").isin(_KS_A, _KS_B)).select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    grouped = vals.groupBy("c").agg(
        F.sum(F.when(F.col("event_type") == _KS_A, 1).otherwise(0))
        .cast("bigint")
        .alias("na_here"),
        F.sum(F.when(F.col("event_type") == _KS_B, 1).otherwise(0))
        .cast("bigint")
        .alias("nb_here"),
    )
    w_cum = Window.orderBy("c").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = grouped.select(
        "c",
        F.sum("na_here").over(w_cum).cast("bigint").alias("ca"),
        F.sum("nb_here").over(w_cum).cast("bigint").alias("cb"),
    )
    tot = grouped.agg(
        F.sum("na_here").cast("bigint").alias("na"),
        F.sum("nb_here").cast("bigint").alias("nb"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).select(
        "c",
        "na",
        "nb",
        F.abs(F.col("ca") * F.col("nb") - F.col("cb") * F.col("na")).alias("d_scaled"),
    )
    # attach the max via a window over the value-cardinality table (tiny by
    # the collapse rule), then keep only argmax rows — no window-in-agg
    best = scored.withColumn(
        "dmax", F.max("d_scaled").over(Window.partitionBy())
    ).filter(F.col("d_scaled") == F.col("dmax"))
    return best.agg(
        F.max("na").alias("na"),
        F.max("nb").alias("nb"),
        F.expr("CAST(MAX(dmax) * 1000000 DIV (MAX(na) * MAX(nb)) AS BIGINT)").alias(
            "ks_ppm"
        ),
        F.min("c").cast("bigint").alias("ks_at_cents"),
    )


# ---------------------------------------------------------------------------
# q225: hybrid retrieval — reciprocal-rank fusion of keyword + vector lists
# ---------------------------------------------------------------------------

_RRF_K = 60  # standard RRF damping constant
_RRF_N = 50  # depth of each candidate list
_RRF_NQ = 5  # query = the 5 globally most frequent tokens (q100's rule)
_RRF_TOP = 10


@register(
    "q225_rrf_hybrid",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY doc_id, term),
    q AS (
        SELECT term FROM (
            SELECT term, SUM(tf) AS total FROM tf GROUP BY term
            ORDER BY total DESC, term ASC LIMIT {_RRF_NQ}
        )
    ),
    kw_top AS (
        SELECT doc_id, row_number() OVER (ORDER BY s DESC, doc_id) AS r
        FROM (
            SELECT tf.doc_id, CAST(SUM(tf.tf) AS BIGINT) AS s
            FROM tf JOIN q USING (term) GROUP BY tf.doc_id
            ORDER BY s DESC, doc_id LIMIT {_RRF_N}
        )
    ),
    qv AS (
        SELECT list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        FROM embeddings WHERE vec_id = 0
    ),
    vec_top AS (
        SELECT doc_id, row_number() OVER (ORDER BY dot DESC, doc_id) AS r
        FROM (
            SELECT e.vec_id AS doc_id,
                   CAST(list_sum(list_transform(range(1, 65),
                        i -> CAST(FLOOR(CAST(e.embedding[i] AS DOUBLE) * 1000)
                                  AS BIGINT) * qv.v[i])) AS BIGINT) AS dot
            FROM embeddings e, qv
            WHERE e.vec_id <> 0
            ORDER BY dot DESC, doc_id LIMIT {_RRF_N}
        )
    ),
    fused AS (
        SELECT COALESCE(k.doc_id, v.doc_id) AS doc_id,
               COALESCE(1000000 // ({_RRF_K} + k.r), 0)
                   + COALESCE(1000000 // ({_RRF_K} + v.r), 0) AS rrf_micro,
               k.r AS kw_rank, v.r AS vec_rank
        FROM kw_top k FULL OUTER JOIN vec_top v ON k.doc_id = v.doc_id
    )
    SELECT doc_id, CAST(rrf_micro AS BIGINT) AS rrf_micro,
           CAST(kw_rank AS BIGINT) AS kw_rank,
           CAST(vec_rank AS BIGINT) AS vec_rank
    FROM fused
    ORDER BY rrf_micro DESC, doc_id LIMIT {_RRF_TOP}
    """,
)
def q225_rrf_hybrid(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid retrieval by reciprocal-rank fusion — the standard RAG-stack
    combiner: a keyword candidate list (tf sum over the 5 global query
    terms, q100's query-derivation rule) and a vector candidate list
    (integer inner-product against doc 0's embedding, MIPS-style) each
    contribute 1e6/(60+rank); missing from a list contributes 0; top-10
    by fused score. RRF needs only RANKS — which is exactly why it's the
    production fusion: scores from different retrievers aren't comparable,
    ranks always are, and integer ranks keep the whole fusion float-free.

    Shape at 100 TB: each candidate list is a TakeOrdered top-{_RRF_N}
    (partial top-k per partition, no global sort); the rank windows run
    over the {_RRF_N}-row lists; the fusion is a {_RRF_N}x{_RRF_N}
    full-outer join on doc id. The vector list swaps brute-force for the
    trained-IVF probe (q134) at scale; fusion is unchanged.
    """
    (documents, embeddings) = tables(spark, sf_dir, "documents", "embeddings")
    tok = documents.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    q = (
        tf.groupBy("term")
        .agg(F.sum("tf").alias("total"))
        .orderBy(F.col("total").desc(), F.col("term").asc())
        .limit(_RRF_NQ)
        .select("term")
    )
    kw_list = (
        tf.join(F.broadcast(q), "term")
        .groupBy("doc_id")
        .agg(F.sum("tf").cast("bigint").alias("s"))
        .orderBy(F.col("s").desc(), "doc_id")
        .limit(_RRF_N)
    )
    kw_top = kw_list.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.col("s").desc(), "doc_id")).alias("r"),
    )
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    qv = embeddings.filter(F.col("vec_id") == 0).select(quant.alias("qv"))
    zero = F.lit(0).cast("bigint")
    vec_list = (
        embeddings.filter(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("doc_id"), quant.alias("dv"))
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            F.aggregate(
                F.zip_with("dv", "qv", lambda a, b: a * b), zero, lambda a, v: a + v
            ).alias("dot"),
        )
        .orderBy(F.col("dot").desc(), "doc_id")
        .limit(_RRF_N)
    )
    vec_top = vec_list.select(
        "doc_id",
        F.row_number().over(Window.orderBy(F.col("dot").desc(), "doc_id")).alias("r"),
    )
    fused = (
        kw_top.withColumnRenamed("r", "kw_rank")
        .join(vec_top.withColumnRenamed("r", "vec_rank"), "doc_id", "full_outer")
        .select(
            "doc_id",
            (
                F.coalesce(
                    F.expr(f"1000000 DIV ({_RRF_K} + kw_rank)"), F.lit(0)
                )
                + F.coalesce(
                    F.expr(f"1000000 DIV ({_RRF_K} + vec_rank)"), F.lit(0)
                )
            )
            .cast("bigint")
            .alias("rrf_micro"),
            F.col("kw_rank").cast("bigint").alias("kw_rank"),
            F.col("vec_rank").cast("bigint").alias("vec_rank"),
        )
    )
    return fused.orderBy(F.col("rrf_micro").desc(), "doc_id").limit(_RRF_TOP)


# ---------------------------------------------------------------------------
# q226: multi-vector late-interaction retrieval (ColBERT-style MaxSim)
# ---------------------------------------------------------------------------

_MS_VPD = 5  # token-vectors per pseudo-document
_MS_TOP = 10


@register(
    "q226_maxsim_retrieval",
    oracle=f"""
    WITH q AS (
        SELECT vec_id % {_MS_VPD} AS qpos,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings WHERE vec_id // {_MS_VPD} = 0
    ),
    d AS (
        SELECT vec_id // {_MS_VPD} AS doc, vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS dv
        FROM embeddings WHERE vec_id // {_MS_VPD} <> 0
    ),
    sims AS (
        SELECT d.doc, q.qpos,
               MAX(CAST(list_sum(list_transform(range(1, 65),
                   i -> dv[i] * qv[i])) AS BIGINT)) AS best
        FROM d, q
        GROUP BY d.doc, q.qpos
    )
    SELECT doc, CAST(SUM(best) AS BIGINT) AS maxsim
    FROM sims GROUP BY doc
    ORDER BY maxsim DESC, doc LIMIT {_MS_TOP}
    """,
)
def q226_maxsim_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ColBERT-style late-interaction retrieval: documents are SETS of
    token vectors (pseudo-docs of {_MS_VPD} consecutive embeddings), and a
    document's score against the query's token vectors is MaxSim —
    for each query vector take the best-matching document vector, then
    sum: Σ_q max_d <q, d>. Late interaction is what multi-vector
    retrievers (ColBERT, XTR) do instead of pooling to one vector, and
    its Spark shape is exactly aggregation: the query's {_MS_VPD} vectors
    broadcast against the corpus, a (doc, qpos) MAX collapses the
    interaction matrix map-side, a doc-level SUM finishes, TakeOrdered
    top-{_MS_TOP}. Integer dot products (1e-3-quantized) end to end — no
    float crosses a row.

    At 100 TB the corpus side first prunes through an ANN index per query
    vector (q134's probe) and MaxSim rescoring runs on the union of
    candidates; the rescoring plan is this one unchanged.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    doc = F.expr(f"vec_id DIV {_MS_VPD}")
    q = embeddings.filter(doc == 0).select(
        (F.col("vec_id") % _MS_VPD).alias("qpos"), quant.alias("qv")
    )
    d = embeddings.filter(doc != 0).select(doc.alias("doc"), quant.alias("dv"))
    zero = F.lit(0).cast("bigint")
    dot = F.aggregate(
        F.zip_with("dv", "qv", lambda a, b: a * b), zero, lambda a, v: a + v
    )
    sims = (
        d.crossJoin(F.broadcast(q))
        .select("doc", "qpos", dot.alias("s"))
        .groupBy("doc", "qpos")
        .agg(F.max("s").alias("best"))
    )
    return (
        sims.groupBy("doc")
        .agg(F.sum("best").cast("bigint").alias("maxsim"))
        .orderBy(F.col("maxsim").desc(), "doc")
        .limit(_MS_TOP)
    )


# ---------------------------------------------------------------------------
# q227: A/B conversion z-interval (the decision readout on q191's arms)
# ---------------------------------------------------------------------------

_ZCRIT_MICRO = 1_959_964  # two-sided 95% normal critical value, 1e-6 scale


@register(
    "q227_ab_confidence",
    oracle=f"""
    WITH assigned AS (
        SELECT user_id,
               CAST(('0x' || substr(md5('ab1#' || CAST(user_id AS VARCHAR)), 1, 15))
                   AS BIGINT) % 2 AS arm
        FROM (SELECT DISTINCT user_id FROM events)
    ),
    conv AS (
        SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    ),
    arms AS (
        SELECT a.arm,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(CASE WHEN c.user_id IS NOT NULL THEN 1 ELSE 0 END)
                   AS BIGINT) AS k
        FROM assigned a LEFT JOIN conv c ON a.user_id = c.user_id
        GROUP BY a.arm
    ),
    wide AS (
        SELECT
            MAX(CASE WHEN arm = 0 THEN n END) AS na,
            MAX(CASE WHEN arm = 0 THEN k END) AS ka,
            MAX(CASE WHEN arm = 1 THEN n END) AS nb,
            MAX(CASE WHEN arm = 1 THEN k END) AS kb
        FROM arms
    ),
    stats AS (
        SELECT na, ka, nb, kb,
               CAST(ka AS DOUBLE) / na AS pa,
               CAST(kb AS DOUBLE) / nb AS pb,
               sqrt((CAST(ka AS DOUBLE) / na) * (1.0 - CAST(ka AS DOUBLE) / na) / na
                    + (CAST(kb AS DOUBLE) / nb) * (1.0 - CAST(kb AS DOUBLE) / nb) / nb)
                   AS se
        FROM wide
    )
    SELECT na, ka, nb, kb,
           CAST(FLOOR(pa * 1000000) AS BIGINT) AS pa_ppm,
           CAST(FLOOR(pb * 1000000) AS BIGINT) AS pb_ppm,
           CAST(FLOOR((pb - pa) * 1000000) AS BIGINT) AS diff_ppm,
           CAST(FLOOR(((pb - pa) - {_ZCRIT_MICRO}e-6 * se) * 1000000) AS BIGINT)
               AS ci_lo_ppm,
           CAST(FLOOR(((pb - pa) + {_ZCRIT_MICRO}e-6 * se) * 1000000) AS BIGINT)
               AS ci_hi_ppm,
           (((pb - pa) - {_ZCRIT_MICRO}e-6 * se) > 0.0
            OR ((pb - pa) + {_ZCRIT_MICRO}e-6 * se) < 0.0) AS significant
    FROM stats
    """,
)
def q227_ab_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A/B decision readout: the 95% z-interval on the conversion-rate
    difference between the two consistent-hash arms (q191's assignment
    rule, salt 'ab1') — per-arm n/k, rates, the diff, its confidence
    bounds, and the ship/no-ship boolean. This is the number an
    experimentation platform actually publishes; q198's Welch machinery
    supplies the heavier-tailed variant for non-binary metrics.

    Float discipline: counts are exact integers; the rate divisions,
    variance terms, and sqrt are each single exactly-rounded IEEE
    operations written in the SAME association order in both engines
    (sqrt is correctly rounded by spec), so the floored ppm bounds are
    bit-identical — the house "one exact primitive per step" rule.

    Shape: distinct users → hash arm (narrow) → LEFT join the converter
    set (both sides shuffle on user once) → 2-row arm table → 1-row
    pivot; everything after the first aggregate is metadata-scale.
    """
    (events,) = tables(spark, sf_dir, "events")
    assigned = events.select("user_id").distinct().select(
        "user_id",
        (md5_60bit(F.col("user_id").cast("string"), salt="ab1") % 2).alias("arm"),
    )
    conv = (
        events.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    )
    arms = (
        assigned.join(conv.withColumn("converted", F.lit(1)), "user_id", "left")
        .groupBy("arm")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            F.sum(F.coalesce("converted", F.lit(0))).cast("bigint").alias("k"),
        )
    )
    wide = arms.agg(
        F.max(F.when(F.col("arm") == 0, F.col("n"))).alias("na"),
        F.max(F.when(F.col("arm") == 0, F.col("k"))).alias("ka"),
        F.max(F.when(F.col("arm") == 1, F.col("n"))).alias("nb"),
        F.max(F.when(F.col("arm") == 1, F.col("k"))).alias("kb"),
    )
    pa = "CAST(ka AS DOUBLE) / na"
    pb = "CAST(kb AS DOUBLE) / nb"
    se = f"sqrt(({pa}) * (1.0 - {pa}) / na + ({pb}) * (1.0 - {pb}) / nb)"
    z = f"{_ZCRIT_MICRO}e-6"
    return wide.selectExpr(
        "na",
        "ka",
        "nb",
        "kb",
        f"CAST(FLOOR(({pa}) * 1000000) AS BIGINT) AS pa_ppm",
        f"CAST(FLOOR(({pb}) * 1000000) AS BIGINT) AS pb_ppm",
        f"CAST(FLOOR((({pb}) - ({pa})) * 1000000) AS BIGINT) AS diff_ppm",
        f"CAST(FLOOR(((({pb}) - ({pa})) - {z} * {se}) * 1000000) AS BIGINT)"
        " AS ci_lo_ppm",
        f"CAST(FLOOR(((({pb}) - ({pa})) + {z} * {se}) * 1000000) AS BIGINT)"
        " AS ci_hi_ppm",
        f"(((({pb}) - ({pa})) - {z} * {se}) > 0.0D"
        f" OR ((({pb}) - ({pa})) + {z} * {se}) < 0.0D) AS significant",
    )


# ---------------------------------------------------------------------------
# q228: deterministic bootstrap confidence interval (hash-Poisson replicas)
# ---------------------------------------------------------------------------

_BOOT_R = 20  # replicas (production uses ~200; same plan)
#: P(Poisson(1) <= k) * 1e9 as exact integer thresholds, k = 0..5 —
#: a hash-uniform draw u in [0, 1e9) maps to weight = #{thresholds <= u}
_POISSON_CDF_1E9 = [367879441, 735758882, 919698602, 981011843, 996340153, 999405815]


def _boot_weight_sql(u: str) -> str:
    """Poisson(1) weight of a 1e9-scaled uniform draw, engine-neutral SQL."""
    return "(" + " + ".join(
        f"CASE WHEN {u} >= {t} THEN 1 ELSE 0 END" for t in _POISSON_CDF_1E9
    ) + ")"


@register(
    "q228_bootstrap_ci",
    oracle=f"""
    WITH purchases AS (
        SELECT event_id, CAST(ROUND(value * 100) AS BIGINT) AS c
        FROM events WHERE event_type = 'purchase'
    ),
    weighted AS (
        SELECT r.r, p.c,
               {_boot_weight_sql(
                   "CAST(('0x' || substr(md5('boot' || CAST(r.r AS VARCHAR) "
                   "|| '#' || CAST(p.event_id AS VARCHAR)), 1, 15)) AS BIGINT) "
                   "% 1000000000"
               )} AS w
        FROM purchases p, LATERAL unnest(range(1, {_BOOT_R + 1})) r(r)
    ),
    replicas AS (
        SELECT r, CAST(SUM(w * c) * 1000 // SUM(w) AS BIGINT) AS mean_milli
        FROM weighted GROUP BY r
    ),
    ranked AS (
        SELECT mean_milli, row_number() OVER (ORDER BY mean_milli) AS rn
        FROM replicas
    )
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM purchases) AS n,
           (SELECT CAST(SUM(c) * 1000 // count(*) AS BIGINT) FROM purchases)
               AS point_mean_milli,
           (SELECT mean_milli FROM ranked WHERE rn = 1) AS boot_lo_milli,
           (SELECT mean_milli FROM ranked WHERE rn = {_BOOT_R}) AS boot_hi_milli,
           CAST({_BOOT_R} AS BIGINT) AS n_replicas
    """,
)
def q228_bootstrap_ci(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bootstrap confidence interval for the mean purchase value, made
    DETERMINISTIC: each of {_BOOT_R} replicas draws every row's
    multiplicity from Poisson(1) via an inverse-CDF lookup on a
    salted-hash uniform (integer thresholds, q65's consistent-hash
    discipline) — the standard Poisson-bootstrap approximation to
    sampling-with-replacement, reproducible across engines and reruns.
    With {_BOOT_R} replicas the reported interval is the replica min/max
    (~95% coverage at this R); production raises R, same plan.

    Shape at 100 TB: the replica explode is narrow ({_BOOT_R}x rows, no
    shuffle), replica means are ONE map-side-combined aggregate on the
    replica key, and everything after is a {_BOOT_R}-row table. No
    collect, no RNG state, no per-replica rescan of the fact table.
    """
    (events,) = tables(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", F.round(F.col("value") * 100).cast("bigint").alias("c")
    )
    weighted = purchases.select(
        "c",
        F.explode(F.sequence(F.lit(1), F.lit(_BOOT_R))).alias("r"),
        "event_id",
    ).withColumn(
        "u",
        md5_60bit(
            F.col("event_id").cast("string"),
            salt=F.concat(F.lit("boot"), F.col("r").cast("string")),
        )
        % 1_000_000_000,
    )
    weighted = weighted.withColumn("w", F.expr(_boot_weight_sql("u")))
    replicas = weighted.groupBy("r").agg(
        F.expr("CAST(SUM(w * c) * 1000 DIV SUM(w) AS BIGINT)").alias("mean_milli")
    )
    ranked = replicas.select(
        "mean_milli", F.row_number().over(Window.orderBy("mean_milli")).alias("rn")
    )
    point = purchases.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.expr("CAST(SUM(c) * 1000 DIV COUNT(*) AS BIGINT)").alias(
            "point_mean_milli"
        ),
    )
    lo = ranked.filter(F.col("rn") == 1).select(
        F.col("mean_milli").alias("boot_lo_milli")
    )
    hi = ranked.filter(F.col("rn") == _BOOT_R).select(
        F.col("mean_milli").alias("boot_hi_milli")
    )
    return (
        point.crossJoin(F.broadcast(lo))
        .crossJoin(F.broadcast(hi))
        .withColumn("n_replicas", F.lit(_BOOT_R).cast("bigint"))
    )


# ---------------------------------------------------------------------------
# q229: optimal decision threshold (Youden J on the model score)
# ---------------------------------------------------------------------------


def _q229_oracle() -> str:
    from .similarity import _LM_W

    return f"""
    WITH q AS (
        SELECT CASE WHEN label % 2 = 1 THEN 1 ELSE 0 END AS pos,
               CAST(list_sum(list_transform(list_zip(
                    list_transform(embedding,
                        x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)),
                    {list(_LM_W)}), p -> p[1] * p[2])) AS BIGINT) AS score
        FROM embeddings
    ),
    grouped AS (
        SELECT score, CAST(count(*) AS BIGINT) AS c,
               CAST(SUM(pos) AS BIGINT) AS p
        FROM q GROUP BY score
    ),
    cum AS (
        SELECT score,
               CAST(SUM(p) OVER (ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_pos,
               CAST(SUM(c - p) OVER (ORDER BY score
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS cum_neg
        FROM grouped
    ),
    tot AS (
        SELECT CAST(SUM(p) AS BIGINT) AS n_pos,
               CAST(SUM(c - p) AS BIGINT) AS n_neg
        FROM grouped
    ),
    scored AS (
        -- classify score > t as positive: J(t) = TPR - FPR
        -- ∝ cum_neg·n_pos - cum_pos·n_neg  (maximize)
        SELECT score, cum_neg * n_pos - cum_pos * n_neg AS j_scaled,
               cum_pos, cum_neg, n_pos, n_neg
        FROM cum, tot
    ),
    best AS (
        SELECT * FROM scored
        WHERE j_scaled = (SELECT MAX(j_scaled) FROM scored)
        ORDER BY score LIMIT 1
    )
    SELECT score AS threshold, n_pos, n_neg,
           CAST(j_scaled * 1000000 // (n_pos * n_neg) AS BIGINT) AS youden_j_ppm,
           CAST(((n_pos - cum_pos) + cum_neg) * 1000000 // (n_pos + n_neg)
               AS BIGINT) AS accuracy_ppm
    FROM best
    """


@register("q229_optimal_threshold", oracle=_q229_oracle())
def q229_optimal_threshold(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Optimal decision threshold for the q160/q215 linear model: the
    score cut maximizing Youden's J = TPR − FPR (classify score > t as
    positive), reported with the achieved J and accuracy — how a quality
    classifier's operating point is actually chosen after q215 says the
    ranking is good. J(t) maximization is integer-exact:
    J ∝ cum_neg·n_pos − cum_pos·n_neg over cumulative counts, the same
    cross-multiplication that makes q224's KS float-free (Youden J IS
    the KS distance between the class-conditional score distributions).

    Shape: the q215 collapse rule — scores group to the distinct-value
    table before the single cumulative window; the argmax keeps the
    smallest score on ties.
    """
    from .similarity import _LM_W

    (embeddings,) = tables(spark, sf_dir, "embeddings")
    qv = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    w_arr = F.lit([int(w) for w in _LM_W])  # one array<bigint> literal node
    zero = F.lit(0).cast("bigint")
    scored_rows = embeddings.select(
        F.when(F.col("label") % 2 == 1, 1).otherwise(0).alias("pos"),
        F.aggregate(
            F.zip_with(qv, w_arr, lambda x, w: x * w), zero, lambda a, v: a + v
        ).alias("score"),
    )
    grouped = scored_rows.groupBy("score").agg(
        F.count(F.lit(1)).cast("bigint").alias("c"),
        F.sum("pos").cast("bigint").alias("p"),
    )
    w_cum = Window.orderBy("score").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grouped.select(
        "score",
        F.sum("p").over(w_cum).cast("bigint").alias("cum_pos"),
        F.sum(F.col("c") - F.col("p")).over(w_cum).cast("bigint").alias("cum_neg"),
    )
    tot = grouped.agg(
        F.sum("p").cast("bigint").alias("n_pos"),
        F.sum(F.col("c") - F.col("p")).cast("bigint").alias("n_neg"),
    )
    scored = cum.crossJoin(F.broadcast(tot)).withColumn(
        "j_scaled",
        F.col("cum_neg") * F.col("n_pos") - F.col("cum_pos") * F.col("n_neg"),
    )
    best = (
        scored.withColumn(
            "jmax", F.max("j_scaled").over(Window.partitionBy())
        )
        .filter(F.col("j_scaled") == F.col("jmax"))
        .orderBy("score")
        .limit(1)
    )
    return best.select(
        F.col("score").alias("threshold"),
        "n_pos",
        "n_neg",
        F.expr("CAST(j_scaled * 1000000 DIV (n_pos * n_neg) AS BIGINT)").alias(
            "youden_j_ppm"
        ),
        F.expr(
            "CAST(((n_pos - cum_pos) + cum_neg) * 1000000 DIV (n_pos + n_neg)"
            " AS BIGINT)"
        ).alias("accuracy_ppm"),
    )


# ---------------------------------------------------------------------------
# q230: incremental join maintenance (delta-join rule for materialized views)
# ---------------------------------------------------------------------------

_DJ_MOD = 11  # orders with o_orderkey % 11 == 0 play the "delta batch"


@register(
    "q230_incremental_join_maintenance",
    oracle=f"""
    WITH base_orders AS (
        SELECT * FROM orders WHERE o_orderkey % {_DJ_MOD} <> 0
    ),
    delta_orders AS (
        SELECT * FROM orders WHERE o_orderkey % {_DJ_MOD} = 0
    ),
    base_view AS (
        SELECT n.n_name AS nation, count(*) AS cnt,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM base_orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    delta_view AS (
        SELECT n.n_name AS nation, count(*) AS cnt,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM delta_orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    ),
    maintained AS (
        SELECT COALESCE(b.nation, d.nation) AS nation,
               CAST(COALESCE(b.cnt, 0) + COALESCE(d.cnt, 0) AS BIGINT) AS cnt,
               CAST(COALESCE(b.cents, 0) + COALESCE(d.cents, 0) AS BIGINT) AS cents
        FROM base_view b FULL OUTER JOIN delta_view d ON b.nation = d.nation
    ),
    full_recompute AS (
        SELECT n.n_name AS nation, CAST(count(*) AS BIGINT) AS cnt,
               CAST(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)) AS BIGINT)
                   AS cents
        FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
        GROUP BY n.n_name
    )
    SELECT m.nation, m.cnt, m.cents,
           (m.cnt = f.cnt AND m.cents = f.cents) AS matches_recompute
    FROM maintained m JOIN full_recompute f ON m.nation = f.nation
    """,
)
def q230_incremental_join_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view (orders ⋈ customer ⋈ nation
    rolled up per nation): when a delta batch of orders arrives, the view
    updates by joining ONLY the delta against the dimensions and merging
    into the base aggregate — the delta-join rule (Δ(R ⋈ S) = ΔR ⋈ S when
    only R changes) that q195 applied to plain aggregates, extended to
    joins. The query computes the maintained result AND the full
    recompute, and emits a per-group boolean proving they agree — the
    self-auditing pattern a production refresh job should ship with.

    Shape at 100 TB: refresh cost is delta-sized (the delta joins
    broadcast dims and partially aggregates before the merge); the
    full-recompute branch exists only as the audit and drops out of the
    production plan. The merge is a group-key full-outer join of two
    aggregate tables — group-cardinality, not fact-cardinality.
    """
    (orders, customer, nation) = tables(spark, sf_dir, "orders", "customer", "nation")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")

    def view_of(o: DataFrame) -> DataFrame:
        return (
            o.join(customer, o.o_custkey == customer.c_custkey)
            .join(F.broadcast(nation), customer.c_nationkey == nation.n_nationkey)
            .groupBy(F.col("n_name").alias("nation"))
            .agg(
                F.count(F.lit(1)).cast("bigint").alias("cnt"),
                F.sum(cents).cast("bigint").alias("cents"),
            )
        )

    base_view = view_of(orders.filter(F.col("o_orderkey") % _DJ_MOD != 0))
    delta_view = view_of(orders.filter(F.col("o_orderkey") % _DJ_MOD == 0))
    maintained = (
        base_view.withColumnRenamed("cnt", "b_cnt")
        .withColumnRenamed("cents", "b_cents")
        .join(
            delta_view.withColumnRenamed("cnt", "d_cnt").withColumnRenamed(
                "cents", "d_cents"
            ),
            "nation",
            "full_outer",
        )
        .select(
            "nation",
            (F.coalesce("b_cnt", F.lit(0)) + F.coalesce("d_cnt", F.lit(0)))
            .cast("bigint")
            .alias("cnt"),
            (F.coalesce("b_cents", F.lit(0)) + F.coalesce("d_cents", F.lit(0)))
            .cast("bigint")
            .alias("cents"),
        )
    )
    full = view_of(orders).withColumnRenamed("cnt", "f_cnt").withColumnRenamed(
        "cents", "f_cents"
    )
    return maintained.join(full, "nation").select(
        "nation",
        "cnt",
        "cents",
        (
            (F.col("cnt") == F.col("f_cnt")) & (F.col("cents") == F.col("f_cents"))
        ).alias("matches_recompute"),
    )


# ---------------------------------------------------------------------------
# q231: next-event prediction eval (Markov argmax, train/test split)
# ---------------------------------------------------------------------------


@register(
    "q231_next_event_eval",
    oracle="""
    WITH seq AS (
        SELECT user_id, event_id, event_type,
               LEAD(event_type) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id) AS next_type,
               event_id % 2 AS fold
        FROM events
    ),
    pairs AS (
        SELECT fold, event_type AS prev, next_type AS nxt
        FROM seq WHERE next_type IS NOT NULL
    ),
    model AS (
        SELECT prev, nxt AS predicted
        FROM (
            SELECT prev, nxt,
                   row_number() OVER (PARTITION BY prev
                                      ORDER BY count(*) DESC, nxt) AS rnk
            FROM pairs WHERE fold = 0 GROUP BY prev, nxt
        ) WHERE rnk = 1
    ),
    test AS (
        SELECT p.prev, p.nxt, m.predicted
        FROM pairs p LEFT JOIN model m ON p.prev = m.prev
        WHERE p.fold = 1
    )
    SELECT prev,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(SUM(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) AS BIGINT)
               AS n_correct,
           CAST(SUM(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS accuracy_ppm,
           MAX(predicted) AS predicted_next
    FROM test GROUP BY prev
    """,
)
def q231_next_event_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Next-event prediction evaluated honestly: a Markov top-1 model
    (argmax next-event per previous-event) is TRAINED on the even-id half
    of each user's transitions and SCORED on the odd-id half — per
    previous-event test count, hits, and accuracy. This is the eval twin
    of q157's transition matrix: the matrix describes, this one measures
    whether the description predicts.

    Determinism: the argmax ties break on the event-type name (shared
    ORDER BY); transitions order by (ts, event_id) like every sequence
    operator in the registry.

    Shape at 100 TB: transitions come from the q108 user-partitioned
    LEAD window; the model is a |event-types|² aggregate (tiny) whose
    argmax runs over that metadata table; scoring is a broadcast join of
    the model onto the test fold. One fact-table window, one broadcast.
    """
    (events,) = tables(spark, sf_dir, "events")
    w_seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = events.select(
        "event_type",
        F.lead("event_type").over(w_seq).alias("next_type"),
        (F.col("event_id") % 2).alias("fold"),
    ).filter(F.col("next_type").isNotNull())
    pairs = seq.select("fold", F.col("event_type").alias("prev"), F.col("next_type").alias("nxt"))
    counts = (
        pairs.filter(F.col("fold") == 0)
        .groupBy("prev", "nxt")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w_rank = Window.partitionBy("prev").orderBy(F.col("n").desc(), "nxt")
    model = (
        counts.withColumn("rnk", F.row_number().over(w_rank))
        .filter(F.col("rnk") == 1)
        .select("prev", F.col("nxt").alias("predicted"))
    )
    test = pairs.filter(F.col("fold") == 1).join(F.broadcast(model), "prev", "left")
    return test.groupBy("prev").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_test"),
        F.sum(F.when(F.col("nxt") == F.col("predicted"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_correct"),
        F.expr(
            "CAST(SUM(CASE WHEN nxt = predicted THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("accuracy_ppm"),
        F.max("predicted").alias("predicted_next"),
    )


# ---------------------------------------------------------------------------
# q232: MMR diversified selection (greedy maximal marginal relevance)
# ---------------------------------------------------------------------------

_MMR_POOL = 8  # candidate pool size (top-k by relevance)
_MMR_K = 3  # selections
_MMR_REL_W, _MMR_DIV_W = 10, 6  # integer λ: gain = 10·rel − 6·max_sim


def _q232_oracle() -> str:
    dot = (
        "CAST(list_sum(list_transform(range(1, 65), i -> {a}[i] * {b}[i])) AS BIGINT)"
    )
    return f"""
    WITH qv AS (
        SELECT list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS v
        FROM embeddings WHERE vec_id = 0
    ),
    cands AS (
        SELECT e.vec_id AS doc_id,
               list_transform(e.embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS dv,
               {dot.format(a="list_transform(e.embedding, x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT))", b="qv.v")} AS rel
        FROM embeddings e, qv
        WHERE e.vec_id <> 0
        ORDER BY rel DESC, doc_id LIMIT {_MMR_POOL}
    ),
    s1 AS (SELECT * FROM cands ORDER BY rel DESC, doc_id LIMIT 1),
    g2 AS (
        SELECT c.doc_id, c.dv, c.rel,
               {_MMR_REL_W} * c.rel
                   - {_MMR_DIV_W} * {dot.format(a="c.dv", b="s1.dv")} AS gain
        FROM cands c, s1 WHERE c.doc_id <> s1.doc_id
    ),
    s2 AS (SELECT * FROM g2 ORDER BY gain DESC, doc_id LIMIT 1),
    g3 AS (
        SELECT c.doc_id, c.rel,
               {_MMR_REL_W} * c.rel - {_MMR_DIV_W} * GREATEST(
                   {dot.format(a="c.dv", b="s1.dv")},
                   {dot.format(a="c.dv", b="s2.dv")}) AS gain
        FROM cands c, s1, s2
        WHERE c.doc_id <> s1.doc_id AND c.doc_id <> s2.doc_id
    ),
    s3 AS (SELECT * FROM g3 ORDER BY gain DESC, doc_id LIMIT 1)
    SELECT CAST(1 AS BIGINT) AS rank, s1.doc_id, s1.rel FROM s1
    UNION ALL
    SELECT 2, s2.doc_id, s2.rel FROM s2
    UNION ALL
    SELECT 3, s3.doc_id, s3.rel FROM s3
    """


@register("q232_mmr_selection", oracle=_q232_oracle())
def q232_mmr_selection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal-marginal-relevance selection — the diversified top-k used
    for RAG context packing and training-set diversification: greedily
    pick {_MMR_K} items from the top-{_MMR_POOL} relevance pool, each
    step maximizing 10·relevance − 6·(max similarity to the already
    selected), all similarities integer dot products.

    Split of labor: the DISTRIBUTED part is the relevance top-{_MMR_POOL}
    (one corpus scan + TakeOrdered); the greedy runs on the collected
    {_MMR_POOL}-row pool driver-side — pool size is the model here, the
    q97/q134 tiny-model rule — and the selected ids filter the
    distributed candidate plan for the returned rows, so the output
    carries full lineage. The oracle unrolls the same greedy in SQL.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    qv = embeddings.filter(F.col("vec_id") == 0).select(quant.alias("qv"))
    zero = F.lit(0).cast("bigint")
    cands = (
        embeddings.filter(F.col("vec_id") != 0)
        .select(F.col("vec_id").alias("doc_id"), quant.alias("dv"))
        .crossJoin(F.broadcast(qv))
        .select(
            "doc_id",
            "dv",
            F.aggregate(
                F.zip_with("dv", "qv", lambda a, b: a * b), zero, lambda a, v: a + v
            ).alias("rel"),
        )
        .orderBy(F.col("rel").desc(), "doc_id")
        .limit(_MMR_POOL)
    )
    pool = cands.collect()  # _MMR_POOL rows — the "model"
    vecs = {r["doc_id"]: list(r["dv"]) for r in pool}
    rels = {r["doc_id"]: r["rel"] for r in pool}
    selected: list[int] = []
    for _ in range(_MMR_K):
        best_id, best_gain = None, None
        for did in sorted(vecs):
            if did in selected:
                continue
            pen = max(
                (sum(a * b for a, b in zip(vecs[did], vecs[s])) for s in selected),
                default=0,
            )
            gain = _MMR_REL_W * rels[did] - (_MMR_DIV_W * pen if selected else 0)
            if selected:
                key = gain
            else:
                key = rels[did]
            if best_gain is None or key > best_gain:
                best_gain, best_id = key, did
        selected.append(best_id)
    rank_expr = F.create_map(
        *[x for d, r in zip(selected, range(1, _MMR_K + 1)) for x in (F.lit(d), F.lit(r))]
    )
    return (
        cands.filter(F.col("doc_id").isin(selected))
        .select(
            rank_expr[F.col("doc_id")].cast("bigint").alias("rank"),
            "doc_id",
            "rel",
        )
        .orderBy("rank")
    )


# ---------------------------------------------------------------------------
# q233: watermark sizing — smallest delay covering 99.9% of late arrivals
# ---------------------------------------------------------------------------

_WM_COVERAGE_PPM = 999_000  # target: drop at most 0.1% of rows as too-late


@register(
    "q233_watermark_advice",
    oracle=f"""
    WITH ordered AS (
        SELECT user_id, epoch_us(ts) AS us, event_id,
               MAX(epoch_us(ts)) OVER (PARTITION BY user_id
                    ORDER BY event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hwm
        FROM events
    ),
    lateness AS (
        SELECT CAST(hwm - us AS BIGINT) AS late_us FROM ordered
    ),
    grouped AS (
        SELECT late_us, CAST(count(*) AS BIGINT) AS c
        FROM lateness GROUP BY late_us
    ),
    cum AS (
        SELECT late_us,
               CAST(SUM(c) OVER (ORDER BY late_us
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)
                   AS covered,
               CAST(SUM(c) OVER () AS BIGINT) AS total
        FROM grouped
    )
    SELECT MIN(late_us) AS watermark_us,
           CAST(MIN(late_us) // 1000000 AS BIGINT) AS watermark_sec,
           (SELECT MAX(total) FROM cum) AS n_events,
           (SELECT MIN(covered) FROM cum
            WHERE covered * 1000000 >= total * {_WM_COVERAGE_PPM}) AS n_covered
    FROM cum
    WHERE covered * 1000000 >= total * {_WM_COVERAGE_PPM}
    """,
)
def q233_watermark_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Watermark sizing from measured disorder: treating event_id as
    arrival order (q203's convention), each event's lateness is the gap
    to its user's event-time high-water mark at arrival; the advised
    watermark is the SMALLEST delay whose cumulative coverage reaches
    99.9% of events — the number you paste into ``withWatermark`` so the
    state store holds just enough and late drops stay under the SLO.

    Shape: per-user running-max window (fact-partitioned), then the q215
    collapse — lateness groups to its distinct-value table before the one
    cumulative pass; the threshold scan is integer cross-multiplied
    (covered·1e6 ≥ total·target), no float percentile.
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w_arr = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    lateness = events.select(
        (F.max(us).over(w_arr) - us).cast("bigint").alias("late_us")
    )
    grouped = lateness.groupBy("late_us").agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    w_cum = Window.orderBy("late_us").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum = grouped.select(
        "late_us",
        F.sum("c").over(w_cum).cast("bigint").alias("covered"),
        F.sum("c").over(Window.partitionBy()).cast("bigint").alias("total"),
    )
    hit = cum.filter(
        F.col("covered") * 1_000_000 >= F.col("total") * _WM_COVERAGE_PPM
    )
    return hit.agg(
        F.min("late_us").alias("watermark_us"),
        F.expr("CAST(MIN(late_us) DIV 1000000 AS BIGINT)").alias("watermark_sec"),
        F.max("total").alias("n_events"),
        F.min("covered").alias("n_covered"),
    )


# ---------------------------------------------------------------------------
# q234: embedding-table quality audit (vector QC before indexing)
# ---------------------------------------------------------------------------

_VQC_SCALE = 1_000_000  # norms audited in 1e-6-scaled integer units


@register(
    "q234_vector_qc",
    oracle=f"""
    WITH q AS (
        SELECT vec_id,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv,
               len(embedding) AS dim
        FROM embeddings
    ),
    norms AS (
        SELECT vec_id, dim,
               CAST(list_sum(list_transform(qv, x -> x * x)) AS BIGINT) AS n2
        FROM q
    ),
    dims AS (
        SELECT i + 1 AS d, MIN(qv[i + 1]) AS mn, MAX(qv[i + 1]) AS mx
        FROM q, LATERAL unnest(range(0, 64)) t(i)
        GROUP BY i + 1
    ),
    ranked AS (
        SELECT n2, row_number() OVER (ORDER BY n2, vec_id) AS rn,
               count(*) OVER () AS n
        FROM norms
    ),
    med AS (SELECT n2 AS med_n2 FROM ranked WHERE rn = (n + 1) // 2)
    SELECT (SELECT CAST(count(*) AS BIGINT) FROM norms) AS n_vectors,
           (SELECT CAST(MIN(dim) AS BIGINT) FROM norms) AS min_dim,
           (SELECT CAST(MAX(dim) AS BIGINT) FROM norms) AS max_dim,
           (SELECT CAST(SUM(CASE WHEN n2 = 0 THEN 1 ELSE 0 END) AS BIGINT)
            FROM norms) AS n_zero_norm,
           (SELECT CAST(med_n2 AS BIGINT) FROM med) AS median_norm2,
           (SELECT CAST(count(*) AS BIGINT) FROM norms, med
            WHERE n2 * 100 > med_n2 * 400) AS n_norm_outliers,
           (SELECT CAST(SUM(CASE WHEN mn = mx THEN 1 ELSE 0 END) AS BIGINT)
            FROM dims) AS n_dead_dims
    """,
)
def q234_vector_qc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vector-table quality audit — the checks an indexing pipeline runs
    BEFORE building ANN structures: vector count, dimension consistency,
    zero-norm vectors (undefined cosine), norm outliers (squared norm
    > 4× the median — embedding-model regressions show up here first),
    and dead dimensions (constant across the corpus — wasted index bits).

    Integer discipline: norms audit in quantized-squared units and the
    outlier bound cross-multiplies against the exact rank-median; the
    per-dimension min/max pass is a posexplode + 64-group aggregate.
    One corpus pass for norms + one for dimensions; everything else is
    metadata-scale.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    zero = F.lit(0).cast("bigint")
    norms = embeddings.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.aggregate(
            F.transform(quant, lambda x: x * x), zero, lambda a, v: a + v
        ).alias("n2"),
    )
    dims = (
        embeddings.select(F.posexplode(quant).alias("i", "v"))
        .groupBy("i")
        .agg(F.min("v").alias("mn"), F.max("v").alias("mx"))
    )
    # exact rank-median WITHOUT a global-sort window: histogram-rank
    # decomposition (bucketed counts -> broadcast base ranks -> per-bucket
    # row_number), then pick rank (n+1) DIV 2 — same result as the old
    # corpus-sized `row_number() OVER (ORDER BY n2, vec_id)` single task
    from ._util import distributed_row_number

    ranked = distributed_row_number(
        norms,
        bucket=F.floor(F.col("n2") / F.lit(100000)).cast("bigint"),
        order_by=[F.col("n2").asc(), F.col("vec_id").asc()],
    ).crossJoin(F.broadcast(norms.groupBy().agg(F.count(F.lit(1)).alias("n"))))
    med = ranked.filter(F.col("rn") == F.expr("(n + 1) DIV 2")).select(
        F.col("n2").alias("med_n2")
    )
    norm_stats = norms.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_vectors"),
        F.min("dim").cast("bigint").alias("min_dim"),
        F.max("dim").cast("bigint").alias("max_dim"),
        F.sum(F.when(F.col("n2") == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_zero_norm"),
    )
    outliers = (
        norms.crossJoin(F.broadcast(med))
        .filter(F.col("n2") * 100 > F.col("med_n2") * 400)
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_norm_outliers"))
    )
    dead = dims.agg(
        F.sum(F.when(F.col("mn") == F.col("mx"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_dead_dims")
    )
    return (
        norm_stats.crossJoin(F.broadcast(med.select(F.col("med_n2").cast("bigint").alias("median_norm2"))))
        .crossJoin(F.broadcast(outliers))
        .crossJoin(F.broadcast(dead))
        .select(
            "n_vectors",
            "min_dim",
            "max_dim",
            "n_zero_norm",
            "median_norm2",
            "n_norm_outliers",
            "n_dead_dims",
        )
    )


# ---------------------------------------------------------------------------
# q235: deletion-impact audit (right-to-be-forgotten cascade sizing)
# ---------------------------------------------------------------------------

_DEL_MOD = 13  # customers with c_custkey % 13 == 0 file deletion requests


@register(
    "q235_deletion_impact",
    oracle=f"""
    WITH dele AS (
        SELECT c_custkey FROM customer WHERE c_custkey % {_DEL_MOD} = 0
    ),
    o AS (
        SELECT count(*) AS n FROM orders
        WHERE o_custkey IN (SELECT c_custkey FROM dele)
    ),
    l AS (
        SELECT count(*) AS n FROM lineitem
        WHERE l_orderkey IN (
            SELECT o_orderkey FROM orders
            WHERE o_custkey IN (SELECT c_custkey FROM dele))
    ),
    e AS (
        SELECT count(*) AS n FROM events
        WHERE user_id IN (SELECT c_custkey FROM dele)
    )
    SELECT 'customer' AS table_name,
           (SELECT CAST(count(*) AS BIGINT) FROM dele) AS n_delete,
           (SELECT CAST(count(*) AS BIGINT) FROM customer) AS n_total
    UNION ALL
    SELECT 'orders', (SELECT CAST(n AS BIGINT) FROM o),
           (SELECT CAST(count(*) AS BIGINT) FROM orders)
    UNION ALL
    SELECT 'lineitem', (SELECT CAST(n AS BIGINT) FROM l),
           (SELECT CAST(count(*) AS BIGINT) FROM lineitem)
    UNION ALL
    SELECT 'events', (SELECT CAST(n AS BIGINT) FROM e),
           (SELECT CAST(count(*) AS BIGINT) FROM events)
    """,
)
def q235_deletion_impact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: given a deletion request list
    (customers with key % {_DEL_MOD} == 0), size the cascade across every
    table that references them — direct rows (orders, events) and
    transitive rows (lineitem via the affected orders) — per table,
    rows-to-delete vs total. The sizing query a privacy pipeline runs
    before executing deletes, and the shape of the delete itself (swap
    the counts for an anti-join writer).

    Shape at 100 TB: the request list is small → every probe is a
    LEFT SEMI join against a BROADCAST of the keys (and of the affected
    order ids for the transitive hop) — fact tables stream, never
    shuffle; per-table counts are one aggregate each, unioned into the
    4-row report.
    """
    (customer, orders, lineitem, events) = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "events"
    )
    dele = customer.filter(F.col("c_custkey") % _DEL_MOD == 0).select("c_custkey")
    aff_orders = orders.join(
        F.broadcast(dele), orders.o_custkey == dele.c_custkey, "left_semi"
    )
    aff_order_keys = aff_orders.select("o_orderkey")

    def one(name: str, to_delete, total) -> DataFrame:
        d = to_delete.agg(F.count(F.lit(1)).cast("bigint").alias("n_delete"))
        t = total.agg(F.count(F.lit(1)).cast("bigint").alias("n_total"))
        return d.crossJoin(F.broadcast(t)).select(
            F.lit(name).alias("table_name"), "n_delete", "n_total"
        )

    return (
        one("customer", dele, customer)
        .unionByName(one("orders", aff_orders, orders))
        .unionByName(
            one(
                "lineitem",
                lineitem.join(
                    F.broadcast(aff_order_keys),
                    lineitem.l_orderkey == aff_order_keys.o_orderkey,
                    "left_semi",
                ),
                lineitem,
            )
        )
        .unionByName(
            one(
                "events",
                events.join(
                    F.broadcast(dele), events.user_id == dele.c_custkey, "left_semi"
                ),
                events,
            )
        )
    )


# ---------------------------------------------------------------------------
# q236: rate-difference decomposition (Kitagawa: composition vs rate effects)
# ---------------------------------------------------------------------------


@register(
    "q236_rate_decomposition",
    oracle="""
    WITH flags AS (
        SELECT lang, source,
               CASE WHEN source IN ('src0', 'src1') THEN 'A' ELSE 'B' END AS grp,
               CASE WHEN n_chars >= 150 THEN 1 ELSE 0 END AS ok
        FROM documents
    ),
    cells AS (
        SELECT grp, lang, CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(ok) AS BIGINT) AS k
        FROM flags GROUP BY grp, lang
    ),
    tot AS (
        SELECT grp, CAST(SUM(n) AS BIGINT) AS nt FROM cells GROUP BY grp
    ),
    wide AS (
        SELECT c.lang,
               MAX(CASE WHEN c.grp = 'A' THEN c.n END) AS na,
               MAX(CASE WHEN c.grp = 'A' THEN c.k END) AS ka,
               MAX(CASE WHEN c.grp = 'B' THEN c.n END) AS nb,
               MAX(CASE WHEN c.grp = 'B' THEN c.k END) AS kb,
               MAX(CASE WHEN t.grp = 'A' THEN t.nt END) AS nta,
               MAX(CASE WHEN t.grp = 'B' THEN t.nt END) AS ntb
        FROM cells c, tot t
        GROUP BY c.lang
    )
    SELECT lang,
           CAST(na * 1000000 // nta AS BIGINT) AS weight_a_ppm,
           CAST(nb * 1000000 // ntb AS BIGINT) AS weight_b_ppm,
           CAST(ka * 1000000 // na AS BIGINT) AS rate_a_ppm,
           CAST(kb * 1000000 // nb AS BIGINT) AS rate_b_ppm,
           -- rate effect: A's mix applied to the rate gap; pp12 scale
           -- (no final division: integer DIV vs // disagree on negatives)
           CAST((na * 1000000 // nta)
                * ((ka * 1000000 // na) - (kb * 1000000 // nb))
                AS BIGINT) AS rate_effect_pp12,
           -- composition effect: the mix gap at B's rate; pp12 scale
           CAST(((na * 1000000 // nta) - (nb * 1000000 // ntb))
                * (kb * 1000000 // nb) AS BIGINT)
               AS composition_effect_pp12
    FROM wide
    """,
)
def q236_rate_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kitagawa (Oaxaca-Blinder) decomposition of a pass-rate difference
    between two source groups: per language slice, how much of the
    overall quality-pass-rate gap comes from the groups having DIFFERENT
    RATES within the slice (rate effect) vs having a DIFFERENT MIX of
    slices (composition effect). Answering "is source B worse, or does it
    just carry more hard languages?" is this exact decomposition — the
    analytics step after q192 flags a slice drift.

    Integer discipline: all weights and rates are floored ppm before the
    products; the effect terms stay in pp12 scale (ppm x ppm) with NO
    final division — Spark's DIV truncates toward zero while DuckDB's //
    floors, so a negative effect would disagree by one ulp if divided.
    Shape: one (grp, lang) aggregate, a 2-row total, a lang-cardinality
    pivot — metadata-scale after the first pass.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    flags = documents.select(
        "lang",
        F.when(F.col("source").isin("src0", "src1"), "A").otherwise("B").alias("grp"),
        F.when(F.col("n_chars") >= 150, 1).otherwise(0).alias("ok"),
    )
    cells = flags.groupBy("grp", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("ok").cast("bigint").alias("k"),
    )
    tot = cells.groupBy("grp").agg(F.sum("n").cast("bigint").alias("nt"))
    wide = (
        cells.crossJoin(F.broadcast(tot.withColumnRenamed("grp", "tgrp")))
        .groupBy("lang")
        .agg(
            F.max(F.when(F.col("grp") == "A", F.col("n"))).alias("na"),
            F.max(F.when(F.col("grp") == "A", F.col("k"))).alias("ka"),
            F.max(F.when(F.col("grp") == "B", F.col("n"))).alias("nb"),
            F.max(F.when(F.col("grp") == "B", F.col("k"))).alias("kb"),
            F.max(F.when(F.col("tgrp") == "A", F.col("nt"))).alias("nta"),
            F.max(F.when(F.col("tgrp") == "B", F.col("nt"))).alias("ntb"),
        )
    )
    return wide.selectExpr(
        "lang",
        "CAST(na * 1000000 DIV nta AS BIGINT) AS weight_a_ppm",
        "CAST(nb * 1000000 DIV ntb AS BIGINT) AS weight_b_ppm",
        "CAST(ka * 1000000 DIV na AS BIGINT) AS rate_a_ppm",
        "CAST(kb * 1000000 DIV nb AS BIGINT) AS rate_b_ppm",
        "CAST((na * 1000000 DIV nta)"
        " * ((ka * 1000000 DIV na) - (kb * 1000000 DIV nb))"
        " AS BIGINT) AS rate_effect_pp12",
        "CAST(((na * 1000000 DIV nta) - (nb * 1000000 DIV ntb))"
        " * (kb * 1000000 DIV nb) AS BIGINT)"
        " AS composition_effect_pp12",
    )


# ---------------------------------------------------------------------------
# q237: point-in-time-correct churn label generation
# ---------------------------------------------------------------------------

_CH_HORIZON_DAYS = 7  # churn = no activity within this many days AFTER d
_CH_LOOKBACK_DAYS = 7  # feature window strictly BEFORE (and including) d


@register(
    "q237_churn_labels",
    oracle=f"""
    WITH activity AS (
        SELECT DISTINCT user_id,
               CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
                   AS dayno
        FROM events
    ),
    daily AS (
        SELECT user_id,
               CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
                   AS dayno,
               CAST(count(*) AS BIGINT) AS n_events
        FROM events GROUP BY user_id, dayno
    ),
    labeled AS (
        SELECT a.user_id, a.dayno,
               LEAD(a.dayno) OVER (PARTITION BY a.user_id ORDER BY a.dayno)
                   AS next_day
        FROM activity a
    ),
    feat AS (
        SELECT d.user_id, d.dayno,
               CAST(SUM(d.n_events) OVER (PARTITION BY d.user_id ORDER BY d.dayno
                    RANGE BETWEEN {_CH_LOOKBACK_DAYS - 1} PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS events_7d,
               CAST(count(*) OVER (PARTITION BY d.user_id ORDER BY d.dayno
                    RANGE BETWEEN {_CH_LOOKBACK_DAYS - 1} PRECEDING AND CURRENT ROW)
                   AS BIGINT) AS active_days_7d
        FROM daily d
    ),
    maxday AS (
        SELECT CAST(MAX(dayno) AS BIGINT) AS mx FROM activity
    )
    SELECT l.user_id, l.dayno,
           f.events_7d, f.active_days_7d,
           CASE WHEN l.next_day IS NULL OR l.next_day - l.dayno > {_CH_HORIZON_DAYS}
                THEN 1 ELSE 0 END AS churned
    FROM labeled l
    JOIN feat f ON l.user_id = f.user_id AND l.dayno = f.dayno
    CROSS JOIN maxday m
    WHERE l.dayno + {_CH_HORIZON_DAYS} <= m.mx
    """,
)
def q237_churn_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Point-in-time-correct churn label generation — the step where most
    ML pipelines silently leak: for every (user, active day d), features
    come from the trailing {_CH_LOOKBACK_DAYS}-day window ENDING at d
    (events_7d, active_days_7d) and the label (churned = no activity in
    the following {_CH_HORIZON_DAYS} days) comes strictly from AFTER d —
    with the censoring guard that drops samples whose label horizon runs
    past the observed data (otherwise the last week would all be labeled
    churned by truncation, the classic right-censoring bug).

    Shape: one distinct-day aggregate, a LEAD window for the next active
    day, a RANGE-frame window for the trailing features (both share the
    user partitioning), and a 1-row max-day broadcast for the censor cut.
    """
    (events,) = tables(spark, sf_dir, "events")
    dayno = (F.unix_micros(F.date_trunc("day", "ts")) / 86_400_000_000).cast("bigint")
    daily = events.groupBy("user_id", dayno.alias("dayno")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_events")
    )
    w_lead = Window.partitionBy("user_id").orderBy("dayno")
    w_feat = (
        Window.partitionBy("user_id")
        .orderBy("dayno")
        .rangeBetween(-(_CH_LOOKBACK_DAYS - 1), 0)
    )
    labeled = daily.select(
        "user_id",
        "dayno",
        F.lead("dayno").over(w_lead).alias("next_day"),
        F.sum("n_events").over(w_feat).cast("bigint").alias("events_7d"),
        F.count(F.lit(1)).over(w_feat).cast("bigint").alias("active_days_7d"),
    )
    maxday = daily.agg(F.max("dayno").cast("bigint").alias("mx"))
    return (
        labeled.crossJoin(F.broadcast(maxday))
        .filter(F.col("dayno") + _CH_HORIZON_DAYS <= F.col("mx"))
        .select(
            "user_id",
            "dayno",
            "events_7d",
            "active_days_7d",
            F.when(
                F.col("next_day").isNull()
                | (F.col("next_day") - F.col("dayno") > _CH_HORIZON_DAYS),
                1,
            )
            .otherwise(0)
            .alias("churned"),
        )
    )


# ---------------------------------------------------------------------------
# q238: pre-tokenizer losslessness audit
# ---------------------------------------------------------------------------

_BPE_PATTERN_Q238 = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"


@register(
    "q238_tokenizer_lossless",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               array_to_string(regexp_extract_all(text, '{_BPE_PATTERN_Q238}'), '')
                   AS rejoined,
               replace(text, ' ', '') AS despaced
        FROM documents
    )
    SELECT lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(CASE WHEN rejoined = despaced THEN 1 ELSE 0 END) AS BIGINT)
               AS n_lossless,
           CAST(SUM(CASE WHEN rejoined = despaced THEN 0 ELSE 1 END) AS BIGINT)
               AS n_lossy
    FROM tok GROUP BY lang
    """,
)
def q238_tokenizer_lossless(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-tokenizer losslessness audit: re-joining q114's BPE-ish pieces
    must reproduce the document text (modulo the whitespace the pattern
    deliberately drops) — the invariant every tokenizer pipeline should
    assert before training, because a lossy pre-tokenizer silently
    deletes content from the corpus. Emits per-lang lossless/lossy
    counts; a nonzero lossy count localizes the pattern gap to a slice.

    One narrow scan — regex extract, string join, equality — with a
    per-lang rollup; the regex is the RE2-safe pattern shared verbatim
    with q114 and its oracle.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    tok = documents.select(
        "lang",
        F.array_join(
            F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN_Q238}', 0)"), ""
        ).alias("rejoined"),
        F.regexp_replace("text", " ", "").alias("despaced"),
    )
    return tok.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.when(F.col("rejoined") == F.col("despaced"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_lossless"),
        F.sum(F.when(F.col("rejoined") == F.col("despaced"), 0).otherwise(1))
        .cast("bigint")
        .alias("n_lossy"),
    )


# ---------------------------------------------------------------------------
# q239: dedup-decision transitivity audit (removed-rep chains)
# ---------------------------------------------------------------------------


def _q239_oracle() -> str:
    from .dedup import _MINHASH_DEDUP_SQL

    # reuse q52's CTE chain up to `verified`, then audit the rep mapping
    body = _MINHASH_DEDUP_SQL.split("SELECT w.lang")[0].rstrip().rstrip(",")
    return f"""{body},
    decisions AS (
        SELECT DISTINCT v.doc_id,
               (SELECT MIN(c2.rep_id) FROM cand c2
                JOIN w wa2 ON wa2.doc_id = c2.doc_id
                JOIN w wb2 ON wb2.doc_id = c2.rep_id
                WHERE c2.doc_id = v.doc_id
                  AND len(list_intersect(wa2.words, wb2.words))::DOUBLE
                      / len(list_distinct(wa2.words || wb2.words)) >= 0.95)
                   AS rep_id
        FROM verified v
    )
    SELECT CAST((SELECT count(*) FROM decisions) AS BIGINT) AS n_removed,
           CAST((SELECT count(*) FROM decisions d
                 WHERE d.rep_id IN (SELECT doc_id FROM decisions)) AS BIGINT)
               AS n_chained,
           CAST((SELECT count(*) FROM decisions d
                 WHERE d.rep_id NOT IN (SELECT doc_id FROM decisions)) AS BIGINT)
               AS n_direct
    """


@register("q239_dedup_chain_audit", oracle=_q239_oracle())
def q239_dedup_chain_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-decision transitivity audit: of the documents q52 removes,
    how many were judged against a representative that was ITSELF removed
    (a chain — the survivor set then depends on evaluation order and the
    advertised 'kept' doc may be gone) vs against a surviving doc. A
    nonzero chained count is the signal to run q96's connected components
    for cluster-canonical reps instead of single-round bucket reps — this
    query measures exactly how much that upgrade matters on a corpus.

    Shape: re-derives q52's verified (doc, rep) decisions (banded
    candidates + Jaccard verify, linear), takes each doc's MIN surviving
    rep, and probes the removed set with one LEFT SEMI-style membership
    join — decision-table-scale, not corpus-scale.
    """
    from .dedup import (
        _band_exprs_spark,
        _minhash_sig_spark,
        _word_hashes_spark,
        _WORDS_SPARK,
        _THRESHOLD,
    )
    from pyspark import StorageLevel

    (documents,) = tables(spark, sf_dir, "documents")
    w = documents.select("doc_id", _WORDS_SPARK().alias("words")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hs = w.select("doc_id", "words", _word_hashes_spark(F.col("words")).alias("hashes"))
    sigs = hs.select(
        "doc_id", F.array(*_minhash_sig_spark(F.col("hashes"))).alias("signature")
    )
    bands = sigs.select(
        "doc_id", F.explode(F.array(*_band_exprs_spark())).alias("band_key")
    )
    reps = bands.groupBy("band_key").agg(F.min("doc_id").alias("rep_id"))
    cand = (
        bands.join(reps, "band_key")
        .filter(F.col("doc_id") > F.col("rep_id"))
        .select("doc_id", "rep_id")
        .distinct()
    )
    wa = w.select(F.col("doc_id"), F.col("words").alias("words_a"))
    wb = w.select(F.col("doc_id").alias("rep_id"), F.col("words").alias("words_b"))
    verified = (
        cand.join(wa, "doc_id")
        .join(wb, "rep_id")
        .filter(
            F.size(F.array_intersect("words_a", "words_b")).cast("double")
            / F.size(F.array_union("words_a", "words_b"))
            >= _THRESHOLD
        )
        .select("doc_id", "rep_id")
    )
    # decisions feeds both the membership set and the audit join — persist
    # the tiny table or the whole band+verify pipeline executes twice
    decisions = (
        verified.groupBy("doc_id")
        .agg(F.min("rep_id").alias("rep_id"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    removed_ids = decisions.select(F.col("doc_id").alias("rid"))
    chained = (
        decisions.join(
            F.broadcast(removed_ids), decisions.rep_id == removed_ids.rid, "left"
        )
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_removed"),
            F.sum(F.when(F.col("rid").isNotNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_chained"),
            F.sum(F.when(F.col("rid").isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias("n_direct"),
        )
    )
    return chained


# ---------------------------------------------------------------------------
# q240: Kinesis shard rebalance planning (split/merge from measured traffic)
# ---------------------------------------------------------------------------

_SHARD_N = 8  # current shard count (hash-space buckets)


@register(
    "q240_shard_rebalance_plan",
    oracle=f"""
    WITH routed AS (
        SELECT CAST(('0x' || substr(md5('shard#' || CAST(user_id AS VARCHAR)),
                    1, 15)) AS BIGINT) % {_SHARD_N} AS shard,
               count(*) AS n
        FROM events GROUP BY 1
    ),
    tot AS (SELECT CAST(SUM(n) AS BIGINT) AS t FROM routed)
    SELECT shard,
           CAST(n AS BIGINT) AS n_records,
           CAST(n * 1000000 // t AS BIGINT) AS share_ppm,
           CASE WHEN n * {_SHARD_N} > 2 * t THEN 'split'
                WHEN n * {_SHARD_N} * 2 < t THEN 'merge_candidate'
                ELSE 'ok' END AS action
    FROM routed, tot
    """,
)
def q240_shard_rebalance_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kinesis shard rebalance planning from measured traffic: route each
    event to its shard by the MD5 hash-space rule (the consumer-side dual
    of the reference's midpoint routing, KinesisWriter.scala:53-56),
    measure per-shard share, and flag shards carrying over 2x the fair
    share for SPLIT and under half for MERGE — the resharding decision
    q170's capacity math sizes and the kinesis_stream reader's
    SHARD_END/parent-child logic then has to consume.

    One counting aggregate on the shard key + a 1-row total broadcast;
    the thresholds are integer cross-multiplications (n·S vs 2·t), no
    rate floats. At 100 TB this runs per monitoring window over the
    ingest metrics stream — same plan, windowed input.
    """
    (events,) = tables(spark, sf_dir, "events")
    routed = events.groupBy(
        (md5_60bit(F.col("user_id").cast("string"), salt="shard") % _SHARD_N).alias(
            "shard"
        )
    ).agg(F.count(F.lit(1)).alias("n"))
    tot = routed.agg(F.sum("n").cast("bigint").alias("t"))
    return routed.crossJoin(F.broadcast(tot)).select(
        "shard",
        F.col("n").cast("bigint").alias("n_records"),
        F.expr("CAST(n * 1000000 DIV t AS BIGINT)").alias("share_ppm"),
        F.when(F.col("n") * _SHARD_N > 2 * F.col("t"), "split")
        .when(F.col("n") * _SHARD_N * 2 < F.col("t"), "merge_candidate")
        .otherwise("ok")
        .alias("action"),
    )


# ---------------------------------------------------------------------------
# q241: partition-column advice (expected pruning benefit per candidate)
# ---------------------------------------------------------------------------

#: candidate partition keys: (name, engine-neutral SQL over orders)
_PART_CANDS = [
    ("orderpriority", "o_orderpriority"),
    ("orderstatus", "o_orderstatus"),
    ("order_month", "CAST(year(o_orderdate) * 100 + month(o_orderdate) AS BIGINT)"),
    ("cust_bucket16", "o_custkey % 16"),
]


@register(
    "q241_partition_advice",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{name}' AS candidate,
           CAST(count(*) AS BIGINT) AS n_values,
           CAST(SUM(c * c) * 1000000 // (SUM(c) * SUM(c)) AS BIGINT)
               AS expected_scan_ppm,
           CAST(MAX(c) * count(*) * 1000000 // SUM(c) AS BIGINT)
               AS max_skew_ppm
    FROM (SELECT {expr} AS v, CAST(count(*) AS BIGINT) AS c
          FROM orders GROUP BY 1)"""
        for name, expr in _PART_CANDS
    ),
)
def q241_partition_advice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partition-column advice: for each candidate partition key, the
    EXPECTED fraction of the table a value-weighted point query scans —
    Σ(n_v/n)², the Simpson index: the probability two random rows share
    the partition, i.e. the average pruning dividend — plus the largest
    partition's skew vs fair share (a 2x-skewed partition is the straggler
    at write AND read time). Low expected-scan with low skew wins; this
    is the measurement behind choosing `partitionBy` for a 100 TB layout,
    complementing q194 (Z-order within files) and q196 (sizing).

    Integer discipline: Σc²·1e6 / (Σc)² stays in BIGINT at fixture scale
    and cross-multiplies exactly; per-candidate stats compute on that
    candidate's value-cardinality table (one map-side-combined aggregate
    per candidate, unioned into the 4-row report).
    """
    (orders,) = tables(spark, sf_dir, "orders")
    parts = []
    for name, expr in _PART_CANDS:
        vals = orders.groupBy(F.expr(expr).alias("v")).agg(
            F.count(F.lit(1)).cast("bigint").alias("c")
        )
        parts.append(
            vals.agg(
                F.lit(name).alias("candidate"),
                F.count(F.lit(1)).cast("bigint").alias("n_values"),
                F.expr(
                    "CAST(SUM(c * c) * 1000000 DIV (SUM(c) * SUM(c)) AS BIGINT)"
                ).alias("expected_scan_ppm"),
                F.expr(
                    "CAST(MAX(c) * COUNT(*) * 1000000 DIV SUM(c) AS BIGINT)"
                ).alias("max_skew_ppm"),
            )
        )
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


# ---------------------------------------------------------------------------
# q242: time-to-convert percentiles (first view -> first purchase)
# ---------------------------------------------------------------------------


@register(
    "q242_time_to_convert",
    oracle="""
    WITH firsts AS (
        SELECT user_id,
               MIN(CASE WHEN event_type = 'view' THEN epoch_us(ts) END) AS v_us,
               MIN(CASE WHEN event_type = 'purchase' THEN epoch_us(ts) END)
                   AS p_us
        FROM events GROUP BY user_id
    ),
    durations AS (
        SELECT user_id, CAST((p_us - v_us) // 1000000 AS BIGINT) AS sec
        FROM firsts
        WHERE v_us IS NOT NULL AND p_us IS NOT NULL AND p_us > v_us
    ),
    ranked AS (
        SELECT sec, row_number() OVER (ORDER BY sec, user_id) AS rn,
               count(*) OVER () AS n
        FROM durations
    )
    SELECT (SELECT CAST(MAX(n) AS BIGINT) FROM ranked) AS n_converters,
           (SELECT sec FROM ranked WHERE rn = (n + 9) // 10) AS p10_sec,
           (SELECT sec FROM ranked WHERE rn = (n + 1) // 2) AS p50_sec,
           (SELECT sec FROM ranked WHERE rn = (9 * n + 9) // 10) AS p90_sec
    """,
)
def q242_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-to-convert distribution: seconds from a user's FIRST view to
    their FIRST purchase (converters only, purchase after view), reported
    as exact p10/p50/p90 — the latency-of-intent metric funnels (q110)
    and attribution (q171/q218) don't give you: not whether users
    convert, but how long conversion takes.

    Shape: one conditional-MIN aggregate per user (map-side combined)
    collapses the fact table to converter cardinality; the exact
    percentile ranks run over that collapsed table (q209's rank rule,
    integer ceil indices, user_id tie-break). At 100 TB the percentile
    pass swaps for the q136-gated approx sketch; the firsts aggregate is
    already the scalable shape.
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    firsts = events.groupBy("user_id").agg(
        F.min(F.when(F.col("event_type") == "view", us)).alias("v_us"),
        F.min(F.when(F.col("event_type") == "purchase", us)).alias("p_us"),
    )
    durations = firsts.filter(
        F.col("v_us").isNotNull()
        & F.col("p_us").isNotNull()
        & (F.col("p_us") > F.col("v_us"))
    ).select(
        "user_id",
        F.expr("CAST((p_us - v_us) DIV 1000000 AS BIGINT)").alias("sec"),
    )
    w_rank = Window.orderBy("sec", "user_id")
    ranked = durations.withColumn("rn", F.row_number().over(w_rank)).withColumn(
        "n", F.count(F.lit(1)).over(Window.partitionBy())
    )
    return ranked.agg(
        F.max("n").cast("bigint").alias("n_converters"),
        F.max(F.when(F.col("rn") == F.expr("(n + 9) DIV 10"), F.col("sec"))).alias(
            "p10_sec"
        ),
        F.max(F.when(F.col("rn") == F.expr("(n + 1) DIV 2"), F.col("sec"))).alias(
            "p50_sec"
        ),
        F.max(
            F.when(F.col("rn") == F.expr("(9 * n + 9) DIV 10"), F.col("sec"))
        ).alias("p90_sec"),
    )


# ---------------------------------------------------------------------------
# q243: net training tokens after near-dedup (budget accounting)
# ---------------------------------------------------------------------------


def _q243_oracle() -> str:
    from .dedup import _MINHASH_DEDUP_SQL

    body = _MINHASH_DEDUP_SQL.split("SELECT w.lang")[0].rstrip().rstrip(",")
    return f"""{body},
    toks AS (
        SELECT doc_id, lang,
               CAST(len(string_split(text, ' ')) AS BIGINT) AS n_tok
        FROM documents
    )
    SELECT t.lang,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(SUM(t.n_tok) AS BIGINT) AS raw_tokens,
           CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE t.n_tok END) AS BIGINT)
               AS removed_tokens,
           CAST(SUM(CASE WHEN r.doc_id IS NULL THEN t.n_tok ELSE 0 END) AS BIGINT)
               AS net_tokens,
           CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE t.n_tok END) * 1000000
                // SUM(t.n_tok) AS BIGINT) AS savings_ppm
    FROM toks t LEFT JOIN removed r ON t.doc_id = r.doc_id
    GROUP BY t.lang
    """


@register("q243_net_training_tokens", oracle=_q243_oracle())
def q243_net_training_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Net training tokens after near-dedup — the accounting bridge between
    dedup (q52) and the token-budget planners (q200/q212): per language,
    raw token volume, tokens removed by the MinHash near-dup decisions,
    the NET tokens a training run will actually see, and the savings rate.
    Budgets allocated on raw counts over-promise exactly this delta.

    Shape: the removed set comes from q52's identical machinery (banded
    candidates + rep verify — linear), and the accounting is one
    token-count projection joined LEFT to that decision set plus a lang
    rollup. At 100 TB the removed set is a by-product of the dedup job
    itself; this query is then a pure join + aggregate over persisted
    outputs.
    """
    from pyspark import StorageLevel

    from .dedup import (
        _band_exprs_spark,
        _minhash_sig_spark,
        _word_hashes_spark,
        _WORDS_SPARK,
        _THRESHOLD,
    )

    (documents,) = tables(spark, sf_dir, "documents")
    w = documents.select("doc_id", "lang", _WORDS_SPARK().alias("words")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hs = w.select("doc_id", "words", _word_hashes_spark(F.col("words")).alias("hashes"))
    sigs = hs.select(
        "doc_id", F.array(*_minhash_sig_spark(F.col("hashes"))).alias("signature")
    )
    bands = sigs.select(
        "doc_id", F.explode(F.array(*_band_exprs_spark())).alias("band_key")
    )
    reps = bands.groupBy("band_key").agg(F.min("doc_id").alias("rep_id"))
    cand = (
        bands.join(reps, "band_key")
        .filter(F.col("doc_id") > F.col("rep_id"))
        .select("doc_id", "rep_id")
        .distinct()
    )
    wa = w.select(F.col("doc_id"), F.col("words").alias("words_a"))
    wb = w.select(F.col("doc_id").alias("rep_id"), F.col("words").alias("words_b"))
    removed = (
        cand.join(wa, "doc_id")
        .join(wb, "rep_id")
        .filter(
            F.size(F.array_intersect("words_a", "words_b")).cast("double")
            / F.size(F.array_union("words_a", "words_b"))
            >= _THRESHOLD
        )
        .select("doc_id")
        .distinct()
        .withColumn("is_removed", F.lit(1))
    )
    toks = documents.select(
        "doc_id", "lang", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    return (
        toks.join(removed, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_docs"),
            F.sum("n_tok").cast("bigint").alias("raw_tokens"),
            F.sum(F.when(F.col("is_removed").isNull(), 0).otherwise(F.col("n_tok")))
            .cast("bigint")
            .alias("removed_tokens"),
            F.sum(F.when(F.col("is_removed").isNull(), F.col("n_tok")).otherwise(0))
            .cast("bigint")
            .alias("net_tokens"),
            F.expr(
                "CAST(SUM(CASE WHEN is_removed IS NULL THEN 0 ELSE n_tok END)"
                " * 1000000 DIV SUM(n_tok) AS BIGINT)"
            ).alias("savings_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# q244: curation pipeline v3 — batch-4 stages composed into one lazy plan
# ---------------------------------------------------------------------------

_V3_BOILER_MAX_PPM = 500_000  # drop docs with > 50% boilerplate shingles


@register(
    "q244_curation_pipeline_v3",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws
               FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substr(md5(tok5), 1, 15)) AS BIGINT) AS tok
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ws) - 4),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                            || ' ' || ws[i+3] || ' ' || ws[i+4])) AS tok5
            FROM w
        )
    ),
    shdf AS (
        SELECT doc_id, tok,
               count(*) OVER (PARTITION BY tok) AS df
        FROM sh
    ),
    boiler AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000
                    // count(*) AS BIGINT) AS boiler_ppm
        FROM shdf GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id, lang, source,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i+1])) AS b
        FROM w
    ),
    counted AS (
        SELECT doc_id, lang, source,
               count(*) OVER (PARTITION BY lang, b) AS cb
        FROM bg
    ),
    scored AS (
        SELECT doc_id, lang, source,
               CAST(SUM(1000000000 // cb) // count(*) AS BIGINT) AS rarity
        FROM counted GROUP BY doc_id, lang, source
    ),
    ranked AS (
        SELECT lang, source, doc_id, rarity,
               row_number() OVER (PARTITION BY lang, source
                                  ORDER BY rarity, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang, source) AS n
        FROM scored
    ),
    gated AS (
        SELECT lang, source, doc_id, rarity,
               MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN rarity END)
                   OVER (PARTITION BY lang, source) AS p90
        FROM ranked
    ),
    kept AS (
        SELECT g.lang, g.source, g.doc_id,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
               CASE WHEN CAST(('0x' || substr(md5('split#'
                    || CAST(g.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8
                    THEN 1 ELSE 0 END AS is_train
        FROM gated g
        JOIN documents d ON g.doc_id = d.doc_id
        LEFT JOIN boiler bl ON g.doc_id = bl.doc_id
        WHERE COALESCE(bl.boiler_ppm, 0) < {_V3_BOILER_MAX_PPM}
          AND g.rarity <= g.p90
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS kept_tokens,
           CAST(SUM(is_train) AS BIGINT) AS n_train,
           CAST(SUM(1 - is_train) AS BIGINT) AS n_test
    FROM kept GROUP BY lang, source
    """,
)
def q244_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v3 — the batch-4 stages composed into ONE lazy
    plan the optimizer sees whole: boilerplate gate (q205's window-df
    signal, drop docs over 50% repeated shingles) → adaptive rarity gate
    (q213's per-slice p90, window-chained) → consistent-hash 80/20 split
    (q216's rule) → per-slice kept-doc/token/fold accounting. This is
    what a real corpus refresh runs nightly; composing it as one
    DataFrame means Catalyst shares the scan, pipelines the two explode
    lineages independently, and no intermediate ever hits storage.

    Each stage keeps its standalone query's exact semantics (same
    thresholds, same hashes), so this composition is regression-checked
    against the same oracles' logic end to end.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.withColumn("ws", F.split("text", " "))

    # stage 1: boilerplate ppm per doc (q205 lineage)
    sh5 = F.expr(
        """
        CASE WHEN size(ws) >= 5 THEN
            array_distinct(transform(sequence(0, size(ws) - 5),
                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4])))
        ELSE array() END
        """
    )
    tok = docs.select("doc_id", F.explode(sh5).alias("tok5")).select(
        "doc_id", md5_60bit(F.col("tok5")).alias("tok")
    )
    tok_df = tok.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
    boiler = tok_df.groupBy("doc_id").agg(
        F.expr(
            "CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("boiler_ppm")
    )

    # stage 2: rarity + per-slice p90 (q213 lineage, window-chained)
    pairs = F.zip_with(
        F.slice(F.col("ws"), 1, F.size("ws") - 1),
        F.slice(F.col("ws"), 2, F.size("ws") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = docs.select("doc_id", "lang", "source", F.explode(pairs).alias("b"))
    counted = bg.withColumn(
        "cb", F.count(F.lit(1)).over(Window.partitionBy("lang", "b"))
    )
    scored = counted.groupBy("doc_id", "lang", "source").agg(
        F.expr("CAST(SUM(1000000000 DIV cb) DIV COUNT(*) AS BIGINT)").alias("rarity")
    )
    w_slice = Window.partitionBy("lang", "source").orderBy("rarity", "doc_id")
    w_flat = Window.partitionBy("lang", "source")
    gated = (
        scored.withColumn("rn", F.row_number().over(w_slice))
        .withColumn("n", F.count(F.lit(1)).over(w_flat))
        .withColumn(
            "p90",
            F.max(
                F.when(F.col("rn") == F.expr("(9 * n + 9) DIV 10"), F.col("rarity"))
            ).over(w_flat),
        )
    )

    # stage 3: gate + split + accounting
    toks = documents.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    kept = (
        gated.join(boiler, "doc_id", "left")
        .filter(
            (F.coalesce("boiler_ppm", F.lit(0)) < _V3_BOILER_MAX_PPM)
            & (F.col("rarity") <= F.col("p90"))
        )
        .join(toks, "doc_id")
        .withColumn(
            "is_train",
            F.when(
                md5_60bit(F.col("doc_id").cast("string"), salt="split") % 10 < 8, 1
            ).otherwise(0),
        )
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("kept_tokens"),
        F.sum("is_train").cast("bigint").alias("n_train"),
        F.sum(1 - F.col("is_train")).cast("bigint").alias("n_test"),
    )


# ---------------------------------------------------------------------------
# q245: pooled-vector retrieval, contrasted with late interaction (q226)
# ---------------------------------------------------------------------------


@register(
    "q245_pooled_retrieval",
    oracle=f"""
    WITH q AS (
        SELECT vec_id // {_MS_VPD} AS doc, vec_id % {_MS_VPD} AS pos,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings
    ),
    pooled AS (
        SELECT doc,
               list_transform(range(1, 65),
                   i -> CAST(list_sum(list_transform(vecs, v -> v[i]))
                             // {_MS_VPD} AS BIGINT)) AS pv
        FROM (SELECT doc, list(qv ORDER BY pos) AS vecs FROM q GROUP BY doc)
    ),
    qdoc AS (SELECT pv AS qp FROM pooled WHERE doc = 0),
    scored AS (
        SELECT p.doc,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> p.pv[i] * qd.qp[i])) AS BIGINT) AS pooled_dot
        FROM pooled p, qdoc qd WHERE p.doc <> 0
        ORDER BY pooled_dot DESC, p.doc LIMIT {_MS_TOP}
    ),
    maxsim AS (
        SELECT d.doc, q2.qpos,
               MAX(CAST(list_sum(list_transform(range(1, 65),
                   i -> d.qv[i] * q2.qv[i])) AS BIGINT)) AS best
        FROM (SELECT doc, qv FROM q WHERE doc <> 0) d,
             (SELECT pos AS qpos, qv FROM q WHERE doc = 0) q2
        GROUP BY d.doc, q2.qpos
    ),
    maxsim_top AS (
        SELECT doc FROM (
            SELECT doc, CAST(SUM(best) AS BIGINT) AS s FROM maxsim GROUP BY doc
            ORDER BY s DESC, doc LIMIT {_MS_TOP}
        )
    )
    SELECT s.doc, s.pooled_dot,
           (s.doc IN (SELECT doc FROM maxsim_top)) AS also_in_maxsim_top
    FROM scored s
    """,
)
def q245_pooled_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled retrieval over the same multi-vector pseudo-docs as
    q226, with a per-result flag for whether the doc ALSO appears in the
    late-interaction (MaxSim) top-{_MS_TOP} — the side-by-side that shows
    what pooling loses: a single mean vector per doc is {_MS_VPD}x
    cheaper to index and probe, and the overlap flags quantify the
    ranking disagreement on this corpus. Pooling is integer throughout
    (per-dim sum DIV {_MS_VPD} on quantized vectors).

    Shape: pooling is one groupBy collecting {_MS_VPD} vectors per doc
    (bounded arrays); scoring is a 1-row query-vector broadcast + one
    TakeOrdered; the MaxSim reference list reuses q226's aggregation
    shape and meets the pooled list in a tiny top-{_MS_TOP} semi-probe.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    doc = F.expr(f"vec_id DIV {_MS_VPD}")
    q = embeddings.select(
        doc.alias("doc"), (F.col("vec_id") % _MS_VPD).alias("pos"), quant.alias("qv")
    )
    pooled = (
        q.groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "qv"))).alias("vecs"))
        .select(
            "doc",
            F.expr(
                f"transform(sequence(1, 64), i -> CAST(aggregate(vecs, 0L,"
                f" (acc, v) -> acc + v.qv[i - 1]) DIV {_MS_VPD} AS BIGINT))"
            ).alias("pv"),
        )
    )
    qdoc = pooled.filter(F.col("doc") == 0).select(F.col("pv").alias("qp"))
    zero = F.lit(0).cast("bigint")
    scored = (
        pooled.filter(F.col("doc") != 0)
        .crossJoin(F.broadcast(qdoc))
        .select(
            "doc",
            F.aggregate(
                F.zip_with("pv", "qp", lambda a, b: a * b), zero, lambda a, v: a + v
            ).alias("pooled_dot"),
        )
        .orderBy(F.col("pooled_dot").desc(), "doc")
        .limit(_MS_TOP)
    )
    # MaxSim reference list (q226's shape)
    qvecs = q.filter(F.col("doc") == 0).select(
        F.col("pos").alias("qpos"), F.col("qv").alias("qqv")
    )
    dvecs = q.filter(F.col("doc") != 0).select("doc", "qv")
    dot = F.aggregate(
        F.zip_with("qv", "qqv", lambda a, b: a * b), zero, lambda a, v: a + v
    )
    maxsim_top = (
        dvecs.crossJoin(F.broadcast(qvecs))
        .select("doc", "qpos", dot.alias("s"))
        .groupBy("doc", "qpos")
        .agg(F.max("s").alias("best"))
        .groupBy("doc")
        .agg(F.sum("best").alias("s"))
        .orderBy(F.col("s").desc(), "doc")
        .limit(_MS_TOP)
        .select(F.col("doc").alias("mdoc"))
    )
    return (
        scored.join(F.broadcast(maxsim_top), scored.doc == maxsim_top.mdoc, "left")
        .select(
            "doc",
            "pooled_dot",
            F.col("mdoc").isNotNull().alias("also_in_maxsim_top"),
        )
    )


# ---------------------------------------------------------------------------
# q246: cross-engine table integrity manifest (migration checksums)
# ---------------------------------------------------------------------------

_MANIFEST_TABLES = ["region", "nation", "customer", "orders"]
_MANIFEST_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "orders": "o_orderkey",
}
_CKS_MOD = 1_000_000_007


@register(
    "q246_integrity_manifest",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{t}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(MIN({k}) AS BIGINT) AS min_key,
           CAST(MAX({k}) AS BIGINT) AS max_key,
           CAST(SUM(CAST(('0x' || substr(md5('cks#' || CAST({k} AS VARCHAR)),
                1, 15)) AS BIGINT) % {_CKS_MOD}) % {_CKS_MOD} AS BIGINT)
               AS key_checksum
    FROM {t}"""
        for t, k in _MANIFEST_KEYS.items()
    ),
)
def q246_integrity_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine table integrity manifest: per table, row count, key
    range, and an ORDER-INDEPENDENT key checksum (sum of salted 60-bit
    hashes mod a prime) — the artifact you publish before and after a
    migration/engine swap so 'same data' is a checkable claim rather than
    a hope. The checksum is partition-order-invariant by construction
    (modular addition commutes), so any engine, any parallelism, any
    file layout produces the same manifest — exactly the property this
    repo's whole oracle gate is built on, packaged as a first-class op.

    One map-side-combined aggregate per table, 4-row output.
    """
    out = None
    for t, k in _MANIFEST_KEYS.items():
        (tbl,) = tables(spark, sf_dir, t)
        row = tbl.agg(
            F.lit(t).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(k).cast("bigint").alias("min_key"),
            F.max(k).cast("bigint").alias("max_key"),
            (
                F.sum(
                    md5_60bit(F.col(k).cast("string"), salt="cks") % _CKS_MOD
                )
                % _CKS_MOD
            )
            .cast("bigint")
            .alias("key_checksum"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# q247: Bloom-filter join prefilter, built and probed cross-engine in SQL
# ---------------------------------------------------------------------------

_BLOOM_WORDS = 64  # 64 words x 60 bits = 3840-bit filter
_BLOOM_BITS = _BLOOM_WORDS * 60
_BLOOM_K = 3  # hash functions
_BLOOM_PRICE = 350_000  # build side: custkeys of orders above this total


def _q247_oracle() -> str:
    from ..functions.hashing import duckdb_md5_60bit

    def pos(salt: str, col: str) -> str:
        return f"{duckdb_md5_60bit(f'CAST({col} AS VARCHAR)', salt=salt)} % {_BLOOM_BITS}"

    build_bits = " UNION ALL ".join(
        f"SELECT ({pos(f'b{j}', 'k')}) AS p FROM keys" for j in range(_BLOOM_K)
    )
    probe_checks = " AND ".join(
        f"""COALESCE((SELECT (w.bits & (CAST(1 AS BIGINT)
            << (({pos(f'b{j}', 'c.c_custkey')}) % 60))) <> 0
            FROM bloom w
            WHERE w.word = ({pos(f'b{j}', 'c.c_custkey')}) // 60), FALSE)"""
        for j in range(_BLOOM_K)
    )
    return f"""
    WITH keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_totalprice > {_BLOOM_PRICE}
    ),
    positions AS ({build_bits}),
    bloom AS (
        SELECT p // 60 AS word,
               CAST(bit_or(CAST(1 AS BIGINT) << (p % 60)) AS BIGINT) AS bits
        FROM positions GROUP BY p // 60
    ),
    probed AS (
        SELECT c.c_custkey,
               ({probe_checks}) AS bloom_pass,
               c.c_custkey IN (SELECT k FROM keys) AS true_match
        FROM customer c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN true_match THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_match,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_pass,
           CAST(SUM(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_positive,
           CAST(SUM(CASE WHEN true_match AND NOT bloom_pass THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_negative,
           CAST(SUM(CASE WHEN NOT bloom_pass THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS pruned_ppm
    FROM probed
    """


@register("q247_bloom_prefilter", oracle=_q247_oracle())
def q247_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Bloom filter built and probed entirely in SQL, cross-engine
    bit-exact: the distinct custkeys of high-value orders hash into a
    {_BLOOM_BITS}-bit filter ({_BLOOM_WORDS} BIGINT words via bit_or,
    {_BLOOM_K} salted-MD5 hash functions), every customer row probes all
    {_BLOOM_K} bits, and the report scores it against the exact semi-join:
    true matches, bloom passes, false positives (bounded by design), the
    structurally-impossible false negatives (must be 0 — the oracle hash
    gate enforces the Bloom guarantee), and the pruned fraction.

    This is THE 100 TB join-prefilter shape: the {_BLOOM_WORDS}-row
    filter table broadcasts where the build-side key set would not, and
    the probe side prunes before the shuffle — what Spark's runtime
    bloom-filter join does internally, here as an explicit, measurable
    operator. Everything is integer bit arithmetic on 60-bit hash
    positions; no engine-native (non-portable) bloom primitive is used.
    """
    (orders, customer) = tables(spark, sf_dir, "orders", "customer")
    keys = (
        orders.filter(F.col("o_totalprice") > _BLOOM_PRICE)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )

    def pos(salt: str, col) -> F.Column:
        return md5_60bit(col.cast("string"), salt=salt) % _BLOOM_BITS

    positions = None
    for j in range(_BLOOM_K):
        p = keys.select(pos(f"b{j}", F.col("k")).alias("p"))
        positions = p if positions is None else positions.unionByName(p)
    bloom = positions.groupBy(F.expr("p DIV 60").alias("word")).agg(
        F.expr("CAST(bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 60 AS INT))) AS BIGINT)").alias(
            "bits"
        )
    )
    probe = customer.select("c_custkey")
    for j in range(_BLOOM_K):
        pj = pos(f"b{j}", F.col("c_custkey"))
        probe = probe.withColumn(
            f"w{j}", F.floor(pj / 60).cast("bigint")
        ).withColumn(f"bit{j}", pj % 60)
    # join the tiny bloom table once per hash function (broadcast)
    passed = probe
    for j in range(_BLOOM_K):
        b = bloom.select(
            F.col("word").alias(f"bw{j}"), F.col("bits").alias(f"bits{j}")
        )
        passed = passed.join(
            F.broadcast(b), passed[f"w{j}"] == b[f"bw{j}"], "left"
        ).withColumn(
            f"pass{j}",
            F.coalesce(
                F.expr(
                    f"(bits{j} & shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(bit{j} AS INT))) <> 0"
                ),
                F.lit(False),
            ),
        )
    truth = keys.withColumn("is_true", F.lit(1))
    scored = (
        passed.join(truth, passed.c_custkey == truth.k, "left")
        .withColumn(
            "bloom_pass",
            F.expr(" AND ".join(f"pass{j}" for j in range(_BLOOM_K))),
        )
        .withColumn("true_match", F.col("is_true").isNotNull())
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("true_match"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_match"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("true_match"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_positive"),
        F.sum(F.when(F.col("true_match") & ~F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_negative"),
        F.expr(
            "CAST(SUM(CASE WHEN NOT bloom_pass THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("pruned_ppm"),
    )


# ---------------------------------------------------------------------------
# q248: exponential-smoothing forecast (alpha = 1/2, exact integer weights)
# ---------------------------------------------------------------------------


@register(
    "q248_exp_smoothing",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
                   AS dayno,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY event_type, dayno
    ),
    idx AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY dayno) AS t,
               count(*) OVER (PARTITION BY event_type) AS n,
               MAX(dayno) OVER (PARTITION BY event_type) AS last_day
        FROM daily
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(MAX(CASE WHEN t = n THEN cents END) AS BIGINT) AS last_cents,
           -- alpha=1/2 smoothing: weight of day t is 2^(t-1) / (2^n - 1),
           -- evaluated exactly in integers (t caps at 62 to stay in BIGINT)
           CAST(SUM(cents * (CAST(1 AS BIGINT) << (LEAST(t, 62) - 1)))
                // ((CAST(1 AS BIGINT) << LEAST(MAX(n), 62)) - 1) AS BIGINT)
               AS forecast_cents
    FROM idx GROUP BY event_type
    """,
)
def q248_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-smoothing forecast of tomorrow's per-type daily revenue:
    alpha = 1/2 smoothing written in CLOSED FORM — day t (1 = oldest, n =
    newest) carries weight 2^(t-1)/(2^n − 1), so the 'recursive' smoother
    becomes one weighted sum with EXACT integer weights (powers of two)
    and one exact integer division. No float ever enters, so the forecast
    is bit-identical cross-engine — the trick that makes a forecasting
    primitive oracle-checkable at all. Horizon capped at 62 days of
    lookback (the BIGINT shift bound; older days carry < 2^-62 weight —
    literally sub-ulp — so the cap loses nothing).

    Shape: one (type, day) rollup (map-side combined), one per-type
    window for day indices, one weighted aggregate — all sharing the
    type partitioning. 5-row output.
    """
    (events,) = tables(spark, sf_dir, "events")
    dayno = (F.unix_micros(F.date_trunc("day", "ts")) / 86_400_000_000).cast("bigint")
    daily = events.groupBy("event_type", dayno.alias("dayno")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents")
    )
    w_t = Window.partitionBy("event_type").orderBy("dayno")
    w_all = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "cents",
        F.row_number().over(w_t).alias("t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    return idx.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.max(F.when(F.col("t") == F.col("n"), F.col("cents")))
        .cast("bigint")
        .alias("last_cents"),
        F.expr(
            "CAST(SUM(cents * shiftleft(CAST(1 AS BIGINT),"
            " CAST(LEAST(t, 62) AS INT) - 1))"
            " DIV (shiftleft(CAST(1 AS BIGINT), CAST(LEAST(MAX(n), 62) AS INT)) - 1)"
            " AS BIGINT)"
        ).alias("forecast_cents"),
    )


# ---------------------------------------------------------------------------
# q249: day-of-week seasonal indices (the multiplicative companion of q248)
# ---------------------------------------------------------------------------


@register(
    "q249_seasonal_index",
    oracle="""
    WITH rev AS (
        SELECT event_type,
               CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    per_dow AS (
        SELECT event_type, dow,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS c
        FROM rev GROUP BY event_type, dow
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(c) AS BIGINT) AS ct
        FROM per_dow GROUP BY event_type
    )
    SELECT p.event_type, p.dow, p.n, p.c,
           CAST(p.c * t.nt * 1000000 // (p.n * t.ct) AS BIGINT)
               AS seasonal_index_ppm
    FROM per_dow p JOIN tot t ON p.event_type = t.event_type
    """,
)
def q249_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices per event type: the ratio of that
    weekday's average revenue to the overall average, in ppm — the
    multiplicative seasonal component that q248's level forecast
    multiplies by (classical decomposition, the 'Mondays run 12% hot'
    table). The ratio-of-averages is one integer cross-multiplication —
    c·n_total·1e6 / (n·c_total) — so no float average ever forms.

    Shape: one (type, dow) aggregate; totals are a 5-row rollup of that
    aggregate joined back on the type key. Numbering note: Spark's
    dayofweek is 1=Sunday..7=Saturday while DuckDB's is 0-based — the
    oracle adds 1 to line them up.
    """
    (events,) = tables(spark, sf_dir, "events")
    rev = events.select(
        "event_type",
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    per_dow = rev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("c"),
    )
    tot = per_dow.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("nt"), F.sum("c").cast("bigint").alias("ct")
    )
    return per_dow.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n",
        "c",
        F.expr("CAST(c * nt * 1000000 DIV (n * ct) AS BIGINT)").alias(
            "seasonal_index_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# q250: topline-delta contribution analysis (which slice moved the metric)
# ---------------------------------------------------------------------------

_CONTRIB_SPLIT_DAY = 15  # first half: day-of-month < 15


@register(
    "q250_delta_contribution",
    oracle=f"""
    WITH rev AS (
        SELECT event_type,
               CASE WHEN CAST(strftime(ts, '%d') AS BIGINT) < {_CONTRIB_SPLIT_DAY}
                    THEN 0 ELSE 1 END AS half,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    cells AS (
        SELECT event_type, half, CAST(SUM(cents) AS BIGINT) AS c
        FROM rev GROUP BY event_type, half
    ),
    wide AS (
        SELECT event_type,
               CAST(COALESCE(MAX(CASE WHEN half = 0 THEN c END), 0) AS BIGINT)
                   AS c0,
               CAST(COALESCE(MAX(CASE WHEN half = 1 THEN c END), 0) AS BIGINT)
                   AS c1
        FROM cells GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(SUM(c1 - c0) AS BIGINT) AS total_delta FROM wide
    )
    SELECT w.event_type, w.c0 AS first_half_cents, w.c1 AS second_half_cents,
           CAST(w.c1 - w.c0 AS BIGINT) AS delta_cents,
           t.total_delta AS total_delta_cents
    FROM wide w, tot t
    """,
)
def q250_delta_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topline-delta contribution analysis: when month-over-month (here
    first-half vs second-half) revenue moves, WHICH event type moved it —
    each slice's signed delta alongside the total, the additive
    decomposition (Σ slice deltas = topline delta by construction) that
    a metrics tree drills into before anyone guesses at causes. Signed
    deltas stay undivided cents (the q236 DIV/floor lesson); ratios are
    the reader's division.

    Shape: one (type, half) aggregate, a type-cardinality pivot, and a
    1-row total broadcast — everything after the first pass is
    metadata-scale.
    """
    (events,) = tables(spark, sf_dir, "events")
    rev = events.select(
        "event_type",
        F.when(F.dayofmonth("ts") < _CONTRIB_SPLIT_DAY, 0).otherwise(1).alias("half"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cells = rev.groupBy("event_type", "half").agg(
        F.sum("cents").cast("bigint").alias("c")
    )
    wide = cells.groupBy("event_type").agg(
        F.coalesce(F.max(F.when(F.col("half") == 0, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("c0"),
        F.coalesce(F.max(F.when(F.col("half") == 1, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("c1"),
    )
    tot = wide.agg(
        F.sum(F.col("c1") - F.col("c0")).cast("bigint").alias("total_delta_cents")
    )
    return wide.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("c0").alias("first_half_cents"),
        F.col("c1").alias("second_half_cents"),
        (F.col("c1") - F.col("c0")).cast("bigint").alias("delta_cents"),
        "total_delta_cents",
    )
