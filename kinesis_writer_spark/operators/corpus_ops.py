"""Corpus-curation operators: passage-level cross-document dedup, per-lang
length-band filtering, source mixing weights, and per-document contamination
scoring — the remaining curation stages of a pretraining data pipeline (the
removal/flagging twins of text.py's scoring and retrieval.py's q101).

Cross-engine determinism rules (same as dedup.py / text.py):
- passages/grams are hashed to 60-bit MD5 ints before any shuffle or join
  (8-byte rows, bit-identical in DuckDB);
- thresholds and ratios are integer-only (ppm floors, ``20*cum >= cnt``-style
  rank rules) so no float boundary can disagree between engines;
- percentiles use an explicit histogram-cumulative rank rule instead of
  ``percentile_disc`` — Spark's (SQL-standard cume_dist) and DuckDB's
  (floor(p*(n-1)) index) disagree at boundary ranks.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_md5_60bit, md5_60bit
from ..registry import register
from ._util import tables

_PASS_LEN = 10  # tokens per non-overlapping passage (q139)
_CONT_N = 8  # contamination gram width (q142); q101 uses the same width


@register(
    "q139_passage_dedup",
    oracle=f"""
    WITH d AS (SELECT doc_id, string_split(text, ' ') AS w FROM documents),
    p AS (
        SELECT doc_id,
               {duckdb_md5_60bit(f"array_to_string(w[i*{_PASS_LEN}+1 : i*{_PASS_LEN}+{_PASS_LEN}], ' ')", salt='pass')} AS phash
        FROM d, LATERAL unnest(range(0, len(w) // {_PASS_LEN})) t(i)
    ),
    dup AS (
        SELECT phash FROM p GROUP BY phash HAVING COUNT(DISTINCT doc_id) >= 2
    )
    SELECT p.doc_id,
           COUNT(*) AS n_passages,
           CAST(SUM(CASE WHEN dup.phash IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup,
           CAST((1000000 * SUM(CASE WHEN dup.phash IS NOT NULL THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS dup_ppm
    FROM p LEFT JOIN dup ON p.phash = dup.phash
    GROUP BY p.doc_id
    """,
)
def q139_passage_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Passage-level cross-document exact dedup (the chunk-granularity cut of
    suffix-style "exact substring" dedup): each document is split into
    non-overlapping 10-token passages; a passage is *duplicated* when its
    hash occurs in ≥ 2 distinct documents. Emits per-doc passage counts and
    the duplicated fraction in ppm. Documents shorter than one passage
    contribute no rows (both engines produce no chunk for them).

    Spark shape: passages are hashed to 60-bit ints inside the same select
    that builds them (no re-evaluation inside Generate — see q101's note),
    so every shuffle row is (doc_id, bigint). Finding cross-doc hashes is
    one grouped distinct-count on the hash; the dup set joins back on the
    same hash key, so AQE plans both exchanges on one partitioning; the
    final per-doc rollup is a groupBy on doc_id. At 100 TB: three shuffles
    of 8-byte-key rows, no all-pairs anywhere, and the dup-hash side
    shrinks with duplicate density (broadcastable when small).
    """
    (documents,) = tables(spark, sf_dir, "documents")
    # bind the split to a projected column: referencing the raw split()
    # expression inside the transform lambda would inline it per ELEMENT
    # (one split per passage — the q132 anti-pattern); the multi-referenced
    # column keeps the projection from collapsing, so split runs once/row
    docs_w = documents.select("doc_id", F.split("text", " ").alias("w"))
    w = F.col("w")
    n_pass = (F.size(w) / _PASS_LEN).cast("bigint")
    starts = F.when(n_pass >= 1, F.sequence(F.lit(0), (n_pass - 1).cast("int"))).otherwise(
        F.array().cast("array<int>")
    )
    passages = docs_w.select(
        "doc_id",
        F.explode(
            F.transform(
                starts,
                lambda i: md5_60bit(
                    F.array_join(F.slice(w, i * _PASS_LEN + 1, _PASS_LEN), " "),
                    salt="pass",
                ),
            )
        ).alias("phash"),
    )
    dup = (
        passages.groupBy("phash")
        .agg(F.count_distinct("doc_id").alias("nd"))
        .filter(F.col("nd") >= 2)
        .select("phash", F.lit(1).alias("is_dup"))
    )
    return (
        passages.join(dup, "phash", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_passages"),
            F.sum(F.coalesce(F.col("is_dup"), F.lit(0))).alias("n_dup"),
        )
        .select(
            "doc_id",
            "n_passages",
            "n_dup",
            F.expr("(1000000 * n_dup) DIV n_passages").alias("dup_ppm"),
        )
    )


@register(
    "q140_length_band_filter",
    oracle="""
    WITH h AS (
        SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY lang, n_chars
    ),
    cum AS (
        SELECT lang, n_chars,
               SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
               SUM(c) OVER (PARTITION BY lang) AS cnt
        FROM h
    ),
    thr AS (
        SELECT lang,
               MIN(CASE WHEN 20 * cum >= cnt THEN n_chars END) AS lo_chars,
               MIN(CASE WHEN 20 * cum >= 19 * cnt THEN n_chars END) AS hi_chars
        FROM cum GROUP BY lang
    )
    SELECT d.lang, thr.lo_chars, thr.hi_chars,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN d.n_chars BETWEEN thr.lo_chars AND thr.hi_chars
                    THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents d JOIN thr ON d.lang = thr.lang
    GROUP BY d.lang, thr.lo_chars, thr.hi_chars
    """,
)
def q140_length_band_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-language length-band filter (the p5–p95 "reasonable length" gate
    of quality pipelines): thresholds are the smallest ``n_chars`` whose
    cumulative doc count reaches 5% / 95% of the language's total, then
    each language reports how many documents survive the band.

    The thresholds are computed on a per-(lang, n_chars) HISTOGRAM, not a
    per-document sort: the heavy shuffle is a grouped count with map-side
    combine, and the cumulative window runs over distinct values only
    (bounded by the value domain, not the corpus). That is the 100 TB-safe
    exact-percentile shape — a per-lang sort of raw docs would funnel whole
    languages through single tasks. The rank rule is integer-only
    (``20*cum >= cnt``), so both engines pick identical thresholds.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    hist = documents.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy("lang").orderBy("n_chars")
    w_all = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "n_chars",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("cnt"),
    )
    thr = cum.groupBy("lang").agg(
        F.min(F.when(20 * F.col("cum") >= F.col("cnt"), F.col("n_chars"))).alias("lo_chars"),
        F.min(F.when(20 * F.col("cum") >= 19 * F.col("cnt"), F.col("n_chars"))).alias(
            "hi_chars"
        ),
    )
    return (
        documents.join(F.broadcast(thr), "lang")
        .groupBy("lang", "lo_chars", "hi_chars")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(
                F.when(
                    F.col("n_chars").between(F.col("lo_chars"), F.col("hi_chars")), 1
                ).otherwise(0)
            ).alias("n_kept"),
        )
        .select("lang", "lo_chars", "hi_chars", "n_docs", "n_kept")
    )


@register(
    "q141_source_mixing_weights",
    oracle="""
    WITH per_source AS (
        SELECT source,
               COUNT(*) AS n_docs,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tokens
        FROM documents GROUP BY source
    ),
    scaled AS (
        SELECT source, n_docs, tokens,
               CAST(FLOOR(SQRT(tokens) * 1000) AS BIGINT) AS s
        FROM per_source
    )
    SELECT source, n_docs, tokens,
           CAST((1000000 * s) // (SELECT CAST(SUM(s) AS BIGINT) FROM scaled)
                AS BIGINT) AS weight_ppm
    FROM scaled
    """,
)
def q141_source_mixing_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-scaled source mixing weights (the T=0.5 "square-root
    sampling" rule used to balance pretraining mixtures): each source's
    sampling weight is sqrt(token count) normalized across sources, in ppm.

    Float discipline: sqrt and the ×1000 scale are IEEE-exact per source,
    then everything cross-source is BIGINT (the sum of quantized sqrts and
    the ppm floor-division) — a float *sum* across sources would depend on
    aggregation order. One grouped count over the corpus (map-side
    combine), a tiny per-source table after; the normalizing total is
    broadcast back. The token count, not the doc count, drives the weight,
    so verbose sources don't get oversampled per document.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    per_source = documents.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("tokens"),
    )
    scaled = per_source.select(
        "source",
        "n_docs",
        "tokens",
        F.floor(F.sqrt(F.col("tokens")) * 1000).cast("bigint").alias("s"),
    )
    total = scaled.agg(F.sum("s").alias("s_total"))
    return scaled.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "tokens",
        F.expr("(1000000 * s) DIV s_total").alias("weight_ppm"),
    )


@register(
    "q142_contamination_overlap",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, source, string_split(text, ' ') AS w FROM documents
    ),
    train_grams AS (
        SELECT DISTINCT doc_id,
               {duckdb_md5_60bit(f"array_to_string(w[i+1 : i+{_CONT_N}], ' ')", salt='cont8')} AS g
        FROM d, LATERAL unnest(range(0, len(w) - {_CONT_N} + 1)) t(i)
        WHERE source <> 'src0'
    ),
    eval_grams AS (
        SELECT DISTINCT
               {duckdb_md5_60bit(f"array_to_string(w[i+1 : i+{_CONT_N}], ' ')", salt='cont8')} AS g
        FROM d, LATERAL unnest(range(0, len(w) - {_CONT_N} + 1)) t(i)
        WHERE source = 'src0'
    )
    SELECT t.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_hit,
           CAST((1000000 * SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS hit_ppm
    FROM train_grams t LEFT JOIN eval_grams e ON t.g = e.g
    GROUP BY t.doc_id
    """,
)
def q142_contamination_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document contamination score: the fraction (ppm) of a training
    document's distinct 8-grams that also occur anywhere in the eval corpus
    (source ``src0`` stands in for the benchmark set). q101 is the boolean
    remove-the-doc gate; this is its graded twin for contamination
    *auditing* — rank the near-misses instead of dropping them. Documents
    shorter than 8 tokens have no grams and produce no row (both engines).

    Spark shape: grams are 60-bit-hashed and per-doc-deduplicated in the
    array domain (``array_distinct`` before explode), so the shuffle rows
    are (doc_id, bigint) and per-doc gram multiplicity never inflates the
    join. The eval side collapses to a global DISTINCT hash set before the
    LEFT join (no row multiplication — the join is key-unique on the right),
    and the per-doc rollup groups on doc_id. At 100 TB the eval-gram table
    is benchmark-sized (tiny → broadcast); the train side streams once.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    # bound words column, not the raw split() expression — see q139's note
    docs_w = documents.select("doc_id", "source", F.split("text", " ").alias("w"))
    w = F.col("w")
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - _CONT_N),
            lambda i: md5_60bit(F.array_join(F.slice(w, i + 1, _CONT_N), " "), salt="cont8"),
        )
    )
    guarded = F.when(F.size(w) >= _CONT_N, grams_arr).otherwise(
        F.array().cast("array<bigint>")
    )
    train_grams = docs_w.filter(F.col("source") != "src0").select(
        "doc_id", F.explode(guarded).alias("g")
    )
    eval_grams = (
        docs_w.filter(F.col("source") == "src0")
        .select(F.explode(guarded).alias("g"))
        .distinct()
        .select("g", F.lit(1).alias("hit"))
    )
    return (
        train_grams.join(F.broadcast(eval_grams), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_hit"),
        )
        .select(
            "doc_id",
            "n_grams",
            "n_hit",
            F.expr("(1000000 * n_hit) DIV n_grams").alias("hit_ppm"),
        )
    )


@register(
    "q146_partitioned_export_roundtrip",
    oracle="""
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(SUM(CAST(('0x' || substr(md5(text), 1, 15)) AS BIGINT) % 1000000007)
               AS BIGINT) AS content_checksum
    FROM documents
    GROUP BY lang
    """,
)
def q146_partitioned_export_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-data EXPORT path, verified end-to-end: the corpus is written
    as lang-partitioned parquet (repartitioned by the partition column so
    each output partition is produced by one task — no tiny-file spray —
    and sorted by doc_id within files for locality), read back through the
    partition-discovering reader, and rolled up per lang with a content
    checksum. The oracle computes the same rollup from the ORIGINAL table,
    so any row lost, duplicated, or corrupted in the write→read cycle
    breaks the hash gate.

    At 100 TB this is the standard shard-export recipe:
    ``repartition(partition_cols)`` bounds files per partition to tasks
    actually holding that key, ``sortWithinPartitions`` gives readers
    monotone ids per shard, and partition pruning on the read side comes
    free from the directory layout. The checksum is an order-independent
    BIGINT sum of (60-bit content hash mod 1e9+7) — overflow-safe under
    ANSI mode up to ~9e9 rows per group — so verification never collects
    rows.
    """
    import os
    import tempfile

    (documents,) = tables(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(), "kws_export", os.path.basename(os.path.normpath(sf_dir))
    )
    (
        documents.repartition("lang")
        .sortWithinPartitions("doc_id")
        .write.mode("overwrite")
        .partitionBy("lang")
        .parquet(out)
    )
    back = spark.read.parquet(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        F.sum(md5_60bit(F.col("text")) % 1000000007).alias("content_checksum"),
    )


@register(
    "q149_bucketed_join",
    oracle="""
    SELECT o.o_orderpriority,
           COUNT(*) AS n_lines,
           CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                    AS BIGINT)) AS BIGINT) AS revenue_cents
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY o.o_orderpriority
    """,
)
def q149_bucketed_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bucketed-layout co-located join: both fact tables are written ONCE as
    managed tables bucketed (16 buckets) and sorted on the join key, and the
    join then reads bucket-aligned files — NO shuffle on either side (the
    plan has no Exchange above the join; see test_plans). This is Spark's
    answer to the repeated fact-fact join at 100 TB: pay the partitioning
    when the table is laid down, never again per query. The oracle computes
    the same rollup from the raw parquet, so the bucketed layout is proven
    to preserve every row.

    The bucketed tables are created idempotently per dataset (managed-table
    names derive from the sf dir) in the session warehouse — the batch twin
    of a real lakehouse table registration.
    """
    import os
    import shutil

    tag = os.path.basename(os.path.normpath(sf_dir)).replace(".", "_")
    lt, ot = f"kws_lineitem_b_{tag}", f"kws_orders_b_{tag}"
    lineitem, orders = tables(spark, sf_dir, "lineitem", "orders")

    def _ensure(name: str, df: DataFrame, key: str) -> None:
        if spark.catalog.tableExists(name):
            return
        # a previous session's managed-table files may survive the (in-memory)
        # catalog; clear the stale location so saveAsTable can recreate it
        loc = os.path.join(
            spark.conf.get("spark.sql.warehouse.dir", "").removeprefix("file:"), name
        )
        if loc and os.path.isdir(loc):
            shutil.rmtree(loc, ignore_errors=True)
        df.write.bucketBy(16, key).sortBy(key).mode("overwrite").saveAsTable(name)

    _ensure(lt, lineitem.select("l_orderkey", "l_extendedprice", "l_discount"), "l_orderkey")
    _ensure(ot, orders.select("o_orderkey", "o_orderpriority"), "o_orderkey")
    lb, ob = spark.table(lt), spark.table(ot)
    rev = F.round(F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0).cast(
        "bigint"
    )
    # MERGE hint: at test SF the orders side fits the broadcast threshold and
    # would bypass the bucket layout; at 100 TB neither fact side broadcasts
    # and the SMJ-over-buckets path below (zero Exchange before the join,
    # plan-pinned) is exactly what runs
    return (
        lb.join(ob.hint("merge"), F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(rev).alias("revenue_cents"),
        )
    )


@register(
    "q162_schema_evolution",
    oracle="""
    WITH unioned AS (
        SELECT doc_id, lang, n_chars, NULL AS source
        FROM documents WHERE doc_id % 2 = 0
        UNION ALL
        SELECT doc_id, lang, n_chars, source
        FROM documents WHERE doc_id % 2 = 1
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_rows,
           CAST(SUM(CASE WHEN source IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_with_source,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars
    FROM unioned GROUP BY lang
    """,
)
def q162_schema_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema evolution on an append-only parquet layout, verified through a
    real write→read cycle: an early batch lands WITHOUT the ``source``
    column, a later batch adds it, and the merged-schema read surfaces old
    rows with NULLs — the additive-column lifecycle every long-lived table
    goes through. The oracle computes the same rollup from the source
    table, so the cycle provably loses nothing and nulls exactly the
    missing column.

    Scale notes: ``mergeSchema`` reconciles footers at planning time — pay
    it on evolving tables only (or pin the read schema explicitly, which
    skips footer merging entirely); additive nullable columns are the only
    always-safe evolution (renames/narrowings need a rewrite or a real
    table format's mapping).
    """
    import os
    import shutil
    import tempfile

    (documents,) = tables(spark, sf_dir, "documents")
    out = os.path.join(
        tempfile.gettempdir(), "kws_evolve", os.path.basename(os.path.normpath(sf_dir))
    )
    shutil.rmtree(out, ignore_errors=True)
    old_batch = documents.filter(F.col("doc_id") % 2 == 0).select(
        "doc_id", "lang", "n_chars"
    )
    new_batch = documents.filter(F.col("doc_id") % 2 == 1).select(
        "doc_id", "lang", "n_chars", "source"
    )
    old_batch.write.mode("overwrite").parquet(out)
    new_batch.write.mode("append").parquet(out)
    back = spark.read.option("mergeSchema", "true").parquet(out)
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.sum(F.when(F.col("source").isNull(), 0).otherwise(1)).alias("n_with_source"),
        F.sum("n_chars").alias("total_chars"),
    )


@register(
    "q164_snapshot_diff",
    oracle="""
    WITH prev AS (
        SELECT doc_id, lang, md5(text) AS h FROM documents WHERE doc_id % 11 <> 0
    ),
    curr AS (
        SELECT doc_id, lang,
               md5(CASE WHEN doc_id % 7 = 0 THEN text || ' rev2' ELSE text END) AS h
        FROM documents WHERE doc_id % 13 <> 0
    ),
    diff AS (
        SELECT COALESCE(c.lang, p.lang) AS lang,
               CASE WHEN p.doc_id IS NULL THEN 'added'
                    WHEN c.doc_id IS NULL THEN 'removed'
                    WHEN p.h <> c.h THEN 'changed'
                    ELSE 'unchanged' END AS change
        FROM prev p FULL OUTER JOIN curr c ON p.doc_id = c.doc_id
    )
    SELECT lang, change, CAST(COUNT(*) AS BIGINT) AS n_docs
    FROM diff GROUP BY lang, change
    """,
)
def q164_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus snapshot diff — the incremental-pipeline primitive: compare
    two crawls/exports by content hash and classify every document as
    added / removed / changed / unchanged per language (the decision input
    for incremental re-processing: only 'added' + 'changed' re-enter the
    pipeline). Snapshots are derived deterministically from the fixture
    (drop different slices, revise every 7th doc) so both engines see the
    identical pair.

    Shape: ONE full-outer hash join on doc_id — at 100 TB both snapshots
    hash-partition on the key once, and the comparison column is a 16-byte
    digest computed in-scan, so the shuffle never carries document text.
    With both snapshots bucketed on doc_id (q149's layout), the join
    drops its exchanges entirely.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    prev = documents.filter(F.col("doc_id") % 11 != 0).select(
        F.col("doc_id").alias("p_id"),
        F.col("lang").alias("p_lang"),
        F.md5(F.col("text").cast("binary")).alias("p_h"),
    )
    curr_text = F.when(
        F.col("doc_id") % 7 == 0, F.concat(F.col("text"), F.lit(" rev2"))
    ).otherwise(F.col("text"))
    curr = documents.filter(F.col("doc_id") % 13 != 0).select(
        F.col("doc_id").alias("c_id"),
        F.col("lang").alias("c_lang"),
        F.md5(curr_text.cast("binary")).alias("c_h"),
    )
    change = (
        F.when(F.col("p_id").isNull(), "added")
        .when(F.col("c_id").isNull(), "removed")
        .when(F.col("p_h") != F.col("c_h"), "changed")
        .otherwise("unchanged")
    )
    return (
        prev.join(curr, F.col("p_id") == F.col("c_id"), "full_outer")
        .select(F.coalesce(F.col("c_lang"), F.col("p_lang")).alias("lang"), change.alias("change"))
        .groupBy("lang", "change")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )


@register(
    "q165_hapax_tokens",
    oracle="""
    WITH tok AS (
        SELECT DISTINCT lang, doc_id, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    df AS (
        SELECT lang, token, COUNT(*) AS docfreq FROM tok GROUP BY lang, token
    )
    SELECT lang,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(CASE WHEN docfreq = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_hapax,
           CAST((1000000 * SUM(CASE WHEN docfreq = 1 THEN 1 ELSE 0 END))
                // COUNT(*) AS BIGINT) AS hapax_ppm
    FROM df GROUP BY lang
    """,
)
def q165_hapax_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hapax legomena mining: per language, how many vocabulary entries
    occur in exactly ONE document — the rare-feature signal behind
    vocabulary pruning, OOV-rate estimation, and typo/noise detection
    (a corpus whose hapax share explodes is full of junk tokens).

    Shape: explode → per-doc DISTINCT (collapses within-doc repeats before
    the heavy shuffle) → one grouped doc-frequency count with map-side
    combine → a rollup over the (vocabulary-sized) df table. The corpus is
    touched once; everything after the df count is tiny.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    tok = documents.select(
        "lang", "doc_id", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    )
    df = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("docfreq"))
    return df.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum(F.when(F.col("docfreq") == 1, 1).otherwise(0)).alias("n_hapax"),
        F.expr(
            "(1000000 * SUM(CASE WHEN docfreq = 1 THEN 1 ELSE 0 END)) DIV COUNT(*)"
        ).alias("hapax_ppm"),
    )


@register(
    "q173_source_overlap_matrix",
    oracle="""
    WITH vocab AS (
        SELECT DISTINCT source, unnest(string_split(text, ' ')) AS token
        FROM documents
    ),
    sizes AS (SELECT source, COUNT(*) AS n FROM vocab GROUP BY source),
    inter AS (
        SELECT a.source AS src_a, b.source AS src_b, COUNT(*) AS n_common
        FROM vocab a JOIN vocab b
          ON a.token = b.token AND a.source < b.source
        GROUP BY a.source, b.source
    )
    SELECT i.src_a, i.src_b,
           CAST(i.n_common AS BIGINT) AS n_common,
           CAST((1000000 * i.n_common) // (sa.n + sb.n - i.n_common) AS BIGINT)
               AS jaccard_ppm
    FROM inter i
    JOIN sizes sa ON sa.source = i.src_a
    JOIN sizes sb ON sb.source = i.src_b
    """,
)
def q173_source_overlap_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pairwise vocabulary overlap between sources (Jaccard over distinct
    token sets) — the dataset-similarity matrix used to spot mirrored or
    heavily overlapping feeds before mixing weights are assigned (q141's
    upstream sanity check).

    Shape: the inverted index (token → sources) is the join medium — the
    self-join runs on the TOKEN key, so a pair is counted once per shared
    token and per-key fan-out is the number of sources containing that
    token (≤ |sources|, never corpus-sized). Sizes and intersections meet
    in a |sources|²-bounded matrix; the union size comes from
    |A|+|B|−|A∩B| rather than a second pass.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    vocab = documents.select(
        "source", F.explode(F.array_distinct(F.split("text", " "))).alias("token")
    ).distinct()
    sizes = vocab.groupBy("source").agg(F.count(F.lit(1)).alias("n"))
    a = vocab.select(F.col("source").alias("src_a"), "token")
    b = vocab.select(F.col("source").alias("src_b"), F.col("token").alias("token_b"))
    inter = (
        a.join(b, (F.col("token") == F.col("token_b")) & (F.col("src_a") < F.col("src_b")))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("n_common"))
    )
    sa = sizes.select(F.col("source").alias("src_a"), F.col("n").alias("n_a"))
    sb = sizes.select(F.col("source").alias("src_b"), F.col("n").alias("n_b"))
    return (
        inter.join(F.broadcast(sa), "src_a")
        .join(F.broadcast(sb), "src_b")
        .select(
            "src_a",
            "src_b",
            "n_common",
            F.expr("(1000000 * n_common) DIV (n_a + n_b - n_common)").alias(
                "jaccard_ppm"
            ),
        )
    )


@register(
    "q180_curation_pipeline_v2",
    oracle=f"""
    WITH h AS (
        SELECT lang, n_chars, COUNT(*) AS c FROM documents GROUP BY lang, n_chars
    ),
    cum AS (
        SELECT lang, n_chars,
               SUM(c) OVER (PARTITION BY lang ORDER BY n_chars) AS cum,
               SUM(c) OVER (PARTITION BY lang) AS cnt
        FROM h
    ),
    thr AS (
        SELECT lang,
               MIN(CASE WHEN 20 * cum >= cnt THEN n_chars END) AS lo,
               MIN(CASE WHEN 20 * cum >= 19 * cnt THEN n_chars END) AS hi
        FROM cum GROUP BY lang
    ),
    banded AS (
        SELECT d.* FROM documents d JOIN thr ON d.lang = thr.lang
        WHERE d.n_chars BETWEEN thr.lo AND thr.hi
    ),
    dw AS (SELECT doc_id, source, string_split(text, ' ') AS w FROM banded),
    train_grams AS (
        SELECT DISTINCT doc_id,
               {duckdb_md5_60bit(f"array_to_string(w[i+1 : i+{_CONT_N}], ' ')", salt='cont8')} AS g
        FROM dw, LATERAL unnest(range(0, len(w) - {_CONT_N} + 1)) t(i)
        WHERE source <> 'src0'
    ),
    eval_grams AS (
        SELECT DISTINCT
               {duckdb_md5_60bit(f"array_to_string(w[i+1 : i+{_CONT_N}], ' ')", salt='cont8')} AS g
        FROM (SELECT string_split(text, ' ') AS w FROM documents WHERE source = 'src0'),
             LATERAL unnest(range(0, len(w) - {_CONT_N} + 1)) t(i)
    ),
    contamination AS (
        SELECT t.doc_id,
               (1000000 * SUM(CASE WHEN e.g IS NOT NULL THEN 1 ELSE 0 END))
                   // COUNT(*) AS hit_ppm
        FROM train_grams t LEFT JOIN eval_grams e ON t.g = e.g
        GROUP BY t.doc_id
    ),
    survivors AS (
        SELECT b.source, len(string_split(b.text, ' ')) AS n_tok
        FROM banded b JOIN contamination c ON c.doc_id = b.doc_id
        WHERE c.hit_ppm < 200000
    ),
    per_source AS (
        SELECT source,
               CAST(COUNT(*) AS BIGINT) AS n_docs,
               CAST(SUM(n_tok) AS BIGINT) AS tokens,
               CAST(FLOOR(SQRT(SUM(n_tok)) * 1000) AS BIGINT) AS s
        FROM survivors GROUP BY source
    )
    SELECT source, n_docs, tokens,
           CAST((1000000 * s) // (SELECT CAST(SUM(s) AS BIGINT) FROM per_source)
               AS BIGINT) AS weight_ppm
    FROM per_source
    """,
)
def q180_curation_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Round-3 curation capstone — the new-operator stages composed into ONE
    lazy plan (the q95 pattern, one generation later): per-lang p5–p95
    length-band gate (q140's histogram thresholds) → per-doc contamination
    score against the eval source (q142) with docs ≥ 20% gram overlap
    dropped → temperature-scaled mixing weights over the SURVIVING
    per-source token mass (q141). What ships is the mixing table a
    training run would consume after cleaning.

    Composability is the point: every stage is the same DataFrame-in /
    DataFrame-out shape the standalone queries use, so Catalyst fuses the
    whole chain — the band thresholds and eval-gram set broadcast, the
    contamination join runs once over banded docs only (filters push
    upstream of the gram explode), and the final weight table is
    |sources| rows of integer-exact math.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    # stage 1: q140's histogram thresholds
    hist = documents.groupBy("lang", "n_chars").agg(F.count(F.lit(1)).alias("c"))
    w_cum = Window.partitionBy("lang").orderBy("n_chars")
    w_all = Window.partitionBy("lang")
    cum = hist.select(
        "lang",
        "n_chars",
        F.sum("c").over(w_cum).alias("cum"),
        F.sum("c").over(w_all).alias("cnt"),
    )
    thr = cum.groupBy("lang").agg(
        F.min(F.when(20 * F.col("cum") >= F.col("cnt"), F.col("n_chars"))).alias("lo"),
        F.min(F.when(20 * F.col("cum") >= 19 * F.col("cnt"), F.col("n_chars"))).alias("hi"),
    )
    banded = documents.join(F.broadcast(thr), "lang").filter(
        F.col("n_chars").between(F.col("lo"), F.col("hi"))
    )
    # stage 2: q142's contamination score over banded docs
    banded_w = banded.select("doc_id", "source", "text", F.split("text", " ").alias("w"))
    w = F.col("w")
    grams_arr = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - _CONT_N),
            lambda i: md5_60bit(F.array_join(F.slice(w, i + 1, _CONT_N), " "), salt="cont8"),
        )
    )
    guarded = F.when(F.size(w) >= _CONT_N, grams_arr).otherwise(
        F.array().cast("array<bigint>")
    )
    train_grams = banded_w.filter(F.col("source") != "src0").select(
        "doc_id", F.explode(guarded).alias("g")
    )
    eval_docs = documents.filter(F.col("source") == "src0").select(
        F.split("text", " ").alias("w")
    )
    eval_grams = (
        eval_docs.select(F.explode(guarded).alias("g"))
        .distinct()
        .select("g", F.lit(1).alias("hit"))
    )
    contamination = (
        train_grams.join(F.broadcast(eval_grams), "g", "left")
        .groupBy("doc_id")
        .agg(
            F.expr(
                "(1000000 * SUM(COALESCE(hit, 0))) DIV COUNT(*)"
            ).alias("hit_ppm")
        )
    )
    survivors = (
        banded_w.join(contamination, "doc_id")
        .filter(F.col("hit_ppm") < 200_000)
        .select("source", F.size(F.split("text", " ")).alias("n_tok"))
    )
    # stage 3: q141's mixing weights over survivors
    per_source = survivors.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tok").alias("tokens"),
    ).select(
        "source",
        "n_docs",
        "tokens",
        F.floor(F.sqrt(F.col("tokens")) * 1000).cast("bigint").alias("s"),
    )
    total = per_source.agg(F.sum("s").alias("s_total"))
    return per_source.crossJoin(F.broadcast(total)).select(
        "source",
        "n_docs",
        "tokens",
        F.expr("(1000000 * s) DIV s_total").alias("weight_ppm"),
    )


@register(
    "q185_weighted_median_length",
    oracle="""
    WITH w AS (
        SELECT lang, n_chars,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS tok_w
        FROM documents GROUP BY lang, n_chars
    ),
    cum AS (
        SELECT lang, n_chars, tok_w,
               SUM(tok_w) OVER (PARTITION BY lang ORDER BY n_chars) AS cw,
               SUM(tok_w) OVER (PARTITION BY lang) AS tw
        FROM w
    )
    SELECT lang,
           CAST(MAX(tw) AS BIGINT) AS total_tokens,
           MIN(CASE WHEN 2 * cw >= tw THEN n_chars END) AS weighted_median_chars
    FROM cum GROUP BY lang
    """,
)
def q185_weighted_median_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TOKEN-weighted median document length per language: the length under
    which half the language's token mass sits — what "typical document"
    means when training consumes tokens, not documents (an unweighted
    median over-represents short docs). Same histogram-cumulative rank
    rule as q140, with token weights instead of row counts: grouped
    weight sums with map-side combine, cumulative window over distinct
    lengths only, integer-only threshold — no per-doc sort, engine-exact.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    w = documents.groupBy("lang", "n_chars").agg(
        F.sum(F.size(F.split("text", " "))).alias("tok_w")
    )
    w_cum = Window.partitionBy("lang").orderBy("n_chars")
    w_all = Window.partitionBy("lang")
    cum = w.select(
        "lang",
        "n_chars",
        F.sum("tok_w").over(w_cum).alias("cw"),
        F.sum("tok_w").over(w_all).alias("tw"),
    )
    return cum.groupBy("lang").agg(
        F.max("tw").alias("total_tokens"),
        F.min(
            F.when(2 * F.col("cw") >= F.col("tw"), F.col("n_chars"))
        ).alias("weighted_median_chars"),
    )


@register(
    "q189_vocab_growth_curve",
    oracle=f"""
    WITH d AS (
        SELECT {duckdb_md5_60bit("CAST(doc_id AS VARCHAR)", salt='vg')} % 10 AS bucket,
               string_split(text, ' ') AS w
        FROM documents
    ),
    tok AS (
        SELECT bucket,
               unnest(list_distinct(list_transform(range(1, len(w) - 1),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2]))) AS token
        FROM d
    ),
    first_seen AS (
        SELECT token, CAST(MIN(bucket) AS BIGINT) AS first_bucket
        FROM tok GROUP BY token
    ),
    by_bucket AS (
        SELECT first_bucket, COUNT(*) AS new_tokens
        FROM first_seen GROUP BY first_bucket
    )
    SELECT first_bucket + 1 AS tenths_of_corpus,
           CAST(new_tokens AS BIGINT) AS new_tokens,
           CAST(SUM(new_tokens) OVER (ORDER BY first_bucket) AS BIGINT)
               AS vocab_size
    FROM by_bucket
    """,
)
def q189_vocab_growth_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Vocabulary growth curve (the Heaps'-law diagnostic): distinct
    vocabulary size after each tenth of the corpus, with corpus order
    defined by the deterministic doc hash (the q65 sampling family, so
    the curve is reproducible and incremental-backfill stable). A curve
    that keeps climbing steeply says more data still buys vocabulary; a
    flattening one says the corpus is saturating — the collect-more-data
    decision input.

    Computed WITHOUT re-scanning per fraction: each token's FIRST bucket
    (min over the 10 hash buckets containing it) is one grouped MIN over
    exploded per-doc-distinct tokens; the cumulative curve is a window
    over ten rows. At 100 TB that's one shuffle keyed by token — the
    naive per-fraction distinct would scan the corpus ten times.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    # trigram vocabulary: the fixture's word vocabulary saturates in the
    # first bucket (tiny word list), so the growth signal lives in n-grams
    # — which is also the BPE-ish vocab a tokenizer actually mines. Words
    # bound to a projected column (q132 anti-pattern note).
    docs_w = documents.select(
        (md5_60bit(F.col("doc_id").cast("string"), salt="vg") % 10).alias("bucket"),
        F.split("text", " ").alias("w"),
    )
    w = F.col("w")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 3),
            lambda i: F.array_join(F.slice(w, i + 1, 3), " "),
        )
    )
    guarded = F.when(F.size(w) >= 3, grams).otherwise(F.array().cast("array<string>"))
    tok = docs_w.select("bucket", F.explode(guarded).alias("token"))
    first_seen = tok.groupBy("token").agg(F.min("bucket").alias("first_bucket"))
    by_bucket = first_seen.groupBy("first_bucket").agg(
        F.count(F.lit(1)).alias("new_tokens")
    )
    w_cum = Window.orderBy("first_bucket").rowsBetween(Window.unboundedPreceding, 0)
    return by_bucket.select(
        (F.col("first_bucket") + 1).alias("tenths_of_corpus"),
        "new_tokens",
        F.sum("new_tokens").over(w_cum).alias("vocab_size"),
    )


@register(
    "q192_source_kl_divergence",
    oracle="""
    WITH tok AS (
        SELECT source, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    per_src AS (
        SELECT source, token, COUNT(*) AS cst FROM tok GROUP BY source, token
    ),
    src_tot AS (SELECT source, SUM(cst) AS cs FROM per_src GROUP BY source),
    gtab AS (SELECT token, SUM(cst) AS ct FROM per_src GROUP BY token),
    gtot AS (SELECT SUM(cst) AS c FROM per_src),
    terms AS (
        SELECT p.source,
               CAST(FLOOR(1000000.0 * (CAST(p.cst AS DOUBLE) / st.cs)
                    * LN((CAST(p.cst AS DOUBLE) / st.cs)
                         / (CAST(g.ct AS DOUBLE) / gt.c))) AS BIGINT) AS term_1e6
        FROM per_src p
        JOIN src_tot st ON st.source = p.source
        JOIN gtab g ON g.token = p.token
        CROSS JOIN gtot gt
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(term_1e6) AS BIGINT) AS kl_1e6
    FROM terms GROUP BY source
    """,
)
def q192_source_kl_divergence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KL divergence of each source's token distribution from the corpus
    distribution — the slice-drift detector that ranks which feeds are
    UNLIKE the rest (an outlier source is a mislabeled crawl, a spam
    feed, or a different language waiting to contaminate the mix).
    Complements q151 (categorical independence test), q173 (set overlap)
    and q186 (embedding drift) as the distributional lens.

    Float discipline: each per-token term floors to a 1e-6-scaled BIGINT
    BEFORE summation (ratios of exact counts evaluated in double, same
    expression both engines), so the rollup is partition-order exact.
    Shape: one token-count shuffle, marginals joined back (global token
    table on the token key, source totals broadcast), and a final
    per-source sum of integers.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    tok = documents.select("source", F.explode(F.split("text", " ")).alias("token"))
    per_src = tok.groupBy("source", "token").agg(F.count(F.lit(1)).alias("cst"))
    src_tot = per_src.groupBy("source").agg(F.sum("cst").alias("cs"))
    glob = per_src.groupBy("token").agg(F.sum("cst").alias("ct"))
    glob_tot = per_src.agg(F.sum("cst").alias("c"))
    p_s = F.col("cst").cast("double") / F.col("cs")
    p_g = F.col("ct").cast("double") / F.col("c")
    term = F.floor(1_000_000.0 * p_s * F.log(p_s / p_g)).cast("bigint")
    terms = (
        per_src.join(F.broadcast(src_tot), "source")
        .join(glob, "token")
        .crossJoin(F.broadcast(glob_tot))
        .select("source", term.alias("term_1e6"))
    )
    return terms.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.sum("term_1e6").alias("kl_1e6"),
    )
