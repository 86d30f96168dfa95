"""Dataset-assembly operators for training-data pipelines: deterministic
sampling, train/valid/test splits, stratified rates, quantile-based quality
filtering, oversampling mixtures, histograms, and a deterministic shuffle.

Everything is driven by the cross-engine 60-bit MD5 hash
(:mod:`kinesis_writer_spark.functions.hashing`) instead of ``rand()``:
consistent hashing makes every sample/split *reproducible* and *stable under
re-runs and backfills* — the property a 100 TB pipeline actually needs (a
``rand()`` sample changes membership every run and cannot be oracle-checked).
All operators are single-pass narrow transforms over the scan (filter /
project — no shuffle) except where a per-stratum aggregate is genuinely
required, and those aggregates are tiny (|langs| rows) and broadcast back.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_md5_60bit, md5_60bit
from ..registry import register
from ._util import tables

# Spark/DuckDB twin expressions for the sampling hash bucket in [0, 100).
def _bucket(salt: str):
    return md5_60bit(F.col("doc_id").cast("string"), salt=salt) % 100


def _duckdb_bucket(salt: str) -> str:
    return f"{duckdb_md5_60bit('CAST(doc_id AS VARCHAR)', salt=salt)} % 100"


@register(
    "q65_hash_sample",
    oracle=f"""
    SELECT doc_id, lang
    FROM documents
    WHERE {_duckdb_bucket('sample')} < 10
    """,
)
def q65_hash_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Consistent 10% Bernoulli sample: keep rows whose salted key-hash
    bucket < 10.

    Unlike ``df.sample()``, membership is a pure function of the key — the
    same rows are selected on every run, on any cluster, at any parallelism,
    and a re-run after appending data keeps all previously-sampled rows
    (needed for incremental 100 TB backfills). The predicate is a narrow
    filter evaluated inside the scan stage: no shuffle, no state.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    return documents.filter(_bucket("sample") < 10).select("doc_id", "lang")


@register(
    "q66_train_test_split",
    oracle=f"""
    WITH assigned AS (
        SELECT lang,
               CASE WHEN {_duckdb_bucket('split')} < 80 THEN 'train'
                    WHEN {_duckdb_bucket('split')} < 90 THEN 'valid'
                    ELSE 'test' END AS split,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT lang, split, COUNT(*) AS n_docs,
           ROUND(AVG(n_tokens), 4) AS avg_tokens
    FROM assigned GROUP BY lang, split
    """,
)
def q66_train_test_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/valid/test split by key hash, summarized
    per (lang, split).

    Hash-assignment guarantees the three sets are disjoint and reproducible
    without materializing a membership table — each worker derives the split
    locally from the key, so the assignment itself costs zero I/O at 100 TB.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    b = _bucket("split")
    assigned = documents.select(
        "lang",
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test").alias("split"),
        F.size(F.split("text", " ")).alias("n_tokens"),
    )
    return assigned.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("n_tokens"), 4).alias("avg_tokens"),
    )


@register(
    "q67_stratified_sample",
    oracle=f"""
    WITH rates AS (
        SELECT lang AS r_lang,
               5 + CAST({duckdb_md5_60bit('lang')} % 50 AS BIGINT) AS rate_pct
        FROM (SELECT DISTINCT lang FROM documents)
    )
    SELECT lang, rate_pct,
           COUNT(*) AS n_total,
           CAST(SUM(CASE WHEN {_duckdb_bucket('strat')} < rate_pct THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM documents JOIN rates ON lang = r_lang
    GROUP BY lang, rate_pct
    """,
)
def q67_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified sampling with per-stratum rates (data-mixing primitive):
    each language gets its own keep-rate, applied via the consistent hash.

    The rate table here is derived (hash of the stratum key) so the query is
    self-contained; in production it is the data-mixing config. Per-stratum
    rates are a tiny dim (|langs| rows) broadcast over the corpus — the keep
    decision remains a narrow map-side predicate, so downsampling 100 TB to
    a target mixture is one scan with no shuffle on the big side.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    rates = (
        documents.select("lang")
        .distinct()
        .select(
            F.col("lang").alias("r_lang"),
            (F.lit(5) + md5_60bit(F.col("lang")) % 50).alias("rate_pct"),
        )
    )
    joined = documents.join(F.broadcast(rates), F.col("lang") == F.col("r_lang"))
    return joined.groupBy("lang", "rate_pct").agg(
        F.count(F.lit(1)).alias("n_total"),
        F.sum(F.when(_bucket("strat") < F.col("rate_pct"), 1).otherwise(0)).alias("n_kept"),
    )


@register(
    "q68_quantile_filter",
    oracle="""
    WITH t AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    )
    SELECT doc_id, lang, n_tokens
    FROM (
        SELECT *, PERCENT_RANK() OVER (PARTITION BY lang
                                       ORDER BY n_tokens ASC, doc_id ASC) AS pr
        FROM t
    )
    WHERE pr >= 0.5
    """,
)
def q68_quantile_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile-based quality filter: keep each language's top half by token
    count (deterministic tie-break on doc_id).

    Exact windowed percent_rank is the oracle-checkable form; the 100 TB
    form replaces the window with ``approx_percentile(n_tokens, 0.5)``
    per stratum (tiny aggregate, broadcast back as a threshold join) so no
    per-stratum global sort is needed — see q49_percentiles for the sketch.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    t = documents.select("doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens"))
    w = Window.partitionBy("lang").orderBy(F.col("n_tokens").asc(), F.col("doc_id").asc())
    return (
        t.withColumn("pr", F.percent_rank().over(w))
        .filter(F.col("pr") >= 0.5)
        .drop("pr")
    )


@register(
    "q69_oversample_mixture",
    oracle="""
    WITH scored AS (
        SELECT doc_id, lang,
               CASE WHEN len(string_split(text, ' ')) >= 60 THEN 2 ELSE 1 END AS n_epochs
        FROM documents
    )
    SELECT doc_id, lang, n_epochs, epoch
    FROM scored, UNNEST(range(1, n_epochs + 1)) AS u(epoch)
    """,
)
def q69_oversample_mixture(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Epoch-weighted oversampling (mixture assembly): long documents are
    repeated twice per training epoch pass, short ones once.

    ``explode(sequence(1, n_epochs))`` materializes the repeats lazily inside
    the scan stage (Generate — narrow, no shuffle), which is how per-source
    epoch counts from a data-mixing recipe turn into a flat training stream
    at 100 TB without a join against an exploded weights table.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    scored = documents.select(
        "doc_id",
        "lang",
        F.when(F.size(F.split("text", " ")) >= 60, 2).otherwise(1).alias("n_epochs"),
    )
    return scored.select(
        "doc_id",
        "lang",
        "n_epochs",
        F.explode(F.sequence(F.lit(1), F.col("n_epochs"))).alias("epoch"),
    )


@register(
    "q75_token_histogram",
    oracle="""
    SELECT LEAST(CAST(FLOOR(len(string_split(text, ' ')) / 10) AS BIGINT), 20) AS bucket,
           COUNT(*) AS n_docs,
           MIN(len(string_split(text, ' '))) AS min_tokens,
           MAX(len(string_split(text, ' '))) AS max_tokens
    FROM documents
    GROUP BY 1
    """,
)
def q75_token_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-count histogram with fixed-width buckets (capped tail bucket):
    the length-distribution profile every corpus build starts with.

    A bucketed groupBy over ≤21 keys: partial aggregation collapses each
    input partition to ≤21 rows before the exchange, so the shuffle is
    O(partitions), not O(rows) — safe at any scale.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    return (
        documents.select(
            F.least(F.floor(n_tokens / 10), F.lit(20)).cast("bigint").alias("bucket"),
            n_tokens.alias("n_tokens"),
        )
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min("n_tokens").alias("min_tokens"),
            F.max("n_tokens").alias("max_tokens"),
        )
    )


@register(
    "q76_deterministic_shuffle",
    oracle=f"""
    SELECT doc_id, {duckdb_md5_60bit("'shuf0' || '#' || CAST(doc_id AS VARCHAR)")} AS shuffle_key
    FROM documents
    ORDER BY shuffle_key
    LIMIT 100
    """,
)
def q76_deterministic_shuffle(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global shuffle for training-order randomization: order
    by a seeded key hash; here the first 100 of the shuffled stream.

    Seeded hash ordering gives a reproducible permutation (change the seed
    string to reshuffle between epochs). ``orderBy().limit()`` compiles to
    TakeOrderedAndProject — each partition keeps only its local top-k, so
    the "global sort" never materializes at 100 TB; the full-stream form is
    a range-partitioned sort on the same key (repartitionByRange + in-
    partition sort), which is exactly how shuffled training shards are
    written.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    key = md5_60bit(F.col("doc_id").cast("string"), salt="shuf0")
    return (
        documents.select("doc_id", key.alias("shuffle_key"))
        .orderBy("shuffle_key")
        .limit(100)
    )


_PACK_BUDGET = 2048  # tokens per training sequence / bin


@register(
    "q106_sequence_pack",
    oracle=f"""
    WITH toks AS (
        SELECT doc_id, lang, len(string_split(text, ' ')) AS n_tokens
        FROM documents
    ),
    placed AS (
        SELECT doc_id, lang, n_tokens,
               SUM(n_tokens) OVER (PARTITION BY lang ORDER BY doc_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens AS start_offset
        FROM toks
    )
    SELECT lang,
           CAST(FLOOR(start_offset / {_PACK_BUDGET}) AS BIGINT) AS bin_id,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(doc_id) AS first_doc
    FROM placed
    GROUP BY lang, CAST(FLOOR(start_offset / {_PACK_BUDGET}) AS BIGINT)
    """,
)
def q106_sequence_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sequence packing: assign documents to fixed token-budget training
    bins (2048 tokens) per language, by contiguous fill order — each doc's
    bin is its running-token start offset ÷ budget (docs may straddle a
    boundary; the tokens spill into the next sequence exactly as concat-
    and-chunk pretraining packing does).

    One window (running sum per lang, ordered by the deterministic doc key)
    + one aggregate — at 100 TB the window partitions by the stratum so no
    single-partition sort exists, and bin assignment is a pure function of
    the running sum, needing no sequential packer state.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    toks = documents.select(
        "doc_id", "lang", F.size(F.split("text", " ")).alias("n_tokens")
    )
    w = (
        Window.partitionBy("lang")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    placed = toks.withColumn(
        "start_offset", F.sum("n_tokens").over(w) - F.col("n_tokens")
    )
    return placed.groupBy(
        "lang",
        F.floor(F.col("start_offset") / _PACK_BUDGET).cast("bigint").alias("bin_id"),
    ).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("doc_id").alias("first_doc"),
    )


_CHUNK_LEN = 32
_CHUNK_STRIDE = 16


@register(
    "q107_sliding_chunks",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    chunks AS (
        SELECT doc_id,
               unnest(range(0, GREATEST(len(w) - {_CHUNK_LEN} + {_CHUNK_STRIDE}, 1),
                            {_CHUNK_STRIDE})) AS start_tok,
               len(w) AS doc_tokens
        FROM d
    )
    SELECT doc_id,
           CAST(start_tok / {_CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           LEAST({_CHUNK_LEN}, doc_tokens - start_tok) AS chunk_tokens
    FROM chunks
    """,
)
def q107_sliding_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sliding-window chunking (the retrieval/embedding-pipeline splitter):
    each document yields overlapping 32-token windows at stride 16; emits
    one row per chunk with its index and actual token count (the final
    window is allowed to be short).

    The chunk lattice is computed from the token count alone (sequence +
    explode — a narrow rowcount expansion, no shuffle); slicing the actual
    words out is `slice(w, start+1, len)` on the same row when the chunk
    text is needed downstream. At 100 TB the expansion factor is
    len/stride ≈ 2×, paid inside the scan stage.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    w = F.split("text", " ")
    n = F.size(w)
    starts = F.sequence(
        F.lit(0),
        F.greatest(n - _CHUNK_LEN + _CHUNK_STRIDE - 1, F.lit(0)),
        F.lit(_CHUNK_STRIDE),
    )
    chunks = documents.select(
        "doc_id", n.alias("doc_tokens"), F.explode(starts).alias("start_tok")
    )
    return chunks.select(
        "doc_id",
        (F.col("start_tok") / _CHUNK_STRIDE).cast("bigint").alias("chunk_idx"),
        F.least(F.lit(_CHUNK_LEN), F.col("doc_tokens") - F.col("start_tok")).alias(
            "chunk_tokens"
        ),
    )


@register(
    "q115_weighted_priority_sample",
    oracle=f"""
    WITH keyed AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS weight,
               ({duckdb_md5_60bit('CAST(doc_id AS VARCHAR)', salt='wps')} + 1)
                   / 1152921504606846976.0 AS u
        FROM documents
    ),
    prio AS (
        SELECT doc_id, lang, weight,
               CAST(FLOOR(-1000000.0 * LN(u) / weight) AS BIGINT) AS nlp_scaled
        FROM keyed
    )
    SELECT doc_id, lang, weight, nlp_scaled
    FROM prio
    ORDER BY nlp_scaled ASC, doc_id ASC
    LIMIT 100
    """,
)
def q115_weighted_priority_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement (Efraimidis–Spirakis priority
    form): each doc draws a deterministic uniform u from its salted key
    hash and gets priority exp-draw −ln(u)/w with w = its token count; the
    k smallest priorities are the weighted sample. Longer documents are
    proportionally more likely to be picked — the data-mixing primitive for
    token-weighted corpus sampling.

    Reproducible (hash-derived u, no rand()), single narrow pass + one
    TakeOrdered: each partition keeps a local top-k heap, k rows reach the
    driver regardless of corpus size. Priorities are floor-scaled to BIGINT
    so the ranking key is exact cross-engine (ln of identical doubles, one
    multiply, one floor).
    """
    (documents,) = tables(spark, sf_dir, "documents")
    # u in (0, 1]: (hash + 1) / 2^60 — hash is uniform in [0, 2^60)
    u = (md5_60bit(F.col("doc_id").cast("string"), salt="wps") + 1) / F.lit(
        float(1 << 60)
    )
    weight = F.size(F.split("text", " "))
    prio = F.floor(-1_000_000.0 * F.log(u) / weight).cast("bigint")
    return (
        documents.select(
            "doc_id", "lang", weight.alias("weight"), prio.alias("nlp_scaled")
        )
        .orderBy(F.col("nlp_scaled").asc(), F.col("doc_id").asc())
        .limit(100)
    )
