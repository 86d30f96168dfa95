"""End-to-end corpus pipeline: the composition every training-data build
runs — quality filter → exact dedup → consistent sample → corpus stats —
as ONE lazy plan, verified against the identical CTE chain in DuckDB.

Composition is the point: each stage is an operator from this engine
(q73-style quality, q50-style dedup, q65-style sampling, q70-style stats)
and chaining them stays a single Catalyst plan — filters merge, projections
prune, and the only shuffles are the dedup's digest aggregation and the
final per-language rollup. Nothing materializes between stages.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_md5_60bit, md5_60bit
from ..registry import register
from ._util import tables


@register(
    "q95_corpus_pipeline",
    oracle=f"""
    WITH quality AS (
        SELECT doc_id, lang, text,
               len(string_split(text, ' ')) AS n_tokens
        FROM documents
        WHERE len(string_split(text, ' ')) >= 30
    ),
    deduped AS (
        SELECT lang, MIN(doc_id) AS doc_id,
               MIN(n_tokens) AS n_tokens, md5(text) AS content_hash
        FROM quality
        GROUP BY lang, md5(text), text
    ),
    sampled AS (
        SELECT * FROM deduped
        WHERE {duckdb_md5_60bit("CAST(doc_id AS VARCHAR)", salt="corpus")} % 100 < 50
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(n_tokens) AS min_tokens,
           COUNT(DISTINCT content_hash) AS n_distinct
    FROM sampled
    GROUP BY lang
    """,
)
def q95_corpus_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-filter (≥30 tokens) → exact dedup (keep min doc_id per
    (lang, content)) → consistent 50% sample → per-language corpus stats,
    one lazy plan end to end.

    Plan shape at 100 TB: the quality filter and the sampling predicate are
    narrow and both evaluate before any exchange; dedup is one shuffle on
    (lang, digest); the rollup's groupBy reuses partial aggregation. The
    sample hashes the *kept* doc_id so membership is reproducible under
    re-runs of the whole pipeline.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    n_tokens = F.size(F.split("text", " "))
    quality = documents.select(
        "doc_id", "lang", "text", n_tokens.alias("n_tokens")
    ).filter(F.col("n_tokens") >= 30)
    deduped = (
        quality.groupBy("lang", F.md5(F.col("text").cast("binary")).alias("content_hash"), "text")
        .agg(F.min("doc_id").alias("doc_id"), F.min("n_tokens").alias("n_tokens"))
        .drop("text")
    )
    sampled = deduped.filter(
        md5_60bit(F.col("doc_id").cast("string"), salt="corpus") % 100 < 50
    )
    return sampled.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.countDistinct("content_hash").alias("n_distinct"),
    )
