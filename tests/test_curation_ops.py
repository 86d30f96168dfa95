"""Invariant tests for the cluster-aware split (q255): no near-dup cluster
may straddle two splits — the leakage mode the operator exists to prevent."""

from __future__ import annotations

from pyspark.sql import functions as F

from tests.conftest import SF_DIR


def test_no_cluster_spans_splits(spark):
    from kinesis_writer_spark.functions.hashing import md5_60bit
    from kinesis_writer_spark.operators._util import tables
    from kinesis_writer_spark.operators.dedup import _neardup_components

    (documents,) = tables(spark, SF_DIR, "documents")
    comps = _neardup_components(spark, SF_DIR)
    rep = documents.select("doc_id").join(
        comps, documents.doc_id == comps.node, "left"
    ).select(
        "doc_id",
        F.coalesce(F.col("comp"), F.col("doc_id")).alias("rep_id"),
        F.col("node").isNotNull().alias("in_cluster"),
    )
    b = md5_60bit(F.col("rep_id").cast("string"), salt="leakage") % 100
    assigned = rep.select(
        "rep_id",
        "in_cluster",
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test").alias("split"),
    )
    spanning = (
        assigned.filter("in_cluster")
        .groupBy("rep_id")
        .agg(F.countDistinct("split").alias("n_splits"))
        .filter(F.col("n_splits") > 1)
        .count()
    )
    assert spanning == 0

    # sanity: there ARE clusters (the invariant is non-vacuous) and the
    # registered query reports the same totals
    n_clusters = assigned.filter("in_cluster").select("rep_id").distinct().count()
    assert n_clusters > 0

    from kinesis_writer_spark.registry import get

    card = get("q255_cluster_aware_split").fn(spark, SF_DIR)
    agg = card.agg(
        F.sum("n_docs").alias("docs"), F.sum("n_clusters").alias("cl")
    ).first()
    assert agg["docs"] == documents.count()
    assert agg["cl"] == n_clusters


def test_per_doc_split_would_leak(spark):
    """Contrast: the naive per-doc hash split DOES separate near-dup pairs
    (on this corpus), which is exactly why q255 hashes the cluster rep."""
    from kinesis_writer_spark.functions.hashing import md5_60bit
    from kinesis_writer_spark.operators.dedup import _neardup_pairs

    pairs = _neardup_pairs(spark, SF_DIR)

    def split_of(col):
        b = md5_60bit(col.cast("string"), salt="split") % 100
        return F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")

    leaked = pairs.filter(
        split_of(F.col("doc_a")) != split_of(F.col("doc_b"))
    ).count()
    assert leaked > 0
