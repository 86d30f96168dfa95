"""Property tests for the dataset-assembly operators: consistent-hash
sampling must be a pure function of the key — independent of partitioning,
evaluation order, and engine implementation.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from kinesis_writer_spark.functions.hashing import md5_60bit
from tests.conftest import SF_DIR


def _sample_ids(df):
    bucket = md5_60bit(F.col("doc_id").cast("string"), salt="sample") % 100
    return sorted(r.doc_id for r in df.filter(bucket < 10).select("doc_id").collect())


class TestConsistentSampling:
    def test_membership_invariant_under_partitioning(self, spark):
        docs = kio.load(spark, SF_DIR, "documents")
        base = _sample_ids(docs)
        assert base  # non-trivial sample
        assert _sample_ids(docs.repartition(17)) == base
        assert _sample_ids(docs.coalesce(1)) == base
        assert _sample_ids(docs.repartition(32, "lang")) == base

    def test_membership_stable_after_appends(self, spark):
        """Appending new rows never changes prior membership (incremental
        backfill property): the old corpus's sample is a strict subset."""
        docs = kio.load(spark, SF_DIR, "documents")
        grown = docs.unionByName(
            docs.withColumn("doc_id", F.col("doc_id") + 10_000_000)
        )
        assert set(_sample_ids(docs)).issubset(set(_sample_ids(grown)))

    def test_split_partitions_are_disjoint_and_total(self, spark):
        docs = kio.load(spark, SF_DIR, "documents")
        b = md5_60bit(F.col("doc_id").cast("string"), salt="split") % 100
        assigned = docs.select(
            "doc_id",
            F.when(b < 80, "train").when(b < 90, "valid").otherwise("test").alias("split"),
        )
        counts = {r.split: r.n for r in assigned.groupBy("split").agg(F.count("*").alias("n")).collect()}
        assert sum(counts.values()) == docs.count()
        # each doc appears in exactly one split
        assert assigned.groupBy("doc_id").agg(F.countDistinct("split").alias("k")).filter(
            F.col("k") != 1
        ).count() == 0

    def test_spark_hash_matches_hashlib(self, spark):
        """The Spark-side MD5-60bit expression equals the reference Python
        computation bit-for-bit (the property the DuckDB oracle also relies
        on)."""
        strings = [f"key-{i}-{'x' * (i % 7)}" for i in range(500)]
        df = spark.createDataFrame([(s,) for s in strings], "s string")
        got = {
            r.s: r.h
            for r in df.select("s", md5_60bit(F.col("s")).alias("h")).collect()
        }
        for s in strings:
            expected = int(hashlib.md5(s.encode()).hexdigest()[:15], 16)
            assert got[s] == expected, s


class TestConnectedComponents:
    def test_known_graph(self, spark):
        """Path 1-2-3-4, triangle 10-11-12, lone edge 20-21."""
        from kinesis_writer_spark.operators.dedup import connected_components

        edges = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (10, 11), (11, 12), (10, 12), (20, 21)],
            "src long, dst long",
        )
        comp = {r.node: r.comp for r in connected_components(edges).collect()}
        assert comp == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 20}

    def test_long_chain_converges(self, spark):
        """A 30-node path needs multiple rounds; min label must still reach
        the far end (exercises the iteration/convergence logic)."""
        from kinesis_writer_spark.operators.dedup import connected_components

        edges = spark.createDataFrame(
            [(i, i + 1) for i in range(100, 130)], "src long, dst long"
        )
        comp = {r.node: r.comp for r in connected_components(edges, max_iters=50).collect()}
        assert set(comp.values()) == {100}
        assert len(comp) == 31
