"""q54 multi-table SimHash banding invariants (Manku WWW'07 scheme, r10).

Two properties the first-clean-triple dedup must keep:

* EXACTLY-ONCE: the candidate join emits each qualifying pair in exactly
  one table (its first clean block triple), so the output needs no
  distinct — row count equals distinct-pair count.
* EXACT RECALL at the threshold: every pair within hamming <= 3 of 60-bit
  fingerprints appears (pigeonhole over 6 blocks: <= 3 dirty blocks leave
  >= 3 clean ones, so some enumerated triple is fully clean). Pinned
  against a brute-force all-pairs hamming join on the same fingerprints.
"""

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark.operators import dedup

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def pairs(spark):
    return dedup.q54_simhash_neardup(spark, SF).localCheckpoint()


class TestFirstCleanTripleDedup:
    def test_output_is_duplicate_free_without_distinct(self, spark, pairs):
        n = pairs.count()
        nd = pairs.select("doc_a", "doc_b").distinct().count()
        assert n == nd and n > 0

    def test_exact_recall_vs_bruteforce(self, spark, pairs):
        sh = dedup.q53_simhash(spark, SF).localCheckpoint()
        a = sh.select(F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sa"))
        b = sh.select(F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sb"))
        brute = (
            a.crossJoin(b)
            .filter(F.col("doc_a") < F.col("doc_b"))
            .filter(
                F.bit_count(F.col("sa").bitwiseXOR(F.col("sb")))
                <= dedup._HAMMING_MAX
            )
            .select("doc_a", "doc_b")
        )
        banded = pairs.select("doc_a", "doc_b")
        assert brute.exceptAll(banded).isEmpty()  # recall: nothing missed
        assert banded.exceptAll(brute).isEmpty()  # precision: nothing extra
