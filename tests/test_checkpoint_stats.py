"""checkpoint_clean / release_checkpoint (operators/_util.py, r8).

Root cause pinned here: ``localCheckpoint`` truncates lineage but the
LogicalRDD it leaves behind PRESERVES the origin plan's size estimate, and
Catalyst's size-only join estimation multiplies children's BigInt sizes
unboundedly — so an iterative loop that checkpoints each round's k-join
output compounds the estimate geometrically (measured: 35 → 4210 bits in
six CC rounds; by round ~10 of a 44M-edge graph, planning was 180 s of
driver-side BigInteger.multiply with every executor idle).
"""

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark.operators._util import checkpoint_clean, release_checkpoint


@pytest.fixture(scope="module")
def spark():
    from kinesis_writer_spark.session import get_spark

    return get_spark("test_checkpoint_stats")


def _stats_bits(df) -> int:
    return (
        df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes().bit_length()
    )


def _round(labels):
    """One join-heavy iteration of the shape the CC loop runs."""
    other = labels.select(
        F.col("node").alias("j_node"), F.col("comp").alias("j_comp")
    )
    out = labels
    for _ in range(3):
        out = out.join(other, out.comp == other.j_node, "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("j_comp", F.col("comp"))).alias("comp"),
        )
    return out


def test_clean_checkpoint_keeps_stats_bounded_across_rounds(spark):
    labels = spark.range(100).select(
        F.col("id").alias("node"), F.col("id").alias("comp")
    )
    labels = checkpoint_clean(labels)
    for _ in range(5):
        labels = checkpoint_clean(_round(labels))
        # defaultSizeInBytes is 2^63; a k-join round multiplies a few of
        # those, so a healthy round stays well under ~1000 bits. The
        # compounding bug multiplies bit-length by ~k per round (measured
        # 4210 bits by round 5) — this bound catches any regression.
        assert _stats_bits(labels) < 1000
    assert labels.count() == 100


def test_clean_checkpoint_preserves_rows_exactly(spark):
    df = spark.range(50).select(
        F.col("id").alias("node"), (F.col("id") % 7).alias("comp")
    )
    plain = {(r["node"], r["comp"]) for r in df.localCheckpoint().collect()}
    clean_df = checkpoint_clean(df)
    clean = {(r["node"], r["comp"]) for r in clean_df.collect()}
    assert clean == plain
    assert clean_df.schema == df.schema


def test_release_checkpoint_frees_blocks(spark):
    jsc = spark.sparkContext._jsc.sc()

    def n_persistent() -> int:
        return jsc.getPersistentRDDs().size()

    before = n_persistent()
    ck = checkpoint_clean(spark.range(1000).select(F.col("id").alias("node"),
                                                   F.col("id").alias("comp")))
    assert n_persistent() == before + 1
    release_checkpoint(ck)
    assert n_persistent() == before


def test_release_checkpoint_tolerates_plain_frames(spark):
    df = spark.range(10)  # not checkpointed at all — must be a no-op
    release_checkpoint(df)
    plain_ckpt = spark.range(10).localCheckpoint()
    release_checkpoint(plain_ckpt)  # plain checkpoint: released directly
