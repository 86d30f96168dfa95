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


class TestPartitionedCheckpoint:
    """checkpoint_partitioned (r9, VERDICT task #2): above the labels
    broadcast gate the CC loop pays the edge-list exchange ONCE — the
    checkpointed LogicalRDD must carry hashpartitioning + sort order so
    every round's sort-merge join leaves that side exchange-free."""

    def test_partitioned_checkpoint_layout_survives_join(self, spark):
        from kinesis_writer_spark.operators._util import checkpoint_partitioned

        big = spark.range(5_000).select(
            (F.col("id") % 1_000).alias("b"), F.col("id").alias("a")
        )
        big_ck = checkpoint_partitioned(big, "b")
        small = spark.range(1_000).select(
            F.col("id").alias("node"), F.col("id").alias("comp")
        )
        prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        try:
            joined = big_ck.join(small, big_ck.b == small.node).groupBy("a").count()
            joined.collect()
            plan = joined._jdf.queryExecution().executedPlan().toString()
        finally:
            spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        # One exchange for the probe (small) side, one for the groupBy —
        # NONE for the checkpointed edge side. Without the AQE-off
        # checkpoint the LogicalRDD reports UnknownPartitioning and the
        # same plan shows 3 exchanges + 2 sorts (measured, Spark 4.1).
        # Under AQE toString() prints Final AND Initial plan sections;
        # assert on the final one only.
        final = plan.split("== Initial Plan ==")[0]
        n_exchange = final.count("Exchange hashpartitioning")
        n_sort = final.count("+- Sort ")
        assert n_exchange <= 2, final
        assert n_sort <= 1, final
        release_checkpoint(big_ck)

    def test_plain_checkpoint_loses_layout_under_aqe(self, spark):
        """Documents WHY checkpoint_partitioned disables AQE for the
        checkpoint statement: under AQE the executed plan reports
        UnknownPartitioning at checkpoint time. If a Spark upgrade fixes
        this, the helper's AQE toggle can go."""
        nparts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        df = (
            spark.range(1_000)
            .select((F.col("id") % 100).alias("b"), F.col("id").alias("a"))
            .repartition(nparts, F.col("b"))
            .sortWithinPartitions("b")
            .localCheckpoint()
        )
        out_part = (
            df._jdf.queryExecution().optimizedPlan().outputPartitioning().toString()
        )
        assert "Unknown" in out_part, out_part
        release_checkpoint(df)

    def test_above_gate_minlabel_and_star_still_correct(self, spark, monkeypatch):
        """Force the >gate path (labels never broadcast, edge list
        partition-checkpointed) on both algorithms; labels must match the
        in-driver union-find exactly."""
        from kinesis_writer_spark.operators import dedup

        monkeypatch.setattr(dedup, "CC_LABELS_BROADCAST_MAX_ROWS", 0)
        pairs = (
            [(i, j) for i in range(30, 34) for j in range(i + 1, 34)]
            + [(100 + i, 100 + i + 1) for i in range(20)]
            + [(33, 100)]
        )
        df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
        want = {
            r["node"]: r["comp"]
            for r in dedup.connected_components(df, src="doc_a", dst="doc_b").collect()
        }
        for algo in ("minlabel", "star"):
            got = {
                r["node"]: r["comp"]
                for r in dedup.connected_components(
                    df,
                    src="doc_a",
                    dst="doc_b",
                    driver_max_edges=0,
                    algorithm=algo,
                    max_iters=60,
                ).collect()
            }
            assert got == want, algo


def test_bpe_merge_loop_stats_stay_clamped(spark):
    """r9 (VERDICT task #5): the BPE trainer's per-round plan is
    seqs ⨯ broadcast(best-limit-1) with a plain localCheckpoint — exempt
    from the compounding-stats blowup because the limit(1) clamps the
    best-side estimate to ~1 row before it is checkpointed. That exemption
    was previously claimed by analysis only; pin it so a refactor that
    drops the limit-clamp (or checkpoints before the limit) can't silently
    reintroduce geometric growth. Measured today: flat 6 bits across 12
    rounds; the bound below catches any multiplicative regime."""
    from kinesis_writer_spark.operators.tokenizer_ops import _learn_merges

    docs = spark.createDataFrame(
        [(i, "the quick brown fox jumps over the lazy dog banana bandana " * 3)
         for i in range(20)],
        "doc_id bigint, text string",
    )
    bests = _learn_merges(docs, rounds=12)
    bits = [_stats_bits(b) for b in bests]
    assert all(b < 64 for b in bits), bits
    diffs = [b2 - b1 for b1, b2 in zip(bits, bits[1:])]
    assert all(d <= 8 for d in diffs), bits


def test_above_gate_pagerank_still_bit_identical(spark, monkeypatch):
    """r9: PageRank's above-gate power iterations got the same one-time
    partitioned-checkpoint edge layout as CC; ranks must stay bit-identical
    to the numpy fast path with the broadcast gate forced off."""
    import random

    from kinesis_writer_spark.operators import dedup

    rng = random.Random(5)
    pairs = sorted({(rng.randrange(50), rng.randrange(50)) for _ in range(90)})
    pairs = [(a, b) for a, b in pairs if a != b]
    df = spark.createDataFrame(pairs, "doc_a bigint, doc_b bigint")
    bi = (
        df.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(df.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .distinct()
        .localCheckpoint()
    )
    fast = {
        r["node"]: (r["rank_1e6"], r["degree"])
        for r in dedup._integer_pagerank(bi).collect()
    }
    monkeypatch.setattr(dedup, "CC_LABELS_BROADCAST_MAX_ROWS", 0)
    dist = {
        r["node"]: (r["rank_1e6"], r["degree"])
        for r in dedup._integer_pagerank(bi, driver_max_edges=0).collect()
    }
    assert dist == fast
