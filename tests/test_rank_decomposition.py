"""Equivalence tests for the histogram-rank decomposition (`_util.
distributed_row_number` + `ntile_from_rank`): the distributed shapes must
reproduce `row_number()`/`NTILE(n)` over a global ORDER BY bit-for-bit —
they replace those windows in every corpus-sized plan (q174/q178/q194/q234).
"""

from __future__ import annotations

import pytest
from pyspark.sql import Window
from pyspark.sql import functions as F

from kinesis_writer_spark.operators._util import distributed_row_number, ntile_from_rank


def _check_against_window(spark, rows, n_tiles, bucket_width):
    df = spark.createDataFrame(rows, "id bigint, score double, seg string").repartition(8)

    got = (
        distributed_row_number(
            df,
            bucket=F.floor(F.col("score") / bucket_width).cast("bigint"),
            order_by=[F.col("score").asc(), F.col("id").asc()],
        )
        .crossJoin(F.broadcast(df.groupBy().agg(F.count(F.lit(1)).alias("n"))))
        .select(
            "id",
            "rn",
            ntile_from_rank(F.col("rn"), F.col("n"), n_tiles).alias("tile"),
        )
    )
    w = Window.orderBy(F.col("score").asc(), F.col("id").asc())
    want = df.select(
        "id",
        F.row_number().over(w).alias("rn"),
        F.ntile(n_tiles).over(w).alias("tile"),
    )
    got_rows = {r.id: (r.rn, r.tile) for r in got.collect()}
    want_rows = {r.id: (r.rn, r.tile) for r in want.collect()}
    assert got_rows == want_rows


class TestDistributedRowNumber:
    @pytest.mark.parametrize("n_tiles", [3, 10])
    def test_matches_global_window_with_ties(self, spark, n_tiles):
        # heavy ties INSIDE buckets and ACROSS the tie-break key
        rows = [(i, float((i * 7) % 13), "s") for i in range(157)]
        _check_against_window(spark, rows, n_tiles, bucket_width=2.5)

    def test_matches_when_total_smaller_than_tiles(self, spark):
        rows = [(i, float(i), "s") for i in range(4)]
        _check_against_window(spark, rows, n_tiles=10, bucket_width=1.0)

    def test_single_bucket_degenerates_to_plain_window(self, spark):
        rows = [(i, float(i % 5), "s") for i in range(40)]
        _check_against_window(spark, rows, n_tiles=4, bucket_width=1e9)

    def test_partitioned_variant_matches_per_segment_window(self, spark):
        rows = [(i, float((i * 11) % 17), "seg%d" % (i % 3)) for i in range(120)]
        df = spark.createDataFrame(rows, "id bigint, score double, seg string").repartition(8)
        got = distributed_row_number(
            df,
            bucket=F.floor("score").cast("bigint"),
            order_by=[F.col("score").asc(), F.col("id").asc()],
            partition_by=["seg"],
        ).select("id", "rn")
        w = Window.partitionBy("seg").orderBy(F.col("score").asc(), F.col("id").asc())
        want = df.select("id", F.row_number().over(w).alias("rn"))
        assert {r.id: r.rn for r in got.collect()} == {
            r.id: r.rn for r in want.collect()
        }

    def test_descending_order_via_negated_bucket(self, spark):
        rows = [(i, float((i * 3) % 11), "s") for i in range(80)]
        df = spark.createDataFrame(rows, "id bigint, score double, seg string")
        got = distributed_row_number(
            df,
            bucket=F.floor(F.col("score") * F.lit(-1.0)).cast("bigint"),
            order_by=[F.col("score").desc(), F.col("id").asc()],
        ).select("id", "rn")
        w = Window.orderBy(F.col("score").desc(), F.col("id").asc())
        want = df.select("id", F.row_number().over(w).alias("rn"))
        assert {r.id: r.rn for r in got.collect()} == {
            r.id: r.rn for r in want.collect()
        }
