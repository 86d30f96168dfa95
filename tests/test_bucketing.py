"""Bucketed co-located join: pre-bucketing both tables on the join key lets
the join run with ZERO exchanges — the plan-level proof of the 100 TB
strategy for repeated fact-fact joins (SCALE.md).
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from tests.conftest import SF_DIR
from tests.test_plans import formatted_plan


@pytest.fixture(scope="module")
def bucketed(spark, tmp_path_factory):
    # managed tables land in the session's default warehouse; DROP TABLE at
    # teardown removes the files (warehouse.dir is a static conf)
    orders = kio.load(spark, SF_DIR, "orders")
    lineitem = kio.load(spark, SF_DIR, "lineitem")
    (
        orders.write.mode("overwrite")
        .bucketBy(8, "o_orderkey")
        .sortBy("o_orderkey")
        .saveAsTable("orders_b")
    )
    (
        lineitem.write.mode("overwrite")
        .bucketBy(8, "l_orderkey")
        .sortBy("l_orderkey")
        .saveAsTable("lineitem_b")
    )
    yield spark.table("orders_b"), spark.table("lineitem_b")
    spark.sql("DROP TABLE IF EXISTS orders_b")
    spark.sql("DROP TABLE IF EXISTS lineitem_b")


def test_bucketed_join_has_no_shuffle(spark, bucketed):
    orders_b, lineitem_b = bucketed
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")  # force SMJ path
    try:
        joined = lineitem_b.join(orders_b, F.col("l_orderkey") == F.col("o_orderkey")).select(
            "l_orderkey", "o_totalprice", "l_quantity"
        )
        plan = formatted_plan(joined)
        assert "SortMergeJoin" in plan
        assert "+- Exchange" not in plan, "bucketed join must not shuffle either side"
        # and it still computes the right thing
        expected = (
            kio.load(spark, SF_DIR, "lineitem")
            .join(kio.load(spark, SF_DIR, "orders"), F.col("l_orderkey") == F.col("o_orderkey"))
            .count()
        )
        assert joined.count() == expected
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
