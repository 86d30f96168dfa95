"""Partitioned-layout write + partition-pruned read: the 100 TB scan story.

Writes events partitioned by event_type, then proves a type-filtered query
(a) reads only the matching directory (PartitionFilters in the scan) and
(b) returns the same rows as the unpartitioned table.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from tests.conftest import SF_DIR
from tests.test_plans import formatted_plan


@pytest.fixture(scope="module")
def partitioned_dir(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_by_type"))
    kio.load(spark, SF_DIR, "events").write.mode("overwrite").partitionBy("event_type").parquet(path)
    return path


def test_partition_filter_reaches_scan(spark, partitioned_dir):
    df = spark.read.parquet(partitioned_dir).filter(F.col("event_type") == "purchase")
    plan = formatted_plan(df)
    assert "PartitionFilters" in plan
    assert "isnotnull(event_type" in plan or "event_type" in plan.split("PartitionFilters", 1)[1].split("\n")[0]


def test_pruned_read_matches_unpartitioned(spark, partitioned_dir):
    pruned = (
        spark.read.parquet(partitioned_dir)
        .filter(F.col("event_type") == "purchase")
        .select("event_id")
    )
    full = (
        kio.load(spark, SF_DIR, "events")
        .filter(F.col("event_type") == "purchase")
        .select("event_id")
    )
    assert sorted(r.event_id for r in pruned.collect()) == sorted(
        r.event_id for r in full.collect()
    )


def test_approx_count_distinct_error_bound(spark):
    """Backs the q16 docstring claim: HLL++ estimate within 2% at rsd=0.02."""
    lineitem = kio.load(spark, SF_DIR, "lineitem")
    row = lineitem.agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("approx"),
        F.countDistinct("l_orderkey").alias("exact"),
    ).collect()[0]
    assert abs(row.approx - row.exact) / row.exact < 0.02
