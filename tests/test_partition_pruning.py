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


def test_resize_payload_shapes(spark):
    """Fake-codec resize: fixed output size, originals preserved."""
    from kinesis_writer_spark.operators.multimodal import resize_payload

    df = spark.createDataFrame(
        [(1, b"short"), (2, b"x" * 5000)], "doc_id long, payload binary"
    )
    rows = {r.doc_id: r for r in resize_payload(df, target_bytes=1024).collect()}
    assert len(bytes(rows[1].resized)) == 1024 and rows[1].orig_bytes == 5
    assert len(bytes(rows[2].resized)) == 1024 and rows[2].orig_bytes == 5000
    assert bytes(rows[1].resized)[:5] == b"short"


def test_frame_sample_every_n(spark):
    from kinesis_writer_spark.operators.multimodal import FRAME_BYTES, frame_sample

    payload = bytes(range(256)) * 10  # 10 frames of 256B
    df = spark.createDataFrame([(7, payload)], "doc_id long, payload binary")
    rows = frame_sample(df, keep=("doc_id",), every_n=4).collect()
    assert [r.frame_idx for r in rows] == [0, 4, 8]
    assert all(r.frame_len == FRAME_BYTES for r in rows)
    assert bytes(rows[1].frame) == payload[4 * FRAME_BYTES : 5 * FRAME_BYTES]
