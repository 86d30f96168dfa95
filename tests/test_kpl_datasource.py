"""Custom Python DataSource tests: round-trip payloads through the KPL
producer into .kpl container files, then scan them back with
``spark.read.format("kpl")`` — per-file partitions, validated framing.
"""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from kinesis_writer_spark.sources.kpl_datasource import (
    read_wire_file,
    register,
    write_wire_dir,
    write_wire_file,
)
from kinesis_writer_spark.sources.kpl_stream import aggregate_payloads
from tests.conftest import SF_DIR


@pytest.fixture(scope="module")
def wire_dir(tmp_path_factory):
    from kinesis_writer_spark.session import get_spark

    spark = get_spark("tests")
    events = kio.load(spark, SF_DIR, "events")
    payloads = events.select(
        F.encode(F.to_json(F.struct("event_id", "value")), "utf-8").alias("data")
    ).repartition(4)
    d = str(tmp_path_factory.mktemp("kpl_capture"))
    write_wire_dir(aggregate_payloads(payloads), d)
    return d


class TestContainerFormat:
    def test_framing_roundtrip(self, tmp_path):
        p = str(tmp_path / "x.kpl")
        frames = [b"abc", b"", b"\x00" * 1024]
        write_wire_file(p, frames)
        assert read_wire_file(p) == frames

    def test_torn_file_fails_loudly(self, tmp_path):
        p = str(tmp_path / "torn.kpl")
        write_wire_file(p, [b"abcdef"])
        with open(p, "r+b") as f:
            f.truncate(7)  # cut mid-frame
        with pytest.raises(ValueError, match="torn"):
            read_wire_file(p)


class TestKplDataSource:
    def test_scan_recovers_every_user_record(self, spark, wire_dir):
        register(spark)
        df = spark.read.format("kpl").load(wire_dir)
        total = kio.load(spark, SF_DIR, "events").count()
        assert df.count() == total
        row = df.first()
        assert row.partition_key == "a"  # reference always sends pk "a"
        # EHK is optional on the wire (AggRecord inherits it only when set)
        assert row.explicit_hash_key is None or int(row.explicit_hash_key) >= 0

    def test_one_partition_per_file(self, spark, wire_dir):
        register(spark)
        df = spark.read.format("kpl").load(wire_dir)
        n_files = len(glob.glob(os.path.join(wire_dir, "*.kpl")))
        assert n_files >= 2  # repartition(4) → multiple captures
        assert df.rdd.getNumPartitions() == n_files
        assert df.select("source_file").distinct().count() == n_files

    def test_payload_content_roundtrips(self, spark, wire_dir):
        register(spark)
        df = spark.read.format("kpl").load(wire_dir)
        back = df.select(F.decode("data", "utf-8").alias("j")).select(
            F.get_json_object("j", "$.event_id").cast("long").alias("event_id")
        )
        expected = kio.load(spark, SF_DIR, "events").select("event_id")
        assert back.distinct().count() == expected.distinct().count()
        assert back.join(expected, "event_id", "left_anti").count() == 0
