"""Custom Python DataSource (Spark 4 API): ``spark.read.format("kpl")``.

Registers the KPL wire format as a first-class Spark source: a directory of
``.kpl`` container files (each a sequence of length-prefixed aggregated
records — the shape of an S3 firehose capture) scans directly into the
deaggregated user-record DataFrame, one input partition per file.

This is the idiomatic Spark 4 packaging of the consumer path in
:mod:`.kpl_stream` (reference contract: awslabs/kinesis-aggregation
deaggregation; wire format per AggRecord.java:61-74 — magic ``F3899AC2`` +
protobuf + MD5 trailer). The mapInPandas variant remains for streaming; the
DataSource variant gives planners a real scan node with per-file task
parallelism, usable from SQL (``CREATE TABLE ... USING kpl`` semantics) and
`spark.read` alike.

Container framing: ``[uint32 BE frame length][frame bytes]`` repeated. The
aggregated record frame itself is self-validating (MD5 trailer), so torn
files fail loudly in the reader.
"""

from __future__ import annotations

import glob as _glob
import os
import struct
import uuid

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: DataFrame schema produced by the source.
KPL_SCHEMA = (
    "partition_key string, explicit_hash_key string, data binary, source_file string"
)

_LEN = struct.Struct(">I")


def write_wire_file(path: str, frames: list[bytes]) -> None:
    """Write one ``.kpl`` container: length-prefixed aggregated-record frames."""
    with open(path, "wb") as f:
        for frame in frames:
            f.write(_LEN.pack(len(frame)))
            f.write(frame)


def read_wire_file(path: str) -> list[bytes]:
    """Read back every frame of a ``.kpl`` container (validates framing)."""
    frames = []
    with open(path, "rb") as f:
        while True:
            head = f.read(4)
            if not head:
                break
            if len(head) != 4:
                raise ValueError(f"{path}: torn length prefix")
            (n,) = _LEN.unpack(head)
            frame = f.read(n)
            if len(frame) != n:
                raise ValueError(f"{path}: torn frame (want {n}, got {len(frame)})")
            frames.append(frame)
    return frames


def write_wire_dir(wire_df, directory: str, wire_col: str = "wire") -> None:
    """Spill a DataFrame of aggregated wire records into ``.kpl`` container
    files, one file per partition (executor-side, no driver collect)."""
    os.makedirs(directory, exist_ok=True)

    def dump(rows) -> None:
        frames = [bytes(r[wire_col]) for r in rows]
        if frames:
            write_wire_file(
                os.path.join(directory, f"part-{uuid.uuid4().hex}.kpl"), frames
            )

    wire_df.foreachPartition(dump)


class _FilePartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class KplDataSource(DataSource):
    """``format("kpl")`` — scan KPL container files as user records."""

    @classmethod
    def name(cls) -> str:
        return "kpl"

    def schema(self) -> str:
        return KPL_SCHEMA

    def reader(self, schema) -> "KplReader":
        return KplReader(self.options)


class KplReader(DataSourceReader):
    def __init__(self, options):
        path = options.get("path")
        if not path:
            raise ValueError("kpl source requires a path: spark.read.format('kpl').load(dir)")
        self.path = path

    def partitions(self):
        if os.path.isdir(self.path):
            files = sorted(_glob.glob(os.path.join(self.path, "*.kpl")))
        else:
            files = sorted(_glob.glob(self.path))
        if not files:
            raise FileNotFoundError(f"no .kpl files under {self.path}")
        return [_FilePartition(p) for p in files]

    def read(self, partition):
        # runs on executors: decode every frame of this partition's file
        from ..kpl import deaggregator

        for frame in read_wire_file(partition.path):
            for rec in deaggregator.deaggregate(frame):
                yield (rec.partition_key, rec.explicit_hash_key, rec.data, partition.path)


def register(spark) -> None:
    """Register the source on a session: ``spark.read.format("kpl")``."""
    spark.dataSource.register(KplDataSource)
