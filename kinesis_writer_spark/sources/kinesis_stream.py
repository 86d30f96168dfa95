"""Kinesis Structured Streaming source: ``spark.readStream.format("kinesis")``.

The reference library is producer-only — KinesisWriter.scala:46-64 walks the
shard map (``describeStream`` pagination) and :199-228 ships aggregated
records; the consumer half of that contract is the public boto3/KCL surface:

    ``list_shards`` → ``get_shard_iterator`` → ``get_records`` (poll loop)

This module packages that loop as a Spark 4 Python streaming data source so
a stream lands in Structured Streaming as a normal unbounded DataFrame:

    spark.readStream.format("kinesis")
         .option("stream_name", "events")
         .option("client_factory", "my.module:make_client")   # boto3 by default
         .load()
         → shard_id, sequence_number, partition_key, data, arrival_ts

and composes with the rest of the engine: KPL deaggregation
(:func:`..sources.kpl_stream.deaggregate_records` explodes aggregated
payloads), watermarked windows, and the stateful operators.

Offsets are ``{shard_id: last_consumed_sequence_number}`` dicts — the exact
checkpoint shape a KCL lease table keeps — so a restarted query resumes from
its checkpoint without data loss (``readBetweenOffsets`` replays a committed
range deterministically).

Offline testing: no AWS access is required anywhere. ``capture_client_factory``
replays a directory of ``.kpl`` container files (one subdirectory per shard —
the layout ``write_wire_dir`` spills) through the same ``get_records`` API
shape, so the full ``readStream → deaggregate → window`` pipeline runs
hermetically in CI; tests/test_kinesis_stream_source.py does exactly that.

Two reader shapes, same offsets (checkpoint-compatible):

- default: ``SimpleDataSourceStreamReader`` — the driver polls and rows ship
  with the batch plan. Right for control-plane simplicity and low-MB/s
  streams.
- ``.option("reader", "partitioned")``: a full ``DataSourceStreamReader``
  planning ONE input partition per shard slice, each executor task polling
  its own shard — ingest parallelism = shard count, no record bytes through
  the driver. This is the cluster-scale shape; see
  :class:`KinesisPartitionedStreamReader` for its ``latestOffset`` contract.

The sink side is also native: ``payloads.writeStream.format("kinesis")``
runs the reference's producer loop (KPL aggregation → shard-midpoint
routing → retrying PutRecords) per task; ``CaptureSinkClient`` provides the
offline endpoint, landing records as replayable ``.kpl`` captures.
"""

from __future__ import annotations

import importlib
import json
from collections.abc import Iterator
from datetime import datetime, timezone

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    DataSourceStreamReader,
    DataSourceStreamWriter,
    InputPartition,
    SimpleDataSourceStreamReader,
)

#: Raw Kinesis record schema (consumer-side; ``data`` may hold a KPL
#: aggregated record — run deaggregate_records downstream to explode it).
KINESIS_SCHEMA = (
    "shard_id string, sequence_number string, partition_key string, "
    "data binary, arrival_ts timestamp"
)

_EPOCH = datetime(2024, 1, 1, tzinfo=timezone.utc)


def resolve_factory(spec: str, kwargs_json: str | None):
    """Resolve a ``module:callable`` client-factory spec with JSON kwargs.

    The factory contract: ``factory(**kwargs)`` returns an object with the
    boto3 Kinesis consumer surface (``list_shards``, ``get_shard_iterator``,
    ``get_records``). Factories live behind an import string because data
    source options are strings — and because the reader must be able to
    rebuild its client after a driver restart from checkpointed options.
    """
    mod_name, _, attr = spec.partition(":")
    if not attr:
        raise ValueError(f"client_factory must be 'module:callable', got {spec!r}")
    factory = getattr(importlib.import_module(mod_name), attr)
    kwargs = json.loads(kwargs_json) if kwargs_json else {}
    return factory(**kwargs)


def boto3_client_factory(region_name: str | None = None):
    """Default factory: a real boto3 Kinesis client (gated import — the
    engine and its tests run fully offline with the capture factory)."""
    try:
        import boto3  # noqa: PLC0415
    except ImportError as exc:  # pragma: no cover - boto3 absent in CI image
        raise RuntimeError(
            "boto3 is not installed; pass client_factory="
            "'kinesis_writer_spark.sources.kinesis_stream:capture_client_factory' "
            "with client_kwargs={'capture_dir': ...} for offline replay"
        ) from exc
    return boto3.client("kinesis", region_name=region_name)


class CaptureReplayClient:
    """Offline Kinesis consumer: replays ``.kpl`` capture files through the
    boto3 ``get_records`` API shape.

    Layout: ``capture_dir/<shard_id>/*.kpl`` — each container file holds
    length-prefixed aggregated-record frames (``write_wire_dir`` output, the
    shape of an S3 firehose capture). Sequence numbers are the 0-based frame
    index within the shard, so offsets are deterministic run to run.
    """

    def __init__(self, capture_dir: str, partition_key: str = "capture") -> None:
        import glob as _glob
        import os

        from .kpl_datasource import read_wire_file

        self._shards: dict[str, list[bytes]] = {}
        self._pk = partition_key
        for shard_dir in sorted(_glob.glob(os.path.join(capture_dir, "*"))):
            if not os.path.isdir(shard_dir):
                continue
            frames: list[bytes] = []
            for f in sorted(_glob.glob(os.path.join(shard_dir, "*.kpl"))):
                frames.extend(read_wire_file(f))
            self._shards[os.path.basename(shard_dir)] = frames
        if not self._shards:
            raise FileNotFoundError(f"no <shard>/*.kpl captures under {capture_dir}")

    # --- boto3 consumer surface -------------------------------------------
    def list_shards(self, StreamName: str, NextToken: str | None = None, **_):
        shards = [{"ShardId": sid} for sid in sorted(self._shards)]
        return {"Shards": shards}

    def get_shard_iterator(
        self,
        StreamName: str,
        ShardId: str,
        ShardIteratorType: str,
        StartingSequenceNumber: str | None = None,
        **_,
    ):
        if ShardIteratorType == "TRIM_HORIZON":
            idx = 0
        elif ShardIteratorType == "AT_SEQUENCE_NUMBER":
            idx = int(StartingSequenceNumber)
        elif ShardIteratorType == "AFTER_SEQUENCE_NUMBER":
            idx = int(StartingSequenceNumber) + 1
        elif ShardIteratorType == "LATEST":
            idx = len(self._shards[ShardId])
        else:
            raise ValueError(f"unsupported iterator type {ShardIteratorType}")
        return {"ShardIterator": json.dumps({"shard": ShardId, "idx": idx})}

    def get_records(self, ShardIterator: str, Limit: int = 10000, **_):
        state = json.loads(ShardIterator)
        shard, idx = state["shard"], state["idx"]
        frames = self._shards[shard]
        batch = frames[idx : idx + Limit]
        records = [
            {
                "SequenceNumber": str(idx + i),
                "PartitionKey": self._pk,
                "Data": frame,
                "ApproximateArrivalTimestamp": _EPOCH,
            }
            for i, frame in enumerate(batch)
        ]
        next_idx = idx + len(batch)
        return {
            "Records": records,
            "NextShardIterator": json.dumps({"shard": shard, "idx": next_idx}),
            "MillisBehindLatest": 0 if next_idx >= len(frames) else 1,
        }


def capture_client_factory(capture_dir: str, partition_key: str = "capture"):
    return CaptureReplayClient(capture_dir, partition_key)


class CaptureSinkClient:
    """Offline Kinesis PRODUCER endpoint: accepts the boto3 producer surface
    (``describe_stream`` for shard discovery + ``put_records``) and lands
    every aggregated wire record as frames in ``capture_dir/<shard>/*.kpl``
    — the same layout :class:`CaptureReplayClient` and
    ``spark.read.format("kpl")`` consume, so a streaming write can be
    round-tripped hermetically: writeStream("kinesis") → capture → read →
    deaggregate → original payloads.
    """

    def __init__(self, capture_dir: str, num_shards: int = 1) -> None:
        import os

        self._dir = capture_dir
        space = 1 << 128
        self.shards = []
        for i in range(num_shards):
            lo = i * space // num_shards
            hi = (i + 1) * space // num_shards - 1
            sid = f"shardId-{i:012d}"
            self.shards.append(
                {
                    "ShardId": sid,
                    "HashKeyRange": {"StartingHashKey": str(lo), "EndingHashKey": str(hi)},
                    "SequenceNumberRange": {"StartingSequenceNumber": "0"},
                }
            )
            os.makedirs(os.path.join(capture_dir, sid), exist_ok=True)

    def describe_stream(self, StreamName: str, ExclusiveStartShardId: str | None = None, **_):
        shards = self.shards
        if ExclusiveStartShardId is not None:
            ids = [s["ShardId"] for s in shards]
            shards = shards[ids.index(ExclusiveStartShardId) + 1 :]
        return {
            "StreamDescription": {
                "StreamName": StreamName,
                "Shards": shards,
                "HasMoreShards": False,
            }
        }

    def _shard_for(self, ehk: str) -> str:
        v = int(ehk)
        for s in self.shards:
            if int(s["HashKeyRange"]["StartingHashKey"]) <= v <= int(
                s["HashKeyRange"]["EndingHashKey"]
            ):
                return s["ShardId"]
        return self.shards[0]["ShardId"]

    def put_records(self, StreamName: str, Records: list[dict]):
        import os
        import uuid as _uuid

        from .kpl_datasource import write_wire_file

        out = []
        by_shard: dict[str, list[bytes]] = {}
        for rec in Records:
            shard = self._shard_for(rec.get("ExplicitHashKey") or "0")
            by_shard.setdefault(shard, []).append(bytes(rec["Data"]))
            out.append({"SequenceNumber": "0", "ShardId": shard})
        for shard, frames in by_shard.items():
            write_wire_file(
                os.path.join(self._dir, shard, f"part-{_uuid.uuid4().hex}.kpl"), frames
            )
        return {"FailedRecordCount": 0, "Records": out}


def capture_sink_client_factory(capture_dir: str, num_shards: int = 1):
    return CaptureSinkClient(capture_dir, num_shards)


class KinesisSimpleStreamReader(SimpleDataSourceStreamReader):
    """Driver-side polling reader over the boto3 consumer surface.

    Offset format: ``{shard_id: next_sequence_number_to_read}`` (stringly,
    JSON-safe). ``read`` advances every shard by up to ``max_records`` per
    micro-batch; ``readBetweenOffsets`` replays a committed range exactly.
    """

    def __init__(self, options) -> None:
        self._stream = options.get("stream_name", "stream")
        self._factory_spec = options.get(
            "client_factory",
            "kinesis_writer_spark.sources.kinesis_stream:boto3_client_factory",
        )
        self._factory_kwargs = options.get("client_kwargs")
        self._max_records = int(options.get("max_records", "10000"))
        self._starting_position = options.get("starting_position", "TRIM_HORIZON")
        self._client = None

    def _c(self):
        if self._client is None:
            self._client = resolve_factory(self._factory_spec, self._factory_kwargs)
        return self._client

    def _shard_ids(self) -> list[str]:
        client = self._c()
        shard_ids: list[str] = []
        token = None
        while True:  # paginate like KinesisWriter.scala:46-64 walks describeStream
            resp = (
                client.list_shards(StreamName=self._stream, NextToken=token)
                if token
                else client.list_shards(StreamName=self._stream)
            )
            shard_ids.extend(s["ShardId"] for s in resp["Shards"])
            token = resp.get("NextToken")
            if not token:
                return shard_ids

    def initialOffset(self) -> dict:
        # "next index to read" per shard: TRIM_HORIZON starts everything at 0
        if self._starting_position == "LATEST":
            return {
                sid: self._drain_count(sid) for sid in self._shard_ids()
            }
        return {sid: 0 for sid in self._shard_ids()}

    def _drain_count(self, shard_id: str) -> int:
        """Sequence position of LATEST (capture replay: end of shard)."""
        client = self._c()
        it = client.get_shard_iterator(
            StreamName=self._stream, ShardId=shard_id, ShardIteratorType="LATEST"
        )["ShardIterator"]
        state = json.loads(it)
        return int(state.get("idx", 0))

    def _poll_shard(self, shard_id: str, start_idx: int, limit: int):
        client = self._c()
        if start_idx == 0:
            it = client.get_shard_iterator(
                StreamName=self._stream,
                ShardId=shard_id,
                ShardIteratorType="TRIM_HORIZON",
            )["ShardIterator"]
        else:
            it = client.get_shard_iterator(
                StreamName=self._stream,
                ShardId=shard_id,
                ShardIteratorType="AT_SEQUENCE_NUMBER",
                StartingSequenceNumber=str(start_idx),
            )["ShardIterator"]
        return client.get_records(ShardIterator=it, Limit=limit)["Records"]

    def _rows_for(self, shard_id: str, records) -> Iterator[tuple]:
        for rec in records:
            ts = rec.get("ApproximateArrivalTimestamp") or _EPOCH
            if getattr(ts, "tzinfo", None) is not None:
                ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
            yield (
                shard_id,
                rec["SequenceNumber"],
                rec.get("PartitionKey"),
                bytes(rec["Data"]),
                ts,
            )

    def read(self, start: dict):
        rows: list[tuple] = []
        end = dict(start)
        for shard_id in self._shard_ids():
            start_idx = int(start.get(shard_id, 0))
            records = self._poll_shard(shard_id, start_idx, self._max_records)
            rows.extend(self._rows_for(shard_id, records))
            if records:
                end[shard_id] = int(records[-1]["SequenceNumber"]) + 1
            else:
                end.setdefault(shard_id, start_idx)
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict) -> Iterator[tuple]:
        for shard_id, end_idx in end.items():
            start_idx = int(start.get(shard_id, 0))
            n = int(end_idx) - start_idx
            if n <= 0:
                continue
            records = self._poll_shard(shard_id, start_idx, n)
            yield from self._rows_for(shard_id, records[:n])

    def commit(self, end: dict) -> None:
        # at-least-once bookkeeping happens in Spark's checkpoint; a KCL-style
        # lease table would be updated here
        pass


class _ShardSlice(InputPartition):
    def __init__(self, shard_id: str | None, start: int, end: int):
        self.shard_id = shard_id
        self.start = start
        self.end = end


class KinesisPartitionedStreamReader(DataSourceStreamReader):
    """Partition-per-shard reader — the cluster-scale shape: each micro-batch
    plans ONE input partition per shard slice, and every executor task polls
    its own shard over the boto3 surface (``get_shard_iterator`` +
    ``get_records``) directly, so ingest parallelism equals the shard count
    and no record bytes flow through the driver (unlike the Simple reader,
    which polls driver-side).

    Enabled with ``.option("reader", "partitioned")``. Offsets are the same
    ``{shard_id: next_index}`` dicts as the Simple reader, so the two are
    checkpoint-compatible. ``latestOffset`` needs each shard's current end
    position; it derives it from the client's LATEST shard iterator, which
    the capture-replay client (and any KCL-style checkpoint store) exposes
    as an indexable position. A live boto3 iterator is opaque — for live
    streams, bound each batch instead (end = start + max_records) and let
    short reads terminate the slice, which preserves replay determinism
    because Kinesis sequence positions are stable until retention expiry.
    """

    def __init__(self, options) -> None:
        self._options = dict(options)
        self._stream = options.get("stream_name", "stream")
        self._factory_spec = options.get(
            "client_factory",
            "kinesis_writer_spark.sources.kinesis_stream:boto3_client_factory",
        )
        self._factory_kwargs = options.get("client_kwargs")
        # per-shard per-micro-batch admission cap: bounds batch size (and
        # therefore recovery replay) the way maxOffsetsPerTrigger does for
        # Kafka; 0 = unbounded
        self._max_per_batch = int(options.get("max_records_per_batch", "0"))
        self._client = None
        self._last_start: dict | None = None

    def _c(self):
        if self._client is None:
            self._client = resolve_factory(self._factory_spec, self._factory_kwargs)
        return self._client

    def _shard_ids(self) -> list[str]:
        client = self._c()
        out: list[str] = []
        token = None
        while True:
            resp = (
                client.list_shards(StreamName=self._stream, NextToken=token)
                if token
                else client.list_shards(StreamName=self._stream)
            )
            out.extend(s["ShardId"] for s in resp["Shards"])
            token = resp.get("NextToken")
            if not token:
                return out

    def initialOffset(self) -> dict:
        start = {sid: 0 for sid in self._shard_ids()}
        self._last_start = start
        return start

    def latestOffset(self) -> dict:
        client = self._c()
        end = {}
        for sid in self._shard_ids():
            it = client.get_shard_iterator(
                StreamName=self._stream, ShardId=sid, ShardIteratorType="LATEST"
            )["ShardIterator"]
            try:
                avail = int(json.loads(it).get("idx", 0))
                # admission control: cap this batch at max_records_per_batch
                # past the previous batch's end (unbounded on the first call
                # after a restart — the recovered batch re-plans from its
                # checkpointed offsets regardless)
                if self._max_per_batch and self._last_start is not None:
                    floor = int(self._last_start.get(sid, 0))
                    avail = min(avail, floor + self._max_per_batch)
                end[sid] = avail
            except (ValueError, TypeError) as exc:
                raise ValueError(
                    "partitioned reader needs an indexable LATEST position "
                    "(capture replay / KCL checkpoint store); live boto3 "
                    "iterators are opaque — use the default Simple reader or "
                    "a position-exposing client"
                ) from exc
        self._last_start = dict(end)
        return end

    def partitions(self, start: dict, end: dict) -> list[_ShardSlice]:
        slices = [
            _ShardSlice(sid, int(start.get(sid, 0)), int(e))
            for sid, e in end.items()
            if int(e) > int(start.get(sid, 0))
        ]
        # Spark requires >= 1 partition per batch; an empty slice yields no rows
        return slices or [_ShardSlice(None, 0, 0)]

    def read(self, partition: _ShardSlice) -> Iterator[tuple]:
        # executor-side: this task owns one shard slice
        if partition.shard_id is None or partition.end <= partition.start:
            return
        client = resolve_factory(self._factory_spec, self._factory_kwargs)
        idx = partition.start
        while idx < partition.end:
            if idx == 0:
                it = client.get_shard_iterator(
                    StreamName=self._stream,
                    ShardId=partition.shard_id,
                    ShardIteratorType="TRIM_HORIZON",
                )["ShardIterator"]
            else:
                it = client.get_shard_iterator(
                    StreamName=self._stream,
                    ShardId=partition.shard_id,
                    ShardIteratorType="AT_SEQUENCE_NUMBER",
                    StartingSequenceNumber=str(idx),
                )["ShardIterator"]
            records = client.get_records(
                ShardIterator=it, Limit=partition.end - idx
            )["Records"]
            if not records:
                return  # short read: shard drained below the sampled end
            for rec in records:
                ts = rec.get("ApproximateArrivalTimestamp") or _EPOCH
                if getattr(ts, "tzinfo", None) is not None:
                    ts = ts.astimezone(timezone.utc).replace(tzinfo=None)
                yield (
                    partition.shard_id,
                    rec["SequenceNumber"],
                    rec.get("PartitionKey"),
                    bytes(rec["Data"]),
                    ts,
                )
            idx = int(records[-1]["SequenceNumber"]) + 1

    def commit(self, end: dict) -> None:
        pass


class KinesisBatchReader(DataSourceReader):
    """Batch read for backfills: ``spark.read.format("kinesis")`` scans every
    shard from TRIM_HORIZON to the current tip, one input partition per
    shard — the bulk-load twin of the streaming readers (same client
    contract, same record schema), for rebuilding a table from a stream
    retention window or a capture directory without running a query."""

    def __init__(self, options) -> None:
        self._options = options

    def partitions(self):
        r = KinesisPartitionedStreamReader(self._options)
        start, end = r.initialOffset(), r.latestOffset()
        return r.partitions(start, end)

    def read(self, partition):
        return KinesisPartitionedStreamReader(self._options).read(partition)


class KinesisDataSource(DataSource):
    """``format("kinesis")`` — Kinesis consumer as a streaming source, batch
    backfill reader, and streaming sink."""

    @classmethod
    def name(cls) -> str:
        return "kinesis"

    def schema(self) -> str:
        return KINESIS_SCHEMA

    def reader(self, schema) -> "KinesisBatchReader":
        return KinesisBatchReader(self.options)

    def streamReader(self, schema) -> KinesisPartitionedStreamReader:
        if self.options.get("reader") == "partitioned":
            return KinesisPartitionedStreamReader(self.options)
        from pyspark.errors import PySparkNotImplementedError

        # fall back to the Simple (driver-polling) reader
        raise PySparkNotImplementedError(
            errorClass="NOT_IMPLEMENTED", messageParameters={"feature": "streamReader"}
        )

    def simpleStreamReader(self, schema) -> KinesisSimpleStreamReader:
        return KinesisSimpleStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool) -> "KinesisStreamSinkWriter":
        return KinesisStreamSinkWriter(
            self.options, [f.name for f in schema.fields]
        )


class KinesisStreamSinkWriter(DataSourceStreamWriter):
    """``payloads.writeStream.format("kinesis")`` — the reference's producer
    loop (KinesisWriter.scala:147-197: aggregate → route → PutRecords with
    linear back-off) as a first-class Structured Streaming sink.

    Each task builds a client from ``client_factory`` and pushes its
    partition's ``data`` payloads through
    :class:`...sink.KinesisStreamWriter` (exact KPL sizing, shard-midpoint
    routing, retry ×30, replay-from-raw). Delivery is AT-LEAST-ONCE: a
    retried task re-sends its partition for that epoch — the same contract
    as the reference and every PutRecords producer; dedup belongs to the
    consumer (see deaggregate + q36-style dedup-latest).
    """

    def __init__(self, options, field_names: list[str]):
        if "data" not in field_names:
            raise ValueError(f"kinesis sink needs a binary 'data' column, got {field_names}")
        self._stream = options.get("stream_name", "stream")
        self._factory_spec = options.get(
            "client_factory",
            "kinesis_writer_spark.sources.kinesis_stream:boto3_client_factory",
        )
        self._factory_kwargs = options.get("client_kwargs")

    def write(self, iterator):
        from pyspark.sql.datasource import WriterCommitMessage

        from ..sink import KinesisStreamWriter as _Writer

        client = resolve_factory(self._factory_spec, self._factory_kwargs)
        writer = _Writer(self._stream, client)
        n = writer.write(bytes(row["data"]) for row in iterator)
        return WriterCommitMessage()

    def commit(self, messages, batchId) -> None:
        pass  # offsets commit in the streaming checkpoint

    def abort(self, messages, batchId) -> None:
        pass  # at-least-once: partial sends of an aborted epoch may re-send


def register(spark) -> None:
    """Register on a session: ``spark.readStream.format("kinesis")`` and
    ``df.writeStream.format("kinesis")``."""
    spark.dataSource.register(KinesisDataSource)
