"""End-to-end offline test of the Kinesis readStream adapter: KPL-aggregated
records are produced into a capture (one directory per shard), replayed
through the boto3 ``get_records`` API shape by ``CaptureReplayClient``, read
via ``spark.readStream.format("kinesis")``, deaggregated, and windowed —
the reference's north star (Structured Streaming + Kinesis source) with no
network anywhere.
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark.kpl.aggregator import RecordAggregator
from kinesis_writer_spark.sources import kinesis_stream
from kinesis_writer_spark.sources.kpl_datasource import write_wire_file
from kinesis_writer_spark.sources.kpl_stream import deaggregate_records


def _make_capture(tmp_path, shards: dict[str, list[bytes]]) -> str:
    """Aggregate each shard's payloads into KPL wire frames on disk."""
    root = tmp_path / "capture"
    for shard_id, payloads in shards.items():
        agg = RecordAggregator()
        wires: list[bytes] = []
        agg.on_record_complete(lambda rec: wires.append(rec.to_bytes()))
        for p in payloads:
            agg.add_user_record("pk", p)
        tail = agg.clear_and_get()
        if tail is not None:
            wires.append(tail.to_bytes())
        shard_dir = root / shard_id
        os.makedirs(shard_dir)
        write_wire_file(str(shard_dir / "part-0.kpl"), wires)
    return str(root)


def _payloads(shard: int, n: int) -> list[bytes]:
    return [
        json.dumps(
            {
                "user_id": shard * 1000 + i,
                "event_time": f"2024-01-01T00:{i % 60:02d}:00",
            }
        ).encode()
        for i in range(n)
    ]


@pytest.fixture()
def capture_dir(tmp_path):
    return _make_capture(
        tmp_path,
        {
            "shardId-000000000000": _payloads(0, 40),
            "shardId-000000000001": _payloads(1, 25),
        },
    )


def _read_stream(spark, capture_dir):
    kinesis_stream.register(spark)
    return (
        spark.readStream.format("kinesis")
        .option("stream_name", "events")
        .option(
            "client_factory",
            "kinesis_writer_spark.sources.kinesis_stream:capture_client_factory",
        )
        .option("client_kwargs", json.dumps({"capture_dir": capture_dir}))
        .load()
    )


class TestCaptureReplayClient:
    def test_boto3_surface_shapes(self, capture_dir):
        c = kinesis_stream.capture_client_factory(capture_dir)
        shards = c.list_shards(StreamName="events")["Shards"]
        assert [s["ShardId"] for s in shards] == [
            "shardId-000000000000",
            "shardId-000000000001",
        ]
        it = c.get_shard_iterator(
            StreamName="events",
            ShardId="shardId-000000000000",
            ShardIteratorType="TRIM_HORIZON",
        )["ShardIterator"]
        out = c.get_records(ShardIterator=it, Limit=100)
        assert out["Records"], "capture should hold aggregated frames"
        assert out["Records"][0]["SequenceNumber"] == "0"
        # paging: AT_SEQUENCE_NUMBER resumes exactly where the offset says
        it2 = c.get_shard_iterator(
            StreamName="events",
            ShardId="shardId-000000000000",
            ShardIteratorType="AT_SEQUENCE_NUMBER",
            StartingSequenceNumber="1",
        )["ShardIterator"]
        out2 = c.get_records(ShardIterator=it2, Limit=100)
        assert all(int(r["SequenceNumber"]) >= 1 for r in out2["Records"])


class TestKinesisReadStream:
    def test_stream_deaggregate_roundtrip(self, spark, capture_dir, tmp_path):
        raw = _read_stream(spark, capture_dir)
        assert raw.isStreaming
        user_records = deaggregate_records(raw, wire_col="data", strict=False)
        q = (
            user_records.writeStream.format("memory")
            .queryName("kinesis_user_records")
            .option("checkpointLocation", str(tmp_path / "ckpt1"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM kinesis_user_records").collect()
        # every produced payload comes back exactly once
        assert len(got) == 40 + 25
        users = sorted(json.loads(bytes(r["data"]))["user_id"] for r in got)
        assert users == sorted(
            list(range(0, 40)) + list(range(1000, 1025))
        )

    def test_stream_window_aggregation(self, spark, capture_dir, tmp_path):
        raw = _read_stream(spark, capture_dir)
        events = deaggregate_records(raw, wire_col="data", strict=False).select(
            F.from_json(
                F.col("data").cast("string"),
                "user_id long, event_time timestamp",
            ).alias("e")
        ).select("e.user_id", "e.event_time")
        counts = (
            events.withWatermark("event_time", "10 minutes")
            .groupBy(F.window("event_time", "15 minutes").alias("w"))
            .agg(F.count(F.lit(1)).alias("n_events"))
        )
        # complete mode: a single availableNow micro-batch emits every window
        # (append would hold all windows open until a later batch advances
        # the watermark past them)
        q = (
            counts.writeStream.format("memory")
            .queryName("kinesis_windows")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt2"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT w.start AS start, n_events FROM kinesis_windows ORDER BY start"
        ).collect()
        # event minutes are i%60 for i<40 (shard 0) and i<25 (shard 1):
        # [00:00,00:15) gets 15+15=30, [00:15,00:30) 15+10=25, [00:30,00:45) 10
        by_start = {r["start"].minute: r["n_events"] for r in rows}
        assert by_start.get(0) == 30
        assert by_start.get(15) == 25
        assert by_start.get(30) == 10

    def test_checkpoint_resume_no_duplicates(self, spark, capture_dir, tmp_path):
        ckpt = str(tmp_path / "ckpt3")
        out = str(tmp_path / "out")
        for _ in range(2):  # second run resumes from the checkpoint
            raw = _read_stream(spark, capture_dir)
            q = (
                deaggregate_records(raw, wire_col="data", strict=False)
                .writeStream.format("parquet")
                .option("path", out)
                .option("checkpointLocation", ckpt)
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        # exactly-once across restart: committed offsets are never re-read,
        # so the file sink holds each user record exactly once
        n = spark.read.parquet(out).count()
        assert n == 40 + 25, f"expected no duplicates after resume, got {n}"


class TestKinesisStreamSink:
    """writeStream.format('kinesis'): the reference's producer loop as a
    native Structured Streaming sink, round-tripped offline through the
    capture layout."""

    def test_writestream_roundtrip(self, spark, tmp_path):
        from kinesis_writer_spark.sources import kinesis_stream, kpl_datasource

        kinesis_stream.register(spark)
        sink_dir = str(tmp_path / "sink_capture")
        # a small file-backed stream of payload rows
        src_dir = tmp_path / "src"
        os.makedirs(src_dir)
        payloads = [f"msg-{i:03d}".encode() for i in range(300)]
        spark.createDataFrame([(p,) for p in payloads], "data binary").write.mode(
            "overwrite"
        ).parquet(str(src_dir / "p"))
        stream = spark.readStream.schema("data binary").parquet(str(src_dir / "p"))
        q = (
            stream.writeStream.format("kinesis")
            .option("stream_name", "out-stream")
            .option(
                "client_factory",
                "kinesis_writer_spark.sources.kinesis_stream:capture_sink_client_factory",
            )
            .option("client_kwargs", json.dumps({"capture_dir": sink_dir, "num_shards": 2}))
            .option("checkpointLocation", str(tmp_path / "ckpt_sink"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        # the capture dir now holds KPL containers; the batch DataSource
        # deaggregates them back into the original user-record payloads
        kpl_datasource.register(spark)
        back = spark.read.format("kpl").load(sink_dir + "/*/*.kpl")
        got = sorted(bytes(r["data"]) for r in back.collect())
        assert got == sorted(payloads)


class TestPartitionedReader:
    """option('reader','partitioned'): one input partition per shard slice,
    executor-side polling — the cluster-scale upgrade path, checkpoint-
    compatible with the Simple reader."""

    def test_partition_planning(self, capture_dir):
        from kinesis_writer_spark.sources.kinesis_stream import (
            KinesisPartitionedStreamReader,
        )

        r = KinesisPartitionedStreamReader(
            {
                "stream_name": "events",
                "client_factory": "kinesis_writer_spark.sources.kinesis_stream:capture_client_factory",
                "client_kwargs": json.dumps({"capture_dir": capture_dir}),
            }
        )
        start, end = r.initialOffset(), r.latestOffset()
        assert set(start) == set(end) and all(e > 0 for e in end.values())
        parts = r.partitions(start, end)
        assert len(parts) == 2  # one per shard
        rows = list(r.read(parts[0])) + list(r.read(parts[1]))
        # frames (aggregated records) per shard, not user records
        assert len(rows) == sum(end.values())
        assert {t[0] for t in rows} == set(end)

    def test_partitioned_roundtrip_matches_simple(self, spark, capture_dir, tmp_path):
        raw = (
            spark.readStream.format("kinesis")
            .option("stream_name", "events")
            .option("reader", "partitioned")
            .option(
                "client_factory",
                "kinesis_writer_spark.sources.kinesis_stream:capture_client_factory",
            )
            .option("client_kwargs", json.dumps({"capture_dir": capture_dir}))
            .load()
        )
        q = (
            deaggregate_records(raw, wire_col="data", strict=False)
            .writeStream.format("memory")
            .queryName("kinesis_partitioned")
            .option("checkpointLocation", str(tmp_path / "ckpt_part"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = spark.sql("SELECT * FROM kinesis_partitioned").collect()
        assert len(got) == 40 + 25
        users = sorted(json.loads(bytes(r["data"]))["user_id"] for r in got)
        assert users == sorted(list(range(0, 40)) + list(range(1000, 1025)))

    def test_rate_limited_batches(self, tmp_path):
        from kinesis_writer_spark.sources.kinesis_stream import (
            KinesisPartitionedStreamReader,
        )

        # 3 single-frame containers per shard -> 3 sequence positions
        root = tmp_path / "multi"
        for sid in ("shardId-000000000000", "shardId-000000000001"):
            os.makedirs(root / sid)
            for i in range(3):
                agg = RecordAggregator()
                agg.add_user_record("pk", f"{sid}-{i}".encode())
                rec = agg.clear_and_get()
                write_wire_file(str(root / sid / f"part-{i}.kpl"), [rec.to_bytes()])
        r = KinesisPartitionedStreamReader(
            {
                "stream_name": "events",
                "client_factory": "kinesis_writer_spark.sources.kinesis_stream:capture_client_factory",
                "client_kwargs": json.dumps({"capture_dir": str(root)}),
                "max_records_per_batch": "1",
            }
        )
        start = r.initialOffset()
        e1 = r.latestOffset()
        assert all(e - int(start.get(s, 0)) <= 1 for s, e in e1.items())
        e2 = r.latestOffset()  # next batch advances by at most 1 more
        assert all(e2[s] - e1[s] <= 1 for s in e2)
        assert sum(e2.values()) > sum(e1.values())  # and it does advance
        e3 = r.latestOffset()
        assert all(v == 3 for v in e3.values())  # reaches the tip, never past


class TestKinesisBatchRead:
    def test_batch_backfill(self, spark, capture_dir):
        kinesis_stream.register(spark)
        df = (
            spark.read.format("kinesis")
            .option("stream_name", "events")
            .option(
                "client_factory",
                "kinesis_writer_spark.sources.kinesis_stream:capture_client_factory",
            )
            .option("client_kwargs", json.dumps({"capture_dir": capture_dir}))
            .load()
        )
        assert not df.isStreaming
        user_records = deaggregate_records(df, wire_col="data", strict=False)
        users = sorted(
            json.loads(bytes(r["data"]))["user_id"] for r in user_records.collect()
        )
        assert users == sorted(list(range(0, 40)) + list(range(1000, 1025)))


class TestKinesisToStatefulPipeline:
    """The full streaming-analytics composition: Kinesis source → KPL
    deaggregate → parse → session-window aggregation — every stage of the
    engine's streaming story on one query."""

    def test_kinesis_sessionization(self, spark, tmp_path):
        # payloads with two sessions per user (> 10 min gap between them)
        def evts(uid, minutes):
            return [
                json.dumps(
                    {"user_id": uid, "value": 1.0,
                     "event_time": f"2024-01-01T00:{m:02d}:00"}
                ).encode()
                for m in minutes
            ]

        capture = _make_capture(
            tmp_path,
            {
                # user 1: events at :00-:02 and :30-:31 -> 2 sessions
                # user 2: events at :05-:06 -> 1 session
                "shardId-000000000000": evts(1, [0, 1, 2, 30, 31]),
                "shardId-000000000001": evts(2, [5, 6]),
            },
        )
        raw = _read_stream(spark, capture)
        events = (
            deaggregate_records(raw, wire_col="data", strict=False)
            .select(
                F.from_json(
                    F.col("data").cast("string"),
                    "user_id long, value double, event_time timestamp",
                ).alias("e")
            )
            .select("e.user_id", "e.value", F.col("e.event_time").alias("ts"))
        )
        sessions = (
            events.withWatermark("ts", "1 hour")
            .groupBy(F.session_window("ts", "10 minutes").alias("w"), "user_id")
            .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total"))
        )
        q = (
            sessions.writeStream.format("memory")
            .queryName("kinesis_sessions")
            .outputMode("complete")
            .option("checkpointLocation", str(tmp_path / "ckpt_sess"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        rows = spark.sql(
            "SELECT user_id, n_events FROM kinesis_sessions ORDER BY user_id, n_events"
        ).collect()
        got = [(r["user_id"], r["n_events"]) for r in rows]
        # user 1: one 3-event session + one 2-event session; user 2: 2 events
        assert got == [(1, 2), (1, 3), (2, 2)]
