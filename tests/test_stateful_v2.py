"""Stateful streaming KPL batcher: the reference's size-bounded batching
(AggRecord.java:151-184, soft cap KinesisWriter.scala:27-35) run as a
per-key stateful streaming operator, raw-tail state carried across
micro-batches (MyAggregator.scala:10-15 replay representation).

The batching core is bound to both stateful APIs; the
transformWithStateInPandas binding needs google.protobuf (worker protocol)
and auto-skips where that's unavailable.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from kinesis_writer_spark.kpl import MAX_BYTES_PER_RECORD
from kinesis_writer_spark.kpl.deaggregator import deaggregate
from kinesis_writer_spark.streaming.stateful_v2 import (
    TWS_AVAILABLE,
    fold_batches,
    kpl_batch_stream,
    kpl_batch_stream_legacy,
)
from kinesis_writer_spark.streaming.windows import read_event_stream
from tests.conftest import SF_DIR

SOFT_MAX = 300  # tiny soft cap so every key flushes several times

BINDINGS = [
    pytest.param(kpl_batch_stream_legacy, id="applyInPandasWithState"),
    pytest.param(
        kpl_batch_stream,
        id="transformWithStateInPandas",
        marks=pytest.mark.skipif(
            not TWS_AVAILABLE, reason="transformWithState worker needs protobuf"
        ),
    ),
]


@pytest.fixture(scope="module", params=BINDINGS)
def batched(request, spark, tmp_path_factory):
    binding = request.param
    path = str(tmp_path_factory.mktemp("replay") / "events")
    kio.load(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(path)

    stream = read_event_stream(spark, path, max_files_per_trigger=1).select(
        F.col("user_id").cast("string").alias("pk"),
        F.to_json(F.struct("event_id", "user_id", "event_type", "value"))
        .cast("binary")
        .alias("data"),
    )
    name = f"kpl_batches_{request.param_index}"
    q = (
        binding(stream, soft_max_bytes=SOFT_MAX)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    q.stop()
    out = spark.sql(f"SELECT * FROM {name}").collect()

    totals = {
        str(r.pk): r.n
        for r in kio.load(spark, SF_DIR, "events")
        .groupBy(F.col("user_id").cast("string").alias("pk"))
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    return out, totals, n_batches


def test_state_spans_micro_batches(batched):
    _, _, n_batches = batched
    assert n_batches >= 4


def test_every_batch_is_valid_kpl_wire(batched):
    out, _, _ = batched
    assert out, "no batches emitted"
    for row in out:
        wire = bytes(row.wire)
        assert len(wire) == row.batch_bytes <= MAX_BYTES_PER_RECORD
        records = deaggregate(wire)
        assert len(records) == row.n_records >= 1
        for rec in records:
            assert rec.partition_key == row.pk
            assert json.loads(bytes(rec.data))["user_id"] == int(row.pk)


def test_batch_seqs_contiguous_per_key(batched):
    out, _, _ = batched
    by_key: dict[str, list[int]] = {}
    for row in out:
        by_key.setdefault(row.pk, []).append(row.batch_seq)
    assert any(len(v) >= 2 for v in by_key.values()), "soft cap never refilled"
    for pk, seqs in by_key.items():
        assert sorted(seqs) == list(range(len(seqs))), f"gap in seq for {pk}"


def test_residual_tail_bounded_by_soft_cap(batched):
    # flush invariant: the unflushed tail is always < SOFT_MAX framed bytes,
    # so per key (total - emitted) records must fit under the soft cap
    out, totals, _ = batched
    emitted: dict[str, int] = {}
    for row in out:
        emitted[row.pk] = emitted.get(row.pk, 0) + row.n_records
    min_payload = 40  # json of the struct is far bigger; conservative floor
    for pk, total in totals.items():
        residual = total - emitted.get(pk, 0)
        assert residual >= 0
        assert residual * min_payload < SOFT_MAX, (
            f"key {pk}: residual {residual} records cannot fit under the soft cap"
        )


def test_fold_batches_core_invariants():
    # order-preserving: concatenated batch contents + tail == input sequence
    payloads = [f"payload-{i:04d}".encode() for i in range(100)]
    completed, tail = fold_batches("k", iter(payloads), soft_max=256)
    rebuilt = [bytes(r.data) for _, w in completed for r in deaggregate(w)] + tail
    assert rebuilt == payloads
    for _, wire in completed:
        assert len(wire) >= 256 or wire is completed[-1][1]


@pytest.mark.parametrize("binding", BINDINGS)
def test_checkpoint_restart_resumes_state(binding, spark, tmp_path):
    """Kill the query mid-corpus and restart from the checkpoint: batch
    sequences stay contiguous per key, no aggregated record is emitted
    twice, and the unflushed tail carried in the state store survives the
    restart (the replay-from-raw representation, MyAggregator.scala:10-15).
    """
    src = tmp_path / "events"
    events = kio.load(spark, SF_DIR, "events").repartition(6)
    events.write.mode("overwrite").parquet(str(src))
    files = sorted(f.name for f in src.glob("part-*"))
    half = tmp_path / "half"
    half.mkdir()
    for f in files[:3]:
        (half / f).symlink_to(src / f)
    ckpt = str(tmp_path / "ckpt")

    sink = str(tmp_path / "out")

    def run(path: str) -> None:
        stream = read_event_stream(spark, path, max_files_per_trigger=1).select(
            F.col("user_id").cast("string").alias("pk"),
            F.to_json(F.struct("event_id", "user_id", "event_type", "value"))
            .cast("binary")
            .alias("data"),
        )
        q = (
            binding(stream, soft_max_bytes=SOFT_MAX)
            .writeStream.format("parquet")
            .option("path", sink)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        q.stop()

    run(str(half))
    for f in files[3:]:
        (half / f).symlink_to(src / f)
    run(str(half))

    out = spark.read.parquet(sink).collect()
    by_key: dict[str, list[int]] = {}
    for row in out:
        by_key.setdefault(row.pk, []).append(row.batch_seq)
    assert by_key, "no batches emitted across restart"
    for pk, seqs in by_key.items():
        assert sorted(seqs) == list(range(len(seqs))), f"gap/dup in seq for {pk}"
