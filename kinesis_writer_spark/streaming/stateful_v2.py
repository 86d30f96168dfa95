"""Stateful streaming KPL batcher: the reference's size-bounded batching
(AggRecord.java:151-184, RecordAggregator.java:72-95) with the writer's
soft-cap flush rule (KinesisWriter.scala:27-35), run as a per-key Spark
stateful operator whose unflushed tail survives across micro-batches.

State is the *raw payload list* — exactly the replay-from-raw representation
the reference keeps in ``MyAggregator`` (MyAggregator.scala:10-15): every
micro-batch rebuilds the in-progress ``AggRecordBuilder`` from the stored
tail (re-running the exact varint size arithmetic, so a restart can never
produce different bytes than a straight-through run), folds the new rows in,
emits one output row per *completed* aggregated record with its actual KPL
wire bytes, and stores the new tail back.

Two API bindings over one batching core:

- ``kpl_batch_stream`` — Spark 4 ``transformWithStateInPandas``
  (StatefulProcessor + ListState/ValueState). The TWS Python worker protocol
  requires ``google.protobuf`` at runtime; ``TWS_AVAILABLE`` gates it.
- ``kpl_batch_stream_legacy`` — ``applyInPandasWithState`` (GroupState),
  dependency-free; same semantics, same core.

Scale notes: state is hash-partitioned by key across executors (state store
per shuffle partition); the flush invariant bounds per-key state below the
soft cap, so total state = active-keys × soft_max regardless of stream
length. Output mode is append — completed batches are immutable facts.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

from ..kpl import AggRecordBuilder

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

# the TWS worker protocol needs protobuf; absent in minimal installs, but a
# vendored pure-python runtime may be reachable through the compat shim (must
# engage BEFORE the SparkSession exists so workers inherit the PYTHONPATH)
from ..compat.protobuf_fallback import ensure_protobuf  # noqa: E402

TWS_AVAILABLE = ensure_protobuf()

#: output: one row per completed KPL aggregated record
OUTPUT_SCHEMA = (
    "pk string, batch_seq bigint, n_records int, batch_bytes int, wire binary"
)

#: the writer's soft flush cap (KinesisWriter.scala:35)
DEFAULT_SOFT_MAX = 1_000_000


def fold_batches(
    pk: str, payloads: Iterator[bytes], soft_max: int
) -> tuple[list[tuple[int, bytes]], list[bytes]]:
    """Run the add-then-flush loop: returns (completed [(n_records, wire)],
    unflushed tail payloads). Protocol cap handled by the builder's
    flush-then-re-add branch (RecordAggregator.java:87-94)."""
    agg = AggRecordBuilder()
    pending: list[bytes] = []
    completed: list[tuple[int, bytes]] = []

    def flush() -> None:
        completed.append((agg.num_user_records, agg.to_bytes()))
        agg.clear()
        pending.clear()

    for data in payloads:
        if not agg.add_user_record(pk, data):
            flush()  # would exceed the 1 MiB protocol cap
            agg.add_user_record(pk, data)
        pending.append(data)
        if agg.size_bytes >= soft_max:
            flush()
    return completed, pending


def _make_output(pk: str, first_seq: int, completed: list[tuple[int, bytes]]):
    import pandas as pd

    return pd.DataFrame(
        {
            "pk": [pk] * len(completed),
            "batch_seq": [first_seq + i for i in range(len(completed))],
            "n_records": [n for n, _ in completed],
            "batch_bytes": [len(w) for _, w in completed],
            "wire": [w for _, w in completed],
        }
    )


# -- Spark 4 transformWithStateInPandas binding ------------------------------


def _make_processor(soft_max_bytes: int):
    """Deferred so importing this module never requires the TWS stack."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    class KplBatchProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._tail = handle.getListState("tail", "data binary")
            self._seq = handle.getValueState("seq", "next_seq bigint")

        def handleInputRows(
            self, key, rows: Iterator["pd.DataFrame"], timerValues
        ) -> Iterator["pd.DataFrame"]:
            (pk,) = key
            next_seq = self._seq.get()[0] if self._seq.exists() else 0

            def payloads() -> Iterator[bytes]:
                for row in self._tail.get():
                    yield bytes(row[0])
                for pdf in rows:
                    for data in pdf["data"]:
                        yield bytes(data)

            completed, tail = fold_batches(str(pk), payloads(), soft_max_bytes)
            self._tail.clear()
            if tail:
                self._tail.put([(d,) for d in tail])
            self._seq.update((next_seq + len(completed),))
            if completed:
                yield _make_output(str(pk), next_seq, completed)

        def close(self) -> None:
            pass

    return KplBatchProcessor()


_ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def kpl_batch_stream(
    stream: DataFrame, soft_max_bytes: int = DEFAULT_SOFT_MAX
) -> DataFrame:
    """Batch a streaming ``(pk string, data binary)`` frame into KPL
    aggregated records per key via transformWithStateInPandas."""
    # TWS stores each state variable as a column family, which the default
    # HDFS-backed provider can't do — RocksDB is the documented requirement.
    # The conf is read at query *start*, so setting it here covers queries
    # built from this frame; sessions that already chose a provider
    # explicitly are left alone.
    conf = stream.sparkSession.conf
    key = "spark.sql.streaming.stateStore.providerClass"
    current = conf.get(key, None)
    if current is None or "HDFSBackedStateStoreProvider" in current:
        conf.set(key, _ROCKSDB_PROVIDER)
    return stream.groupBy("pk").transformWithStateInPandas(
        statefulProcessor=_make_processor(soft_max_bytes),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="Append",
        timeMode="None",
    )


# -- applyInPandasWithState binding ------------------------------------------

_LEGACY_STATE_SCHEMA = "next_seq bigint, tail array<binary>"


def kpl_batch_stream_legacy(
    stream: DataFrame, soft_max_bytes: int = DEFAULT_SOFT_MAX
) -> DataFrame:
    """Same batcher on the applyInPandasWithState API (GroupState holds
    (next_seq, tail payload array))."""

    def update(key, pdfs: Iterator["pd.DataFrame"], state: GroupState):
        (pk,) = key
        next_seq, tail = state.get if state.exists else (0, [])

        def payloads() -> Iterator[bytes]:
            for data in tail:
                yield bytes(data)
            for pdf in pdfs:
                for data in pdf["data"]:
                    yield bytes(data)

        completed, new_tail = fold_batches(str(pk), payloads(), soft_max_bytes)
        state.update((next_seq + len(completed), list(new_tail)))
        if completed:
            yield _make_output(str(pk), next_seq, completed)

    return stream.groupBy("pk").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=_LEGACY_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
