"""Streaming completion callbacks: the engine-level analogue of the
reference's ``RecordAggregator.onRecordComplete`` listeners
(RecordAggregator.java:40-46 — fired whenever an aggregated record fills).

At the micro-batch level the same contract is Spark's
``StreamingQueryListener``: a callback per progress epoch carrying row
counts and durations. The sink-level analogue (per filled KPL record) lives
in :meth:`..kpl.aggregator.RecordAggregator.on_record_complete`; this module
covers the query level, so both callback planes of the reference are
represented.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class EpochStats:
    query_id: str
    batch_id: int
    num_input_rows: int
    duration_ms: int | None


@dataclass
class ProgressCollector(StreamingQueryListener):
    """Collects one :class:`EpochStats` per completed micro-batch.

    Driver-side and lightweight: Spark invokes listeners asynchronously on
    the listener bus, so collection never back-pressures the query. Use
    ``spark.streams.addListener(c)`` / ``removeListener(c)``.
    """

    epochs: list[EpochStats] = field(default_factory=list)
    started: list[str] = field(default_factory=list)
    terminated: list[str] = field(default_factory=list)

    def onQueryStarted(self, event) -> None:
        self.started.append(str(event.id))

    def onQueryProgress(self, event) -> None:
        p = event.progress
        self.epochs.append(
            EpochStats(
                query_id=str(p.id),
                batch_id=p.batchId,
                num_input_rows=p.numInputRows,
                duration_ms=(p.durationMs or {}).get("triggerExecution"),
            )
        )

    def onQueryIdle(self, event) -> None:  # pragma: no cover - timing-dependent
        pass

    def onQueryTerminated(self, event) -> None:
        self.terminated.append(str(event.id))

    @property
    def total_input_rows(self) -> int:
        return sum(e.num_input_rows for e in self.epochs)
