"""StreamingQueryListener tests: per-epoch completion callbacks (the query-
level analogue of the reference's RecordAggregator listeners) observe every
micro-batch and account for every input row.
"""

from __future__ import annotations

import time

from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from kinesis_writer_spark.streaming import read_event_stream
from kinesis_writer_spark.streaming.listeners import ProgressCollector
from tests.conftest import SF_DIR


class TestProgressCollector:
    def test_epochs_account_for_every_row(self, spark, tmp_path):
        p = str(tmp_path / "replay")
        events = kio.load(spark, SF_DIR, "events")
        events.repartition(4).write.mode("overwrite").parquet(p)

        collector = ProgressCollector()
        spark.streams.addListener(collector)
        try:
            stream = read_event_stream(spark, p, max_files_per_trigger=2)
            q = (
                stream.groupBy("event_type")
                .agg(F.count(F.lit(1)).alias("n"))
                .writeStream.format("noop")
                .outputMode("complete")
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination()
            # the listener bus is async: wait briefly for progress delivery
            deadline = time.time() + 30
            while collector.total_input_rows < events.count() and time.time() < deadline:
                time.sleep(0.2)
        finally:
            spark.streams.removeListener(collector)

        assert collector.started, "onQueryStarted never fired"
        assert len(collector.epochs) >= 2  # 4 files / 2 per trigger
        assert collector.total_input_rows == events.count()
        assert all(e.batch_id >= 0 for e in collector.epochs)
