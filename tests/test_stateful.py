"""applyInPandasWithState: state must carry across micro-batches and the
final running totals must equal the batch aggregation."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from kinesis_writer_spark.streaming import read_event_stream
from kinesis_writer_spark.streaming.stateful import running_user_totals
from tests.conftest import SF_DIR


def test_running_totals_converge_to_batch_answer(spark, tmp_path):
    path = str(tmp_path / "replay")
    kio.load(spark, SF_DIR, "events").repartition(4).write.mode("overwrite").parquet(path)

    # one file per micro-batch → at least 4 batches, so state must persist
    stream = read_event_stream(spark, path, max_files_per_trigger=1)
    name = "stateful_out"
    q = (
        running_user_totals(stream)
        .writeStream.format("memory")
        .queryName(name)
        .outputMode("update")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    n_batches = len(q.recentProgress)
    q.stop()
    assert n_batches >= 4, "expected several micro-batches to exercise state carry-over"

    # running counts only grow → the max-count row per user is the final state
    out = spark.sql(f"SELECT * FROM {name}").toPandas()
    idx = out.groupby("user_id")["n_events"].idxmax()
    finals = {
        row.user_id: (row.n_events, row.total_value) for _, row in out.loc[idx].iterrows()
    }

    expected = (
        kio.load(spark, SF_DIR, "events")
        .groupBy("user_id")
        .agg(F.count(F.lit(1)).alias("n"), F.round(F.sum("value"), 2).alias("total"))
        .collect()
    )
    assert len(finals) == len(expected)
    for row in expected:
        n, total = finals[row.user_id]
        assert n == row.n
        assert total == pytest.approx(row.total, abs=0.05)
