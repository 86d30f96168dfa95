"""In-flight pipeline metrics via ``Dataset.observe``: data-quality counters
computed in the SAME pass as the action — no second scan.

The shape a production corpus pipeline needs at 100 TB: every write also
reports row counts, null/violation counts, and value ranges, as aggregates
piggy-backed on the task that already touches each row (Spark's observed
metrics are accumulator-backed, exactly-once per row under retries for
batch queries). Contrast with a separate ``df.count()`` + ``df.filter(...)
.count()`` audit, which re-runs the whole plan per metric.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import Column, DataFrame, Observation


def observed(df: DataFrame, **metrics: Column) -> tuple[DataFrame, Observation]:
    """Attach named aggregate metrics to a plan. Returns the instrumented
    DataFrame and the Observation; read ``observation.get`` AFTER an action
    has materialized the DataFrame.
    """
    obs = Observation()
    named = [expr.alias(name) for name, expr in metrics.items()]
    return df.observe(obs, *named), obs


def run_with_metrics(
    df: DataFrame,
    action: Callable[[DataFrame], object] | None = None,
    **metrics: Column,
) -> tuple[object, dict]:
    """Run ``action`` (default: noop-format write, i.e. full materialization
    with zero sink cost) over the instrumented plan and return
    ``(action_result, metrics_dict)`` — the one-pass audit-and-run primitive.
    """
    instrumented, obs = observed(df, **metrics)
    if action is None:
        result = instrumented.write.mode("overwrite").format("noop").save()
    else:
        result = action(instrumented)
    return result, obs.get
