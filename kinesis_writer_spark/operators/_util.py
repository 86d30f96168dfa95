"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .. import io


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load fixture tables (events gets its ns→µs timestamp conversion)."""
    return tuple(io.load(spark, sf_dir, n) for n in names)
