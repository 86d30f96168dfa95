"""Shared helpers for operator modules."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .. import io


def tables(spark: SparkSession, sf_dir: str, *names: str) -> tuple[DataFrame, ...]:
    """Load fixture tables (events gets its ns→µs timestamp conversion)."""
    return tuple(io.load(spark, sf_dir, n) for n in names)


def distributed_row_number(
    df: DataFrame,
    bucket: Column,
    order_by: list[Column],
    partition_by: list[str] | None = None,
    out: str = "rn",
) -> DataFrame:
    """Exact global ROW_NUMBER() under ``order_by`` WITHOUT a
    single-partition WindowExec — the scale swap for every corpus-sized
    ``NTILE/row_number OVER (ORDER BY ...)``.

    ``bucket`` must be a coarse integer column MONOTONE NON-DECREASING in
    the ``order_by`` order (e.g. ``floor(score * 1000)`` for an ascending
    score sort, ``floor(-score * 1000)`` for a descending one). The rank
    decomposes into:

    1. per-bucket counts — one grouped agg with map-side combine;
    2. each bucket's base rank = rows in strictly-earlier buckets — a
       running sum over the COLLAPSED (bucket-cardinality) count table,
       broadcast back;
    3. a row_number partitioned BY BUCKET — parallelism = bucket count,
       the per-task sort is one bucket's worth of rows.

    ``rank == base + within-bucket row_number`` is exact because the
    bucket function is monotone: the global order never interleaves two
    buckets. NTILE/decile labels then derive from the rank and total count
    with pure integer arithmetic (see :func:`ntile_from_rank`).
    """
    part = list(partition_by or [])
    b = df.withColumn("_rk_bucket", bucket)
    counts = b.groupBy(*part, "_rk_bucket").agg(F.count(F.lit(1)).alias("_rk_n"))
    w_base = (
        Window.partitionBy(*part).orderBy("_rk_bucket")
        if part
        else Window.orderBy("_rk_bucket")
    ).rowsBetween(Window.unboundedPreceding, -1)
    base = counts.select(
        *part,
        "_rk_bucket",
        F.coalesce(F.sum("_rk_n").over(w_base), F.lit(0)).alias("_rk_base"),
    )
    w_in = Window.partitionBy(*part, "_rk_bucket").orderBy(*order_by)
    return (
        b.join(F.broadcast(base), part + ["_rk_bucket"])
        .withColumn(out, (F.row_number().over(w_in) + F.col("_rk_base")).cast("bigint"))
        .drop("_rk_bucket", "_rk_base")
    )


def ntile_from_rank(rank: Column, total: Column, n: int) -> Column:
    """SQL-standard NTILE(n) label from a 1-based rank and the partition's
    total row count: the first ``total % n`` tiles hold ``total DIV n + 1``
    rows, the rest ``total DIV n`` — pure integer arithmetic, bit-identical
    to the window function on every engine."""
    q = total.cast("bigint") / F.lit(n)
    qq = F.floor(q).cast("bigint")
    rem = (total.cast("bigint") % F.lit(n)).cast("bigint")
    big = rem * (qq + 1)  # rows covered by the (q+1)-sized tiles
    return (
        F.when(rank <= big, F.floor((rank - 1) / (qq + 1)) + 1)
        .otherwise(rem + F.floor((rank - big - 1) / F.greatest(qq, F.lit(1))) + 1)
        .cast("int")
    )
