"""AQE skew-join handling: build a deliberately skewed fact-fact join and
prove Spark's adaptive execution splits the hot partition at runtime
(``skew=true`` in the final adaptive plan) — the engine's answer to skewed
keys when salting (q63) isn't wired in by hand.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F


@pytest.fixture()
def aqe_skew_conf(spark):
    """Tighten AQE thresholds so a local-mode dataset qualifies as skewed,
    and disable broadcast so the join stays sort-merge."""
    keys = [
        "spark.sql.adaptive.enabled",
        "spark.sql.adaptive.skewJoin.enabled",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes",
        "spark.sql.adaptive.coalescePartitions.enabled",
        "spark.sql.autoBroadcastJoinThreshold",
    ]
    saved = {k: spark.conf.get(k, None) for k in keys}
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.enabled", "true")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "64KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.coalescePartitions.enabled", "false")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    yield spark
    for k, v in saved.items():
        if v is None:
            spark.conf.unset(k)
        else:
            spark.conf.set(k, v)


def test_aqe_splits_skewed_join_partition(aqe_skew_conf):
    spark = aqe_skew_conf
    # 95% of fact rows share key 0; dim side is uniform
    fact = spark.range(0, 200_000).select(
        F.when(F.col("id") % 20 != 0, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.sha2(F.col("id").cast("string"), 256).alias("pad"),
    )
    dim = spark.range(0, 200_000, 37).select(
        F.col("id").alias("k"), F.col("id").alias("v")
    )
    # no partitioning-sensitive operator above the join: splitting the hot
    # partition must stay legal, otherwise AQE declines to handle the skew.
    # pad rides through the shuffle so the hot partition has real
    # (incompressible) bytes — all-equal keys alone compress to ~nothing.
    joined = fact.join(dim, "k").select("k", "pad")
    keys = [r.k for r in joined.collect()]
    # correctness: key 0 = the 190k remapped rows plus id=0 itself
    assert sum(1 for k in keys if k == 0) == 190_001
    # the final adaptive plan must mark the sort-merge join skew-handled
    final_plan = joined._jdf.queryExecution().executedPlan().toString()
    assert "skew=true" in final_plan, final_plan[:2000]
