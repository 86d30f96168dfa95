"""Observed-metrics tests: data-quality counters ride the same pass as the
action (no extra scan), and match independently-computed values.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from kinesis_writer_spark import io as kio
from kinesis_writer_spark.plans.metrics import observed, run_with_metrics
from tests.conftest import SF_DIR


class TestObservedMetrics:
    def test_counts_match_separate_aggregation(self, spark):
        orders = kio.load(spark, SF_DIR, "orders")
        _, metrics = run_with_metrics(
            orders,
            rows=F.count(F.lit(1)),
            null_dates=F.sum(F.when(F.col("o_orderdate").isNull(), 1).otherwise(0)),
            max_price=F.max("o_totalprice"),
        )
        assert metrics["rows"] == orders.count()
        assert metrics["null_dates"] == 0
        assert metrics["max_price"] == orders.agg(F.max("o_totalprice")).first()[0]

    def test_metrics_survive_downstream_transforms(self, spark):
        lineitem = kio.load(spark, SF_DIR, "lineitem")
        instrumented, obs = observed(
            lineitem, scanned=F.count(F.lit(1)), neg_qty=F.sum((F.col("l_quantity") < 0).cast("int"))
        )
        # metrics observe the pre-filter rowstream even when the consumer
        # aggregates further downstream
        out = instrumented.filter(F.col("l_discount") > 0.05).groupBy("l_returnflag").count()
        out.write.mode("overwrite").format("noop").save()
        m = obs.get
        assert m["scanned"] == lineitem.count()
        assert m["neg_qty"] == 0

    def test_custom_action_result_passthrough(self, spark):
        nation = kio.load(spark, SF_DIR, "nation")
        result, metrics = run_with_metrics(
            nation, action=lambda df: df.count(), rows=F.count(F.lit(1))
        )
        assert result == metrics["rows"] == 25
