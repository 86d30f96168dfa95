"""HLL sketch rollup (q121): the merged-sketch estimate must track the
exact distinct count, and merging fine-grain sketches must equal sketching
the raw column directly (re-aggregation losslessness).

q121 itself now emits (exact_users, within_5pct) so the driver's hash gate
checks sketch accuracy too; these tests keep the sharper invariants."""

from pyspark.sql import functions as F

from kinesis_writer_spark.operators.aggregates import q121_hll_rollup
from kinesis_writer_spark.operators._util import tables

SF = "/root/testdata/sf0.001"


def _merged_estimates(spark):
    """The q121 fine-grain→merge shape, exposing the raw estimate."""
    events = tables(spark, SF, "events")[0]
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    return {
        r["event_type"]: r["approx_users"]
        for r in daily.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"))
        .collect()
    }


def test_hll_estimate_within_tolerance(spark):
    approx = _merged_estimates(spark)
    events = tables(spark, SF, "events")[0]
    exact = {
        r["event_type"]: r["exact"]
        for r in events.groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("exact"))
        .collect()
    }
    assert set(approx) == set(exact)
    for etype, est in approx.items():
        assert abs(est - exact[etype]) <= max(2, 0.05 * exact[etype]), (
            etype, est, exact[etype])


def test_hll_merge_equals_direct_sketch(spark):
    events = tables(spark, SF, "events")[0]
    direct = {
        r["event_type"]: r["est"]
        for r in events.groupBy("event_type")
        .agg(F.hll_sketch_estimate(F.hll_sketch_agg("user_id", 12)).alias("est"))
        .collect()
    }
    assert _merged_estimates(spark) == direct


def test_q121_flags_all_true(spark):
    rows = q121_hll_rollup(spark, SF).collect()
    assert rows and all(r["within_5pct"] for r in rows)
