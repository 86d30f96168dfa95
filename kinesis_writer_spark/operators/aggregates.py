"""Aggregation operators: hash aggs, HAVING, distinct counts, rollup/cube/
grouping sets, pivot, top-k per group (SURVEY.md §2.2).

Scale notes: every groupBy here benefits from Spark's automatic partial
(map-side) aggregation; grouping-set queries expand rows *after* the partial
agg. ``approx_count_distinct`` (HLL++) is the 100 TB path where exactness
isn't required — it's registered rows-only because its estimate is
implementation-specific.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables


@register(
    "q04_order_priority",
    oracle="""
    SELECT o.o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
    )
    GROUP BY o.o_orderpriority
    """,
)
def q04_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape: semi-join into an aggregation."""
    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    shipped_late = lineitem.join(
        orders.select("o_orderkey", "o_orderdate"),
        F.col("l_orderkey") == F.col("o_orderkey"),
    ).filter(F.col("l_shipdate") > F.col("o_orderdate")).select(F.col("l_orderkey").alias("match_key"))
    return (
        orders.join(shipped_late, F.col("o_orderkey") == F.col("match_key"), "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("order_count"))
    )


@register(
    "q06_forecast_revenue",
    oracle="""
    SELECT ROUND(SUM(l_extendedprice * l_discount), 2) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1994-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1995-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q06_forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6: pure filter + global scalar aggregate (no grouping)."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1994-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1995-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(F.sum(F.col("l_extendedprice") * F.col("l_discount")), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


@register(
    "q14_groupby_having",
    oracle="""
    SELECT l_suppkey, COUNT(*) AS n_items, ROUND(SUM(l_quantity), 2) AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    HAVING COUNT(*) > 50 AND SUM(l_quantity) > 1000
    """,
)
def q14_groupby_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY + HAVING (post-aggregation filter)."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.groupBy("l_suppkey")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.sum("l_quantity").alias("_total_qty"),
        )
        .filter((F.col("n_items") > 50) & (F.col("_total_qty") > 1000))
        .select("l_suppkey", "n_items", F.round("_total_qty", 2).alias("total_qty"))
    )


@register(
    "q15_count_distinct",
    oracle="""
    SELECT o_orderstatus,
           COUNT(DISTINCT o_custkey)  AS n_customers,
           COUNT(DISTINCT o_orderpriority) AS n_priorities,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q15_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multiple exact COUNT(DISTINCT) in one aggregation (expand + 2-phase)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.countDistinct("o_custkey").alias("n_customers"),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.count(F.lit(1)).alias("n_orders"),
    )


@register(
    "q16_approx_count_distinct",
    oracle="""
    SELECT l_returnflag,
           COUNT(DISTINCT l_orderkey) AS exact_orders,
           COUNT(DISTINCT l_partkey) AS exact_parts,
           TRUE AS orders_within_5pct,
           TRUE AS parts_within_5pct
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q16_approx_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HLL++ approximate distinct counts — the 100 TB substitute for exact
    COUNT(DISTINCT): single-pass, constant memory per group, no expand.

    HLL estimates are engine-specific, so the raw estimate can't hash-match
    a DuckDB oracle. Instead the query emits the EXACT counts (oracle-
    checkable) plus booleans asserting the estimate landed within 5% of
    exact — the oracle expects TRUE, so a drifting sketch fails the hash
    gate, not just a unit test.
    """
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    # two aggregation passes joined on the (3-row) group key, NOT one mixed
    # agg: combining approx_count_distinct with multi-column COUNT(DISTINCT)
    # plans an Expand x3 that drags the HLL buffers through every expanded
    # row (measured 4.8 s vs 1.7 s split at sf0.1). The extra fact scan is
    # the cheap part at 100 TB; the Expand blowup is not.
    approx = lineitem.groupBy("l_returnflag").agg(
        F.approx_count_distinct("l_orderkey", 0.02).alias("a_orders"),
        F.approx_count_distinct("l_partkey", 0.02).alias("a_parts"),
    )
    exact = lineitem.groupBy("l_returnflag").agg(
        F.countDistinct("l_orderkey").alias("exact_orders"),
        F.countDistinct("l_partkey").alias("exact_parts"),
    )
    agg = exact.join(F.broadcast(approx), "l_returnflag")
    return agg.select(
        "l_returnflag",
        "exact_orders",
        "exact_parts",
        (F.abs(F.col("a_orders") - F.col("exact_orders")) <= 0.05 * F.col("exact_orders")).alias(
            "orders_within_5pct"
        ),
        (F.abs(F.col("a_parts") - F.col("exact_parts")) <= 0.05 * F.col("exact_parts")).alias(
            "parts_within_5pct"
        ),
    )


@register(
    "q17_rollup",
    oracle="""
    SELECT n.n_name, c.c_mktsegment, COUNT(*) AS n_customers,
           ROUND(SUM(c.c_acctbal), 2) AS total_bal
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
)
def q17_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP hierarchy: (nation, segment) → (nation) → grand total."""
    customer, nation = tables(spark, sf_dir, "customer", "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.sum("c_acctbal"), 2).alias("total_bal"),
        )
    )


@register(
    "q18_cube",
    oracle="""
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n_orders,
           ROUND(SUM(o_totalprice), 2) AS total_price
    FROM orders
    GROUP BY CUBE (o_orderstatus, o_orderpriority)
    """,
)
def q18_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE: all 2^2 grouping combinations in one pass."""
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.round(F.sum("o_totalprice"), 2).alias("total_price"),
    )


@register(
    "q19_grouping_sets",
    oracle="""
    SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
    """,
)
def q19_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS via the SQL API (same Catalyst Expand plan)."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    lineitem.createOrReplaceTempView("lineitem")
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus, ROUND(SUM(l_quantity), 2) AS sum_qty
        FROM lineitem
        GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus), (l_returnflag, l_linestatus))
        """
    )


@register(
    "q20_pivot",
    oracle="""
    SELECT o_orderpriority,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'F' THEN o_totalprice END), 0), 2) AS F,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'O' THEN o_totalprice END), 0), 2) AS O,
           ROUND(COALESCE(SUM(CASE WHEN o_orderstatus = 'P' THEN o_totalprice END), 0), 2) AS P
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q20_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PIVOT order status into columns (explicit value list → single pass,
    no extra distinct-values job).
    """
    (orders,) = tables(spark, sf_dir, "orders")
    pivoted = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.sum("o_totalprice"))
    )
    return pivoted.select(
        "o_orderpriority",
        F.round(F.coalesce(F.col("F"), F.lit(0.0)), 2).alias("F"),
        F.round(F.coalesce(F.col("O"), F.lit(0.0)), 2).alias("O"),
        F.round(F.coalesce(F.col("P"), F.lit(0.0)), 2).alias("P"),
    )


@register(
    "q21_topk_per_group",
    oracle="""
    SELECT c_mktsegment, c_custkey, ROUND(c_acctbal, 2) AS acctbal, rnk
    FROM (
        SELECT c_mktsegment, c_custkey, c_acctbal,
               ROW_NUMBER() OVER (PARTITION BY c_mktsegment
                                  ORDER BY c_acctbal DESC, c_custkey ASC) AS rnk
        FROM customer
    )
    WHERE rnk <= 3
    """,
)
def q21_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers per market segment (window rank + filter; Catalyst
    rewrites this to a partial top-k before the shuffle via
    WindowGroupLimit at scale).
    """
    (customer,) = tables(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        customer.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("c_mktsegment", "c_custkey", F.round("c_acctbal", 2).alias("acctbal"), "rnk")
    )


@register(
    "q121_hll_rollup",
    oracle="""
    SELECT event_type,
           COUNT(DISTINCT date_trunc('day', ts)) AS n_days,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS within_5pct
    FROM events
    GROUP BY event_type
    """,
)
def q121_hll_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Re-aggregatable distinct-user rollup via DataSketches HLL: build one
    sketch per (event_type, day) at the fine grain, then answer the
    coarser per-type question by MERGING sketches (``hll_union_agg``)
    instead of rescanning raw events.

    This is the continuous-aggregate pattern exact COUNT(DISTINCT) can't
    do — distinct counts don't sum across buckets, but sketches union
    losslessly, so at 100 TB the daily cube is computed once and every
    coarser rollup (weekly/monthly/all-time, any type subset) is a cheap
    merge over ~|types|x|days| tiny sketch blobs.

    Sketch estimates are engine-specific, so the query emits the EXACT
    per-type distinct count (oracle-checkable) plus a boolean asserting the
    merged-sketch estimate landed within 5% of exact — the oracle expects
    TRUE, making sketch accuracy a hash-gated invariant rather than only a
    unit test (tests/test_sketches.py also proves merge ≡ direct).
    """
    events = tables(spark, sf_dir, "events")[0]
    daily = events.groupBy(
        "event_type", F.date_trunc("day", "ts").alias("day")
    ).agg(F.hll_sketch_agg("user_id", 12).alias("sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("sk")).alias("approx_users"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = events.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("exact_users")
    )
    return merged.join(exact, "event_type").select(
        "event_type",
        "n_days",
        "exact_users",
        (
            F.abs(F.col("approx_users") - F.col("exact_users"))
            <= 0.05 * F.col("exact_users")
        ).alias("within_5pct"),
    )
