"""Second relational coverage batch: correlated-subquery patterns,
count-distribution histograms, statistical aggregates, exact percentiles,
map/JSON structures, and null-safe equality (SURVEY.md §2.2 completions).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables


@register(
    "q46_correlated_max",
    oracle="""
    SELECT c.c_custkey, c.c_name, n.n_name, ROUND(c.c_acctbal, 2) AS acctbal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    WHERE c.c_acctbal = (
        SELECT MAX(c2.c_acctbal) FROM customer c2 WHERE c2.c_nationkey = c.c_nationkey
    )
    """,
)
def q46_correlated_max(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated-subquery pattern (TPC-H Q2 shape): rows equal to their
    group's max — decorrelated into an aggregate + equi-join, the plan
    Catalyst itself produces for the correlated SQL.
    """
    customer, nation = tables(spark, sf_dir, "customer", "nation")
    maxes = customer.groupBy(F.col("c_nationkey").alias("nk")).agg(
        F.max("c_acctbal").alias("max_bal")
    )
    return (
        customer.join(
            maxes, (F.col("c_nationkey") == F.col("nk")) & (F.col("c_acctbal") == F.col("max_bal"))
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .select("c_custkey", "c_name", "n_name", F.round("c_acctbal", 2).alias("acctbal"))
    )


@register(
    "q47_count_distribution",
    oracle="""
    SELECT n_orders, COUNT(*) AS n_customers
    FROM (
        SELECT c.c_custkey, COUNT(o.o_orderkey) AS n_orders
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey
    )
    GROUP BY n_orders
    """,
)
def q47_count_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: orders-per-customer histogram (two-level aggregation,
    zero-order customers preserved by the left join).
    """
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    per_cust = (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(F.count(F.lit(1)).alias("n_customers"))


@register(
    "q48_stat_aggs",
    oracle="""
    SELECT l_returnflag,
           ROUND(stddev_samp(l_quantity), 2)                 AS sd_qty,
           ROUND(var_samp(l_quantity), 2)                    AS var_qty,
           ROUND(corr(l_quantity, l_extendedprice), 4)       AS corr_qty_price,
           ROUND(covar_samp(l_quantity, l_extendedprice), 1) AS covar_qty_price,
           ROUND(MIN(l_extendedprice), 2)                    AS min_price,
           ROUND(MAX(l_extendedprice), 2)                    AS max_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
)
def q48_stat_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Statistical aggregates: sample stddev/variance, correlation, covariance."""
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return lineitem.groupBy("l_returnflag").agg(
        F.round(F.stddev_samp("l_quantity"), 2).alias("sd_qty"),
        F.round(F.var_samp("l_quantity"), 2).alias("var_qty"),
        F.round(F.corr("l_quantity", "l_extendedprice"), 4).alias("corr_qty_price"),
        F.round(F.covar_samp("l_quantity", "l_extendedprice"), 1).alias("covar_qty_price"),
        F.round(F.min("l_extendedprice"), 2).alias("min_price"),
        F.round(F.max("l_extendedprice"), 2).alias("max_price"),
    )


@register(
    "q49_percentiles",
    oracle="""
    SELECT o_orderstatus,
           ROUND(quantile_cont(o_totalprice, 0.5), 2)  AS median_price,
           ROUND(quantile_cont(o_totalprice, 0.9), 2)  AS p90_price,
           ROUND(quantile_cont(o_totalprice, 0.99), 2) AS p99_price
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def q49_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (median/p90/p99). Spark ``percentile``
    and DuckDB ``quantile_cont`` share the linear-interpolation definition.
    At 100 TB the swap-in is ``approx_percentile`` (t-digest, single pass).
    """
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 2).alias("median_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 2).alias("p90_price"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 2).alias("p99_price"),
    )


@register(
    "q56_map_funcs",
    oracle="""
    SELECT event_id,
           array_to_string(list_sort(json_keys(props)), ',') AS prop_keys,
           CAST(props->>'$.k' AS BIGINT)                      AS k_value,
           CAST(props->>'$.k' AS BIGINT) IS NOT NULL          AS has_k
    FROM events
    WHERE event_id < 200
    """,
)
def q56_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON → MapType: parse props into a map, expose keys and typed access
    (from_json / map_keys / element_at).

    Keys are emitted as a SORTED comma-joined string: key order differs
    between JSON parsers, and array cells are unhashable in pandas-based
    row comparators.
    """
    (events,) = tables(spark, sf_dir, "events")
    parsed = events.filter(F.col("event_id") < 200).select(
        "event_id", F.from_json("props", "map<string,bigint>").alias("m")
    )
    return parsed.select(
        "event_id",
        F.concat_ws(",", F.sort_array(F.map_keys("m"))).alias("prop_keys"),
        F.element_at("m", "k").alias("k_value"),
        F.element_at("m", "k").isNotNull().alias("has_k"),
    )


@register(
    "q57_nullsafe_eq",
    oracle="""
    WITH flagged AS (
        SELECT c_custkey,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE c_mktsegment END AS seg_or_null
        FROM customer
    ),
    segs AS (SELECT DISTINCT seg_or_null FROM flagged)
    SELECT s.seg_or_null AS segment, COUNT(*) AS n_customers
    FROM flagged c JOIN segs s
      ON c.seg_or_null IS NOT DISTINCT FROM s.seg_or_null
    GROUP BY s.seg_or_null
    """,
)
def q57_nullsafe_eq(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equality join (``<=>`` / IS NOT DISTINCT FROM): customers
    join their segment row in a distinct-segment dimension that includes a
    NULL entry — with a plain ``=`` the NULL-segment customers would drop
    out; null-safe equality keeps them matched to the NULL dim row.

    Shape: the dim side is segment-cardinality (tiny) and broadcasts, so
    the null-safe join is one narrow pass over customer. An earlier
    formulation demonstrated the same predicate as a within-segment
    self-join counting pairs — quadratic per segment value (19M
    intermediate rows at sf0.1 for 6 output counts), exactly the shape the
    100x rule forbids when a linear join shows the same semantics.
    """
    (customer,) = tables(spark, sf_dir, "customer")
    flagged = customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.col("c_mktsegment")).alias(
            "seg_or_null"
        ),
    )
    segs = flagged.select(F.col("seg_or_null").alias("segment")).distinct()
    return (
        flagged.join(F.broadcast(segs), F.col("seg_or_null").eqNullSafe(F.col("segment")))
        .groupBy("segment")
        .agg(F.count(F.lit(1)).alias("n_customers"))
    )


@register(
    "q58_conditional_agg_filter",
    oracle="""
    SELECT o_orderpriority,
           COUNT(*) FILTER (WHERE o_orderstatus = 'F')                  AS n_finished,
           COUNT(*) FILTER (WHERE o_orderstatus = 'O')                  AS n_open,
           ROUND(SUM(o_totalprice) FILTER (WHERE o_totalprice > 100000), 2) AS big_total,
           COUNT(DISTINCT CASE WHEN o_totalprice > 100000 THEN o_custkey END) AS big_customers
    FROM orders
    GROUP BY o_orderpriority
    """,
)
def q58_conditional_agg_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filtered aggregation (FILTER clause / conditional aggregates)."""
    (orders,) = tables(spark, sf_dir, "orders")
    return orders.groupBy("o_orderpriority").agg(
        F.count(F.when(F.col("o_orderstatus") == "F", 1)).alias("n_finished"),
        F.count(F.when(F.col("o_orderstatus") == "O", 1)).alias("n_open"),
        F.round(F.sum(F.when(F.col("o_totalprice") > 100000, F.col("o_totalprice"))), 2).alias(
            "big_total"
        ),
        F.countDistinct(
            F.when(F.col("o_totalprice") > 100000, F.col("o_custkey"))
        ).alias("big_customers"),
    )


@register(
    "q64_unpivot",
    oracle="""
    SELECT o_orderkey, metric, ROUND(val, 2) AS val
    FROM (
        SELECT o_orderkey, 'totalprice' AS metric, o_totalprice AS val FROM orders
        UNION ALL
        SELECT o_orderkey, 'custkey', CAST(o_custkey AS DOUBLE) FROM orders
    )
    WHERE o_orderkey < 300
    """,
)
def q64_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot (wide → long): melt two measure columns into (metric, val)
    rows via the native unpivot operator (Expand — no shuffle, no UDF).
    """
    (orders,) = tables(spark, sf_dir, "orders")
    narrow = orders.filter(F.col("o_orderkey") < 300).select(
        "o_orderkey",
        F.col("o_totalprice").alias("totalprice"),
        F.col("o_custkey").cast("double").alias("custkey"),
    )
    melted = narrow.unpivot("o_orderkey", ["totalprice", "custkey"], "metric", "raw_val")
    return melted.select("o_orderkey", "metric", F.round("raw_val", 2).alias("val"))


@register(
    "q59_exists_in_subquery",
    oracle="""
    SELECT s.s_suppkey, s.s_name
    FROM supplier s
    WHERE s.s_nationkey IN (
        SELECT n.n_nationkey FROM nation n
        WHERE n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')
    )
    AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
    """,
)
def q59_exists_in_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested IN + EXISTS subqueries via the SQL API (Catalyst rewrites both
    into semi-joins — same plan as the explicit DataFrame form).
    """
    from .. import io

    for t in ("supplier", "nation", "region", "lineitem"):
        io.load(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(
        """
        SELECT s.s_suppkey, s.s_name
        FROM supplier s
        WHERE s.s_nationkey IN (
            SELECT n.n_nationkey FROM nation n
            WHERE n.n_regionkey IN (SELECT r_regionkey FROM region WHERE r_name LIKE 'A%')
        )
        AND EXISTS (SELECT 1 FROM lineitem l WHERE l.l_suppkey = s.s_suppkey AND l.l_quantity > 45)
        """
    )
