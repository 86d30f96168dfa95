"""Remaining TPC-H-flavored relational coverage (Q9/Q12/Q15/Q17/Q19 re-cut to
the fixture schema — no partsupp/shipmode/commitdate columns) plus the Spark 4
recursive-CTE surface.

Money math follows relational3.py: per-row exact integer cents, BIGINT sums
(associative → partition-order independent), ratios only over exact integers.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables

_REV_CENTS_SPARK = lambda: F.round(  # noqa: E731
    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
).cast("bigint")
_REV_CENTS_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"

#: synthetic supply cost (the fixture has no partsupp.ps_supplycost): the
#: part's retail price charged per unit, in exact cents per row
_COST_CENTS_SQL = "CAST(ROUND(p_retailprice * l_quantity * 100, 0) AS BIGINT)"


@register(
    "q124_product_profit",
    oracle=f"""
    SELECT sn.n_name AS supp_nation,
           EXTRACT(year FROM o.o_orderdate) AS order_year,
           CAST(SUM({_REV_CENTS_SQL} - {_COST_CENTS_SQL}) AS BIGINT) AS profit_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN part p     ON l.l_partkey = p.p_partkey
    JOIN supplier s ON l.l_suppkey = s.s_suppkey
    JOIN nation sn  ON s.s_nationkey = sn.n_nationkey
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    WHERE p.p_name LIKE '%widget%'
    GROUP BY sn.n_name, EXTRACT(year FROM o.o_orderdate)
    """,
)
def q124_product_profit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Product-type profit (TPC-H Q9 re-cut: the fixture has no
    ``partsupp``, so supply cost is the part's retail price per unit):
    per supplier nation and order year, profit on widget-class parts.

    Scale shape: the ``p_name LIKE '%widget%'`` filter prunes part *before*
    it joins lineitem (semi-shaped reduction first, planner broadcasts the
    survivors while they fit); the one unavoidable fact-fact shuffle is
    lineitem⋈orders on the order key; nation is broadcast by hint. Profit
    is a difference of two exact per-row cents values summed as BIGINT.
    """
    lineitem, part, supplier, nation, orders = tables(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "orders"
    )
    widget_parts = part.filter(F.col("p_name").like("%widget%")).select(
        "p_partkey", "p_retailprice"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    cost_cents = F.round(F.col("p_retailprice") * F.col("l_quantity") * 100, 0).cast(
        "bigint"
    )
    return (
        lineitem.join(widget_parts, F.col("l_partkey") == F.col("p_partkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            "supp_nation",
            F.year("o_orderdate").alias("order_year"),
            (_REV_CENTS_SPARK() - cost_cents).alias("profit_cents_row"),
        )
        .groupBy("supp_nation", "order_year")
        .agg(
            F.sum("profit_cents_row").alias("profit_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@register(
    "q125_shipping_speed_priority",
    oracle="""
    SELECT CASE WHEN datediff('day', o.o_orderdate, l.l_shipdate) < 30 THEN 'fast'
                WHEN datediff('day', o.o_orderdate, l.l_shipdate) < 75 THEN 'medium'
                ELSE 'slow' END AS ship_speed,
           CAST(SUM(CASE WHEN o.o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o.o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q125_shipping_speed_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shipping-speed vs priority matrix (TPC-H Q12 re-cut: the fixture has
    no ``l_shipmode``, so lines are classed by order-to-ship latency):
    per speed class, how many lines belonged to high- vs low-priority orders.

    The canonical Q12 conditional-counting shape: one fact-fact equi join,
    then CASE-guarded SUMs so *both* output measures come from a single
    aggregation pass (never two filtered scans). Day-difference buckets use
    integer ``datediff`` on both engines — no float boundaries.
    """
    lineitem, orders = tables(spark, sf_dir, "lineitem", "orders")
    lateness = F.datediff(F.col("l_shipdate"), F.col("o_orderdate"))
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.when(lateness < 30, "fast")
            .when(lateness < 75, "medium")
            .otherwise("slow")
            .alias("ship_speed"),
            F.when(high, 1).otherwise(0).alias("is_high"),
        )
        .groupBy("ship_speed")
        .agg(
            F.sum("is_high").alias("high_line_count"),
            F.sum(1 - F.col("is_high")).alias("low_line_count"),
        )
    )


@register(
    "q126_small_quantity_revenue",
    oracle=f"""
    WITH qty AS (
        SELECT l_partkey,
               CAST(ROUND(l_quantity * 100, 0) AS BIGINT) AS qty_c,
               {_REV_CENTS_SQL} AS rev_cents
        FROM lineitem
    ),
    part_avg AS (
        SELECT l_partkey AS a_partkey,
               SUM(qty_c) AS sum_qty_c, COUNT(*) AS n_lines
        FROM qty GROUP BY l_partkey
    )
    SELECT COUNT(*) AS n_small_lines,
           CAST(SUM(q.rev_cents) AS BIGINT) AS total_rev_cents
    FROM qty q
    JOIN part_avg a ON q.l_partkey = a.a_partkey
    JOIN part p     ON q.l_partkey = p.p_partkey
    WHERE p.p_size < 20
      AND 5 * q.qty_c * a.n_lines < a.sum_qty_c
    """,
)
def q126_small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-quantity-order revenue (TPC-H Q17 re-cut): total revenue on
    lines whose quantity is below 20% of the part's average quantity, for
    sub-size-20 parts.

    The correlated ``l_quantity < 0.2 * avg(l_quantity)`` predicate is
    rewritten as the cross-multiplied *integer* inequality
    ``5·qty·n < Σqty`` — exact in both engines, no float threshold to drift
    across summation orders. Spark shape: the per-part aggregate reuses the
    l_partkey hash partitioning for its join back to the detail rows (one
    shuffle feeds both), and the part-size filter prunes before the join.
    """
    lineitem, part = tables(spark, sf_dir, "lineitem", "part")
    qty = lineitem.select(
        "l_partkey",
        F.round(F.col("l_quantity") * 100, 0).cast("bigint").alias("qty_c"),
        _REV_CENTS_SPARK().alias("rev_cents"),
    )
    part_avg = qty.groupBy(F.col("l_partkey").alias("a_partkey")).agg(
        F.sum("qty_c").alias("sum_qty_c"), F.count(F.lit(1)).alias("n_lines")
    )
    small_parts = part.filter(F.col("p_size") < 20).select("p_partkey")
    return (
        qty.join(part_avg, F.col("l_partkey") == F.col("a_partkey"))
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"))
        .filter(5 * F.col("qty_c") * F.col("n_lines") < F.col("sum_qty_c"))
        .agg(
            F.count(F.lit(1)).alias("n_small_lines"),
            F.sum("rev_cents").alias("total_rev_cents"),
        )
    )


@register(
    "q127_disjunctive_predicates",
    oracle=f"""
    SELECT COUNT(*) AS n_lines,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS total_rev_cents
    FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
    WHERE (p.p_brand = 'Brand#13' AND p.p_size BETWEEN 1 AND 15
           AND l.l_quantity BETWEEN 1 AND 20)
       OR (p.p_brand = 'Brand#19' AND p.p_size BETWEEN 10 AND 25
           AND l.l_quantity BETWEEN 10 AND 35)
       OR (p.p_type = 'PROMO' AND p.p_size BETWEEN 5 AND 40
           AND l.l_quantity BETWEEN 20 AND 50)
    """,
)
def q127_disjunctive_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Discounted-revenue with OR-of-AND predicates (TPC-H Q19 re-cut to
    brand/type/size/quantity — the fixture has no container/shipmode).

    The point is optimizer behavior on disjunctions: Catalyst CNF-converts
    the OR so the part-only conjuncts (brand/type/size envelope) push to the
    part scan and the lineitem-only quantity envelope (1..50) pushes to the
    lineitem scan, while the full mixed predicate evaluates after the join.
    One equi join, single-row aggregate output.
    """
    lineitem, part = tables(spark, sf_dir, "lineitem", "part")
    cond = (
        (
            (F.col("p_brand") == "Brand#13")
            & F.col("p_size").between(1, 15)
            & F.col("l_quantity").between(1, 20)
        )
        | (
            (F.col("p_brand") == "Brand#19")
            & F.col("p_size").between(10, 25)
            & F.col("l_quantity").between(10, 35)
        )
        | (
            (F.col("p_type") == "PROMO")
            & F.col("p_size").between(5, 40)
            & F.col("l_quantity").between(20, 50)
        )
    )
    return (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .filter(cond)
        .agg(
            F.count(F.lit(1)).alias("n_lines"),
            F.sum(_REV_CENTS_SPARK()).alias("total_rev_cents"),
        )
    )


@register(
    "q128_top_supplier",
    oracle=f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS total_cents
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1995-01-01'
          AND l_shipdate < TIMESTAMP '1996-01-01'
        GROUP BY l_suppkey
    )
    SELECT s.s_suppkey, s.s_name, r.total_cents
    FROM revenue r
    JOIN (SELECT MAX(total_cents) AS max_cents FROM revenue) m
      ON r.total_cents = m.max_cents
    JOIN supplier s ON s.s_suppkey = r.supplier_no
    """,
)
def q128_top_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top supplier (TPC-H Q15): the supplier(s) with maximum revenue in a
    one-year shipping window — the "view + scalar max" pattern.

    Spark shape: the revenue aggregate is computed once and *reused* for
    both the max and the filter (same lineage → exchange reuse); the 1-row
    max joins back by value equality, which the planner executes as a
    BroadcastHashJoin (an equi join on the value — not a nested-loop
    ``>= ALL`` scan). Ties are well-defined because revenue is an exact
    integer; the date window pushes to the parquet scan.
    """
    lineitem, supplier = tables(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        lineitem.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(_REV_CENTS_SPARK()).alias("total_cents"))
    )
    max_rev = revenue.agg(F.max("total_cents").alias("max_cents"))
    return (
        revenue.join(F.broadcast(max_rev), F.col("total_cents") == F.col("max_cents"))
        .join(supplier, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_cents")
    )


# One SQL text, two engines (the q94/q105 pattern): Spark 4 runs WITH
# RECURSIVE natively, so the identical recursion runs on both sides.
_RECURSIVE_SPINE_SQL = """
    WITH RECURSIVE bounds AS (
        SELECT date_trunc('month', MIN(o_orderdate)) AS lo,
               date_trunc('month', MAX(o_orderdate)) AS hi
        FROM orders
    ),
    spine(month_ts, hi) AS (
        SELECT lo, hi FROM bounds
        UNION ALL
        SELECT month_ts + INTERVAL 1 MONTH, hi
        FROM spine
        WHERE month_ts < hi
    ),
    monthly AS (
        SELECT date_trunc('month', o_orderdate) AS month_ts,
               COUNT(*) AS n_orders,
               SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS cents
        FROM orders
        GROUP BY date_trunc('month', o_orderdate)
    )
    SELECT sp.month_ts,
           COALESCE(m.n_orders, 0) AS n_orders,
           CAST(COALESCE(m.cents, 0) AS BIGINT) AS total_cents
    FROM spine sp
    LEFT JOIN monthly m ON m.month_ts = sp.month_ts
"""


@register("q130_recursive_month_spine", oracle=_RECURSIVE_SPINE_SQL)
def q130_recursive_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recursive CTE (Spark 4 ``WITH RECURSIVE``): build a complete month
    spine from min to max order date by recursion, then left-join order
    counts onto it — months with zero orders appear with 0s (the gap-filled
    calendar shape, here driven by the recursive-query operator rather than
    ``sequence``/explode as in q119).

    The identical SQL text runs on DuckDB as the oracle. Scale notes: orders
    are aggregated to per-month totals FIRST (one shuffle with map-side
    partial aggregation), so the join is spine(O(months)) ⋈ monthly(O(months))
    — tiny-to-tiny, never a shuffle of the fact table against a 24-row spine.
    The recursion carries ``hi`` through its own rows so iterations reference
    ONLY the previous iteration — never ``bounds`` — otherwise each of the
    O(months) iterations re-scans orders for MIN/MAX (measured 14 s → 1.6 s
    at sf0.01 from this change alone). Recursion depth is bounded by the date
    range (``spark.sql.cteRecursionLevelLimit`` defaults to 100 — raise it
    for multi-decade spines).
    """
    from .. import io

    io.register_views(spark, sf_dir)
    return spark.sql(_RECURSIVE_SPINE_SQL)
