"""Deeper relational coverage: TPC-H-flavored multi-join analytics adapted to
the fixture schema (no partsupp/commitdate columns, so Q8/Q10/Q14/Q18/Q20
are re-cut to the columns that exist).

Money math: every revenue aggregate rounds to integer cents *per row* and
sums as BIGINT — integer addition is associative, so the result is exact and
identical across engines regardless of partitioning/summation order (a
double-sum then round is not). This is also the production-correct pattern
for financial rollups at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables

#: revenue in exact integer cents, per lineitem row
_REV_CENTS_SPARK = lambda: F.round(  # noqa: E731
    F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
).cast("bigint")
_REV_CENTS_SQL = "CAST(ROUND(l_extendedprice * (1 - l_discount) * 100, 0) AS BIGINT)"


@register(
    "q84_market_share",
    oracle=f"""
    WITH target AS (SELECT n_name FROM nation WHERE n_nationkey = 1),
    flows AS (
        SELECT EXTRACT(year FROM o.o_orderdate) AS order_year,
               rc.r_name AS cust_region,
               sn.n_name AS supp_nation,
               {_REV_CENTS_SQL} AS rev_cents
        FROM lineitem l
        JOIN orders o    ON l.l_orderkey = o.o_orderkey
        JOIN customer c  ON o.o_custkey = c.c_custkey
        JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
        JOIN region rc   ON cn.n_regionkey = rc.r_regionkey
        JOIN supplier s  ON l.l_suppkey = s.s_suppkey
        JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    )
    SELECT order_year, cust_region,
           CAST(SUM(CASE WHEN supp_nation = (SELECT n_name FROM target)
                    THEN rev_cents ELSE 0 END) AS BIGINT) AS target_cents,
           CAST(SUM(rev_cents) AS BIGINT) AS total_cents,
           ROUND(SUM(CASE WHEN supp_nation = (SELECT n_name FROM target)
                          THEN rev_cents ELSE 0 END)::DOUBLE
                 / SUM(rev_cents), 6) AS share
    FROM flows
    GROUP BY order_year, cust_region
    """,
)
def q84_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market share (TPC-H Q8 re-cut): the target nation's supplier share of
    revenue into each customer region, per order year.

    Six-table join: the fact-fact lineitem⋈orders edge shuffles on the order
    key; the fixed-size dims (nation×2, region) are broadcast by hint, while
    customer and supplier are left unhinted — they scale with SF, so the
    planner broadcasts them while they fit and falls back to shuffle joins
    at 100 TB instead of OOMing the driver. The share division happens after
    integer-cents sums, so the ratio is a deterministic function of exact
    integers.
    """
    lineitem, orders, customer, supplier, nation, region = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation", "region"
    )
    target_name = F.broadcast(
        nation.filter(F.col("n_nationkey") == 1).select(F.col("n_name").alias("target_name"))
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"), F.col("n_regionkey").alias("cn_region")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation")
    )
    flows = (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(F.broadcast(region), F.col("cn_region") == F.col("r_regionkey"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .crossJoin(target_name)
        .select(
            F.year("o_orderdate").alias("order_year"),
            F.col("r_name").alias("cust_region"),
            F.col("supp_nation"),
            F.col("target_name"),
            _REV_CENTS_SPARK().alias("rev_cents"),
        )
    )
    return flows.groupBy("order_year", "cust_region").agg(
        F.sum(
            F.when(F.col("supp_nation") == F.col("target_name"), F.col("rev_cents")).otherwise(0)
        ).alias("target_cents"),
        F.sum("rev_cents").alias("total_cents"),
        F.round(
            F.sum(
                F.when(F.col("supp_nation") == F.col("target_name"), F.col("rev_cents")).otherwise(
                    0
                )
            ).cast("double")
            / F.sum("rev_cents"),
            6,
        ).alias("share"),
    )


@register(
    "q85_returned_items",
    oracle=f"""
    SELECT c.c_custkey, c.c_name,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS lost_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o   ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    WHERE l.l_returnflag = 'R'
    GROUP BY c.c_custkey, c.c_name
    ORDER BY lost_cents DESC, c_custkey ASC
    LIMIT 20
    """,
)
def q85_returned_items(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returned-item reporting (TPC-H Q10 re-cut): top 20 customers by
    revenue lost to returns. The return-flag filter pushes to the lineitem
    scan; customer joins unhinted (it scales with SF); top-20 compiles to TakeOrderedAndProject (per-partition heaps, no
    global sort), with exact integer ordering so ties are impossible to
    mis-order across engines.
    """
    lineitem, orders, customer = tables(spark, sf_dir, "lineitem", "orders", "customer")
    returned = (
        lineitem.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(
            F.sum(_REV_CENTS_SPARK()).alias("lost_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )
    return returned.orderBy(F.col("lost_cents").desc(), F.col("c_custkey").asc()).limit(20)


@register(
    "q86_promo_revenue",
    oracle=f"""
    SELECT date_trunc('month', o.o_orderdate) AS order_month,
           CAST(SUM(CASE WHEN p.p_type LIKE '%BRASS%' THEN {_REV_CENTS_SQL} ELSE 0 END)
               AS BIGINT) AS promo_cents,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS total_cents,
           ROUND(100.0 * SUM(CASE WHEN p.p_type LIKE '%BRASS%' THEN {_REV_CENTS_SQL}
                                  ELSE 0 END)::DOUBLE
                 / SUM({_REV_CENTS_SQL}), 4) AS promo_pct
    FROM lineitem l
    JOIN part p   ON l.l_partkey = p.p_partkey
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    GROUP BY 1
    """,
)
def q86_promo_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Promo-class revenue share per month (TPC-H Q14 re-cut; the "promo"
    class is parts whose type contains BRASS). One fact-fact shuffle join
    (lineitem⋈orders); part is unhinted (broadcast while it fits, shuffle
    at scale); percentages derive from exact
    cents sums.
    """
    lineitem, part, orders = tables(spark, sf_dir, "lineitem", "part", "orders")
    promo = F.col("p_type").contains("BRASS")
    joined = (
        lineitem.join(part, F.col("l_partkey") == F.col("p_partkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .select(
            F.date_trunc("month", "o_orderdate").alias("order_month"),
            F.when(promo, _REV_CENTS_SPARK()).otherwise(0).alias("promo_cents_row"),
            _REV_CENTS_SPARK().alias("rev_cents"),
        )
    )
    return joined.groupBy("order_month").agg(
        F.sum("promo_cents_row").alias("promo_cents"),
        F.sum("rev_cents").alias("total_cents"),
        F.round(
            100.0 * F.sum("promo_cents_row").cast("double") / F.sum("rev_cents"), 4
        ).alias("promo_pct"),
    )


@register(
    "q87_large_quantity_orders",
    oracle="""
    WITH big AS (
        SELECT l_orderkey, SUM(l_quantity) AS total_qty
        FROM lineitem GROUP BY l_orderkey HAVING SUM(l_quantity) > 100
    )
    SELECT c.c_custkey, c.c_name, o.o_orderkey, o.o_orderdate,
           ROUND(b.total_qty, 2) AS total_qty
    FROM big b
    JOIN orders o   ON b.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def q87_large_quantity_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-quantity orders (TPC-H Q18 re-cut): orders whose total line
    quantity exceeds 100, with their customers. The HAVING aggregate runs
    first and collapses lineitem to qualifying order keys (map-side partials
    on the natural join key), so the joins see only the survivors.
    """
    lineitem, orders, customer = tables(spark, sf_dir, "lineitem", "orders", "customer")
    big = (
        lineitem.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("total_qty_raw"))
        .filter(F.col("total_qty_raw") > 100)
    )
    return (
        big.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .select(
            "c_custkey",
            "c_name",
            "o_orderkey",
            "o_orderdate",
            F.round("total_qty_raw", 2).alias("total_qty"),
        )
    )


@register(
    "q88_heavy_suppliers",
    oracle="""
    WITH small_parts AS (
        SELECT p_partkey FROM part WHERE p_size < 15
    ),
    shipped AS (
        SELECT l.l_suppkey, SUM(l.l_quantity) AS qty
        FROM lineitem l
        JOIN small_parts sp ON l.l_partkey = sp.p_partkey
        GROUP BY l.l_suppkey
        HAVING SUM(l.l_quantity) > 50
    )
    SELECT s.s_suppkey, s.s_name, ROUND(sh.qty, 2) AS shipped_qty
    FROM shipped sh JOIN supplier s ON sh.l_suppkey = s.s_suppkey
    """,
)
def q88_heavy_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heavy suppliers of small parts (TPC-H Q20 re-cut): suppliers who
    shipped more than 50 units of sub-size-15 parts. The part predicate
    prunes via a semi-shaped join (planner-chosen broadcast at test scale)
    before the aggregate.
    """
    lineitem, part, supplier = tables(spark, sf_dir, "lineitem", "part", "supplier")
    small_parts = part.filter(F.col("p_size") < 15).select("p_partkey")
    shipped = (
        lineitem.join(small_parts, F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("qty"))
        .filter(F.col("qty") > 50)
    )
    return shipped.join(supplier, F.col("l_suppkey") == F.col("s_suppkey")).select(
        "s_suppkey", "s_name", F.round("qty", 2).alias("shipped_qty")
    )


@register(
    "q89_nation_trade_matrix",
    oracle=f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(SUM({_REV_CENTS_SQL}) AS BIGINT) AS trade_cents,
           COUNT(*) AS n_lines
    FROM lineitem l
    JOIN orders o    ON l.l_orderkey = o.o_orderkey
    JOIN customer c  ON o.o_custkey = c.c_custkey
    JOIN nation cn   ON c.c_nationkey = cn.n_nationkey
    JOIN supplier s  ON l.l_suppkey = s.s_suppkey
    JOIN nation sn   ON s.s_nationkey = sn.n_nationkey
    WHERE cn.n_name <> sn.n_name
    GROUP BY cn.n_name, sn.n_name
    """,
)
def q89_nation_trade_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-nation trade matrix (TPC-H Q7 generalized): revenue flowing
    from each customer nation to each different supplier nation. One
    fact-fact shuffle; nation dims broadcast by hint, customer/supplier
    left to the planner (SF-scaling tables must not be force-broadcast);
    output is |nations|² rows max.
    """
    lineitem, orders, customer, supplier, nation = tables(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    cn = nation.select(F.col("n_nationkey").alias("cn_key"), F.col("n_name").alias("cust_nation"))
    sn = nation.select(F.col("n_nationkey").alias("sn_key"), F.col("n_name").alias("supp_nation"))
    return (
        lineitem.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(customer, F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("cn_key"))
        .join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("sn_key"))
        .filter(F.col("cust_nation") != F.col("supp_nation"))
        .groupBy("cust_nation", "supp_nation")
        .agg(
            F.sum(_REV_CENTS_SPARK()).alias("trade_cents"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# One SQL text, two engines: the engine's spark.sql surface runs the exact
# string the DuckDB oracle runs — no translation layer at all.
_SHARED_SQL = """
    SELECT o_orderpriority, o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS BIGINT) AS total_cents
    FROM orders
    GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus), ())
"""


@register("q94_sql_api", oracle=_SHARED_SQL)
def q94_sql_api(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL entry point: registers the fixture tables as views and runs
    the *identical* ANSI SQL text the DuckDB oracle runs (GROUPING SETS +
    exact-cents sum) through ``spark.sql`` — same string, two engines, one
    result. Everything the DataFrame operators can do is reachable through
    this surface too.
    """
    from .. import io

    io.register_views(spark, sf_dir)
    return spark.sql(_SHARED_SQL)


@register(
    "q103_scalar_subquery",
    oracle="""
    WITH bal AS (
        SELECT c_custkey, c_nationkey,
               CAST(ROUND(c_acctbal * 100, 0) AS BIGINT) AS bal_cents
        FROM customer
    ),
    threshold AS (
        SELECT SUM(bal_cents)::DOUBLE / COUNT(*) AS avg_cents
        FROM bal WHERE bal_cents > 0
    ),
    rich AS (
        SELECT b.c_custkey, b.c_nationkey, b.bal_cents
        FROM bal b CROSS JOIN threshold t
        WHERE b.bal_cents > t.avg_cents
    )
    SELECT r.c_nationkey,
           COUNT(DISTINCT r.c_custkey) AS n_custs,
           CAST(SUM(CASE WHEN o.rn = 1 THEN r.bal_cents ELSE 0 END) AS BIGINT) AS total_bal_cents,
           COUNT(o.o_orderkey) AS n_orders
    FROM rich r
    LEFT JOIN (
        SELECT o_custkey, o_orderkey,
               ROW_NUMBER() OVER (PARTITION BY o_custkey ORDER BY o_orderkey) AS rn
        FROM orders
    ) o ON o.o_custkey = r.c_custkey
    GROUP BY r.c_nationkey
    """,
)
def q103_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 cut to the fixture schema: customers with above-average
    positive balance, per nation, with their order activity — the
    uncorrelated scalar-subquery-in-predicate pattern (the Q22 threshold).

    The threshold is an exact integer-cents sum ÷ count (never AVG over
    doubles), so the `>` predicate is bit-stable across engines and
    summation orders. Spark shape: the 1-row threshold broadcasts via cross
    join and the predicate applies map-side; the order fan-out is de-dup-
    weighted (each customer's balance counted once via the rn=1 row) so the
    join and the balance sum stay exact.
    """
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    bal = customer.select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal_cents"),
    )
    threshold = bal.filter(F.col("bal_cents") > 0).agg(
        (F.sum("bal_cents").cast("double") / F.count(F.lit(1))).alias("avg_cents")
    )
    rich = bal.crossJoin(F.broadcast(threshold)).filter(
        F.col("bal_cents") > F.col("avg_cents")
    )
    from pyspark.sql import Window

    w = Window.partitionBy("o_custkey").orderBy("o_orderkey")
    ordered = orders.select(
        "o_custkey", "o_orderkey", F.row_number().over(w).alias("rn")
    )
    return (
        rich.join(ordered, F.col("c_custkey") == F.col("o_custkey"), "left")
        .groupBy("c_nationkey")
        .agg(
            F.countDistinct("c_custkey").alias("n_custs"),
            F.sum(F.when(F.col("rn") == 1, F.col("bal_cents")).otherwise(0)).alias(
                "total_bal_cents"
            ),
            F.count("o_orderkey").alias("n_orders"),
        )
    )


@register(
    "q104_semi_join_chain",
    oracle="""
    WITH small_parts AS (
        SELECT p_partkey FROM part WHERE p_size < 10
    ),
    heavy AS (
        SELECT l_suppkey, CAST(ROUND(SUM(l_quantity), 0) AS BIGINT) AS total_qty
        FROM lineitem
        WHERE year(l_shipdate) = 1995
          AND l_partkey IN (SELECT p_partkey FROM small_parts)
        GROUP BY l_suppkey
        HAVING SUM(l_quantity) > 100
    )
    SELECT s.s_suppkey, s.s_name, h.total_qty,
           CAST(ROUND(s.s_acctbal * 100, 0) AS BIGINT) AS acctbal_cents
    FROM supplier s JOIN heavy h ON s.s_suppkey = h.l_suppkey
    """,
)
def q104_semi_join_chain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 cut to the fixture schema: suppliers who moved > 100 units
    of small parts in 1995 — a nested semi-join chain (part → lineitem →
    supplier) where each hop only *filters*, never widens.

    Spark shape: the part filter becomes a LEFT SEMI join into lineitem
    (broadcast at this selectivity — small_parts is a key list, no
    payload), the HAVING aggregate shrinks to qualifying suppliers, and the
    supplier join carries the aggregate out. Quantity totals are rounded to
    exact integers before comparison on both engines.
    """
    part, lineitem, supplier = tables(spark, sf_dir, "part", "lineitem", "supplier")
    small_parts = part.filter(F.col("p_size") < 10).select("p_partkey")
    heavy = (
        lineitem.filter(F.year("l_shipdate") == 1995)
        .join(small_parts, F.col("l_partkey") == F.col("p_partkey"), "left_semi")
        .groupBy("l_suppkey")
        .agg(F.sum("l_quantity").alias("raw_qty"))
        .filter(F.col("raw_qty") > 100)
        .select("l_suppkey", F.round("raw_qty", 0).cast("bigint").alias("total_qty"))
    )
    return supplier.join(heavy, F.col("s_suppkey") == F.col("l_suppkey")).select(
        "s_suppkey",
        "s_name",
        "total_qty",
        F.round(F.col("s_acctbal") * 100, 0).cast("bigint").alias("acctbal_cents"),
    )


# Hypertable-style multi-resolution rollup: one Expand pass produces every
# resolution; identical SQL text runs on both engines (like q94).
_TIME_ROLLUP_SQL = """
    WITH e AS (
        SELECT date_trunc('day', ts) AS day_ts,
               date_trunc('hour', ts) AS hour_ts,
               event_type, value
        FROM events
    )
    SELECT CASE WHEN GROUPING(hour_ts) = 1 THEN 'day' ELSE 'hour' END AS resolution,
           COALESCE(hour_ts, day_ts) AS bucket_ts,
           event_type,
           COUNT(*) AS n_events,
           ROUND(SUM(value), 2) AS total_value
    FROM e
    GROUP BY GROUPING SETS ((day_ts, event_type), (hour_ts, event_type))
"""


@register("q105_time_rollup", oracle=_TIME_ROLLUP_SQL)
def q105_time_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style continuous-aggregate rollup: the events stream rolled
    up to hour AND day resolutions in ONE pass (GROUPING SETS → a single
    Expand + one shuffle), tagged by resolution — the batch shape of a
    TimescaleDB continuous aggregate / downsampling cascade.

    At 100 TB the Expand doubles rows before the exchange but each copy
    collapses in the map-side partial agg, so the shuffle carries only
    (bucket, type) partials per resolution — strictly cheaper than running
    the resolutions as separate jobs re-scanning the source.
    """
    from .. import io

    io.register_views(spark, sf_dir)
    return spark.sql(_TIME_ROLLUP_SQL)


@register(
    "q120_waiting_orders",
    oracle="""
    WITH late AS (
        SELECT l.l_orderkey, l.l_suppkey
        FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
        WHERE o.o_orderstatus = 'F'
          AND l.l_shipdate > o.o_orderdate + INTERVAL 60 DAY
    )
    SELECT s.s_name, COUNT(*) AS numwait
    FROM late l1 JOIN supplier s ON l1.l_suppkey = s.s_suppkey
    WHERE EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM late l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey)
    GROUP BY s.s_name
    """,
)
def q120_waiting_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Suppliers who kept orders waiting (TPC-H Q21 re-cut: "late" =
    shipped >60 days after order date, since the fixture has no
    commit/receipt dates): count, per supplier, the finished multi-supplier
    orders where that supplier was the ONLY late shipper.

    The correlated EXISTS / NOT EXISTS become LEFT SEMI / LEFT ANTI
    self-joins on l_orderkey with a non-equi ``l_suppkey <>`` residual —
    all three lineitem-shaped relations (late, the semi probe, the anti
    probe) hash-partition on the same l_orderkey, so AQE/exchange reuse
    lines the shuffles up instead of re-partitioning per step, and the
    supplier name lookup is a dim join deferred to after the heavy
    filtering. This is the canonical at-scale plan for Q21.
    """
    lineitem, orders, supplier = tables(spark, sf_dir, "lineitem", "orders", "supplier")
    late = (
        lineitem.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate") + F.expr("interval 60 days"))
        .select("l_orderkey", "l_suppkey")
    )
    other = lineitem.select(
        F.col("l_orderkey").alias("x_orderkey"), F.col("l_suppkey").alias("x_suppkey")
    )
    other_late = late.select(
        F.col("l_orderkey").alias("y_orderkey"), F.col("l_suppkey").alias("y_suppkey")
    )
    only_late = (
        late.join(
            other,
            (F.col("l_orderkey") == F.col("x_orderkey"))
            & (F.col("l_suppkey") != F.col("x_suppkey")),
            "left_semi",
        )
        .join(
            other_late,
            (F.col("l_orderkey") == F.col("y_orderkey"))
            & (F.col("l_suppkey") != F.col("y_suppkey")),
            "left_anti",
        )
    )
    return (
        only_late.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )
