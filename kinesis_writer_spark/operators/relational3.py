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
           SUM(CASE WHEN supp_nation = (SELECT n_name FROM target)
                    THEN rev_cents ELSE 0 END) AS target_cents,
           SUM(rev_cents) AS total_cents,
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
           SUM({_REV_CENTS_SQL}) AS lost_cents,
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
           SUM(CASE WHEN p.p_type LIKE '%BRASS%' THEN {_REV_CENTS_SQL} ELSE 0 END)
               AS promo_cents,
           SUM({_REV_CENTS_SQL}) AS total_cents,
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
           SUM({_REV_CENTS_SQL}) AS trade_cents,
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
           SUM(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)) AS total_cents
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
