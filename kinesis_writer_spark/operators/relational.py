"""Projection, filter, sort/limit, and set operators (SURVEY.md §2.2).

All pure built-in DataFrame API: Catalyst pushes the filters and the column
pruning into the parquet scan (verify with ``.explain`` — ``PushedFilters`` /
``ReadSchema``), so at 100 TB these queries read only the bytes they need.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables


@register(
    "q01_pricing_summary",
    oracle="""
    SELECT l_returnflag, l_linestatus,
           ROUND(SUM(l_quantity), 2)                                    AS sum_qty,
           ROUND(SUM(l_extendedprice), 2)                               AS sum_base_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount)), 2)            AS sum_disc_price,
           ROUND(SUM(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2) AS sum_charge,
           ROUND(AVG(l_quantity), 4)                                    AS avg_qty,
           ROUND(AVG(l_extendedprice), 4)                               AS avg_price,
           ROUND(AVG(l_discount), 4)                                    AS avg_disc,
           COUNT(*)                                                     AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q01_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship scan→filter→hash-agg: TPC-H Q1 pricing summary.

    Scale notes: partial aggregation happens map-side automatically (only
    |groups| rows shuffle); the shipdate filter and 7-column projection push
    into the parquet scan.
    """
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    return (
        lineitem.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2).alias("sum_disc_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount")) * (1 + F.col("l_tax"))), 2
            ).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 4).alias("avg_price"),
            F.round(F.avg("l_discount"), 4).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@register(
    "q02_filter_predicates",
    oracle="""
    SELECT p_partkey, p_name, p_brand, p_type, p_size,
           ROUND(p_retailprice * 1.1, 2) AS marked_up
    FROM part
    WHERE p_size BETWEEN 10 AND 30
      AND p_brand IN ('Brand#11', 'Brand#22', 'Brand#33')
      AND p_type LIKE '%O%'
      AND p_retailprice IS NOT NULL
    """,
)
def q02_filter_predicates(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive predicates: BETWEEN, IN, LIKE, null check, computed column.

    All four predicates appear in ``PushedFilters`` of the parquet scan.
    Predicate constants are chosen to match a NON-EMPTY subset of the
    fixture at every scale factor (3 rows at sf0.001, 222 at sf0.1 — the
    LIKE keeps only ECONOMY/PROMO types), so the hash gate checks real
    predicate evaluation, not agreement on the empty set.
    """
    (part,) = tables(spark, sf_dir, "part")
    return (
        part.filter(
            F.col("p_size").between(10, 30)
            & F.col("p_brand").isin("Brand#11", "Brand#22", "Brand#33")
            & F.col("p_type").like("%O%")
            & F.col("p_retailprice").isNotNull()
        )
        .select(
            "p_partkey",
            "p_name",
            "p_brand",
            "p_type",
            "p_size",
            F.round(F.col("p_retailprice") * 1.1, 2).alias("marked_up"),
        )
    )


@register(
    "q22_sort_limit",
    oracle="""
    SELECT o_orderkey, o_custkey, o_orderstatus, ROUND(o_totalprice, 2) AS total
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 100
    """,
)
def q22_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy + limit compiles to TakeOrderedAndProject —
    each partition keeps its local top-100, only k rows reach the driver
    (no full sort at 100 TB). Tie-broken by o_orderkey for determinism.
    """
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
        .select(
            "o_orderkey",
            "o_custkey",
            "o_orderstatus",
            F.round("o_totalprice", 2).alias("total"),
        )
    )


@register(
    "q23_sort_nulls_multikey",
    oracle="""
    SELECT c_custkey, c_mktsegment, nullable_bal
    FROM (
        SELECT c_custkey, c_mktsegment,
               CASE WHEN c_acctbal < 0 THEN NULL ELSE ROUND(c_acctbal, 2) END AS nullable_bal
        FROM customer
    )
    ORDER BY nullable_bal DESC NULLS LAST, c_mktsegment ASC, c_custkey ASC
    LIMIT 200
    """,
)
def q23_sort_nulls_multikey(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with explicit null ordering (nulls last under DESC)."""
    (customer,) = tables(spark, sf_dir, "customer")
    nullable = F.when(F.col("c_acctbal") < 0, F.lit(None)).otherwise(F.round("c_acctbal", 2))
    return (
        customer.select("c_custkey", "c_mktsegment", nullable.alias("nullable_bal"))
        .orderBy(
            F.col("nullable_bal").desc_nulls_last(),
            F.col("c_mktsegment").asc(),
            F.col("c_custkey").asc(),
        )
        .limit(200)
    )


def _seg_split(spark: SparkSession, sf_dir: str) -> tuple[DataFrame, DataFrame]:
    """Two overlapping customer slices used by the set-op queries."""
    (customer,) = tables(spark, sf_dir, "customer")
    a = customer.filter(F.col("c_acctbal") > 1000).select("c_nationkey", "c_mktsegment")
    b = customer.filter(F.col("c_mktsegment").isin("BUILDING", "MACHINERY")).select(
        "c_nationkey", "c_mktsegment"
    )
    return a, b


@register(
    "q24_union_all",
    oracle="""
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 1000
    UNION ALL
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def q24_union_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL (bag semantics) — no shuffle, just concatenated partitions."""
    a, b = _seg_split(spark, sf_dir)
    return a.unionByName(b)


@register(
    "q25_union_distinct",
    oracle="""
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 1000
    UNION
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def q25_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION DISTINCT — one hash-aggregate shuffle on all columns."""
    a, b = _seg_split(spark, sf_dir)
    return a.unionByName(b).distinct()


@register(
    "q26_intersect",
    oracle="""
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 1000
    INTERSECT
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def q26_intersect(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set) — plans as a left-semi hash join after dedup."""
    a, b = _seg_split(spark, sf_dir)
    return a.intersect(b)


@register(
    "q27_except_all",
    oracle="""
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 1000
    EXCEPT ALL
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def q27_except_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL (bag difference with multiplicity) — the subtle null/dup
    semantics Spark implements via a count-propagating generate plan.
    """
    a, b = _seg_split(spark, sf_dir)
    return a.exceptAll(b)


@register(
    "q28_intersect_all",
    oracle="""
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_acctbal > 1000
    INTERSECT ALL
    SELECT c_nationkey, c_mktsegment FROM customer WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')
    """,
)
def q28_intersect_all(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL (bag intersection, min multiplicity)."""
    a, b = _seg_split(spark, sf_dir)
    return a.intersectAll(b)


@register(
    "q29_case_coalesce",
    oracle="""
    SELECT c_custkey,
           CASE WHEN c_acctbal > 5000 THEN 'high'
                WHEN c_acctbal > 0    THEN 'mid'
                ELSE 'low' END                          AS bal_tier,
           COALESCE(NULLIF(c_mktsegment, 'BUILDING'), 'OTHER') AS seg_or_other,
           GREATEST(ROUND(c_acctbal, 2), 0.0)           AS floored_bal,
           LEAST(CAST(c_nationkey AS BIGINT), c_custkey) AS least_key
    FROM customer
    """,
)
def q29_case_coalesce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional expressions: CASE WHEN, COALESCE, NULLIF, GREATEST/LEAST."""
    (customer,) = tables(spark, sf_dir, "customer")
    return customer.select(
        "c_custkey",
        F.when(F.col("c_acctbal") > 5000, "high")
        .when(F.col("c_acctbal") > 0, "mid")
        .otherwise("low")
        .alias("bal_tier"),
        F.coalesce(F.nullif(F.col("c_mktsegment"), F.lit("BUILDING")), F.lit("OTHER")).alias(
            "seg_or_other"
        ),
        F.greatest(F.round("c_acctbal", 2), F.lit(0.0)).alias("floored_bal"),
        F.least(F.col("c_nationkey").cast("bigint"), F.col("c_custkey")).alias("least_key"),
    )
