"""Final TPC-H relational coverage: Q11 and Q16 re-cut to the fixture schema
(no ``partsupp`` / ``s_comment`` columns), completing the 22-query family.

Money math follows relational3.py: per-row exact integer cents, BIGINT sums
(associative, so partition-order independent), and integer-only threshold
comparisons so Spark and DuckDB agree bit-exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_60bit
from ..registry import register
from ._util import tables

#: synthetic per-line stock value (the fixture has no partsupp.ps_supplycost
#: * ps_availqty): the part's retail price times the shipped quantity, exact
#: cents per row — same convention as relational4's _COST_CENTS_SQL
_VALUE_CENTS_SQL = "CAST(ROUND(p_retailprice * l_quantity * 100, 0) AS BIGINT)"


@register(
    "q137_important_stock",
    oracle=f"""
    WITH per_part AS (
        SELECT l.l_partkey AS partkey,
               CAST(SUM({_VALUE_CENTS_SQL}) AS BIGINT) AS value_cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n   ON s.s_nationkey = n.n_nationkey
        JOIN part p     ON l.l_partkey = p.p_partkey
        WHERE n.n_name IN ('NATION_7', 'NATION_13')
        GROUP BY l.l_partkey
    )
    SELECT partkey, value_cents
    FROM per_part
    WHERE value_cents * 200 > (SELECT CAST(SUM(value_cents) AS BIGINT) FROM per_part)
    """,
)
def q137_important_stock(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Important stock (TPC-H Q11 re-cut: no ``partsupp``, so a part's stock
    value is retail price × quantity shipped by the target nations'
    suppliers): parts whose value exceeds 1/200 of the nations' total.

    The canonical Q11 shape — a grouped aggregate HAVING-compared against a
    scalar subquery over the *same* aggregate. Spark computes ``per_part``
    once, derives the grand total from it, and broadcasts the single-row
    total back for the threshold filter, so the fact tables are scanned and
    joined exactly once. The nation filter prunes supplier before it touches
    lineitem (dim → broadcast), and the threshold comparison is integer-only
    (``value*200 > total``) — no float boundary disagreements.

    At 100 TB the per-part aggregate is one shuffle on ``l_partkey`` and the
    total is a tree-reduce over the already-aggregated (tiny) result;
    nothing rescans the fact table for the subquery.

    Reference capability parity: query plane of SURVEY.md §2.2 (TPC-H
    family); completes the 22-query coverage.
    """
    lineitem, supplier, nation, part = tables(
        spark, sf_dir, "lineitem", "supplier", "nation", "part"
    )
    target_suppliers = (
        supplier.join(
            F.broadcast(nation.filter(F.col("n_name").isin("NATION_7", "NATION_13"))),
            F.col("s_nationkey") == F.col("n_nationkey"),
        ).select("s_suppkey")
    )
    value_cents = F.round(F.col("p_retailprice") * F.col("l_quantity") * 100, 0).cast(
        "bigint"
    )
    per_part = (
        lineitem.join(F.broadcast(target_suppliers), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(part.select("p_partkey", "p_retailprice"), F.col("l_partkey") == F.col("p_partkey"))
        .select(F.col("l_partkey").alias("partkey"), value_cents.alias("value_cents_row"))
        .groupBy("partkey")
        .agg(F.sum("value_cents_row").alias("value_cents"))
    )
    total = per_part.agg(F.sum("value_cents").alias("total_cents"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("value_cents") * 200 > F.col("total_cents"))
        .select("partkey", "value_cents")
    )


@register(
    "q138_supplier_part_counts",
    oracle="""
    SELECT p.p_brand AS brand, p.p_type AS type, p.p_size AS size,
           CAST(COUNT(DISTINCT l.l_suppkey) AS BIGINT) AS supplier_cnt
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    WHERE p.p_brand <> 'Brand#11'
      AND p.p_type <> 'PROMO'
      AND p.p_size IN (1, 9, 14, 19, 23, 36, 45, 49)
      AND l.l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p.p_brand, p.p_type, p.p_size
    """,
)
def q138_supplier_part_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Supplier–part relationship counts (TPC-H Q16 re-cut: no ``s_comment``,
    so the "customer complaints" exclusion becomes suppliers with a negative
    account balance): distinct suppliers per surviving (brand, type, size).

    The canonical Q16 shape — attribute filters on the dim, a NOT IN
    anti-join on the excluded-supplier set, then a multi-key COUNT DISTINCT.
    Both small sides broadcast: the filtered part dim joins lineitem without
    a shuffle, and the excluded-supplier list (a filter over a dim) feeds a
    broadcast LEFT ANTI join, so the only shuffle is the final grouped
    distinct-count on (brand, type, size, suppkey) — Spark's two-phase
    distinct aggregation handles that with map-side partials.

    Reference capability parity: query plane of SURVEY.md §2.2 (TPC-H
    family); completes the 22-query coverage.
    """
    lineitem, part, supplier = tables(spark, sf_dir, "lineitem", "part", "supplier")
    parts = part.filter(
        (F.col("p_brand") != "Brand#11")
        & (F.col("p_type") != "PROMO")
        & F.col("p_size").isin(1, 9, 14, 19, 23, 36, 45, 49)
    ).select("p_partkey", "p_brand", "p_type", "p_size")
    complainers = supplier.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        lineitem.join(F.broadcast(complainers), F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(F.broadcast(parts), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(
            F.col("p_brand").alias("brand"),
            F.col("p_type").alias("type"),
            F.col("p_size").alias("size"),
        )
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


@register(
    "q145_cdc_upsert",
    oracle="""
    WITH changes AS (
        SELECT c_custkey AS key, 'U' AS op, c_name, c_nationkey,
               ROUND(c_acctbal + 100, 2) AS c_acctbal, c_mktsegment
        FROM customer WHERE c_custkey % 10 = 3
        UNION ALL
        SELECT c_custkey + 10000000, 'I', 'new_' || c_name, c_nationkey,
               500.0, c_mktsegment
        FROM customer WHERE c_custkey % 100 = 7
        UNION ALL
        SELECT c_custkey, 'D', NULL, NULL, NULL, NULL
        FROM customer WHERE c_custkey % 100 = 55
    ),
    merged AS (
        SELECT COALESCE(ch.c_mktsegment, s.c_mktsegment) AS c_mktsegment,
               COALESCE(ch.c_acctbal, s.c_acctbal) AS bal
        FROM customer s
        FULL OUTER JOIN changes ch ON s.c_custkey = ch.key
        WHERE COALESCE(ch.op, '') <> 'D'
    )
    SELECT c_mktsegment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(ROUND(bal * 100, 0) AS BIGINT)) AS BIGINT) AS total_bal_cents
    FROM merged
    GROUP BY c_mktsegment
    """,
)
def q145_cdc_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MERGE INTO semantics (SCD1 apply) without a table format: a CDC batch
    of updates / inserts / deletes (derived deterministically from the
    snapshot so both engines see identical changes) is applied to the
    customer snapshot via one FULL OUTER join — update rows replace, insert
    rows append, delete rows drop — then the merged state rolls up per
    segment.

    The canonical formats-less upsert shape: matching on the snapshot's
    key, ``COALESCE(change, snapshot)`` per column, a WHERE dropping
    matched deletes. At 100 TB both sides hash-partition on the key (the
    CDC batch is usually the small side — broadcastable); with a real
    lakehouse table format the same plan runs under MERGE INTO, and AQE
    turns it into a shuffled hash join with skew splitting for hot keys.
    """
    (customer,) = tables(spark, sf_dir, "customer")
    updates = customer.filter(F.col("c_custkey") % 10 == 3).select(
        F.col("c_custkey").alias("key"),
        F.lit("U").alias("op"),
        "c_name",
        "c_nationkey",
        F.round(F.col("c_acctbal") + 100, 2).alias("c_acctbal"),
        "c_mktsegment",
    )
    inserts = customer.filter(F.col("c_custkey") % 100 == 7).select(
        (F.col("c_custkey") + 10_000_000).alias("key"),
        F.lit("I").alias("op"),
        F.concat(F.lit("new_"), F.col("c_name")).alias("c_name"),
        "c_nationkey",
        F.lit(500.0).alias("c_acctbal"),
        "c_mktsegment",
    )
    deletes = customer.filter(F.col("c_custkey") % 100 == 55).select(
        F.col("c_custkey").alias("key"),
        F.lit("D").alias("op"),
        F.lit(None).cast("string").alias("c_name"),
        F.lit(None).cast("int").alias("c_nationkey"),
        F.lit(None).cast("double").alias("c_acctbal"),
        F.lit(None).cast("string").alias("c_mktsegment"),
    )
    changes = updates.unionByName(inserts).unionByName(deletes)
    ch = changes.select(
        "key",
        "op",
        F.col("c_mktsegment").alias("ch_segment"),
        F.col("c_acctbal").alias("ch_bal"),
    )
    merged = (
        customer.join(ch, F.col("c_custkey") == F.col("key"), "full_outer")
        .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("ch_segment"), F.col("c_mktsegment")).alias("c_mktsegment"),
            F.coalesce(F.col("ch_bal"), F.col("c_acctbal")).alias("bal"),
        )
    )
    return merged.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("bal") * 100, 0).cast("bigint")).alias("total_bal_cents"),
    )


@register(
    "q153_grouping_id",
    oracle="""
    SELECT n.n_name, c.c_mktsegment,
           GROUPING(n.n_name) AS g_nation,
           GROUPING(c.c_mktsegment) AS g_segment,
           CAST(COUNT(*) AS BIGINT) AS n_customers
    FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY ROLLUP (n.n_name, c.c_mktsegment)
    """,
)
def q153_grouping_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING() indicator columns on a ROLLUP — the surface that lets a
    report distinguish "NULL because subtotal row" from "NULL because the
    data was NULL" (q17's rollup emits the levels; this exposes the
    markers). Same single-Expand plan as any rollup; the indicators are
    free metadata of the grouping set id.
    """
    customer, nation = tables(spark, sf_dir, "customer", "nation")
    return (
        customer.join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .rollup("n_name", "c_mktsegment")
        .agg(
            F.grouping("n_name").cast("int").alias("g_nation"),
            F.grouping("c_mktsegment").cast("int").alias("g_segment"),
            F.count(F.lit(1)).alias("n_customers"),
        )
        .select("n_name", "c_mktsegment", "g_nation", "g_segment", "n_customers")
    )


@register(
    "q154_offset_pagination",
    oracle="""
    SELECT o_orderkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 20 OFFSET 40
    """,
)
def q154_offset_pagination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LIMIT/OFFSET pagination (page 3 of a price-ranked report) with a
    total deterministic order (price, then key) so every page is stable.

    Scale note: OFFSET still evaluates the global top-(offset+limit) —
    Spark plans it as a TakeOrdered of 60 rows here, fine for report
    pages; DEEP pagination (offset in the millions) should keyset-paginate
    instead (``WHERE (price, key) < last_seen ORDER BY ... LIMIT k``),
    which reuses the same plan shape with a pushed-down predicate.
    """
    (orders,) = tables(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .select("o_orderkey", "o_totalprice")
        .offset(40)
        .limit(20)
    )


@register(
    "q155_try_arithmetic",
    oracle="""
    SELECT o_orderstatus,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(CASE WHEN days_open = 0 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_zero_day,
           CAST(SUM(COALESCE(FLOOR(CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)
                    / NULLIF(days_open, 0)), 0)) AS BIGINT)
               AS total_cents_per_day
    FROM (
        SELECT o_orderstatus, o_totalprice,
               CAST(EXTRACT(day FROM ts_last - o_orderdate) AS BIGINT) AS days_open
        FROM orders
        CROSS JOIN (SELECT MAX(o_orderdate) AS ts_last FROM orders)
    )
    GROUP BY o_orderstatus
    """,
)
def q155_try_arithmetic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Error-safe arithmetic under ANSI mode: price-per-day-open where the
    newest order has zero days open — a plain division would throw
    DIVIDE_BY_ZERO under ANSI SQL (Spark 4's default). ``try_divide``
    yields NULL instead, the rows are counted, and the rollup coalesces
    NULL contributions to 0. The oracle expresses the identical semantics
    with ``NULLIF`` (DuckDB's division is non-throwing). The per-row
    metric floors to integer cents-per-day BEFORE the sum, the repo's
    order-independence convention (a double sum would drift). ANSI + try_*
    is the production posture at 100 TB: hard errors for unexpected
    overflow, explicit NULL semantics where division by zero is expected.
    """
    (orders,) = tables(spark, sf_dir, "orders")
    last = orders.agg(F.max("o_orderdate").alias("ts_last"))
    days_open = F.datediff(F.col("ts_last"), F.col("o_orderdate")).cast("bigint")
    base = orders.crossJoin(F.broadcast(last)).select(
        "o_orderstatus", "o_totalprice", days_open.alias("days_open")
    )
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")
    per_day = F.floor(F.try_divide(cents, F.col("days_open"))).cast("bigint")
    return base.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.when(F.col("days_open") == 0, 1).otherwise(0)).alias("n_zero_day"),
        F.sum(F.coalesce(per_day, F.lit(0))).alias("total_cents_per_day"),
    )


@register(
    "q174_ntile_binning",
    oracle="""
    WITH binned AS (
        SELECT c_mktsegment, c_acctbal,
               NTILE(10) OVER (PARTITION BY c_mktsegment
                               ORDER BY c_acctbal, c_custkey) AS decile
        FROM customer
    )
    SELECT c_mktsegment, decile,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(c_acctbal * 100, 0) AS BIGINT)) AS BIGINT)
               AS bal_cents
    FROM binned GROUP BY c_mktsegment, decile
    """,
)
def q174_ntile_binning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NTILE decile binning per segment (equal-frequency feature bucketing
    / score banding): customers split into 10 rank-balanced balance bins,
    then per-bin rollups. NTILE's bin boundaries are pure rank arithmetic
    — with the total order pinned by (balance, custkey), both engines
    assign identical bins.

    Scale shape: a segment's rows never pass through one task — ranks come
    from the histogram-rank decomposition (``distributed_row_number``):
    balances bucket by whole dollars, (segment, bucket) counts collapse to
    broadcast base ranks, and the only row sort is per (segment, bucket).
    The NTILE label is then integer arithmetic on (rank, segment count),
    bit-identical to the window function — so equal-frequency binning
    parallelizes across segments AND within each segment.
    """
    from ._util import distributed_row_number, ntile_from_rank

    (customer,) = tables(spark, sf_dir, "customer")
    ranked = distributed_row_number(
        customer.select(
            "c_mktsegment",
            "c_acctbal",
            "c_custkey",
            F.round(F.col("c_acctbal") * 100, 0).cast("bigint").alias("bal_cents_row"),
        ),
        bucket=F.floor("c_acctbal").cast("bigint"),
        order_by=[F.col("c_acctbal").asc(), F.col("c_custkey").asc()],
        partition_by=["c_mktsegment"],
    )
    seg_n = customer.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("seg_n"))
    binned = ranked.join(F.broadcast(seg_n), "c_mktsegment").select(
        "c_mktsegment",
        "bal_cents_row",
        ntile_from_rank(F.col("rn"), F.col("seg_n"), 10).alias("decile"),
    )
    return binned.groupBy("c_mktsegment", "decile").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("bal_cents_row").alias("bal_cents"),
    )


@register(
    "q175_argminmax",
    oracle="""
    SELECT n.n_name,
           CAST(COUNT(*) AS BIGINT) AS n_suppliers,
           arg_max(s.s_name, lpad(CAST(CAST(ROUND(s.s_acctbal * 100, 0) AS BIGINT)
                   + 1000000000 AS VARCHAR), 12, '0') || '#' || s.s_name)
               AS richest_supplier,
           arg_min(s.s_name, lpad(CAST(CAST(ROUND(s.s_acctbal * 100, 0) AS BIGINT)
                   + 1000000000 AS VARCHAR), 12, '0') || '#' || s.s_name)
               AS poorest_supplier
    FROM supplier s JOIN nation n ON s.s_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
)
def q175_argminmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ARG_MAX / ARG_MIN (a.k.a. max_by/min_by): the supplier with the
    highest and lowest balance per nation — the "value at the extreme"
    surface that otherwise costs a self-join or a window pass.

    Determinism: bare max_by ties arbitrarily (and balances can tie), so
    the ordering key is a composite string with a TOTAL order that is
    bit-identical on both engines: zero-padded offset integer cents (so
    lexicographic == numeric, negatives included) + the supplier name as
    tiebreak. One grouped aggregation with map-side partials; the
    (value, key) pairs are the only shuffle payload.
    """
    supplier, nation = tables(spark, sf_dir, "supplier", "nation")
    cents_off = F.round(F.col("s_acctbal") * 100, 0).cast("bigint") + 1_000_000_000
    key = F.concat(
        F.lpad(cents_off.cast("string"), 12, "0"), F.lit("#"), F.col("s_name")
    )
    return (
        supplier.join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_suppliers"),
            F.max_by("s_name", key).alias("richest_supplier"),
            F.min_by("s_name", key).alias("poorest_supplier"),
        )
    )


@register(
    "q176_join_cardinality_profile",
    oracle="""
    WITH a AS (SELECT o_orderkey AS k, COUNT(*) AS ca FROM orders GROUP BY 1),
    b AS (SELECT l_orderkey AS k, COUNT(*) AS cb FROM lineitem GROUP BY 1),
    prof AS (
        SELECT a.k, a.ca * b.cb AS pairs FROM a JOIN b ON a.k = b.k
    ),
    h AS (SELECT pairs, COUNT(*) AS nk FROM prof GROUP BY pairs),
    cum AS (
        SELECT pairs, nk,
               SUM(nk) OVER (ORDER BY pairs) AS cum,
               SUM(nk) OVER () AS cnt
        FROM h
    )
    SELECT (SELECT CAST(COUNT(*) AS BIGINT) FROM prof) AS n_matched_keys,
           (SELECT CAST(SUM(pairs) AS BIGINT) FROM prof) AS est_output_rows,
           (SELECT CAST(MAX(pairs) AS BIGINT) FROM prof) AS max_key_fanout,
           (SELECT MIN(CASE WHEN 100 * cum >= 99 * cnt THEN pairs END)
            FROM cum) AS p99_key_fanout
    """,
)
def q176_join_cardinality_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join cardinality profiling BEFORE running the join — the diagnostic
    that catches exploding joins and skewed keys at 100 TB planning time:
    per-key counts on both sides meet on the key, per-key pair products
    roll up to the exact output cardinality, the hottest key's fan-out,
    and the p99 fan-out (via the q140 histogram-rank shape over the
    distinct fan-out values).

    Two grouped counts (map-side combine) + one join on the already-
    aggregated key tables — orders of magnitude cheaper than the join it
    profiles, since only (key, count) pairs shuffle. The p99/max split
    tells you whether skew is broad or a single pathological key (q150's
    salting vs AQE-splitting decision input).
    """
    orders, lineitem = tables(spark, sf_dir, "orders", "lineitem")
    a = orders.groupBy(F.col("o_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("ca")
    )
    b = lineitem.groupBy(F.col("l_orderkey").alias("k")).agg(
        F.count(F.lit(1)).alias("cb")
    )
    prof = a.join(b, "k").select((F.col("ca") * F.col("cb")).alias("pairs"))
    h = prof.groupBy("pairs").agg(F.count(F.lit(1)).alias("nk"))
    w_cum = Window.orderBy("pairs").rowsBetween(Window.unboundedPreceding, 0)
    w_all = Window.partitionBy()
    cum = h.select(
        "pairs",
        F.sum("nk").over(w_cum).alias("cum"),
        F.sum("nk").over(w_all).alias("cnt"),
    )
    totals = prof.agg(
        F.count(F.lit(1)).alias("n_matched_keys"),
        F.sum("pairs").alias("est_output_rows"),
        F.max("pairs").alias("max_key_fanout"),
    )
    p99 = cum.agg(
        F.min(
            F.when(100 * F.col("cum") >= 99 * F.col("cnt"), F.col("pairs"))
        ).alias("p99_key_fanout")
    )
    return totals.crossJoin(F.broadcast(p99))


@register(
    "q184_cdc_compacted_apply",
    oracle="""
    WITH raw_changes AS (
        SELECT c_custkey AS key, 1 AS seq, 'U' AS op,
               ROUND(c_acctbal + 10, 2) AS bal, c_mktsegment AS seg
        FROM customer WHERE c_custkey % 4 = 1
        UNION ALL
        SELECT c_custkey, 2, 'U', ROUND(c_acctbal + 20, 2), c_mktsegment
        FROM customer WHERE c_custkey % 8 = 1
        UNION ALL
        SELECT c_custkey, 3, 'D', NULL, NULL
        FROM customer WHERE c_custkey % 16 = 1
    ),
    latest AS (
        SELECT key, op, bal, seg FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY key ORDER BY seq DESC) AS rn
            FROM raw_changes
        ) WHERE rn = 1
    ),
    merged AS (
        SELECT COALESCE(l.seg, s.c_mktsegment) AS seg,
               COALESCE(l.bal, s.c_acctbal) AS bal
        FROM customer s LEFT JOIN latest l ON s.c_custkey = l.key
        WHERE COALESCE(l.op, '') <> 'D'
    )
    SELECT seg,
           CAST(COUNT(*) AS BIGINT) AS n_customers,
           CAST(SUM(CAST(ROUND(bal * 100, 0) AS BIGINT)) AS BIGINT) AS total_bal_cents
    FROM merged GROUP BY seg
    """,
)
def q184_cdc_compacted_apply(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC apply with change-log COMPACTION — the realistic extension of
    q145: a change batch carries MULTIPLE entries per key (two updates and
    possibly a delete, ordered by a sequence number), so the apply first
    collapses to the latest change per key (q36's dedup-latest shape) and
    only then merges into the snapshot. Applying un-compacted changes
    through a plain join would double-count keys; latest-wins is the
    contract every CDC consumer (and the reference's own
    at-least-once replay) must implement.

    Shape: one per-key window over the (small) change batch, one LEFT
    join against the snapshot on the key, one rollup. At 100 TB the
    change batch is the small side — broadcast; the snapshot streams.
    """
    (customer,) = tables(spark, sf_dir, "customer")

    def chg(mod: int, seq: int, op: str, delta):
        base = customer.filter(F.col("c_custkey") % mod == 1)
        if op == "D":
            return base.select(
                F.col("c_custkey").alias("key"),
                F.lit(seq).alias("seq"),
                F.lit("D").alias("op"),
                F.lit(None).cast("double").alias("bal"),
                F.lit(None).cast("string").alias("seg"),
            )
        return base.select(
            F.col("c_custkey").alias("key"),
            F.lit(seq).alias("seq"),
            F.lit("U").alias("op"),
            F.round(F.col("c_acctbal") + delta, 2).alias("bal"),
            F.col("c_mktsegment").alias("seg"),
        )

    raw_changes = chg(4, 1, "U", 10).unionByName(chg(8, 2, "U", 20)).unionByName(
        chg(16, 3, "D", None)
    )
    w = Window.partitionBy("key").orderBy(F.col("seq").desc())
    latest = (
        raw_changes.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("key", "op", "bal", "seg")
    )
    merged = (
        customer.join(F.broadcast(latest), F.col("c_custkey") == F.col("key"), "left")
        .filter(F.coalesce(F.col("op"), F.lit("")) != "D")
        .select(
            F.coalesce(F.col("seg"), F.col("c_mktsegment")).alias("seg"),
            F.coalesce(F.col("bal"), F.col("c_acctbal")).alias("bal"),
        )
    )
    return merged.groupBy("seg").agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum(F.round(F.col("bal") * 100, 0).cast("bigint")).alias("total_bal_cents"),
    )


@register(
    "q187_nested_document_assembly",
    oracle=f"""
    WITH item_rows AS (
        SELECT l_orderkey,
               {{h}} AS item_hash
        FROM lineitem
    ),
    assembled AS (
        SELECT l_orderkey AS order_id,
               CAST(COUNT(*) AS BIGINT) AS n_items,
               CAST(SUM(item_hash % 1000000007) AS BIGINT) AS items_checksum
        FROM item_rows GROUP BY l_orderkey
    )
    SELECT o.o_orderpriority,
           CAST(COUNT(*) AS BIGINT) AS n_orders,
           CAST(SUM(a.n_items) AS BIGINT) AS total_items,
           CAST(SUM(a.items_checksum % 1000000007) AS BIGINT) AS checksum
    FROM assembled a JOIN orders o ON o.o_orderkey = a.order_id
    GROUP BY o.o_orderpriority
    """.format(
        h="CAST(('0x' || substr(md5("
        "CAST(l_linenumber AS VARCHAR) || '|' || CAST(l_partkey AS VARCHAR)"
        " || '|' || CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT)"
        "), 1, 15)) AS BIGINT)"
    ),
)
def q187_nested_document_assembly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested-document assembly (the search-index / API-export shape): each
    order's line items collapse into an ordered array of item structs —
    on the Spark side literally ``array_sort(collect_list(struct(...)))``
    — and the assembly is verified by hashing every item's canonical
    field string and summing (order-independent mod-checksum), rolled up
    per order priority. Any dropped, duplicated, or corrupted item in the
    nested build breaks the checksum against the oracle's flat
    computation.

    One shuffle groups items to their order (the nested build), one
    broadcast-joinable rollup after. At 100 TB this is the standard fan-in
    materialization before JSONL export (the actual struct column rides
    along; the checksum is how the gate sees it without comparing
    engine-specific JSON text formats).
    """
    lineitem, orders = tables(spark, sf_dir, "lineitem", "orders")
    item = F.struct(
        "l_linenumber",
        "l_partkey",
        F.round(F.col("l_extendedprice") * 100, 0).cast("bigint").alias("price_cents"),
    )
    assembled = (
        lineitem.groupBy(F.col("l_orderkey").alias("order_id"))
        .agg(F.array_sort(F.collect_list(item)).alias("items"))
        .select(
            "order_id",
            F.size("items").alias("n_items"),
            F.aggregate(
                F.transform(
                    "items",
                    lambda it: md5_60bit(
                        F.concat_ws(
                            "|",
                            it["l_linenumber"].cast("string"),
                            it["l_partkey"].cast("string"),
                            it["price_cents"].cast("string"),
                        )
                    )
                    % 1000000007,
                ),
                F.lit(0).cast("bigint"),
                lambda acc, x: acc + x,
            ).alias("items_checksum"),
        )
    )
    return (
        assembled.join(orders, F.col("order_id") == F.col("o_orderkey"))
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum("n_items").alias("total_items"),
            F.sum(F.col("items_checksum") % 1000000007).alias("checksum"),
        )
    )


@register(
    "q188_hierarchy_share",
    oracle="""
    WITH rev AS (
        SELECT r.r_name AS region, n.n_name AS nation,
               CAST(SUM(CAST(ROUND(l.l_extendedprice * (1 - l.l_discount) * 100, 0)
                    AS BIGINT)) AS BIGINT) AS cents
        FROM lineitem l
        JOIN supplier s ON l.l_suppkey = s.s_suppkey
        JOIN nation n ON s.s_nationkey = n.n_nationkey
        JOIN region r ON n.n_regionkey = r.r_regionkey
        GROUP BY r.r_name, n.n_name
    )
    SELECT region, nation, cents,
           CAST((1000000 * cents) // SUM(cents) OVER (PARTITION BY region)
               AS BIGINT) AS share_of_region_ppm,
           CAST((1000000 * SUM(cents) OVER (PARTITION BY region))
                // SUM(cents) OVER () AS BIGINT) AS region_share_ppm
    FROM rev
    """,
)
def q188_hierarchy_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Percent-of-parent hierarchy reporting: each nation's revenue share
    within its region AND the region's share of the grand total, in one
    result — the drill-down ratio table every BI hierarchy renders.

    One star-join rollup to (region, nation) — exact cents, dims
    broadcast — then BOTH ratio levels come from windows over the
    25-row aggregate (never re-scanning facts); integer-ppm division
    keeps every share engine-exact.
    """
    lineitem, supplier, nation, region = tables(
        spark, sf_dir, "lineitem", "supplier", "nation", "region"
    )
    cents = F.round(
        F.col("l_extendedprice") * (1 - F.col("l_discount")) * 100, 0
    ).cast("bigint")
    rev = (
        lineitem.join(supplier, F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(region), F.col("n_regionkey") == F.col("r_regionkey"))
        .groupBy(F.col("r_name").alias("region"), F.col("n_name").alias("nation"))
        .agg(F.sum(cents).alias("cents"))
    )
    w_region = Window.partitionBy("region")
    w_all = Window.partitionBy()
    with_sums = rev.select(
        "region",
        "nation",
        "cents",
        F.sum("cents").over(w_region).alias("region_cents"),
        F.sum("cents").over(w_all).alias("total_cents"),
    )
    return with_sums.select(
        "region",
        "nation",
        "cents",
        F.expr("(1000000 * cents) DIV region_cents").alias("share_of_region_ppm"),
        F.expr("(1000000 * region_cents) DIV total_cents").alias("region_share_ppm"),
    )
