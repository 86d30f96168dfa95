"""Scale-pattern operators (round 3, batch 2): the physical-design and
algorithmic shapes a 100 TB deployment leans on beyond plain relational
coverage — prefix-filtered set-similarity join (PPJoin), Z-order layout
clustering, incremental aggregate maintenance, compaction planning,
exact-moment group-wise regression, Welch's t-test, and co-occurrence
triangle counting.

Float discipline follows the house rules (SCALE.md): accumulate in exact
integers (BIGINT / DECIMAL(38) / HUGEINT), evaluate closed forms in double
only at the very end with the IDENTICAL expression tree on both engines,
and compare integers wherever a threshold decides membership.

Reference capability parity: query plane of SURVEY.md §2.2 (curation /
layout / statistics families).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables

# ---------------------------------------------------------------------------
# q193: prefix-filtered set-similarity self-join (PPJoin-style)
# ---------------------------------------------------------------------------

#: Jaccard threshold 0.8 expressed as a ratio — all membership tests are
#: integer-only (inter*5 >= uni*4) so no float boundary can disagree.
_J_NUM, _J_DEN = 4, 5

#: DuckDB: distinct 3-gram word shingles hashed to 60-bit ints (the
#: cross-engine md5 family, functions/hashing.py) — one row per (doc,
#: shingle-hash).
_SHINGLES_DUCK = """
    w AS (SELECT doc_id, string_split(text, ' ') AS ws FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substr(md5(tok3), 1, 15)) AS BIGINT) AS tok
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ws) - 2),
                          i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2])) AS tok3
            FROM w
        )
    ),
    docs AS (SELECT doc_id, list(tok ORDER BY tok) AS toks FROM sh GROUP BY doc_id)
"""


def q193_stages(
    spark: SparkSession, sf_dir: str, ppjoin_filters: bool = True
) -> tuple[DataFrame, DataFrame]:
    """q193's (docs, candidates) stages, exposed so the candidate-cut is
    testable in isolation (r10 verdict task #5): candidate count — not
    candidate correctness — sizes the verify shuffle's scratch footprint,
    and a refactor that silently dropped the PPJoin filters would only
    surface as an sf100 ENOSPC. ``ppjoin_filters=False`` builds the
    pre-r10 unfiltered prefix join, for measuring the cut.

    Candidate join with the PPJoin length + positional filters (Xiao,
    Wang, Lin, Yuan — WWW'08; row-level form per Vernica, Carey, Li —
    SIGMOD'10). Both are EXACT (no false negatives at the threshold),
    integer-only, and load-bearing at scale: the verify stage carries
    two full shingle-hash arrays per candidate through a shuffle
    (measured: the unfiltered candidate set at the sf100 fixture
    demanded >65 GB of shuffle scratch and died ENOSPC on one box;
    linear in candidates).
     * length: J >= 4/5 needs 5*min(na,nb) >= 4*max(na,nb), since
       inter <= min and union >= max.
     * positional: for the EARLIEST shared prefix token, at rank rna
       in a and rnb in b, every shared token sits at rank >= rna /
       >= rnb, so inter <= 1 + min(na-rna, nb-rnb); J >= 4/5 needs
       inter >= ceil(4(na+nb)/9), i.e. 9 + 9*min(na-rna, nb-rnb)
       >= 4*(na+nb). A qualifying pair's earliest match always
       passes, so filtering rows then distinct-ing pairs is exact.
    """
    from ..functions.hashing import md5_60bit
    from ._util import cached_exprs

    (documents,) = tables(spark, sf_dir, "documents")

    def _build_toks():
        ws = F.split("text", " ")
        inner = F.zip_with(
            F.slice(ws, 2, F.size(ws) - 2),
            F.slice(ws, 3, F.size(ws) - 2),
            lambda b, c: F.concat_ws(" ", b, c),
        )
        sh3 = F.zip_with(
            F.slice(ws, 1, F.size(ws) - 2), inner, lambda a, bc: F.concat_ws(" ", a, bc)
        )
        return F.array_distinct(
            F.transform(F.array_distinct(sh3), lambda s: md5_60bit(s))
        )

    # Per-doc distinct hashed shingle set built entirely map-side: the outer
    # array_distinct collapses 60-bit hash collisions within a doc exactly
    # like the row-level DISTINCT it replaces, so the (doc_id, tok) row set
    # is identical — but the corpus-sized distinct exchange disappears, and
    # ``docs`` (the verify-side arrays) needs NO collect_list shuffle at
    # all: the array the verify stage wants is the one the map task already
    # holds. ``n`` rides the array size instead of a count-over-window.
    # (r14: 3 corpus-sized exchanges removed — distinct + collect_list ×2;
    # plan-verified, output bit-identical. Construction memoized — the
    # zip_with/transform chain is py4j-bound; _util.cached_exprs.)
    toks = cached_exprs("q193_shingle_toks", _build_toks)
    docs0 = documents.select("doc_id", toks.alias("toks"))
    docs = docs0.select("doc_id", F.sort_array("toks").alias("toks"))
    tok = docs0.select(
        "doc_id", F.size("toks").alias("n"), F.explode("toks").alias("tok")
    )
    dfq = tok.groupBy("tok").agg(F.count(F.lit(1)).alias("df"))
    w = Window.partitionBy("doc_id")
    ranked = tok.join(dfq, "tok").withColumn(
        "rn", F.row_number().over(w.orderBy("df", "tok"))
    )
    prefix = ranked.filter(
        F.col("rn")
        <= F.col("n") - F.expr(f"({_J_NUM}*n + {_J_DEN - 1}) DIV {_J_DEN}") + 1
    ).select("doc_id", "tok", "rn", "n")
    join_cond = (F.col("tok") == F.col("tok_b")) & (F.col("doc_id") < F.col("doc_b"))
    if ppjoin_filters:
        join_cond = (
            join_cond
            & (
                _J_DEN * F.least("n", "n_b")
                >= _J_NUM * F.greatest("n", "n_b")
            )
            & (
                (_J_NUM + _J_DEN)
                * (1 + F.least(F.col("n") - F.col("rn"), F.col("n_b") - F.col("rn_b")))
                >= _J_NUM * (F.col("n") + F.col("n_b"))
            )
        )
    cand = (
        prefix.alias("a")
        .join(
            prefix.select(
                F.col("doc_id").alias("doc_b"),
                F.col("tok").alias("tok_b"),
                F.col("rn").alias("rn_b"),
                F.col("n").alias("n_b"),
            ),
            join_cond,
        )
        .select(F.col("doc_id").alias("doc_a"), "doc_b")
        .distinct()
    )
    return docs, cand


@register(
    "q193_prefix_filter_join",
    oracle=f"""
    WITH {_SHINGLES_DUCK},
    dfq AS (SELECT tok, count(*) AS df FROM sh GROUP BY tok),
    ranked AS (
        SELECT t.doc_id, t.tok,
               row_number() OVER (PARTITION BY t.doc_id ORDER BY d.df, t.tok) AS rn,
               count(*) OVER (PARTITION BY t.doc_id) AS n
        FROM sh t JOIN dfq d USING (tok)
    ),
    prefix AS (
        SELECT doc_id, tok FROM ranked
        WHERE rn <= n - (({_J_NUM}*n + {_J_DEN - 1}) // {_J_DEN}) + 1
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM prefix a JOIN prefix b ON a.tok = b.tok AND a.doc_id < b.doc_id
    ),
    verify AS (
        SELECT c.doc_a, c.doc_b,
               len(list_intersect(da.toks, db.toks)) AS inter,
               len(da.toks) + len(db.toks)
                   - len(list_intersect(da.toks, db.toks)) AS uni
        FROM cand c
        JOIN docs da ON c.doc_a = da.doc_id
        JOIN docs db ON c.doc_b = db.doc_id
    )
    SELECT doc_a, doc_b, CAST(inter * 1000000 // uni AS BIGINT) AS jacc_ppm
    FROM verify
    WHERE inter * {_J_DEN} >= uni * {_J_NUM}
    """,
)
def q193_prefix_filter_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Prefix-filtered set-similarity self-join (the PPJoin family): find
    all document pairs whose 3-gram shingle sets have Jaccard >= 0.8
    WITHOUT an all-pairs comparison. Shingles are globally ordered
    rarest-first (document frequency, then hash); a document's *prefix* is
    its first ``n - ceil(t*n) + 1`` shingles in that order, and two
    documents can only reach threshold t if their prefixes share a shingle
    — so the candidate join is an equi-join on prefix shingles, which are
    by construction the RAREST ones, bounding per-key fan-out.

    Shingling is load-bearing, not cosmetic: raw unigrams over this
    corpus's small vocabulary have no rare tokens (measured: every doc's
    "rarest" word still has df ~ 1000 at sf0.1, giving 9.7M candidates for
    190k true pairs, 104 s). 3-gram shingles push token cardinality to
    ~vocab³ so document frequency actually discriminates — 119k candidates
    for 256 true pairs at the same scale — which is exactly why every
    production set-similarity join (and q55) shingles first. Shingles are
    hashed to 60-bit ints (cross-engine md5 family) so the shuffled arrays
    are fixed 8-byte elements, not strings.

    This is the third set-similarity strategy in the registry, with a
    different trade-off from q52 (MinHash+LSH: probabilistic, fixed
    signature cost) and q55 (attribute-banded: needs a blocking key):
    prefix filtering is EXACT (no false negatives at the threshold) and
    needs no blocking attribute — the classic choice for high thresholds,
    where prefixes are short.

    Shape at 100 TB: one shingle-frequency aggregate (vocabulary-sized),
    one per-doc window to rank shingles, an equi-join on rare prefix
    shingles WITH the PPJoin length + positional filters (exact; see the
    candidate-join comment), and an integer-only verify against the full
    shingle-hash arrays. Verification joins the doc->array table twice on
    doc_id — linear in candidates, and the filters are what keep the
    candidate set (whose array payload sizes the verify shuffle) near the
    true-pair count rather than raw prefix co-occurrence.
    """
    docs, cand = q193_stages(spark, sf_dir)
    inter = F.size(F.array_intersect("toks_a", "toks_b"))
    uni = F.size("toks_a") + F.size("toks_b") - inter
    return (
        cand.join(docs.select(F.col("doc_id").alias("doc_a"), F.col("toks").alias("toks_a")), "doc_a")
        .join(docs.select(F.col("doc_id").alias("doc_b"), F.col("toks").alias("toks_b")), "doc_b")
        .filter(inter * _J_DEN >= uni * _J_NUM)
        .select(
            "doc_a",
            "doc_b",
            F.expr(
                f"CAST(size(array_intersect(toks_a, toks_b)) * 1000000 DIV "
                f"(size(toks_a) + size(toks_b) - size(array_intersect(toks_a, toks_b))) AS BIGINT)"
            ).alias("jacc_ppm"),
        )
    )


# ---------------------------------------------------------------------------
# q194: Z-order (Morton) layout clustering
# ---------------------------------------------------------------------------


def _morton_sql(x: str, y: str, bits: int, intdiv: str) -> str:
    """Morton (Z-order) interleave of two ``bits``-bit non-negative ints as
    pure integer arithmetic — ``((v div 2^i) % 2) * 2^k`` terms — so Spark
    (``DIV``) and DuckDB (``//``) evaluate the IDENTICAL formula with only
    the integer-division spelling swapped (no engine-specific bitwise ops).
    """
    terms = []
    for i in range(bits):
        terms.append(f"((({x}) {intdiv} {1 << i}) % 2) * {1 << (2 * i)}")
        terms.append(f"((({y}) {intdiv} {1 << i}) % 2) * {1 << (2 * i + 1)}")
    return " + ".join(terms)


_ZX = "o_custkey % 1024"
_ZY_DUCK = "(CAST(o_orderdate AS DATE) - DATE '1970-01-01') % 1024"
_ZY_SPARK = "datediff(CAST(o_orderdate AS DATE), DATE'1970-01-01') % 1024"
_N_FILES = 64


@register(
    "q194_zorder_layout",
    oracle=f"""
    WITH z AS (
        SELECT o_orderkey,
               {_ZX} AS x,
               {_ZY_DUCK} AS y,
               {_morton_sql(_ZX, _ZY_DUCK, 10, "//")} AS zval
        FROM orders
    ),
    filed AS (
        SELECT x, y, ntile({_N_FILES}) OVER (ORDER BY zval, o_orderkey) AS file_id
        FROM z
    )
    SELECT file_id, count(*) AS n_rows,
           min(x) AS min_x, max(x) AS max_x,
           min(y) AS min_y, max(y) AS max_y,
           CAST(max(x) - min(x) + max(y) - min(y) AS BIGINT) AS span
    FROM filed GROUP BY file_id
    """,
)
def q194_zorder_layout(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout clustering (Delta/Iceberg ``OPTIMIZE ZORDER BY``):
    map each row's (customer-bucket, order-day-bucket) pair onto the Morton
    space-filling curve, cut the curve into {_N_FILES} equal-count files,
    and report each file's bounding box in BOTH dimensions. Because the
    curve preserves 2-D locality, every file is tight in x AND y at once —
    which is what makes min/max zone-map pruning effective on BOTH
    predicates at read time (a single-column sort is tight in one dimension
    and spans the full range of the other).

    The ``span`` column is the pruning figure of merit the layout job
    monitors: sum of per-file extents (smaller = more files skipped per
    point predicate).

    Shape at 100 TB: the z-value is a narrow per-row integer projection;
    the equal-count curve cut runs DISTRIBUTED via the histogram-rank
    decomposition (``distributed_row_number`` over coarse zval buckets +
    integer NTILE arithmetic) — no global-sort window anywhere; the
    deterministic (zval, o_orderkey) tie-break keeps the cut
    oracle-checkable. A production writer would feed the discovered decile
    boundaries to ``repartitionByRange(zval)`` to emit one file per range;
    the per-file stats here are the zone-map entries it would write.
    """
    from ._util import distributed_row_number, ntile_from_rank

    (orders,) = tables(spark, sf_dir, "orders")
    z = orders.select(
        "o_orderkey",
        F.expr(_ZX).alias("x"),
        F.expr(_ZY_SPARK).alias("y"),
        F.expr(_morton_sql(_ZX, _ZY_SPARK, 10, "DIV")).alias("zval"),
    )
    ranked = distributed_row_number(
        z,
        bucket=(F.col("zval") / F.lit(1024)).cast("bigint"),
        order_by=[F.col("zval").asc(), F.col("o_orderkey").asc()],
    )
    # count the RAW table (column-pruned empty-schema scan), not `z`: the
    # count doesn't need the ~20-op Morton interleave evaluated per row
    n_total = orders.groupBy().agg(F.count(F.lit(1)).alias("n_total"))
    filed = ranked.crossJoin(F.broadcast(n_total)).select(
        "x",
        "y",
        ntile_from_rank(F.col("rn"), F.col("n_total"), _N_FILES).alias("file_id"),
    )
    return filed.groupBy("file_id").agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("x").alias("min_x"),
        F.max("x").alias("max_x"),
        F.min("y").alias("min_y"),
        F.max("y").alias("max_y"),
        (F.max("x") - F.min("x") + F.max("y") - F.min("y"))
        .cast("bigint")
        .alias("span"),
    )


# ---------------------------------------------------------------------------
# q195: incremental aggregate maintenance (merge base + delta partials)
# ---------------------------------------------------------------------------

_SPLIT_DATE = "1995-06-01"
_CENTS = "CAST(ROUND(o_totalprice * 100, 0) AS BIGINT)"


@register(
    "q195_incremental_agg_maintenance",
    oracle=f"""
    SELECT o_custkey AS custkey,
           count(*) AS n_orders,
           CAST(SUM({_CENTS}) AS BIGINT) AS total_cents,
           CAST(MAX({_CENTS}) AS BIGINT) AS max_cents
    FROM orders
    GROUP BY o_custkey
    """,
)
def q195_incremental_agg_maintenance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental aggregate maintenance: the materialized-view refresh
    shape. The per-customer rollup is maintained as a BASE aggregate
    (orders before {_SPLIT_DATE}) merged with a DELTA aggregate (orders on
    or after) by re-aggregating the unioned PARTIAL states — sum-of-sums,
    sum-of-counts, max-of-maxes — never rescanning the base fact table.

    Only algebraic aggregates decompose this way (count/sum/min/max, and
    avg/stddev via moment sums); that is exactly why the house money-math
    convention keeps exact integer partials. The oracle recomputes from
    scratch over the whole table — the equivalence IS the correctness
    statement of incremental maintenance.

    Shape at 100 TB: the daily refresh aggregates ONLY the delta partition
    (pruned by the date predicate at the parquet scan) and merges with the
    stored base on the group key — one shuffle of pre-aggregated,
    group-cardinality rows instead of a full fact-table rescan. Spark's
    map-side partial aggregation applies to both legs, and the final merge
    re-uses the same hash-agg operator because the merged expressions are
    themselves sums/maxes.
    """
    (orders,) = tables(spark, sf_dir, "orders")
    cents = F.round(F.col("o_totalprice") * 100, 0).cast("bigint")

    def partial(df: DataFrame) -> DataFrame:
        return (
            df.select(F.col("o_custkey").alias("custkey"), cents.alias("cents"))
            .groupBy("custkey")
            .agg(
                F.count(F.lit(1)).alias("p_n"),
                F.sum("cents").alias("p_sum"),
                F.max("cents").alias("p_max"),
            )
        )

    split = F.lit(_SPLIT_DATE).cast("date")
    base = partial(orders.filter(F.col("o_orderdate").cast("date") < split))
    delta = partial(orders.filter(F.col("o_orderdate").cast("date") >= split))
    return (
        base.unionAll(delta)
        .groupBy("custkey")
        .agg(
            F.sum("p_n").cast("bigint").alias("n_orders"),
            F.sum("p_sum").cast("bigint").alias("total_cents"),
            F.max("p_max").cast("bigint").alias("max_cents"),
        )
    )


# ---------------------------------------------------------------------------
# q196: compaction planning (greedy next-fit bin packing over file metadata)
# ---------------------------------------------------------------------------

#: synthetic deterministic "file size": integer cents folded into [50, 1046]
#: per row — the fixture has no real file listing, but the PLAN operates on
#: any (file_id, size_bytes) metadata table.
_ROW_BYTES = "CAST(ROUND(l_extendedprice * 100, 0) AS BIGINT) % 997 + 50"
_TARGET_BYTES = 2 * 1024 * 1024


@register(
    "q196_compaction_plan",
    oracle=f"""
    WITH files AS (
        SELECT l_orderkey // 64 AS file_id,
               count(*) AS n_recs,
               CAST(SUM({_ROW_BYTES}) AS BIGINT) AS size_bytes
        FROM lineitem GROUP BY l_orderkey // 64
    ),
    planned AS (
        SELECT file_id, size_bytes,
               CAST((SUM(size_bytes) OVER (ORDER BY file_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                - size_bytes) // {_TARGET_BYTES} AS BIGINT) AS bin_id
        FROM files
    )
    SELECT bin_id, count(*) AS n_files,
           CAST(SUM(size_bytes) AS BIGINT) AS bin_bytes,
           min(file_id) AS first_file, max(file_id) AS last_file
    FROM planned GROUP BY bin_id
    """,
)
def q196_compaction_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-file compaction planning (the Delta ``OPTIMIZE`` / Iceberg
    ``rewrite_data_files`` scheduler): given a (file_id, size_bytes)
    listing, assign files to ~{_TARGET_BYTES >> 20} MiB rewrite bins by
    greedy next-fit in file order — a file joins the bin its cumulative
    start offset lands in — keeping adjacent files together so rewritten
    files preserve clustering.

    The plan input is METADATA (one row per file, i.e. catalog-sized:
    millions of rows for a 100 TB table, not billions), which is why the
    global cumulative-sum window is acceptable here and nowhere else in
    the registry: the window runs over the file listing, not the data.
    Squeezing the listing itself out of the fact table (the ``files`` CTE)
    is one map-side-combined aggregate on the file key.

    Output is the rewrite manifest: per bin, how many files, how many
    bytes, and the contiguous file range — exactly what a compaction
    executor fans out over (one task per bin).
    """
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    files = (
        lineitem.select(
            F.expr("l_orderkey DIV 64").alias("file_id"),
            F.expr(_ROW_BYTES).alias("row_bytes"),
        )
        .groupBy("file_id")
        .agg(F.sum("row_bytes").cast("bigint").alias("size_bytes"))
    )
    cum = F.sum("size_bytes").over(
        Window.orderBy("file_id").rowsBetween(Window.unboundedPreceding, 0)
    )
    planned = files.withColumn("cum", cum).withColumn(
        "bin_id", F.expr(f"(cum - size_bytes) DIV {_TARGET_BYTES}")
    )
    return planned.groupBy("bin_id").agg(
        F.count(F.lit(1)).alias("n_files"),
        F.sum("size_bytes").cast("bigint").alias("bin_bytes"),
        F.min("file_id").alias("first_file"),
        F.max("file_id").alias("last_file"),
    )


# ---------------------------------------------------------------------------
# q197: group-wise linear regression from exact integer moments
# ---------------------------------------------------------------------------


@register(
    "q197_groupwise_regression",
    oracle="""
    WITH per_cust AS (
        SELECT c.c_nationkey AS nationkey,
               CAST(ROUND(c.c_acctbal * 100, 0) AS BIGINT) AS x,
               CAST(COALESCE(SUM(CAST(ROUND(o.o_totalprice * 100, 0) AS BIGINT)), 0)
                    AS BIGINT) AS y
        FROM customer c LEFT JOIN orders o ON c.c_custkey = o.o_custkey
        GROUP BY c.c_custkey, c.c_nationkey, c.c_acctbal
    ),
    moments AS (
        SELECT nationkey,
               count(*) AS n,
               SUM(CAST(x AS HUGEINT)) AS sx,
               SUM(CAST(y AS HUGEINT)) AS sy,
               SUM(CAST(x AS HUGEINT) * CAST(y AS HUGEINT)) AS sxy,
               SUM(CAST(x AS HUGEINT) * CAST(x AS HUGEINT)) AS sxx
        FROM per_cust GROUP BY nationkey
    )
    SELECT nationkey, CAST(n AS BIGINT) AS n_customers,
           ROUND(CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE), 6)
               AS slope,
           ROUND(CAST(sy AS DOUBLE) / n
                 - (CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE))
                   * (CAST(sx AS DOUBLE) / n), 6) AS intercept
    FROM moments
    """,
)
def q197_groupwise_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-nation least-squares regression of customer lifetime spend on
    account balance — the grouped model-fit primitive (feature drift by
    slice, calibration by segment) computed from EXACT integer moments.

    Float discipline (q147's five-moment pattern): x, y are exact cents;
    n, Σx, Σy, Σxy, Σx² accumulate as DECIMAL(38,0) on Spark / HUGEINT on
    DuckDB — associative, partition-order independent, no int64 wrap
    (Σxy at 100 TB is ~rows x 1e14, well inside 38 digits) — and the
    closed-form slope/intercept drop to double exactly once, with the
    IDENTICAL expression tree on both engines, so the 6-decimal round
    matches bit-for-bit. The built-in ``regr_slope`` is a streaming float
    recurrence whose value depends on aggregation order — unusable under
    a hash-equality gate, and genuinely nondeterministic run-to-run on a
    cluster.

    Shape at 100 TB: per-customer spend is one shuffle on the customer
    key (orders side pre-aggregated before the join — the fact table
    never reaches the join at row grain), then nation moments are a
    second tiny aggregate; 25 output rows.
    """
    customer, orders = tables(spark, sf_dir, "customer", "orders")
    spend = orders.groupBy("o_custkey").agg(
        F.sum(F.round(F.col("o_totalprice") * 100, 0).cast("bigint")).alias("spend")
    )
    per_cust = (
        customer.join(spend, F.col("c_custkey") == F.col("o_custkey"), "left")
        .select(
            F.col("c_nationkey").alias("nationkey"),
            F.round(F.col("c_acctbal") * 100, 0)
            .cast("bigint")
            .cast("decimal(38,0)")
            .alias("x"),
            F.coalesce(F.col("spend"), F.lit(0)).cast("decimal(38,0)").alias("y"),
        )
    )
    moments = per_cust.groupBy("nationkey").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    slope = "CAST(n*sxy - sx*sy AS DOUBLE) / CAST(n*sxx - sx*sx AS DOUBLE)"
    return moments.select(
        "nationkey",
        F.col("n").cast("bigint").alias("n_customers"),
        F.expr(f"ROUND({slope}, 6)").alias("slope"),
        F.expr(
            f"ROUND(CAST(sy AS DOUBLE) / n - ({slope}) * (CAST(sx AS DOUBLE) / n), 6)"
        ).alias("intercept"),
    )


# ---------------------------------------------------------------------------
# q198: Welch's t-test, one-vs-rest per event type
# ---------------------------------------------------------------------------

_VMICROS = "CAST(ROUND(value * 1000000, 0) AS BIGINT)"


@register(
    "q198_welch_ttest",
    oracle=f"""
    WITH vals AS (
        SELECT event_type, {_VMICROS} AS v FROM events WHERE value IS NOT NULL
    ),
    grp AS (
        SELECT event_type, count(*) AS n,
               SUM(CAST(v AS HUGEINT)) AS s,
               SUM(CAST(v AS HUGEINT) * CAST(v AS HUGEINT)) AS ss
        FROM vals GROUP BY event_type
    ),
    tot AS (
        SELECT SUM(n) AS tn, SUM(s) AS ts, SUM(ss) AS tss FROM grp
    )
    SELECT g.event_type, CAST(g.n AS BIGINT) AS n_events,
           ROUND(CAST(g.s AS DOUBLE) / g.n, 2) AS mean_micros,
           ROUND(
             (CAST(g.s AS DOUBLE) / g.n - CAST(t.ts - g.s AS DOUBLE) / (t.tn - g.n))
             / sqrt(
                 ((CAST(g.ss AS DOUBLE) - CAST(g.s AS DOUBLE) * CAST(g.s AS DOUBLE) / g.n)
                  / (g.n - 1)) / g.n
                 + ((CAST(t.tss - g.ss AS DOUBLE)
                     - CAST(t.ts - g.s AS DOUBLE) * CAST(t.ts - g.s AS DOUBLE) / (t.tn - g.n))
                    / (t.tn - g.n - 1)) / (t.tn - g.n)
               ), 4) AS t_stat
    FROM grp g CROSS JOIN tot t
    """,
)
def q198_welch_ttest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Welch's unequal-variance t-statistic for each event type's value
    against all OTHER events (one-vs-rest) — the guardrail-metric
    significance screen run over every experiment slice.

    The rest-of-population moments are derived by SUBTRACTION from one
    global total (rest = total - group), so the whole screen is ONE pass:
    a per-type moment aggregate plus a 1-row grand total broadcast back —
    no per-type second scan, no self-join of the fact table. Moments are
    exact integers (micros; HUGEINT / DECIMAL(38,0) squares), the t
    formula evaluates in double once with the identical expression tree
    both engines, rounded to 4 decimals.

    Shape at 100 TB: one map-side-combined shuffle on event_type (group
    cardinality ~ handfuls), one broadcast of a single row. Nothing else.
    """
    (events,) = tables(spark, sf_dir, "events")
    vals = events.filter(F.col("value").isNotNull()).select(
        "event_type",
        F.round(F.col("value") * 1000000, 0)
        .cast("bigint")
        .cast("decimal(38,0)")
        .alias("v"),
    )
    grp = vals.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("v").alias("s"),
        F.sum(F.col("v") * F.col("v")).alias("ss"),
    )
    tot = grp.agg(
        F.sum("n").alias("tn"), F.sum("s").alias("ts"), F.sum("ss").alias("tss")
    )
    joined = grp.crossJoin(F.broadcast(tot))
    mean_g = "CAST(s AS DOUBLE) / n"
    mean_r = "CAST(ts - s AS DOUBLE) / (tn - n)"
    var_g = "(CAST(ss AS DOUBLE) - CAST(s AS DOUBLE) * CAST(s AS DOUBLE) / n) / (n - 1)"
    var_r = (
        "(CAST(tss - ss AS DOUBLE)"
        " - CAST(ts - s AS DOUBLE) * CAST(ts - s AS DOUBLE) / (tn - n)) / (tn - n - 1)"
    )
    return joined.select(
        "event_type",
        F.col("n").cast("bigint").alias("n_events"),
        F.expr(f"ROUND({mean_g}, 2)").alias("mean_micros"),
        F.expr(
            f"ROUND(({mean_g} - {mean_r}) / sqrt(({var_g}) / n + ({var_r}) / (tn - n)), 4)"
        ).alias("t_stat"),
    )


# ---------------------------------------------------------------------------
# q199: triangle counting on the co-purchase graph
# ---------------------------------------------------------------------------


@register(
    "q199_triangle_count",
    oracle="""
    WITH pl AS (SELECT DISTINCT l_orderkey, l_partkey FROM lineitem),
    edges AS (
        SELECT a.l_partkey AS pa, b.l_partkey AS pb
        FROM pl a JOIN pl b
          ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
        GROUP BY a.l_partkey, b.l_partkey
        HAVING count(*) >= 2
    ),
    tri AS (
        SELECT e1.pa AS a, e1.pb AS b, e2.pb AS c
        FROM edges e1
        JOIN edges e2 ON e1.pb = e2.pa
        JOIN edges e3 ON e3.pa = e1.pa AND e3.pb = e2.pb
    ),
    nodes AS (
        SELECT a AS partkey FROM tri
        UNION ALL SELECT b FROM tri
        UNION ALL SELECT c FROM tri
    )
    SELECT partkey, count(*) AS n_triangles FROM nodes GROUP BY partkey
    """,
)
def q199_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-node triangle counts on the co-purchase graph (parts bought
    together in >= 2 distinct orders) — the clustering-coefficient /
    community-density primitive, and the third graph operator next to
    q96/q148 (components, PageRank).

    Edge construction bounds the classic explosion points: the intra-order
    self-join fans out at most |order|² per order (order size is bounded,
    ~7 lines), and the weight>=2 support threshold prunes incidental
    co-occurrence before any multi-hop join. Triangles are enumerated once
    each via the a<b<c orientation: wedges b->c joined from edges (a,b)
    x (b,c), closed by an equi-join probe into (a,c). Per-node counts are
    an explode of the 3 corners + one count shuffle.

    At 100 TB the further refinement is degree-orientation (point each
    edge from its lower-degree endpoint, Suri-Vassilvitskii) so wedge
    fan-out is bounded by sqrt-degree even on power-law graphs; with the
    support threshold the a<b<c orientation already keeps the wedge join
    within shuffle budget here, and the triangle SET is identical either
    way — orientation only re-orders enumeration.
    """
    (lineitem,) = tables(spark, sf_dir, "lineitem")
    pl = lineitem.select("l_orderkey", "l_partkey").distinct()
    edges = (
        pl.alias("a")
        .join(
            pl.select(
                F.col("l_orderkey").alias("ok_b"), F.col("l_partkey").alias("pb")
            ),
            (F.col("l_orderkey") == F.col("ok_b"))
            & (F.col("l_partkey") < F.col("pb")),
        )
        .groupBy(F.col("l_partkey").alias("pa"), "pb")
        .agg(F.count(F.lit(1)).alias("w"))
        .filter(F.col("w") >= 2)
        .select("pa", "pb")
    )
    wedges = edges.alias("e1").join(
        edges.select(F.col("pa").alias("pb2"), F.col("pb").alias("pc")).alias("e2"),
        F.col("pb") == F.col("pb2"),
    )
    tri = wedges.join(
        edges.select(F.col("pa").alias("pa3"), F.col("pb").alias("pc3")).alias("e3"),
        (F.col("pa") == F.col("pa3")) & (F.col("pc") == F.col("pc3")),
        "left_semi",
    ).select("pa", "pb", "pc")
    return (
        tri.select(
            F.explode(F.array("pa", "pb", "pc")).alias("partkey")
        )
        .groupBy("partkey")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
