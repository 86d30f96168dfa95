"""Composed-pipeline / cross-engine operators (split from pipeline_ops,
r8): curation pipeline v3, pooled retrieval, integrity manifests,
Bloom prefilters, smoothing forecasts, seasonal indices, topline
delta contribution (q244-q250).

House rules as everywhere in the registry: cross-engine MD5-60bit hashes
for any value that feeds a join or a comparison, integer-only thresholds
and ratios (ppm / cents), and (ts, id) tie-breaks so no window is
order-ambiguous.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import md5_60bit
from ..registry import register
from ._util import tables
from .pipeline_ops_eval import _MS_TOP, _MS_VPD  # shared late-interaction constants


# q244: curation pipeline v3 — batch-4 stages composed into one lazy plan
# ---------------------------------------------------------------------------

_V3_BOILER_MAX_PPM = 500_000  # drop docs with > 50% boilerplate shingles


@register(
    "q244_curation_pipeline_v3",
    oracle=f"""
    WITH w AS (SELECT doc_id, lang, source, string_split(text, ' ') AS ws
               FROM documents),
    sh AS (
        SELECT DISTINCT doc_id,
               CAST(('0x' || substr(md5(tok5), 1, 15)) AS BIGINT) AS tok
        FROM (
            SELECT doc_id,
                   unnest(list_transform(generate_series(1, len(ws) - 4),
                       i -> ws[i] || ' ' || ws[i+1] || ' ' || ws[i+2]
                            || ' ' || ws[i+3] || ' ' || ws[i+4])) AS tok5
            FROM w
        )
    ),
    shdf AS (
        SELECT doc_id, tok,
               count(*) OVER (PARTITION BY tok) AS df
        FROM sh
    ),
    boiler AS (
        SELECT doc_id,
               CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000
                    // count(*) AS BIGINT) AS boiler_ppm
        FROM shdf GROUP BY doc_id
    ),
    bg AS (
        SELECT doc_id, lang, source,
               unnest(list_transform(generate_series(1, len(ws) - 1),
                      i -> ws[i] || ' ' || ws[i+1])) AS b
        FROM w
    ),
    counted AS (
        SELECT doc_id, lang, source,
               count(*) OVER (PARTITION BY lang, b) AS cb
        FROM bg
    ),
    scored AS (
        SELECT doc_id, lang, source,
               CAST(SUM(1000000000 // cb) // count(*) AS BIGINT) AS rarity
        FROM counted GROUP BY doc_id, lang, source
    ),
    ranked AS (
        SELECT lang, source, doc_id, rarity,
               row_number() OVER (PARTITION BY lang, source
                                  ORDER BY rarity, doc_id) AS rn,
               count(*) OVER (PARTITION BY lang, source) AS n
        FROM scored
    ),
    gated AS (
        SELECT lang, source, doc_id, rarity,
               MAX(CASE WHEN rn = (9 * n + 9) // 10 THEN rarity END)
                   OVER (PARTITION BY lang, source) AS p90
        FROM ranked
    ),
    kept AS (
        SELECT g.lang, g.source, g.doc_id,
               CAST(len(string_split(d.text, ' ')) AS BIGINT) AS n_tok,
               CASE WHEN CAST(('0x' || substr(md5('split#'
                    || CAST(g.doc_id AS VARCHAR)), 1, 15)) AS BIGINT) % 10 < 8
                    THEN 1 ELSE 0 END AS is_train
        FROM gated g
        JOIN documents d ON g.doc_id = d.doc_id
        LEFT JOIN boiler bl ON g.doc_id = bl.doc_id
        WHERE COALESCE(bl.boiler_ppm, 0) < {_V3_BOILER_MAX_PPM}
          AND g.rarity <= g.p90
    )
    SELECT lang, source,
           CAST(count(*) AS BIGINT) AS n_kept,
           CAST(SUM(n_tok) AS BIGINT) AS kept_tokens,
           CAST(SUM(is_train) AS BIGINT) AS n_train,
           CAST(SUM(1 - is_train) AS BIGINT) AS n_test
    FROM kept GROUP BY lang, source
    """,
)
def q244_curation_pipeline_v3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation pipeline v3 — the batch-4 stages composed into ONE lazy
    plan the optimizer sees whole: boilerplate gate (q205's window-df
    signal, drop docs over 50% repeated shingles) → adaptive rarity gate
    (q213's per-slice p90, window-chained) → consistent-hash 80/20 split
    (q216's rule) → per-slice kept-doc/token/fold accounting. This is
    what a real corpus refresh runs nightly; composing it as one
    DataFrame means Catalyst shares the scan, pipelines the two explode
    lineages independently, and no intermediate ever hits storage.

    Each stage keeps its standalone query's exact semantics (same
    thresholds, same hashes), so this composition is regression-checked
    against the same oracles' logic end to end.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    docs = documents.withColumn("ws", F.split("text", " "))

    # stage 1: boilerplate ppm per doc (q205 lineage)
    sh5 = F.expr(
        """
        CASE WHEN size(ws) >= 5 THEN
            array_distinct(transform(sequence(0, size(ws) - 5),
                i -> concat_ws(' ', ws[i], ws[i+1], ws[i+2], ws[i+3], ws[i+4])))
        ELSE array() END
        """
    )
    tok = docs.select("doc_id", F.explode(sh5).alias("tok5")).select(
        "doc_id", md5_60bit(F.col("tok5")).alias("tok")
    )
    tok_df = tok.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("tok")))
    boiler = tok_df.groupBy("doc_id").agg(
        F.expr(
            "CAST(SUM(CASE WHEN df >= 2 THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("boiler_ppm")
    )

    # stage 2: rarity + per-slice p90 (q213 lineage, window-chained)
    pairs = F.zip_with(
        F.slice(F.col("ws"), 1, F.size("ws") - 1),
        F.slice(F.col("ws"), 2, F.size("ws") - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    bg = docs.select("doc_id", "lang", "source", F.explode(pairs).alias("b"))
    counted = bg.withColumn(
        "cb", F.count(F.lit(1)).over(Window.partitionBy("lang", "b"))
    )
    scored = counted.groupBy("doc_id", "lang", "source").agg(
        F.expr("CAST(SUM(1000000000 DIV cb) DIV COUNT(*) AS BIGINT)").alias("rarity")
    )
    w_slice = Window.partitionBy("lang", "source").orderBy("rarity", "doc_id")
    w_flat = Window.partitionBy("lang", "source")
    gated = (
        scored.withColumn("rn", F.row_number().over(w_slice))
        .withColumn("n", F.count(F.lit(1)).over(w_flat))
        .withColumn(
            "p90",
            F.max(
                F.when(F.col("rn") == F.expr("(9 * n + 9) DIV 10"), F.col("rarity"))
            ).over(w_flat),
        )
    )

    # stage 3: gate + split + accounting
    toks = documents.select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tok")
    )
    kept = (
        gated.join(boiler, "doc_id", "left")
        .filter(
            (F.coalesce("boiler_ppm", F.lit(0)) < _V3_BOILER_MAX_PPM)
            & (F.col("rarity") <= F.col("p90"))
        )
        .join(toks, "doc_id")
        .withColumn(
            "is_train",
            F.when(
                md5_60bit(F.col("doc_id").cast("string"), salt="split") % 10 < 8, 1
            ).otherwise(0),
        )
    )
    return kept.groupBy("lang", "source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_kept"),
        F.sum("n_tok").cast("bigint").alias("kept_tokens"),
        F.sum("is_train").cast("bigint").alias("n_train"),
        F.sum(1 - F.col("is_train")).cast("bigint").alias("n_test"),
    )


# ---------------------------------------------------------------------------
# q245: pooled-vector retrieval, contrasted with late interaction (q226)
# ---------------------------------------------------------------------------


@register(
    "q245_pooled_retrieval",
    oracle=f"""
    WITH q AS (
        SELECT vec_id // {_MS_VPD} AS doc, vec_id % {_MS_VPD} AS pos,
               list_transform(embedding,
                   x -> CAST(FLOOR(CAST(x AS DOUBLE) * 1000) AS BIGINT)) AS qv
        FROM embeddings
    ),
    pooled AS (
        SELECT doc,
               list_transform(range(1, 65),
                   i -> CAST(list_sum(list_transform(vecs, v -> v[i]))
                             // {_MS_VPD} AS BIGINT)) AS pv
        FROM (SELECT doc, list(qv ORDER BY pos) AS vecs FROM q GROUP BY doc)
    ),
    qdoc AS (SELECT pv AS qp FROM pooled WHERE doc = 0),
    scored AS (
        SELECT p.doc,
               CAST(list_sum(list_transform(range(1, 65),
                    i -> p.pv[i] * qd.qp[i])) AS BIGINT) AS pooled_dot
        FROM pooled p, qdoc qd WHERE p.doc <> 0
        ORDER BY pooled_dot DESC, p.doc LIMIT {_MS_TOP}
    ),
    maxsim AS (
        SELECT d.doc, q2.qpos,
               MAX(CAST(list_sum(list_transform(range(1, 65),
                   i -> d.qv[i] * q2.qv[i])) AS BIGINT)) AS best
        FROM (SELECT doc, qv FROM q WHERE doc <> 0) d,
             (SELECT pos AS qpos, qv FROM q WHERE doc = 0) q2
        GROUP BY d.doc, q2.qpos
    ),
    maxsim_top AS (
        SELECT doc FROM (
            SELECT doc, CAST(SUM(best) AS BIGINT) AS s FROM maxsim GROUP BY doc
            ORDER BY s DESC, doc LIMIT {_MS_TOP}
        )
    )
    SELECT s.doc, s.pooled_dot,
           (s.doc IN (SELECT doc FROM maxsim_top)) AS also_in_maxsim_top
    FROM scored s
    """,
)
def q245_pooled_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean-pooled retrieval over the same multi-vector pseudo-docs as
    q226, with a per-result flag for whether the doc ALSO appears in the
    late-interaction (MaxSim) top-{_MS_TOP} — the side-by-side that shows
    what pooling loses: a single mean vector per doc is {_MS_VPD}x
    cheaper to index and probe, and the overlap flags quantify the
    ranking disagreement on this corpus. Pooling is integer throughout
    (per-dim sum DIV {_MS_VPD} on quantized vectors).

    Shape: pooling is one groupBy collecting {_MS_VPD} vectors per doc
    (bounded arrays); scoring is a 1-row query-vector broadcast + one
    TakeOrdered; the MaxSim reference list reuses q226's aggregation
    shape and meets the pooled list in a tiny top-{_MS_TOP} semi-probe.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    quant = F.transform(
        "embedding", lambda x: F.floor(x.cast("double") * 1000).cast("bigint")
    )
    doc = F.expr(f"vec_id DIV {_MS_VPD}")
    q = embeddings.select(
        doc.alias("doc"), (F.col("vec_id") % _MS_VPD).alias("pos"), quant.alias("qv")
    )
    pooled = (
        q.groupBy("doc")
        .agg(F.array_sort(F.collect_list(F.struct("pos", "qv"))).alias("vecs"))
        .select(
            "doc",
            F.expr(
                f"transform(sequence(1, 64), i -> CAST(aggregate(vecs, 0L,"
                f" (acc, v) -> acc + v.qv[i - 1]) DIV {_MS_VPD} AS BIGINT))"
            ).alias("pv"),
        )
    )
    qdoc = pooled.filter(F.col("doc") == 0).select(F.col("pv").alias("qp"))
    zero = F.lit(0).cast("bigint")
    scored = (
        pooled.filter(F.col("doc") != 0)
        .crossJoin(F.broadcast(qdoc))
        .select(
            "doc",
            F.aggregate(
                F.zip_with("pv", "qp", lambda a, b: a * b), zero, lambda a, v: a + v
            ).alias("pooled_dot"),
        )
        .orderBy(F.col("pooled_dot").desc(), "doc")
        .limit(_MS_TOP)
    )
    # MaxSim reference list (q226's shape)
    qvecs = q.filter(F.col("doc") == 0).select(
        F.col("pos").alias("qpos"), F.col("qv").alias("qqv")
    )
    dvecs = q.filter(F.col("doc") != 0).select("doc", "qv")
    dot = F.aggregate(
        F.zip_with("qv", "qqv", lambda a, b: a * b), zero, lambda a, v: a + v
    )
    maxsim_top = (
        dvecs.crossJoin(F.broadcast(qvecs))
        .select("doc", "qpos", dot.alias("s"))
        .groupBy("doc", "qpos")
        .agg(F.max("s").alias("best"))
        .groupBy("doc")
        .agg(F.sum("best").alias("s"))
        .orderBy(F.col("s").desc(), "doc")
        .limit(_MS_TOP)
        .select(F.col("doc").alias("mdoc"))
    )
    return (
        scored.join(F.broadcast(maxsim_top), scored.doc == maxsim_top.mdoc, "left")
        .select(
            "doc",
            "pooled_dot",
            F.col("mdoc").isNotNull().alias("also_in_maxsim_top"),
        )
    )


# ---------------------------------------------------------------------------
# q246: cross-engine table integrity manifest (migration checksums)
# ---------------------------------------------------------------------------

_MANIFEST_TABLES = ["region", "nation", "customer", "orders"]
_MANIFEST_KEYS = {
    "region": "r_regionkey",
    "nation": "n_nationkey",
    "customer": "c_custkey",
    "orders": "o_orderkey",
}
_CKS_MOD = 1_000_000_007


@register(
    "q246_integrity_manifest",
    oracle="\nUNION ALL\n".join(
        f"""
    SELECT '{t}' AS table_name,
           CAST(count(*) AS BIGINT) AS n_rows,
           CAST(MIN({k}) AS BIGINT) AS min_key,
           CAST(MAX({k}) AS BIGINT) AS max_key,
           CAST(SUM(CAST(('0x' || substr(md5('cks#' || CAST({k} AS VARCHAR)),
                1, 15)) AS BIGINT) % {_CKS_MOD}) % {_CKS_MOD} AS BIGINT)
               AS key_checksum
    FROM {t}"""
        for t, k in _MANIFEST_KEYS.items()
    ),
)
def q246_integrity_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-engine table integrity manifest: per table, row count, key
    range, and an ORDER-INDEPENDENT key checksum (sum of salted 60-bit
    hashes mod a prime) — the artifact you publish before and after a
    migration/engine swap so 'same data' is a checkable claim rather than
    a hope. The checksum is partition-order-invariant by construction
    (modular addition commutes), so any engine, any parallelism, any
    file layout produces the same manifest — exactly the property this
    repo's whole oracle gate is built on, packaged as a first-class op.

    One map-side-combined aggregate per table, 4-row output.
    """
    out = None
    for t, k in _MANIFEST_KEYS.items():
        (tbl,) = tables(spark, sf_dir, t)
        row = tbl.agg(
            F.lit(t).alias("table_name"),
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.min(k).cast("bigint").alias("min_key"),
            F.max(k).cast("bigint").alias("max_key"),
            (
                F.sum(
                    md5_60bit(F.col(k).cast("string"), salt="cks") % _CKS_MOD
                )
                % _CKS_MOD
            )
            .cast("bigint")
            .alias("key_checksum"),
        )
        out = row if out is None else out.unionByName(row)
    return out


# ---------------------------------------------------------------------------
# q247: Bloom-filter join prefilter, built and probed cross-engine in SQL
# ---------------------------------------------------------------------------

_BLOOM_WORDS = 64  # 64 words x 60 bits = 3840-bit filter
_BLOOM_BITS = _BLOOM_WORDS * 60
_BLOOM_K = 3  # hash functions
_BLOOM_PRICE = 350_000  # build side: custkeys of orders above this total


def _q247_oracle() -> str:
    from ..functions.hashing import duckdb_md5_60bit

    def pos(salt: str, col: str) -> str:
        return f"{duckdb_md5_60bit(f'CAST({col} AS VARCHAR)', salt=salt)} % {_BLOOM_BITS}"

    build_bits = " UNION ALL ".join(
        f"SELECT ({pos(f'b{j}', 'k')}) AS p FROM keys" for j in range(_BLOOM_K)
    )
    probe_checks = " AND ".join(
        f"""COALESCE((SELECT (w.bits & (CAST(1 AS BIGINT)
            << (({pos(f'b{j}', 'c.c_custkey')}) % 60))) <> 0
            FROM bloom w
            WHERE w.word = ({pos(f'b{j}', 'c.c_custkey')}) // 60), FALSE)"""
        for j in range(_BLOOM_K)
    )
    return f"""
    WITH keys AS (
        SELECT DISTINCT o_custkey AS k FROM orders
        WHERE o_totalprice > {_BLOOM_PRICE}
    ),
    positions AS ({build_bits}),
    bloom AS (
        SELECT p // 60 AS word,
               CAST(bit_or(CAST(1 AS BIGINT) << (p % 60)) AS BIGINT) AS bits
        FROM positions GROUP BY p // 60
    ),
    probed AS (
        SELECT c.c_custkey,
               ({probe_checks}) AS bloom_pass,
               c.c_custkey IN (SELECT k FROM keys) AS true_match
        FROM customer c
    )
    SELECT CAST(count(*) AS BIGINT) AS n_probes,
           CAST(SUM(CASE WHEN true_match THEN 1 ELSE 0 END) AS BIGINT)
               AS n_true_match,
           CAST(SUM(CASE WHEN bloom_pass THEN 1 ELSE 0 END) AS BIGINT)
               AS n_bloom_pass,
           CAST(SUM(CASE WHEN bloom_pass AND NOT true_match THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_positive,
           CAST(SUM(CASE WHEN true_match AND NOT bloom_pass THEN 1 ELSE 0 END)
               AS BIGINT) AS n_false_negative,
           CAST(SUM(CASE WHEN NOT bloom_pass THEN 1 ELSE 0 END) * 1000000
                // count(*) AS BIGINT) AS pruned_ppm
    FROM probed
    """


@register("q247_bloom_prefilter", oracle=_q247_oracle())
def q247_bloom_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A real Bloom filter built and probed entirely in SQL, cross-engine
    bit-exact: the distinct custkeys of high-value orders hash into a
    {_BLOOM_BITS}-bit filter ({_BLOOM_WORDS} BIGINT words via bit_or,
    {_BLOOM_K} salted-MD5 hash functions), every customer row probes all
    {_BLOOM_K} bits, and the report scores it against the exact semi-join:
    true matches, bloom passes, false positives (bounded by design), the
    structurally-impossible false negatives (must be 0 — the oracle hash
    gate enforces the Bloom guarantee), and the pruned fraction.

    This is THE 100 TB join-prefilter shape: the {_BLOOM_WORDS}-row
    filter table broadcasts where the build-side key set would not, and
    the probe side prunes before the shuffle — what Spark's runtime
    bloom-filter join does internally, here as an explicit, measurable
    operator. Everything is integer bit arithmetic on 60-bit hash
    positions; no engine-native (non-portable) bloom primitive is used.
    """
    (orders, customer) = tables(spark, sf_dir, "orders", "customer")
    keys = (
        orders.filter(F.col("o_totalprice") > _BLOOM_PRICE)
        .select(F.col("o_custkey").alias("k"))
        .distinct()
    )

    def pos(salt: str, col) -> F.Column:
        return md5_60bit(col.cast("string"), salt=salt) % _BLOOM_BITS

    positions = None
    for j in range(_BLOOM_K):
        p = keys.select(pos(f"b{j}", F.col("k")).alias("p"))
        positions = p if positions is None else positions.unionByName(p)
    bloom = positions.groupBy(F.expr("p DIV 60").alias("word")).agg(
        F.expr("CAST(bit_or(shiftleft(CAST(1 AS BIGINT), CAST(p % 60 AS INT))) AS BIGINT)").alias(
            "bits"
        )
    )
    probe = customer.select("c_custkey")
    for j in range(_BLOOM_K):
        pj = pos(f"b{j}", F.col("c_custkey"))
        probe = probe.withColumn(
            f"w{j}", F.floor(pj / 60).cast("bigint")
        ).withColumn(f"bit{j}", pj % 60)
    # join the tiny bloom table once per hash function (broadcast)
    passed = probe
    for j in range(_BLOOM_K):
        b = bloom.select(
            F.col("word").alias(f"bw{j}"), F.col("bits").alias(f"bits{j}")
        )
        passed = passed.join(
            F.broadcast(b), passed[f"w{j}"] == b[f"bw{j}"], "left"
        ).withColumn(
            f"pass{j}",
            F.coalesce(
                F.expr(
                    f"(bits{j} & shiftleft(CAST(1 AS BIGINT),"
                    f" CAST(bit{j} AS INT))) <> 0"
                ),
                F.lit(False),
            ),
        )
    truth = keys.withColumn("is_true", F.lit(1))
    scored = (
        passed.join(truth, passed.c_custkey == truth.k, "left")
        .withColumn(
            "bloom_pass",
            F.expr(" AND ".join(f"pass{j}" for j in range(_BLOOM_K))),
        )
        .withColumn("true_match", F.col("is_true").isNotNull())
    )
    return scored.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_probes"),
        F.sum(F.when(F.col("true_match"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_true_match"),
        F.sum(F.when(F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_bloom_pass"),
        F.sum(F.when(F.col("bloom_pass") & ~F.col("true_match"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_positive"),
        F.sum(F.when(F.col("true_match") & ~F.col("bloom_pass"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_false_negative"),
        F.expr(
            "CAST(SUM(CASE WHEN NOT bloom_pass THEN 1 ELSE 0 END) * 1000000"
            " DIV COUNT(*) AS BIGINT)"
        ).alias("pruned_ppm"),
    )


# ---------------------------------------------------------------------------
# q248: exponential-smoothing forecast (alpha = 1/2, exact integer weights)
# ---------------------------------------------------------------------------


@register(
    "q248_exp_smoothing",
    oracle="""
    WITH daily AS (
        SELECT event_type,
               CAST(epoch_us(date_trunc('day', ts)) // 86400000000 AS BIGINT)
                   AS dayno,
               CAST(SUM(CAST(ROUND(value * 100) AS BIGINT)) AS BIGINT) AS cents
        FROM events GROUP BY event_type, dayno
    ),
    idx AS (
        SELECT event_type, cents,
               row_number() OVER (PARTITION BY event_type ORDER BY dayno) AS t,
               count(*) OVER (PARTITION BY event_type) AS n,
               MAX(dayno) OVER (PARTITION BY event_type) AS last_day
        FROM daily
    )
    SELECT event_type,
           CAST(MAX(n) AS BIGINT) AS n_days,
           CAST(MAX(CASE WHEN t = n THEN cents END) AS BIGINT) AS last_cents,
           -- alpha=1/2 smoothing: weight of day t is 2^(t-1) / (2^n - 1),
           -- evaluated exactly in integers (t caps at 62 to stay in BIGINT)
           CAST(SUM(cents * (CAST(1 AS BIGINT) << (LEAST(t, 62) - 1)))
                // ((CAST(1 AS BIGINT) << LEAST(MAX(n), 62)) - 1) AS BIGINT)
               AS forecast_cents
    FROM idx GROUP BY event_type
    """,
)
def q248_exp_smoothing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential-smoothing forecast of tomorrow's per-type daily revenue:
    alpha = 1/2 smoothing written in CLOSED FORM — day t (1 = oldest, n =
    newest) carries weight 2^(t-1)/(2^n − 1), so the 'recursive' smoother
    becomes one weighted sum with EXACT integer weights (powers of two)
    and one exact integer division. No float ever enters, so the forecast
    is bit-identical cross-engine — the trick that makes a forecasting
    primitive oracle-checkable at all. Horizon capped at 62 days of
    lookback (the BIGINT shift bound; older days carry < 2^-62 weight —
    literally sub-ulp — so the cap loses nothing).

    Shape: one (type, day) rollup (map-side combined), one per-type
    window for day indices, one weighted aggregate — all sharing the
    type partitioning. 5-row output.
    """
    (events,) = tables(spark, sf_dir, "events")
    dayno = (F.unix_micros(F.date_trunc("day", "ts")) / 86_400_000_000).cast("bigint")
    daily = events.groupBy("event_type", dayno.alias("dayno")).agg(
        F.sum(F.round(F.col("value") * 100).cast("bigint")).cast("bigint").alias("cents")
    )
    w_t = Window.partitionBy("event_type").orderBy("dayno")
    w_all = Window.partitionBy("event_type")
    idx = daily.select(
        "event_type",
        "cents",
        F.row_number().over(w_t).alias("t"),
        F.count(F.lit(1)).over(w_all).alias("n"),
    )
    return idx.groupBy("event_type").agg(
        F.max("n").cast("bigint").alias("n_days"),
        F.max(F.when(F.col("t") == F.col("n"), F.col("cents")))
        .cast("bigint")
        .alias("last_cents"),
        F.expr(
            "CAST(SUM(cents * shiftleft(CAST(1 AS BIGINT),"
            " CAST(LEAST(t, 62) AS INT) - 1))"
            " DIV (shiftleft(CAST(1 AS BIGINT), CAST(LEAST(MAX(n), 62) AS INT)) - 1)"
            " AS BIGINT)"
        ).alias("forecast_cents"),
    )


# ---------------------------------------------------------------------------
# q249: day-of-week seasonal indices (the multiplicative companion of q248)
# ---------------------------------------------------------------------------


@register(
    "q249_seasonal_index",
    oracle="""
    WITH rev AS (
        SELECT event_type,
               CAST(dayofweek(ts) + 1 AS BIGINT) AS dow,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    per_dow AS (
        SELECT event_type, dow,
               CAST(count(*) AS BIGINT) AS n,
               CAST(SUM(cents) AS BIGINT) AS c
        FROM rev GROUP BY event_type, dow
    ),
    tot AS (
        SELECT event_type,
               CAST(SUM(n) AS BIGINT) AS nt,
               CAST(SUM(c) AS BIGINT) AS ct
        FROM per_dow GROUP BY event_type
    )
    SELECT p.event_type, p.dow, p.n, p.c,
           CAST(p.c * t.nt * 1000000 // (p.n * t.ct) AS BIGINT)
               AS seasonal_index_ppm
    FROM per_dow p JOIN tot t ON p.event_type = t.event_type
    """,
)
def q249_seasonal_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal indices per event type: the ratio of that
    weekday's average revenue to the overall average, in ppm — the
    multiplicative seasonal component that q248's level forecast
    multiplies by (classical decomposition, the 'Mondays run 12% hot'
    table). The ratio-of-averages is one integer cross-multiplication —
    c·n_total·1e6 / (n·c_total) — so no float average ever forms.

    Shape: one (type, dow) aggregate; totals are a 5-row rollup of that
    aggregate joined back on the type key. Numbering note: Spark's
    dayofweek is 1=Sunday..7=Saturday while DuckDB's is 0-based — the
    oracle adds 1 to line them up.
    """
    (events,) = tables(spark, sf_dir, "events")
    rev = events.select(
        "event_type",
        F.dayofweek("ts").cast("bigint").alias("dow"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    per_dow = rev.groupBy("event_type", "dow").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum("cents").cast("bigint").alias("c"),
    )
    tot = per_dow.groupBy("event_type").agg(
        F.sum("n").cast("bigint").alias("nt"), F.sum("c").cast("bigint").alias("ct")
    )
    return per_dow.join(F.broadcast(tot), "event_type").select(
        "event_type",
        "dow",
        "n",
        "c",
        F.expr("CAST(c * nt * 1000000 DIV (n * ct) AS BIGINT)").alias(
            "seasonal_index_ppm"
        ),
    )


# ---------------------------------------------------------------------------
# q250: topline-delta contribution analysis (which slice moved the metric)
# ---------------------------------------------------------------------------

_CONTRIB_SPLIT_DAY = 15  # first half: day-of-month < 15


@register(
    "q250_delta_contribution",
    oracle=f"""
    WITH rev AS (
        SELECT event_type,
               CASE WHEN CAST(strftime(ts, '%d') AS BIGINT) < {_CONTRIB_SPLIT_DAY}
                    THEN 0 ELSE 1 END AS half,
               CAST(ROUND(value * 100) AS BIGINT) AS cents
        FROM events
    ),
    cells AS (
        SELECT event_type, half, CAST(SUM(cents) AS BIGINT) AS c
        FROM rev GROUP BY event_type, half
    ),
    wide AS (
        SELECT event_type,
               CAST(COALESCE(MAX(CASE WHEN half = 0 THEN c END), 0) AS BIGINT)
                   AS c0,
               CAST(COALESCE(MAX(CASE WHEN half = 1 THEN c END), 0) AS BIGINT)
                   AS c1
        FROM cells GROUP BY event_type
    ),
    tot AS (
        SELECT CAST(SUM(c1 - c0) AS BIGINT) AS total_delta FROM wide
    )
    SELECT w.event_type, w.c0 AS first_half_cents, w.c1 AS second_half_cents,
           CAST(w.c1 - w.c0 AS BIGINT) AS delta_cents,
           t.total_delta AS total_delta_cents
    FROM wide w, tot t
    """,
)
def q250_delta_contribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Topline-delta contribution analysis: when month-over-month (here
    first-half vs second-half) revenue moves, WHICH event type moved it —
    each slice's signed delta alongside the total, the additive
    decomposition (Σ slice deltas = topline delta by construction) that
    a metrics tree drills into before anyone guesses at causes. Signed
    deltas stay undivided cents (the q236 DIV/floor lesson); ratios are
    the reader's division.

    Shape: one (type, half) aggregate, a type-cardinality pivot, and a
    1-row total broadcast — everything after the first pass is
    metadata-scale.
    """
    (events,) = tables(spark, sf_dir, "events")
    rev = events.select(
        "event_type",
        F.when(F.dayofmonth("ts") < _CONTRIB_SPLIT_DAY, 0).otherwise(1).alias("half"),
        F.round(F.col("value") * 100).cast("bigint").alias("cents"),
    )
    cells = rev.groupBy("event_type", "half").agg(
        F.sum("cents").cast("bigint").alias("c")
    )
    wide = cells.groupBy("event_type").agg(
        F.coalesce(F.max(F.when(F.col("half") == 0, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("c0"),
        F.coalesce(F.max(F.when(F.col("half") == 1, F.col("c"))), F.lit(0))
        .cast("bigint")
        .alias("c1"),
    )
    tot = wide.agg(
        F.sum(F.col("c1") - F.col("c0")).cast("bigint").alias("total_delta_cents")
    )
    return wide.crossJoin(F.broadcast(tot)).select(
        "event_type",
        F.col("c0").alias("first_half_cents"),
        F.col("c1").alias("second_half_cents"),
        (F.col("c1") - F.col("c0")).cast("bigint").alias("delta_cents"),
        "total_delta_cents",
    )
