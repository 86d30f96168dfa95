"""Curation-pipeline planning operators (round 3, batch 3): the decision
tables a training-data pipeline computes ON TOP of its measurement queries —
temperature-based source mixing under a token budget, filter-cascade
attrition, LSH band/row tuning from the observed similarity histogram,
ingest lateness profiling (watermark sizing), and fixed-size per-group
debug samples.

House float discipline throughout: a single exactly-rounded IEEE primitive
(sqrt) is allowed per row when unavoidable, but every SUM that crosses rows
is over exact integers (floor-scaled first), and every threshold compares
integers — so results are partition-order independent and hash-gate stable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_md5_60bit, md5_60bit
from ..registry import register
from ._util import tables
from .features import q133_minhash_estimate  # noqa: F401  (composed by q202)

# ---------------------------------------------------------------------------
# q200: temperature-sampled token budget allocation
# ---------------------------------------------------------------------------

_TOKEN_BUDGET = 1_000_000_000  # tokens to draw across the whole mix


@register(
    "q200_token_budget_allocation",
    oracle=f"""
    WITH per_source AS (
        SELECT lang, source,
               CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
        FROM documents GROUP BY lang, source
    ),
    scaled AS (
        SELECT lang, source, n_tokens,
               CAST(FLOOR(sqrt(CAST(n_tokens AS DOUBLE)) * 1000000) AS BIGINT)
                   AS s_micros
        FROM per_source
    ),
    tot AS (SELECT CAST(SUM(s_micros) AS BIGINT) AS t FROM scaled)
    SELECT lang, source, n_tokens,
           CAST(s_micros * 1000000 // t AS BIGINT) AS weight_ppm,
           CAST({_TOKEN_BUDGET} * s_micros // t AS BIGINT) AS allocated_tokens,
           CAST(({_TOKEN_BUDGET} * s_micros // t) * 1000 // n_tokens AS BIGINT)
               AS epochs_milli
    FROM scaled CROSS JOIN tot
    """,
)
def q200_token_budget_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temperature-based source mixing (tau = 0.5): allocate a global token
    budget across (lang, source) slices proportionally to
    ``tokens^tau`` — the standard multilingual/source re-balancing rule
    (raw proportional starves small sources; uniform over-samples them;
    sqrt is the tau = 0.5 compromise) — and report each slice's sampling
    weight, its token allocation, and the implied epoch count over its own
    data (epochs > 1 means the slice repeats, the signal data teams watch
    for memorization risk).

    Float discipline: sqrt (exactly-rounded IEEE, identical on both
    engines) is floored to integer micros PER SLICE before any sum —
    the normalizing total is then an exact integer sum, so no
    summation-order float drift can shift an allocation. All divisions
    are integer (weight in ppm, epochs in milli).

    Shape at 100 TB: one map-side-combined token-count aggregate on the
    (lang, source) key, one 1-row total broadcast back. The allocation
    table is slice-cardinality — this is a metadata-scale planner over a
    data-scale measurement.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    per_source = documents.groupBy("lang", "source").agg(
        F.sum(F.size(F.split("text", " "))).cast("bigint").alias("n_tokens")
    )
    scaled = per_source.withColumn(
        "s_micros",
        F.floor(F.sqrt(F.col("n_tokens").cast("double")) * 1000000).cast("bigint"),
    )
    tot = scaled.agg(F.sum("s_micros").cast("bigint").alias("t"))
    return scaled.crossJoin(F.broadcast(tot)).select(
        "lang",
        "source",
        "n_tokens",
        F.expr("CAST(s_micros * 1000000 DIV t AS BIGINT)").alias("weight_ppm"),
        F.expr(f"CAST({_TOKEN_BUDGET} * s_micros DIV t AS BIGINT)").alias(
            "allocated_tokens"
        ),
        F.expr(
            f"CAST(({_TOKEN_BUDGET} * s_micros DIV t) * 1000 DIV n_tokens AS BIGINT)"
        ).alias("epochs_milli"),
    )


# ---------------------------------------------------------------------------
# q201: filter-cascade attrition report
# ---------------------------------------------------------------------------

#: ordered cascade: (stage name, PASS predicate in SQL shared verbatim by
#: both engines — integer-only comparisons)
_CASCADE = [
    ("min_length", "n_chars >= 150"),
    ("lang_allowlist", "lang IN ('en', 'de', 'fr', 'es')"),
    (
        "fertility",
        # BPE-ish pieces per whitespace word <= 3.0, integer-crossed
        "n_pieces * 10 <= n_ws * 30",
    ),
    (
        "word_length",
        # mean chars/word in [3, 12]: n_words*3 <= n_chars <= n_words*12
        "n_chars >= n_ws * 3 AND n_chars <= n_ws * 12",
    ),
]

_BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"


def _first_fail_sql() -> str:
    branches = " ".join(
        f"WHEN NOT ({pred}) THEN '{name}'" for name, pred in _CASCADE
    )
    return f"CASE {branches} ELSE NULL END"


@register(
    "q201_filter_cascade_attrition",
    oracle=f"""
    WITH feat AS (
        SELECT doc_id, lang, n_chars,
               len(regexp_extract_all(text, '{_BPE_PATTERN}')) AS n_pieces,
               len(string_split(text, ' ')) AS n_ws
        FROM documents
    ),
    verdict AS (SELECT {_first_fail_sql()} AS first_fail FROM feat),
    counts AS (
        SELECT count(*) AS n0,
               {", ".join(
                   f"count(*) FILTER (WHERE first_fail = '{name}') AS f{i}"
                   for i, (name, _) in enumerate(_CASCADE)
               )}
        FROM verdict
    )
    SELECT stage, n_in, n_dropped, n_in - n_dropped AS n_out,
           CAST(n_dropped * 1000000 // n_in AS BIGINT) AS drop_ppm
    FROM (
        SELECT unnest(['{_CASCADE[0][0]}', '{_CASCADE[1][0]}',
                       '{_CASCADE[2][0]}', '{_CASCADE[3][0]}']) AS stage,
               unnest([n0, n0 - f0, n0 - f0 - f1, n0 - f0 - f1 - f2]) AS n_in,
               unnest([f0, f1, f2, f3]) AS n_dropped
        FROM counts
    )
    """,
)
def q201_filter_cascade_attrition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Filter-cascade attrition report: run the ordered quality cascade
    (min length -> language allowlist -> tokenizer fertility -> mean word
    length) and report, PER STAGE, how many documents reached it, how many
    it dropped, and the drop rate — the funnel table every curation run
    publishes so a mis-tuned rule (one stage suddenly eating 40% of the
    corpus) is visible before training does.

    Single-scan shape: each document's FIRST failing stage is one CASE
    projection; the per-stage counters are conditional aggregates of that
    verdict in ONE pass (never one scan per rule — q169's fusion rule);
    and the stage rows are unpivoted from the single counter row with
    ``stack``. Reached-counts derive by subtraction (n_in[k+1] = n_in[k] -
    dropped[k]), which is exactly the sequential-cascade semantics.

    At 100 TB this is a narrow projection + one 1-row aggregate —
    scan-bound, no shuffle beyond the final 4-row unpivot.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    feat = documents.select(
        "doc_id",
        "lang",
        "n_chars",
        F.size(F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)")).alias(
            "n_pieces"
        ),
        F.size(F.split("text", " ")).alias("n_ws"),
    )
    verdict = feat.select(F.expr(_first_fail_sql()).alias("first_fail"))
    counters = verdict.agg(
        F.count(F.lit(1)).alias("n0"),
        *[
            F.count(F.when(F.col("first_fail") == name, 1)).alias(f"f{i}")
            for i, (name, _) in enumerate(_CASCADE)
        ],
    )
    names = [name for name, _ in _CASCADE]
    stack = F.expr(
        "stack(4, "
        f"'{names[0]}', n0, f0, "
        f"'{names[1]}', n0 - f0, f1, "
        f"'{names[2]}', n0 - f0 - f1, f2, "
        f"'{names[3]}', n0 - f0 - f1 - f2, f3"
        ") AS (stage, n_in, n_dropped)"
    )
    return counters.select(stack).select(
        "stage",
        "n_in",
        "n_dropped",
        (F.col("n_in") - F.col("n_dropped")).alias("n_out"),
        F.expr("CAST(n_dropped * 1000000 DIV n_in AS BIGINT)").alias("drop_ppm"),
    )


# ---------------------------------------------------------------------------
# q202: LSH band/row tuning from the observed similarity histogram
# ---------------------------------------------------------------------------

#: (rows-per-band r, bands b) configurations under the integer-exactness
#: bound r*b <= 6 (probabilities stay inside BIGINT without float pow)
_LSH_CONFIGS = [(1, 4), (2, 2), (2, 3), (3, 2)]


def _p_candidate_ppm_sql(r: int, b: int, j: str) -> str:
    """1 - (1 - j^r)^b in exact integer ppm for jaccard-milli ``j``.

    j^r and (1000^r - j^r)^b are exact BIGINT products (r*b <= 6 keeps the
    magnitude <= 1e18); the final scale-down is one integer division — no
    float pow anywhere, so both engines agree bit-for-bit.
    """
    jr = " * ".join([j] * r)  # j^r, <= 1000^r
    miss = f"({1000 ** r} - {jr})"  # 1000^r - j^r
    missb = " * ".join([miss] * b)  # <= 1000^(r*b) <= 1e18
    scale = 10 ** (3 * r * b - 6)
    return f"CAST(1000000 - ({missb}) {{div}} {scale} AS BIGINT)"


def _q202_oracle() -> str:
    from ..registry import _REGISTRY

    base = _REGISTRY["q133_minhash_estimate"].oracle
    hist = f"""
    WITH base AS ({base}),
    hist AS (
        SELECT CAST(jaccard_milli // 100 AS BIGINT) AS bucket,
               count(*) AS n_pairs
        FROM base GROUP BY jaccard_milli // 100
    )
    """
    branches = []
    for r, b in _LSH_CONFIGS:
        p = _p_candidate_ppm_sql(r, b, "(bucket * 100 + 50)").format(div="//")
        branches.append(
            f"""SELECT {r} AS rows_per_band, {b} AS n_bands, bucket, n_pairs,
               {p} AS p_cand_ppm,
               CAST(n_pairs * {p} // 1000000 AS BIGINT) AS expected_candidates
            FROM hist"""
        )
    return hist + " UNION ALL ".join(branches)


@register("q202_lsh_band_tuning", oracle=_q202_oracle())
def q202_lsh_band_tuning(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LSH band/row tuning table: fold the OBSERVED pair-similarity
    histogram (q133's candidate diagnostics, bucketed by jaccard decile)
    against the S-curve ``P(candidate | j) = 1 - (1 - j^r)^b`` for each
    (rows-per-band, bands) configuration, yielding the expected candidate
    volume per similarity bucket — the table that picks (r, b) by showing
    how many low-similarity pairs each config would drag into
    verification (false-positive cost) vs how many near-dups it would
    miss (false-negative cost, the high-bucket rows with p < 1).

    The S-curve is computed in EXACT integer arithmetic: j in milli,
    j^r and (1000^r - j^r)^b as literal products generated per config
    (r*b <= 6 bounds them inside BIGINT), one integer division to ppm —
    no float ``pow``, whose libm rounding is not guaranteed identical
    across engines. Configs are unrolled as generated projections over
    the tiny histogram, not a data-driven pow().

    Composition: q133 (registered, oracle-checked) supplies the input —
    the same reuse discipline as q96/q144/q148's shared dup graph. The
    histogram is bucket-cardinality (10 rows), so the tuning table costs
    one aggregate over q133 plus metadata-scale projection.
    """
    base = q133_minhash_estimate(spark, sf_dir)
    hist = (
        base.select(F.expr("CAST(jaccard_milli DIV 100 AS BIGINT)").alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n_pairs"))
    )
    branches = []
    for r, b in _LSH_CONFIGS:
        p = _p_candidate_ppm_sql(r, b, "(bucket * 100 + 50)").format(div="DIV")
        branches.append(
            hist.select(
                F.lit(r).alias("rows_per_band"),
                F.lit(b).alias("n_bands"),
                "bucket",
                "n_pairs",
                F.expr(p).alias("p_cand_ppm"),
                F.expr(f"CAST(n_pairs * {p} DIV 1000000 AS BIGINT)").alias(
                    "expected_candidates"
                ),
            )
        )
    out = branches[0]
    for br in branches[1:]:
        out = out.unionAll(br)
    return out


# ---------------------------------------------------------------------------
# q203: out-of-order ingest profile (watermark sizing)
# ---------------------------------------------------------------------------


@register(
    "q203_out_of_order_profile",
    oracle="""
    WITH arrivals AS (
        SELECT user_id, event_id, epoch_us(ts) AS us,
               MAX(epoch_us(ts)) OVER (
                   PARTITION BY user_id ORDER BY event_id
                   ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
               ) AS high_water
        FROM events
    )
    SELECT user_id,
           count(*) AS n_events,
           count(*) FILTER (WHERE us < high_water) AS n_late,
           CAST(count(*) FILTER (WHERE us < high_water) * 1000000 // count(*)
                AS BIGINT) AS late_ppm,
           CAST(COALESCE(MAX(CASE WHEN us < high_water THEN high_water - us END), 0)
                AS BIGINT) AS max_lateness_us
    FROM arrivals
    GROUP BY user_id
    """,
)
def q203_out_of_order_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Out-of-order ingest profile: treating event_id as arrival order,
    flag events whose timestamp is behind the per-user event-time high
    water mark and measure how late they are — the measurement that SIZES
    a streaming watermark (``withWatermark`` delay = a high percentile of
    ``max_lateness``; too tight drops events, too loose bloats state).
    The batch twin of the streaming layer's late-data handling, run over
    history to pick the threshold.

    One window (running max over arrival order, one shuffle on user_id)
    and one aggregate on the same key — AQE-coalesced, no join. Lateness
    stays in integer microseconds.
    """
    (events,) = tables(spark, sf_dir, "events")
    us = F.unix_micros("ts")
    w = (
        Window.partitionBy("user_id")
        .orderBy("event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    arrivals = events.select(
        "user_id", "event_id", us.alias("us")
    ).withColumn("high_water", F.max("us").over(w))
    late = F.col("us") < F.col("high_water")
    return arrivals.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.count(F.when(late, 1)).alias("n_late"),
        F.expr(
            "CAST(count(CASE WHEN us < high_water THEN 1 END) * 1000000"
            " DIV count(*) AS BIGINT)"
        ).alias("late_ppm"),
        F.coalesce(
            F.max(F.when(late, F.col("high_water") - F.col("us"))), F.lit(0)
        )
        .cast("bigint")
        .alias("max_lateness_us"),
    )


# ---------------------------------------------------------------------------
# q204: fixed-size per-group sample
# ---------------------------------------------------------------------------

_SAMPLE_K = 5


@register(
    "q204_group_sample_topk",
    oracle=f"""
    SELECT lang, doc_id, rank
    FROM (
        SELECT lang, doc_id,
               row_number() OVER (
                   PARTITION BY lang
                   ORDER BY {duckdb_md5_60bit("CAST(doc_id AS VARCHAR)", salt="s204")},
                            doc_id
               ) AS rank
        FROM documents
    )
    WHERE rank <= {_SAMPLE_K}
    """,
)
def q204_group_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size per-group sample: exactly {_SAMPLE_K} documents per
    language, chosen by salted-hash rank — the "show me 5 examples from
    every slice" debug query. Differs from q67 (stratified FRACTION
    sample: output grows with the slice) in that the output is BOUNDED
    per group regardless of slice size, and from LIMIT in that the pick
    is deterministic and uniform-ish (hash order), not scan order.

    The per-group row_number is a rank-k window: at 100 TB, hash-rank
    top-k per group should pre-prune with a per-partition top-k before
    the shuffle (Spark does exactly this for TakeOrdered; for grouped
    rank the WindowGroupLimit rule pushes the k-filter below the sort),
    so only ~k rows per group per partition cross the wire.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    w = Window.partitionBy("lang").orderBy(
        md5_60bit(F.col("doc_id").cast("string"), salt="s204"), "doc_id"
    )
    return (
        documents.select("lang", "doc_id")
        .withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= _SAMPLE_K)
    )


# ---------------------------------------------------------------------------
# q254: dataset card — per-source governance summary
# ---------------------------------------------------------------------------


@register(
    "q254_dataset_card",
    oracle="""
    WITH base AS (
        SELECT source, lang, n_chars, doc_id,
               md5(text) AS digest,
               len(string_split(text, ' '))::BIGINT AS n_tokens
        FROM documents
    ),
    agg AS (
        SELECT source,
               COUNT(*)::BIGINT                 AS n_docs,
               CAST(SUM(n_tokens) AS BIGINT)    AS n_tokens,
               COUNT(DISTINCT lang)::BIGINT     AS n_langs,
               (COUNT(*) - COUNT(DISTINCT digest))::BIGINT AS n_exact_dupes,
               CAST(SUM(n_chars) AS BIGINT)     AS total_chars
        FROM base GROUP BY source
    ),
    ranked AS (
        SELECT source, n_chars,
               row_number() OVER (PARTITION BY source ORDER BY n_chars, doc_id) AS rn,
               COUNT(*) OVER (PARTITION BY source) AS n
        FROM base
    ),
    med AS (
        SELECT source, n_chars AS p50_chars FROM ranked
        WHERE rn = CAST(CEIL(n / 2.0) AS BIGINT)
    )
    SELECT a.source, a.n_docs, a.n_tokens, a.n_langs, a.n_exact_dupes,
           a.total_chars, m.p50_chars
    FROM agg a JOIN med m ON a.source = m.source
    """,
)
def q254_dataset_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset card: the per-source governance summary a training-data
    release ships with — document/token/language counts, exact-duplicate
    count (docs minus distinct content digests), total and median-low
    document length.

    One corpus scan feeds both the grouped aggregate and the median window
    (same shuffle key, ``source``); the exact median-low is the rank
    ceil(n/2) row rather than a float percentile, so it hash-matches
    cross-engine. All counters are exact integers — a card must be
    reproducible, not approximate.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    base = documents.select(
        "source",
        "lang",
        "n_chars",
        "doc_id",
        F.md5(F.col("text").cast("binary")).alias("digest"),
        F.size(F.split("text", " ")).cast("bigint").alias("n_tokens"),
    )
    agg = base.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("n_tokens"),
        F.countDistinct("lang").cast("bigint").alias("n_langs"),
        (F.count(F.lit(1)) - F.countDistinct("digest")).cast("bigint").alias("n_exact_dupes"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    wc = Window.partitionBy("source")
    med = (
        base.select(
            "source",
            "n_chars",
            F.row_number().over(w).alias("rn"),
            F.count(F.lit(1)).over(wc).alias("n"),
        )
        .filter(F.col("rn") == F.ceil(F.col("n") / F.lit(2.0)).cast("bigint"))
        .select("source", F.col("n_chars").alias("p50_chars"))
    )
    return agg.join(med, "source").select(
        "source", "n_docs", "n_tokens", "n_langs", "n_exact_dupes", "total_chars", "p50_chars"
    )


# ---------------------------------------------------------------------------
# q255: near-dup-cluster-aware train/valid/test split (leakage-free)
# ---------------------------------------------------------------------------


def _q255_oracle_suffix() -> str:
    bucket = duckdb_md5_60bit("CAST(rep_id AS VARCHAR)", salt="leakage")
    return f"""
    , rep AS (
        SELECT d.doc_id,
               COALESCE(c.comp_id, d.doc_id) AS rep_id,
               CASE WHEN c.node IS NULL THEN 0 ELSE 1 END AS in_cluster
        FROM documents d LEFT JOIN comp c ON d.doc_id = c.node
    ),
    assigned AS (
        SELECT CASE WHEN {bucket} % 100 < 80 THEN 'train'
                    WHEN {bucket} % 100 < 90 THEN 'valid'
                    ELSE 'test' END AS split,
               rep_id, in_cluster
        FROM rep
    )
    SELECT split,
           COUNT(*)::BIGINT AS n_docs,
           CAST(SUM(in_cluster) AS BIGINT) AS n_cluster_docs,
           COUNT(DISTINCT CASE WHEN in_cluster = 1 THEN rep_id END)::BIGINT AS n_clusters
    FROM assigned GROUP BY split
    """


def _q255_oracle() -> str:
    from .dedup import NEARDUP_COMPONENTS_SQL

    return NEARDUP_COMPONENTS_SQL + _q255_oracle_suffix()


def _q255_fast_oracle():
    from .dedup import _fast_components_oracle

    return _fast_components_oracle(_q255_oracle_suffix())


@register(
    "q255_cluster_aware_split",
    oracle=_q255_oracle(),
    fast_oracle=_q255_fast_oracle(),
)
def q255_cluster_aware_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Leakage-free train/valid/test split: the split bucket is hashed from
    the document's near-dup CLUSTER representative (q96's components), not
    its own id — near-duplicate documents can never straddle train and
    test, the contamination mode a plain per-doc hash split (q66) permits.

    Scale shape: the components table is duplicate-density-sized and
    memoized (computed once per dataset, dedup.py); the split itself is the
    same zero-I/O hash predicate as q66 over ``coalesce(comp_id, doc_id)``
    after one LEFT join against that small table — broadcast at real-world
    duplicate rates. ``tests/test_curation_ops.py`` asserts the invariant
    directly: zero clusters span more than one split.
    """
    from .dedup import _neardup_components

    (documents,) = tables(spark, sf_dir, "documents")
    comps = _neardup_components(spark, sf_dir)

    def _split_of(key):
        b = md5_60bit(key.cast("string"), salt="leakage") % 100
        return (
            F.when(b < 80, "train").when(b < 90, "valid").otherwise("test")
        )

    # Corpus side: one narrow count per split — every doc's bucket hashes
    # its cluster representative (comp if clustered, else its own id).
    rep = documents.select("doc_id").join(
        F.broadcast(comps), documents.doc_id == comps.node, "left"
    )
    base = rep.select(
        _split_of(F.coalesce(F.col("comp"), F.col("doc_id"))).alias("split")
    ).groupBy("split").agg(F.count(F.lit(1)).cast("bigint").alias("n_docs"))
    # Cluster side: an in-cluster doc's split is its comp's split by
    # construction (that IS the leakage-free property), so cluster-doc and
    # distinct-cluster counts come from the duplicate-density-sized
    # components table alone — the corpus-wide COUNT(DISTINCT) and its
    # exchanges are gone (r14; previously the distinct ran over all docs).
    cl = comps.select(_split_of(F.col("comp")).alias("split"), "comp").groupBy(
        "split"
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_cluster_docs_"),
        F.countDistinct("comp").cast("bigint").alias("n_clusters_"),
    )
    return base.join(F.broadcast(cl), "split", "left").select(
        "split",
        "n_docs",
        F.coalesce("n_cluster_docs_", F.lit(0)).cast("bigint").alias("n_cluster_docs"),
        F.coalesce("n_clusters_", F.lit(0)).cast("bigint").alias("n_clusters"),
    )


# ---------------------------------------------------------------------------
# q256: l-diversity audit (attribute-disclosure complement of q223)
# ---------------------------------------------------------------------------

_LD_L = 3  # groups with fewer distinct sensitive values are disclosure risks
_LD_BUCKET = 1000  # acctbal band width (the sensitive attribute)


@register(
    "q256_l_diversity",
    oracle=f"""
    WITH quasi AS (
        SELECT n.n_name AS nation, c.c_mktsegment AS segment,
               CAST(FLOOR(c.c_acctbal / {_LD_BUCKET}) AS BIGINT) AS bal_band
        FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
    ),
    groups AS (
        SELECT nation, segment,
               COUNT(*)::BIGINT AS grp_n,
               COUNT(DISTINCT bal_band)::BIGINT AS l_val
        FROM quasi GROUP BY nation, segment
    )
    SELECT nation,
           COUNT(*)::BIGINT AS n_groups,
           CAST(MIN(l_val) AS BIGINT) AS min_l,
           CAST(SUM(CASE WHEN l_val < {_LD_L} THEN 1 ELSE 0 END) AS BIGINT)
               AS n_low_diversity,
           CAST(SUM(CASE WHEN l_val < {_LD_L} THEN grp_n ELSE 0 END) AS BIGINT)
               AS n_rows_at_risk
    FROM groups GROUP BY nation
    """,
)
def q256_l_diversity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """l-diversity audit: a quasi-identifier group can be k-anonymous (q223)
    yet still leak an attribute if everyone in it shares the same sensitive
    value. Per (nation, segment) group, count distinct sensitive values
    (account-balance band); report per nation the groups below ``_LD_L``
    distinct values and the rows exposed.

    Two cascaded aggregates on the same shuffle key prefix — the second is
    nation-cardinality-sized. The dimension join broadcasts.
    """
    (customer, nation) = tables(spark, sf_dir, "customer", "nation")
    quasi = customer.join(
        F.broadcast(nation), customer.c_nationkey == nation.n_nationkey
    ).select(
        F.col("n_name").alias("nation"),
        F.col("c_mktsegment").alias("segment"),
        F.floor(F.col("c_acctbal") / _LD_BUCKET).cast("bigint").alias("bal_band"),
    )
    groups = quasi.groupBy("nation", "segment").agg(
        F.count(F.lit(1)).cast("bigint").alias("grp_n"),
        F.countDistinct("bal_band").cast("bigint").alias("l_val"),
    )
    return groups.groupBy("nation").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
        F.min("l_val").cast("bigint").alias("min_l"),
        F.sum(F.when(F.col("l_val") < _LD_L, 1).otherwise(0)).cast("bigint").alias("n_low_diversity"),
        F.sum(F.when(F.col("l_val") < _LD_L, F.col("grp_n")).otherwise(0))
        .cast("bigint")
        .alias("n_rows_at_risk"),
    )
