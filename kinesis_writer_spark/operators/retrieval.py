"""Retrieval scoring and corpus-hygiene operators: TF-IDF, BM25, train/test
decontamination, and embedding-cosine near-duplicate removal.

These extend the LLM-data-pipeline surface (SURVEY.md §2.2) with the scoring
primitives a pretraining corpus pipeline runs right before export: rank terms
and documents (TF-IDF / BM25), strip evaluation contamination (n-gram overlap
between held-out and train splits), and drop semantically-duplicate vectors.

Scale notes (100 TB): every "model input" here (document frequencies, global
doc-length stats, query-term lists, centroid tables) is a vocabulary- or
constant-sized aggregate that broadcasts back over the corpus; the corpus side
is touched only by narrow projections, exploded-token aggregations with
map-side partials, and equi-joins on hash keys. Score arithmetic that feeds a
ranking is floor-scaled to integers before any cross-row sum, so results are
bit-stable across engines, partition counts, and summation orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_md5_60bit, md5_60bit
from ..functions.vectors import duckdb_dot, duckdb_sq_norm
from ..registry import register
from ._util import cached_exprs, tables
from .sampling import _bucket, _duckdb_bucket
from .similarity import _km_assign_expr, ivf_assigned_sql_ctes, ivf_train_centroids

# ---------------------------------------------------------------------------
# TF-IDF
# ---------------------------------------------------------------------------


@register(
    "q99_tfidf",
    oracle="""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    df AS (
        SELECT term, COUNT(*) AS df FROM tf GROUP BY term
    ),
    n AS (SELECT COUNT(*) AS n_docs FROM documents),
    scored AS (
        SELECT tf.doc_id, tf.term, tf.tf, df.df,
               tf.tf * LN(n.n_docs::DOUBLE / df.df) AS score
        FROM tf JOIN df ON tf.term = df.term CROSS JOIN n
    )
    SELECT doc_id, term, tf, df, ROUND(score, 4) AS tfidf, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                     ORDER BY score DESC, term ASC) AS rank
        FROM scored
    )
    WHERE rank <= 3
    """,
)
def q99_tfidf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 TF-IDF terms per document (tf × ln(N/df)).

    Spark shape: one exploded-token lineage → groupBy(doc, term) with
    map-side partials; document frequencies are a vocabulary-sized aggregate
    OF that tf table (no second pass over text); N is a 1-row aggregate
    broadcast via cross join. The per-doc top-k window repartitions on
    doc_id only — all inputs to the score are integers, so the double
    product is bit-identical across engines and the rank tie-break (term
    asc) fires only on structurally-equal scores.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    tok = documents.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    df_t = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n = documents.agg(F.count(F.lit(1)).alias("n_docs"))
    scored = (
        tf.join(df_t, "term")
        .crossJoin(F.broadcast(n))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * F.log(F.col("n_docs").cast("double") / F.col("df"))).alias("score"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.col("score").desc(), F.col("term").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 3)
        .select("doc_id", "term", "tf", "df", F.round("score", 4).alias("tfidf"), "rank")
    )


# ---------------------------------------------------------------------------
# BM25
# ---------------------------------------------------------------------------

_BM25_K1 = 1.2
_BM25_B = 0.75
_BM25_NQ = 5  # query = the 5 globally most frequent tokens
_BM25_SCALE = 1_000_000  # per-term scores floor-scaled to 1e-6 BIGINT


@register(
    "q100_bm25",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, unnest(string_split(text, ' ')) AS term FROM documents
    ),
    tf AS (
        SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY doc_id, term
    ),
    q AS (
        SELECT term, df FROM (
            SELECT term, COUNT(*) AS df, SUM(tf) AS total,
                   ROW_NUMBER() OVER (ORDER BY SUM(tf) DESC, term ASC) AS rn
            FROM tf GROUP BY term
        ) WHERE rn <= {_BM25_NQ}
    ),
    stats AS (
        SELECT COUNT(*) AS n_docs,
               SUM(len(string_split(text, ' ')))::DOUBLE / COUNT(*) AS avgdl
        FROM documents
    ),
    dl AS (
        SELECT doc_id, len(string_split(text, ' ')) AS dl FROM documents
    ),
    per_term AS (
        SELECT tf.doc_id,
               CAST(FLOOR({_BM25_SCALE} *
                    LN((stats.n_docs - q.df + 0.5) / (q.df + 0.5) + 1.0) *
                    (tf.tf * ({_BM25_K1} + 1.0)) /
                    (tf.tf + {_BM25_K1} * (1.0 - {_BM25_B}
                        + {_BM25_B} * dl.dl / stats.avgdl))) AS BIGINT) AS s
        FROM tf JOIN q ON tf.term = q.term
        JOIN dl ON tf.doc_id = dl.doc_id
        CROSS JOIN stats
    )
    SELECT doc_id, COUNT(*) AS n_terms_matched, CAST(SUM(s) AS BIGINT) AS score_1e6
    FROM per_term
    GROUP BY doc_id
    ORDER BY score_1e6 DESC, doc_id ASC
    LIMIT 10
    """,
)
def q100_bm25(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-10 documents for a corpus-derived query (the 5 globally most
    frequent tokens), k1=1.2, b=0.75.

    Determinism across engines: per-(doc, term) scores are floor-scaled to
    1e-6 BIGINTs *before* the per-doc sum, so the ranking key is an exact
    integer no matter what order partial sums combine in. avgdl is computed
    as exact-integer token sum ÷ count (never AVG over doubles). Spark
    shape: the query-term table (5 rows) and the global stats (1 row) are
    broadcast; the big side is the tf aggregate joined narrowly to per-doc
    lengths; final ranking is a TakeOrdered (orderBy + limit), no full sort.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    tok = documents.select("doc_id", F.explode(F.split("text", " ")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    # global top-NQ terms as a TakeOrdered (distributed partial top-k per
    # partition, merged on the driver) — NOT an unpartitioned row_number
    # window, which would sort every distinct term in a single task.
    q = (
        tf.groupBy("term")
        .agg(F.count(F.lit(1)).alias("df"), F.sum("tf").alias("total"))
        .orderBy(F.col("total").desc(), F.col("term").asc())
        .limit(_BM25_NQ)
        .select("term", "df")
    )
    stats = documents.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (
            F.sum(F.size(F.split("text", " "))).cast("double") / F.count(F.lit(1))
        ).alias("avgdl"),
    )
    dl = documents.select("doc_id", F.size(F.split("text", " ")).alias("dl"))
    idf = F.log((F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0)
    tfc = (F.col("tf") * (_BM25_K1 + 1.0)) / (
        F.col("tf") + _BM25_K1 * (1.0 - _BM25_B + _BM25_B * F.col("dl") / F.col("avgdl"))
    )
    per_term = (
        tf.join(F.broadcast(q), "term")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .select("doc_id", F.floor(_BM25_SCALE * idf * tfc).cast("bigint").alias("s"))
    )
    return (
        per_term.groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("n_terms_matched"), F.sum("s").alias("score_1e6"))
        .orderBy(F.col("score_1e6").desc(), F.col("doc_id").asc())
        .limit(10)
    )


# ---------------------------------------------------------------------------
# Train/test decontamination (8-gram overlap)
# ---------------------------------------------------------------------------

_DECON_N = 8  # 8-word shingles, the standard eval-decontamination unit


@register(
    "q101_decontamination",
    oracle=f"""
    WITH assigned AS (
        SELECT doc_id, lang, string_split(text, ' ') AS w,
               CASE WHEN {_duckdb_bucket('split')} < 80 THEN 'train'
                    WHEN {_duckdb_bucket('split')} < 90 THEN 'valid'
                    ELSE 'test' END AS split
        FROM documents
    ),
    grams AS (
        SELECT doc_id, lang, split,
               unnest(list_distinct(list_transform(range(1, len(w) - {_DECON_N - 2}),
                   i -> {duckdb_md5_60bit(
                       " || ' ' || ".join(f"w[i+{k}]" for k in range(_DECON_N))
                   )}))) AS g
        FROM assigned
    ),
    train_grams AS (
        SELECT DISTINCT g FROM grams WHERE split = 'train'
    ),
    test_docs AS (
        SELECT DISTINCT doc_id, lang FROM assigned WHERE split = 'test'
    ),
    contaminated AS (
        SELECT DISTINCT t.doc_id
        FROM grams t JOIN train_grams tr ON t.g = tr.g
        WHERE t.split = 'test'
    )
    SELECT d.lang,
           COUNT(*) AS n_test_docs,
           CAST(SUM(CASE WHEN c.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_contaminated
    FROM test_docs d LEFT JOIN contaminated c ON d.doc_id = c.doc_id
    GROUP BY d.lang
    """,
)
def q101_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Eval-set decontamination: flag test-split documents sharing any 8-word
    shingle with any train-split document (the overlap rule used to scrub
    benchmark contamination from pretraining corpora). Splits come from the
    same consistent hash as q66, so the check is reproducible end-to-end.

    Spark shape: shingles are hashed to 60-bit ints at explode time, so the
    overlap check is an equi-join on a bigint — the shuffle carries 8 bytes
    per gram, never the text. The train side collapses to DISTINCT hashes
    before the join (map-side partials), and the join is a LEFT SEMI: test
    grams short-circuit on first match. At 100 TB the train-gram table is
    the big side; the same plan holds with the semi-join replaced by a
    bloom-filter pre-pass if the gram table outgrows the shuffle budget.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    b = _bucket("split")
    words = documents.select(
        "doc_id",
        "lang",
        F.when(b < 80, "train").when(b < 90, "valid").otherwise("test").alias("split"),
        F.split("text", " ").alias("w"),
    )
    def _build_guarded():
        wcol = F.col("w")
        grams_arr = F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(wcol) - _DECON_N),
                lambda i: md5_60bit(F.array_join(F.slice(wcol, i + 1, _DECON_N), " ")),
            )
        )
        return F.when(F.size(wcol) >= _DECON_N, grams_arr).otherwise(
            F.array().cast("array<bigint>")
        )


    # constant gram-array chain: construction memoized (_util.cached_exprs)
    guarded = cached_exprs("q101_guarded_grams", _build_guarded)
    # explode in the SAME select that computes the gram array: aliasing the
    # array in one projection and exploding it in the next leaves the whole
    # transform inlined into Generate where it re-evaluates per OUTPUT row
    # (one evaluation per gram instead of per document — measured 23×
    # slower at sf0.1). The exploded table feeds both join sides, so it is
    # materialized once (8-byte hashes + keys only; at 100 TB: checkpoint
    # to reliable storage).
    grams = words.select(
        "doc_id", "lang", "split", F.explode(guarded).alias("g")
    ).localCheckpoint()
    train_grams = grams.filter(F.col("split") == "train").select("g").distinct()
    test_docs = words.filter(F.col("split") == "test").select("doc_id", "lang")
    contaminated = (
        grams.filter(F.col("split") == "test")
        .join(train_grams, "g", "left_semi")
        .select("doc_id", "lang")
        .distinct()
    )
    # Rollup without joining the contaminated set back onto the test
    # corpus: contaminated docs are a subset of test_docs, so the per-lang
    # counts aggregate independently and meet in a lang-cardinality
    # broadcast join instead of the previous corpus-sized left join (r14).
    base = test_docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n_test_docs"))
    cont = contaminated.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_contaminated_")
    )
    return base.join(F.broadcast(cont), "lang", "left").select(
        "lang",
        "n_test_docs",
        F.coalesce("n_contaminated_", F.lit(0)).alias("n_contaminated"),
    )


# ---------------------------------------------------------------------------
# Embedding-cosine near-duplicate removal
# ---------------------------------------------------------------------------

_EMB_TAU = 0.35


@register(
    "q102_embedding_neardup",
    oracle=f"""
    WITH {{ivf_ctes}},
    sided AS (
        SELECT e.vec_id, e.label, e.embedding, a.cluster_id AS cell,
               {duckdb_sq_norm('e.embedding')} AS sn
        FROM embeddings e JOIN assigned a ON a.vec_id = e.vec_id
    ),
    pairs AS (
        SELECT a.label, b.vec_id AS dup_id
        FROM sided a JOIN sided b
          ON a.label = b.label AND a.cell = b.cell AND a.vec_id < b.vec_id
        WHERE {duckdb_dot('a.embedding', 'b.embedding')} / (sqrt(a.sn) * sqrt(b.sn))
              >= {_EMB_TAU}
    ),
    removed AS (SELECT DISTINCT label, dup_id FROM pairs)
    SELECT e.label,
           COUNT(*) AS n_vectors,
           CAST(SUM(CASE WHEN r.dup_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_removed,
           CAST(SUM(CASE WHEN r.dup_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept
    FROM embeddings e
    LEFT JOIN removed r ON e.label = r.label AND e.vec_id = r.dup_id
    GROUP BY e.label
    """.format(ivf_ctes=ivf_assigned_sql_ctes()),
)
def q102_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate removal, IVF-cell blocked: within
    each (label, trained-IVF cell) block, drop every vector whose cosine to
    a lower-id vector in the same block is ≥ 0.35 (keep-first semantic
    dedup — the embedding-space analogue of q52's banded LSH).

    The round-2 version blocked on label alone: label blocks grow linearly
    with the corpus, so per-block pair count was quadratic at 100 TB — the
    last all-pairs shape in the registry. Now the block key is (label,
    cell) where cell is the trained-IVF assignment from q134's machinery
    (deterministic integer-quantized Lloyd, bit-identical on both engines),
    so blocks stay O(corpus/k) and the pair space scales linearly as k is
    raised with corpus size. Assignment is a NARROW literal-centroid
    expression (zero shuffles, similarity._km_assign_expr); near-dups in
    different cells are deliberately missed — the standard ANN-blocked
    dedup trade-off, measurable via q135's recall harness. Each side's
    squared norm is computed ONCE per vector before the join; the per-pair
    expression is dot ÷ (√sn_a·√sn_b) — identical arithmetic, factored, on
    both engines.
    """
    (embeddings,) = tables(spark, sf_dir, "embeddings")
    cell = _km_assign_expr(ivf_train_centroids(embeddings, cache_key=sf_dir))
    # float→double cast is exact, so casting ONCE per vector (not per pair
    # inside the dot lambda) changes no value and drops ~25% of per-pair
    # work at sf0.1
    emb_d = F.col("embedding").cast("array<double>")
    sided = embeddings.select(
        "vec_id",
        "label",
        cell.alias("cell"),
        emb_d.alias("e"),
        F.aggregate(emb_d, F.lit(0.0), lambda acc, x: acc + x * x).alias("sn"),
    )
    a = sided.select(
        "label",
        "cell",
        F.col("vec_id").alias("id_a"),
        F.col("e").alias("emb_a"),
        F.col("sn").alias("sn_a"),
    )
    bb = sided.select(
        F.col("label").alias("label_b"),
        F.col("cell").alias("cell_b"),
        F.col("vec_id").alias("dup_id"),
        F.col("e").alias("emb_b"),
        F.col("sn").alias("sn_b"),
    )
    pair_dot = F.aggregate(
        F.zip_with("emb_a", "emb_b", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
    )
    removed = (
        a.join(
            bb,
            (F.col("label") == F.col("label_b"))
            & (F.col("cell") == F.col("cell_b"))
            & (F.col("id_a") < F.col("dup_id")),
        )
        .filter(
            pair_dot / (F.sqrt("sn_a") * F.sqrt("sn_b")) >= _EMB_TAU
        )
        .select(F.col("label").alias("r_label"), "dup_id")
        .distinct()
    )
    # Rollup without joining the removed set back onto the corpus: every
    # vector is either kept or removed, so n_kept = n_vectors - n_removed
    # and the final join is label-cardinality-sized (broadcast) instead of
    # the previous corpus-wide SortMergeJoin on (label, vec_id) (r14).
    base = embeddings.groupBy("label").agg(F.count(F.lit(1)).alias("n_vectors"))
    rem = removed.groupBy("r_label").agg(F.count(F.lit(1)).alias("n_removed_"))
    return (
        base.join(F.broadcast(rem), base.label == rem.r_label, "left")
        .select(
            "label",
            "n_vectors",
            F.coalesce("n_removed_", F.lit(0)).alias("n_removed"),
            (F.col("n_vectors") - F.coalesce("n_removed_", F.lit(0))).alias(
                "n_kept"
            ),
        )
    )
