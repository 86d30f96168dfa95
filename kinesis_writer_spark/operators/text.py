"""Text-analysis operators for training-data pipelines: token statistics,
corpus-driven language ID, quality scoring, and document fingerprinting.

All pure built-in Spark expressions (split/explode/higher-order functions +
joins); the "model" inputs (language profiles, stopword lists) are derived
from the corpus itself inside the query, so everything is deterministic and
oracle-checkable. At 100 TB the derived profiles are tiny aggregates that
broadcast back over the corpus.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_md5_60bit, md5_60bit
from ..registry import register
from ._util import tables


@register(
    "q70_token_stats",
    oracle="""
    SELECT doc_id, lang,
           len(string_split(text, ' '))                       AS n_tokens,
           len(list_distinct(string_split(text, ' ')))        AS n_distinct,
           ROUND(len(list_distinct(string_split(text, ' ')))::DOUBLE
                 / len(string_split(text, ' ')), 4)           AS type_token_ratio,
           ROUND(list_sum(list_transform(string_split(text, ' '),
                 w -> CAST(length(w) AS DOUBLE)))
                 / len(string_split(text, ' ')), 4)           AS avg_token_len,
           length(text)                                       AS n_chars_actual
    FROM documents
    """,
)
def q70_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-document token statistics: counts, type/token ratio, mean length."""
    (documents,) = tables(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    tok_lens = F.transform(toks, lambda w: F.length(w).cast("double"))
    return documents.select(
        "doc_id",
        "lang",
        F.size(toks).alias("n_tokens"),
        F.size(F.array_distinct(toks)).alias("n_distinct"),
        F.round(F.size(F.array_distinct(toks)).cast("double") / F.size(toks), 4).alias(
            "type_token_ratio"
        ),
        F.round(
            F.aggregate(tok_lens, F.lit(0.0), lambda acc, x: acc + x) / F.size(toks), 4
        ).alias("avg_token_len"),
        F.length("text").alias("n_chars_actual"),
    )


@register(
    "q71_lang_profiles",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (
        SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token
    )
    SELECT lang, token, n, rank
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rank
        FROM freq
    )
    WHERE rank <= 5
    """,
)
def q71_lang_profiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 most frequent tokens per language (explode → agg → window)."""
    (documents,) = tables(spark, sf_dir, "documents")
    tok = documents.select("lang", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    return freq.withColumn("rank", F.row_number().over(w)).filter(F.col("rank") <= 5)


@register(
    "q72_lang_id",
    oracle="""
    WITH tok AS (
        SELECT lang, unnest(string_split(text, ' ')) AS token FROM documents
    ),
    freq AS (
        SELECT lang, token, COUNT(*) AS n FROM tok GROUP BY lang, token
    ),
    profile AS (
        SELECT lang AS profile_lang, list(token ORDER BY token) AS profile_tokens
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n DESC, token ASC) AS rank
            FROM freq
        )
        WHERE rank <= 10
        GROUP BY lang
    ),
    scored AS (
        SELECT d.doc_id, d.lang AS true_lang, p.profile_lang,
               len(list_intersect(list_distinct(string_split(d.text, ' ')),
                                  p.profile_tokens)) AS overlap
        FROM documents d CROSS JOIN profile p
    ),
    best AS (
        SELECT doc_id, true_lang, profile_lang AS predicted_lang
        FROM (
            SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                         ORDER BY overlap DESC, profile_lang ASC) AS rn
            FROM scored
        )
        WHERE rn = 1
    )
    SELECT true_lang, predicted_lang, COUNT(*) AS n_docs
    FROM best GROUP BY true_lang, predicted_lang
    """,
)
def q72_lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-driven language ID: build top-10-token profiles per language,
    classify each doc by maximum token overlap, emit the confusion matrix.

    The profile table is a tiny aggregate → broadcast; classification is a
    broadcast nested-loop over |langs| profiles per doc — linear in corpus
    size at 100 TB.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    tok = documents.select("lang", F.explode(F.split("text", " ")).alias("token"))
    freq = tok.groupBy("lang", "token").agg(F.count(F.lit(1)).alias("n"))
    w = Window.partitionBy("lang").orderBy(F.col("n").desc(), F.col("token").asc())
    profile = (
        freq.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 10)
        .groupBy(F.col("lang").alias("profile_lang"))
        .agg(F.sort_array(F.collect_list("token")).alias("profile_tokens"))
    )
    scored = documents.crossJoin(F.broadcast(profile)).select(
        "doc_id",
        F.col("lang").alias("true_lang"),
        "profile_lang",
        F.size(
            F.array_intersect(F.array_distinct(F.split("text", " ")), F.col("profile_tokens"))
        ).alias("overlap"),
    )
    w_best = Window.partitionBy("doc_id").orderBy(F.col("overlap").desc(), F.col("profile_lang").asc())
    best = (
        scored.withColumn("rn", F.row_number().over(w_best))
        .filter(F.col("rn") == 1)
        .select("doc_id", "true_lang", F.col("profile_lang").alias("predicted_lang"))
    )
    return best.groupBy("true_lang", "predicted_lang").agg(F.count(F.lit(1)).alias("n_docs"))


@register(
    "q73_quality_score",
    oracle="""
    WITH stats AS (
        SELECT doc_id, lang,
               len(string_split(text, ' ')) AS n_tokens,
               len(list_distinct(string_split(text, ' ')))::DOUBLE
                 / len(string_split(text, ' ')) AS ttr,
               CASE WHEN length(text) = 0 THEN 0.0
                    ELSE length(replace(text, ' ', ''))::DOUBLE / length(text) END AS density
        FROM documents
    ),
    scored AS (
        SELECT doc_id, lang,
               ROUND(0.4 * LEAST(n_tokens / 50.0, 1.0) + 0.4 * ttr + 0.2 * density, 4) AS quality
        FROM stats
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           ROUND(AVG(quality), 4) AS avg_quality,
           CAST(SUM(CASE WHEN quality >= 0.6 THEN 1 ELSE 0 END) AS BIGINT) AS n_high_quality
    FROM scored GROUP BY lang
    """,
)
def q73_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Document quality scoring: length saturation + type/token ratio +
    non-space density, aggregated per language.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    ttr = F.size(F.array_distinct(toks)).cast("double") / F.size(toks)
    density = F.when(F.length("text") == 0, F.lit(0.0)).otherwise(
        F.length(F.regexp_replace(F.col("text"), " ", "")).cast("double") / F.length("text")
    )
    quality = F.round(
        0.4 * F.least(F.size(toks) / F.lit(50.0), F.lit(1.0)) + 0.4 * ttr + 0.2 * density, 4
    )
    scored = documents.select("doc_id", "lang", quality.alias("quality"))
    return scored.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.round(F.avg("quality"), 4).alias("avg_quality"),
        F.sum(F.when(F.col("quality") >= 0.6, 1).otherwise(0)).alias("n_high_quality"),
    )


@register(
    "q77_pii_redact",
    oracle="""
    WITH joined AS (
        SELECT d.doc_id,
               d.text || ' uid ' || CAST(e.user_id AS VARCHAR)
                      || ' mail u' || CAST(e.user_id AS VARCHAR) || '@host' AS text
        FROM documents d JOIN events e ON d.doc_id = e.event_id
    )
    SELECT doc_id,
           len(regexp_extract_all(text, '[0-9]+'))                    AS n_numbers,
           len(regexp_extract_all(text, '[A-Za-z0-9]+@[A-Za-z0-9]+')) AS n_emails,
           length(regexp_replace(regexp_replace(text,
                  '[A-Za-z0-9]+@[A-Za-z0-9]+', '<EMAIL>', 'g'),
                  '[0-9]+', '<NUM>', 'g'))                            AS redacted_len
    FROM joined
    WHERE len(regexp_extract_all(text, '[0-9]+')) > 0
       OR len(regexp_extract_all(text, '[A-Za-z0-9]+@[A-Za-z0-9]+')) > 0
    """,
)
def q77_pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII-style scrubbing: count and redact number runs and email-shaped
    tokens (the shape of every pre-training scrub pass). The corpus is
    word-soup with no PII, so the query first splices event-derived ids and
    email-shaped tokens into the text (deterministically), then scrubs them
    back out. Pure ``regexp_extract_all``/``regexp_replace`` — JVM-evaluated
    per row, so scrubbing 100 TB is a single streaming pass at scan
    parallelism; the splice join exists only to make the redaction
    observable on synthetic data.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    (events,) = tables(spark, sf_dir, "events")
    joined = documents.join(events, F.col("doc_id") == F.col("event_id")).select(
        "doc_id",
        F.concat(
            F.col("text"),
            F.lit(" uid "),
            F.col("user_id").cast("string"),
            F.lit(" mail u"),
            F.col("user_id").cast("string"),
            F.lit("@host"),
        ).alias("text"),
    )
    num_pat, email_pat = "[0-9]+", "[A-Za-z0-9]+@[A-Za-z0-9]+"
    n_numbers = F.size(F.expr(f"regexp_extract_all(text, '{num_pat}', 0)"))
    n_emails = F.size(F.expr(f"regexp_extract_all(text, '{email_pat}', 0)"))
    redacted = F.regexp_replace(
        F.regexp_replace(F.col("text"), email_pat, "<EMAIL>"), num_pat, "<NUM>"
    )
    return (
        joined.select(
            "doc_id",
            n_numbers.alias("n_numbers"),
            n_emails.alias("n_emails"),
            F.length(redacted).alias("redacted_len"),
        )
        .filter((F.col("n_numbers") > 0) | (F.col("n_emails") > 0))
    )


@register(
    "q78_repetition_ngrams",
    oracle="""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    bigrams AS (
        SELECT doc_id, unnest(list_transform(range(1, len(w)),
                              i -> w[i] || ' ' || w[i+1])) AS bg
        FROM d
    ),
    counts AS (
        SELECT doc_id, bg, COUNT(*) AS n FROM bigrams GROUP BY doc_id, bg
    )
    SELECT doc_id,
           CAST(SUM(n) AS BIGINT) AS n_bigrams,
           MAX(n) AS top_bigram_count,
           ROUND(MAX(n)::DOUBLE / SUM(n), 4) AS top_bigram_ratio
    FROM counts
    GROUP BY doc_id
    HAVING MAX(n) > 1
    """,
)
def q78_repetition_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Repetition detection (Gopher-style quality rule): fraction of all
    bigrams taken by the single most-repeated bigram; docs with any repeated
    bigram are surfaced. explode → two-level groupBy, both with map-side
    partials; bigrams of a doc stay in the doc's partition so the first
    aggregation is shuffle-local at scale when the scan is doc-partitioned.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    w = F.split("text", " ")
    # zip_with over shifted slices, not element_at-in-transform (see q79)
    bigrams = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.concat_ws(" ", a, b),
    )
    exploded = documents.select("doc_id", F.explode(bigrams).alias("bg"))
    counts = exploded.groupBy("doc_id", "bg").agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.groupBy("doc_id")
        .agg(
            F.sum("n").alias("n_bigrams"),
            F.max("n").alias("top_bigram_count"),
            F.round(F.max("n").cast("double") / F.sum("n"), 4).alias("top_bigram_ratio"),
        )
        .filter(F.col("top_bigram_count") > 1)
    )


@register(
    "q74_fingerprint",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, string_split(text, ' ') AS w FROM documents
    ),
    sh AS (
        SELECT doc_id,
               list_distinct(list_transform(range(1, len(w) - 2),
                   i -> w[i] || ' ' || w[i+1] || ' ' || w[i+2] || ' ' || w[i+3])) AS shingles
        FROM d
    ),
    hashed AS (
        SELECT doc_id,
               list_sort(list_transform(shingles, s -> {duckdb_md5_60bit('s')}))[1:3] AS fp
        FROM sh
    )
    SELECT doc_id, fp[1] AS fp1, fp[2] AS fp2, fp[3] AS fp3
    FROM hashed
    """,
)
def q74_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowing-style document fingerprint: the 3 smallest hashes over the
    document's 4-word shingles (rolling-hash sketch; docs sharing any
    fingerprint are near-dup candidates).
    """
    (documents,) = tables(spark, sf_dir, "documents")
    # words bound to a projected column: slice(raw-split-expr) inside the
    # transform lambda would inline one split() per shingle (the q132
    # anti-pattern); the multi-referenced column splits once per row
    docs_w = documents.select("doc_id", F.split("text", " ").alias("w"))
    w = F.col("w")
    shingles = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 4),
            lambda i: F.array_join(F.slice(w, i + 1, 4), " "),
        )
    )
    fp = F.slice(F.sort_array(F.transform(shingles, lambda s: md5_60bit(s))), 1, 3)
    # fp bound to a column too: three element_at(fp-expr) projections would
    # re-run the whole shingle+hash+sort chain three times per row
    docs_fp = docs_w.select("doc_id", fp.alias("fp"))
    return docs_fp.select(
        "doc_id",
        F.element_at("fp", 1).alias("fp1"),
        F.element_at("fp", 2).alias("fp2"),
        F.element_at("fp", 3).alias("fp3"),
    )


@register(
    "q79_bigram_lm_score",
    oracle="""
    WITH d AS (SELECT doc_id, lang, string_split(text, ' ') AS w FROM documents),
    flat AS (
        SELECT doc_id, lang,
               unnest(list_transform(range(1, len(w)),
                   i -> struct_pack(w1 := w[i], b := w[i] || ' ' || w[i+1]))) AS s
        FROM d
    ),
    f2 AS (SELECT doc_id, lang, s.w1 AS w1, s.b AS b FROM flat),
    bgc AS (SELECT lang, b, COUNT(*) AS cb FROM f2 GROUP BY lang, b),
    unic AS (SELECT lang, w1, COUNT(*) AS cu FROM f2 GROUP BY lang, w1),
    scored AS (
        SELECT f.doc_id, f.lang, COUNT(*) AS n_bigrams,
               ROUND(AVG(LOG10(bgc.cb::DOUBLE / unic.cu)), 4) AS avg_logprob
        FROM f2 f
        JOIN bgc ON f.lang = bgc.lang AND f.b = bgc.b
        JOIN unic ON f.lang = unic.lang AND f.w1 = unic.w1
        GROUP BY f.doc_id, f.lang
    )
    SELECT doc_id, lang, n_bigrams, avg_logprob FROM scored
    """,
)
def q79_bigram_lm_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KenLM-style corpus quality scoring without an external model: train a
    per-language bigram LM on the corpus itself (conditional probability
    c(w1 w2)/c(w1·) from two aggregates), then score each document by its
    mean log10 bigram probability — the classic perplexity filter for
    pretraining data, made deterministic and oracle-checkable because the
    "model" is a pure function of the same table.

    Shape at 100 TB: the counts are window aggregates over (lang, bigram)
    and (lang, word) — vocabulary-sized, naturally well-distributed keys —
    computed over ONE exploded lineage that pipelines through the three
    shuffles. The equivalent two-aggregate + two-join formulation re-runs
    the explode for every count table (measured 1.9× slower at sf0.1).
    Nothing touches the driver. A real deployment swaps the self-trained
    counts for a broadcast KenLM table; the plan shape is identical.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    w = F.split("text", " ")
    # pairs via zip_with over two shifted slices: indexing the array with
    # element_at(w, i+k) inside a transform lambda re-evaluates the split
    # per lookup — the slice/zip_with form is one linear pass (measured 8×
    # faster at sf0.1)
    pairs = F.zip_with(
        F.slice(w, 1, F.size(w) - 1),
        F.slice(w, 2, F.size(w) - 1),
        lambda a, b: F.struct(a.alias("w1"), F.concat_ws(" ", a, b).alias("b")),
    )
    flat = (
        documents.select("doc_id", "lang", F.explode(pairs).alias("s"))
        .select("doc_id", "lang", "s.w1", "s.b")
    )
    cb = F.count(F.lit(1)).over(Window.partitionBy("lang", "b"))
    cu = F.count(F.lit(1)).over(Window.partitionBy("lang", "w1"))
    return (
        flat.withColumn("lp", F.log10(cb.cast("double") / cu))
        .groupBy("doc_id", "lang")
        .agg(
            F.count(F.lit(1)).alias("n_bigrams"),
            F.round(F.avg("lp"), 4).alias("avg_logprob"),
        )
    )


# BPE-ish pre-tokenizer: letter runs, single digits, punctuation runs —
# the GPT-2-style split shape, restricted to RE2-safe syntax so the DuckDB
# oracle compiles the IDENTICAL pattern.
_BPE_PATTERN = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]+"


@register(
    "q114_regex_tokens",
    oracle=f"""
    WITH tok AS (
        SELECT doc_id, lang,
               regexp_extract_all(text, '{_BPE_PATTERN}') AS pieces,
               len(string_split(text, ' ')) AS n_ws_tokens
        FROM documents
    )
    SELECT doc_id, lang,
           len(pieces) AS n_pieces,
           len(list_filter(pieces, p -> regexp_matches(p, '^[A-Za-z]+$')))
               AS n_word_pieces,
           n_ws_tokens,
           ROUND(len(pieces)::DOUBLE / n_ws_tokens, 4) AS pieces_per_word
    FROM tok
    """,
)
def q114_regex_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish regex token counting: split each document with a GPT-2-style
    pre-tokenizer pattern (letter runs / single digits / punctuation runs)
    and report piece counts against the whitespace token count — the
    tokens-per-word fertility estimate used to budget training data.

    `regexp_extract_all` is JVM-evaluated per row (one linear regex pass,
    no explode needed for the counts), so tokenizing 100 TB is a narrow
    map-side projection at scan parallelism.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    pieces = F.expr(f"regexp_extract_all(text, '{_BPE_PATTERN}', 0)")
    word_re = "^[A-Za-z]+$"
    return documents.select(
        "doc_id",
        "lang",
        F.size(pieces).alias("n_pieces"),
        F.size(F.filter(pieces, lambda p: p.rlike(word_re))).alias("n_word_pieces"),
        F.size(F.split("text", " ")).alias("n_ws_tokens"),
        F.round(
            F.size(pieces).cast("double") / F.size(F.split("text", " ")), 4
        ).alias("pieces_per_word"),
    )
