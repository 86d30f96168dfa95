"""Tokenizer-training operators: BPE merge induction and fertility
measurement over the documents corpus.

Training a subword tokenizer is a standard step of a large-scale
training-data pipeline (the reference engine's domain stops at transport —
kinesis-writer KinesisWriter.scala ships records; what those records feed is
exactly this kind of corpus preparation). Both queries are expressed as
plain DataFrame computations:

- merge-pair counting is one ``groupBy`` with map-side partials per round
  (the corpus-sized pass), over a vocabulary bounded to the top ``_BPE_V``
  word types, so each round's shuffle carries at most ``V × max_word_len``
  tiny rows regardless of corpus size;
- applying a learned merge to a symbol sequence is a per-row
  ``F.aggregate`` fold (greedy left-to-right non-overlapping, the BPE
  contract) — narrow, no shuffle, whole-stage-codegen eligible;
- the argmax merge of each round is a 1-row ``orderBy().limit(1)``
  (TakeOrderedAndProject) broadcast back over the vocabulary — never a
  driver-side loop over collected data.

At 100 TB the word-count pass is the only corpus-sized stage; everything
after it operates on the V-row vocabulary table, so 3 rounds or 30 000
rounds of merges cost shuffles over V rows only. The DuckDB oracles
reproduce the fold with a positional recursive CTE; the two formulations
are provably equivalent because a merged symbol ``l||r`` can never equal
``l`` (r is non-empty), so the fold never chains a fresh merge as the left
operand of the next one — both are the same greedy scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from ..registry import register
from ._util import tables

_BPE_V = 256  # vocabulary bound: top-V word types by (count DESC, word ASC)
_BPE_ROUNDS = 3  # learned merge rounds


def _apply_merge(syms: Column | str, l_sym: Column, r_sym: Column, merged: Column) -> Column:
    """Greedy left-to-right non-overlapping application of one BPE merge to
    a symbol array: a pure fold, no shuffle, no UDF."""
    return F.aggregate(
        syms,
        F.array().cast("array<string>"),
        lambda acc, x: F.when(
            (F.size(acc) > 0) & (F.element_at(acc, -1) == l_sym) & (x == r_sym),
            F.concat(F.slice(acc, 1, F.size(acc) - 1), F.array(merged)),
        ).otherwise(F.concat(acc, F.array(x))),
    )


def _word_counts(documents: DataFrame, min_len: int) -> DataFrame:
    return (
        documents.select(F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= min_len)
        .groupBy("word")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )


def _pair_counts(seqs: DataFrame) -> DataFrame:
    """Adjacent-pair counts weighted by word frequency: one shuffle of at
    most V × max_word_len rows with map-side combine."""
    pairs = seqs.select(
        "cnt",
        F.explode(
            F.when(
                F.size("syms") >= 2,
                F.zip_with(
                    F.slice("syms", 1, F.size("syms") - 1),
                    F.slice("syms", 2, F.size("syms") - 1),
                    lambda a, b: F.struct(a.alias("l"), b.alias("r")),
                ),
            ).otherwise(F.array().cast("array<struct<l:string,r:string>>"))
        ).alias("p"),
    )
    return pairs.groupBy(F.col("p.l").alias("l_sym"), F.col("p.r").alias("r_sym")).agg(
        F.sum("cnt").alias("pair_count")
    )


def _learn_merges(
    documents: DataFrame, rounds: int = _BPE_ROUNDS
) -> list[DataFrame]:
    """Run ``rounds`` of BPE training over the top-``_BPE_V`` vocabulary;
    returns one 1-row DataFrame (l_sym, r_sym, pair_count) per round.

    Each round's vocabulary state is ``localCheckpoint``ed — the same
    iterative-lineage rule as connected components (dedup.py): without
    physical truncation the fold-on-fold plan doubles per round. The state
    is V rows of short string arrays; on a cluster use ``checkpoint()``.
    """
    top = _word_counts(documents, min_len=2).orderBy(F.desc("cnt"), "word").limit(_BPE_V)
    seqs = top.select("word", "cnt", F.split("word", "").alias("syms")).localCheckpoint()
    bests: list[DataFrame] = []
    for rnd in range(1, rounds + 1):
        best = (
            _pair_counts(seqs)
            .orderBy(F.desc("pair_count"), "l_sym", "r_sym")
            .limit(1)
            .localCheckpoint()
        )
        bests.append(best)
        if rnd < rounds:
            seqs = (
                seqs.crossJoin(F.broadcast(best))
                .select(
                    "word",
                    "cnt",
                    _apply_merge(
                        "syms",
                        F.col("l_sym"),
                        F.col("r_sym"),
                        F.concat("l_sym", "r_sym"),
                    ).alias("syms"),
                )
                .localCheckpoint()
            )
    return bests


def _bpe_oracle_ctes(rounds: int = _BPE_ROUNDS) -> str:
    """DuckDB CTE chain (to splice after ``WITH RECURSIVE``): replays the
    training — CTEs ``b1..bR`` are the chosen merges, ``s0..s{R-1}`` the
    vocabulary states. The fold is a positional recursive scan, equivalent
    to the Spark accumulator fold (see module docstring)."""
    parts = [
        f"""wc AS (
        SELECT w AS word, COUNT(*)::BIGINT AS cnt
        FROM (SELECT unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 2 GROUP BY w
    ),
    top AS (SELECT word, cnt FROM wc ORDER BY cnt DESC, word LIMIT {_BPE_V}),
    s0 AS (SELECT word, cnt, string_split(word, '') AS syms FROM top)"""
    ]
    for r in range(1, rounds + 1):
        prev = f"s{r - 1}"
        parts.append(
            f"""i{r} AS (
        SELECT word, cnt, syms, unnest(range(1, len(syms))) AS i FROM {prev}
    ),
    p{r} AS (
        SELECT syms[i] AS l_sym, syms[i+1] AS r_sym, SUM(cnt)::BIGINT AS pair_count
        FROM i{r} GROUP BY 1, 2
    ),
    b{r} AS (
        SELECT l_sym, r_sym, l_sym || r_sym AS merged, pair_count
        FROM p{r} ORDER BY pair_count DESC, l_sym, r_sym LIMIT 1
    )"""
        )
        if r < rounds:
            parts.append(
                f"""f{r} AS (
        SELECT word, cnt, syms, 1 AS pos, []::VARCHAR[] AS acc FROM {prev}
        UNION ALL
        SELECT f.word, f.cnt, f.syms,
          CASE WHEN f.pos < len(f.syms) AND f.syms[f.pos] = b.l_sym
                    AND f.syms[f.pos+1] = b.r_sym
               THEN f.pos + 2 ELSE f.pos + 1 END,
          CASE WHEN f.pos < len(f.syms) AND f.syms[f.pos] = b.l_sym
                    AND f.syms[f.pos+1] = b.r_sym
               THEN list_append(f.acc, b.merged)
               ELSE list_append(f.acc, f.syms[f.pos]) END
        FROM f{r} f, b{r} b WHERE f.pos <= len(f.syms)
    ),
    s{r} AS (SELECT word, cnt, acc AS syms FROM f{r} WHERE pos > len(syms))"""
            )
    return ",\n    ".join(parts)


@register(
    "q251_bpe_merges",
    oracle="WITH RECURSIVE "
    + _bpe_oracle_ctes()
    + "\n    "
    + "\n    UNION ALL ".join(
        f"SELECT CAST({r} AS INTEGER) AS merge_rank, l_sym, r_sym, merged, pair_count FROM b{r}"
        for r in range(1, _BPE_ROUNDS + 1)
    ),
)
def q251_bpe_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer training: the first ``_BPE_ROUNDS`` merge rules learned
    from the corpus — per round, the highest-frequency adjacent symbol pair
    (weighted by word occurrence count, ties broken lexicographically),
    with the merge applied to the vocabulary before the next count.

    Scale shape: one corpus-sized word count, then every round is a
    vocabulary-sized (≤ ``_BPE_V`` rows) pair count + 1-row TakeOrdered +
    broadcast fold — merge learning is O(corpus) once, O(V) per round.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    bests = _learn_merges(documents)
    out = None
    for rnd, best in enumerate(bests, start=1):
        row = best.select(
            F.lit(rnd).cast("int").alias("merge_rank"),
            "l_sym",
            "r_sym",
            F.concat("l_sym", "r_sym").alias("merged"),
            "pair_count",
        )
        out = row if out is None else out.unionByName(row)
    return out


@register(
    "q252_bpe_fertility",
    oracle="WITH RECURSIVE "
    + _bpe_oracle_ctes()
    + f""",
    vocab AS (
        SELECT w AS word, lang, COUNT(*)::BIGINT AS cnt
        FROM (SELECT lang, unnest(string_split(text, ' ')) AS w FROM documents)
        WHERE len(w) >= 1 GROUP BY w, lang
    ),
    dvoc AS (SELECT word, string_split(word, '') AS syms FROM (SELECT DISTINCT word FROM vocab)),
    g1 AS (
        SELECT word, syms, 1 AS pos, []::VARCHAR[] AS acc FROM dvoc
        UNION ALL
        SELECT f.word, f.syms,
          CASE WHEN f.pos < len(f.syms) AND f.syms[f.pos] = b.l_sym
                    AND f.syms[f.pos+1] = b.r_sym
               THEN f.pos + 2 ELSE f.pos + 1 END,
          CASE WHEN f.pos < len(f.syms) AND f.syms[f.pos] = b.l_sym
                    AND f.syms[f.pos+1] = b.r_sym
               THEN list_append(f.acc, b.merged)
               ELSE list_append(f.acc, f.syms[f.pos]) END
        FROM g1 f, b1 b WHERE f.pos <= len(f.syms)
    ),
    d1 AS (SELECT word, acc AS syms FROM g1 WHERE pos > len(syms)),
    g2 AS (
        SELECT word, syms, 1 AS pos, []::VARCHAR[] AS acc FROM d1
        UNION ALL
        SELECT f.word, f.syms,
          CASE WHEN f.pos < len(f.syms) AND f.syms[f.pos] = b.l_sym
                    AND f.syms[f.pos+1] = b.r_sym
               THEN f.pos + 2 ELSE f.pos + 1 END,
          CASE WHEN f.pos < len(f.syms) AND f.syms[f.pos] = b.l_sym
                    AND f.syms[f.pos+1] = b.r_sym
               THEN list_append(f.acc, b.merged)
               ELSE list_append(f.acc, f.syms[f.pos]) END
        FROM g2 f, b2 b WHERE f.pos <= len(f.syms)
    ),
    d2 AS (SELECT word, acc AS syms FROM g2 WHERE pos > len(syms)),
    g3 AS (
        SELECT word, syms, 1 AS pos, []::VARCHAR[] AS acc FROM d2
        UNION ALL
        SELECT f.word, f.syms,
          CASE WHEN f.pos < len(f.syms) AND f.syms[f.pos] = b.l_sym
                    AND f.syms[f.pos+1] = b.r_sym
               THEN f.pos + 2 ELSE f.pos + 1 END,
          CASE WHEN f.pos < len(f.syms) AND f.syms[f.pos] = b.l_sym
                    AND f.syms[f.pos+1] = b.r_sym
               THEN list_append(f.acc, b.merged)
               ELSE list_append(f.acc, f.syms[f.pos]) END
        FROM g3 f, b3 b WHERE f.pos <= len(f.syms)
    ),
    d3 AS (SELECT word, len(syms) AS chars_before, len(acc) AS syms_after
           FROM g3 WHERE pos > len(syms))
    SELECT v.lang,
           CAST(SUM(v.cnt) AS BIGINT)                    AS n_word_tokens,
           CAST(SUM(v.cnt * len(v.word)) AS BIGINT)      AS n_chars,
           CAST(SUM(v.cnt * d.syms_after) AS BIGINT)     AS n_bpe_tokens,
           CAST(SUM(v.cnt * (len(v.word) - d.syms_after)) * 1000000
                // SUM(v.cnt * len(v.word)) AS BIGINT)   AS saved_ppm
    FROM vocab v JOIN d3 d ON v.word = d.word
    GROUP BY v.lang
    """,
)
def q252_bpe_fertility(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility: apply the ``_BPE_ROUNDS`` learned merges (rank
    order, the BPE contract) to every word type, then report per language
    how many symbols the corpus compresses to — chars before, BPE tokens
    after, savings in exact-integer ppm.

    Scale shape: merges are learned on the bounded vocabulary (q251), then
    applied via three chained narrow folds over the DISTINCT word-type
    table (vocabulary-sized, not corpus-sized); per-(word, lang) occurrence
    counts join back in one broadcast-sized join. The corpus is scanned
    once for the counts — fertility of a 100 TB corpus costs one token
    count plus vocabulary-local work.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    vocab = (
        documents.select("lang", F.explode(F.split("text", " ")).alias("word"))
        .filter(F.length("word") >= 1)
        .groupBy("word", "lang")
        .agg(F.count(F.lit(1)).cast("bigint").alias("cnt"))
    )
    dvoc = vocab.select("word").distinct().select("word", F.split("word", "").alias("syms"))
    for best in _learn_merges(documents):
        dvoc = dvoc.crossJoin(F.broadcast(best)).select(
            "word",
            _apply_merge(
                "syms", F.col("l_sym"), F.col("r_sym"), F.concat("l_sym", "r_sym")
            ).alias("syms"),
        )
    folded = dvoc.select("word", F.size("syms").alias("syms_after"))
    # vocab ⋈ folded is word-type × word-type: BOTH sides are distinct-word
    # sized (corpus-scale at 100 TB), so this is a plain shuffle join on
    # `word` — broadcast is reserved for the 1-row merge tables above.
    joined = vocab.join(folded, "word").select(
        "lang",
        "cnt",
        (F.col("cnt") * F.length("word")).alias("chars"),
        (F.col("cnt") * F.col("syms_after")).alias("bpe"),
    )
    agg = joined.groupBy("lang").agg(
        F.sum("cnt").cast("bigint").alias("n_word_tokens"),
        F.sum("chars").cast("bigint").alias("n_chars"),
        F.sum("bpe").cast("bigint").alias("n_bpe_tokens"),
    )
    # integer DIV, not float division: both engines floor the same way on
    # non-negative integers, so the ppm metric hash-matches bit-for-bit
    return agg.select(
        "lang",
        "n_word_tokens",
        "n_chars",
        "n_bpe_tokens",
        F.expr("CAST((n_chars - n_bpe_tokens) * 1000000 DIV n_chars AS BIGINT)").alias(
            "saved_ppm"
        ),
    )
