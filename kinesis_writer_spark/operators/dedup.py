"""Deduplication operators for training-data pipelines: exact (content-hash),
MinHash+LSH near-dup, SimHash, and n-gram Jaccard.

Every approximate pipeline uses the cross-engine MD5-60bit hash
(:mod:`kinesis_writer_spark.functions.hashing`) so the DuckDB oracle runs the
*identical* pipeline — the correctness gate is bit-exact, independent of the
approximation's recall.

Scale notes (100 TB): exact dedup is one hash-shuffle on a 16-byte digest;
MinHash banding turns the O(n²) pair space into per-bucket joins (shuffle on
band key); SimHash pairing uses 15-bit pigeonhole chunks (hamming ≤ 3 ⟹ some
chunk equal) — both avoid any cross join. Signature computation is embarrass-
ingly parallel. The one sanctioned driver collect is the SIZE-GATED
connected-components fast path (:data:`CC_DRIVER_MAX_EDGES`): the duplicate
graph is dup-density-sized, and below the gate an in-driver union-find beats
five rounds of distributed shuffle jobs by ~20x; above it the distributed
min-label propagation runs unchanged.
"""

from __future__ import annotations

import threading

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..functions.hashing import duckdb_md5_60bit, md5_60bit
from ..registry import register
from ._util import (
    cached_exprs,
    checkpoint_clean,
    checkpoint_partitioned,
    release_checkpoint,
    spread_small_input,
    tables,
)

# ---------------------------------------------------------------------------
# exact dedup
# ---------------------------------------------------------------------------


def _doubled_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents ∪ shifted copy of itself — a corpus with known duplicates."""
    (documents,) = tables(spark, sf_dir, "documents")
    copy = documents.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    return documents.unionByName(copy)


_DOUBLED_SQL = """
        SELECT doc_id, text, lang, source, n_chars FROM documents
        UNION ALL
        SELECT doc_id + 1000000, text, lang, source, n_chars FROM documents
"""


@register(
    "q50_exact_dedup",
    oracle=f"""
    WITH corpus AS ({_DOUBLED_SQL}),
    hashed AS (
        SELECT doc_id, lang, md5(text) AS content_hash FROM corpus
    )
    SELECT lang, COUNT(*) AS n_kept, CAST(SUM(n_dups - 1) AS BIGINT) AS n_removed
    FROM (
        SELECT lang, content_hash, MIN(doc_id) AS kept_doc, COUNT(*) AS n_dups
        FROM hashed GROUP BY lang, content_hash
    )
    GROUP BY lang
    """,
)
def q50_exact_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup by content hash (keep min doc_id), on a corpus doubled so
    every document has exactly one duplicate. One shuffle on the digest.
    """
    corpus = _doubled_docs(spark, sf_dir)
    hashed = corpus.select("doc_id", "lang", F.md5(F.col("text").cast("binary")).alias("content_hash"))
    groups = hashed.groupBy("lang", "content_hash").agg(
        F.min("doc_id").alias("kept_doc"), F.count(F.lit(1)).alias("n_dups")
    )
    return groups.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum(F.col("n_dups") - 1).alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# MinHash
# ---------------------------------------------------------------------------

_N_HASHES = 16
_N_BANDS = 2  # 2 bands x 8 rows: selective candidates for ~0.9 thresholds

_WORDS_SPARK = lambda: F.array_distinct(F.split("text", " "))  # noqa: E731
_WORDS_SQL = "list_distinct(string_split(text, ' '))"

# One MD5 per word, then 16 affine permutations (a_j*h + b_j) mod p over the
# 32-bit down-projection — the classic universal-hash MinHash family. 16×
# cheaper than 16 independent cryptographic hashes per word, and the affine
# step stays in whole-stage codegen as plain integer arithmetic. Constants
# are fixed literals so the DuckDB oracle computes the identical family.
# a_j < 2^31 and h' < 2^32 keep a_j*h' + b_j < 2^63 (no overflow on either
# engine); p is the smallest prime above 2^32.
_MINHASH_P = 4294967311
_MINHASH_MASK = 0xFFFFFFFF
_MINHASH_A = [((j + 1) * 0x9E3779B1) % (2**31) | 1 for j in range(_N_HASHES)]
_MINHASH_B = [(j * 0x85EBCA77 + 0x165667B1) % (2**31) for j in range(_N_HASHES)]


def _word_hashes_spark(words="words"):
    # str input -> constant expression, memoized (construction is py4j-
    # bound; see _util.cached_exprs). Column input builds fresh.
    if isinstance(words, str):
        return cached_exprs(
            ("word_hashes", words), lambda: _word_hashes_spark(F.col(words))
        )
    return F.transform(words, lambda w: md5_60bit(w).bitwiseAND(F.lit(_MINHASH_MASK)))


_WORD_HASHES_SQL = (
    f"list_transform(words, w -> {duckdb_md5_60bit('w')} & {_MINHASH_MASK})"
)


def _minhash_sig_spark(hashes="hashes") -> list:
    # str input -> constant expression list, memoized (16 permutations x
    # a lambda each is ~1 s of py4j construction; see _util.cached_exprs)
    if isinstance(hashes, str):
        return cached_exprs(
            ("minhash_sig", hashes), lambda: _minhash_sig_spark(F.col(hashes))
        )
    return [
        F.array_min(
            F.transform(hashes, lambda h: (F.lit(a) * h + F.lit(b)) % F.lit(_MINHASH_P))
        )
        for a, b in zip(_MINHASH_A, _MINHASH_B)
    ]


def _minhash_sig_sql() -> list[str]:
    return [
        f"list_min(list_transform(hashes, h -> ({a} * h + {b}) % {_MINHASH_P}))"
        for a, b in zip(_MINHASH_A, _MINHASH_B)
    ]


@register(
    "q51_minhash_signatures",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
    hs AS (SELECT doc_id, {_WORD_HASHES_SQL} AS hashes FROM w),
    sigs AS (SELECT doc_id, [{", ".join(_minhash_sig_sql())}] AS sig FROM hs)
    SELECT doc_id, array_to_string(sig, ',') AS signature
    FROM sigs
    """,
)
def q51_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """16-permutation MinHash signature over each document's word set
    (one MD5 per word + affine universal-hash permutations).

    The signature is emitted as a comma-joined STRING (not array<bigint>):
    same information, but hashable by any row-canonicalizing comparator —
    array cells are unhashable in pandas-based comparators.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    words = documents.select("doc_id", _WORDS_SPARK().alias("words"))
    hs = words.select("doc_id", _word_hashes_spark("words").alias("hashes"))
    return hs.select(
        "doc_id",
        F.concat_ws(",", *[s.cast("string") for s in _minhash_sig_spark("hashes")]).alias(
            "signature"
        ),
    )


def _check_banding(n_bands: int, rows_per_band: int | None) -> int:
    """Resolve/validate a (bands, rows_per_band) pair against the 16-perm
    signature; returns rows_per_band (default: use every permutation)."""
    if n_bands < 1:
        raise ValueError(f"banding needs >= 1 band, got {n_bands}")
    rows = _N_HASHES // n_bands if rows_per_band is None else rows_per_band
    if rows < 1 or n_bands * rows > _N_HASHES:
        raise ValueError(
            f"banding {n_bands}x{rows} needs 1 <= bands*rows <= {_N_HASHES} "
            f"signature permutations"
        )
    return rows


def _band_exprs_spark(n_bands: int = _N_BANDS, rows_per_band: int | None = None):
    """Band key = hash of the concatenated signature slice.

    ``(n_bands, rows_per_band)`` selects the LSH S-curve threshold
    ``(1/b)^(1/r)`` — the registered default stays 2x8 (threshold 0.917,
    the q51/q52/q61 operating point); the measured recovery point is 3x5
    (threshold 0.803: recall 95.6 -> 99.5%% at 3.3x verify cost —
    artifacts/lsh_band_probe.json, floor-tested in
    tests/test_ann_recall_floors.py::TestLshBandParameter). Band ``b``
    reads signature slots ``[b*rows, (b+1)*rows)``; bands*rows may
    undershoot the 16 permutations (3x5 uses 15)."""
    rows = _check_banding(n_bands, rows_per_band)

    def _build() -> list:
        out = []
        for b in range(n_bands):
            slice_concat = F.concat_ws(
                ",",
                *[
                    F.col("signature").getItem(b * rows + r).cast("string")
                    for r in range(rows)
                ],
            )
            out.append(md5_60bit(slice_concat, salt=f"band{b}"))
        return out

    # constant per (bands, rows): memoized construction (_util.cached_exprs)
    return cached_exprs(("band_exprs", n_bands, rows), _build)


def _band_exprs_sql(n_bands: int = _N_BANDS, rows_per_band: int | None = None) -> list[str]:
    rows = _check_banding(n_bands, rows_per_band)
    out = []
    for b in range(n_bands):
        concat = " || ',' || ".join(f"CAST(signature[{b * rows + r + 1}] AS VARCHAR)" for r in range(rows))
        out.append(duckdb_md5_60bit(f"({concat})", salt=f"band{b}"))
    return out


def minhash_band_candidates(
    sigs: DataFrame,
    n_bands: int = _N_BANDS,
    rows_per_band: int | None = None,
    id_col: str = "doc_id",
) -> DataFrame:
    """LSH candidate pairs from a MinHash ``signature`` column (the q51
    shape: ``array<bigint>`` of the 16 permutation minima): band each
    signature with :func:`_band_exprs_spark`'s ``(n_bands, rows_per_band)``
    knob, bucket on the band keys, and emit each bucket's distinct
    ``(id_a, id_b)`` pairs (``id_a < id_b``) for downstream exact
    verification.

    The knob is the S-curve tuner the r13 verdict asked to expose: the
    default 2x8 is the registered q51/q52/q61/q220 operating point
    (threshold 0.917 — recall 95.6%, 0.069 candidates/doc at sf1), and
    3x5 is the measured recovery point if recall ever sags at sf10+
    (threshold 0.803 — recall 99.5% at 0.231 candidates/doc, 3.3x the
    verify cost; artifacts/lsh_band_probe.json). Scale shape: one shuffle
    on band_key; the per-bucket self-join is quadratic only within a
    bucket, and the band hash keeps buckets near-singleton away from true
    near-duplicates."""
    bands = sigs.select(
        F.col(id_col).alias("id_a"),
        F.explode(F.array(*_band_exprs_spark(n_bands, rows_per_band))).alias("band_key"),
    )
    return (
        bands.join(
            bands.select(F.col("id_a").alias("id_b"), F.col("band_key").alias("bk")),
            (F.col("band_key") == F.col("bk")) & (F.col("id_a") < F.col("id_b")),
        )
        .select("id_a", "id_b")
        .distinct()
    )


_THRESHOLD = 0.95

_MINHASH_DEDUP_SQL = f"""
    WITH w AS (SELECT doc_id, lang, {_WORDS_SQL} AS words FROM documents),
    hs AS (
        SELECT doc_id, words, {_WORD_HASHES_SQL} AS hashes FROM w
    ),
    sigs AS (
        SELECT doc_id, words, [{", ".join(_minhash_sig_sql())}] AS signature FROM hs
    ),
    bands AS (
        SELECT doc_id, unnest([{", ".join(_band_exprs_sql())}]) AS band_key FROM sigs
    ),
    reps AS (
        SELECT band_key, MIN(doc_id) AS rep_id FROM bands GROUP BY band_key
    ),
    cand AS (
        SELECT DISTINCT b.doc_id, r.rep_id
        FROM bands b JOIN reps r ON b.band_key = r.band_key AND b.doc_id > r.rep_id
    ),
    verified AS (
        SELECT c.doc_id
        FROM cand c
        JOIN w wa ON wa.doc_id = c.doc_id
        JOIN w wb ON wb.doc_id = c.rep_id
        WHERE len(list_intersect(wa.words, wb.words))::DOUBLE
                / len(list_distinct(wa.words || wb.words)) >= {_THRESHOLD}
    ),
    removed AS (SELECT DISTINCT doc_id FROM verified)
    SELECT w.lang,
           COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT) AS n_removed
    FROM w LEFT JOIN removed r ON w.doc_id = r.doc_id
    GROUP BY w.lang
"""


@register("q52_minhash_neardup", oracle=_MINHASH_DEDUP_SQL)
def q52_minhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-duplicate *removal*: sign → band (2×8) → compare each
    doc against its bucket's representative (min doc_id) → drop docs whose
    exact word-set Jaccard vs the representative is ≥ 0.95. Emits per-lang
    kept/removed counts.

    Scale design: pair-output dedup is quadratic in cluster size (a 1500-doc
    duplicate cluster alone is 1.1M pairs) — comparing to one representative
    per bucket is LINEAR in corpus size: ≤ n_bands verifies per doc,
    regardless of cluster size. Buckets shuffle on band_key; the rep table
    is a tiny aggregate broadcast back; no cross join anywhere. (Chained
    near-dups that match a removed doc but not its representative survive —
    the standard recall trade of single-round representative dedup.)
    """
    (documents,) = tables(spark, sf_dir, "documents")
    # small file = 1 scan partition locally: spread rows so the 16-hash
    # signature expression uses every core — SKIPPED when the scan already
    # has >= cores splits (at 100 TB the unconditional form shuffled the
    # whole corpus for nothing; r14 verdict #1)
    documents = spread_small_input(documents, probe_key=(sf_dir, "documents"))
    # w feeds four consumers (signatures, both verify sides, final rollup);
    # persist so split+distinct runs once per row instead of four times.
    # MEMORY_AND_DISK: spills rather than OOMs when the word sets are large.
    from pyspark import StorageLevel

    w = documents.select("doc_id", "lang", _WORDS_SPARK().alias("words")).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    hs = w.select("doc_id", "words", _word_hashes_spark("words").alias("hashes"))
    sigs = hs.select("doc_id", "words", F.array(*_minhash_sig_spark("hashes")).alias("signature"))
    # bands feeds two consumers (the rep aggregate and the candidate probe);
    # persist the NARROW (doc_id, band_key) table so the per-word MD5 + 16
    # affine permutations run once per row, not once per consumer (r15: the
    # rep side is broadcast locally, so ReusedExchange cannot dedupe the
    # signature chain — measured 1.41 s -> 0.94 s at sf0.1). ~16 bytes/row
    # x n_bands: orders of magnitude narrower than the text it derives from.
    bands = (
        sigs.select("doc_id", F.explode(F.array(*_band_exprs_spark())).alias("band_key"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    reps = bands.groupBy("band_key").agg(F.min("doc_id").alias("rep_id"))
    # no .distinct() on the candidate pairs (r15): a pair can surface from
    # at most n_bands(=2) bands, and `removed` already collapses duplicates
    # AFTER the Jaccard verify — the distinct here paid a corpus-sized
    # exchange of the pair set and then the verify join re-shuffled the
    # survivors anyway, so dropping it strictly reduces shuffled bytes
    # (C <= C + C/dup) at the cost of <= n_bands Jaccard evals per dup pair
    # (map-side CPU). Measured 0.94 s -> 0.82 s at sf0.1, output identical.
    cand = (
        bands.join(reps, "band_key")
        .filter(F.col("doc_id") > F.col("rep_id"))
        .select("doc_id", "rep_id")
    )
    wa = w.select(F.col("doc_id"), F.col("lang"), F.col("words").alias("words_a"))
    wb = w.select(F.col("doc_id").alias("rep_id"), F.col("words").alias("words_b"))
    removed = (
        cand.join(wa, "doc_id")
        .join(wb, "rep_id")
        .filter(
            F.size(F.array_intersect("words_a", "words_b")).cast("double")
            / F.size(F.array_union("words_a", "words_b"))
            >= _THRESHOLD
        )
        .select("doc_id", "lang")
        .distinct()
    )
    # Per-lang rollup WITHOUT joining the removed set back onto the corpus:
    # every doc is either kept or removed, so n_kept = n_docs - n_removed
    # and the final join is lang-cardinality-sized instead of the previous
    # corpus-wide SortMergeJoin of w against the removed flags (r14: the
    # verify side carries lang, the rollup becomes two narrow aggregates
    # joined on lang — plan loses the corpus SMJ + its two exchanges).
    base = w.groupBy("lang").agg(F.count(F.lit(1)).alias("n_docs"))
    rem = removed.groupBy("lang").agg(F.count(F.lit(1)).alias("n_removed_"))
    # rem is language-cardinality at ANY corpus size: broadcast explicitly
    # (the planner's post-aggregate size estimate picked a SortMergeJoin)
    return base.join(F.broadcast(rem), "lang", "left").select(
        "lang",
        "n_docs",
        (F.col("n_docs") - F.coalesce("n_removed_", F.lit(0))).alias("n_kept"),
        F.coalesce("n_removed_", F.lit(0)).alias("n_removed"),
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

_SIMHASH_BITS = 60


@register(
    "q53_simhash",
    oracle=f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
    h AS (
        SELECT doc_id, list_transform(words, x -> {duckdb_md5_60bit('x')}) AS hashes FROM w
    )
    SELECT doc_id,
           list_sum(list_transform(range(0, {_SIMHASH_BITS}), k ->
               CASE WHEN list_sum(list_transform(hashes, h ->
                        CASE WHEN (h >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                    THEN (1::BIGINT << k) ELSE 0 END))::BIGINT AS simhash
    FROM h
    """,
)
def q53_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """60-bit SimHash fingerprint: per bit, majority vote of word-hash bits.

    Shuffle-free: the word-hash array is computed once per doc (one MD5
    pass), then each of the 60 vote sums is an array ``aggregate`` over
    that array — all whole-stage-codegen expressions inside one narrow
    projection, no explode, no exchange. The majority vote
    ``sum(±1) > 0`` is evaluated as ``2·ones > n_words`` so only the
    per-bit one-counts are accumulated. (The previous shape exploded
    words and ran a 60-aggregate groupBy(doc_id); removing the explode
    and the doc_id shuffle measured 0.81 s → 0.23 s at sf0.1, identical
    output. CollapseProject does not inline the hash-array producer into
    the 60 consumers — verified one md5 per plan.) Zero UDFs.

    NULL-text semantics (r15, pinning the r14 ADVICE note): a NULL ``text``
    yields NULL word/hash arrays, every per-bit vote evaluates NULL > 0 →
    otherwise(0), and the doc is EMITTED with simhash=0 — exactly what the
    DuckDB oracle SQL computes for the same row (list_sum(NULL) is NULL,
    the CASE falls to 0). The pre-r14 explode+groupBy shape silently
    DROPPED such docs, i.e. would have diverged from the oracle; the
    current shape is the oracle-faithful one. Fixture text is non-null, so
    both shapes hash identically on the declared data.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    documents = spread_small_input(documents, probe_key=(sf_dir, "documents"))
    hs = documents.select(
        "doc_id",
        cached_exprs(
            "q53_hs", lambda: F.transform(_WORDS_SPARK(), lambda w: md5_60bit(w))
        ).alias("hs"),
    )

    def _build_simhash():
        import operator
        from functools import reduce

        def _ones(k: int):
            # count of word-hashes with bit k set; votes = 2*ones - n_words
            return F.aggregate(
                F.col("hs"),
                F.lit(0).cast("bigint"),
                lambda acc, h: acc + F.shiftrightunsigned(h, k).bitwiseAND(F.lit(1)),
            )

        return reduce(
            operator.add,
            [
                F.when(_ones(k) * 2 > F.size("hs"), F.lit(1 << k))
                .otherwise(F.lit(0))
                .cast("bigint")
                for k in range(_SIMHASH_BITS)
            ],
        )

    # 60 array-aggregate lambdas = ~1.3 s of py4j construction; constant
    # expression, memoized per process (_util.cached_exprs)
    simhash = cached_exprs("q53_simhash", _build_simhash)
    return hs.select("doc_id", simhash.alias("simhash"))


_SIMHASH_CHUNKS = 4  # oracle-side: 4 x 15-bit pigeonhole chunks (hamming<=3 => chunk equal)
_HAMMING_MAX = 3
#: Spark-side candidate scheme (Manku WWW'07 multi-table banding): 6
#: disjoint 10-bit blocks; hamming<=3 leaves >=3 clean blocks, so pairs
#: agree exactly on some block TRIPLE — C(6,3)=20 tables keyed on 30 bits.
#: Same exact output set as the 4-chunk scheme (both are pigeonhole-exact);
#: 30-bit keys keep fixed-bucket random collisions from going quadratic
#: with corpus size (see q54 docstring for the measured sf100 numbers).
_SIMHASH_BLOCKS = 6
_SIMHASH_BLOCK_BITS = _SIMHASH_BITS // _SIMHASH_BLOCKS  # 10

_SIMHASH_TABLE_SQL = f"""
    WITH w AS (SELECT doc_id, {_WORDS_SQL} AS words FROM documents),
    h AS (
        SELECT doc_id, list_transform(words, x -> {duckdb_md5_60bit('x')}) AS hashes FROM w
    ),
    sh AS (
        SELECT doc_id,
               list_sum(list_transform(range(0, {_SIMHASH_BITS}), k ->
                   CASE WHEN list_sum(list_transform(hashes, hh ->
                            CASE WHEN (hh >> k) & 1 = 1 THEN 1 ELSE -1 END)) > 0
                        THEN (1::BIGINT << k) ELSE 0 END))::BIGINT AS simhash
        FROM h
    )
"""


@register(
    "q54_simhash_neardup",
    oracle=_SIMHASH_TABLE_SQL
    + f"""
    , chunks AS (
        SELECT doc_id, simhash, unnest(range(0, {_SIMHASH_CHUNKS})) AS c FROM sh
    ),
    keyed AS (
        SELECT doc_id, simhash, c, (simhash >> (15 * c::INT)) & 32767 AS chunk_key FROM chunks
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a, b.doc_id AS doc_b, b.simhash AS sh_b
        FROM keyed a JOIN keyed b
          ON a.c = b.c AND a.chunk_key = b.chunk_key AND a.doc_id < b.doc_id
    )
    SELECT doc_a, doc_b, bit_count(xor(sh_a::UBIGINT, sh_b::UBIGINT))::INT AS hamming
    FROM cand
    WHERE bit_count(xor(sh_a::UBIGINT, sh_b::UBIGINT)) <= {_HAMMING_MAX}
    """,
)
def q54_simhash_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs via multi-table pigeonhole banding (Manku,
    Jain, Das Sarma — "Detecting Near-Duplicates for Web Crawling",
    WWW'07): the 60-bit fingerprint splits into 6 disjoint 10-bit blocks;
    hamming ≤ 3 dirties at most 3 blocks, so every qualifying pair agrees
    EXACTLY on some 3 clean blocks — candidates come from C(6,3) = 20
    equi-joins keyed on a 30-bit block-triple concatenation (one exploded
    table, one shuffle join, never a cross join). Exact: no false
    negatives at the threshold, same output set as any pigeonhole scheme.

    Why triples and not the minimal 4 × 15-bit single-chunk scheme: a
    candidate key's bucket count is FIXED, so docs-per-bucket grows
    linearly with the corpus and random within-bucket pairs grow
    QUADRATICALLY. Measured at the sf100 fixture (5M docs): 15-bit keys
    expect C(n,2)·4·2^-15 ≈ 1.5e9 joined rows (the pair build took ~650 s
    and dominated q255); 30-bit triple keys expect C(n,2)·20·2^-30 ≈ 2e5.
    The price is a 20-row-per-doc explode instead of 4 — linear, ~3 GB of
    shuffle at 5M docs — for a ~6,000× cut in accidental candidates.
    This is exactly Manku's design point (built for an 8B-page crawl).

    The fingerprint table is materialized once (``localCheckpoint``) before
    the self-join: without it both join sides recompute the full explode +
    60-vote aggregation (measured 3.4× slower at sf0.01). It is n_docs rows
    of two longs — at 100 TB use ``checkpoint()`` to reliable storage, same
    shape.
    """
    from itertools import combinations

    sh = q53_simhash(spark, sf_dir).localCheckpoint()

    def _build_chunk_structs():
        def _blk(i: int):
            return F.shiftrightunsigned(
                "simhash", _SIMHASH_BLOCK_BITS * i
            ).bitwiseAND(F.lit((1 << _SIMHASH_BLOCK_BITS) - 1))

        return F.array(
            *[
                F.struct(
                    F.lit(t).cast("bigint").alias("c"),
                    (
                        _blk(i) * F.lit(1 << (2 * _SIMHASH_BLOCK_BITS))
                        + _blk(j) * F.lit(1 << _SIMHASH_BLOCK_BITS)
                        + _blk(k)
                    ).alias("chunk_key"),
                )
                for t, (i, j, k) in enumerate(
                    combinations(
                        range(_SIMHASH_BLOCKS), _SIMHASH_BLOCKS - _HAMMING_MAX
                    )
                )
            ]
        )

    # constant 20-triple struct array + the first-clean CASE chain below:
    # both memoized — their py4j construction dominated a fresh q54 call
    # (_util.cached_exprs)
    chunk_structs = cached_exprs("q54_chunk_structs", _build_chunk_structs)
    chunks = sh.select("doc_id", "simhash", F.explode(chunk_structs).alias("ck")).select(
        "doc_id", "simhash", F.col("ck.c").alias("c"), F.col("ck.chunk_key").alias("chunk_key")
    )
    a = chunks.select(
        F.col("doc_id").alias("doc_a"), F.col("simhash").alias("sh_a"), "c", "chunk_key"
    )
    b = chunks.select(
        F.col("doc_id").alias("doc_b"), F.col("simhash").alias("sh_b"),
        F.col("c").alias("c_b"), F.col("chunk_key").alias("chunk_key_b"),
    )
    # Per-pair dedup WITHOUT a distinct shuffle: a near-identical pair is
    # clean in most blocks, so it matches in up to C(6,3)=20 tables (a
    # hamming-0 pair in all 20) — a distinct over that join output shuffles
    # ~10-20 rows per true pair (measured: it doubled the sf10 pair build
    # after the multi-table switch). Instead keep each pair ONLY in the
    # first table whose block triple is fully clean for the pair — a pure
    # expression of xor(sh_a, sh_b), evaluated map-side in the join's own
    # Filter, so exactly one row per qualifying pair survives and the
    # distinct exchange disappears. Every joined row's own triple is clean
    # (its 30-bit key matched), so a qualifying pair always survives in
    # exactly one table: no false negatives, no duplicates.
    def _build_pair_filter_exprs():
        xor = F.col("sh_a").bitwiseXOR(F.col("sh_b"))
        hamming = F.bit_count(xor)

        def _clean(i: int):
            return (
                F.shiftrightunsigned(xor, _SIMHASH_BLOCK_BITS * i).bitwiseAND(
                    F.lit((1 << _SIMHASH_BLOCK_BITS) - 1)
                )
                == 0
            )

        combos = list(
            combinations(range(_SIMHASH_BLOCKS), _SIMHASH_BLOCKS - _HAMMING_MAX)
        )
        first_clean = F.lit(None).cast("bigint")
        for t in range(len(combos) - 1, -1, -1):
            i, j, k = combos[t]
            first_clean = F.when(
                _clean(i) & _clean(j) & _clean(k), F.lit(t).cast("bigint")
            ).otherwise(first_clean)
        return hamming, first_clean

    hamming, first_clean = cached_exprs(
        "q54_pair_filter", _build_pair_filter_exprs
    )
    return (
        a.join(
            b,
            (F.col("c") == F.col("c_b"))
            & (F.col("chunk_key") == F.col("chunk_key_b"))
            & (F.col("doc_a") < F.col("doc_b")),
        )
        .filter((hamming <= _HAMMING_MAX) & (F.col("c") == first_clean))
        .select("doc_a", "doc_b", hamming.cast("int").alias("hamming"))
    )


# ---------------------------------------------------------------------------
# n-gram Jaccard
# ---------------------------------------------------------------------------


_JACCARD_BAND_CHARS = 256  # length-band width for q55 candidate generation


@register(
    "q55_ngram_jaccard",
    oracle=f"""
    WITH d AS (
        SELECT doc_id, lang, source, n_chars, string_split(text, ' ') AS w
        FROM documents
    ),
    sh AS (
        SELECT doc_id, lang, source, n_chars,
               list_distinct(list_transform(range(1, len(w) - 1),
                   i -> CAST(('0x' || substr(md5(w[i] || ' ' || w[i+1] || ' ' || w[i+2]), 1, 15))
                        AS BIGINT))) AS shingles
        FROM d
    ),
    sk AS (SELECT *, list_min(shingles) AS min_sh FROM sh),
    pairs AS (
        SELECT a.lang, a.source, a.doc_id AS doc_a, b.doc_id AS doc_b,
               len(list_intersect(a.shingles, b.shingles))::DOUBLE
                 / len(list_distinct(a.shingles || b.shingles)) AS j
        FROM sk a JOIN sk b
          ON a.lang = b.lang AND a.source = b.source AND a.min_sh = b.min_sh
         AND a.doc_id < b.doc_id
         AND abs(a.n_chars - b.n_chars) <= {_JACCARD_BAND_CHARS}
    )
    SELECT lang, source, doc_a, doc_b, ROUND(j, 4) AS jaccard
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY lang, source
                                     ORDER BY j DESC, doc_a ASC, doc_b ASC) AS rn
        FROM pairs
    )
    WHERE rn <= 2
    """,
)
def q55_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-gram (word-shingle) Jaccard: top-2 most similar length-banded pairs
    per (lang, source) block. Shingles are 60-bit MD5 hashes, not strings:
    the per-pair set intersection compares fixed-width integers instead of
    ~20-byte strings (measured 13.7 s → 5.9 s warm at sf0.1; collisions at 60
    bits are negligible for Jaccard), and the banded join shuffles 8-byte
    elements instead of text.

    Scale design (the q118 covering-band shape, hardened round 3): pairs
    must share the (lang, source) block, sit within ``_JACCARD_BAND_CHARS``
    characters of each other, AND agree on a bottom-1 MinHash sketch — the
    minimum 60-bit shingle hash (``array_min(shingles)``: the hash family
    is the permutation, so the min IS a MinHash; two docs agree with
    probability equal to their Jaccard). Length bands bound pairs by block
    density; the sketch key bounds them by *duplicate* density — a band
    full of same-length non-duplicates no longer goes quadratic, because
    unrelated docs land in different sketch buckets. The left side fans out
    to its three neighboring band keys so the join stays a pure equi-join
    on (lang, source, min_sh, band); the |Δn_chars| post-filter makes each
    qualifying pair survive exactly one probe (no post-dedup needed).

    The shingle table is materialized ONCE (``localCheckpoint``, the q101
    pattern) before it fans into the self-join: without it, each join side
    re-evaluates the whole MD5 shingle transform — and ``array_min`` over
    the un-materialized alias duplicates it again within a side (Spark's
    collapsed projections don't CSE through transform lambdas; measured 4×
    the hashing cost). At 100 TB: swap for ``checkpoint()`` to reliable
    storage, same as the connected-components note.
    """
    from pyspark.sql import Window

    (documents,) = tables(spark, sf_dir, "documents")
    band = (F.col("n_chars") / _JACCARD_BAND_CHARS).cast("bigint")
    # words bound to a projected column: slice(raw-split-expr) inside the
    # transform lambda would inline one split() per shingle (q132's
    # anti-pattern); the multi-referenced column splits once per row
    docs_w = documents.select(
        "doc_id", "lang", "source", "n_chars", F.split("text", " ").alias("w")
    )
    w = F.col("w")
    shingled = docs_w.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.size(w) - 3),
                lambda i: md5_60bit(F.array_join(F.slice(w, i + 1, 3), " ")),
            )
        ).alias("shingles"),
    ).localCheckpoint()
    shingled = shingled.withColumn("min_sh", F.array_min("shingles"))
    a = shingled.select(
        F.col("lang").alias("lang"),
        F.col("source").alias("source"),
        F.col("doc_id").alias("doc_a"),
        F.col("n_chars").alias("chars_a"),
        F.col("shingles").alias("sh_a"),
        F.col("min_sh"),
        F.explode(F.array(band - 1, band, band + 1)).alias("probe_band"),
    )
    b = shingled.select(
        F.col("lang").alias("lang"),
        F.col("source").alias("source"),
        F.col("doc_id").alias("doc_b"),
        F.col("n_chars").alias("chars_b"),
        F.col("shingles").alias("sh_b"),
        F.col("min_sh"),
        band.alias("probe_band"),
    )
    pairs = (
        a.join(b, ["lang", "source", "min_sh", "probe_band"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("chars_a") - F.col("chars_b")) <= _JACCARD_BAND_CHARS)
        )
        .select(
            "lang",
            "source",
            "doc_a",
            "doc_b",
            (
                F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
                / F.size(F.array_union("sh_a", "sh_b"))
            ).alias("j"),
        )
    )
    win = Window.partitionBy("lang", "source").orderBy(
        F.col("j").desc(), F.col("doc_a").asc(), F.col("doc_b").asc()
    )
    return (
        pairs.withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 2)
        .select("lang", "source", "doc_a", "doc_b", F.round("j", 4).alias("jaccard"))
    )


# ---------------------------------------------------------------------------
# dedup clusters: connected components over near-dup pairs
# ---------------------------------------------------------------------------


#: Size gate for the driver-local connected-components fast path: a
#: bidirectional edge list at or under this many rows is solved by an
#: in-driver union-find instead of iterative distributed propagation.
#: Same strategy-switch philosophy as AQE's size-based broadcast join:
#: a duplicate graph is duplicate-DENSITY-sized, usually minuscule next
#: to the corpus, and five propagation rounds of shuffle jobs on a few
#: thousand rows are pure scheduling overhead (measured at sf0.1:
#: 3.3-4.6 s of rounds for a 2 799-node graph vs ~0.2 s local). 1M rows
#: (two longs each) keeps the collect bounded to tens of MB; above the
#: gate the distributed path runs unchanged.
CC_DRIVER_MAX_EDGES = 1_000_000

#: Size gate for broadcasting the LABELS side inside the distributed
#: propagation rounds (CC and PageRank). A localCheckpointed DataFrame is
#: a LogicalRDD with no statistics, so the planner defaults every round's
#: edges⋈labels join to sort-merge — re-shuffling and re-sorting the FULL
#: edge list each round (measured at the 44M-edge sf10 fixture: the CC
#: rounds were the one super-linear term in the whole decade sweep, 8.7x
#: time at 3.3x data; with the labels side broadcast a round costs 2.1 s
#: vs 4.4 s re-shuffled, and the edge list is never exchanged at all).
#: Labels are node-count-sized (duplicate-density, NOT corpus-sized).
#: Gate at 1M rows (~16 MB serialized), NOT the 64 MB autoBroadcast-style
#: bound originally used: the broadcast is rebuilt EVERY round (collect to
#: driver + re-broadcast + build-side hash relation), and the r10 sf100
#: decade run measured the cost of letting a 3.1M-label graph stay under
#: a 4M gate — the per-round rebroadcasts left the whole session degraded
#: (end-of-run calibration 1.65 s -> 10.9 s, per-job overhead 0.095 s ->
#: 0.58 s, epoch drift 560%), while the same query forced above the gate
#: at the same scale ended with a HEALTHY session (calib 1.71 s, overhead
#: 0.067 s) and flat per-round times (artifacts/bench_sf100_cc_spot
#: history + /tmp probe logs, r10). Since the above-gate rounds became
#: exchange-free on the edge side (checkpoint_partitioned, r9/r10), the
#: broadcast's advantage only holds while the broadcast itself is cheap —
#: small multiples of the shuffle-partition count, not millions of rows.
CC_LABELS_BROADCAST_MAX_ROWS = 1_000_000


def _union_find_components(rows) -> dict:
    """In-driver union-find (path halving + union by size) over (a, b)
    edge rows; returns {node: min_node_id_of_component} — the identical
    fixpoint the distributed min-label propagation converges to."""
    parent: dict = {}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    size: dict = {}
    for a, b in rows:
        for n in (a, b):
            if n not in parent:
                parent[n] = n
                size[n] = 1
        ra, rb = find(a), find(b)
        if ra != rb:
            if size[ra] < size[rb]:
                ra, rb = rb, ra
            parent[rb] = ra
            size[ra] += size[rb]
    comp_min: dict = {}
    roots = {n: find(n) for n in parent}
    for n, r in roots.items():
        if r not in comp_min or n < comp_min[r]:
            comp_min[r] = n
    return {n: comp_min[r] for n, r in roots.items()}


def _components_star(e0: DataFrame, nodes: DataFrame, max_iters: int) -> DataFrame:
    """Alternating small-star / large-star connected components (Kiveris,
    Lattanzi, Mirrokni, Rastogi, Vassilvitskii — "Connected Components in
    MapReduce and Beyond", SoCC'14): instead of propagating labels one hop
    per round (O(diameter) rounds — 18 at the 44M-edge sf10 fixture, whose
    mutated dup chains are exactly the long-chain regime), REWRITE THE EDGE
    LIST so each round halves chain heights — O(log² n) rounds in theory,
    a handful in practice, converging to one star per component centered at
    the component's minimum node id (the same fixpoint as min-label
    propagation; equality-pinned in tests/test_graph_properties.py).

    ``e0``: canonical directed edges (u, v) with u > v, no self-loops
    (duplicates tolerated — the first large-star output is distinct).
    ``nodes``: one row (node) per node of the ORIGINAL graph, including
    self-loop singletons that the canonical edge list drops.

    Per round, with m(n) := min(Γ(n) ∪ {n}) — which over canonical edges
    is simply least(n, min v over edges (n, v)), since larger neighbors
    can never be the min:

    * **large-star** connects every node's LARGER neighbors to m:
      each canonical edge (u, v) is the directed pair small→big (v→u), so
      the whole operation is one groupBy(u).min(v) + one join:
      (u, v) → (u, m(v)). Output stays canonical (m(v) ≤ v < u).
    * **small-star** connects every node's smaller neighbors — and the
      node itself — to m: (u, v) → (v, m(u)) plus (u, m(u)), dropping the
      (m, m) self-loop.

    Both steps preserve connectivity and never merge components; the edge
    set is a fixpoint of both iff it is a disjoint union of min-centered
    stars, at which point labels read directly off the edges. Convergence
    is detected by an order-insensitive edge-set signature (count +
    xxhash64 sum) staying unchanged through BOTH steps of a round.

    Every intermediate goes through ``checkpoint_clean`` (iterative joins
    must truncate lineage AND reset size stats — see _util) and each
    superseded round's blocks are released. The min tables are node-sized
    (duplicate-density, not corpus-sized) and broadcast under
    :data:`CC_LABELS_BROADCAST_MAX_ROWS` — above the gate the same rounds
    run with shuffle joins, still O(log n) of them. Returns a
    ``checkpoint_clean``-ed (node, comp) frame — all loop blocks are
    released before returning, and the result's own blocks are reachable
    for release via ``_stats_clean_origin`` (memo.clear_all).
    """
    nodes_ckpt = checkpoint_clean(nodes)
    n_nodes = nodes_ckpt.count()
    bcast = n_nodes <= CC_LABELS_BROADCAST_MAX_ROWS
    _b = F.broadcast if bcast else (lambda df: df)
    if bcast:
        cur = checkpoint_clean(e0)
    else:
        # Above the broadcast gate, round 1's large-star join is an SMJ
        # whose edge side exchanges AND sorts the full initial edge list
        # on v — the measured round-1 lump (7.5 of 10.9 s loop-body at
        # 22M edges; artifacts/cc_star_round1_profile.txt). Materialize
        # e0 laid out on the join key instead, so the first SMJ reuses
        # the layout. ONLY the pre-loop input may use the stats-keeping
        # checkpoint_partitioned: per-round outputs must stay
        # checkpoint_clean or join-size estimates compound geometrically
        # (see _util.checkpoint_clean). Rounds 2+ re-exchange their own
        # (sharply shrinking) edge lists as before.
        cur = checkpoint_partitioned(e0, "v")

    def _sig(e: DataFrame):
        # Sum as decimal(38,0): a long sum of xxhash64 values overflows
        # (and under ANSI mode raises) after ~2 same-signed terms.
        r = e.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.xxhash64("u", "v").cast("decimal(38,0)")).alias("h"),
        ).first()
        return (r["n"], r["h"])

    live = [cur]  # checkpoints the NEXT materialization supersedes

    def _advance(new_cur: DataFrame) -> DataFrame:
        out = checkpoint_clean(new_cur)
        for f in live:
            release_checkpoint(f)
        live.clear()
        live.append(out)
        return out

    import os as _os
    import time as _time

    # Round-boundary reclaim (r10 verdict task #3): shuffle-file /
    # checkpoint-block cleanup is GC-triggered, and the session's 5-min
    # periodic GC backstop (session.py) fires on ITS schedule — measured
    # landing mid-round in the hub probe (round 12: 37.9 s vs ~8 s
    # neighbors; artifacts/cc_hub_probe_gc_attrib.txt pins a Pause Full
    # inside that round). When rounds are long enough for a scheduled GC
    # to land inside one, do the reclaim explicitly AT the boundary
    # instead — the periodic timer then finds a clean heap and its
    # mid-round pause collapses. Gated on the previous round's duration
    # so small-fixture tests (sub-second rounds, GC cost would dominate)
    # never pay it; at cluster scale rounds are minutes and one boundary
    # GC is noise.
    _gc_thresh = float(_os.environ.get("SPARK_GRAFT_CC_BOUNDARY_GC_S", "5.0"))

    sig = _sig(cur)
    rounds = 0
    converged = False
    round_times: list[float] = []
    round_rows: list[tuple[int, int]] = []
    boundary_gcs: list[float] = []
    for _ in range(max_iters):
        rounds += 1
        if not bcast and round_times and round_times[-1] >= _gc_thresh:
            _tg = _time.monotonic()
            cur.sparkSession.sparkContext._jvm.System.gc()
            boundary_gcs.append(round(_time.monotonic() - _tg, 3))
        _t0 = _time.monotonic()
        # large-star: (u, v) -> (u, m(v))
        mn = cur.groupBy(F.col("u").alias("n")).agg(F.min("v").alias("m"))
        cur = _advance(
            cur.join(_b(mn), cur["v"] == mn["n"], "left")
            .select(cur["u"], F.coalesce(mn["m"], cur["v"]).alias("v"))
            .distinct()
        )
        sig_large = _sig(cur)
        # small-star: (u, v) -> (v, m(u)) ∪ (u, m(u)), minus (m, m).
        # The min table is consumed twice (join + union), so materialize
        # it once instead of running the agg twice.
        mn2 = checkpoint_clean(
            cur.groupBy(F.col("u").alias("n")).agg(F.min("v").alias("m"))
        )
        small = (
            cur.join(_b(mn2), cur["u"] == mn2["n"])
            .select(cur["v"].alias("u"), mn2["m"].alias("v"))
            .unionByName(mn2.select(F.col("n").alias("u"), F.col("m").alias("v")))
            .filter(F.col("u") != F.col("v"))
            .distinct()
        )
        live.append(mn2)
        cur = _advance(small)
        sig_small = _sig(cur)
        round_times.append(round(_time.monotonic() - _t0, 3))
        # per-round materialized edge counts after each step (free — the
        # convergence signatures already carry them): the scale probes
        # read these to show the intermediate edge set stays bounded on
        # adversarial high-degree/long-chain graphs (r9 verdict task #4)
        round_rows.append((sig_large[0], sig_small[0]))
        if sig == sig_large == sig_small:
            # The signature is hash-based (count + xxhash64 sum), so a
            # ~2^-64 collision could stop early on a non-fixpoint.
            # Confirm structurally, once, collision-free (r9 ADVICE): a
            # fixpoint of both steps is exactly a disjoint union of
            # depth-1 min-centered stars — every u appears exactly once
            # and no center (v) has an outgoing edge. Two node-sized
            # aggregations over the final (tiny) star set.
            r = cur.agg(
                F.count(F.lit(1)).alias("n"),
                F.count_distinct("u").alias("nu"),
            ).first()
            if r["n"] == r["nu"] and (
                cur.join(
                    cur.select(F.col("v").alias("u")).distinct(),
                    "u",
                    "left_semi",
                ).isEmpty()
            ):
                converged = True
                break
            # collision: signatures matched but the set is not yet a
            # star union — keep iterating
        sig = sig_small
    if not converged:
        # Reading labels off a non-fixpoint edge set yields WRONG
        # components (over-split) — never fail silently (r9 review).
        # Star needs O(log² n) rounds, so hitting the default 25 means a
        # pathological input, not a tuning matter.
        import logging

        logging.getLogger(__name__).warning(
            "star connected-components did NOT converge in %d rounds; "
            "returned labels may over-split components — raise max_iters",
            rounds,
        )
    # observability for scale tests/probes (per-round flatness is the
    # acceptance signal that no per-round state compounds)
    _components_star.last_rounds = rounds
    _components_star.last_converged = converged
    _components_star.last_round_times = round_times
    _components_star.last_round_rows = round_rows
    _components_star.last_boundary_gcs = boundary_gcs
    star_labels = (
        cur.select(F.col("u").alias("node"), F.col("v").alias("comp"))
        .groupBy("node")
        .agg(F.min("comp").alias("comp"))
    )
    out = checkpoint_clean(
        nodes_ckpt.join(_b(star_labels), "node", "left").select(
            "node", F.coalesce("comp", F.col("node")).alias("comp")
        )
    )
    for f in live:
        release_checkpoint(f)
    release_checkpoint(nodes_ckpt)
    return out


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iters: int = 25,
    driver_max_edges: int | None = None,
    edges_distinct: bool = False,
    algorithm: str = "star",
) -> DataFrame:
    """Connected components by iterative min-label propagation: every node's
    label converges to the smallest node id reachable from it.

    Returns (node, comp) for every node appearing in ``edges``. Each
    iteration is one shuffle join + aggregate (label exchange along edges);
    iteration count is the graph diameter, which for near-dup clusters is
    tiny (dup clusters are dense). Every round ``localCheckpoint``s its
    labels — iterative plans MUST truncate lineage physically: cached-plan
    reuse is not guaranteed across self-referencing rounds, and without
    truncation the plan doubles per round (measured: exponential round
    times, 160 s by round 5 on a 234-node graph; with checkpointing every
    round is ~0.4 s). On a cluster use ``checkpoint()`` to reliable storage
    instead — same shape, executor-loss tolerant.

    SIZE-ADAPTIVE: the edge list is materialized (and counted) up front
    anyway; at or below ``driver_max_edges`` (default
    :data:`CC_DRIVER_MAX_EDGES`) the components are solved by an in-driver
    union-find on the collected edges — a sanctioned, size-GATED collect,
    not a driver loop over unbounded data: the duplicate graph is bounded
    by dup density, not corpus size, and the distributed rounds cost ~20x
    more in job scheduling than the whole graph costs to solve locally.
    Above the gate, the distributed propagation below runs unchanged (the
    100 TB path; both paths are equality-pinned in
    tests/test_graph_properties.py).
    """
    if max_iters < 1:
        # The distributed loops read their convergence state (n_changed /
        # round signatures) after the loop body — a zero-trip loop would
        # leave them unbound (NameError) rather than "return the initial
        # labels", so reject up front (r9 ADVICE).
        raise ValueError(f"max_iters must be >= 1, got {max_iters}")
    if driver_max_edges is None:
        driver_max_edges = CC_DRIVER_MAX_EDGES
    # ``edges_distinct=True`` is a caller guarantee that the input holds
    # each undirected edge once with src < dst — then the two directions
    # are disjoint (no dedup shuffle needed) and the bidirectional count
    # is exactly 2x the input count, so the driver fast path can skip
    # materializing the mirrored edge list entirely and collect the input
    # as-is (the near-dup pair tables qualify: q54 ends in a distinct
    # over a<b pairs, and the memo hands them over already checkpointed).
    # The algorithms themselves tolerate duplicates (min/union-find are
    # idempotent); the guarantee only keeps the edge list, the size
    # gate's count, and the rounds' join fan-out honest.
    bi = None
    if edges_distinct:
        n_bi = 2 * edges.count()
    else:
        bi = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
            .distinct()
            .localCheckpoint()
        )
        n_bi = bi.count()
    if n_bi <= driver_max_edges:
        import pandas as pd

        # Arrow-batched transfer both ways (toPandas / from-pandas
        # createDataFrame) — row-at-a-time toLocalIterator measured ~20x
        # slower on a 500k-row edge list. a <= b keeps each undirected
        # edge (and any self-loop) exactly once: bi holds both directions.
        pdf = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b")).toPandas()
            if edges_distinct
            else bi.filter(F.col("a") <= F.col("b")).toPandas()
        )
        if bi is not None:
            # fully consumed by the Arrow collect above — release its
            # checkpoint blocks instead of leaving them to driver GC
            # (the distributed paths below already do; r9 review)
            release_checkpoint(bi)
        comp = _union_find_components(zip(pdf["a"].tolist(), pdf["b"].tolist()))
        node_type = edges.schema[src].dataType
        if not comp:  # empty graph: keep the (node, comp) schema stable
            from pyspark.sql.types import StructField, StructType

            return edges.sparkSession.createDataFrame(
                [],
                StructType(
                    [
                        StructField("node", node_type, False),
                        StructField("comp", node_type, False),
                    ]
                ),
            )
        out = pd.DataFrame(
            {"node": list(comp.keys()), "comp": list(comp.values())}
        )
        return (
            edges.sparkSession.createDataFrame(out)
            .select(
                F.col("node").cast(node_type).alias("node"),
                F.col("comp").cast(node_type).alias("comp"),
            )
        )
    if algorithm == "star":
        # Canonical (u, v), u > v edge list + original node set (self-loop
        # singletons drop out of the canonical edges but must keep labels).
        if edges_distinct:
            e0 = edges.select(F.col(dst).alias("u"), F.col(src).alias("v"))
            nodes = (
                e0.select(F.col("u").alias("node"))
                .unionByName(e0.select(F.col("v").alias("node")))
                .distinct()
            )
            return _components_star(e0, nodes, max_iters)
        e0 = bi.filter(F.col("a") > F.col("b")).select(
            F.col("a").alias("u"), F.col("b").alias("v")
        )
        nodes = bi.select(F.col("a").alias("node")).distinct()
        out = _components_star(e0, nodes, max_iters)
        release_checkpoint(bi)
        return out
    if algorithm != "minlabel":
        raise ValueError(f"unknown connected-components algorithm: {algorithm!r}")
    if bi is None:  # distributed path entered via the edges_distinct gate
        bi = (
            edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
            .unionByName(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
            .localCheckpoint()
        )
    labels = (
        bi.select(F.col("a").alias("node"))
        .distinct()
        .withColumn("comp", F.col("node"))
        .localCheckpoint()
    )
    # Node count is fixed across rounds; one cheap count decides the join
    # strategy for EVERY round (see CC_LABELS_BROADCAST_MAX_ROWS: without
    # the hint the stat-less checkpointed edge list gets re-shuffled and
    # re-sorted per round — the measured super-linear term at sf10).
    bcast_labels = labels.count() <= CC_LABELS_BROADCAST_MAX_ROWS
    _b = F.broadcast if bcast_labels else (lambda df: df)
    if not bcast_labels:
        # Above the broadcast gate every round would otherwise re-exchange
        # AND re-sort the full edge list for its sort-merge join (labels
        # are checkpoint_clean'd per round, so they never carry a layout).
        # Pay the edge exchange ONCE: hash-partition + sort bi on the join
        # key and checkpoint it preserving that layout — each round's SMJ
        # then only exchanges the node-sized labels side (plan pinned in
        # tests/test_checkpoint_stats.py::test_partitioned_checkpoint_*).
        old_bi = bi
        bi = checkpoint_partitioned(bi, "b")
        release_checkpoint(old_bi)
    import time as _time

    prev_ckpt = labels  # the checkpointed frame whose blocks round N retires
    _round_times: list[float] = []
    for _ in range(max_iters):
        _t0 = _time.monotonic()
        nbr_min = (
            bi.join(_b(labels), bi.b == labels.node)
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("comp").alias("nbr_comp"))
        )
        propagated = labels.join(nbr_min, labels.node == nbr_min.node2, "left").select(
            "node",
            F.least(F.col("comp"), F.coalesce("nbr_comp", F.col("comp"))).alias("comp"),
            F.col("comp").alias("old_comp"),
        )
        # Pointer squaring (r8): materialize the neighbor-exchange result
        # (labels-sized, cheap next to the edge join it contains), then
        # SQUARE the pointer table against ITSELF — each squaring doubles
        # the chase depth through the current label forest, flattening it
        # so the NEXT round's edge exchange propagates roots instead of
        # stale intermediates. Measured at the 44M-edge sf10 fixture:
        # 20 rounds/92 s with single prev-table jumping -> 18 rounds/70 s
        # with 3 squarings — modest, because min-label CC flattens its
        # own forest every round and per-round progress stays ~1 edge hop
        # on adversarial chains; the O(log n)-round upgrade for such
        # graphs is small-star/large-star edge rewriting, implemented in
        # r9 as _components_star and now the DEFAULT (6 rounds/30.7 s at
        # the same fixture — artifacts/cc_sf10_star_probe.txt). This
        # minlabel path stays selectable: it is the simpler fixpoint the
        # star path is equality-pinned against. The fixpoint is unchanged:
        # squaring is a monotone min over labels reachable through
        # current pointers, the same closure the propagation converges
        # to. Each materialization goes
        # through checkpoint_clean, NOT plain localCheckpoint: a
        # checkpointed LogicalRDD keeps its origin plan's size ESTIMATE,
        # and Catalyst multiplies join children's BigInt sizes — per-
        # round checkpoints of a k-join pipeline compound the estimate
        # geometrically until BigInteger math dominates planning
        # (measured: round 10 at 180 s with all executors idle — see
        # _util.checkpoint_clean).
        cur = checkpoint_clean(propagated)
        release_checkpoint(prev_ckpt)
        prev_ckpt = cur
        for _ in range(3):
            t = cur.select(F.col("node").alias("j_node"), F.col("comp").alias("j_comp"))
            cur = checkpoint_clean(
                cur.join(_b(t), cur.comp == t.j_node, "left").select(
                    "node",
                    F.least(F.col("comp"), F.coalesce("j_comp", F.col("comp"))).alias("comp"),
                    "old_comp",
                )
            )
            release_checkpoint(prev_ckpt)
            prev_ckpt = cur
        new_labels = cur
        n_changed = new_labels.filter(F.col("comp") != F.col("old_comp")).count()
        labels = new_labels.select("node", "comp")
        _round_times.append(round(_time.monotonic() - _t0, 3))
        if n_changed == 0:
            break
    connected_components.last_round_times = _round_times
    connected_components.last_converged = n_changed == 0
    if n_changed != 0:
        # Partially-propagated labels over-split components — make the
        # truncation loud (r9 review): with 3x pointer squaring a round
        # covers ~8 hops, so the default 25 rounds handle diameter ~200;
        # longer chains need a higher max_iters (or algorithm="star",
        # whose round count is logarithmic and which is the default).
        import logging

        logging.getLogger(__name__).warning(
            "min-label connected-components did NOT converge in %d rounds "
            "(%d labels still changing); returned labels may over-split "
            "components — raise max_iters or use algorithm='star'",
            max_iters,
            n_changed,
        )
    # Materialize the final (node, comp) frame and release every loop
    # checkpoint (incl. the partitioned edge list): the returned frame's
    # blocks stay reachable for release via _stats_clean_origin.
    out = checkpoint_clean(labels)
    release_checkpoint(prev_ckpt)
    release_checkpoint(bi)
    return out


#: SimHash near-dup pairs / components memoized per (application, dataset):
#: q96/q144/q148 all consume the q54 pair table and q96/q144 the same
#: components — a real pipeline computes the duplicate graph ONCE and feeds
#: every downstream decision from it. Entries are (stats-clean)
#: localCheckpointed (tiny: duplicate-density-sized), so repeated queries
#: skip the signature pass and the label-propagation rounds entirely, and
#: every entry's blocks are releasable by memo.clear_all: the pairs cache
#: holds a plain LogicalRDD, the comps cache a checkpoint_clean frame whose
#: blocks are reachable via _stats_clean_origin (r8 ADVICE #1/#4).
from ..memo import register as _register_memo

_NEARDUP_PAIRS_CACHE: dict[tuple[str, str], DataFrame] = _register_memo({})
_NEARDUP_COMPS_CACHE: dict[tuple[str, str], DataFrame] = _register_memo({})

#: Guards check-then-insert on the two caches above. Driver-side but not
#: single-threaded (concurrent streaming queries' foreachBatch bodies run
#: on separate driver threads), and — unlike the tiny-codebook memos —
#: entries hold localCheckpointed BLOCKS: an unsynchronized duplicate
#: insert would overwrite the first entry's reference, leaking its
#: executor blocks until driver GC (the exact r7/r8 orphan-block failure
#: mode clear_all was taught to avoid). Compute runs OUTSIDE the lock
#: (multi-second Spark jobs); the loser of a duplicate race releases its
#: own blocks. tests/test_caches.py::test_neardup_pairs_cache_concurrent.
_NEARDUP_CACHE_LOCK = threading.Lock()


def _neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    with _NEARDUP_CACHE_LOCK:
        cached = _NEARDUP_PAIRS_CACHE.get(key)
    if cached is not None:
        return cached
    fresh = (
        q54_simhash_neardup(spark, sf_dir).select("doc_a", "doc_b").localCheckpoint()
    )
    with _NEARDUP_CACHE_LOCK:
        winner = _NEARDUP_PAIRS_CACHE.setdefault(key, fresh)
    if winner is not fresh:
        release_checkpoint(fresh)  # lost a duplicate-compute race: free blocks
    return winner


def _neardup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    key = (spark.sparkContext.applicationId, sf_dir)
    with _NEARDUP_CACHE_LOCK:
        cached = _NEARDUP_COMPS_CACHE.get(key)
    if cached is not None:
        return cached
    comps = connected_components(
        _neardup_pairs(spark, sf_dir),
        src="doc_a",
        dst="doc_b",
        edges_distinct=True,  # q54 output: distinct pairs, doc_a < doc_b
    )
    # Cache a checkpoint_clean frame (not the raw result): the driver
    # fast path returns an in-plan local relation whose consumers
    # would re-ship it per query, and memo.clear_all can only release
    # entries whose blocks are reachable (LogicalRDD or
    # _stats_clean_origin — r8 ADVICE #1/#4). The distributed paths
    # already return such a frame; re-binding is a node-sized copy.
    entry = checkpoint_clean(comps)
    release_checkpoint(comps)  # distributed result superseded; no-op for driver path
    with _NEARDUP_CACHE_LOCK:
        winner = _NEARDUP_COMPS_CACHE.setdefault(key, entry)
    if winner is not entry:
        release_checkpoint(entry)
    return winner


#: WITH-chain prefix building the bidirectional SimHash near-dup edge list
#: ``bi(a, b)`` — shared by the recursive closure below and the iterative
#: fast-oracle materialization (:func:`materialize_neardup_components`).
_NEARDUP_BI_SQL = (
    _SIMHASH_TABLE_SQL
    + f"""
    , chunks AS (
        SELECT doc_id, simhash, unnest(range(0, {_SIMHASH_CHUNKS})) AS c FROM sh
    ),
    keyed AS (
        SELECT doc_id, simhash, c, (simhash >> (15 * c::INT)) & 32767 AS chunk_key FROM chunks
    ),
    pairs AS (
        -- hamming filter BEFORE the dedup (see q54's Spark twin): a pair
        -- joins once per matching chunk (<=4), so dedup narrow post-filter
        -- rows instead of a wide pre-filter candidate table
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM keyed a JOIN keyed b
          ON a.c = b.c AND a.chunk_key = b.chunk_key AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT)) <= {_HAMMING_MAX}
    ),
    bi AS (
        -- pairs are distinct with doc_a < doc_b, so the two directions are
        -- disjoint: UNION ALL, no second dedup
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION ALL
        SELECT doc_b, doc_a FROM pairs
    )
"""
)

#: Recursive-CTE transitive closure of the SimHash near-dup graph, ending in
#: ``comp(node, comp_id)`` — the oracle twin of
#: :func:`_neardup_components`. Shared by q96, q144, and the cluster-aware
#: split (curation_ops q255). This is the DRIVER-facing single-statement
#: oracle; it is correct at any scale but the full closure materializes
#: Σ size² reachability rows (245 s at sf0.1 where the dup graph is a set
#: of ~200-degree near-cliques) — the local sweep uses the fixpoint-
#: equivalent iterative form below instead.
NEARDUP_COMPONENTS_SQL = (
    _NEARDUP_BI_SQL.replace("WITH w", "WITH RECURSIVE w", 1)
    + """
    , reach(a, b) AS (
        SELECT a, b FROM bi
        UNION
        SELECT r.a, bi.b FROM reach r JOIN bi ON r.b = bi.a
    ),
    comp AS (
        SELECT a AS node, LEAST(a, MIN(b)) AS comp_id FROM reach GROUP BY a
    )
"""
)


def _propagate_components(con) -> int:
    """Iterative min-label propagation over an existing DuckDB temp table
    ``nd_edges(a, b)`` (directed both ways), materializing
    ``comp_fast(node, comp_id)`` at the same fixpoint as the recursive
    closure: every node's label converges to the min node id reachable
    from it. Each round is one edges⋈labels join + per-node MIN — O(|E|)
    rows materialized per round instead of the closure's Σ size²
    reachability pairs. Returns the number of rounds run.
    """
    con.execute(
        "CREATE OR REPLACE TEMP TABLE comp_fast AS "
        "SELECT a AS node, LEAST(a, MIN(b)) AS comp_id FROM nd_edges GROUP BY a"
    )
    rounds = 0
    while True:
        rounds += 1
        con.execute(
            """
            CREATE OR REPLACE TEMP TABLE comp_next AS
            SELECT c.node, LEAST(c.comp_id, MIN(cn.comp_id)) AS comp_id
            FROM comp_fast c
            JOIN nd_edges e ON e.a = c.node
            JOIN comp_fast cn ON cn.node = e.b
            GROUP BY c.node, c.comp_id
            """
        )
        changed = con.sql(
            "SELECT COUNT(*) FROM comp_next n JOIN comp_fast c USING (node) "
            "WHERE n.comp_id <> c.comp_id"
        ).fetchone()[0]
        con.execute(
            "CREATE OR REPLACE TEMP TABLE comp_fast AS "
            "SELECT node, comp_id FROM comp_next"
        )
        if changed == 0:
            return rounds


def materialize_neardup_components(con, reuse: bool = True) -> None:
    """Fast-oracle twin of NEARDUP_COMPONENTS_SQL: build the near-dup edge
    list once, then iterate min-label propagation with materialized rounds
    (DuckDB 1.0 has no ``USING KEY`` recursion, so the loop lives in
    Python; the fixpoint — and therefore the check's strength — is
    identical, asserted by tests/test_fast_oracles.py). Leaves
    ``comp_fast(node, comp_id)`` as a temp table.

    With ``reuse=True`` (default) an existing ``comp_fast`` on the
    connection is kept WHEN it was built from the same input: one oracle
    sweep runs q96/q144/q255 against fixed views on a single connection,
    and rebuilding the identical dup graph three times was two-thirds of
    the fast-path cost. Reuse is keyed on a fingerprint of the
    ``documents`` view (count + id/text hash sums — one cheap linear
    scan, far below the edge-join + propagation cost it saves), so
    re-pointing the view at different data forces a rebuild rather than
    silently serving stale components. ``reuse=False`` always rebuilds.
    """
    # fingerprint = count + SUM(hash(doc_id, text)) over the JOINT pair:
    # summing per-column hashes separately is collision-prone in principle
    # (swapping text between two rows preserves both sums — r7 ADVICE
    # finding #5); hashing the pair binds each text to its id so any
    # row-level reshuffle moves the sum.
    key_sql = (
        "SELECT COUNT(*) AS n, COALESCE(SUM(hash(doc_id, text)), 0) AS hrow "
        "FROM documents"
    )
    key = con.execute(key_sql).fetchone()
    if reuse:
        try:
            if con.execute("SELECT n, hrow FROM comp_fast_key").fetchone() == key:
                con.execute("SELECT node, comp_id FROM comp_fast LIMIT 0")
                return
        except Exception:
            pass
    # invalidate the key BEFORE touching comp_fast: a rebuild that dies
    # mid-propagation must not leave the old key paired with a
    # partially-propagated graph, or a later call against the original
    # data would reuse the unconverged labels
    con.execute("DROP TABLE IF EXISTS comp_fast_key")
    # STAGED edge build (r8, measured 4.4 s -> ~0.8 s at sf0.1): inlining
    # _NEARDUP_BI_SQL whole makes DuckDB expand the `keyed` CTE into BOTH
    # sides of the self-join, recomputing the per-word md5 -> simhash
    # pipeline twice (the multi-statement fast path may stage; the
    # single-statement canonical oracle stays as the driver runs it).
    # Same rows as `SELECT a, b FROM bi` by construction — equality with
    # the canonical form stays pinned by tests/test_fast_oracles.py.
    con.execute(
        "CREATE OR REPLACE TEMP TABLE nd_keyed AS "
        + _SIMHASH_TABLE_SQL
        + f"""
        , chunks AS (
            SELECT doc_id, simhash, unnest(range(0, {_SIMHASH_CHUNKS})) AS c FROM sh
        )
        SELECT doc_id, simhash, c, (simhash >> (15 * c::INT)) & 32767 AS chunk_key
        FROM chunks
        """
    )
    con.execute(
        f"""
        CREATE OR REPLACE TEMP TABLE nd_pairs AS
        SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
        FROM nd_keyed a JOIN nd_keyed b
          ON a.c = b.c AND a.chunk_key = b.chunk_key AND a.doc_id < b.doc_id
        WHERE bit_count(xor(a.simhash::UBIGINT, b.simhash::UBIGINT)) <= {_HAMMING_MAX}
        """
    )
    con.execute(
        "CREATE OR REPLACE TEMP TABLE nd_edges AS "
        "SELECT doc_a AS a, doc_b AS b FROM nd_pairs "
        "UNION ALL SELECT doc_b, doc_a FROM nd_pairs"
    )
    con.execute("DROP TABLE IF EXISTS nd_keyed")
    con.execute("DROP TABLE IF EXISTS nd_pairs")
    _propagate_components(con)
    # record the key captured BEFORE the build, so a view swapped
    # mid-build cannot be mistaken for the data the graph was built from;
    # integer literals, not bound parameters — DuckDB binds Python ints
    # wider than 64 bits through DOUBLE, silently losing low digits
    con.execute(
        "CREATE OR REPLACE TEMP TABLE comp_fast_key AS "
        f"SELECT {int(key[0])}::BIGINT AS n, {int(key[1])}::HUGEINT AS hrow"
    )


def _fast_components_oracle(suffix: str):
    """Build a fast-oracle callable: materialize components iteratively,
    then run the query-specific WITH-chain ``suffix`` against them (the
    same suffix string the canonical oracle appends after ``comp``)."""

    def run(con):
        materialize_neardup_components(con)
        return con.execute(
            "WITH comp AS (SELECT node, comp_id FROM comp_fast)" + suffix
        ).fetchdf()

    return run


_Q96_ORACLE_SUFFIX = """
    SELECT comp_id, COUNT(*) AS n_docs, MAX(node) AS max_doc
    FROM comp GROUP BY comp_id
    """


@register(
    "q96_dedup_clusters",
    oracle=NEARDUP_COMPONENTS_SQL + _Q96_ORACLE_SUFFIX,
    fast_oracle=_fast_components_oracle(_Q96_ORACLE_SUFFIX),
)
def q96_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster assembly: SimHash candidate pairs (q54) stitched
    into connected components by iterative min-label propagation, one row
    per duplicate cluster. The oracle computes the same components via a
    recursive-CTE transitive closure — tractable at test size, while the
    Spark side's per-round label exchange is the shape that scales (rounds
    = cluster diameter, each round one shuffle). Pairs and components are
    memoized per dataset (the graph is computed once, decisions downstream).
    """
    comps = _neardup_components(spark, sf_dir)
    return comps.groupBy(F.col("comp").alias("comp_id")).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.max("node").alias("max_doc"),
    )


_LEV_PREFIX = 96  # chars of text compared; bounds edit-distance cost per pair
_LEV_MAX = 50  # max edit distance to call a pair a fuzzy duplicate
_LEV_BAND_CHARS = 24  # length-band width; also the max |n_chars| gap allowed


@register(
    "q118_fuzzy_levenshtein",
    oracle=f"""
    WITH sk AS (
        SELECT doc_id, lang, source, n_chars, text,
               list_min(list_transform(range(1, len(string_split(text, ' ')) - 1),
                   i -> CAST(('0x' || substr(md5(string_split(text, ' ')[i] || ' ' ||
                        string_split(text, ' ')[i+1] || ' ' ||
                        string_split(text, ' ')[i+2]), 1, 15)) AS BIGINT))) AS min_sh
        FROM documents
    )
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           levenshtein(substring(a.text, 1, {_LEV_PREFIX}),
                       substring(b.text, 1, {_LEV_PREFIX})) AS edit_dist
    FROM sk a JOIN sk b
      ON a.lang = b.lang AND a.source = b.source AND a.min_sh = b.min_sh
     AND a.doc_id < b.doc_id
     AND abs(a.n_chars - b.n_chars) <= {_LEV_BAND_CHARS}
    WHERE levenshtein(substring(a.text, 1, {_LEV_PREFIX}),
                      substring(b.text, 1, {_LEV_PREFIX})) <= {_LEV_MAX}
    """,
)
def q118_fuzzy_levenshtein(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fuzzy near-dup pairs by bounded edit distance (record-linkage style).

    Candidate generation never goes quadratic (hardened round 3): pairs
    must share the (lang, source) block, sit in adjacent length bands of
    ``_LEV_BAND_CHARS`` chars, AND agree on a bottom-1 MinHash sketch over
    word 3-grams (the q55 prefilter — ``array_min`` of the 60-bit shingle
    hashes; the hash family is the permutation, so the min IS a MinHash).
    Length bands bound pairs by block density; the sketch key bounds them
    by duplicate density — a band of same-length unrelated docs no longer
    pairs up at all. The left side fans out to its three neighboring band
    keys (band-1, band, band+1) so the join stays a pure equi-join on
    (lang, source, min_sh, band) — hash-partitionable, no BNL — and any
    pair within the ``|n_chars| <= _LEV_BAND_CHARS`` gap is provably
    covered by exactly one probe, so no post-dedup is needed. The O(k^2)
    ``levenshtein`` verify runs JVM-side on a fixed-length prefix only for
    surviving candidates.
    """
    docs = tables(spark, sf_dir, "documents")[0]
    # words bound to a projected column (q132 anti-pattern note in q55)
    docs_w = docs.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        F.substring("text", 1, _LEV_PREFIX).alias("prefix"),
        F.split("text", " ").alias("w"),
    )
    w = F.col("w")
    min_sh = F.array_min(
        F.transform(
            F.sequence(F.lit(0), F.size(w) - 3),
            lambda i: md5_60bit(F.array_join(F.slice(w, i + 1, 3), " ")),
        )
    )
    # materialize the per-doc sketch ONCE (q101/q55 pattern): otherwise each
    # join side re-evaluates the MD5 transform, and the left side's explode
    # inlines it into Generate where it runs per OUTPUT row (3 bands) —
    # measured ~4x the hashing cost. 100 TB: swap for checkpoint().
    sk = docs_w.select(
        "doc_id",
        "lang",
        "source",
        "n_chars",
        "prefix",
        min_sh.alias("min_sh"),
    ).localCheckpoint()
    band = (F.col("n_chars") / _LEV_BAND_CHARS).cast("bigint")
    left = sk.select(
        F.col("doc_id").alias("doc_a"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars").alias("chars_a"),
        F.col("prefix").alias("text_a"),
        F.col("min_sh"),
        F.explode(F.array(band - 1, band, band + 1)).alias("probe_band"),
    )
    right = sk.select(
        F.col("doc_id").alias("doc_b"),
        F.col("lang"),
        F.col("source"),
        F.col("n_chars").alias("chars_b"),
        F.col("prefix").alias("text_b"),
        F.col("min_sh"),
        band.alias("probe_band"),
    )
    return (
        left.join(right, ["lang", "source", "min_sh", "probe_band"])
        .filter(
            (F.col("doc_a") < F.col("doc_b"))
            & (F.abs(F.col("chars_a") - F.col("chars_b")) <= _LEV_BAND_CHARS)
        )
        .select(
            "doc_a",
            "doc_b",
            F.levenshtein("text_a", "text_b").alias("edit_dist"),
        )
        .filter(F.col("edit_dist") <= _LEV_MAX)
    )


_Q144_ORACLE_SUFFIX = """
    , scored AS (
        SELECT c.comp_id, c.node,
               len(list_distinct(string_split(d.text, ' '))) AS quality
        FROM comp c JOIN documents d ON d.doc_id = c.node
    )
    SELECT comp_id,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           MIN(CASE WHEN rn = 1 THEN node END) AS rep_doc,
           MIN(CASE WHEN rn = 1 THEN quality END) AS rep_quality
    FROM (
        SELECT *, ROW_NUMBER() OVER (PARTITION BY comp_id
                                     ORDER BY quality DESC, node ASC) AS rn
        FROM scored
    )
    GROUP BY comp_id
    """


@register(
    "q144_cluster_representatives",
    oracle=NEARDUP_COMPONENTS_SQL + _Q144_ORACLE_SUFFIX,
    fast_oracle=_fast_components_oracle(_Q144_ORACLE_SUFFIX),
)
def q144_cluster_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup cluster RESOLUTION — the decision step after q96's cluster
    assembly: within each connected component of SimHash near-dup pairs,
    keep the most lexically rich copy (max distinct-token count, ties to
    the lowest doc_id) as the cluster representative; everything else in
    the cluster is the drop set.

    Spark shape on top of q96's components: doc quality is a narrow
    projection over documents, joined to the (tiny relative to the corpus)
    component table on doc_id, then one per-component row_number window.
    At 100 TB the component table holds only docs that HAVE a near-dup
    (duplicate-density-sized, not corpus-sized), so the join broadcasts or
    co-partitions on doc_id and the window partitions by cluster — no
    corpus-wide sort anywhere. The oracle replays the same transitive
    closure recursively and picks representatives with the identical
    (quality DESC, node ASC) rule.
    """
    comps = _neardup_components(spark, sf_dir)
    (documents,) = tables(spark, sf_dir, "documents")
    quality = documents.select(
        F.col("doc_id").alias("node"),
        F.size(F.array_distinct(F.split("text", " "))).alias("quality"),
    )
    scored = comps.join(quality, "node")
    win = Window.partitionBy("comp").orderBy(F.col("quality").desc(), F.col("node").asc())
    return (
        scored.withColumn("rn", F.row_number().over(win))
        .groupBy(F.col("comp").alias("comp_id"))
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.min(F.when(F.col("rn") == 1, F.col("node"))).alias("rep_doc"),
            F.min(F.when(F.col("rn") == 1, F.col("quality"))).alias("rep_quality"),
        )
    )


@register(
    "q148_pagerank_neardup_graph",
    oracle=_SIMHASH_TABLE_SQL
    + f"""
    , chunks AS (
        SELECT doc_id, simhash, unnest(range(0, {_SIMHASH_CHUNKS})) AS c FROM sh
    ),
    keyed AS (
        SELECT doc_id, simhash, c, (simhash >> (15 * c::INT)) & 32767 AS chunk_key FROM chunks
    ),
    cand AS (
        SELECT DISTINCT a.doc_id AS doc_a, a.simhash AS sh_a, b.doc_id AS doc_b, b.simhash AS sh_b
        FROM keyed a JOIN keyed b
          ON a.c = b.c AND a.chunk_key = b.chunk_key AND a.doc_id < b.doc_id
    ),
    pairs AS (
        SELECT doc_a, doc_b FROM cand
        WHERE bit_count(xor(sh_a::UBIGINT, sh_b::UBIGINT)) <= {_HAMMING_MAX}
    ),
    bi AS (
        SELECT doc_a AS a, doc_b AS b FROM pairs
        UNION
        SELECT doc_b, doc_a FROM pairs
    ),
    deg AS (SELECT a AS node, COUNT(*) AS d FROM bi GROUP BY a),
    r0 AS (SELECT node, CAST(1000000 AS BIGINT) AS r FROM deg),
    r1 AS (
        SELECT bi.b AS node, 150000 + (85 * SUM(r0.r // dg.d)) // 100 AS r
        FROM bi JOIN r0 ON r0.node = bi.a JOIN deg dg ON dg.node = bi.a
        GROUP BY bi.b
    ),
    r2 AS (
        SELECT bi.b AS node, 150000 + (85 * SUM(r1.r // dg.d)) // 100 AS r
        FROM bi JOIN r1 ON r1.node = bi.a JOIN deg dg ON dg.node = bi.a
        GROUP BY bi.b
    ),
    r3 AS (
        SELECT bi.b AS node, 150000 + (85 * SUM(r2.r // dg.d)) // 100 AS r
        FROM bi JOIN r2 ON r2.node = bi.a JOIN deg dg ON dg.node = bi.a
        GROUP BY bi.b
    )
    SELECT r3.node, CAST(r3.r AS BIGINT) AS rank_1e6, CAST(deg.d AS BIGINT) AS degree
    FROM r3 JOIN deg ON deg.node = r3.node
    """,
)
def q148_pagerank_neardup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PageRank (3 power iterations, damping 0.85) over the SimHash near-dup
    graph — centrality inside duplicate neighborhoods ranks the "canonical"
    documents that many near-copies point at. Complements q96 (which docs
    cluster) and q144 (which doc to keep by quality) with a structural
    keep-signal.

    Determinism: ranks live as 1e-6-scaled BIGINTs and every step is
    integer-only — per-edge contribution ``r DIV degree``, damping
    ``150000 + (85·Σ) DIV 100`` — so three unrolled iterations are
    bit-identical across engines and partition orders (a float PageRank
    would drift in summation order). Every node of the undirected graph
    has ≥ 1 in-edge, so no dangling-mass term is needed.

    Scale shape: the same per-round join+aggregate as connected_components
    — contributions shuffle on the destination key, ranks localCheckpoint
    per round (lineage must truncate; swap for checkpoint() on a cluster).
    Iterations are a fixed unroll (power iteration budget), not
    convergence-tested — the standard bounded-cost choice at 100 TB.
    """
    pairs = _neardup_pairs(spark, sf_dir)
    # q54 pairs are distinct with doc_a < doc_b -> the two directions are
    # disjoint; no dedup shuffle needed before the rounds (r8 shave)
    bi = (
        pairs.select(F.col("doc_a").alias("a"), F.col("doc_b").alias("b"))
        .unionByName(pairs.select(F.col("doc_b").alias("a"), F.col("doc_a").alias("b")))
        .localCheckpoint()
    )
    out = _integer_pagerank(bi)
    # every path of _integer_pagerank consumes bi eagerly (Arrow collect,
    # or per-iteration checkpoints / a partitioned layout copy), so the
    # returned plan never references it — release instead of leaving the
    # edge-list-sized blocks to driver GC (r9 review)
    release_checkpoint(bi)
    return out


def _numpy_pagerank_rounds(a, b, iters: int):
    """Driver-local core of the PageRank fast path: int64 power iterations
    over bidirectional edge arrays ``(a, b)``; returns (nodes, rank, degree)
    numpy arrays. Module-level so tests can (a) unit-pin it and (b) patch it
    to observe which side of the :data:`CC_DRIVER_MAX_EDGES` gate ran."""
    import numpy as np

    nodes, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    ai, bi_idx = inv[: len(a)], inv[len(a) :]
    # every node of the bidirectional graph appears on both sides, so
    # out-degree is everywhere positive and every node receives mass
    d = np.bincount(ai, minlength=len(nodes)).astype(np.int64)
    r = np.full(len(nodes), 1_000_000, dtype=np.int64)
    for _ in range(iters):
        acc = np.zeros(len(nodes), dtype=np.int64)
        np.add.at(acc, bi_idx, r[ai] // d[ai])
        r = 150000 + (85 * acc) // 100
    return nodes, r, d


def _integer_pagerank(
    bi: DataFrame, iters: int = 3, driver_max_edges: int | None = None
) -> DataFrame:
    """Three unrolled integer power iterations over a bidirectional edge
    list ``bi(a, b)`` → ``(node, rank_1e6, degree)``.

    SIZE-ADAPTIVE like :func:`connected_components`: at or under
    ``driver_max_edges`` (default :data:`CC_DRIVER_MAX_EDGES`) the already
    materialized edge list is collected via Arrow and iterated in numpy —
    every step is int64 (``//`` on positives == Spark's ``DIV``;
    ``np.add.at`` accumulates exactly), so the result is bit-identical to
    the distributed rounds, which otherwise cost ~0.5 s of job scheduling
    each on a duplicate-density-sized graph. Above the gate the
    per-round join+aggregate shuffle runs unchanged (the 100 TB path);
    both paths are equality-pinned in tests/test_graph_properties.py.
    """
    if driver_max_edges is None:
        driver_max_edges = CC_DRIVER_MAX_EDGES
    if bi.count() <= driver_max_edges:
        import numpy as np
        import pandas as pd

        pdf = bi.toPandas()
        node_type = bi.schema["a"].dataType
        if len(pdf) == 0:
            from pyspark.sql.types import LongType, StructField, StructType

            return bi.sparkSession.createDataFrame(
                [],
                StructType(
                    [
                        StructField("node", node_type, False),
                        StructField("rank_1e6", LongType(), False),
                        StructField("degree", LongType(), False),
                    ]
                ),
            )
        nodes, r, d = _numpy_pagerank_rounds(
            pdf["a"].to_numpy(), pdf["b"].to_numpy(), iters
        )
        out = pd.DataFrame({"node": nodes, "rank_1e6": r, "degree": d})
        return bi.sparkSession.createDataFrame(out).select(
            F.col("node").cast(node_type).alias("node"),
            F.col("rank_1e6").cast("bigint").alias("rank_1e6"),
            F.col("degree").cast("bigint").alias("degree"),
        )
    deg = bi.groupBy(F.col("a").alias("node")).agg(F.count(F.lit(1)).alias("d")).localCheckpoint()
    # Same per-round strategy decision as connected_components: the
    # contributions table is node-sized; broadcasting it keeps the edge
    # list un-shuffled in every power iteration (see
    # CC_LABELS_BROADCAST_MAX_ROWS).
    bcast = deg.count() <= CC_LABELS_BROADCAST_MAX_ROWS
    _b = F.broadcast if bcast else (lambda df: df)
    released_bi = False
    if not bcast:
        # Above the gate each power iteration's SMJ would re-exchange and
        # re-sort the full edge list (contribs are checkpoint_clean'd per
        # iteration, so they never carry a layout). Pay the edge exchange
        # once — same fix as connected_components (r9):
        # checkpoint_partitioned preserves hashpartitioning + sort order
        # through the LogicalRDD, so only the node-sized contributions
        # side shuffles per iteration. The caller's bi blocks are NOT
        # released (callers own/reuse their edge list); only our layout
        # copy is, on return.
        bi = checkpoint_partitioned(bi, "a")
        released_bi = True
    ranks = deg.select("node", F.lit(1_000_000).cast("bigint").alias("r"))
    prev_ckpt = None
    for _ in range(iters):
        src = ranks.join(deg, "node").select(
            F.col("node").alias("src"), F.expr("r DIV d").alias("contrib")
        )
        # stats-clean checkpoint per power iteration — same compounding-
        # BigInt-estimate hazard as connected_components (checkpoint_clean)
        ranks = checkpoint_clean(
            bi.join(_b(src), bi.a == F.col("src"))
            .groupBy(F.col("b").alias("node"))
            .agg((F.lit(150000) + F.expr("(85 * SUM(contrib)) DIV 100")).alias("r"))
        )
        if prev_ckpt is not None:
            release_checkpoint(prev_ckpt)
        prev_ckpt = ranks
    out = ranks.join(deg, "node").select(
        "node", F.col("r").alias("rank_1e6"), F.col("d").alias("degree")
    )
    if released_bi:
        # materialize before dropping the blocks of everything it read:
        # the layout copy, the final ranks checkpoint, and deg (all
        # unreachable from the checkpointed result; r9 review)
        out = checkpoint_clean(out)
        release_checkpoint(prev_ckpt)
        release_checkpoint(deg)
        release_checkpoint(bi)
    return out


@register(
    "q161_blocking_recall",
    oracle=f"""
    WITH orig AS (
        SELECT doc_id, lang, {_WORDS_SQL} AS words FROM documents
    ),
    noisy AS (
        SELECT doc_id + 1000000 AS doc_id, lang,
               list_distinct(list_filter(string_split(text, ' '),
                   (w, i) -> i % 7 <> 0)) AS words
        FROM documents
    ),
    corpus AS (SELECT * FROM orig UNION ALL SELECT * FROM noisy),
    hs AS (SELECT doc_id, {_WORD_HASHES_SQL} AS hashes FROM corpus),
    sigs AS (SELECT doc_id, [{", ".join(_minhash_sig_sql())}] AS signature FROM hs),
    bands AS (
        SELECT doc_id, unnest([{", ".join(_band_exprs_sql())}]) AS band_key FROM sigs
    ),
    rec AS (
        SELECT DISTINCT a.doc_id
        FROM bands a JOIN bands b
          ON b.doc_id = a.doc_id + 1000000 AND a.band_key = b.band_key
    )
    SELECT o.lang,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END) AS BIGINT)
               AS n_recovered,
           CAST((1000000 * SUM(CASE WHEN r.doc_id IS NULL THEN 0 ELSE 1 END))
                // COUNT(*) AS BIGINT) AS recall_ppm
    FROM orig o LEFT JOIN rec r ON r.doc_id = o.doc_id
    GROUP BY o.lang
    """,
)
def q161_blocking_recall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Blocking-quality evaluation for the LSH dedup pipeline — the q135
    pattern (ship the approximate path WITH its measurement) applied to
    q52's banding: a synthetic corpus with KNOWN noisy duplicates (every
    7th word dropped from each doc's copy) measures what fraction of true
    duplicate pairs share at least one MinHash band key, per language.

    "Measure, don't guess": band count / rows-per-band tuning at 100 TB
    reads recall off this harness instead of assuming it. The ground-truth
    join is (doc, doc+offset) — candidate generation stays the banded
    equi-join (band keys between a doc and ITS OWN copy), so the harness
    is linear like the pipeline it measures; no all-pairs anywhere.
    """
    (documents,) = tables(spark, sf_dir, "documents")
    orig = documents.select("doc_id", "lang", _WORDS_SPARK().alias("words"))
    # Spark higher-order filter passes a 0-based index; DuckDB's is 1-based
    noisy_words = F.array_distinct(
        F.filter(F.split("text", " "), lambda x, i: (i + 1) % 7 != 0)
    )
    noisy = documents.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "lang", noisy_words.alias("words")
    )
    corpus = orig.unionByName(noisy)
    hs = corpus.select("doc_id", _word_hashes_spark("words").alias("hashes"))
    sigs = hs.select(
        "doc_id", F.array(*_minhash_sig_spark("hashes")).alias("signature")
    )
    bands = sigs.select(
        "doc_id", F.explode(F.array(*_band_exprs_spark())).alias("band_key")
    )
    a = bands.filter(F.col("doc_id") < 1_000_000)
    b = bands.select(
        (F.col("doc_id") - 1_000_000).alias("copy_of"),
        F.col("band_key").alias("band_key_b"),
    ).filter(F.col("copy_of") >= 0)
    rec = (
        a.join(
            b,
            (F.col("doc_id") == F.col("copy_of"))
            & (F.col("band_key") == F.col("band_key_b")),
        )
        .select("doc_id")
        .distinct()
        .withColumn("hit", F.lit(1))
    )
    return (
        orig.select("doc_id", "lang")
        .join(rec, "doc_id", "left")
        .groupBy("lang")
        .agg(
            F.count(F.lit(1)).alias("n_pairs"),
            F.sum(F.coalesce(F.col("hit"), F.lit(0))).alias("n_recovered"),
        )
        .select(
            "lang",
            "n_pairs",
            "n_recovered",
            F.expr("(1000000 * n_recovered) DIV n_pairs").alias("recall_ppm"),
        )
    )


@register(
    "q177_linkage_scoring",
    oracle="""
    WITH dirty AS (
        SELECT c_custkey + 5000000 AS key,
               CASE WHEN c_custkey % 3 = 0 THEN upper(c_name) ELSE c_name END AS name,
               CASE WHEN c_custkey % 4 = 0 THEN ROUND(c_acctbal + 17.50, 2)
                    ELSE c_acctbal END AS bal,
               CASE WHEN c_custkey % 5 = 0 THEN 'UNKNOWN' ELSE c_mktsegment END AS seg,
               c_custkey AS true_match
        FROM customer
    ),
    scored AS (
        SELECT d.key, d.true_match,
               (CASE WHEN lower(d.name) = lower(c.c_name) THEN 40 ELSE 0 END
                + CASE WHEN abs(d.bal - c.c_acctbal) < 0.005 THEN 35 ELSE 0 END
                + CASE WHEN d.seg = c.c_mktsegment THEN 25 ELSE 0 END) AS score
        FROM dirty d JOIN customer c ON c.c_custkey = d.true_match
    )
    SELECT CASE WHEN score >= 75 THEN 'match'
                WHEN score >= 40 THEN 'possible'
                ELSE 'non_match' END AS verdict,
           CAST(COUNT(*) AS BIGINT) AS n_pairs,
           CAST(MIN(score) AS BIGINT) AS min_score,
           CAST(MAX(score) AS BIGINT) AS max_score
    FROM scored GROUP BY 1
    """,
)
def q177_linkage_scoring(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record-linkage field-agreement scoring (the Fellegi–Sunter shape):
    a deterministically dirtied copy of the customer table (case-mangled
    names, shifted balances, wiped segments) is compared field-by-field
    against its true counterpart; integer agreement weights (name 40,
    balance 35, segment 25) sum to a score classified into
    match / possible / non-match. q118 links on string distance; this is
    the multi-field weighted-evidence linkage used for entity resolution
    across structured feeds.

    Integer weights → exact classes; the balance comparison uses a
    half-cent tolerance rather than equality (float-safe on both
    engines). In production the candidate pairs come from a blocking key
    (q52/q118's machinery) instead of the known-truth join used here to
    make the scorer itself oracle-checkable.
    """
    (customer,) = tables(spark, sf_dir, "customer")
    dirty = customer.select(
        (F.col("c_custkey") + 5_000_000).alias("key"),
        F.when(F.col("c_custkey") % 3 == 0, F.upper("c_name"))
        .otherwise(F.col("c_name"))
        .alias("name"),
        F.when(F.col("c_custkey") % 4 == 0, F.round(F.col("c_acctbal") + 17.50, 2))
        .otherwise(F.col("c_acctbal"))
        .alias("bal"),
        F.when(F.col("c_custkey") % 5 == 0, F.lit("UNKNOWN"))
        .otherwise(F.col("c_mktsegment"))
        .alias("seg"),
        F.col("c_custkey").alias("true_match"),
    )
    score = (
        F.when(F.lower("name") == F.lower("c_name"), 40).otherwise(0)
        + F.when(F.abs(F.col("bal") - F.col("c_acctbal")) < 0.005, 35).otherwise(0)
        + F.when(F.col("seg") == F.col("c_mktsegment"), 25).otherwise(0)
    )
    scored = dirty.join(
        customer, F.col("c_custkey") == F.col("true_match")
    ).select(score.alias("score"))
    verdict = (
        F.when(F.col("score") >= 75, "match")
        .when(F.col("score") >= 40, "possible")
        .otherwise("non_match")
    )
    return scored.groupBy(verdict.alias("verdict")).agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.min("score").alias("min_score"),
        F.max("score").alias("max_score"),
    )
