"""Pin the ANN operating points (r12 verdict task #4).

The oracle gate proves Spark == DuckDB on q220/q135, but both engines
could agree on a silently-degraded index. These floors pin the QUALITY
operating point measured in artifacts/ann_recall_trajectory.json
(sf0.01 -> sf1 for LSH, sf0.01 -> sf10 for IVF: recall never measured
below the floors asserted here), so a banding/codebook regression fails a
test instead of surfacing as a slow recall sag at scale.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

SF001 = "/root/testdata/sf0.01"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SF001), reason=f"{SF001} fixture not present"
)


def test_q220_lsh_recall_floor(spark):
    from kinesis_writer_spark.registry import all_queries

    row = all_queries()["q220_lsh_recall_eval"](spark, SF001).first()
    # measured 92.0% at sf0.01, 95.7% at sf0.1, 95.6% at sf1
    assert row["n_hit"] * 100 >= 90 * row["n_truth"], (
        row["n_hit"],
        row["n_truth"],
    )
    # precision floor: banding must stay a FILTER, not a near-cross-join
    # (measured 100% here; 71% at sf1 where fan-out is still 0.07/doc)
    assert row["n_hit"] * 100 >= 70 * row["n_candidates"]


def test_q135_ivf_recall_floor(spark):
    from kinesis_writer_spark.registry import all_queries

    agg = (
        all_queries()["q135_ann_recall"](spark, SF001)
        .agg(F.sum("n_ivf").alias("n"), F.sum("n_in_brute_top10").alias("h"))
        .first()
    )
    # measured 86.7% at sf0.01 and monotonically BETTER at every larger
    # scale (93.3% sf0.1, 99.5% sf1, 100% sf10) — the floor pins the worst
    assert agg["h"] * 100 >= 80 * agg["n"], (agg["h"], agg["n"])


class TestAutoCellsOperator:
    """r12 verdict task #1: sqrt(n)-scaled IVF cells promoted from the
    bench harness into the operator surface (similarity.ivf_train_centroids
    / ivf_assign take k_cells, with "auto" = cells ~ sqrt(n)). The floors
    pin the measured ann_adaptive_k.json operating points so a codebook or
    rule regression fails a test, not a 100 TB deployment."""

    def test_auto_rule_matches_measured_rows(self):
        from kinesis_writer_spark.operators.similarity import ivf_auto_cells

        # the two measured ann_adaptive_k.json rows
        assert ivf_auto_cells(20_000) == 32  # sf1: 3.3% probed, recall 98%
        assert ivf_auto_cells(200_000) == 64  # sf10: 1.9% probed, recall 100%
        # small corpora stay at the oracle-twinned default
        assert ivf_auto_cells(200) == 4
        assert ivf_auto_cells(0) == 4
        # monotone non-decreasing across decades
        pts = [ivf_auto_cells(10**e) for e in range(2, 10)]
        assert pts == sorted(pts)

    def test_default_k_unchanged(self, spark):
        """The registered q62/q134/q135 operating point: k_cells=None must
        keep training exactly _KM_K=4 cells (bit-stable oracle twin)."""
        from kinesis_writer_spark import io as kio
        from kinesis_writer_spark.operators.similarity import (
            ivf_train_centroids,
        )

        emb = kio.load(spark, SF001, "embeddings")
        assert len(ivf_train_centroids(emb)) == 4
        # and "auto" at sf0.01 resolves to the same default (n=200 -> 4)
        assert len(ivf_train_centroids(emb, k_cells="auto")) == 4

    def test_explicit_k_validated(self, spark):
        from kinesis_writer_spark import io as kio
        from kinesis_writer_spark.operators.similarity import (
            ivf_train_centroids,
        )

        emb = kio.load(spark, SF001, "embeddings")
        with pytest.raises(ValueError, match="k_cells"):
            ivf_train_centroids(emb, k_cells=0)

    def test_auto_cells_sql_parity(self):
        """q261's oracle computes the auto cell count in DuckDB (the
        kparam CTE emitted by ivf_assigned_sql_ctes('auto')); it must
        round identically to the Python rule at every corpus size — a
        drifted transliteration would hash-mismatch only at scale factors
        where the branch flips."""
        import duckdb

        from kinesis_writer_spark.operators.similarity import (
            ivf_auto_cells,
            ivf_assigned_sql_ctes,
        )

        kparam_sql = ivf_assigned_sql_ctes("auto").split("c0 AS")[0]
        # strip the trailing "," so kparam stands alone as one CTE
        kparam_sql = kparam_sql.rstrip().rstrip(",")
        con = duckdb.connect()
        # decades, the fixture counts (500 / 2000), and the power-of-two
        # step boundaries around them
        for n in [1, 7, 63, 64, 65, 255, 256, 500, 2000, 20_000,
                  200_000, 10**6, 10**8, 10**10]:
            con.execute(f"CREATE OR REPLACE VIEW embeddings AS SELECT * FROM range({n})")
            got = con.execute(f"WITH {kparam_sql} SELECT k FROM kparam").fetchone()[0]
            assert got == ivf_auto_cells(n), (n, got, ivf_auto_cells(n))

    def test_auto_count_memoized_per_cache_key(self):
        """r13 ADVICE: resolving "auto" ran a full corpus count() on every
        call, including pure codebook-memo hits — a full scan per call at
        the 100 TB scale the feature targets. The resolution is memoized
        per cache_key; refresh=True is the explicit re-count path."""
        from kinesis_writer_spark.operators.similarity import (
            _AUTO_CELLS_CACHE,
            _resolve_k_cells,
        )

        class CountingCorpus:
            def __init__(self, n):
                self.n, self.counts = n, 0

            def count(self):
                self.counts += 1
                return self.n

        corpus = CountingCorpus(20_000)
        key = "auto-memo-test"
        _AUTO_CELLS_CACHE.pop(key, None)
        try:
            assert _resolve_k_cells(corpus, "auto", cache_key=key) == 32
            assert _resolve_k_cells(corpus, "auto", cache_key=key) == 32
            assert corpus.counts == 1  # second call served from the memo
            # corpus grew: without refresh the memo answer stands...
            corpus.n = 2_000_000
            assert _resolve_k_cells(corpus, "auto", cache_key=key) == 32
            assert corpus.counts == 1
            # ...refresh re-counts and overwrites the memo
            assert _resolve_k_cells(corpus, "auto", cache_key=key, refresh=True) == 256
            assert corpus.counts == 2
            assert _resolve_k_cells(corpus, "auto", cache_key=key) == 256
            assert corpus.counts == 2
            # no cache_key: every call counts (nothing to key the memo on)
            assert _resolve_k_cells(corpus, "auto") == 256
            assert corpus.counts == 3
        finally:
            _AUTO_CELLS_CACHE.pop(key, None)


class TestAutoCellsSf1Floor:
    """The sf1 operating point, measured in-test (~45 s): 20 000 vectors,
    auto -> 32 cells, probed fraction <= 5%, recall >= 95% — the
    ann_adaptive_k.json K=32/sf1 row as a regression gate."""

    FIXTURE = "/tmp/ann_traj/sf1"

    @pytest.fixture(scope="class")
    def sf1_dir(self):
        src = "/root/testdata/sf0.1"
        if not os.path.isdir(src):
            pytest.skip("sf0.1 fixture not present")
        import duckdb

        out = os.path.join(self.FIXTURE, "embeddings.parquet")
        if not (os.path.exists(out) and os.path.getsize(out) > 0):
            os.makedirs(self.FIXTURE, exist_ok=True)
            con = duckdb.connect()
            n = con.sql(
                f"SELECT COUNT(*) FROM '{src}/embeddings.parquet'"
            ).fetchone()[0]
            # x10 replicas, deterministic +-5% per-component perturbation
            # (the artifacts/ann_recall_trajectory.py corpus-growth model)
            con.sql(
                f"""
                COPY (
                    SELECT d.vec_id + r.r * {n} AS vec_id,
                           CASE WHEN r.r = 0 THEN d.embedding ELSE
                               list_transform(range(1, len(d.embedding) + 1),
                                   i -> CAST(d.embedding[i] * (1.0 +
                                       (CAST(hash(d.vec_id * 131071 + i * 8191 + r.r)
                                         % 2001 AS BIGINT) - 1000) / 20000.0) AS FLOAT))
                           END AS embedding,
                           d.label
                    FROM '{src}/embeddings.parquet' d, range(10) r(r)
                ) TO '{out}' (FORMAT PARQUET)
                """
            )
        return self.FIXTURE

    def test_auto_point_recall_and_probe_floors(self, spark, sf1_dir):
        from pyspark.sql import Window

        from kinesis_writer_spark.functions.vectors import cosine
        from kinesis_writer_spark.operators._util import tables
        from kinesis_writer_spark.operators.similarity import ivf_assign

        (emb,) = tables(spark, sf1_dir, "embeddings")
        n = emb.count()
        assert n == 20_000
        assigned = ivf_assign(emb, k_cells="auto", cache_key=sf1_dir).persist()
        try:
            occ = [
                int(r["count"])
                for r in assigned.groupBy("cluster_id").count().collect()
            ]
            assert len(occ) == 32  # the measured sf1 auto point
            # nprobe=1 expected probed fraction: sum(c^2)/n^2 (measured 3.3%)
            assert sum(c * c for c in occ) * 100 <= 5 * n * n
            # recall vs exact brute top-10 on a deterministic 40-query
            # subsample (q135's truth definition; measured 97.5%)
            q = assigned.filter(F.col("vec_id") % 500 == 50).select(
                F.col("vec_id").alias("query_id"),
                F.col("embedding").alias("qv"),
                F.col("cluster_id").alias("qcell"),
            )
            w = Window.partitionBy("query_id").orderBy(
                F.col("cos").desc(), F.col("neighbor_id").asc()
            )
            brute = (
                F.broadcast(q.select("query_id", "qv"))
                .join(emb, F.col("vec_id") != F.col("query_id"))
                .select("query_id", F.col("vec_id").alias("neighbor_id"),
                        cosine("qv", "embedding").alias("cos"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 10)
                .select(F.col("query_id").alias("b_query"),
                        F.col("neighbor_id").alias("b_neighbor"),
                        F.lit(1).alias("hit"))
            )
            ivf = (
                F.broadcast(q)
                .join(assigned, (F.col("cluster_id") == F.col("qcell"))
                      & (F.col("vec_id") != F.col("query_id")))
                .select("query_id", F.col("vec_id").alias("neighbor_id"),
                        cosine("qv", "embedding").alias("cos"))
                .withColumn("rank", F.row_number().over(w))
                .filter(F.col("rank") <= 3)
                .select("query_id", "neighbor_id")
            )
            agg = (
                ivf.join(
                    brute,
                    (F.col("query_id") == F.col("b_query"))
                    & (F.col("neighbor_id") == F.col("b_neighbor")),
                    "left",
                )
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.when(F.col("hit").isNull(), 0).otherwise(1)).alias("h"),
                )
                .first()
            )
            assert agg["n"] >= 100  # 40 queries x top-3 minus short cells
            assert agg["h"] * 100 >= 95 * agg["n"], (agg["h"], agg["n"])
        finally:
            assigned.unpersist()


class TestLshSf1Trajectory:
    """r12 verdict task #2: the one quality number that moved the wrong
    way is LSH precision at sf1 (100% -> 71.5% as banding fan-out meets a
    10x denser corpus). Recall and the VERIFY COST (candidates/doc) are
    the axes that decide whether the verify stage blows up at sf10+;
    pin both at the sf1 operating point so decay is a test failure, not
    a production surprise. Measured (artifacts/ann_recall_trajectory.json,
    sf1): recall 95.6%, precision 71.5%, candidates/doc 0.069."""

    FIXTURE = "/tmp/ann_traj/sf1"

    @pytest.fixture(scope="class")
    def sf1_docs(self):
        src = "/root/testdata/sf0.1"
        if not os.path.isdir(src):
            pytest.skip("sf0.1 fixture not present")
        if not os.path.exists(os.path.join(self.FIXTURE, "documents.parquet")):
            from bench_scale import build_fixture

            build_fixture(src, self.FIXTURE, 10)
        return self.FIXTURE

    def test_sf1_recall_precision_and_verify_cost_floors(self, spark, sf1_docs):
        import duckdb

        from kinesis_writer_spark.registry import all_queries

        n_docs = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf1_docs}/documents.parquet'"
        ).fetchone()[0]
        row = all_queries()["q220_lsh_recall_eval"](spark, sf1_docs).first()
        assert row["n_truth"] > 2000  # the fixture's exact-Jaccard truth set
        # recall: banding must keep catching true near-dup pairs at 10x
        # density without retuning (measured 95.6)
        assert row["n_hit"] * 100 >= 92 * row["n_truth"], (
            row["n_hit"], row["n_truth"],
        )
        # verify cost: candidates per doc bounds the exact-verify stage's
        # work; 0.1/doc keeps verification O(corpus) with a tiny constant
        # (measured 0.069)
        assert row["n_candidates"] <= 0.1 * n_docs, (
            row["n_candidates"], n_docs,
        )
        # precision: catches a further slide beyond the measured 71.5% —
        # wasted verify compute, not wrong answers (every candidate is
        # exactly verified downstream)
        assert row["n_hit"] * 100 >= 65 * row["n_candidates"], (
            row["n_hit"], row["n_candidates"],
        )


class TestLshBandParameter:
    """r13 verdict task #3: (bands, rows_per_band) exposed as an operator
    parameter on the MinHash family, default 2x8 unchanged, with the
    measured 3x5 recovery point selectable and floor-tested (recall >= 99%,
    candidates/doc <= 0.3 — artifacts/lsh_band_probe.json: 99.53% /
    0.231)."""

    FIXTURE = "/tmp/ann_traj/sf1"

    @pytest.fixture(scope="class")
    def sf1_docs(self):
        src = "/root/testdata/sf0.1"
        if not os.path.isdir(src):
            pytest.skip("sf0.1 fixture not present")
        if not os.path.exists(os.path.join(self.FIXTURE, "documents.parquet")):
            from bench_scale import build_fixture

            build_fixture(src, self.FIXTURE, 10)
        return self.FIXTURE

    def test_default_banding_unchanged(self, spark):
        """The registered q51/q52/q61/q220 operating point: no-arg banding
        must stay exactly the explicit 2x8 call (same exprs, same SQL)."""
        from kinesis_writer_spark.operators.dedup import (
            _band_exprs_spark,
            _band_exprs_sql,
        )

        assert [str(e) for e in _band_exprs_spark()] == [
            str(e) for e in _band_exprs_spark(2, 8)
        ]
        assert _band_exprs_sql() == _band_exprs_sql(2, 8)

    def test_banding_validated(self, spark):
        from kinesis_writer_spark.operators.dedup import _band_exprs_spark

        with pytest.raises(ValueError, match="banding"):
            _band_exprs_spark(4, 5)  # 20 > 16 permutations
        with pytest.raises(ValueError, match="banding"):
            _band_exprs_spark(0)

    def test_3x5_recovery_point_floors(self, spark, sf1_docs):
        """The lsh_band_probe.json 3x5 row, reproduced THROUGH the operator
        surface (minhash_band_candidates) against the same exact-Jaccard
        truth set at sf1."""
        import duckdb

        from kinesis_writer_spark.functions.hashing import md5_60bit
        from kinesis_writer_spark.operators._util import tables
        from kinesis_writer_spark.operators.dedup import (
            _MINHASH_MASK,
            _minhash_sig_spark,
            minhash_band_candidates,
        )
        from kinesis_writer_spark.operators.scale_ops import q193_prefix_filter_join

        n_docs = duckdb.sql(
            f"SELECT COUNT(*) FROM '{sf1_docs}/documents.parquet'"
        ).fetchone()[0]
        truth = q193_prefix_filter_join(spark, sf1_docs).select("doc_a", "doc_b")

        # the probe's 3-shingle MinHash signatures (q193's truth tokens)
        (documents,) = tables(spark, sf1_docs, "documents")
        ws = F.split("text", " ")
        inner = F.zip_with(
            F.slice(ws, 2, F.size(ws) - 2),
            F.slice(ws, 3, F.size(ws) - 2),
            lambda b, c: F.concat_ws(" ", b, c),
        )
        sh3 = F.zip_with(
            F.slice(ws, 1, F.size(ws) - 2), inner,
            lambda a, bc: F.concat_ws(" ", a, bc),
        )
        toks = F.when(
            F.size(ws) >= 3,
            F.array_distinct(F.transform(sh3, lambda s: md5_60bit(s))),
        ).otherwise(F.array().cast("array<bigint>"))
        hs = (
            documents.select("doc_id", toks.alias("toks"))
            .filter(F.size("toks") > 0)
            .select(
                "doc_id",
                F.transform(
                    "toks", lambda t: t.bitwiseAND(F.lit(_MINHASH_MASK))
                ).alias("hashes"),
            )
        )
        sigs = hs.select(
            "doc_id", F.array(*_minhash_sig_spark(F.col("hashes"))).alias("signature")
        )
        cands = minhash_band_candidates(sigs, 3, 5).select(
            F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
        )
        agg = (
            cands.withColumn("is_cand", F.lit(1))
            .join(
                truth.withColumn("is_truth", F.lit(1)),
                ["doc_a", "doc_b"],
                "full_outer",
            )
            .agg(
                F.sum(F.coalesce("is_truth", F.lit(0))).alias("n_truth"),
                F.sum(F.coalesce("is_cand", F.lit(0))).alias("n_candidates"),
                F.sum(
                    F.when(
                        (F.col("is_cand") == 1) & (F.col("is_truth") == 1), 1
                    ).otherwise(0)
                ).alias("n_hit"),
            )
            .first()
        )
        assert agg["n_truth"] > 2000
        # recall floor: measured 99.53% at the 3x5 point
        assert agg["n_hit"] * 100 >= 99 * agg["n_truth"], (
            agg["n_hit"], agg["n_truth"],
        )
        # verify-cost ceiling: measured 0.231 candidates/doc
        assert agg["n_candidates"] <= 0.3 * n_docs, (
            agg["n_candidates"], n_docs,
        )
