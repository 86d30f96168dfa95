"""Fast-oracle accelerators must compute EXACTLY what the canonical
single-statement SQL computes (r6 verdict task #3: the q96-family
recursive-closure oracles cost 245 s each at sf0.1; the iterative
temp-table form is the same fixpoint at O(|E|) per round).

The driver only ever sees the canonical SQL — these tests are what lets
the local sweep use the fast path without weakening the check."""

import duckdb
import pytest

from kinesis_writer_spark import registry
from kinesis_writer_spark.operators.dedup import _propagate_components

SF_DIR = "/root/testdata/sf0.001"
FAST_QUERIES = ["q96_dedup_clusters", "q144_cluster_representatives",
                "q255_cluster_aware_split"]


def _connect(sf_dir=SF_DIR):
    con = duckdb.connect()
    from kinesis_writer_spark.io import TABLES

    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    return con


def _norm(df):
    df = df.reindex(sorted(df.columns), axis=1)
    return sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False, name=None))


@pytest.mark.parametrize("name", FAST_QUERIES)
def test_fast_oracle_equals_canonical_sql(name):
    import pandas.api.types as pt

    q = registry.get(name)
    assert q.fast_oracle is not None
    con = _connect()
    canonical = con.execute(q.oracle).fetchdf()
    fast = q.fast_oracle(_connect())  # fresh con: no temp-table leakage
    assert list(sorted(fast.columns)) == list(sorted(canonical.columns))
    assert _norm(fast) == _norm(canonical)
    # Pin dtype CLASS equality too: the strict sweep audits int-vs-float
    # driver hazards, and a hazard present in only one of the two forms
    # would otherwise slip through whichever form the sweep didn't run.
    for col in canonical.columns:
        assert pt.is_integer_dtype(fast[col]) == pt.is_integer_dtype(canonical[col]), col
        assert pt.is_float_dtype(fast[col]) == pt.is_float_dtype(canonical[col]), col


def test_materialize_reuses_existing_components():
    """One sweep connection runs q96/q144/q255 back-to-back; the dup-graph
    build must run once, not three times (review r7: 3x re-materialization
    was two-thirds of the fast-path cost)."""
    from kinesis_writer_spark.operators.dedup import (
        materialize_neardup_components,
    )

    con = _connect()
    materialize_neardup_components(con)
    before = _norm(con.sql("SELECT node, comp_id FROM comp_fast").fetchdf())
    # Drop the edge table: a second call that tried to rebuild would fail
    # or recreate it; reuse must leave comp_fast untouched instead.
    con.execute("DROP TABLE nd_edges")
    materialize_neardup_components(con)
    after = _norm(con.sql("SELECT node, comp_id FROM comp_fast").fetchdf())
    assert after == before
    with pytest.raises(duckdb.CatalogException):
        con.sql("SELECT * FROM nd_edges")
    # reuse=False forces the rebuild
    materialize_neardup_components(con, reuse=False)
    con.sql("SELECT * FROM nd_edges")  # edge table rebuilt


def test_materialize_rebuilds_when_documents_change():
    """Reuse is keyed on a fingerprint of the documents view — re-pointing
    the view at different data must force a rebuild, not silently serve
    the previous dataset's components (r7 review)."""
    from kinesis_writer_spark.operators.dedup import (
        materialize_neardup_components,
    )

    con = _connect()
    materialize_neardup_components(con)
    small = _norm(con.sql("SELECT node, comp_id FROM comp_fast").fetchdf())
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        "SELECT * FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )
    materialize_neardup_components(con)  # reuse=True, but the key changed
    big = con.sql("SELECT COUNT(*) FROM comp_fast").fetchone()[0]
    assert big != len(small)  # components now reflect the sf0.01 corpus


def test_failed_rebuild_invalidates_reuse_key(monkeypatch):
    """A rebuild that dies mid-propagation must not leave the previous
    key paired with a partially-built comp_fast — a later call against
    the original data would otherwise reuse unconverged labels (r7
    review). The key is dropped before the rebuild touches anything."""
    from kinesis_writer_spark.operators import dedup

    con = _connect()
    dedup.materialize_neardup_components(con)
    # Re-point the view so the key differs (forcing a rebuild), then make
    # the propagation step die mid-rebuild.
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        "SELECT * FROM read_parquet('/root/testdata/sf0.01/documents.parquet')"
    )

    def boom(_con):
        raise RuntimeError("simulated mid-propagation failure")

    monkeypatch.setattr(dedup, "_propagate_components", boom)
    with pytest.raises(RuntimeError):
        dedup.materialize_neardup_components(con)
    # The stale key must be gone: even re-pointing back at the original
    # data must rebuild rather than reuse the unconverged comp_fast.
    with pytest.raises(duckdb.CatalogException):
        con.sql("SELECT * FROM comp_fast_key")


def test_only_expected_queries_have_fast_oracles():
    # every fast oracle must be pinned by the parametrized test above —
    # fail loudly if one is added without extending FAST_QUERIES
    have = [n for n, fn in registry.all_queries().items()
            if registry.get(n).fast_oracle is not None]
    assert sorted(have) == sorted(FAST_QUERIES)


class TestPropagation:
    """_propagate_components on hand-built graphs: the iterative fixpoint
    must handle multi-round convergence (chains), not just dense cliques."""

    def _run(self, edges):
        con = duckdb.connect()
        con.execute("CREATE TEMP TABLE nd_edges (a BIGINT, b BIGINT)")
        con.executemany("INSERT INTO nd_edges VALUES (?, ?)", edges)
        con.execute(  # mirror the oracle's bidirectional edge convention
            "INSERT INTO nd_edges SELECT b, a FROM nd_edges"
        )
        rounds = _propagate_components(con)
        comp = dict(con.sql("SELECT node, comp_id FROM comp_fast").fetchall())
        return comp, rounds

    def test_path_graph_needs_multiple_rounds(self):
        # 0-1-2-...-9: labels must walk the whole chain to reach 0
        comp, rounds = self._run([(i, i + 1) for i in range(9)])
        assert comp == {i: 0 for i in range(10)}
        assert rounds > 1  # a single round would be the closure-free bug

    def test_two_components_stay_separate(self):
        comp, _ = self._run([(1, 2), (2, 3), (10, 11)])
        assert comp == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}

    def test_clique_converges_fast(self):
        edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
        comp, rounds = self._run(edges)
        assert comp == {i: 0 for i in range(5)}
        assert rounds <= 2


def test_swapped_texts_force_rebuild(monkeypatch):
    """Swapping the texts of two docs preserves per-column hash SUMs — the
    r7 fingerprint (separate SUM(hash(doc_id)) + SUM(hash(text))) could not
    see it and would have served stale components (r7 ADVICE finding #5).
    The joint SUM(hash(doc_id, text)) key must force a rebuild."""
    from kinesis_writer_spark.operators import dedup

    con = _connect()
    dedup.materialize_neardup_components(con)
    a, b = [
        r[0]
        for r in con.sql("SELECT doc_id FROM documents ORDER BY doc_id LIMIT 2").fetchall()
    ]
    con.execute(
        "CREATE OR REPLACE VIEW documents AS "
        "SELECT d.doc_id, s.text, d.lang, d.source "
        f"FROM read_parquet('{SF_DIR}/documents.parquet') d "
        f"JOIN read_parquet('{SF_DIR}/documents.parquet') s "
        f"ON s.doc_id = CASE WHEN d.doc_id = {a} THEN {b} "
        f"              WHEN d.doc_id = {b} THEN {a} ELSE d.doc_id END"
    )
    calls = []
    orig = dedup._propagate_components
    monkeypatch.setattr(
        dedup, "_propagate_components", lambda c: (calls.append(1), orig(c))[1]
    )
    dedup.materialize_neardup_components(con)  # reuse=True, key must differ
    assert calls, "text swap was invisible to the reuse fingerprint"
