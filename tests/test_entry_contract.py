"""Driver-contract guard: __spark_entry__ must expose a well-formed registry
(every oracle key has a query, names are unique and stable, the flagship
entry() builds) — an import error or key drift in ANY operator module would
otherwise break the whole correctness gate at driver time.
"""

from __future__ import annotations

import re

import __spark_entry__ as entry_mod


class TestDriverContract:
    def test_queries_and_oracles_align(self):
        qs = entry_mod.queries()
        os_ = entry_mod.oracle_sql()
        assert len(qs) >= 116
        assert set(os_) <= set(qs), "oracle without a query builder"
        # only the documented rows-only queries may lack an oracle
        # (q16/q121 graduated to tolerance-gated oracles in round 2; q90's
        # KPL batch boundaries are partitioning-dependent, not SQL-expressible)
        rows_only = set(qs) - set(os_)
        assert rows_only == {"q90_kpl_batch_stats"}

    def test_names_follow_convention(self):
        pat = re.compile(r"^q\d{2,3}_[a-z0-9_]+$")
        for name in entry_mod.queries():
            assert pat.match(name), f"bad query name {name!r}"

    def test_oracle_sql_is_text(self):
        for name, sql in entry_mod.oracle_sql().items():
            assert isinstance(sql, str) and "SELECT" in sql.upper(), name

    def test_entry_builds_and_returns_rows(self, spark):
        df = entry_mod.entry(spark)
        assert df.count() > 0
        assert "sum_qty" in df.columns
