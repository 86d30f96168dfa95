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
        # every registered query is oracle-checked: q90 (the last rows-only
        # entry) gained a recursive-CTE greedy-packing oracle in round 5
        # after its batching boundary became per-shard (semantic) instead of
        # physical-partition-dependent
        rows_only = set(qs) - set(os_)
        assert rows_only == set()

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

    def test_no_fixed_partition_counts_in_operators(self):
        # a literal repartition(N) pins parallelism regardless of cluster
        # size; counts must come from config/env (q90/q92 use
        # SPARK_GRAFT_KPL_PARTITIONS)
        import glob
        import os

        import kinesis_writer_spark.operators as ops

        offenders = []
        for path in glob.glob(os.path.join(os.path.dirname(ops.__file__), "*.py")):
            with open(path) as f:
                for i, line in enumerate(f, 1):
                    if re.search(r"\brepartition\(\s*\d", line):
                        offenders.append(f"{os.path.basename(path)}:{i}")
        assert not offenders, f"literal repartition counts: {offenders}"
