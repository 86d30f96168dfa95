"""Unit tests for the BPE tokenizer operators (tokenizer_ops.py) and the
lazy-branch guard pattern the shingle/fold expressions rely on."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from kinesis_writer_spark.operators.tokenizer_ops import _apply_merge


@pytest.fixture(scope="module")
def spark():
    from kinesis_writer_spark.session import get_spark

    return get_spark("test_tokenizer_ops")


def _fold(spark, word: str, l: str, r: str) -> list[str]:
    df = spark.createDataFrame([(word,)], ["w"]).select(
        _apply_merge(
            F.split("w", ""), F.lit(l), F.lit(r), F.lit(l + r)
        ).alias("out")
    )
    return df.first()["out"]


class TestApplyMerge:
    def test_simple_merge(self, spark):
        assert _fold(spark, "lower", "e", "r") == ["l", "o", "w", "er"]

    def test_greedy_non_overlapping(self, spark):
        # 'aaaa' with (a,a): left-to-right non-overlap -> [aa, aa]
        assert _fold(spark, "aaaa", "a", "a") == ["aa", "aa"]

    def test_odd_run(self, spark):
        # 'aaa' -> [aa, a]: the merged symbol must NOT chain as a new left
        assert _fold(spark, "aaa", "a", "a") == ["aa", "a"]

    def test_no_match(self, spark):
        assert _fold(spark, "abc", "x", "y") == ["a", "b", "c"]

    def test_single_char_word(self, spark):
        assert _fold(spark, "a", "a", "a") == ["a"]

    def test_adjacent_matches(self, spark):
        # 'abab' with (a,b): both occurrences merge
        assert _fold(spark, "abab", "a", "b") == ["ab", "ab"]


class TestLazyBranchGuard:
    """The shingle/pair builders guard F.slice(arr, k, size-k) behind
    F.when(size >= k+1, ...): Spark's CaseWhen must evaluate branches
    lazily per row, or short documents would hit slice's negative-length
    error. Pin that semantic."""

    def test_negative_slice_is_not_evaluated_when_guarded(self, spark):
        df = spark.createDataFrame([("a",), ("a b",), ("a b c d",)], ["text"])
        ws = F.split("text", " ")
        pairs = F.when(
            F.size(ws) >= 3,
            F.zip_with(
                F.slice(ws, 1, F.size(ws) - 2),
                F.slice(ws, 2, F.size(ws) - 2),
                lambda a, b: F.concat_ws(" ", a, b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        rows = df.select(pairs.alias("p")).collect()
        assert [r["p"] for r in rows] == [[], [], ["a b", "b c"]]

    def test_unguarded_negative_slice_raises(self, spark):
        # the guard above is load-bearing: without it, short rows fail
        df = spark.createDataFrame([("a",)], ["text"])
        ws = F.split("text", " ")
        bad = df.select(F.slice(ws, 2, F.size(ws) - 2).alias("s"))
        with pytest.raises(Exception):
            bad.collect()


class TestBpeQueries:
    def test_q251_shape(self, spark):
        from kinesis_writer_spark.registry import get

        df = get("q251_bpe_merges").fn(spark, "/root/testdata/sf0.001")
        rows = df.collect()
        assert [r["merge_rank"] for r in rows] == [1, 2, 3]
        for r in rows:
            assert r["merged"] == r["l_sym"] + r["r_sym"]
            assert r["pair_count"] > 0

    def test_q252_savings_bounds(self, spark):
        from kinesis_writer_spark.registry import get

        df = get("q252_bpe_fertility").fn(spark, "/root/testdata/sf0.001")
        for r in df.collect():
            assert 0 < r["n_bpe_tokens"] <= r["n_chars"]
            assert 0 <= r["saved_ppm"] < 1_000_000
