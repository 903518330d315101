"""BPE encode: kernel semantics, declarative-twin equivalence."""

import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.llmops.pipeline import (
    BPE_DEFAULT_MERGES,
    bpe_encode_expr_rounds,
    bpe_encode_kernel,
)

# test table with a self-overlapping pair and a 3-stage merge chain
TEST_MERGES = ("a a", "b c", "bc d", "x y", "aa aa")


def _kernel_encode(spark, words, merges, rounds=12):
    df = spark.createDataFrame([(w,) for w in words], ["word"])
    out = df.select(
        "word", bpe_encode_kernel(merges, rounds)(F.col("word")).alias("t")
    )
    return {r.word: r.t for r in out.collect()}


class TestKernelSemantics:
    def test_overlapping_pair_merges_left_to_right(self, spark):
        got = _kernel_encode(spark, ["aaaa", "aaa", "aaaaa"], TEST_MERGES)
        # round 1 merges non-overlapping (a,a) pairs left-to-right;
        # round 2 merges (aa,aa)
        assert got["aaaa"] == ["aaaa"]
        assert got["aaa"] == ["aa", "a"]
        assert got["aaaaa"] == ["aaaa", "a"]

    def test_merge_chain_respects_rank_order(self, spark):
        got = _kernel_encode(spark, ["bcd", "xybcd"], TEST_MERGES)
        assert got["bcd"] == ["bcd"]  # b c -> bc, then bc d -> bcd
        assert got["xybcd"] == ["xy", "bcd"]

    def test_no_applicable_merge_is_identity(self, spark):
        got = _kernel_encode(spark, ["zq", "z"], TEST_MERGES)
        assert got["zq"] == ["z", "q"]
        assert got["z"] == ["z"]

    def test_round_budget_bounds_work(self, spark):
        got = _kernel_encode(spark, ["aaaa"], TEST_MERGES, rounds=1)
        assert got["aaaa"] == ["aa", "aa"]  # second round withheld


class TestDeclarativeTwin:
    @pytest.mark.parametrize("merges", [TEST_MERGES, BPE_DEFAULT_MERGES])
    def test_expr_rounds_equal_kernel(self, spark, merges):
        words = [
            "aaaa", "aaa", "aaaaa", "bcd", "xybcd", "zq", "z",
            "table", "query", "batch", "value", "window", "scan",
            "key", "tab", "grow", "stand", "aabcd",
        ]
        df = spark.createDataFrame([(w,) for w in words], ["word"])
        expr_out = {
            r.word: r.pieces_arr
            for r in bpe_encode_expr_rounds(df, merges=merges).collect()
        }
        kern_out = _kernel_encode(spark, words, merges)
        assert expr_out == kern_out


class TestReviewRegressions:
    def test_duplicate_merge_pair_first_wins(self, spark):
        """A repeated pair must take its FIRST rank on every path
        (array_position semantics), not dict-overwrite last-wins."""
        merges = ("a b", "ab c", "b c", "a b")
        words = ["abc"]
        df = spark.createDataFrame([(w,) for w in words], ["word"])
        kern = _kernel_encode(spark, words, merges)
        expr = {
            r.word: r.pieces_arr
            for r in bpe_encode_expr_rounds(df, merges=merges).collect()
        }
        assert kern == expr == {"abc": ["abc"]}

    def test_null_word_passes_through(self, spark):
        from pyspark.sql import types as T

        df = spark.createDataFrame(
            [("ab",), (None,)],
            T.StructType([T.StructField("word", T.StringType())]),
        )
        out = {
            r.word: r.t
            for r in df.select(
                "word",
                bpe_encode_kernel(TEST_MERGES)(F.col("word")).alias("t"),
            ).collect()
        }
        assert out[None] is None and out["ab"] == ["a", "b"]
