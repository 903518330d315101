"""Bounded streaming distinct-count store (mergeable HLL)."""

import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.operators.sketches import hll_estimate, hll_sketch
from tastytrade_sdk_spark.streaming.hll_stream import (
    hll_store_batch,
    read_hll_store,
)


@pytest.fixture()
def tmpdir_store():
    d = tempfile.mkdtemp(prefix="hll_store_test_")
    yield f"{d}/store"
    shutil.rmtree(d, ignore_errors=True)


def _ev(spark, lo, hi):
    return spark.createDataFrame(
        [("g%d" % (i % 3), "u%d" % i) for i in range(lo, hi)],
        "grp string, uid string",
    )


class TestHLLStore:
    def test_replay_equals_oneshot(self, spark, tmpdir_store):
        batches = [(0, 400), (400, 800), (600, 1200)]  # overlapping
        for epoch, (lo, hi) in enumerate(batches):
            hll_store_batch(
                _ev(spark, lo, hi), tmpdir_store, "grp", "uid", epoch
            )
        store = {
            r["grp"]: tuple(r["hll_regs"])
            for r in read_hll_store(spark, tmpdir_store, "grp").collect()
        }
        oneshot = {
            r["grp"]: tuple(r["hll_regs"])
            for r in hll_sketch(
                _ev(spark, 0, 1200), ["grp"], "uid", p=6
            ).collect()
        }
        assert store == oneshot

    def test_replayed_epoch_absorbed(self, spark, tmpdir_store):
        hll_store_batch(_ev(spark, 0, 300), tmpdir_store, "grp", "uid", 0)
        before = {
            r["grp"]: tuple(r["hll_regs"])
            for r in read_hll_store(spark, tmpdir_store, "grp").collect()
        }
        # redelivery of epoch 0 with DIFFERENT data must be skipped
        hll_store_batch(_ev(spark, 500, 900), tmpdir_store, "grp", "uid", 0)
        after = {
            r["grp"]: tuple(r["hll_regs"])
            for r in read_hll_store(spark, tmpdir_store, "grp").collect()
        }
        assert before == after

    def test_empty_batch_noop_and_missing_store_reads_empty(
        self, spark, tmpdir_store
    ):
        empty = spark.createDataFrame([], "grp string, uid string")
        out = read_hll_store(spark, tmpdir_store, "grp")
        assert out.collect() == []
        hll_store_batch(empty, tmpdir_store, "grp", "uid", 0)
        assert read_hll_store(spark, tmpdir_store, "grp").collect() == []

    def test_estimates_from_store(self, spark, tmpdir_store):
        hll_store_batch(_ev(spark, 0, 600), tmpdir_store, "grp", "uid", 0)
        hll_store_batch(_ev(spark, 600, 1500), tmpdir_store, "grp", "uid", 1)
        rows = hll_estimate(
            read_hll_store(spark, tmpdir_store, "grp"), p=6
        ).collect()
        assert len(rows) == 3
        for r in rows:  # 500 distinct per group, 64 regs -> ~13% err
            assert 300 < r["hll_estimate"] < 750

    def test_null_groups_dropped(self, spark, tmpdir_store):
        df = spark.createDataFrame(
            [(None, "u1"), ("g", "u2")], "grp string, uid string"
        )
        hll_store_batch(df, tmpdir_store, "grp", "uid", 0)
        rows = read_hll_store(spark, tmpdir_store, "grp").collect()
        assert [r["grp"] for r in rows] == ["g"]


class TestHashedLinearScores:
    def test_score_matches_python_replication(self, spark):
        import hashlib

        from tastytrade_sdk_spark.llmops.pipeline import hashed_linear_scores

        texts = ["the quick brown fox", "one", ""]
        docs = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        got = {
            r["doc_id"]: (r["n_feats"], r["clf_score"], r["keep"])
            for r in hashed_linear_scores(docs).collect()
        }

        def h32(s):
            return int(hashlib.md5(s.encode()).hexdigest()[:8], 16)

        for i, t in enumerate(texts):
            toks = [w for w in t.lower().split() if w]
            feats = toks + [
                f"{a} {b}" for a, b in zip(toks, toks[1:])
            ]
            score = sum(
                h32(f"qw-v1:w:{h32('qw-v1:' + x) % 1024}") % 16 - 8
                for x in feats
            )
            assert got[i] == (len(feats), score, score > 0)
