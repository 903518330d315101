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

    def test_null_values_ignored_not_crashing(self, spark, tmpdir_store):
        df = spark.createDataFrame(
            [("g", "u1"), ("g", None), ("h", None)],
            "grp string, uid string",
        )
        hll_store_batch(df, tmpdir_store, "grp", "uid", 0)
        rows = {r["grp"] for r in
                read_hll_store(spark, tmpdir_store, "grp").collect()}
        # "h" had only NULL values -> no sketch row; "g" sketched u1
        assert rows == {"g"}

    def test_wrong_p_store_raises_not_corrupts(self, spark, tmpdir_store):
        hll_store_batch(_ev(spark, 0, 100), tmpdir_store, "grp", "uid", 0, p=7)
        with pytest.raises(Exception, match="different p"):
            hll_store_batch(
                _ev(spark, 100, 200), tmpdir_store, "grp", "uid", 1, p=6
            )

    def test_wrong_p_estimate_raises(self, spark):
        sk = hll_sketch(_ev(spark, 0, 100), ["grp"], "uid", p=7)
        with pytest.raises(Exception, match="different p"):
            hll_estimate(sk, p=6).collect()

    def test_reader_sees_old_snapshot_mid_swap(self, spark, tmpdir_store):
        import os

        hll_store_batch(_ev(spark, 0, 300), tmpdir_store, "grp", "uid", 0)
        expect = {
            r["grp"]: tuple(r["hll_regs"])
            for r in read_hll_store(spark, tmpdir_store, "grp").collect()
        }
        # simulate a writer crash between _commit_swap's two renames:
        # store renamed away to .__old, replacement never landed
        os.rename(tmpdir_store, tmpdir_store + ".__old")
        rows = {
            r["grp"]: tuple(r["hll_regs"])
            for r in read_hll_store(spark, tmpdir_store, "grp").collect()
        }
        assert rows == expect
