"""Incremental streaming near-dup filter: cross-batch suppression,
within-batch canonicalization, replay convergence (ST7)."""

import pytest

from tastytrade_sdk_spark.streaming.dedup_stream import near_dup_filter_batch

LONG_A = (
    "the quick brown fox jumps over the lazy dog while the rain in "
    "spain stays mainly in the plain and every good boy deserves fudge"
)
LONG_B = (
    "completely unrelated text about distributed query engines and "
    "columnar storage formats with vectorized execution pipelines here"
)


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, text string")


def _out_ids(spark, out):
    import os

    if not os.path.exists(out):
        return set()
    return {r["doc_id"] for r in spark.read.parquet(out).collect()}


def test_incremental_near_dup_filter(spark, tmp_path):
    store = str(tmp_path / "bands")
    out = str(tmp_path / "kept")

    # batch 1: 1 and 2 are exact dups -> canonical 1 kept; 3 distinct
    near_dup_filter_batch(
        _docs(spark, [(1, LONG_A), (2, LONG_A), (3, LONG_B)]), store, out
    )
    assert _out_ids(spark, out) == {1, 3}

    # batch 2: 4 duplicates batch-1 content -> suppressed by the store;
    # 5 is new -> admitted
    near_dup_filter_batch(
        _docs(spark, [(4, LONG_A), (5, LONG_B + " extra novel suffix words")]),
        store,
        out,
    )
    assert _out_ids(spark, out) == {1, 3, 5}

    # replay batch 2 (failure recovery): output converges, own bands
    # in the store do not self-suppress the replayed canonical
    near_dup_filter_batch(
        _docs(spark, [(4, LONG_A), (5, LONG_B + " extra novel suffix words")]),
        store,
        out,
    )
    assert _out_ids(spark, out) == {1, 3, 5}


def test_streaming_near_dup_sink_runs(spark, tmp_path):
    from tastytrade_sdk_spark.streaming.dedup_stream import (
        streaming_near_dup_sink,
    )

    src = str(tmp_path / "src")
    _docs(spark, [(1, LONG_A), (2, LONG_A), (3, LONG_B)]).write.parquet(src)
    stream = spark.readStream.schema("doc_id int, text string").parquet(src)
    q = streaming_near_dup_sink(
        stream,
        str(tmp_path / "bands"),
        str(tmp_path / "kept"),
        str(tmp_path / "ckpt"),
    ).start()
    try:
        q.processAllAvailable()
    finally:
        q.stop()
    assert _out_ids(spark, str(tmp_path / "kept")) == {1, 3}
