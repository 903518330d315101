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


def test_band_store_survives_checkpoint_restart(spark, tmp_path):
    """ST7 for the band store: hard-stop the query, restart a NEW
    query on the same checkpoint — the store and output keep
    suppressing cross-batch near-dups, and the final state equals an
    uninterrupted run over the same file sequence."""
    import shutil

    from tastytrade_sdk_spark.streaming.dedup_stream import (
        streaming_near_dup_sink,
    )

    src = str(tmp_path / "src")
    batches = [
        [(1, LONG_A), (2, LONG_A), (3, LONG_B)],
        [(4, LONG_A), (5, LONG_B + " extra novel suffix words")],
        [
            (6, LONG_B),
            (7, LONG_A + " tiny tail"),
            (
                8,
                "entirely fresh subject matter concerning suffix arrays "
                "and longest common prefixes computed over sharded logs",
            ),
        ],
    ]

    def run(tag, restart_after_first):
        store = str(tmp_path / f"bands_{tag}")
        out = str(tmp_path / f"kept_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        srcdir = str(tmp_path / f"src_{tag}")

        def start():
            stream = (
                spark.readStream.schema("doc_id int, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(srcdir)
            )
            return streaming_near_dup_sink(stream, store, out, ckpt).start()

        _docs(spark, batches[0]).coalesce(1).write.mode("append").parquet(srcdir)
        q = start()
        q.processAllAvailable()
        if restart_after_first:
            q.stop()  # hard stop == crash/redeploy
            for b in batches[1:]:
                _docs(spark, b).coalesce(1).write.mode("append").parquet(srcdir)
            q = start()  # NEW query, SAME checkpoint
        else:
            for b in batches[1:]:
                _docs(spark, b).coalesce(1).write.mode("append").parquet(srcdir)
        q.processAllAvailable()
        q.stop()
        kept = _out_ids(spark, out)
        bands = {
            (r["band_id"], r["band_hash"], r["owner"])
            for r in spark.read.parquet(store).collect()
        }
        return kept, bands

    kept_r, bands_r = run("restart", True)
    kept_s, bands_s = run("straight", False)
    # 4 and 7 (near-dup tail variant) suppressed by the store ACROSS
    # the restart; 6 suppressed by batch-1 content; novel 8 admitted;
    # canonical set and band store identical to the unbroken run
    assert kept_r == kept_s == {1, 3, 5, 8}
    assert bands_r == bands_s


def test_distributed_fallback_equals_fast_path(spark, tmp_path):
    """small_graph_edges=0 forces every batch onto the distributed
    flow; the final store and output must equal the bounded-probe
    driver fast path exactly (the adaptive split changes stage count,
    never semantics)."""
    batches = [
        [(1, LONG_A), (2, LONG_A), (3, LONG_B)],
        [(4, LONG_A), (5, LONG_B + " extra novel suffix words")],
        [(4, LONG_A), (5, LONG_B + " extra novel suffix words")],  # replay
    ]

    def run(tag, bound):
        store = str(tmp_path / f"bands_{tag}")
        out = str(tmp_path / f"kept_{tag}")
        for rows in batches:
            near_dup_filter_batch(
                _docs(spark, rows), store, out, small_graph_edges=bound
            )
        bands = {
            (r["band_id"], r["band_hash"], r["owner"])
            for r in spark.read.parquet(store).collect()
        }
        return _out_ids(spark, out), bands

    kept_fast, bands_fast = run("fast", 1_000_000)
    kept_dist, bands_dist = run("dist", 0)
    assert kept_fast == kept_dist == {1, 3, 5}
    assert bands_fast == bands_dist


def test_never_written_band_store_reads_empty(spark, tmp_path):
    """All-empty replay: a band store no batch ever wrote reads as an
    empty store, not a path error."""
    from tastytrade_sdk_spark.streaming.dedup_stream import read_band_store

    store = str(tmp_path / "never_written")
    near_dup_filter_batch(
        _docs(spark, []), store, str(tmp_path / "out")
    )
    got = read_band_store(spark, store, owner_type="int")
    assert got.collect() == []
    assert [f.name for f in got.schema.fields] == [
        "band_id", "band_hash", "owner",
    ]
