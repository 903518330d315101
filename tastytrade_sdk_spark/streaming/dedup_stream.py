"""Streaming near-duplicate filtering (incremental MinHash-LSH dedup).

A live ingest pipeline cannot re-run corpus-wide dedup per batch; the
standard incremental recipe is: keep a BAND STORE of every admitted
document's LSH band keys, and per micro-batch

1. drop incoming docs sharing any band with a DIFFERENT doc already in
   the store (cross-batch near-dups),
2. collapse the remainder within the batch via candidate pairs +
   connected components, keeping the canonical (min-id) doc per
   cluster (llmops/cluster.py),
3. admit the canonicals: upsert them into the output table and append
   their (band_id, band_hash, owner) keys to the store.

Replay safety (ST7 story, same as the keyed upsert sinks): the store
records the OWNING doc id per band, so a replayed batch's own
canonicals do not self-collide; re-admitted docs are absorbed by the
keep-last upsert on the output table. State is data, not memory: the
band store is a parquet table keyed on (band_id, band_hash) — on a
lake this is a compacted Delta table, and the per-batch probe is a
hash semi-join against it (never a full text comparison).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tastytrade_sdk_spark.llmops.cluster import connected_components
from tastytrade_sdk_spark.llmops.dedup import band_hashes, band_pairs
from tastytrade_sdk_spark.streaming.sinks import upsert_parquet_batch


def near_dup_filter_batch(
    batch_df: DataFrame,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
) -> None:
    """Process one micro-batch through the incremental dedup."""
    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return
    # ONE MinHash pass per batch: the band keys computed here drive
    # the store probe, the within-batch pair generation, AND the store
    # append — the checkpoint barrier stops the three consumers from
    # each re-running tokenize/shingle/minhash. LAZY checkpoint: the
    # first consumer (the component probe job below) materializes it
    # as part of its own job instead of paying a separate scheduled
    # round-trip per micro-batch; later consumers read the saved
    # blocks either way.
    incoming = band_hashes(batch_df, text_col, id_col, k, bands).localCheckpoint(
        eager=False
    )
    if os.path.exists(store_path):
        store = spark.read.parquet(store_path)
        hits = (
            incoming.join(store, ["band_id", "band_hash"])
            .filter(F.col(id_col) != F.col("owner"))
            .select(id_col)
            .distinct()
        )
        survivors = batch_df.join(hits, id_col, "left_anti")
    else:
        survivors = batch_df
    pairs = band_pairs(
        incoming.join(survivors.select(id_col), id_col, "left_semi"), id_col
    )
    # within-batch canonicalization needs only the NON-canonical id
    # set, which the component labels carry directly (a node is
    # non-canonical iff its label differs from its id; pairs are
    # already survivor-bounded, so the component min IS the min over
    # survivor members). The full near_dup_clusters output (sizes,
    # singleton rows, per-doc flags) would add a corpus-side distinct,
    # a canonical agg and a singleton union per micro-batch — stages
    # the hot streaming path doesn't need.
    comp = connected_components(pairs, id_col=id_col)
    noncanon = comp.filter(F.col(id_col) != F.col("component")).select(id_col)
    kept = survivors.join(noncanon, id_col, "left_anti")
    # barrier: the two admit actions below would otherwise each
    # re-execute the full MinHash/LSH/anti-join lineage (and, in a
    # real stream, re-read the micro-batch source). Lazy for the same
    # reason as `incoming`: the upsert write materializes it, the
    # band append reuses the blocks.
    kept = kept.localCheckpoint(eager=False)
    # admit: idempotent keyed upsert (replays converge) + band append;
    # band hashes come from the already-computed `incoming` via a
    # semi-join on the kept ids, never recomputed
    upsert_parquet_batch(kept, out_path, [id_col], [id_col])
    kept_bands = incoming.join(
        kept.select(id_col), id_col, "left_semi"
    ).select("band_id", "band_hash", F.col(id_col).alias("owner"))
    kept_bands.write.mode("append").parquet(store_path)


def read_band_store(
    spark, store_path: str, owner_type: str = "bigint"
) -> DataFrame:
    """Current band store contents: (band_id, band_hash, owner).

    A store that was never created (every batch so far empty, so
    near_dup_filter_batch returned before the first append) reads as
    an empty store — the state a zero-document stream is actually in —
    instead of a path-not-found AnalysisException. ``owner_type`` is
    the id column's Spark type (the writer stores the caller's id
    values as ``owner``)."""
    from tastytrade_sdk_spark.streaming.sinks import readable_store_path

    readable = readable_store_path(store_path)
    if readable is None:
        return spark.createDataFrame(
            [], f"band_id int, band_hash string, owner {owner_type}"
        )
    return spark.read.parquet(readable)


def streaming_near_dup_sink(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 16,
    bands: int = 4,
):
    """writeStream wrapper: admit only never-seen-before documents."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda df, epoch: near_dup_filter_batch(
                df, store_path, out_path, text_col, id_col, k, bands
            )
        )
    )
