"""Streaming sinks (SURVEY K1/K2/K4): keep-last upsert tables and
append logs via foreachBatch.

The reference dual-writes every event: append to a pub/sub log AND
upsert a latest-value snapshot (redis.py:26-38). On Spark the same
stream feeds two sinks:

- append log  -> partitioned parquet append (K1 Influx-style history)
- latest view -> keep-last MERGE per micro-batch (K2 Redis-HSET-style)

Without Delta in this container, the upsert sink does read-merge-
overwrite on a parquet dir — the exact-once story is the standard
idempotent-merge one: replayed micro-batches re-upsert the same keys
and converge (the property the reference relies on for reconnect
backfill, SURVEY ST7). On a lake deployment this becomes a Delta/
Iceberg MERGE with no code change upstream of the sink function.
"""

from __future__ import annotations

import os
import shutil
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tastytrade_sdk_spark.operators.dedup import keep_last


def upsert_parquet_batch(
    batch_df: DataFrame,
    path: str,
    keys: Sequence[str],
    order_by: Sequence[str],
) -> None:
    """Merge one micro-batch into a keep-last parquet table.

    Executor-side write to a sibling tmp dir, then directory swap —
    never routes the table through the driver (a collect() here would
    cap the keyed table at driver memory, a scale-killer at 100x) and
    never reads+overwrites the same path in one job. A crash between
    the two swap renames is recovered on the next call (the backup dir
    is restored BEFORE it could be deleted), so replayed micro-batches
    still converge (ST7). Concurrent readers can observe a brief
    path-missing gap between the renames; use
    streaming/manifest_store.versioned_upsert_batch when readers need
    snapshot isolation. On a lake deployment this whole dance becomes
    a Delta/Iceberg MERGE.
    """
    spark = batch_df.sparkSession
    tmp, old = path + ".__tmp", path + ".__old"
    # crash recovery FIRST: a previous run that died between its two
    # renames left the full table under `old` and no `path` — restore
    # it before anything can delete the only copy
    if not os.path.exists(path) and os.path.exists(old):
        os.rename(old, path)
    for d in (tmp, old):
        if os.path.exists(d):
            shutil.rmtree(d)
    new = keep_last(batch_df, keys, order_by)
    if os.path.exists(path):
        existing = spark.read.parquet(path)
        merged = keep_last(existing.unionByName(new), keys, order_by)
    else:
        merged = new
    merged.write.mode("overwrite").parquet(tmp)
    if os.path.exists(path):
        os.rename(path, old)
    os.rename(tmp, path)
    if os.path.exists(old):
        shutil.rmtree(old)


def latest_table_sink(
    stream: DataFrame,
    path: str,
    keys: Sequence[str],
    order_by: Sequence[str],
    checkpoint: str,
):
    """K2 latest-value table: update-on-key per micro-batch."""
    return (
        stream.writeStream.outputMode("update")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda df, epoch: upsert_parquet_batch(df, path, keys, order_by)
        )
    )


def append_log_sink(
    stream: DataFrame,
    path: str,
    checkpoint: str,
    partition_by: Sequence[str] = (),
):
    """K1 append history sink (Influx-style measurement table)."""
    w = (
        stream.writeStream.outputMode("append")
        .format("parquet")
        .option("path", path)
        .option("checkpointLocation", checkpoint)
    )
    if partition_by:
        w = w.partitionBy(*partition_by)
    return w
