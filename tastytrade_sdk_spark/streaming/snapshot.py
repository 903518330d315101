"""Snapshot completion detection + gated gap-fill (SURVEY ST2).

Reference semantics (src/tastytrade/messaging/processors/snapshot.py:
22-159, subscription/orchestrator.py:308-413): candle backfill arrives
as a snapshot; eventFlags bits SNAPSHOT_END (0x08) / SNAPSHOT_SNIP
(0x10) mark per-symbol completion, which gates the gap-fill pass for
exactly that symbol.

Spark form: a flag-filtered projection finds completed symbols in each
micro-batch; a foreachBatch hook runs the batch gap-fill operator for
just-completed symbols and appends the synthetic rows to the candle
store. Idempotent: a replayed micro-batch re-detects the same symbols
and the keep-last upsert absorbs the duplicate fills (ST7 property).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from tastytrade_sdk_spark.operators.gapfill import gap_fill

SNAPSHOT_BEGIN = 0x04
SNAPSHOT_END = 0x08
SNAPSHOT_SNIP = 0x10


def completed_symbols(
    batch: DataFrame,
    symbol_col: str = "symbol",
    flags_col: str = "eventFlags",
) -> DataFrame:
    """Symbols whose snapshot finished in this batch (END or SNIP bit).
    (snapshot.py:22-27: completion := flags & (END|SNIP) != 0)."""
    mask = SNAPSHOT_END | SNAPSHOT_SNIP
    return (
        batch.filter(F.col(flags_col).bitwiseAND(F.lit(mask)) > 0)
        .select(symbol_col)
        .distinct()
    )


def gated_gap_fill(
    batch: DataFrame,
    history: DataFrame,
    symbol_col: str = "symbol",
    flags_col: str = "eventFlags",
    time_col: str = "time",
    interval: str = "1 hour",
    value_cols: Sequence[str] = ("close",),
) -> DataFrame:
    """Run gap-fill ONLY for symbols completed in this batch; returns
    the synthetic rows to upsert into the candle store (the reference
    writes only the fills back, time_series.py:163-179)."""
    done = completed_symbols(batch, symbol_col, flags_col)
    scoped = history.join(F.broadcast(done), symbol_col, "inner")
    return gap_fill(
        scoped,
        key_cols=[symbol_col],
        time_col=time_col,
        interval=interval,
        value_cols=list(value_cols),
        synthetic_flag="is_synthetic",
        only_synthetic=True,
    )
