"""Streaming transformations (SURVEY ST3-ST5): watermarked candle
aggregation and latest-per-key in update mode — the streaming twins of
operators/candles.ohlcv and operators/dedup.latest_per_key.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def streaming_ohlcv(
    stream: DataFrame,
    symbol_col: str = "symbol",
    time_col: str = "time",
    price_col: str = "price",
    size_col: str | None = None,
    interval: str = "5 minutes",
    watermark: str = "10 minutes",
    order_col: str | None = None,
) -> DataFrame:
    """A8 as a watermarked tumbling-window aggregation. Late rows
    within the watermark update the open bar (ST3); beyond it they are
    dropped — the bounded-state replacement for the reference's
    unbounded keep-last frames (ST5)."""
    ord_expr: Column = F.struct(
        F.col(time_col), F.col(order_col) if order_col else F.col(time_col)
    )
    aggs = [
        F.min_by(F.col(price_col), ord_expr).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(F.col(price_col), ord_expr).alias("close"),
        F.count(F.lit(1)).alias("count"),
    ]
    if size_col:
        aggs.append(F.sum(size_col).alias("volume"))
    agg = (
        stream.withWatermark(time_col, watermark)
        .groupBy(
            F.col(symbol_col).alias("symbol"),
            F.window(F.col(time_col), interval).alias("w"),
        )
        .agg(*aggs)
    )
    return agg.select(
        "symbol", F.col("w.start").alias("time"),
        *[c for c in agg.columns if c not in ("symbol", "w")],
    )


def streaming_latest(
    stream: DataFrame,
    keys: Sequence[str],
    time_col: str,
    watermark: str = "1 hour",
) -> DataFrame:
    """D1 latest-value table in update mode: max_by over event time.
    Emits one updated row per key per micro-batch (the Redis HSET
    'latest' shape, redis.py:36-38)."""
    payload = F.struct(*[F.col(c) for c in stream.columns])
    agg = (
        stream.withWatermark(time_col, watermark)
        .groupBy(*keys)
        .agg(F.max_by(payload, F.col(time_col)).alias("__latest"))
    )
    value_cols = [c for c in stream.columns if c not in keys]
    return agg.select(*keys, *[F.col(f"__latest.{c}").alias(c) for c in value_cols])
