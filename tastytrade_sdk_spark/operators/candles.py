"""OHLCV candle construction (A8) — tumbling-window aggregation.

Reference contract: CandleEvent(open=first, high=max, low=min,
close=last, volume=sum, vwap=sum(p*v)/sum(v)) per (symbol, interval
bucket) (src/tastytrade/messaging/models/events.py:148-207; interval
flooring messages.py:189-203).

Spark-first: first/last are resolved with ``min_by``/``max_by`` over a
deterministic ordering key — a single hash aggregation (map-side
partial agg + one shuffle), no window sort. This survives 100 TB:
the aggregation state per group is O(1), there is no per-group row
materialization, and Catalyst pushes the column pruning to the scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def candle_agg_exprs(
    time_col: str,
    price_col: str,
    size_col: str | None = None,
    order_col: str | None = None,
) -> list[Column]:
    """The OHLCV aggregate expression list, shared by the batch and
    streaming candle builders so the two schemas cannot drift (every
    expression is streaming-legal: min_by/max_by/min/max/sum/count)."""
    ord_expr: Column = F.struct(
        F.col(time_col), F.col(order_col) if order_col else F.col(time_col)
    )
    aggs = [
        F.min_by(F.col(price_col), ord_expr).alias("open"),
        F.max(price_col).alias("high"),
        F.min(price_col).alias("low"),
        F.max_by(F.col(price_col), ord_expr).alias("close"),
    ]
    if size_col is not None:
        aggs += [
            F.sum(size_col).alias("volume"),
            # try_divide: a bucket whose size-sum is 0 (possible when a
            # synthetic stream reuses a signed value column as size)
            # yields NULL vwap instead of an ANSI DIVIDE_BY_ZERO that
            # kills the whole (streaming) query
            F.try_divide(
                F.sum(F.col(price_col) * F.col(size_col)), F.sum(size_col)
            ).alias("vwap"),
        ]
    aggs.append(F.count(F.lit(1)).alias("count"))
    return aggs


def ohlcv(
    df: DataFrame,
    symbol_col: str = "eventSymbol",
    time_col: str = "time",
    price_col: str = "price",
    size_col: str | None = "size",
    interval: str = "1 hour",
    order_col: str | None = None,
) -> DataFrame:
    """Aggregate a trade stream into OHLCV candles.

    ``order_col`` breaks first/last ties deterministically (defaults to
    the time column itself; pass a sequence id when trades can share a
    timestamp).
    """
    bucket = F.window(F.col(time_col), interval)
    aggs = candle_agg_exprs(time_col, price_col, size_col, order_col)
    out = df.groupBy(F.col(symbol_col).alias("symbol"), bucket.alias("w")).agg(*aggs)
    return out.select(
        "symbol",
        F.col("w.start").alias("time"),
        *[c for c in out.columns if c not in ("symbol", "w")],
    )
