from tastytrade_sdk_spark.operators.asof import asof_join
from tastytrade_sdk_spark.operators.candles import ohlcv
from tastytrade_sdk_spark.operators.dedup import keep_last, latest_per_key, retention_cap
from tastytrade_sdk_spark.operators.gapfill import forward_fill, gap_fill
from tastytrade_sdk_spark.operators.indicators import ema, hull, macd, wma

__all__ = [
    "asof_join",
    "ema",
    "forward_fill",
    "gap_fill",
    "hull",
    "keep_last",
    "latest_per_key",
    "macd",
    "ohlcv",
    "retention_cap",
    "wma",
]
