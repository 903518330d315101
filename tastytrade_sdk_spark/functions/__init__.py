from tastytrade_sdk_spark.functions.scalar import (
    apply_effect,
    clean_float,
    dte,
    format_candle_symbol,
    interval_to_ms,
    mid_price,
    parse_candle_symbol,
    parse_occ_symbol,
    to_et,
)

__all__ = [
    "apply_effect",
    "clean_float",
    "dte",
    "format_candle_symbol",
    "interval_to_ms",
    "mid_price",
    "parse_candle_symbol",
    "parse_occ_symbol",
    "to_et",
]
