from tastytrade_sdk_spark.streaming.signal_engine import (
    detect_signals_batch,
    detect_signals_streaming,
)

__all__ = ["detect_signals_batch", "detect_signals_streaming"]
