from tastytrade_sdk_spark.kernels.classifier import classify_strategies
from tastytrade_sdk_spark.kernels.lifo import lifo_entry_credits

__all__ = ["classify_strategies", "lifo_entry_credits"]
