from tastytrade_sdk_spark.llmops.textops import (
    h32,
    rolling_fingerprint,
    shingles_expr,
    tokens_expr,
)

__all__ = ["h32", "rolling_fingerprint", "shingles_expr", "tokens_expr"]
