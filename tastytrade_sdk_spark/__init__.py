"""tastytrade_sdk_spark — a PySpark-native analytics engine.

A from-scratch re-expression of the query and data-processing
capabilities of the reference market-data pipeline
(xmandeng/tastytrade_sdk) on Apache Spark:

- typed event ingestion with boundary validation (SURVEY §1.2),
- keyed latest-value / keep-last upsert tables (SURVEY §2.3),
- time-series windowed analytics: WMA / Hull MA / seeded EMA / MACD,
  gap-fill + forward-fill, as-of joins (SURVEY §2.6, J5),
- dimensional joins + grouped aggregations (SURVEY §2.4, §2.5),
- algorithmic kernels: LIFO entry-credit replay, combinatorial
  strategy classification, stateful signal detection (SURVEY §2.10,
  A5, ST1),
- batch/streaming symmetry via Structured Streaming (SURVEY §2.11),
- large-scale training-data-pipeline operators: dedup (exact /
  MinHash-LSH / SimHash / n-gram Jaccard), similarity search, text
  analysis, multimodal column plumbing.

Everything is expressed DataFrame-first so Catalyst handles pushdown,
pruning, join strategy and codegen; Python UDFs are confined to the
three algorithmic kernels (Arrow-batched applyInPandas).
"""

from tastytrade_sdk_spark.session import get_spark

__all__ = ["get_spark"]
__version__ = "0.1.0"
