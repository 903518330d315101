"""Deterministic cardinality / frequency sketches as pure expressions.

Spark ships approx_count_distinct (HLL++) and count_min_sketch, but
their register layouts are engine-private — results can't be
cross-checked against another engine, merged with sketches built
elsewhere, or reproduced run-to-run across versions. These two
operators rebuild the textbook sketches from an explicit md5-based
hash so the SAME sketch is computable (and hash-verified) in DuckDB:

- **KMV (k-minimum-values)** distinct-count: keep the k smallest
  distinct normalized hashes per group; estimate = (k-1)/h_(k).
  One shuffle on (group, hash) for the distinct, one tiny top-k.
  Sketch size is O(k) per group regardless of data volume, and two
  KMV sketches union by merging their k-min sets — the property that
  makes per-partition partials and cross-day rollups work at 100 TB.
- **Count-min sketch** frequency table: d independent hash rows x w
  counters; est(key) = min_r counter[r, h_r(key)]. The sketch build is
  a groupBy over (row, col) — d*w cells TOTAL, independent of key
  cardinality — and the heavy-hitter probe is an equi-join of candidate
  keys against those cells. At lake scale the sketch is a broadcast
  table; the full key list never shuffles.

The 60-bit md5 prefix hash is the same construction the dedup/split
operators use (llmops/textops.h32): uniform, stable across engines,
and wide enough that collision probability at any realistic group size
is negligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = ["kmv_distinct", "cms_build", "cms_probe"]

_H60_DEN = float(1 << 60)


def _h60(c: Column) -> Column:
    """Uniform 60-bit integer hash of a column's string form."""
    return F.conv(F.substring(F.md5(c.cast("string")), 1, 15), 16, 10).cast("long")


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Returns (group_cols..., kmv_seen, kmv_estimate): if fewer than k
    distinct hashes exist the count is exact; otherwise the classic
    unbiased estimator (k-1) / normalized k-th minimum. The estimate is
    rounded to 4dp — far above IEEE division noise, far below sketch
    error (~1/sqrt(k) ≈ 12% at k=64).
    """
    h = _h60(F.col(value_col)).alias("__h")
    distinct = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h"))
    topk = distinct.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("kmv_seen"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
                F.lit(float(k - 1)) / (F.max("__h").cast("double") / F.lit(_H60_DEN))
            ),
            4,
        ).alias("kmv_estimate"),
    )


def _cms_col(key: Column, row: Column, width: int) -> Column:
    """Row-seeded counter index: md5('<row>:<key>') mod width."""
    digest = F.md5(F.concat_ws(":", row.cast("string"), key.cast("string")))
    return F.pmod(
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long"), F.lit(width)
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build the (cms_row, cms_col, cms_count) counter table.

    Each input row increments one counter per hash row: explode the
    depth indices (constant fan-out), then a single groupBy over at
    most depth*width cells — map-side partials make the shuffle tiny.
    """
    r = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cms_row")
    cells = df.select(F.col(key_col).alias("__k"), r).select(
        "cms_row", _cms_col(F.col("__k"), F.col("cms_row"), width).alias("cms_col")
    )
    return cells.groupBy("cms_row", "cms_col").agg(
        F.count(F.lit(1)).alias("cms_count")
    )


def cms_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Estimate each candidate key's frequency: min over its d counters.

    ``keys`` is typically small (distinct candidates); the sketch is
    d*w rows and broadcast-joins against it. Returns
    (key_col, cms_estimate) — an over-estimate only (CMS guarantee).
    """
    r = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cms_row")
    probe = keys.select(F.col(key_col), r).withColumn(
        "cms_col", _cms_col(F.col(key_col), F.col("cms_row"), width)
    )
    joined = probe.join(F.broadcast(sketch), ["cms_row", "cms_col"], "left").fillna(
        {"cms_count": 0}
    )
    return joined.groupBy(key_col).agg(F.min("cms_count").alias("cms_estimate"))
