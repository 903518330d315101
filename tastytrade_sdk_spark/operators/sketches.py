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

__all__ = ["kmv_distinct", "cms_build", "cms_probe", "histogram_quantiles"]

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


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Single-pass approximate quantiles from a fixed-width histogram.

    The exact path (sort / percentile agg) shuffles every value; this
    shuffles at most n_bins rows per group no matter the data volume —
    the classic fixed-memory quantile sketch, with deterministic
    integer bucket math so the same construction is SQL-replayable.

    Values are clamped into [lo, hi); each quantile q reports the LOWER
    EDGE of the first bucket whose cumulative count reaches
    ceil(q * n): resolution (hi-lo)/n_bins, zero float accumulation.
    Returns (group_cols..., q, hq_value, hq_rank, hq_n).
    """
    width = (hi - lo) / n_bins
    bucket = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bucket.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    gw = Window.partitionBy(*group_cols).orderBy("__b")
    cum = hist.withColumn("__cum", F.sum("__c").over(gw)).withColumn(
        "__n", F.sum("__c").over(Window.partitionBy(*group_cols))
    )
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    # rank = ceil(q * n): the 1-indexed order statistic the quantile needs
    joined = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "__rank", F.ceil(F.col("q") * F.col("__n")).cast("long")
    )
    # first bucket whose cumulative count covers the rank
    hit = joined.filter(
        (F.col("__cum") >= F.col("__rank"))
        & (F.col("__cum") - F.col("__c") < F.col("__rank"))
    )
    return hit.select(
        *group_cols,
        "q",
        F.round(F.lit(lo) + F.col("__b") * F.lit(width), 6).alias("hq_value"),
        F.col("__rank").alias("hq_rank"),
        F.col("__n").alias("hq_n"),
    )
