"""Gap detection + forward fill (SURVEY W6) and prior-valid lookup (W7).

Reference semantics (src/tastytrade/utils/time_series.py:72-96,152-179):
build the complete calendar ``date_range(min(t), max(t), interval)``
per symbol, find missing buckets, forward-fill the last observed row's
values into them.

Spark-first: the calendar scaffold is ``sequence(min, max, interval)``
+ ``explode`` computed from a per-key min/max aggregate — no driver
loop, no UDF. The fill is ``last(col, ignoreNulls=True)`` over an
unbounded-preceding window: one shuffle on the key, linear scan.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def forward_fill(
    df: DataFrame,
    value_cols: Sequence[str],
    partition_by: Sequence[str],
    order_by: Sequence[str],
) -> DataFrame:
    """last-non-null carry-forward per key."""
    w = (
        Window.partitionBy(*partition_by)
        .orderBy(*order_by)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = df
    for c in value_cols:
        out = out.withColumn(c, F.last(c, ignorenulls=True).over(w))
    return out


def calendar_scaffold(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    interval: str,
) -> DataFrame:
    """Complete per-key time grid from min(t) to max(t) step interval."""
    bounds = df.groupBy(*key_cols).agg(
        F.min(time_col).alias("__min_t"), F.max(time_col).alias("__max_t")
    )
    return bounds.select(
        *key_cols,
        F.explode(
            F.sequence(F.col("__min_t"), F.col("__max_t"), F.expr(f"interval {interval}"))
        ).alias(time_col),
    )


def find_gaps(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    interval: str,
) -> DataFrame:
    """Missing buckets = calendar anti-join existing times (SO3)."""
    cal = calendar_scaffold(df, key_cols, time_col, interval)
    return cal.join(
        df.select(*key_cols, time_col).distinct(),
        on=[*key_cols, time_col],
        how="left_anti",
    )


def gap_fill(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    interval: str,
    value_cols: Sequence[str],
    synthetic_flag: str | None = "is_synthetic",
    only_synthetic: bool = False,
) -> DataFrame:
    """Fill missing buckets with forward-filled values (W6).

    Returns the dense series; with ``only_synthetic`` emit only the
    manufactured rows (the reference writes only fills back to the
    store, time_series.py:163-179).
    """
    cal = calendar_scaffold(df, key_cols, time_col, interval)
    # flag synthetics by JOIN MEMBERSHIP, not value nullness: a real
    # bucket whose first value column happens to be NULL must not be
    # treated as manufactured (the reference fills only missing
    # buckets, time_series.py:152-179). FULL outer, not left: a real
    # row whose timestamp is not aligned to the min(t)-anchored grid
    # (odd first timestamp, DST-shifted bucket) must stay in the
    # output — a left join FROM the scaffold would silently drop it
    # (the USING-join coalesces the key columns for both sides).
    dense = cal.join(
        df.withColumn("__real", F.lit(True)), on=[*key_cols, time_col], how="full"
    )
    dense = dense.withColumn("__synth", F.col("__real").isNull()).drop("__real")
    filled = forward_fill(dense, value_cols, key_cols, [time_col])
    if synthetic_flag:
        filled = filled.withColumn(synthetic_flag, F.col("__synth"))
    filled = filled.drop("__synth")
    if only_synthetic and synthetic_flag:
        filled = filled.filter(F.col(synthetic_flag))
    return filled


def prior_valid_value(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    value_col: str,
    before: Column,
    max_lookback_days: int = 7,
) -> DataFrame:
    """W7: last non-null value strictly before ``before`` within a
    bounded walk-back (weekend/holiday tolerant, market.py:187-235)."""
    lower = F.date_sub(before.cast("date"), max_lookback_days)
    scoped = df.filter(
        (F.col(time_col) < before) & (F.col(time_col) >= lower)
    )
    w = Window.partitionBy(*key_cols).orderBy(
        F.col(time_col).desc()
    )
    return (
        scoped.filter(F.col(value_col).isNotNull())
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def interpolate_linear(
    df: DataFrame,
    key_cols: Sequence[str],
    time_col: str,
    interval: str,
    value_cols: Sequence[str],
) -> DataFrame:
    """Linear interpolation onto the complete per-key time grid (the
    numeric sibling of gap_fill's forward fill — the resampling a
    feature pipeline applies to sparse sensor/price series before
    fixed-step models).

    Synthetic buckets get
    ``prev + (next - prev) * (t - t_prev) / (t_next - t_prev)``;
    real observations pass through untouched — including rows whose
    timestamps are NOT aligned to the min(t)-anchored grid (FULL
    outer join against the scaffold, the same guard gap_fill
    documents: a left join from the calendar would silently drop an
    odd-first-timestamp / DST-shifted observation AND exclude its
    value from its neighbors' interpolation). Grid points before the
    first / after the last observation fall back to the one-sided
    neighbor. Plan: scaffold + full join, then per value column TWO
    window passes (last/first ignorenulls with their epoch stamps) —
    one shuffle on the key, linear scan, no UDF. Timestamps are
    stamped as EXACT microsecond doubles (unix_micros < 2^53 is
    exactly representable, so the neighbor-delta subtraction is
    exact), giving sub-second grids correct weights — epoch SECONDS
    doubles lose ~2.4e-7 s to cancellation, 1e-6 relative error on a
    200 ms delta.
    Output: key, time, interpolated value columns, is_synthetic."""
    cal = calendar_scaffold(df, key_cols, time_col, interval)
    marked = cal.join(
        df.withColumn("__real", F.lit(True)),
        on=[*key_cols, time_col],
        how="full",
    )
    # a real row whose values are ALL NULL is still a real bucket
    marked = marked.withColumn(
        "is_synthetic", F.col("__real").isNull()
    ).drop("__real")
    ep = F.unix_micros(F.col(time_col)).cast("double")
    wb = (
        Window.partitionBy(*key_cols)
        .orderBy(time_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    # "next" neighbors come from last() over a DESCENDING
    # unbounded-preceding frame, NOT first() over
    # [currentRow, unboundedFollowing]: Spark's
    # UnboundedFollowingWindowFunctionFrame recomputes the aggregate
    # from scratch per row — O(n^2) per key partition, measured 6.5s
    # vs ~1s on a 1M-row grid. The descending frame is incremental.
    wf = (
        Window.partitionBy(*key_cols)
        .orderBy(F.col(time_col).desc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    out = marked
    for c in value_cols:
        stamped = F.when(F.col(c).isNotNull(), ep)
        prev_v = F.last(c, ignorenulls=True).over(wb)
        prev_t = F.last(stamped, ignorenulls=True).over(wb)
        next_v = F.last(c, ignorenulls=True).over(wf)
        next_t = F.last(stamped, ignorenulls=True).over(wf)
        interp = F.when(F.col(c).isNotNull(), F.col(c)).otherwise(
            F.when(
                prev_v.isNotNull() & next_v.isNotNull(),
                prev_v
                + (next_v - prev_v) * (ep - prev_t) / (next_t - prev_t),
            ).otherwise(F.coalesce(prev_v, next_v))
        )
        out = out.withColumn(c, interp)
    return out.select(*key_cols, time_col, *value_cols, "is_synthetic")
