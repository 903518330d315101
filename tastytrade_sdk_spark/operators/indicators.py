"""Windowed technical indicators (SURVEY §2.6 W1-W4).

Semantics re-expressed from the reference implementation
(src/tastytrade/analytics/indicators/momentum.py):

- **padded WMA** (momentum.py:10-40): weights 1..period over the
  trailing ``period`` rows; for row i with i+1 < period the window is
  left-padded with ``pad_value`` (ThinkOrSwim-style seeding with a
  prior-session value).
- **Hull MA** (momentum.py:43-98):
  ``HMA = WMA(2*WMA(p, round(n/2)) - WMA(p, n), round(sqrt(n)))``;
  color "Up" iff HMA > lag(HMA) else "Down" (first row "Down");
  pad_value defaults to the first price in the series.
- **seeded EMA** (momentum.py:101-113): ``alpha=2/(n+1)``,
  ``out[0]=alpha*x0+(1-alpha)*seed``, recurrence forward.
- **MACD** (momentum.py:116-193): fast/slow EMA seeded with the prior
  session close (fallback: first non-null close), signal EMA of the
  value line seeded with 0.0, histogram ``diff=value-avg`` with a
  4-shade color ladder against lag(diff).

Execution strategy (Spark-first):

- WMA / Hull are **pure Column expressions**: a trailing-rows window
  ``collect_list`` + array HOFs (``transform``/``aggregate``). They
  stay JVM-side in whole-stage codegen and need exactly one shuffle
  (hash partition by symbol, sort by time) that all chained window
  specs reuse — Hull's three WMAs plan as one Window node chain with a
  single Exchange.
- EMA / MACD are linear **recurrences** — not expressible as a frame
  aggregate without O(n^2) prefix re-scan. They run as Arrow-batched
  ``applyInPandas`` per symbol using pandas' C-implemented
  ``ewm(adjust=False)``, which computes the identical recurrence.
  Per-key series fit comfortably in a task (the reference itself caps
  candle buffers at 500-100k rows per symbol); at 100 TB the
  partitioning key (symbol) gives embarrassing parallelism.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def _cols(names: Sequence[str | Column]) -> list[Column]:
    return [F.col(c) if isinstance(c, str) else c for c in names]


def wma_col(
    value: Column,
    period: int,
    pad: Column,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
) -> Column:
    """Padded WMA as a single Column expression (W1).

    ``value`` must be non-null within the partition (the reference
    computes over dense candle closes; filter/gap-fill first).
    """
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(-(period - 1), 0)
    )
    arr = F.collect_list(value).over(w)
    padded = F.concat(
        F.array_repeat(pad, F.lit(period) - F.size(arr)), arr
    )
    weight_sum = float(period * (period + 1) / 2)
    weighted = F.aggregate(
        F.zip_with(
            padded,
            F.sequence(F.lit(1), F.lit(period)).cast("array<double>"),
            lambda x, wt: x * wt,
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    return weighted / F.lit(weight_sum)


def wma(
    df: DataFrame,
    value_col: str,
    period: int,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    pad_col: Column | None = None,
    out_col: str = "wma",
) -> DataFrame:
    """Padded weighted moving average; pad defaults to the first value
    of the partition (momentum.py:71-72 behavior)."""
    pad = pad_col if pad_col is not None else first_in_partition(
        F.col(value_col), partition_by, order_by
    )
    return df.withColumn(
        out_col, wma_col(F.col(value_col), period, pad, partition_by, order_by)
    )


def first_in_partition(
    value: Column, partition_by: Sequence[str | Column], order_by: Sequence[str | Column]
) -> Column:
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return F.first(value, ignorenulls=True).over(w)


def hull(
    df: DataFrame,
    price_col: str = "close",
    length: int = 20,
    partition_by: Sequence[str] = ("symbol",),
    order_by: Sequence[str] = ("time",),
    pad_col: Column | None = None,
    out_col: str = "HMA",
    color_col: str = "HMA_color",
) -> DataFrame:
    """Hull Moving Average with direction color (W2)."""
    half_length = int(round(length / 2))
    sqrt_length = int(round(math.sqrt(length)))
    pad = pad_col if pad_col is not None else first_in_partition(
        F.col(price_col), partition_by, order_by
    )

    price = F.col(price_col)
    wma_half = wma_col(price, half_length, pad, partition_by, order_by)
    wma_full = wma_col(price, length, pad, partition_by, order_by)
    mid = df.withColumn("__hull_diff", 2 * wma_half - wma_full)

    hma = wma_col(F.col("__hull_diff"), sqrt_length, pad, partition_by, order_by)
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    out = mid.withColumn(out_col, hma).drop("__hull_diff")
    prev = F.lag(F.col(out_col)).over(w)
    # NaN/None comparison is false => first row colors "Down", matching
    # np.where(hma > hma_prev, "Up", "Down") with hma_prev[0]=NaN.
    color = F.when(F.col(out_col) > prev, F.lit("Up")).otherwise(F.lit("Down"))
    return out.withColumn(color_col, color)


# ---------------------------------------------------------------------------
# EMA / MACD — recurrence kernels (Arrow-batched applyInPandas)
# ---------------------------------------------------------------------------


def _ema_seeded_np(values, length: int, seed: float):
    """Seeded EMA recurrence via pandas ewm (C kernel).

    Prepending the seed and running ``ewm(alpha, adjust=False)`` yields
    out[0] = alpha*x0 + (1-alpha)*seed — identical to momentum.py:101-113.
    """
    import numpy as np
    import pandas as pd

    alpha = 2.0 / (length + 1.0)
    if len(values) == 0:
        return np.array([], dtype=float)
    s = pd.Series(np.concatenate(([seed], np.asarray(values, dtype=float))))
    out = s.ewm(alpha=alpha, adjust=False).mean().to_numpy()
    return out[1:]


def ema(
    df: DataFrame,
    value_col: str,
    length: int,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    seed_col: str | None = None,
    out_col: str = "ema",
) -> DataFrame:
    """Seeded EMA per key (W3). ``seed_col`` names a per-group-constant
    column (e.g. prior-session close); default seed = first value."""
    import pandas as pd
    from pyspark.sql import types as T

    # copy — StructType.add mutates in place, df.schema is cached
    out_schema = T.StructType(list(df.schema.fields)).add(out_col, "double")
    keys = list(partition_by)
    order = list(order_by)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        vals = pdf[value_col].to_numpy(dtype=float)
        if seed_col is not None and pdf[seed_col].notna().any():
            seed = float(pdf[seed_col].dropna().iloc[0])
        else:
            seed = float(vals[0]) if len(vals) else 0.0
        pdf[out_col] = _ema_seeded_np(vals, length, seed)
        return pdf

    return df.groupBy(*keys).applyInPandas(kernel, schema=out_schema)


def macd(
    df: DataFrame,
    price_col: str = "close",
    partition_by: Sequence[str] = ("symbol",),
    order_by: Sequence[str] = ("time",),
    fast_length: int = 12,
    slow_length: int = 26,
    macd_length: int = 9,
    prior_close_col: str | None = None,
) -> DataFrame:
    """MACD with seeded EMAs + 4-shade histogram color (W4).

    Adds columns ``Value`` (fast-slow), ``avg`` (signal), ``diff``
    (histogram) and ``diff_color`` per momentum.py:116-193.
    """
    import numpy as np
    import pandas as pd
    from pyspark.sql import types as T

    out_schema = (
        T.StructType(list(df.schema.fields))
        .add("Value", "double")
        .add("avg", "double")
        .add("diff", "double")
        .add("diff_color", "string")
    )
    keys = list(partition_by)
    order = list(order_by)

    def kernel(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order, kind="mergesort").reset_index(drop=True)
        close = pdf[price_col].to_numpy(dtype=float)
        if prior_close_col is not None and pdf[prior_close_col].notna().any():
            prior_close = float(pdf[prior_close_col].dropna().iloc[0])
        else:
            non_null = pdf[price_col].dropna()
            if non_null.empty:
                raise ValueError("MACD: no non-null close values")
            prior_close = float(non_null.iloc[0])

        ema_fast = _ema_seeded_np(close, fast_length, prior_close)
        ema_slow = _ema_seeded_np(close, slow_length, prior_close)
        value = ema_fast - ema_slow
        avg = _ema_seeded_np(value, macd_length, 0.0)
        diff = value - avg

        prev = np.concatenate(([np.nan], diff[:-1]))
        colors = np.where(
            diff > 0,
            np.where(np.isnan(prev) | (diff > prev), "#04FE00", "#006401"),
            np.where(np.isnan(prev) | (diff < prev), "#FE0000", "#7E0100"),
        )
        pdf["Value"] = value
        pdf["avg"] = avg
        pdf["diff"] = diff
        pdf["diff_color"] = colors
        return pdf

    return df.groupBy(*keys).applyInPandas(kernel, schema=out_schema)


# ---------------------------------------------------------------------------
# Expression-form EMA / MACD (pure JVM) for BOUNDED series
# ---------------------------------------------------------------------------


def ema_expr_col(
    value: Column,
    length: int,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
    seed: Column | None = None,
) -> Column:
    """Seeded EMA as a Column: fold the prefix array with the exact
    recurrence acc*(1-a) + x*a (identical op order to the pandas
    kernel and DuckDB's list_reduce — bit-identical results).

    O(n^2) per key via prefix collect_list — the right trade for
    BOUNDED series (candle buffers, daily rollups: n <= a few hundred)
    because it stays in whole-stage codegen with zero Python workers.
    For unbounded series use ``ema`` (the Arrow kernel, O(n))."""
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = F.collect_list(value).over(w)
    seed_c = seed if seed is not None else F.first(value, ignorenulls=True).over(w)
    alpha = 2.0 / (length + 1.0)
    return F.aggregate(
        arr,
        seed_c.cast("double"),
        lambda acc, x: acc * F.lit(1.0 - alpha) + x * F.lit(alpha),
    )


def rsi(
    df: DataFrame,
    price_col: str,
    n: int,
    partition_by: Sequence[str],
    order_by: Sequence[str],
    out_col: str = "rsi",
) -> DataFrame:
    """Wilder RSI(n) (bounded-series expression path, beyond-reference
    indicator — the reference ships only Hull/MACD).

    Wilder's smoothing (alpha = 1/n) IS an EMA of length 2n-1, so the
    gain/loss averages reuse ``ema_expr_col``'s exact fold (seed 0.0 —
    the first row's delta is defined 0). Gains/losses materialize in a
    first projection (a window expression can't nest inside the fold's
    collect_list), the two folds share one window chain. Deterministic
    edge contract: avg_gain = avg_loss = 0 → RSI 50 (neutral);
    avg_loss = 0 → 100. The equality tests are exact because both
    engines run the identical recurrence."""
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    value = F.col(price_col)
    prev = F.coalesce(F.lag(value).over(w), value)
    staged = df.withColumn(
        "__gain", F.greatest(value - prev, F.lit(0.0))
    ).withColumn("__loss", F.greatest(prev - value, F.lit(0.0)))
    ag = ema_expr_col(
        F.col("__gain"), 2 * n - 1, partition_by, order_by, seed=F.lit(0.0)
    )
    al = ema_expr_col(
        F.col("__loss"), 2 * n - 1, partition_by, order_by, seed=F.lit(0.0)
    )
    out = (
        F.when((ag == 0) & (al == 0), F.lit(50.0))
        .when(al == 0, F.lit(100.0))
        .otherwise(F.lit(100.0) - F.lit(100.0) / (F.lit(1.0) + ag / al))
    )
    return staged.withColumn(out_col, out).drop("__gain", "__loss")


def macd_expr(
    df: DataFrame,
    price_col: str = "close",
    partition_by: Sequence[str] = ("symbol",),
    order_by: Sequence[str] = ("time",),
    fast_length: int = 12,
    slow_length: int = 26,
    macd_length: int = 9,
    prior_close_col: str | None = None,
) -> DataFrame:
    """MACD in pure Column expressions (bounded-series fast path).
    Adds Value/avg/diff; no diff_color (compose with a when-ladder if
    needed). Plans as one Window chain — single shuffle, no Python."""
    seed = (
        F.first(F.col(prior_close_col), ignorenulls=True).over(
            Window.partitionBy(*_cols(partition_by))
            .orderBy(*_cols(order_by))
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        if prior_close_col
        else None
    )
    fast = ema_expr_col(F.col(price_col), fast_length, partition_by, order_by, seed)
    slow = ema_expr_col(F.col(price_col), slow_length, partition_by, order_by, seed)
    out = df.withColumn("Value", fast - slow)
    avg = ema_expr_col(
        F.col("Value"), macd_length, partition_by, order_by, seed=F.lit(0.0)
    )
    return out.withColumn("avg", avg).withColumn("diff", F.col("Value") - F.col("avg"))


def true_range_col(
    high: Column,
    low: Column,
    close: Column,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
) -> Column:
    """Wilder true range: max(H-L, |H-prevC|, |L-prevC|). First row
    (no prior close) degrades to H-L by contract. All three candidates
    are differences of grid-valued doubles read from the same parquet,
    so both engines compute bit-identical TR — the precondition for
    the exact-equality ATR gate."""
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    pc = F.lag(close).over(w)
    return F.when(pc.isNull(), high - low).otherwise(
        F.greatest(high - low, F.abs(high - pc), F.abs(low - pc))
    )


def atr_col(
    tr: Column,
    n: int,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
) -> Column:
    """Wilder ATR(n) over a materialized true-range column: the
    recurrence ATR_t = ATR_{t-1}*(n-1)/n + TR_t/n with ATR_1 = TR_1
    IS a seeded EMA of length 2n-1 (alpha = 1/n) seeded with the
    first TR — so it reuses ``ema_expr_col``'s exact fold and both
    engines replay the identical recurrence (beyond-reference
    indicator widening; the reference ships Hull/MACD only,
    src/tastytrade/analytics/visualizations/momentum.py)."""
    w = (
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    seed = F.first(tr, ignorenulls=True).over(w)
    return ema_expr_col(tr, 2 * n - 1, partition_by, order_by, seed=seed)


def obv_col(
    close: Column,
    volume: Column,
    partition_by: Sequence[str | Column],
    order_by: Sequence[str | Column],
) -> Column:
    """On-balance volume: running sum of sign(close - prev_close) *
    volume (first row contributes 0 by contract — no prior close).
    With integer volumes the output is an exact BIGINT running sum —
    one window shuffle, no float anywhere."""
    w = Window.partitionBy(*_cols(partition_by)).orderBy(*_cols(order_by))
    pc = F.lag(close).over(w)
    signed = (
        F.when(pc.isNull() | (close == pc), F.lit(0).cast("long"))
        .when(close > pc, volume.cast("long"))
        .otherwise(-volume.cast("long"))
    )
    return F.sum(signed).over(
        Window.partitionBy(*_cols(partition_by))
        .orderBy(*_cols(order_by))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
