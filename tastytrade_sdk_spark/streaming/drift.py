"""Streaming drift detection: CUSUM control charts over a keyed
metric stream.

The batch form (cusum_alerts, plans/queries.py) folds the whole
series; this is the deployment form — per-key O(1) state (the two
clamped sums) carried across micro-batches with
``applyInPandasWithState``, emitting one scored row per event. The
baseline mean rides the stream as a column (``mu_col``): control
charts monitor against a FIXED baseline established offline, so the
caller broadcasts/joins it upstream — the operator never recomputes
it (recomputing μ from the monitored window is how drift hides).

Streaming == batch is exact, not toleranced: the register update is
the identical float expression order as the batch fold
(streaming/incremental.IncrementalCUSUM mirrors it, and the
equals-batch test asserts equality).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

CUSUM_OUT_SCHEMA = (
    "key string, ts timestamp, value double, "
    "cusum_hi double, cusum_lo double, alert boolean"
)
_CUSUM_STATE_SCHEMA = "s_hi double, s_lo double"


def cusum_batch(
    df: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    mu_col: str,
    k: float = 0.5,
    h: float = 5.0,
    order_cols: Sequence[str] | None = None,
) -> DataFrame:
    """Batch twin: the clamped prefix fold per key (the cusum_alerts
    recipe, parameterized by a baseline column)."""
    from pyspark.sql import Window

    order = list(order_cols) if order_cols else [time_col]
    w = (
        Window.partitionBy(key_col)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    arr = F.collect_list(F.struct(F.col(value_col), F.col(mu_col))).over(w)

    def fold(sign: float):
        return F.aggregate(
            arr,
            F.lit(0.0),
            lambda acc, s: F.greatest(
                F.lit(0.0),
                acc
                + F.lit(sign) * (s[value_col] - s[mu_col]) - F.lit(k),
            ),
        )

    s_hi, s_lo = fold(1.0), fold(-1.0)
    return df.select(
        F.col(key_col).alias("key"),
        F.col(time_col).alias("ts"),
        F.col(value_col).alias("value"),
        s_hi.alias("cusum_hi"),
        s_lo.alias("cusum_lo"),
        ((s_hi > h) | (s_lo > h)).alias("alert"),
    )


def streaming_cusum(
    stream: DataFrame,
    key_col: str,
    time_col: str,
    value_col: str,
    mu_col: str,
    k: float = 0.5,
    h: float = 5.0,
) -> DataFrame:
    """Streaming CUSUM: per-key (s_hi, s_lo) registers across
    micro-batches; one output row per event with the running sums and
    the alert flag. Rows are processed in event-time order within each
    micro-batch (concat-then-sort, the signal-engine pattern); the
    cross-batch contract is the replay harness's: batches arrive in
    event-time order (a backfill/replay property, not a watermark)."""
    import pandas as pd
    from pyspark.sql.streaming.state import GroupStateTimeout

    def func(key, pdf_iter, group_state):
        if group_state.exists:
            s_hi, s_lo = group_state.get
        else:
            s_hi, s_lo = 0.0, 0.0
        chunks = list(pdf_iter)
        pdf = (
            pd.concat(chunks, ignore_index=True)
            if len(chunks) > 1
            else (chunks[0] if chunks else None)
        )
        rows = []
        if pdf is not None and len(pdf):
            pdf = pdf.sort_values(time_col, kind="mergesort")
            for t, x, mu in zip(
                pdf[time_col], pdf[value_col].astype(float),
                pdf[mu_col].astype(float),
            ):
                # EXACT batch-fold op order: acc + sign*(x - mu) - k
                s_hi = max(0.0, s_hi + 1.0 * (x - mu) - k)
                s_lo = max(0.0, s_lo + -1.0 * (x - mu) - k)
                rows.append(
                    {
                        "key": key[0],
                        "ts": t,
                        "value": x,
                        "cusum_hi": s_hi,
                        "cusum_lo": s_lo,
                        "alert": bool(s_hi > h or s_lo > h),
                    }
                )
        group_state.update((s_hi, s_lo))
        cols = ["key", "ts", "value", "cusum_hi", "cusum_lo", "alert"]
        yield pd.DataFrame(rows, columns=cols)

    return stream.groupBy(key_col).applyInPandasWithState(
        func,
        outputStructType=CUSUM_OUT_SCHEMA,
        stateStructType=_CUSUM_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
