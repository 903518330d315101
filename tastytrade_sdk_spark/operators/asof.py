"""Backward as-of join (SURVEY J5 — the core custom join).

Reference semantics (src/tastytrade/backtest/publisher.py:48-55,112-128):
for each left row (signal at time t), attach the most recent right row
(pricing candle) with time <= t and a non-null value, per key.

Spark-first implementation — the **union-tag trick**:

1. tag right rows, union them with left rows on (key, time),
2. one window sort per key: ``last(right_payload, ignorenulls=True)``
   over rows unbounded-preceding,
3. keep only left rows and unpack the payload struct.

Why this scales: a naive range join explodes to O(|L|x|R|) per key;
`merge_asof`-style applyInPandas needs the whole key group in one
task. The union-tag plan is ONE shuffle + per-partition sort,
O((|L|+|R|) log) — the same shape Spark uses for any window function,
so it survives 100 TB with AQE handling skewed keys.

Rows with null payload values are skipped by ``ignorenulls`` — this
reproduces the reference's "walk back over null closes" loop
(publisher.py:117-124) for free.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_SIDE = "__asof_side"
_PAYLOAD = "__asof_payload"
_TIEBREAK = "__asof_tiebreak"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_time: str,
    right_time: str,
    value_cols: Sequence[str],
    tolerance: Column | None = None,
    allow_exact_match: bool = True,
    right_order: str | None = None,
    suffix: str = "",
    direction: str = "backward",
) -> DataFrame:
    """As-of join: for each left row, the latest right row with
    right_time <= left_time (``direction="backward"``, default) or the
    EARLIEST right row with right_time >= left_time
    (``direction="forward"`` — next-quote/next-fill semantics);
    strict inequality when allow_exact_match=False.

    value_cols are appended to left (optionally suffixed). Right rows
    whose value_cols are ALL null never match (null-skipping walk).
    ``right_order`` breaks ties among right rows at the same timestamp
    (e.g. an arrival-sequence column) — LAST wins backward (the most
    recent arrival is the live quote), FIRST wins forward (the
    earliest arrival is the next event).

    Forward is the same union-tag + running last(ignorenulls) plan
    traversed in DESCENDING time — the side-ordering trick (exact-
    match rights sort before left rows at equal time, strict ones
    after) carries over unchanged, so both directions share one
    single-shuffle implementation.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    fwd = direction == "forward"
    keys = list(on)
    if not value_cols:
        raise ValueError(
            "asof_join requires at least one value column: with none to "
            "carry over there is nothing to join (and the all-null "
            "payload guard would be vacuous)"
        )
    out_names = [c + suffix for c in value_cols]

    payload = F.struct(
        F.col(right_time).alias("__t"),
        *[F.col(c).alias(c) for c in value_cols],
    )
    # Null out the payload when every value column is null so
    # ignorenulls walks past it.
    all_null = None
    for c in value_cols:
        cond = F.col(c).isNull()
        all_null = cond if all_null is None else (all_null & cond)
    payload = F.when(~all_null, payload).otherwise(F.lit(None))

    r = right.select(
        *keys,
        F.col(right_time).alias("__time"),
        (F.col(right_order) if right_order else F.lit(0)).alias(_TIEBREAK),
        payload.alias(_PAYLOAD),
        F.lit(1).alias(_SIDE) if allow_exact_match else F.lit(3).alias(_SIDE),
    )
    left_cols = [c for c in left.columns]
    l = left.select(
        *left_cols,
        F.col(left_time).alias("__time"),
        F.lit(0).alias(_TIEBREAK),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
        F.lit(2).alias(_SIDE),
    )
    # Align schemas: right side lacks left's columns.
    for c in left_cols:
        if c not in r.columns:
            r = r.withColumn(c, F.lit(None).cast(dict(left.dtypes)[c]))
    r = r.select(*l.columns)

    unioned = l.unionByName(r)
    # Order: time asc, then side (right-with-exact-match sorts before
    # left at equal time => inclusive; side=3 sorts after => exclusive),
    # then right tiebreak so the LAST right row at a timestamp wins.
    w = (
        Window.partitionBy(*keys)
        .orderBy(
            F.col("__time").desc() if fwd else F.col("__time").asc(),
            F.col(_SIDE).asc(),
            # forward: the FIRST right arrival at a timestamp must win,
            # and the winner is whatever the running last() sees LAST —
            # so the tiebreak flips with the traversal order
            F.col(_TIEBREAK).desc() if fwd else F.col(_TIEBREAK).asc(),
        )
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    )
    out = filled.filter(F.col(_SIDE) == 2)
    if tolerance is not None:
        in_tol = (
            F.col(f"{_PAYLOAD}.__t") <= (F.col("__time") + tolerance)
            if fwd
            else F.col(f"{_PAYLOAD}.__t") >= (F.col("__time") - tolerance)
        )
        out = out.withColumn(
            _PAYLOAD, F.when(in_tol, F.col(_PAYLOAD)).otherwise(F.lit(None))
        )
    for c, name in zip(value_cols, out_names):
        out = out.withColumn(name, F.col(f"{_PAYLOAD}.{c}"))
    return out.select(*left_cols, *out_names)
