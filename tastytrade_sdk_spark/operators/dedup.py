"""Keyed deduplication / keep-last upsert operators (SURVEY §2.3).

Reference semantics:
- latest-per-symbol keep-last on every event
  (src/tastytrade/messaging/processors/default.py:62-68)
- candle upsert on (eventSymbol, time) keep-last, late tick updates the
  open bar (default.py:71-91)
- retention cap: keep newest N rows per key (default.py:39-40,88-91)

Spark-first notes:
- ``dropDuplicates`` keeps an *arbitrary* row, never "last" — all
  keep-last ops here rank with ``row_number`` over an explicit,
  deterministic ordering (FIXTURES.md mandates an ``arrival_seq``-style
  tiebreak column for exactly this reason).
- At scale this is one hash-partition shuffle on the key; Spark plans
  it as a single Window (sort within partition). AQE handles skewed
  hot symbols. No driver-side state.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_RN = "__rn"


def _order_desc(order_cols: Sequence[str | Column]) -> list[Column]:
    out = []
    for c in order_cols:
        col = F.col(c) if isinstance(c, str) else c
        out.append(col.desc_nulls_last())
    return out


def keep_last(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Keep the last row per key, "last" = max of ``order_by`` (D1/D2/D3).

    ``order_by`` must be a deterministic total order within each key
    group (e.g. ``["ts", "event_id"]``) — arrival order is not
    observable under distributed execution, so callers pass the
    explicit sequence column the reference's in-order processing
    implied.
    """
    w = Window.partitionBy(*keys).orderBy(*_order_desc(order_by))
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def latest_per_key(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
) -> DataFrame:
    """Latest-value table (D1/O3): alias of keep_last, named per the
    reference's Redis 'latest' HSET semantics (redis.py:36-38)."""
    return keep_last(df, keys, order_by)


def retention_cap(
    df: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    limit: int,
) -> DataFrame:
    """Keep the newest ``limit`` rows per key (O2 tail-cap semantics)."""
    w = Window.partitionBy(*keys).orderBy(*_order_desc(order_by))
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) <= limit)
        .drop(_RN)
    )


def merge_prefer_non_null(
    df: DataFrame,
    keys: Sequence[str],
    prefer_col: str,
    order_by: Sequence[str | Column] = (),
) -> DataFrame:
    """D4: among duplicate keys prefer the row whose ``prefer_col`` is
    non-null (positions.py:536-554), tiebreak on ``order_by``."""
    ordering = [F.col(prefer_col).isNull().asc()] + _order_desc(order_by)
    w = Window.partitionBy(*keys).orderBy(*ordering)
    return (
        df.withColumn(_RN, F.row_number().over(w))
        .filter(F.col(_RN) == 1)
        .drop(_RN)
    )


def cdc_apply(
    changes: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str | Column],
    op_col: str = "op",
    delete_ops: Sequence[str] = ("delete",),
) -> DataFrame:
    """Apply a change log (upserts + deletes) to produce final state:
    last change per key wins under the explicit deterministic order,
    and keys whose LAST change is a delete vanish (standard CDC MERGE
    semantics — a delete followed by a later upsert resurrects the
    key).

    Same single-shuffle keep-last plan as D2; the delete filter is a
    post-window predicate, so applying a day's change log at lake
    scale costs exactly one shuffle on the key.

    A NULL op is treated as an upsert, not silently dropped:
    ``~isin(...)`` evaluates to NULL for NULL input and a bare filter
    would discard the row — the coalesce keeps it."""
    last = keep_last(changes, keys, order_by)
    keep = ~F.col(op_col).isin(*[str(o) for o in delete_ops])
    return last.filter(F.coalesce(keep, F.lit(True)))
