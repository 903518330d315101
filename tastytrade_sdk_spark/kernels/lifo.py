"""LIFO entry-credit replay (SURVEY A5) as a grouped Arrow kernel.

Semantics re-expressed from the reference
(src/tastytrade/accounts/transactions.py:145-232):

Walk a symbol's fills newest-to-oldest against the current absolute
position quantity:
- close actions (Buy to Close / Sell to Close) accumulate into a
  close buffer;
- open actions (Sell to Open / Buy to Open) first cancel the close
  buffer (those lots were closed later, LIFO), then allocate
  ``take = min(surviving, remaining)`` of the fill to the current
  position, proportionally:
    entry_credit += value * take/qty, signed +Credit/-Debit
    fees        += |net_value - value| * take/qty
    weighted_price = sum(price*take) / sum(take)
- if the walk ends with remaining != 0 the position is not fully
  covered by history -> NULL result row (reference returns None).
- zero-quantity positions -> (0, 0, NULL).

This is an ordered stateful fold per symbol — not expressible as a
SQL aggregate — so it runs as ``groupBy(symbol).applyInPandas`` with
Decimal arithmetic (exact, matching the reference's use of Decimal).
At scale: one shuffle on symbol; each group is one position's fill
history (small by construction), so parallelism is per-symbol.
"""

from __future__ import annotations

from decimal import Decimal

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

OPEN_ACTIONS = {"Sell to Open", "Buy to Open"}
CLOSE_ACTIONS = {"Buy to Close", "Sell to Close"}

RESULT_SCHEMA = T.StructType(
    [
        T.StructField("symbol", T.StringType()),
        T.StructField("entry_credit", T.DecimalType(18, 6)),
        T.StructField("fees", T.DecimalType(18, 6)),
        T.StructField("weighted_price", T.DecimalType(18, 6)),
        T.StructField("covered", T.BooleanType()),
    ]
)


def replay_one_symbol(rows: list[dict], current_qty: int) -> dict:
    """Pure-python replay for one symbol (unit-testable without Spark).

    ``rows``: fills with keys executed_at, action, quantity, price,
    value, net_value, value_effect. Any order.
    """
    if current_qty == 0:
        return {
            "entry_credit": Decimal("0"),
            "fees": Decimal("0"),
            "weighted_price": None,
            "covered": True,
        }

    ordered = sorted(rows, key=lambda r: r["executed_at"], reverse=True)
    remaining = abs(int(current_qty))
    close_buffer = 0
    entry_credit = Decimal("0")
    fees = Decimal("0")
    price_x_qty = Decimal("0")
    taken_qty = Decimal("0")

    def _dec(v):
        # the reference replays VALIDATED models (non-null Decimals);
        # raw rows here may carry NULL/NaN — treat the field as absent
        # rather than raising Decimal("None") in the executor
        if v is None:
            return None
        try:
            d = Decimal(str(v))
        except Exception:
            return None
        return None if d.is_nan() else d

    for r in ordered:
        if remaining == 0:
            break
        rq = r["quantity"]
        if rq is None or (isinstance(rq, float) and rq != rq):
            continue  # malformed fill: no quantity, nothing to replay
        qty = int(rq)
        action = r["action"]
        if action in CLOSE_ACTIONS:
            close_buffer += qty
            continue
        if action not in OPEN_ACTIONS:
            continue
        consumed = min(qty, close_buffer)
        close_buffer -= consumed
        surviving = qty - consumed
        take = min(surviving, remaining)
        if take > 0:
            fraction = Decimal(take) / Decimal(qty)
            value = _dec(r["value"])
            net_value = _dec(r["net_value"])
            price = _dec(r["price"])
            if value is None or net_value is None or price is None:
                # a consumed open fill with missing money fields makes
                # the position's entry credit unknowable — report
                # uncovered instead of crashing the job
                return {
                    "entry_credit": None,
                    "fees": None,
                    "weighted_price": None,
                    "covered": False,
                }
            sign = Decimal(1) if r["value_effect"] == "Credit" else Decimal(-1)
            entry_credit += value * fraction * sign
            fees += abs(net_value - value) * fraction
            price_x_qty += price * take
            taken_qty += take
            remaining -= take

    if remaining != 0:
        return {
            "entry_credit": None,
            "fees": None,
            "weighted_price": None,
            "covered": False,
        }
    return {
        "entry_credit": entry_credit,
        "fees": fees,
        "weighted_price": (price_x_qty / taken_qty) if taken_qty > 0 else None,
        "covered": True,
    }


def lifo_entry_credits(
    transactions: DataFrame,
    positions: DataFrame,
    symbol_col: str = "symbol",
    qty_col: str = "quantity",
) -> DataFrame:
    """One result row per position symbol. ``positions`` carries the
    current absolute quantity per symbol; fills join in by symbol."""
    import pandas as pd

    qty_by_symbol = positions.select(
        F.col(symbol_col).alias("symbol"),
        F.col(qty_col).cast("long").alias("__current_qty"),
    )
    joined = transactions.withColumnRenamed(symbol_col, "symbol").join(
        qty_by_symbol, "symbol", "right"
    )

    six = Decimal("0.000001")

    def q6(v):
        # quantize to the result schema's scale — fractional allocation
        # yields repeating decimals Arrow cannot rescale losslessly
        return v.quantize(six) if v is not None else None

    def kernel(recs: list[dict]) -> list[dict]:
        symbol = recs[0]["symbol"]
        raw_qty = recs[0]["__current_qty"]
        if raw_qty is None or pd.isna(raw_qty):
            # NULL position quantity: the replay target is undefined —
            # emit an uncovered row instead of int(None) killing the job
            return [
                {
                    "symbol": symbol,
                    "entry_credit": None,
                    "fees": None,
                    "weighted_price": None,
                    "covered": False,
                }
            ]
        current_qty = int(raw_qty)
        fills = [r for r in recs if not pd.isna(r["executed_at"])]
        res = replay_one_symbol(fills, current_qty)
        return [
            {
                "symbol": symbol,
                "entry_credit": q6(res["entry_credit"]),
                "fees": q6(res["fees"]),
                "weighted_price": q6(res["weighted_price"]),
                "covered": res["covered"],
            }
        ]

    from tastytrade_sdk_spark.operators.grouped import grouped_apply

    return grouped_apply(joined, "symbol", kernel, RESULT_SCHEMA, records=True)
