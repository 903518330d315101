"""Strategy max-profit / max-loss case ladders (SURVEY §2.9).

Re-expressed from src/tastytrade/analytics/strategies/models.py:295-452
as pure Column expressions (the ladder is relational — no kernel
needed):

- credit strategies (verticals sold, irons, short straddle/strangle,
  naked options, jade lizard): max profit = max(net_credit, 0)
- debit verticals: max profit = width*mult*qty + net_credit (floor 0)
- butterflies: max profit = narrow_wing*mult*qty + net_credit
- max loss: credit verticals width*dpp - credit; debit verticals
  -credit; irons max(put_width, call_width)*dpp - credit; jade lizard
  width*dpp - credit; butterflies wider_wing*dpp - max_profit;
  unlimited-risk strategies (naked, short straddle/strangle) -> NULL
- all results floored at 0 and rounded to whole dollars
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

CREDIT_MAX_PROFIT = (
    "Bear Call Spread",
    "Bull Put Spread",
    "Iron Condor",
    "Iron Butterfly",
    "Iron Broken Fly",
    "Short Strangle",
    "Short Straddle",
    "Naked Call",
    "Naked Put",
    "Jade Lizard",
)
DEBIT_VERTICALS = ("Bull Call Spread", "Bear Put Spread")
CREDIT_VERTICALS = ("Bear Call Spread", "Bull Put Spread")
IRONS = ("Iron Condor", "Iron Butterfly", "Iron Broken Fly")
BUTTERFLIES = ("Call Butterfly", "Put Butterfly", "Broken Fly")
UNLIMITED_RISK = ("Naked Call", "Naked Put", "Short Strangle", "Short Straddle")


def _r0(c: Column) -> Column:
    # Null-preserving: Spark's greatest() SKIPS NULLs, which would turn
    # a NULL net_credit/width into 0 — the reference returns None when
    # inputs are insufficient (strategies/models.py:295-452).
    # Rounding mode is HALF_UP (Spark round), matching the DuckDB
    # oracle's round(); the reference's Decimal.quantize defaults to
    # HALF_EVEN, which differs only at exact $0.50 boundaries that the
    # double-typed inputs cannot represent exactly.
    return F.when(c.isNull(), F.lit(None)).otherwise(
        F.round(F.greatest(c, F.lit(0)), 0)
    )


def max_profit_col(
    strategy_type: Column,
    net_credit: Column,
    width: Column,
    narrow_width: Column,
    multiplier: Column,
    quantity: Column,
) -> Column:
    dpp = multiplier * quantity
    return (
        F.when(strategy_type.isin(*CREDIT_MAX_PROFIT), _r0(net_credit))
        .when(strategy_type.isin(*DEBIT_VERTICALS), _r0(width * dpp + net_credit))
        .when(strategy_type.isin(*BUTTERFLIES), _r0(narrow_width * dpp + net_credit))
        .otherwise(F.lit(None))
    )


def max_loss_col(
    strategy_type: Column,
    net_credit: Column,
    width: Column,
    put_width: Column,
    call_width: Column,
    narrow_width: Column,
    wider_wing: Column,
    multiplier: Column,
    quantity: Column,
) -> Column:
    dpp = multiplier * quantity
    fly_credit = F.coalesce(
        max_profit_col(
            strategy_type, net_credit, width, narrow_width, multiplier, quantity
        ),
        F.lit(0),
    )
    return (
        F.when(strategy_type.isin(*UNLIMITED_RISK), F.lit(None))
        .when(strategy_type.isin(*CREDIT_VERTICALS), _r0(width * dpp - net_credit))
        .when(strategy_type.isin(*DEBIT_VERTICALS), _r0(-net_credit))
        .when(
            strategy_type.isin(*IRONS),
            _r0(F.greatest(put_width, call_width) * dpp - net_credit),
        )
        .when(strategy_type == "Jade Lizard", _r0(width * dpp - net_credit))
        .when(
            strategy_type.isin(*BUTTERFLIES),
            _r0(wider_wing * dpp - fly_credit),
        )
        .otherwise(F.lit(None))
    )
