"""Algorithmic kernels: LIFO entry-credit replay + strategy classifier.

Golden-value scenarios mirror the reference test strategy
(unit_tests/accounts/test_transactions.py factories,
unit_tests/analytics/strategies/test_patterns.py)."""

import datetime as dt
from decimal import Decimal

import pytest

from tastytrade_sdk_spark.kernels.classifier import (
    Leg,
    classify_group,
    classify_strategies,
)
from tastytrade_sdk_spark.kernels.lifo import lifo_entry_credits, replay_one_symbol

T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def txn(minutes, action, qty, price, value, effect, fees=Decimal("0.5")):
    value = Decimal(str(value))
    net = value - fees if effect == "Credit" else value + fees
    return {
        "executed_at": T0 + dt.timedelta(minutes=minutes),
        "action": action,
        "quantity": Decimal(qty),
        "price": Decimal(str(price)),
        "value": value,
        "net_value": net,
        "value_effect": effect,
    }


class TestLifoReplay:
    def test_simple_open(self):
        res = replay_one_symbol([txn(0, "Sell to Open", 2, "1.50", "300", "Credit")], 2)
        assert res["entry_credit"] == Decimal("300")
        assert res["fees"] == Decimal("0.5")
        assert res["weighted_price"] == Decimal("1.50")
        assert res["covered"]

    def test_partial_close_then_reopen(self):
        # open 3, close 2, open 2 -> current 3: LIFO takes the newest
        # open (2) plus 1 surviving from the oldest open (3-2 closed)
        rows = [
            txn(0, "Sell to Open", 3, "1.00", "300", "Credit"),
            txn(10, "Buy to Close", 2, "0.90", "180", "Debit"),
            txn(20, "Sell to Open", 2, "1.20", "240", "Credit"),
        ]
        res = replay_one_symbol(rows, 3)
        # newest open: full 240; old open: 1/3 of 300 = 100
        assert res["entry_credit"] == Decimal("340")
        # fees: 0.5 (full) + 0.5 * (1/3) — fraction computed first, as
        # the reference does (transactions.py:205-211)
        assert res["fees"] == Decimal("0.5") + Decimal("0.5") * (Decimal(1) / Decimal(3))
        # weighted: (1.20*2 + 1.00*1)/3
        assert res["weighted_price"] == (
            Decimal("1.20") * 2 + Decimal("1.00")
        ) / 3

    def test_close_buffer_cancels_newest_opens(self):
        # open 2 (old), open 2 (new), close 2 -> current 2.
        # The close (newest-first walk sees it first) cancels the NEW
        # open entirely; position comes from the old open.
        rows = [
            txn(0, "Sell to Open", 2, "1.00", "200", "Credit"),
            txn(10, "Sell to Open", 2, "2.00", "400", "Credit"),
            txn(20, "Buy to Close", 2, "1.50", "300", "Debit"),
        ]
        res = replay_one_symbol(rows, 2)
        assert res["entry_credit"] == Decimal("200")
        assert res["weighted_price"] == Decimal("1.00")

    def test_fractional_allocation(self):
        # single open of 4, position only 3 -> 3/4 of value
        res = replay_one_symbol([txn(0, "Buy to Open", 4, "2.00", "800", "Debit")], 3)
        assert res["entry_credit"] == Decimal("-600")  # debit -> negative
        assert res["weighted_price"] == Decimal("2.00")

    def test_under_covered_returns_null(self):
        res = replay_one_symbol([txn(0, "Sell to Open", 1, "1.00", "100", "Credit")], 5)
        assert not res["covered"]
        assert res["entry_credit"] is None

    def test_zero_position(self):
        res = replay_one_symbol([], 0)
        assert res["entry_credit"] == Decimal("0")
        assert res["weighted_price"] is None

    def test_spark_kernel(self, spark):
        txns = spark.createDataFrame(
            [
                ("OPT_A", T0, "Sell to Open", Decimal("2"), Decimal("1.5"),
                 Decimal("300"), Decimal("299.5"), "Credit"),
                ("OPT_B", T0, "Sell to Open", Decimal("1"), Decimal("1.0"),
                 Decimal("100"), Decimal("99.5"), "Credit"),
            ],
            "symbol string, executed_at timestamp, action string, quantity decimal(18,6), "
            "price decimal(18,6), value decimal(18,6), net_value decimal(18,6), value_effect string",
        )
        pos = spark.createDataFrame(
            [("OPT_A", 2.0), ("OPT_B", 5.0), ("OPT_C", 0.0)],
            "symbol string, quantity double",
        )
        out = {r["symbol"]: r for r in lifo_entry_credits(txns, pos).collect()}
        assert out["OPT_A"]["entry_credit"] == Decimal("300")
        assert out["OPT_A"]["covered"]
        assert not out["OPT_B"]["covered"]  # under-covered
        assert out["OPT_C"]["entry_credit"] == Decimal("0")


def opt(sym, qty, ot, strike, exp_days=30, und="SPY"):
    return Leg(
        symbol=sym, underlying=und, instrument_type="Equity Option",
        signed_quantity=qty, option_type=ot,
        strike=Decimal(strike), expiration=dt.date(2024, 3, 1) + dt.timedelta(days=exp_days),
    )


def stock(sym="SPY", qty=100.0, und="SPY"):
    return Leg(symbol=sym, underlying=und, instrument_type="Equity",
               signed_quantity=qty)


class TestClassifier:
    def classify_types(self, legs):
        return [name for name, _ in classify_group(legs)]

    def test_iron_condor(self):
        legs = [
            opt("p1", 1, "P", "90"), opt("p2", -1, "P", "95"),
            opt("c1", -1, "C", "105"), opt("c2", 1, "C", "110"),
        ]
        assert self.classify_types(legs) == ["Iron Condor"]

    def test_iron_butterfly_vs_bwb(self):
        fly = [
            opt("p1", 1, "P", "90"), opt("p2", -1, "P", "100"),
            opt("c1", -1, "C", "100"), opt("c2", 1, "C", "110"),
        ]
        assert self.classify_types(fly) == ["Iron Butterfly"]
        bwb = [
            opt("p1", 1, "P", "85"), opt("p2", -1, "P", "100"),
            opt("c1", -1, "C", "100"), opt("c2", 1, "C", "110"),
        ]
        assert self.classify_types(bwb) == ["Iron Broken Fly"]

    def test_call_butterfly_121(self):
        legs = [opt("a", 1, "C", "95"), opt("b", -2, "C", "100"), opt("c", 1, "C", "105")]
        assert self.classify_types(legs) == ["Call Butterfly"]

    def test_broken_wing_fly(self):
        legs = [opt("a", 1, "P", "85"), opt("b", -2, "P", "95"), opt("c", 1, "P", "100")]
        assert self.classify_types(legs) == ["Broken Fly"]

    def test_jade_lizard_both_variants(self):
        a = [opt("sp", -1, "P", "95"), opt("sc", -1, "C", "105"), opt("lc", 1, "C", "110")]
        assert self.classify_types(a) == ["Jade Lizard"]
        b = [opt("sc", -1, "C", "105"), opt("sp", -1, "P", "95"), opt("lp", 1, "P", "90")]
        assert self.classify_types(b) == ["Jade Lizard"]

    def test_big_lizard(self):
        legs = [opt("sc", -1, "C", "100"), opt("sp", -1, "P", "100"), opt("lc", 1, "C", "105")]
        assert self.classify_types(legs) == ["Big Lizard"]

    def test_covered_call_and_collar(self):
        cc = [stock(), opt("sc", -1, "C", "110")]
        assert self.classify_types(cc) == ["Covered Call"]
        collar = [stock(), opt("lp", 1, "P", "90"), opt("sc", -1, "C", "110")]
        assert self.classify_types(collar) == ["Collar"]

    def test_verticals(self):
        assert self.classify_types([opt("a", 1, "C", "100"), opt("b", -1, "C", "105")]) == ["Bull Call Spread"]
        assert self.classify_types([opt("a", -1, "C", "100"), opt("b", 1, "C", "105")]) == ["Bear Call Spread"]
        assert self.classify_types([opt("a", 1, "P", "100"), opt("b", -1, "P", "105")]) == ["Bear Put Spread"]
        assert self.classify_types([opt("a", -1, "P", "100"), opt("b", 1, "P", "105")]) == ["Bull Put Spread"]

    def test_ratio_straddle_strangle_synthetic(self):
        assert self.classify_types([opt("a", 1, "C", "100"), opt("b", -2, "C", "105")]) == ["Ratio Spread"]
        assert self.classify_types([opt("a", 1, "C", "100"), opt("b", 1, "P", "100")]) == ["Long Straddle"]
        assert self.classify_types([opt("a", -1, "C", "105"), opt("b", -1, "P", "95")]) == ["Short Strangle"]
        assert self.classify_types([opt("a", 1, "C", "100"), opt("b", -1, "P", "100")]) == ["Synthetic Long"]

    def test_calendar_diagonal(self):
        assert self.classify_types(
            [opt("a", 1, "C", "100", exp_days=30), opt("b", -1, "C", "100", exp_days=60)]
        ) == ["Calendar Spread"]
        assert self.classify_types(
            [opt("a", 1, "C", "100", exp_days=30), opt("b", -1, "C", "105", exp_days=60)]
        ) == ["Diagonal Spread"]

    def test_greedy_consumption_leftovers(self):
        # iron condor + extra naked put -> condor consumed first, leftover single
        legs = [
            opt("p1", 1, "P", "90"), opt("p2", -1, "P", "95"),
            opt("c1", -1, "C", "105"), opt("c2", 1, "C", "110"),
            opt("x", -1, "P", "80", exp_days=60),
        ]
        got = self.classify_types(legs)
        assert got == ["Iron Condor", "Naked Put"]

    def test_single_legs(self):
        assert self.classify_types([stock(qty=-50)]) == ["Short Stock"]
        assert self.classify_types([opt("a", 1, "C", "100")]) == ["Long Call"]
        assert self.classify_types([opt("a", -1, "P", "100")]) == ["Naked Put"]

    def test_spark_kernel_multi_underlying(self, spark):
        rows = [
            # SPY iron condor
            ("p1", "SPY", "Equity Option", 1.0, "P", 90.0, dt.date(2024, 3, 31)),
            ("p2", "SPY", "Equity Option", -1.0, "P", 95.0, dt.date(2024, 3, 31)),
            ("c1", "SPY", "Equity Option", -1.0, "C", 105.0, dt.date(2024, 3, 31)),
            ("c2", "SPY", "Equity Option", 1.0, "C", 110.0, dt.date(2024, 3, 31)),
            # QQQ covered call
            ("QQQ", "QQQ", "Equity", 100.0, None, None, None),
            ("qc", "QQQ", "Equity Option", -1.0, "C", 400.0, dt.date(2024, 3, 31)),
        ]
        df = spark.createDataFrame(
            rows,
            "symbol string, underlying string, instrument_type string, "
            "signed_quantity double, option_type string, strike double, expiration date",
        )
        out = classify_strategies(df).collect()
        by_und = {(r["underlying"], r["strategy_type"]) for r in out}
        assert ("SPY", "Iron Condor") in by_und
        assert ("QQQ", "Covered Call") in by_und
        assert len(out) == 2


def test_straddle_not_shadowed_by_earlier_strangle_pair():
    """Reference runs independent scans per pattern family
    (patterns.py match_straddle/match_strangle): a strangle pair
    earlier in combination order must not stop a straddle pair later
    in the leg list from classifying."""
    import datetime as dt
    from decimal import Decimal

    from tastytrade_sdk_spark.kernels.classifier import Leg, classify_group

    e = dt.date(2024, 3, 15)

    def leg(sym, ot, strike, qty):
        return Leg(
            symbol=sym, underlying="XYZ", instrument_type="Equity Option",
            signed_quantity=qty, option_type=ot,
            strike=Decimal(strike), expiration=e,
        )

    legs = [
        leg("C100", "C", "100", 1.0),
        leg("P90", "P", "90", 1.0),
        leg("C105", "C", "105", 1.0),
        leg("P105", "P", "105", 1.0),
    ]
    names = sorted(name for name, _ in classify_group(legs))
    assert names == ["Long Straddle", "Long Strangle"]
