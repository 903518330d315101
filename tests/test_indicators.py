"""Indicator parity tests — golden values from an independent NumPy
re-derivation of the reference semantics
(src/tastytrade/analytics/indicators/momentum.py)."""

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.operators.indicators import ema, hull, macd, wma


def ref_padded_wma(values, period, pad_value):
    weights = np.arange(1, period + 1)
    out = np.empty(len(values))
    for i in range(len(values)):
        if i + 1 < period:
            window = np.concatenate(
                (np.full(period - (i + 1), pad_value), values[: i + 1])
            )
        else:
            window = values[i - period + 1 : i + 1]
        out[i] = np.dot(window, weights) / weights.sum()
    return out


def ref_ema_seeded(values, length, seed):
    alpha = 2.0 / (length + 1.0)
    out = np.zeros(len(values))
    if len(values) == 0:
        return out
    out[0] = alpha * values[0] + (1 - alpha) * seed
    for i in range(1, len(values)):
        out[i] = alpha * values[i] + (1 - alpha) * out[i - 1]
    return out


PRICES = [100.0, 101.5, 99.75, 102.25, 103.0, 101.0, 104.5, 105.25, 103.75, 106.0]


@pytest.fixture(scope="module")
def price_df(spark):
    rows = [("SPX", i, float(p)) for i, p in enumerate(PRICES)]
    return spark.createDataFrame(rows, "symbol string, t int, close double")


def test_padded_wma_matches_reference(price_df):
    out = (
        wma(price_df, "close", 4, ["symbol"], ["t"], out_col="wma")
        .orderBy("t")
        .collect()
    )
    expected = ref_padded_wma(np.array(PRICES), 4, PRICES[0])
    got = [r["wma"] for r in out]
    assert got == pytest.approx(list(expected), abs=1e-9)


def test_wma_custom_pad(price_df):
    out = (
        wma(price_df, "close", 3, ["symbol"], ["t"], pad_col=F.lit(50.0))
        .orderBy("t")
        .collect()
    )
    expected = ref_padded_wma(np.array(PRICES), 3, 50.0)
    assert [r["wma"] for r in out] == pytest.approx(list(expected), abs=1e-9)


def test_hull_matches_reference(price_df):
    length = 4
    out = (
        hull(price_df, "close", length, ["symbol"], ["t"]).orderBy("t").collect()
    )
    vals = np.array(PRICES)
    pad = PRICES[0]
    half = int(round(length / 2))
    sq = int(round(math.sqrt(length)))
    diff = 2 * ref_padded_wma(vals, half, pad) - ref_padded_wma(vals, length, pad)
    expected = ref_padded_wma(diff, sq, pad)
    got = [r["HMA"] for r in out]
    assert got == pytest.approx(list(expected), abs=1e-9)
    prev = np.concatenate(([np.nan], expected[:-1]))
    exp_color = np.where(expected > prev, "Up", "Down")
    assert [r["HMA_color"] for r in out] == list(exp_color)


def test_hull_multi_symbol_independent(spark):
    rows = [("A", i, float(100 + i)) for i in range(8)] + [
        ("B", i, float(200 - 3 * i)) for i in range(8)
    ]
    df = spark.createDataFrame(rows, "symbol string, t int, close double")
    out = hull(df, "close", 4, ["symbol"], ["t"]).orderBy("symbol", "t").collect()
    a = [r["HMA"] for r in out if r["symbol"] == "A"]
    b = [r["HMA"] for r in out if r["symbol"] == "B"]
    va = np.array([100.0 + i for i in range(8)])
    vb = np.array([200.0 - 3 * i for i in range(8)])
    ea = ref_padded_wma(2 * ref_padded_wma(va, 2, 100.0) - ref_padded_wma(va, 4, 100.0), 2, 100.0)
    eb = ref_padded_wma(2 * ref_padded_wma(vb, 2, 200.0) - ref_padded_wma(vb, 4, 200.0), 2, 200.0)
    assert a == pytest.approx(list(ea), abs=1e-9)
    assert b == pytest.approx(list(eb), abs=1e-9)


def test_ema_seeded_matches_reference(price_df):
    out = (
        ema(price_df, "close", 5, ["symbol"], ["t"], out_col="ema")
        .orderBy("t")
        .collect()
    )
    expected = ref_ema_seeded(np.array(PRICES), 5, PRICES[0])
    assert [r["ema"] for r in out] == pytest.approx(list(expected), abs=1e-12)


def test_ema_with_seed_column(spark):
    rows = [("SPX", i, float(p), 98.5) for i, p in enumerate(PRICES)]
    df = spark.createDataFrame(rows, "symbol string, t int, close double, prior double")
    out = (
        ema(df, "close", 5, ["symbol"], ["t"], seed_col="prior", out_col="ema")
        .orderBy("t")
        .collect()
    )
    expected = ref_ema_seeded(np.array(PRICES), 5, 98.5)
    assert [r["ema"] for r in out] == pytest.approx(list(expected), abs=1e-12)


def test_macd_matches_reference(price_df):
    out = macd(
        price_df, "close", ["symbol"], ["t"], fast_length=3, slow_length=6, macd_length=2
    ).orderBy("t").collect()
    vals = np.array(PRICES)
    prior = PRICES[0]
    value = ref_ema_seeded(vals, 3, prior) - ref_ema_seeded(vals, 6, prior)
    avg = ref_ema_seeded(value, 2, 0.0)
    diff = value - avg
    assert [r["Value"] for r in out] == pytest.approx(list(value), abs=1e-12)
    assert [r["avg"] for r in out] == pytest.approx(list(avg), abs=1e-12)
    assert [r["diff"] for r in out] == pytest.approx(list(diff), abs=1e-12)
    # 4-shade color ladder (momentum.py:165-183)
    got_colors = [r["diff_color"] for r in out]
    exp = []
    for i, d in enumerate(diff):
        if i == 0:
            exp.append("#04FE00" if d > 0 else "#FE0000")
        elif d > 0:
            exp.append("#04FE00" if d > diff[i - 1] else "#006401")
        else:
            exp.append("#FE0000" if d < diff[i - 1] else "#7E0100")
    assert got_colors == exp


class TestRSI:
    def test_wilder_rsi_known_series(self, spark):
        """RSI on a hand-checkable series: monotone-up => 100 (loss
        stays 0), flat => 50 (both averages 0), and a mixed series
        matches a pure-Python replay of the identical recurrence."""
        from pyspark.sql import functions as F

        from tastytrade_sdk_spark.operators.indicators import rsi

        vals = [100.0, 102.0, 101.0, 105.0, 104.0, 104.0, 108.0]
        rows = (
            [("up", i, 100.0 + i) for i in range(5)]
            + [("flat", i, 50.0) for i in range(4)]
            + [("mix", i, v) for i, v in enumerate(vals)]
        )
        df = spark.createDataFrame(rows, "k string, i int, v double")
        out = rsi(df, "v", 14, ["k"], ["i"])
        got = {
            (r["k"], r["i"]): r["rsi"] for r in out.collect()
        }
        assert all(got[("up", i)] == 100.0 for i in range(1, 5))
        assert all(got[("flat", i)] == 50.0 for i in range(4))
        # python replay: wilder alpha = 1/14 == EMA(27) seeded 0.0
        a = 2.0 / 28.0
        ag = al = 0.0
        prev = vals[0]
        for i, v in enumerate(vals):
            g, l = max(v - prev, 0.0), max(prev - v, 0.0)
            ag = ag * (1 - a) + g * a
            al = al * (1 - a) + l * a
            prev = v
            want = (
                50.0 if ag == al == 0.0
                else 100.0 if al == 0.0
                else 100.0 - 100.0 / (1.0 + ag / al)
            )
            assert got[("mix", i)] == want


class TestATRandOBV:
    def test_atr_python_replay(self, spark):
        """ATR(3) on a hand-built OHLC series equals a pure-Python
        replay of the identical Wilder recurrence (alpha=1/3, seed =
        first TR); first-row TR degrades to high-low."""
        from tastytrade_sdk_spark.operators.indicators import (
            atr_col,
            true_range_col,
        )

        rows = [
            ("k", 0, 10.0, 8.0, 9.0),
            ("k", 1, 11.0, 9.5, 10.5),
            ("k", 2, 10.8, 9.0, 9.2),
            ("k", 3, 13.0, 9.1, 12.9),
        ]
        df = spark.createDataFrame(rows, "k string, i int, h double, l double, c double")
        staged = df.withColumn(
            "tr", true_range_col(F.col("h"), F.col("l"), F.col("c"), ["k"], ["i"])
        )
        out = staged.withColumn("atr", atr_col(F.col("tr"), 3, ["k"], ["i"]))
        got = {r["i"]: (r["tr"], r["atr"]) for r in out.collect()}
        # python replay
        trs, prev_c = [], None
        for _, _, h, l, c in rows:
            tr = (h - l) if prev_c is None else max(h - l, abs(h - prev_c), abs(l - prev_c))
            trs.append(tr)
            prev_c = c
        a = 2.0 / 6.0  # length 2n-1=5 -> alpha 2/6 == 1/3
        acc = trs[0]
        for i, tr in enumerate(trs):
            acc = acc * (1 - a) + tr * a
            assert got[i][0] == tr
            assert got[i][1] == acc
        assert got[0][0] == 2.0  # first row: high - low

    def test_obv_exact_running_sum(self, spark):
        from tastytrade_sdk_spark.operators.indicators import obv_col

        rows = [
            ("k", 0, 10.0, 5),
            ("k", 1, 11.0, 3),   # up: +3
            ("k", 2, 11.0, 7),   # flat: 0
            ("k", 3, 9.0, 2),    # down: -2
            ("k", 4, 12.0, 4),   # up: +4
        ]
        df = spark.createDataFrame(rows, "k string, i int, c double, v long")
        out = df.withColumn("obv", obv_col(F.col("c"), F.col("v"), ["k"], ["i"]))
        got = [r["obv"] for r in out.orderBy("i").collect()]
        assert got == [0, 3, 3, 1, 5]

    def test_single_row_series(self, spark):
        """One-row series: TR = high-low, ATR = TR, OBV = 0 — no NULL
        leaks from the lag edges."""
        from tastytrade_sdk_spark.operators.indicators import (
            atr_col,
            obv_col,
            true_range_col,
        )

        df = spark.createDataFrame(
            [("k", 0, 10.0, 8.0, 9.0, 4)],
            "k string, i int, h double, l double, c double, v long",
        )
        staged = df.withColumn(
            "tr", true_range_col(F.col("h"), F.col("l"), F.col("c"), ["k"], ["i"])
        )
        row = staged.select(
            "tr",
            atr_col(F.col("tr"), 14, ["k"], ["i"]).alias("atr"),
            obv_col(F.col("c"), F.col("v"), ["k"], ["i"]).alias("obv"),
        ).collect()[0]
        assert row["tr"] == 2.0 and row["atr"] == 2.0 and row["obv"] == 0
