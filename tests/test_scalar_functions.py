"""Scalar function library (SURVEY §2.9)."""

import datetime as dt

import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.functions.scalar import (
    apply_effect,
    clean_float,
    dte,
    floor_time_to_interval,
    format_candle_symbol,
    in_session,
    interval_to_ms,
    is_trading_day,
    mid_price,
    parse_candle_symbol,
    parse_occ_symbol,
)


def one(spark, expr, schema_row):
    df = spark.createDataFrame(schema_row[0], schema_row[1])
    return df.select(expr.alias("out")).collect()[0]["out"]


def test_clean_float(spark):
    df = spark.createDataFrame(
        [(1.23456789012345,), (float("nan"),), (float("inf",),), (None,)], "v double"
    )
    out = [r["out"] for r in df.select(clean_float("v").alias("out")).collect()]
    assert out[0] == pytest.approx(1.2345678901)
    assert out[1] is None and out[2] is None and out[3] is None


def test_mid_price(spark):
    assert one(spark, mid_price("b", "a"), ([(10.0, 11.0)], "b double, a double")) == 10.5


def test_apply_effect(spark):
    df = spark.createDataFrame([(5.0, "Credit"), (5.0, "Debit")], "amt double, eff string")
    out = [r["o"] for r in df.select(apply_effect("amt", "eff").alias("o")).collect()]
    assert out == [5.0, -5.0]


def test_candle_symbol_roundtrip(spark):
    df = spark.createDataFrame([("SPX{=5m}",), ("AAPL",)], "s string")
    base, interval = parse_candle_symbol("s")
    rows = df.select(base.alias("b"), interval.alias("i")).collect()
    assert (rows[0]["b"], rows[0]["i"]) == ("SPX", "5m")
    assert (rows[1]["b"], rows[1]["i"]) == ("AAPL", None)
    back = df.limit(1).select(
        format_candle_symbol(F.lit("SPX"), F.lit("5m")).alias("s")
    ).collect()[0]["s"]
    assert back == "SPX{=5m}"


def test_interval_to_ms(spark):
    df = spark.createDataFrame([("5m",), ("h",), ("2d",), ("30s",), ("w",)], "s string")
    out = [r["o"] for r in df.select(interval_to_ms("s").alias("o")).collect()]
    assert out == [300_000, 3_600_000, 172_800_000, 30_000, 604_800_000]


def test_floor_time_to_interval(spark):
    t = dt.datetime(2024, 1, 1, 10, 7, 33)
    df = spark.createDataFrame([(t,)], "ts timestamp")
    out = df.select(
        floor_time_to_interval("ts", F.lit(300_000)).alias("o")
    ).collect()[0]["o"]
    assert out == dt.datetime(2024, 1, 1, 10, 5, 0)


def test_parse_occ_symbol(spark):
    df = spark.createDataFrame(
        [("SPY   260306C00700000",), ("not-an-occ",)], "s string"
    )
    rows = df.select(parse_occ_symbol("s").alias("o")).collect()
    occ = rows[0]["o"]
    assert occ["root"] == "SPY"
    assert occ["expiration_date"] == dt.date(2026, 3, 6)
    assert occ["option_type"] == "C"
    assert float(occ["strike_price"]) == 700.0
    assert rows[1]["o"] is None


def test_in_session_et(spark):
    # 2024-01-15 15:00 UTC == 10:00 ET (EST) — inside; 14:59 UTC — outside
    df = spark.createDataFrame(
        [
            (dt.datetime(2024, 1, 15, 15, 0, 0),),
            (dt.datetime(2024, 1, 15, 14, 59, 0),),
            (dt.datetime(2024, 1, 15, 20, 0, 0),),  # 15:00 ET — excluded (>= end)
            (dt.datetime(2024, 7, 15, 14, 0, 0),),  # EDT: 10:00 ET — inside
        ],
        "ts timestamp",
    )
    out = [r["o"] for r in df.select(in_session("ts").alias("o")).collect()]
    assert out == [True, False, False, True]


def test_is_trading_day(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 1, 13),), (dt.date(2024, 1, 15),)], "d date"
    )
    out = [r["o"] for r in df.select(is_trading_day("d").alias("o")).collect()]
    assert out == [False, True]  # Sat, Mon


def test_dte(spark):
    df = spark.createDataFrame(
        [(dt.date(2024, 2, 1), dt.date(2024, 1, 15))], "e date, t date"
    )
    assert df.select(dte("e", "t").alias("o")).collect()[0]["o"] == 17


def test_apply_effect_null_amount_is_zero(spark):
    # reference analytics/positions.apply_effect: missing amount -> 0
    df = spark.createDataFrame(
        [(None, "Credit"), (None, "Debit")], "amt double, eff string"
    )
    out = [r["o"] for r in df.select(apply_effect("amt", "eff").alias("o")).collect()]
    assert out == [0.0, -0.0] or out == [0.0, 0.0]


def test_interval_to_ms_strict_and_case_insensitive(spark):
    from tastytrade_sdk_spark.functions.scalar import interval_to_ms

    rows = [("5m",), ("5M",), ("h",), ("5m30s",), ("5xm",), ("30s",)]
    df = spark.createDataFrame(rows, "iv string")
    out = [r["ms"] for r in df.select(interval_to_ms("iv").alias("ms")).collect()]
    assert out == [300000, 300000, 3600000, None, None, 30000]
