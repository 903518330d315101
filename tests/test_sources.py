"""Source-layer operators: COMPACT positional decode, JSON boundary
parse, nested option-chain flattening, DTE closest-match."""

import datetime as dt

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from tastytrade_sdk_spark.sources.chains import closest_dte_expirations, flatten_chain
from tastytrade_sdk_spark.sources.compact import decode_compact, parse_json_events

QUOTE_SCHEMA = T.StructType(
    [
        T.StructField("eventSymbol", T.StringType()),
        T.StructField("bidPrice", T.DoubleType()),
        T.StructField("askPrice", T.DoubleType()),
    ]
)


class TestCompactDecode:
    def test_multi_event_chunks(self, spark):
        # one array carrying two events back-to-back (handlers.py:163-185)
        df = spark.createDataFrame(
            [(1, ["SPY", "1.5", "1.6", "QQQ", "2.5", "2.6"])],
            "channel int, data array<string>",
        )
        out = decode_compact(df, "data", QUOTE_SCHEMA, keep_cols=["channel"]).collect()
        assert len(out) == 2
        assert out[0]["eventSymbol"] == "SPY" and out[0]["bidPrice"] == 1.5
        assert out[1]["eventSymbol"] == "QQQ" and out[1]["askPrice"] == 2.6
        assert not out[0]["_corrupt"] and not out[1]["_corrupt"]

    def test_incomplete_trailing_chunk_flagged(self, spark):
        df = spark.createDataFrame(
            [(1, ["SPY", "1.5", "1.6", "QQQ", "2.5"])],  # second chunk short
            "channel int, data array<string>",
        )
        out = decode_compact(df, "data", QUOTE_SCHEMA).collect()
        assert len(out) == 2
        assert not out[0]["_corrupt"]
        assert out[1]["_corrupt"]
        # corrupt_col=None drops short chunks silently (reference logs+drops)
        kept = decode_compact(df, "data", QUOTE_SCHEMA, corrupt_col=None).collect()
        assert len(kept) == 1

    def test_bad_cast_gives_null_not_crash(self, spark):
        df = spark.createDataFrame(
            [(1, ["SPY", "not-a-number", "1.6"])], "channel int, data array<string>"
        )
        out = decode_compact(df, "data", QUOTE_SCHEMA).collect()
        assert out[0]["bidPrice"] is None  # invalid value -> null, row survives

    def test_json_parse_permissive(self, spark):
        df = spark.createDataFrame(
            [(1, '{"eventSymbol": "SPY", "bidPrice": 1.5, "askPrice": 1.6}'),
             (2, "not json at all")],
            "id int, payload string",
        )
        out = parse_json_events(df, "payload", QUOTE_SCHEMA, keep_cols=["id"]).collect()
        assert out[0]["bidPrice"] == 1.5
        assert out[1]["eventSymbol"] is None  # permissive: nulls, no crash


class TestChainFlatten:
    @pytest.fixture()
    def chain(self, spark):
        strikes = [
            {"strike_price": 100.0, "call": ".SPY C100", "put": ".SPY P100"},
            {"strike_price": 105.0, "call": ".SPY C105", "put": None},
        ]
        rows = [
            (
                "SPY",
                [
                    {
                        "expiration_date": dt.date(2024, 3, 15),
                        "days_to_expiration": 30,
                        "strikes": strikes,
                    },
                    {
                        "expiration_date": dt.date(2024, 4, 19),
                        "days_to_expiration": 65,
                        "strikes": strikes[:1],
                    },
                ],
            )
        ]
        schema = (
            "root string, expirations array<struct<expiration_date date, "
            "days_to_expiration int, strikes array<struct<strike_price double, "
            "call string, put string>>>>"
        )
        return spark.createDataFrame(rows, schema)

    def test_flatten(self, chain):
        out = flatten_chain(chain).collect()
        # exp1: 2 calls + 1 put (null put dropped); exp2: 1 call + 1 put
        assert len(out) == 5
        syms = {r["symbol"] for r in out}
        assert ".SPY C105" in syms and ".SPY P100" in syms
        c105 = next(r for r in out if r["symbol"] == ".SPY C105")
        assert c105["option_type"] == "C" and c105["strike_price"] == 105.0

    def test_closest_dte(self, chain):
        contracts = flatten_chain(chain)
        out = closest_dte_expirations(contracts, [28, 70]).collect()
        got = {(r["target_dte"], r["days_to_expiration"]) for r in out}
        assert got == {(28, 30), (70, 65)}


def test_load_table_reads_spark_written_int96(spark, tmp_path):
    """Spark's own default parquet writer emits INT96 timestamps,
    which pyarrow surfaces as timestamp[ns] — the same spelling as
    true TIMESTAMP(NANOS). The loader must NOT route INT96 through
    the nanosAsLong+div path (that bolts integer division onto a
    column Spark already read as TIMESTAMP and kills the query);
    regression for the r6 TPC-H fixture tests that first hit it."""
    import datetime as dt

    from tastytrade_sdk_spark.sources.tables import load_table

    ts = dt.datetime(1997, 6, 1, 12, 30)
    spark.createDataFrame(
        [(1, ts)], "id long, ts timestamp"
    ).write.mode("overwrite").parquet(str(tmp_path / "t.parquet"))
    out = load_table(spark, "t", str(tmp_path)).collect()
    assert out[0]["ts"] == ts

    # the true-NANOS path still works (the driver's events table)
    ev = load_table(spark, "events", "/root/testdata/sf0.001")
    assert ev.schema["ts"].dataType.typeName() == "timestamp"
    assert ev.limit(1).count() == 1
