"""Typed account-event envelope: wire-JSON parse, demux, nest/explode.

Models the reference account streamer's typed-queue surface
(reference src/tastytrade/accounts/streamer.py:1-50,
accounts/models.py:813-946) as Spark schemas + expressions.
"""

import datetime as dt

from pyspark.sql import functions as F

from tastytrade_sdk_spark.sources.accounts import (
    ACCOUNT_EVENT_SCHEMA,
    ACCOUNT_EVENT_TYPES,
    PLACED_ORDER_SCHEMA,
    demux_account_events,
    explode_order_fills,
    nest_order_envelope,
    parse_order_json,
)

WIRE_ORDER_JSON = (
    '{"id": 42, "account-number": "5WT0001", "order-type": "Limit",'
    ' "time-in-force": "Day", "price": 1.25, "price-effect": "Credit",'
    ' "status": "Filled", "cancellable": false, "editable": false,'
    ' "underlying-symbol": "SPY",'
    ' "legs": [{"leg-index": 1, "instrument-type": "Equity Option",'
    '   "symbol": "SPY 260306C00500000", "action": "Sell to Open",'
    '   "quantity": 2.0, "remaining-quantity": 0.0,'
    '   "fills": [{"fill-id": "f1", "quantity": 2.0, "fill-price": 1.25,'
    '     "filled-at": "2026-03-06T14:30:00", "destination-venue": "CBOE"}]},'
    '  {"leg-index": 2, "instrument-type": "Equity Option",'
    '   "symbol": "SPY 260306C00510000", "action": "Buy to Open",'
    '   "quantity": 2.0, "remaining-quantity": 2.0, "fills": []}]}'
)


def test_parse_order_json_wire_aliases(spark):
    df = spark.createDataFrame([(WIRE_ORDER_JSON,)], ["payload"])
    parsed = parse_order_json(df, "payload")
    # from_json output is all-nullable; compare shape, not nullability
    assert (
        parsed.schema["order"].dataType.simpleString()
        == PLACED_ORDER_SCHEMA.simpleString()
    )
    row = parsed.select("order").collect()[0]["order"]
    assert row["id"] == 42
    assert row["account_number"] == "5WT0001"
    assert row["underlying_symbol"] == "SPY"
    legs = row["legs"]
    assert [leg["leg_index"] for leg in legs] == [1, 2]
    assert legs[0]["action"] == "Sell to Open"
    fill = legs[0]["fills"][0]
    assert fill["fill_id"] == "f1"
    assert fill["fill_price"] == 1.25
    assert fill["filled_at"] == dt.datetime(2026, 3, 6, 14, 30)
    assert legs[1]["fills"] == []


def test_parse_then_explode_fills(spark):
    df = spark.createDataFrame([(WIRE_ORDER_JSON,)], ["payload"])
    flat = explode_order_fills(parse_order_json(df))
    rows = flat.collect()
    # leg 2 has no fills -> only leg 1's single fill survives
    assert len(rows) == 1
    r = rows[0]
    assert (r["order_id"], r["leg_index"], r["fill_id"]) == (42, 1, "f1")
    assert r["fill_quantity"] == 2.0


def test_demux_account_events(spark):
    now = dt.datetime(2026, 1, 2, 9, 30)
    rows = [
        ("Order", "A1", now, None, None, None),
        ("CurrentPosition", "A1", now, None, None, None),
        ("CurrentPosition", "A2", now, None, None, None),
        ("AccountBalance", "A2", now, None, None, None),
    ]
    df = spark.createDataFrame(rows, ACCOUNT_EVENT_SCHEMA)
    out = demux_account_events(df)
    assert set(out) == set(ACCOUNT_EVENT_TYPES)
    assert out["Order"].count() == 1
    assert out["CurrentPosition"].count() == 2
    assert out["AccountBalance"].count() == 1


def test_nest_explode_roundtrip(spark):
    flat = spark.createDataFrame(
        [
            (10, 1, "Equity", "AAPL", "Buy to Open", 3.0, "f-10-1-A", 1.0, 100.0),
            (10, 1, "Equity", "AAPL", "Buy to Open", 3.0, "f-10-1-B", 2.0, 100.0),
            (10, 2, "Equity", "MSFT", "Sell to Close", 1.0, "f-10-2-A", 1.0, 200.0),
            (11, 1, "Equity", "TSLA", "Buy to Open", 5.0, "f-11-1-A", 5.0, 300.0),
        ],
        [
            "id", "leg_index", "instrument_type", "symbol", "action",
            "quantity", "fill_id", "fill_quantity", "fill_price",
        ],
    )
    nested = nest_order_envelope(flat)
    assert nested.count() == 2
    legs_10 = {r["id"]: r["legs"] for r in nested.collect()}[10]
    assert [leg["leg_index"] for leg in legs_10] == [1, 2]
    assert [f["fill_id"] for f in legs_10[0]["fills"]] == ["f-10-1-A", "f-10-1-B"]

    env = nested.select(
        F.struct(
            F.col("id"),
            F.lit("ACC1").alias("account_number"),
            F.lit("Limit").alias("order_type"),
            F.lit("Day").alias("time_in_force"),
            F.lit(None).cast("double").alias("price"),
            F.lit("Debit").alias("price_effect"),
            F.lit("Filled").alias("status"),
            F.lit(False).alias("cancellable"),
            F.lit(False).alias("editable"),
            F.lit(None).cast("string").alias("underlying_symbol"),
            F.col("legs"),
        ).alias("order")
    )
    back = explode_order_fills(env)
    got = {
        (r["order_id"], r["leg_index"], r["fill_id"], r["fill_quantity"], r["fill_price"])
        for r in back.collect()
    }
    assert got == {
        (10, 1, "f-10-1-A", 1.0, 100.0),
        (10, 1, "f-10-1-B", 2.0, 100.0),
        (10, 2, "f-10-2-A", 1.0, 200.0),
        (11, 1, "f-11-1-A", 5.0, 300.0),
    }


def test_streaming_demux_per_type_sinks(spark):
    """S10 as a second streaming source: an account-event envelope
    stream demuxes into per-type streaming sinks (the reference's
    typed queues), each receiving exactly its own events."""
    import tempfile

    import pyspark.sql.functions as F

    now = dt.datetime(2026, 1, 2, 9, 30)
    rows = [
        ("Order", "A1", now, None, None, None),
        ("CurrentPosition", "A1", now, None, None, None),
        ("CurrentPosition", "A2", now, None, None, None),
        ("AccountBalance", "A2", now, None, None, None),
        ("Order", "A2", now, None, None, None),
    ]
    src = tempfile.mkdtemp(prefix="acct_src_")
    spark.createDataFrame(rows, ACCOUNT_EVENT_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    stream = spark.readStream.schema(ACCOUNT_EVENT_SCHEMA).parquet(src)
    demuxed = demux_account_events(stream)
    queries = []
    try:
        for etype, sdf in demuxed.items():
            assert sdf.isStreaming
            q = (
                sdf.writeStream.outputMode("append")
                .format("memory")
                .queryName(f"acct_{etype}")
                .start()
            )
            queries.append(q)
        for q in queries:
            q.processAllAvailable()
        got = {
            etype: spark.sql(f"select account_number from acct_{etype}").collect()
            for etype in demuxed
        }
    finally:
        for q in queries:
            q.stop()
    assert sorted(r[0] for r in got["Order"]) == ["A1", "A2"]
    assert sorted(r[0] for r in got["CurrentPosition"]) == ["A1", "A2"]
    assert [r[0] for r in got["AccountBalance"]] == ["A2"]


def test_explode_outer_keeps_legless_orders(spark):
    df = spark.createDataFrame([(WIRE_ORDER_JSON,)], ["payload"])
    flat = explode_order_fills(parse_order_json(df), outer=True)
    rows = flat.collect()
    # leg 1 -> its fill; leg 2 -> kept with null fill columns
    assert len(rows) == 2
    by_leg = {r["leg_index"]: r for r in rows}
    assert by_leg[1]["fill_id"] == "f1"
    assert by_leg[2]["fill_id"] is None and by_leg[2]["fill_quantity"] is None


def test_nest_explode_roundtrip_randomized(spark):
    """Seeded-random envelope round-trip: nest -> explode must be the
    identity on the fill set for arbitrary leg/fill multiplicities,
    unicode symbols, and extreme quantities."""
    import random

    rng = random.Random(20260814)
    symbols = ["AAPL", "SPY 260306C00500000", "ünïcode™", "./F GCZ6", ""]
    flat_rows = []
    for oid in range(40):
        for leg in range(1, rng.randint(2, 6)):
            sym = rng.choice(symbols)
            qty = rng.choice([0.0, 1.0, 1e12, -3.5, 0.001])
            for f in range(rng.randint(1, 4)):
                flat_rows.append(
                    (
                        oid,
                        leg,
                        "Equity",
                        sym,
                        "Buy to Open",
                        qty,
                        f"f-{oid}-{leg}-{f}",
                        rng.choice([0.5, 2.0, 1e9]),
                        rng.choice([0.01, 12345.67]),
                    )
                )
    flat = spark.createDataFrame(
        flat_rows,
        [
            "id", "leg_index", "instrument_type", "symbol", "action",
            "quantity", "fill_id", "fill_quantity", "fill_price",
        ],
    )
    nested = nest_order_envelope(flat)
    env = nested.select(
        F.struct(
            F.col("id"),
            F.lit("A").alias("account_number"),
            F.lit("Limit").alias("order_type"),
            F.lit("Day").alias("time_in_force"),
            F.lit(None).cast("double").alias("price"),
            F.lit("Debit").alias("price_effect"),
            F.lit("Filled").alias("status"),
            F.lit(False).alias("cancellable"),
            F.lit(False).alias("editable"),
            F.lit(None).cast("string").alias("underlying_symbol"),
            F.col("legs"),
        ).alias("order")
    )
    back = explode_order_fills(env)
    got = {
        (r["order_id"], r["leg_index"], r["symbol"], r["leg_quantity"],
         r["fill_id"], r["fill_quantity"], r["fill_price"])
        for r in back.collect()
    }
    want = {(r[0], r[1], r[3], r[5], r[6], r[7], r[8]) for r in flat_rows}
    assert got == want


WIRE_CHAIN_JSON = (
    '{"id": "ch-1", "description": "Iron Condor", "underlying-symbol": "SPX",'
    ' "computed-data": {"open": false, "realized-gain": 210.5,'
    '   "realized-gain-effect": "Credit", "winner-realized": true,'
    '   "roll-count": 2, "opened-at": "2026-01-05T10:00:00",'
    '   "last-occurred-at": "2026-02-20T15:45:00"},'
    ' "lite-nodes": [{"occurred-at": "2026-01-05T10:00:00", "node-id": 1,'
    '   "node-type": "order", "description": "Opening",'
    '   "total-fill-cost": 310.0, "total-fill-cost-effect": "Credit",'
    '   "total-fees": 4.4, "roll": false,'
    '   "legs": [{"symbol": "SPX 260320P05800000",'
    '     "instrument-type": "Equity Option", "action": "Sell to Open",'
    '     "fill-quantity": 1.0, "order-quantity": 1.0}]}]}'
)


def test_parse_trade_chain_json(spark):
    from tastytrade_sdk_spark.sources.accounts import (
        TRADE_CHAIN_SCHEMA,
        parse_trade_chain_json,
    )

    df = spark.createDataFrame([(WIRE_CHAIN_JSON,)], ["payload"])
    parsed = parse_trade_chain_json(df)
    assert (
        parsed.schema["trade_chain"].dataType.simpleString()
        == TRADE_CHAIN_SCHEMA.simpleString()
    )
    ch = parsed.select("trade_chain").collect()[0]["trade_chain"]
    assert ch["id"] == "ch-1"
    assert ch["underlying_symbol"] == "SPX"
    cd = ch["computed_data"]
    assert cd["realized_gain"] == 210.5
    assert cd["winner_realized"] is True
    assert cd["roll_count"] == 2
    node = ch["lite_nodes"][0]
    assert node["node_id"] == 1
    assert node["total_fill_cost_effect"] == "Credit"
    leg = node["legs"][0]
    assert leg["action"] == "Sell to Open"
    assert leg["fill_quantity"] == 1.0


def test_parse_trade_chain_quantities_as_strings(spark):
    """The reference's TradeChain wire encodes quantities/money as JSON
    strings; the wire layer must parse them (and plain numbers) into
    typed doubles rather than nulling the record."""
    from tastytrade_sdk_spark.sources.accounts import parse_trade_chain_json

    wire = (
        '{"id": "ch-2", "description": "Vertical", "underlying-symbol": "QQQ",'
        ' "computed-data": {"open": "false", "realized-gain": "12.25",'
        '   "realized-gain-effect": "Credit", "winner-realized": "true",'
        '   "roll-count": "0", "opened-at": "2026-01-05T10:00:00",'
        '   "last-occurred-at": "2026-01-06T10:00:00"},'
        ' "lite-nodes": [{"occurred-at": "2026-01-05T10:00:00", "node-id": "7",'
        '   "node-type": "order", "description": "Opening",'
        '   "total-fill-cost": "55.0", "total-fill-cost-effect": "Debit",'
        '   "total-fees": "1.1", "roll": "false",'
        '   "legs": [{"symbol": "QQQ 260320C00500000",'
        '     "instrument-type": "Equity Option", "action": "Buy to Open",'
        '     "fill-quantity": "2", "order-quantity": "2"}]}]}'
    )
    df = spark.createDataFrame([(wire,)], ["payload"])
    ch = parse_trade_chain_json(df).select("trade_chain").collect()[0]["trade_chain"]
    assert ch["computed_data"]["realized_gain"] == 12.25
    assert ch["computed_data"]["winner_realized"] is True
    assert ch["computed_data"]["roll_count"] == 0
    node = ch["lite_nodes"][0]
    assert node["node_id"] == 7
    assert node["total_fill_cost"] == 55.0
    assert node["legs"][0]["fill_quantity"] == 2.0
