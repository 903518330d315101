"""Domain-semantics correctness queries: the account-analytics
aggregation contracts (A2-A4), scalar parsing library (§2.9), and the
remaining filter/window/set-op [Q]s.

Fixtures are derived in-query from the driver tables with the same
deterministic derivation on both engines (comments note the mapping).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tastytrade_sdk_spark.sources.tables import load_table

DOMAIN_QUERIES: dict = {}
DOMAIN_ORACLE_SQL: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        DOMAIN_QUERIES[name] = fn
        if oracle is not None:
            DOMAIN_ORACLE_SQL[name] = oracle
        return fn

    return deco


@_q(
    "strategy_net_greeks",
    """
    WITH legs AS (
      SELECT l_orderkey,
             CASE WHEN l_linenumber % 5 = 0 THEN NULL
                  ELSE round(l_discount - 0.05, 4) END AS delta,
             CASE WHEN l_returnflag = 'R' THEN -l_quantity ELSE l_quantity END AS signed_qty
      FROM lineitem
    )
    SELECT l_orderkey,
           -- "+ 0.0" folds DuckDB's -0.0 into +0.0 to match Spark's round()
           CASE WHEN count(delta) = 0 THEN NULL
                ELSE round(sum(delta * signed_qty), 4) + 0.0 END AS net_delta,
           count(*) AS n_legs
    FROM legs GROUP BY l_orderkey
    """,
)
def strategy_net_greeks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 net-Greeks contract: sum(greek*signed_qty) rounded 4dp with
    the all-legs-null => NULL rule (strategies/models.py:159-215)."""
    li = load_table(spark, "lineitem", sf_dir)
    delta = F.when(
        F.col("l_linenumber") % 5 == 0, F.lit(None)
    ).otherwise(F.round(F.col("l_discount") - 0.05, 4))
    signed_qty = F.when(
        F.col("l_returnflag") == "R", -F.col("l_quantity")
    ).otherwise(F.col("l_quantity"))
    legs = li.select("l_orderkey", delta.alias("delta"), signed_qty.alias("signed_qty"))
    return legs.groupBy("l_orderkey").agg(
        F.when(F.count("delta") == 0, F.lit(None))
        .otherwise(F.round(F.sum(F.col("delta") * F.col("signed_qty")), 4) + 0.0)
        .alias("net_delta"),
        F.count(F.lit(1)).alias("n_legs"),
    )


@_q(
    "strategy_rollups",
    """
    WITH legs AS (
      SELECT l_orderkey, l_shipdate,
             round(l_extendedprice / 100, 0) AS strike
      FROM lineitem
    )
    SELECT l_orderkey,
           min(l_shipdate) AS min_expiration,
           round(max(strike) - min(strike), 2) AS width,
           count(DISTINCT strike) AS n_strikes
    FROM legs GROUP BY l_orderkey
    """,
)
def strategy_rollups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A3 rollups: min expiration + strike width = max-min over the
    distinct strike set (strategies/models.py:217-237)."""
    li = load_table(spark, "lineitem", sf_dir)
    legs = li.select(
        "l_orderkey",
        "l_shipdate",
        F.round(F.col("l_extendedprice") / 100, 0).alias("strike"),
    )
    return legs.groupBy("l_orderkey").agg(
        F.min("l_shipdate").alias("min_expiration"),
        F.round(F.max("strike") - F.min("strike"), 2).alias("width"),
        F.countDistinct("strike").alias("n_strikes"),
    )


@_q(
    "campaign_summary",
    """
    WITH t AS (
      SELECT o_orderpriority,
             CASE WHEN o_orderstatus = 'F' THEN o_totalprice::DECIMAL(18,2)
                  ELSE -(o_totalprice::DECIMAL(18,2)) END AS signed_d,
             round(o_totalprice::DECIMAL(18,2) * 0.001::DECIMAL(6,3), 2) AS fee_d
      FROM orders
    )
    SELECT o_orderpriority,
           count(*) AS n_chains,
           CAST(sum(signed_d) AS DOUBLE) AS realized,
           CAST(sum(fee_d) AS DOUBLE) AS fees,
           CAST(sum(signed_d) - sum(fee_d) AS DOUBLE) AS net,
           CASE WHEN sum(signed_d) - sum(fee_d) < 0
                THEN CAST(-(sum(signed_d) - sum(fee_d)) AS DOUBLE)
                ELSE CAST(0 AS DOUBLE) END AS recovery
    FROM t
    GROUP BY o_orderpriority
    """,
)
def campaign_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A4 campaign summary: Credit/Debit-signed sums, fee totals,
    net, and recovery = max(0, -net) (positions.py:277-381). Money
    runs in DECIMAL arithmetic INTERNALLY (exact mixed-sign sums on
    the 2dp grid) and the final select casts to DOUBLE — the exact
    2dp decimal converts to the same nearest double on both engines.
    A DecimalType OUTPUT column is a driver-hash hazard (r4
    pricing_summary regression; see plans/queries.py HARD RULE)."""
    orders = load_table(spark, "orders", sf_dir)
    # DECIMAL money math throughout (the reference's Decimal convention,
    # functions/scalar.apply_effect): at sf0.1 the double path
    # accumulates ~1e-3 summation noise on the 2.6e9 mixed-sign totals
    # (150k terms), and the per-row fee round sits on a 5dp grid where
    # double rounding diverges between engines
    price_d = F.col("o_totalprice").cast("decimal(18,2)")
    signed = F.when(F.col("o_orderstatus") == "F", price_d).otherwise(-price_d)
    fee = F.round(price_d * F.lit(0.001).cast("decimal(6,3)"), 2)
    net = F.sum(signed) - F.sum(fee)
    agg = orders.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_chains"),
        F.sum(signed).cast("double").alias("realized"),
        F.sum(fee).cast("double").alias("fees"),
        net.cast("double").alias("net"),
        F.greatest(F.lit(0).cast("decimal(18,2)"), -net)
        .cast("double")
        .alias("recovery"),
    )
    return agg


@_q(
    "occ_symbol_parse",
    """
    WITH syms AS (
      SELECT p_partkey,
             rpad(substring(p_brand, 7, 2), 6, ' ') || '260306'
               || CASE WHEN p_size % 2 = 0 THEN 'C' ELSE 'P' END
               || lpad(CAST(CAST(round(p_retailprice * 10, 0) AS BIGINT) AS VARCHAR), 8, '0')
               AS occ
      FROM part
    )
    SELECT p_partkey, occ,
           trim(substring(occ, 1, 6)) AS root,
           CAST(strptime(substring(occ, 7, 6), '%y%m%d') AS DATE) AS expiration_date,
           substring(occ, 13, 1) AS option_type,
           round(CAST(substring(occ, 14, 8) AS BIGINT) / 1000.0, 6) AS strike
    FROM syms
    """,
)
def occ_symbol_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 OCC option-symbol parse (root + YYMMDD + C/P + strike*1000,
    streamer.py:60-99) over synthesized 21-char symbols."""
    from tastytrade_sdk_spark.functions.scalar import parse_occ_symbol

    part = load_table(spark, "part", sf_dir)
    occ = F.concat(
        F.rpad(F.substring(F.col("p_brand"), 7, 2), 6, " "),
        F.lit("260306"),
        F.when(F.col("p_size") % 2 == 0, "C").otherwise("P"),
        F.lpad(
            F.round(F.col("p_retailprice") * 10, 0).cast("bigint").cast("string"),
            8,
            "0",
        ),
    )
    parsed = parse_occ_symbol(F.col("occ"))
    return (
        part.select("p_partkey", occ.alias("occ"))
        .select(
            "p_partkey",
            "occ",
            parsed["root"].alias("root"),
            parsed["expiration_date"].alias("expiration_date"),
            parsed["option_type"].alias("option_type"),
            F.round(parsed["strike_price"].cast("double"), 6).alias("strike"),
        )
    )


@_q(
    "candle_symbol_roundtrip",
    """
    WITH syms AS (
      SELECT event_id,
             event_type || '{=' || ((user_id % 3) + 1) || 'm}' AS decorated
      FROM events
    )
    SELECT event_id, decorated,
           regexp_extract(decorated, '^([^{]+)', 1) AS base_symbol,
           regexp_extract(decorated, '\\{=([^}]+)\\}', 1) AS interval
    FROM syms
    """,
)
def candle_symbol_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 decorated candle symbol SPX{=5m} format + parse
    (helpers.py:33-47)."""
    from tastytrade_sdk_spark.functions.scalar import (
        format_candle_symbol,
        parse_candle_symbol,
    )

    ev = load_table(spark, "events", sf_dir)
    decorated = format_candle_symbol(
        F.col("event_type"),
        F.concat(((F.col("user_id") % 3) + 1).cast("string"), F.lit("m")),
    )
    base, interval = parse_candle_symbol(F.col("decorated"))
    return ev.select("event_id", decorated.alias("decorated")).select(
        "event_id",
        "decorated",
        base.alias("base_symbol"),
        F.coalesce(interval, F.lit("")).alias("interval"),
    )


@_q(
    "interval_parse_ms",
    """
    WITH iv AS (
      SELECT event_id,
             CASE user_id % 5 WHEN 0 THEN '5m' WHEN 1 THEN 'h'
                              WHEN 2 THEN '2d' WHEN 3 THEN '30s'
                              ELSE 'w' END AS interval
      FROM events
    )
    SELECT event_id, interval,
           CASE interval WHEN '5m' THEN 300000 WHEN 'h' THEN 3600000
                         WHEN '2d' THEN 172800000 WHEN '30s' THEN 30000
                         ELSE 604800000 END AS interval_ms
    FROM iv
    """,
)
def interval_parse_ms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 interval-string parse (\\d*)([smhdw]) -> ms
    (messages.py:133-180). Spark parses with the real regex operator;
    the oracle pins expected values."""
    from tastytrade_sdk_spark.functions.scalar import interval_to_ms

    ev = load_table(spark, "events", sf_dir)
    interval = (
        F.when(F.col("user_id") % 5 == 0, "5m")
        .when(F.col("user_id") % 5 == 1, "h")
        .when(F.col("user_id") % 5 == 2, "2d")
        .when(F.col("user_id") % 5 == 3, "30s")
        .otherwise("w")
    )
    return ev.select("event_id", interval.alias("interval")).select(
        "event_id", "interval", interval_to_ms("interval").alias("interval_ms")
    )


@_q(
    "float_boundary_coercion",
    """
    WITH v AS (
      SELECT event_id,
             CASE WHEN event_id % 11 = 0 THEN 'NaN'::DOUBLE
                  WHEN event_id % 13 = 0 THEN 'Infinity'::DOUBLE
                  ELSE value / 3.0 END AS raw
      FROM events
    )
    SELECT event_id,
           CASE WHEN isnan(raw) OR isinf(raw) THEN NULL
                ELSE round(raw, 10) END AS clean
    FROM v
    """,
)
def float_boundary_coercion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§1.2 boundary validation: NaN/inf -> NULL + 10dp rounding
    (events.py:37-53) over injected boundary values."""
    from tastytrade_sdk_spark.functions.scalar import clean_float

    ev = load_table(spark, "events", sf_dir)
    raw = (
        F.when(F.col("event_id") % 11 == 0, F.lit(float("nan")))
        .when(F.col("event_id") % 13 == 0, F.lit(float("inf")))
        .otherwise(F.col("value") / 3.0)
    )
    return ev.select("event_id", raw.alias("raw")).select(
        "event_id", clean_float("raw").alias("clean")
    )


@_q(
    "zero_null_price_filter",
    """
    WITH px AS (
      SELECT event_id, user_id,
             CASE WHEN event_id % 7 = 0 THEN 0.0
                  WHEN event_id % 17 = 0 THEN NULL
                  ELSE value END AS close
      FROM events
    )
    SELECT event_id, user_id, close FROM px
    WHERE close IS NOT NULL AND close != 0
    """,
)
def zero_null_price_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P3 zero/null close filter (charting/server.py:264-267)."""
    ev = load_table(spark, "events", sf_dir)
    close = (
        F.when(F.col("event_id") % 7 == 0, 0.0)
        .when(F.col("event_id") % 17 == 0, F.lit(None))
        .otherwise(F.col("value"))
    )
    return (
        ev.select("event_id", "user_id", close.alias("close"))
        .filter(F.col("close").isNotNull() & (F.col("close") != 0))
    )


@_q(
    "distinct_event_types_per_user",
    """
    SELECT user_id,
           string_agg(DISTINCT event_type, ',' ORDER BY event_type) AS event_types,
           count(DISTINCT event_type) AS n_types
    FROM events GROUP BY user_id
    """,
)
def distinct_event_types_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A9 distinct-set aggregation (collect_set), sorted for
    deterministic comparison."""
    ev = load_table(spark, "events", sf_dir)
    return ev.groupBy("user_id").agg(
        F.concat_ws(",", F.sort_array(F.collect_set("event_type"))).alias(
            "event_types"
        ),
        F.countDistinct("event_type").alias("n_types"),
    )


@_q(
    "period_close_advance",
    """
    WITH o AS (
      SELECT event_type, ts, event_id, value,
             date_trunc('hour', ts) AS epoch,
             lag(date_trunc('hour', ts)) OVER w AS prev_epoch,
             lag(value) OVER w AS prev_value,
             lag(event_id) OVER w AS prev_event_id
      FROM events
      WINDOW w AS (PARTITION BY event_type ORDER BY ts, event_id)
    )
    SELECT event_type, ts AS advance_ts, prev_event_id, prev_value AS period_close
    FROM o WHERE prev_epoch IS NOT NULL AND epoch != prev_epoch
    """,
)
def period_close_advance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W9 indicator advance-on-period-close: detect epoch change and
    emit the PREVIOUS row's value as the closed-period final value
    (charting/server.py:359-411)."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("event_type").orderBy("ts", "event_id")
    epoch = F.date_trunc("hour", F.col("ts"))
    out = ev.select(
        "event_type",
        "ts",
        "event_id",
        "value",
        epoch.alias("epoch"),
        F.lag(epoch).over(w).alias("prev_epoch"),
        F.lag("value").over(w).alias("prev_value"),
        F.lag("event_id").over(w).alias("prev_event_id"),
    )
    return out.filter(
        F.col("prev_epoch").isNotNull() & (F.col("epoch") != F.col("prev_epoch"))
    ).select(
        "event_type",
        F.col("ts").alias("advance_ts"),
        "prev_event_id",
        F.col("prev_value").alias("period_close"),
    )


@_q(
    "union_timeframes",
    """
    WITH hourly AS (
      SELECT event_type AS symbol, date_trunc('hour', ts) AS time,
             round(sum(value), 6) AS bucket_value,
             3600000 AS interval_ms
      FROM events GROUP BY 1, 2
    ), daily AS (
      SELECT event_type AS symbol, CAST(date_trunc('day', ts) AS TIMESTAMP) AS time,
             round(sum(value), 6) AS bucket_value,
             86400000 AS interval_ms
      FROM events GROUP BY 1, 2
    )
    SELECT * FROM hourly UNION ALL SELECT * FROM daily
    """,
)
def union_timeframes(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO2/O5 multi-timeframe union with interval tags (the replay
    interleave's relational core, replay.py:173-203)."""
    ev = load_table(spark, "events", sf_dir)

    def bucketed(trunc: str, ms: int) -> DataFrame:
        return ev.groupBy(
            F.col("event_type").alias("symbol"),
            F.date_trunc(trunc, F.col("ts")).alias("time"),
        ).agg(
            F.round(F.sum("value"), 6).alias("bucket_value"),
        ).withColumn("interval_ms", F.lit(ms))

    return bucketed("hour", 3_600_000).unionByName(bucketed("day", 86_400_000))


@_q(
    "merge_prefer_streamer",
    """
    WITH p AS (
      SELECT user_id, event_id, ts,
             CASE WHEN event_id % 3 = 0 THEN NULL
                  ELSE 'S' || event_id END AS streamer_symbol
      FROM events
    )
    SELECT user_id, event_id, streamer_symbol
    FROM p
    QUALIFY row_number() OVER (
      PARTITION BY user_id
      ORDER BY (streamer_symbol IS NULL), ts DESC, event_id DESC) = 1
    """,
)
def merge_prefer_streamer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D4 duplicate-position merge: prefer the record carrying a
    streamer_symbol (positions.py:536-554), tiebreak newest."""
    from tastytrade_sdk_spark.operators.dedup import merge_prefer_non_null

    ev = load_table(spark, "events", sf_dir)
    streamer = F.when(F.col("event_id") % 3 == 0, F.lit(None)).otherwise(
        F.concat(F.lit("S"), F.col("event_id"))
    )
    p = ev.select("user_id", "event_id", "ts", streamer.alias("streamer_symbol"))
    return merge_prefer_non_null(
        p, ["user_id"], "streamer_symbol", ["ts", "event_id"]
    ).select("user_id", "event_id", "streamer_symbol")


@_q(
    "compact_decode_roundtrip",
    """
    SELECT event_id, event_type, value, ts FROM events
    """,
)
def compact_decode_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 COMPACT positional decode: pack pairs of events into flat
    string arrays (the wire format), decode back through the
    schema-projected parser — output must equal the source rows."""
    from pyspark.sql import types as T

    from tastytrade_sdk_spark.sources.compact import decode_compact

    ev = load_table(spark, "events", sf_dir)
    fields = F.array(
        F.col("event_id").cast("string"),
        F.col("event_type"),
        F.col("value").cast("string"),
        F.date_format(F.col("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS"),
    )
    packed = (
        ev.select((F.col("event_id") / 2).cast("long").alias("pair"),
                  F.col("event_id").alias("eid"), fields.alias("f"))
        .groupBy("pair")
        .agg(
            F.flatten(
                F.transform(
                    F.sort_array(F.collect_list(F.struct("eid", "f"))),
                    lambda s: s["f"],
                )
            ).alias("data")
        )
    )
    schema = T.StructType(
        [
            T.StructField("event_id", T.LongType()),
            T.StructField("event_type", T.StringType()),
            T.StructField("value", T.DoubleType()),
            T.StructField("ts", T.TimestampType()),
        ]
    )
    return decode_compact(packed, "data", schema, corrupt_col=None)


@_q(
    "option_chain_flatten",
    """
    WITH c AS (
      SELECT l_suppkey AS root,
             CAST(l_shipdate AS DATE) AS expiration_date,
             date_diff('day', DATE '1995-01-01', CAST(l_shipdate AS DATE)) AS days_to_expiration,
             round(l_extendedprice / 100, 0) AS strike_price,
             'C' || l_orderkey || '-' || l_linenumber AS call_sym,
             'P' || l_orderkey || '-' || l_linenumber AS put_sym
      FROM lineitem
    )
    SELECT root, expiration_date, days_to_expiration, strike_price,
           'C' AS option_type, call_sym AS symbol FROM c
    UNION ALL
    SELECT root, expiration_date, days_to_expiration, strike_price,
           'P' AS option_type, put_sym AS symbol FROM c
    """,
)
def option_chain_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S8 nested chain flatten: build the roots->expirations->strikes->
    {call,put} nesting from lineitem, then explode back to one row per
    contract — output must equal the direct flat derivation."""
    from tastytrade_sdk_spark.sources.chains import flatten_chain

    li = load_table(spark, "lineitem", sf_dir)
    base = li.select(
        F.col("l_suppkey").alias("root"),
        F.col("l_shipdate").cast("date").alias("expiration_date"),
        F.datediff(F.col("l_shipdate").cast("date"), F.lit("1995-01-01").cast("date")).alias(
            "days_to_expiration"
        ),
        F.round(F.col("l_extendedprice") / 100, 0).alias("strike_price"),
        F.concat(F.lit("C"), F.col("l_orderkey"), F.lit("-"), F.col("l_linenumber")).alias(
            "call"
        ),
        F.concat(F.lit("P"), F.col("l_orderkey"), F.lit("-"), F.col("l_linenumber")).alias(
            "put"
        ),
    )
    # single-partition input + hash partitioning on root satisfies the
    # clustering requirement of BOTH groupBys (root is a subset of each
    # key set), so the whole nested build runs with exactly one exchange
    # and full map-side parallelism
    base = base.repartition(
        spark.sparkContext.defaultParallelism, F.col("root")
    )
    strikes = base.groupBy("root", "expiration_date", "days_to_expiration").agg(
        F.collect_list(F.struct("strike_price", "call", "put")).alias("strikes")
    )
    nested = strikes.groupBy("root").agg(
        F.collect_list(
            F.struct("expiration_date", "days_to_expiration", "strikes")
        ).alias("expirations")
    )
    return flatten_chain(nested)


@_q(
    "props_json_parse",
    """
    SELECT event_id,
           json_extract_string(props, '$.k')::BIGINT AS k
    FROM events
    """,
)
def props_json_parse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S5/§2.9 JSON boundary parse: from_json with a declared schema
    (permissive — bad rows give NULLs, redis.py:28 round-trip)."""
    from pyspark.sql import types as T

    from tastytrade_sdk_spark.sources.compact import parse_json_events

    ev = load_table(spark, "events", sf_dir)
    return parse_json_events(
        ev,
        "props",
        T.StructType([T.StructField("k", T.LongType())]),
        keep_cols=["event_id"],
    )


_STRAT_TYPES = [
    "Bear Call Spread", "Bull Put Spread", "Iron Condor", "Iron Butterfly",
    "Short Strangle", "Naked Call", "Bull Call Spread", "Bear Put Spread",
    "Call Butterfly", "Broken Fly", "Jade Lizard", "Long Call",
]

_STRAT_CASE_SQL = "CASE o_orderkey % 12 " + " ".join(
    f"WHEN {i} THEN '{t}'" for i, t in enumerate(_STRAT_TYPES)
) + " END"


@_q(
    "strategy_max_profit_loss",
    f"""
    WITH s AS (
      SELECT o_orderkey,
             {_STRAT_CASE_SQL} AS strategy_type,
             round(o_totalprice % 50, 2) + 1 AS width,
             round((o_totalprice % 50) * 0.4, 2) AS narrow_width,
             round(o_totalprice % 50, 2) + 1 - round((o_totalprice % 50) * 0.4, 2) AS wider_wing,
             round(o_totalprice % 40, 2) + 1 AS put_width,
             round(o_totalprice % 45, 2) + 1 AS call_width,
             -- no rounding here: round(tp/100, 2) creates .xx5 ties where
             -- Spark and DuckDB disagree at ~1ulp; the raw double is
             -- bit-identical across engines
             (o_totalprice / 100)
               * (CASE WHEN o_orderstatus = 'F' THEN 1 ELSE -1 END) AS net_credit,
             100 AS mult,
             (o_custkey % 3) + 1 AS qty
      FROM orders
    )
    SELECT o_orderkey, strategy_type,
      CASE
        WHEN strategy_type IN ('Bear Call Spread','Bull Put Spread','Iron Condor',
             'Iron Butterfly','Iron Broken Fly','Short Strangle','Short Straddle',
             'Naked Call','Naked Put','Jade Lizard')
          THEN round(greatest(net_credit, 0), 0)
        WHEN strategy_type IN ('Bull Call Spread','Bear Put Spread')
          THEN round(greatest(width * mult * qty + net_credit, 0), 0)
        WHEN strategy_type IN ('Call Butterfly','Put Butterfly','Broken Fly')
          THEN round(greatest(narrow_width * mult * qty + net_credit, 0), 0)
      END AS max_profit,
      CASE
        WHEN strategy_type IN ('Naked Call','Naked Put','Short Strangle','Short Straddle')
          THEN NULL
        WHEN strategy_type IN ('Bear Call Spread','Bull Put Spread')
          THEN round(greatest(width * mult * qty - net_credit, 0), 0)
        WHEN strategy_type IN ('Bull Call Spread','Bear Put Spread')
          THEN round(greatest(-net_credit, 0), 0)
        WHEN strategy_type IN ('Iron Condor','Iron Butterfly','Iron Broken Fly')
          THEN round(greatest(greatest(put_width, call_width) * mult * qty - net_credit, 0), 0)
        WHEN strategy_type = 'Jade Lizard'
          THEN round(greatest(width * mult * qty - net_credit, 0), 0)
        WHEN strategy_type IN ('Call Butterfly','Put Butterfly','Broken Fly')
          THEN round(greatest(wider_wing * mult * qty
               - coalesce(round(greatest(narrow_width * mult * qty + net_credit, 0), 0), 0), 0), 0)
      END AS max_loss
    FROM s
    """,
)
def strategy_max_profit_loss(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 max-profit/max-loss case ladders
    (strategies/models.py:295-452) over synthesized strategy rows —
    credit/debit/iron/butterfly arithmetic with unlimited-risk NULLs."""
    from tastytrade_sdk_spark.functions.strategy_pnl import (
        max_loss_col,
        max_profit_col,
    )

    orders = load_table(spark, "orders", sf_dir)
    st = F.col("o_orderkey") % 12
    stype = F.lit(None).cast("string")
    for i, t in enumerate(_STRAT_TYPES):
        stype = F.when(st == i, t).otherwise(stype)
    width = F.round(F.col("o_totalprice") % 50, 2) + 1
    narrow = F.round((F.col("o_totalprice") % 50) * 0.4, 2)
    s = orders.select(
        "o_orderkey",
        stype.alias("strategy_type"),
        width.alias("width"),
        narrow.alias("narrow_width"),
        (width - narrow).alias("wider_wing"),
        (F.round(F.col("o_totalprice") % 40, 2) + 1).alias("put_width"),
        (F.round(F.col("o_totalprice") % 45, 2) + 1).alias("call_width"),
        (
            (F.col("o_totalprice") / 100)
            * F.when(F.col("o_orderstatus") == "F", 1).otherwise(-1)
        ).alias("net_credit"),
        F.lit(100).alias("mult"),
        ((F.col("o_custkey") % 3) + 1).alias("qty"),
    )
    return s.select(
        "o_orderkey",
        "strategy_type",
        max_profit_col(
            F.col("strategy_type"), F.col("net_credit"), F.col("width"),
            F.col("narrow_width"), F.col("mult"), F.col("qty"),
        ).alias("max_profit"),
        max_loss_col(
            F.col("strategy_type"), F.col("net_credit"), F.col("width"),
            F.col("put_width"), F.col("call_width"), F.col("narrow_width"),
            F.col("wider_wing"), F.col("mult"), F.col("qty"),
        ).alias("max_loss"),
    )


@_q(
    "position_summary",
    """
    WITH legs AS (
      SELECT user_id,
             CASE WHEN event_id % 5 = 0 THEN NULL
                  ELSE CAST(round(value * 100) AS BIGINT) END AS delta4,
             (event_id % 4) + 1 AS qty,
             CASE WHEN event_id % 2 = 0 THEN 'Long' ELSE 'Short' END AS direction,
             event_type, event_id
      FROM events
    )
    SELECT user_id,
           CAST(sign(CAST(sum(delta4 * qty) AS BIGINT))
                * ((abs(CAST(sum(delta4 * qty) AS BIGINT)) + 50) // 100)
                AS DOUBLE) / 100
             AS net_delta,
           count(*) AS num_legs,
           string_agg(qty || 'x ' || direction || ' ' || event_type, ', '
                      ORDER BY event_id) AS legs
    FROM legs GROUP BY user_id
    """,
)
def position_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 position summary by underlying: net_delta = sum(delta*qty)
    with nulls skipped, leg count, and the ordered human-readable leg
    list (positions.py:67-95)."""
    ev = load_table(spark, "events", sf_dir)
    # delta = round(value/100, 4) carried as a SCALED 1e-4 integer
    # (value has 2dp, so value*100 == delta*1e4 exactly): the sum is
    # exact integer math, and the 2dp half-up round happens in integer
    # space — double rounding at a decimal boundary is where Spark
    # (shortest-repr BigDecimal) and DuckDB (binary value) disagree,
    # and a 4dp-sum lands exactly on a .005 boundary ~1% of the time
    delta4 = F.when(F.col("event_id") % 5 == 0, F.lit(None)).otherwise(
        F.round(F.col("value") * 100).cast("long")
    )
    qty = (F.col("event_id") % 4) + 1
    direction = F.when(F.col("event_id") % 2 == 0, "Long").otherwise("Short")
    leg_str = F.concat(
        qty.cast("string"), F.lit("x "), direction, F.lit(" "), F.col("event_type")
    )
    legs = ev.select(
        "user_id", delta4.alias("delta4"), qty.alias("qty"),
        leg_str.alias("leg_str"), "event_id",
    )
    ordered_legs = F.array_join(
        F.transform(
            F.sort_array(F.collect_list(F.struct("event_id", "leg_str"))),
            lambda s: s["leg_str"],
        ),
        ", ",
    )
    # sign-aware scaled round (half away from zero, mirrored in the
    # oracle): floor((s+50)/100) alone would round negative .xx5
    # midpoints toward +infinity — latent divergence if signed deltas
    # ever appear (today delta4 >= 0 so both forms agree)
    s = F.sum(F.col("delta4") * F.col("qty"))
    return legs.groupBy("user_id").agg(
        (
            (F.signum(s) * F.floor((F.abs(s) + 50) / 100))
            .cast("double") / 100
        ).alias("net_delta"),
        F.count(F.lit(1)).alias("num_legs"),
        ordered_legs.alias("legs"),
    )


@_q(
    "positions_latest_quote_join",
    """
    WITH latest AS (
      SELECT user_id, value, ts
      FROM events WHERE event_type = 'view'
      QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT c.c_custkey, c.c_name, c.c_acctbal,
           l.value AS quote_value,
           round((c.c_acctbal + coalesce(l.value, 0)) / 2, 10) AS mid
    FROM customer c LEFT JOIN latest l ON c.c_custkey = l.user_id
    """,
)
def positions_latest_quote_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J1 positions x latest-quotes left join (metrics.py:158-173):
    unmatched keys keep NULL quotes; mid-price projection on top."""
    from tastytrade_sdk_spark.operators.dedup import latest_per_key

    cust = load_table(spark, "customer", sf_dir)
    ev = load_table(spark, "events", sf_dir)
    latest = latest_per_key(
        ev.filter(F.col("event_type") == "view"), ["user_id"], ["ts", "event_id"]
    ).select("user_id", F.col("value").alias("quote_value"))
    joined = cust.join(
        F.broadcast(latest), cust.c_custkey == latest.user_id, "left"
    )
    return joined.select(
        "c_custkey", "c_name", "c_acctbal", "quote_value",
        F.round((F.col("c_acctbal") + F.coalesce(F.col("quote_value"), F.lit(0))) / 2, 10).alias("mid"),
    )


@_q(
    "channel_pattern_filter",
    """
    WITH ch AS (
      SELECT event_id,
             'market:' || event_type || ':U' || user_id AS channel
      FROM events
    )
    SELECT event_id, channel FROM ch
    WHERE regexp_matches(channel, '^market:(purchase|view):U1[0-9]$')
    """,
)
def channel_pattern_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5 pub/sub channel pattern filter (subscriptions.py:115-122):
    rlike over synthesized market:{type}:{symbol} channel names."""
    ev = load_table(spark, "events", sf_dir)
    channel = F.concat(
        F.lit("market:"), F.col("event_type"), F.lit(":U"), F.col("user_id")
    )
    return (
        ev.select("event_id", channel.alias("channel"))
        .filter(F.col("channel").rlike(r"^market:(purchase|view):U1[0-9]$"))
    )


@_q(
    "strategy_health_alerts",
    f"""
    WITH s AS (
      SELECT o_orderkey,
             {_STRAT_CASE_SQL} AS strategy_type,
             CAST(o_orderkey % 40 AS INT) AS days_to_expiration,
             round((o_totalprice % 200 - 100) / 100, 4) AS net_delta,
             (o_custkey % 3) + 1 AS quantity
      FROM orders
    ), th AS (
      SELECT *,
             CASE WHEN strategy_type = 'Iron Condor' THEN 21 ELSE 14 END AS dte_warning,
             CASE WHEN strategy_type = 'Iron Condor' THEN 10 ELSE 7 END AS dte_critical,
             0.30 AS drift_warning,
             CASE WHEN strategy_type = 'Short Strangle' THEN 0.40 ELSE 0.50 END AS drift_critical
      FROM s
    ), alerts AS (
      SELECT o_orderkey, strategy_type, 'dte' AS alert_kind,
             CASE WHEN days_to_expiration <= dte_critical THEN 'CRITICAL'
                  WHEN days_to_expiration <= dte_warning THEN 'WARNING' END AS level
      FROM th
      UNION ALL
      SELECT o_orderkey, strategy_type, 'delta_drift' AS alert_kind,
             CASE WHEN strategy_type IN ('Long Stock','Short Stock','Long Crypto',
                       'Short Crypto','Long Future','Short Future','Covered Call',
                       'Protective Put') THEN NULL
                  WHEN abs(net_delta / quantity) > drift_critical THEN 'CRITICAL'
                  WHEN abs(net_delta / quantity) > 0.30 THEN 'WARNING' END AS level
      FROM th
    )
    SELECT o_orderkey, strategy_type, alert_kind, level
    FROM alerts WHERE level IS NOT NULL
    """,
)
def strategy_health_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.9 health thresholds (health.py:28-199): DTE + per-position
    delta-drift alerts with per-type overrides and delta-1/covered
    exemptions."""
    from tastytrade_sdk_spark.functions.health import health_alerts

    orders = load_table(spark, "orders", sf_dir)
    st = F.col("o_orderkey") % 12
    stype = F.lit(None).cast("string")
    for i, t in enumerate(_STRAT_TYPES):
        stype = F.when(st == i, t).otherwise(stype)
    s = orders.select(
        "o_orderkey",
        stype.alias("strategy_type"),
        (F.col("o_orderkey") % 40).cast("int").alias("days_to_expiration"),
        F.round((F.col("o_totalprice") % 200 - 100) / 100, 4).alias("net_delta"),
        ((F.col("o_custkey") % 3) + 1).alias("quantity"),
    )
    return health_alerts(
        s,
        overrides={
            "Iron Condor": {"dte_warning": 21, "dte_critical": 10},
            "Short Strangle": {"delta_drift_critical": 0.40},
        },
        keep_cols=["o_orderkey", "strategy_type"],
    )


@_q(
    "rollup_order_revenue",
    """
    SELECT o_orderstatus, o_orderpriority,
           CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS revenue,
           count(*) AS n_orders
    FROM orders
    GROUP BY ROLLUP (o_orderstatus, o_orderpriority)
    """,
)
def rollup_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SURVEY §2.5 noted the reference has no grouping sets but the
    engine gets rollup/cube free from Spark — demonstrated here:
    hierarchical subtotals in one pass (partial aggregation per
    grouping set, no repeated scans), value-matched against DuckDB's
    ROLLUP."""
    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.rollup("o_orderstatus", "o_orderpriority")
        .agg(
            # decimal sum: 150k 2dp terms reach ~3e9 in the grand-total
            # row — double summation noise exceeds the 2dp margin there
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
    )


@_q(
    "session_window_activity",
    """
    WITH e AS (
      SELECT user_id, make_timestamp(epoch_ns(ts) // 1000) AS ts, value
      FROM events
    ), flagged AS (
      SELECT user_id, ts, value,
             CASE WHEN lag(ts) OVER w IS NULL THEN 1
                  WHEN ts >= lag(ts) OVER w + INTERVAL 30 MINUTE THEN 1
                  ELSE 0 END AS new_session
      FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts)
    ), ids AS (
      SELECT user_id, ts, value,
             sum(new_session) OVER (PARTITION BY user_id ORDER BY ts
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS sid
      FROM flagged
    )
    SELECT user_id,
           min(ts) AS session_start,
           max(ts) + INTERVAL 30 MINUTE AS session_end,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM ids
    GROUP BY user_id, sid
    """,
)
def session_window_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 noted the reference computes tumbling windows only; Spark
    adds session windows free — demonstrated with a 30-minute-gap
    session aggregation per user. The oracle is the classic islands
    rewrite (gap flag -> running sum -> group), which is also exactly
    how the operator behaves at scale: one shuffle on the user key,
    sessions formed within partitions. Session end = last event + gap
    (half-open, an event landing exactly at the end starts a new
    session)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.session_window(F.col("ts"), "30 minutes").alias("w"), F.col("user_id")
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


@_q(
    "sliding_window_counts",
    """
    WITH e AS (
      SELECT event_type, epoch_ms(ts) AS tms, value FROM events
    ), expanded AS (
      -- an event at t belongs to the 4 hour-long windows starting at
      -- 15-min slides in (t-1h, t]
      SELECT event_type, value,
             unnest(generate_series(
               ((tms - 3600000) // 900000 + 1) * 900000,
               (tms // 900000) * 900000,
               900000)) AS wstart
      FROM e
    )
    SELECT event_type,
           make_timestamp(wstart * 1000) AS window_start,
           count(*) AS n_events,
           round(sum(value), 6) AS total_value
    FROM expanded
    GROUP BY 1, 2
    """,
)
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST4 freebie #2: hopping windows (1h length, 15m slide) — each
    event contributes to length/slide windows; Spark's window()
    generates the assignment without a join, the oracle expands via
    generate_series. One shuffle on (type, window)."""
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.groupBy(
            F.window(F.col("ts"), "1 hour", "15 minutes").alias("w"),
            F.col("event_type"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("total_value"),
        )
        .select(
            "event_type",
            F.col("w.start").alias("window_start"),
            "n_events",
            "total_value",
        )
    )


@_q(
    "salted_skew_aggregate",
    """
    WITH e AS (
      SELECT CASE WHEN user_id % 10 < 9 THEN 'HOT'
                  ELSE 'u' || user_id END AS sym,
             value
      FROM events
    )
    SELECT sym,
           round(sum(value), 6) AS total,
           count(*) AS n,
           round(min(value), 6) AS vmin,
           round(max(value), 6) AS vmax
    FROM e GROUP BY sym
    """,
)
def salted_skew_aggregate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-resistant two-stage aggregation (operators/scale.py):
    ~90% of rows share one hot key, which a plain groupBy would send
    to a single task; salting spreads each key over 16 sub-groups and
    merges algebraic partials. Result equals the plain aggregation —
    which is exactly what the oracle checks."""
    from tastytrade_sdk_spark.operators.scale import salted_groupby

    ev = load_table(spark, "events", sf_dir)
    e = ev.select(
        F.when(F.col("user_id") % 10 < 9, "HOT")
        .otherwise(F.concat(F.lit("u"), F.col("user_id")))
        .alias("sym"),
        "value",
    )
    out = salted_groupby(
        e,
        ["sym"],
        {
            "total": ("sum", "value"),
            "n": ("count", "value"),
            "vmin": ("min", "value"),
            "vmax": ("max", "value"),
        },
        n_salts=16,
    )
    return out.select(
        "sym",
        F.round("total", 6).alias("total"),
        "n",
        F.round("vmin", 6).alias("vmin"),
        F.round("vmax", 6).alias("vmax"),
    )


@_q(
    "account_order_fills",
    """
    WITH legs AS (
      SELECT l_orderkey AS id,
             CAST(l_linenumber AS BIGINT) AS leg_index,
             l_quantity AS q,
             l_extendedprice AS price,
             floor(l_quantity / 2) AS q1
      FROM lineitem
    ), fills AS (
      SELECT id, leg_index, q1 AS fq, price FROM legs WHERE q1 > 0
      UNION ALL
      SELECT id, leg_index, q - q1 AS fq, price FROM legs WHERE q - q1 > 0
    )
    SELECT f.id AS order_id,
           'ACC' || CAST(o.o_custkey AS VARCHAR) AS account_number,
           o.o_orderstatus AS status,
           CAST(count(DISTINCT f.leg_index) AS BIGINT) AS n_legs,
           CAST(count(*) AS BIGINT) AS n_fills,
           CAST(sum(CAST(f.fq AS DECIMAL(18,2))) AS DOUBLE) AS filled_qty,
           CAST(sum(CAST(f.fq AS DECIMAL(18,2)) * CAST(f.price AS DECIMAL(18,2)))
                AS DOUBLE) AS notional
    FROM fills f JOIN orders o ON o.o_orderkey = f.id
    GROUP BY 1, 2, 3
    """,
)
def account_order_fills(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S10 typed account-event envelope: build nested PlacedOrder
    order->leg->fill envelopes (reference accounts/models.py:813-946),
    unwind them with the explode path, and summarize fills per order.

    The nest (two keyed collect_list shuffles) -> explode (narrow)
    round-trip is the load-bearing part; the oracle computes the same
    summary flat, so a hash match proves the envelope is lossless.
    Fill synthesis (both engines): each leg splits into floor(q/2) and
    q - floor(q/2) fills at the leg's extended price, zero-qty fills
    dropped. DECIMAL money math for the sums (campaign_summary rule).
    """
    from tastytrade_sdk_spark.sources.accounts import (
        explode_order_fills,
        nest_order_envelope,
    )

    li = load_table(spark, "lineitem", sf_dir)
    o = load_table(spark, "orders", sf_dir)

    q1 = F.floor(F.col("l_quantity") / 2).cast("double")
    base = li.select(
        F.col("l_orderkey").alias("id"),
        F.col("l_linenumber").cast("long").alias("leg_index"),
        F.when(F.col("l_linenumber") % 2 == 0, F.lit("Equity Option"))
        .otherwise(F.lit("Equity"))
        .alias("instrument_type"),
        F.concat(F.lit("P"), F.col("l_partkey")).alias("symbol"),
        F.when(F.col("l_returnflag") == "R", F.lit("Sell to Close"))
        .otherwise(F.lit("Buy to Open"))
        .alias("action"),
        F.col("l_quantity").alias("quantity"),
        q1.alias("q1"),
        (F.col("l_quantity") - q1).alias("q2"),
        F.col("l_extendedprice").alias("price"),
    )
    # One exchange for the whole nest/explode pipeline: partitioning by
    # id BEFORE the fill-explode (half the rows cross the wire) also
    # satisfies the leg-level groupBy (keys ⊇ id), the order-level
    # collect_list, and — via the partitioning-preserving broadcast
    # join — the final per-order aggregate. Without it the plan
    # shuffles twice more, post-explode, on wider keys.
    base = base.repartition(F.col("id"))
    fid = F.concat(F.lit("F"), F.col("id"), F.lit("-"), F.col("leg_index"))
    fills = base.select(
        "id", "leg_index", "instrument_type", "symbol", "action", "quantity",
        F.explode(
            F.array(
                F.struct(
                    F.concat(fid, F.lit("-A")).alias("fill_id"),
                    F.col("q1").alias("fill_quantity"),
                    F.col("price").alias("fill_price"),
                ),
                F.struct(
                    F.concat(fid, F.lit("-B")).alias("fill_id"),
                    F.col("q2").alias("fill_quantity"),
                    F.col("price").alias("fill_price"),
                ),
            )
        ).alias("fill"),
    ).select(
        "id", "leg_index", "instrument_type", "symbol", "action", "quantity",
        F.col("fill.fill_id").alias("fill_id"),
        F.col("fill.fill_quantity").alias("fill_quantity"),
        F.col("fill.fill_price").alias("fill_price"),
    ).filter(F.col("fill_quantity") > 0)

    nested = nest_order_envelope(fills)
    env = nested.join(o, nested["id"] == o["o_orderkey"]).select(
        F.struct(
            F.col("id"),
            F.concat(F.lit("ACC"), F.col("o_custkey")).alias("account_number"),
            F.lit("Limit").alias("order_type"),
            F.lit("Day").alias("time_in_force"),
            F.col("o_totalprice").alias("price"),
            F.lit("Debit").alias("price_effect"),
            F.col("o_orderstatus").alias("status"),
            F.lit(True).alias("cancellable"),
            F.lit(False).alias("editable"),
            F.lit(None).cast("string").alias("underlying_symbol"),
            F.col("legs"),
        ).alias("order")
    )
    flat = explode_order_fills(env)
    qd = F.col("fill_quantity").cast("decimal(18,2)")
    pd_ = F.col("fill_price").cast("decimal(18,2)")
    return flat.groupBy(
        F.col("order_id"), F.col("account_number"), F.col("status")
    ).agg(
        F.countDistinct("leg_index").alias("n_legs"),
        F.count(F.lit(1)).alias("n_fills"),
        F.sum(qd).cast("double").alias("filled_qty"),
        F.sum(qd * pd_).cast("double").alias("notional"),
    )


@_q(
    "trade_chain_rollforward",
    """
    WITH nodes AS (
      SELECT o_custkey, o_orderkey, o_orderdate,
             (o_orderstatus = 'O') AS is_open,
             CASE WHEN o_orderstatus = 'F' THEN o_totalprice::DECIMAL(18,2)
                  ELSE -(o_totalprice::DECIMAL(18,2)) END AS signed_cost,
             (o_orderkey % 3 = 0) AS roll
      FROM orders
    )
    SELECT 'CH' || CAST(o_custkey AS VARCHAR) AS chain_id,
           CAST(count(*) AS BIGINT) AS n_nodes,
           bool_or(is_open) AS open,
           CAST(sum(signed_cost) AS DOUBLE) AS realized_gain,
           CASE WHEN sum(signed_cost) >= 0 THEN 'Credit' ELSE 'Debit' END
             AS realized_gain_effect,
           (sum(signed_cost) > 0) AS winner_realized,
           CAST(count(*) FILTER (WHERE roll) AS BIGINT) AS roll_count,
           min(o_orderdate) AS opened_at,
           max(o_orderdate) AS last_occurred_at
    FROM nodes GROUP BY o_custkey
    """,
)
def trade_chain_rollforward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trade-chain lifecycle rollforward (reference
    accounts/models.py:995-1146 TradeChain/TradeChainComputedData):
    per-account node arrays built with one keyed collect_list, then
    the chain's computed data (open flag, Credit/Debit-signed realized
    gain, winner flags, roll count, opened/last timestamps) derived
    ENTIRELY from the nested node array via higher-order expressions
    (sources/accounts.chain_computed_data) — no second shuffle, codegen
    throughout. The oracle computes the same rollforward flat, so a
    hash match proves the nested derivation. Node synthesis (both
    engines): order -> node, 'open-positions' iff status 'O', Credit
    iff 'F', roll iff orderkey % 3 = 0. DECIMAL money in the fold.
    """
    from tastytrade_sdk_spark.sources.accounts import chain_computed_data

    o = load_table(spark, "orders", sf_dir)
    node = F.struct(
        F.col("o_orderdate").alias("occurred_at"),
        F.col("o_orderkey").alias("node_id"),
        F.when(F.col("o_orderstatus") == "O", F.lit("open-positions"))
        .otherwise(F.lit("order"))
        .alias("node_type"),
        F.col("o_orderpriority").alias("description"),
        F.col("o_totalprice").alias("total_fill_cost"),
        F.when(F.col("o_orderstatus") == "F", F.lit("Credit"))
        .otherwise(F.lit("Debit"))
        .alias("total_fill_cost_effect"),
        (F.col("o_orderkey") % 3 == 0).alias("roll"),
    )
    chains = o.groupBy("o_custkey").agg(
        F.array_sort(F.collect_list(node)).alias("lite_nodes")
    )
    nodes = F.col("lite_nodes")
    cd = chain_computed_data(nodes)
    return chains.select(
        F.concat(F.lit("CH"), F.col("o_custkey")).alias("chain_id"),
        F.size(nodes).cast("long").alias("n_nodes"),
        cd.getField("open").alias("open"),
        cd.getField("realized_gain").alias("realized_gain"),
        cd.getField("realized_gain_effect").alias("realized_gain_effect"),
        cd.getField("winner_realized").alias("winner_realized"),
        cd.getField("roll_count").alias("roll_count"),
        cd.getField("opened_at").alias("opened_at"),
        cd.getField("last_occurred_at").alias("last_occurred_at"),
    )
