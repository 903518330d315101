"""Declared correctness queries — SURVEY §2's [Q] inventory, expressed
over the driver's synthetic tables.

Every entry in ``QUERIES`` is a (spark, sf_dir) -> DataFrame program;
``ORACLE_SQL`` holds the equivalent DuckDB SQL over the same parquet
views. The driver hash-compares both at sf=0.01 (column names sorted,
order-insensitive values) — so every computed column is aliased
identically on both sides.

Domain mapping onto the synthetic tables:
- ``events``  : the market-event stream. ``user_id`` plays the symbol
  key, ``ts`` the event time, ``value`` the price, ``event_id`` the
  arrival sequence (FIXTURES.md requires an explicit arrival order for
  keep-last semantics).
- ``lineitem``/``orders``/dims: the account/position analytical side
  (grouped aggregations, dimensional joins).
- ``documents``/``embeddings``: the training-data-pipeline operators.

Float-parity convention: double aggregates are rounded AT THE SAME
SITE on both sides (Spark ``round`` / DuckDB ``round``), with the
quantum chosen so IEEE summation-order noise (~1e-9 relative) is far
below it. Rounding sites are part of each query's contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tastytrade_sdk_spark.operators.asof import asof_join
from tastytrade_sdk_spark.operators.candles import ohlcv
from tastytrade_sdk_spark.operators.dedup import keep_last, retention_cap
from tastytrade_sdk_spark.operators.gapfill import gap_fill
from tastytrade_sdk_spark.sources.tables import load_table

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLE_SQL: dict[str, str] = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE_SQL[name] = oracle
        return fn

    return deco


# ---------------------------------------------------------------------------
# Relational core — aggregations over lineitem/orders (A1-A4/A6 analogs)
# ---------------------------------------------------------------------------


@_q(
    "pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           round(sum(l_quantity), 2)                                        AS sum_qty,
           round(sum(l_extendedprice), 2)                                   AS sum_base_price,
           round(sum(l_extendedprice * (1 - l_discount)), 2)                AS sum_disc_price,
           round(sum(l_extendedprice * (1 - l_discount) * (1 + l_tax)), 2)  AS sum_charge,
           round(avg(l_quantity), 6)                                        AS avg_qty,
           round(avg(l_extendedprice), 6)                                   AS avg_price,
           round(avg(l_discount), 6)                                        AS avg_disc,
           count(*)                                                         AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: grouped conditional sums (SURVEY A1-A4 analog).

    Scale notes: map-side partial aggregation, one shuffle on the
    2-value group key; the shipdate filter and 7-column projection push
    to the parquet scan.
    """
    li = load_table(spark, "lineitem", sf_dir)
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_price), 2).alias("sum_disc_price"),
            F.round(F.sum(disc_price * (1 + F.col("l_tax"))), 2).alias("sum_charge"),
            F.round(F.avg("l_quantity"), 6).alias("avg_qty"),
            F.round(F.avg("l_extendedprice"), 6).alias("avg_price"),
            F.round(F.avg("l_discount"), 6).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


@_q(
    "nation_revenue",
    """
    SELECT n_name AS nation,
           round(sum(l_extendedprice * (1 - l_discount)), 2) AS revenue,
           count(DISTINCT o_orderkey)                        AS n_orders
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN nation   ON c_nationkey = n_nationkey
    GROUP BY n_name
    """,
)
def nation_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensional join chain (J1/J3/J8 analog): fact ⋈ broadcast dims.

    customer/nation are broadcast — no shuffle of lineitem for the
    dim joins; the only shuffle is the final group-by.
    """
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir)
    nation = load_table(spark, "nation", sf_dir)
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy(F.col("n_name").alias("nation"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@_q(
    "supplier_weighted_price",
    """
    SELECT l_suppkey,
           round(sum(l_extendedprice * l_quantity) / sum(l_quantity), 6) AS weighted_price,
           round(sum(l_quantity), 2)                                     AS total_qty
    FROM lineitem
    GROUP BY l_suppkey
    """,
)
def supplier_weighted_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted-average price per supplier (A5's weighted-price /
    A6 per-leg fill aggregation: sum(p*q)/sum(q))."""
    li = load_table(spark, "lineitem", sf_dir)
    return li.groupBy("l_suppkey").agg(
        F.round(
            F.sum(F.col("l_extendedprice") * F.col("l_quantity"))
            / F.sum("l_quantity"),
            6,
        ).alias("weighted_price"),
        F.round(F.sum("l_quantity"), 2).alias("total_qty"),
    )


# ---------------------------------------------------------------------------
# Dedup / keep-last (D1/D2/O3) over the event stream
# ---------------------------------------------------------------------------


@_q(
    "latest_event_per_user",
    """
    SELECT user_id,
           event_id   AS last_event_id,
           ts         AS last_ts,
           event_type AS last_event_type,
           value      AS last_value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def latest_event_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D1/O3 latest-value table: keep-last per key with an explicit
    deterministic order (ts, event_id) — the Redis
    'tastytrade:latest:{type}' snapshot semantics."""
    ev = load_table(spark, "events", sf_dir)
    return keep_last(ev, ["user_id"], ["ts", "event_id"]).select(
        "user_id",
        F.col("event_id").alias("last_event_id"),
        F.col("ts").alias("last_ts"),
        F.col("event_type").alias("last_event_type"),
        F.col("value").alias("last_value"),
    )


@_q(
    "keep_last_upsert",
    """
    SELECT user_id, event_type, event_id, ts, value
    FROM events
    QUALIFY row_number() OVER (
        PARTITION BY user_id, event_type ORDER BY ts DESC, event_id DESC) = 1
    """,
)
def keep_last_upsert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """D2 candle-upsert semantics: composite key (user_id, event_type),
    last write wins by (ts, event_id)."""
    ev = load_table(spark, "events", sf_dir)
    return keep_last(ev, ["user_id", "event_type"], ["ts", "event_id"]).select(
        "user_id", "event_type", "event_id", "ts", "value"
    )


@_q(
    "top3_values_per_user",
    """
    SELECT user_id, event_id, value,
           row_number() OVER (PARTITION BY user_id ORDER BY value DESC, event_id) AS rnk
    FROM events
    QUALIFY rnk <= 3
    """,
)
def top3_values_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-K per group (O2 retention cap / O6 closest-match shape)."""
    ev = load_table(spark, "events", sf_dir)
    capped = retention_cap(
        ev, ["user_id"], [F.col("value"), -F.col("event_id")], 3
    )
    w = Window.partitionBy("user_id").orderBy(F.col("value").desc(), F.col("event_id"))
    return capped.select(
        "user_id", "event_id", "value", F.row_number().over(w).alias("rnk")
    )


# ---------------------------------------------------------------------------
# OHLCV candles (A8) + as-of join (J5) + gap fill (W6)
# ---------------------------------------------------------------------------


@_q(
    "ohlcv_hourly",
    """
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
      FROM events
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    )
    SELECT event_type AS symbol, bucket AS time,
           max(CASE WHEN rn_a = 1 THEN value END) AS open,
           max(value)                             AS high,
           min(value)                             AS low,
           max(CASE WHEN rn_d = 1 THEN value END) AS close,
           round(sum(value), 6)                   AS volume,
           count(*)                               AS count
    FROM r
    GROUP BY event_type, bucket
    """,
)
def ohlcv_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8 OHLCV candle construction over the event stream: tumbling
    1-hour buckets, first/last resolved by (ts, event_id)."""
    ev = load_table(spark, "events", sf_dir)
    candles = ohlcv(
        ev,
        symbol_col="event_type",
        time_col="ts",
        price_col="value",
        size_col="value",  # volume := sum(value) for the synthetic stream
        interval="1 hour",
        order_col="event_id",
    )
    return candles.select(
        "symbol",
        "time",
        "open",
        "high",
        "low",
        "close",
        F.round(F.col("volume"), 6).alias("volume"),
        "count",
    )


@_q(
    "asof_entry_price",
    """
    WITH signals AS (
      SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
    ), pricing AS (
      SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'view'
    ), tie AS (
      SELECT user_id, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
      FROM pricing
    )
    SELECT s.user_id, s.event_id, s.ts, s.value,
           p.value AS entry_price
    FROM signals s
    ASOF LEFT JOIN (SELECT * FROM tie WHERE rn = 1) p
      ON s.user_id = p.user_id AND s.ts >= p.ts
    """,
)
def asof_entry_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 backward as-of join — the reference's backtest entry-price
    resolution (most recent pricing row at or before the signal)."""
    ev = load_table(spark, "events", sf_dir)
    signals = ev.filter(F.col("event_type") == "purchase").select(
        "user_id", "event_id", "ts", "value"
    )
    pricing = ev.filter(F.col("event_type") == "view").select(
        "user_id", "ts", "value", "event_id"
    )
    return asof_join(
        signals,
        pricing,
        on=["user_id"],
        left_time="ts",
        right_time="ts",
        value_cols=["value"],
        right_order="event_id",
        suffix="_entry",
    ).withColumnRenamed("value_entry", "entry_price")


@_q(
    "gap_fill_hourly",
    """
    WITH hourly AS (
      SELECT user_id, date_trunc('hour', ts) AS bucket,
             round(sum(value), 6) AS hour_value
      FROM events GROUP BY 1, 2
    ), bounds AS (
      SELECT user_id, min(bucket) AS t0, max(bucket) AS t1 FROM hourly GROUP BY 1
    ), cal AS (
      SELECT user_id, unnest(generate_series(t0, t1, INTERVAL 1 HOUR)) AS bucket
      FROM bounds
    )
    SELECT c.user_id, c.bucket AS time,
           last_value(h.hour_value IGNORE NULLS) OVER (
             PARTITION BY c.user_id ORDER BY c.bucket
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS hour_value,
           (h.hour_value IS NULL) AS is_synthetic
    FROM cal c LEFT JOIN hourly h
      ON c.user_id = h.user_id AND c.bucket = h.bucket
    """,
)
def gap_fill_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6 gap detection + forward fill: dense hourly calendar per key,
    missing buckets forward-filled and flagged."""
    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.round(F.sum("value"), 6).alias("hour_value"))
    filled = gap_fill(
        hourly,
        key_cols=["user_id"],
        time_col="bucket",
        interval="1 hour",
        value_cols=["hour_value"],
        synthetic_flag="is_synthetic",
    )
    return filled.select(
        "user_id", F.col("bucket").alias("time"), "hour_value", "is_synthetic"
    )
