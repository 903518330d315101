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

Grid-boundary rule (bites only at sf0.1+): if the aggregated values
sit on a decimal grid FINER than the rounding site (4dp products
rounded at 2dp, 5dp fees at 2dp), an exact-.xx5 result makes Spark
(shortest-repr BigDecimal rounding) and DuckDB (binary-value rounding)
disagree by one ULP of the site — and large-magnitude sums (1e9+ over
1e5 terms) accumulate noise past the margin. Such money/grid-valued
aggregates run in DECIMAL or scaled-integer arithmetic on BOTH
engines and cast to double after the round (position_summary,
pricing_summary, nation_revenue, campaign_summary). Continuous-valued
aggregates (ratios, averages, indicator folds) stay double.

HARD RULE (r4 regression, CORRECTNESS_r04 pricing_summary): no
declared query may emit a DecimalType OUTPUT column. Decimal is for
internal arithmetic only; the final select casts money columns to
DOUBLE after the round, on BOTH engines. The driver's hasher
canonicalizes DECIMAL result columns differently per engine (float64
on the DuckDB fetch, Python Decimal on Spark), so byte-identical
values still hash-mismatch. tests/test_output_types.py enforces this.
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
           CAST(round(sum(l_extendedprice::DECIMAL(18,2) *
                          (1 - l_discount::DECIMAL(18,2))), 2)
                AS DOUBLE)                                                  AS sum_disc_price,
           CAST(round(sum(l_extendedprice::DECIMAL(18,2) *
                          (1 - l_discount::DECIMAL(18,2)) *
                          (1 + l_tax::DECIMAL(18,2))), 2)
                AS DOUBLE)                                                  AS sum_charge,
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
    # disc_price/charge sit on a 4dp/6dp decimal grid but round at 2dp:
    # an exact-.005 sum is where Spark (shortest-repr) and DuckDB
    # (binary) rounding diverge, so those two sums run in DECIMAL
    # arithmetic (exact; HALF_UP == half-away for positives) and cast
    # back to DOUBLE after the round — decimal stays INTERNAL. A
    # DecimalType output column is a driver-hash hazard: the r4 gate
    # recorded hash_match=false on byte-identical values because the
    # driver canonicalizes DECIMAL result columns differently per
    # engine (float64 on the DuckDB fetch path vs Python Decimal on
    # Spark's). 2dp-grid sums rounded at 2dp (base price) and
    # integer-grid sums (qty) can't land on a boundary.
    ep_d = F.col("l_extendedprice").cast("decimal(18,2)")
    disc_d = ep_d * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
    charge_d = disc_d * (F.lit(1) + F.col("l_tax").cast("decimal(18,2)"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(F.sum(disc_d), 2)
            .cast("double")
            .alias("sum_disc_price"),
            F.round(F.sum(charge_d), 2)
            .cast("double")
            .alias("sum_charge"),
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
           CAST(round(sum(l_extendedprice::DECIMAL(18,2) *
                          (1 - l_discount::DECIMAL(18,2))), 2) AS DOUBLE) AS revenue,
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
            # decimal-space sum: 4dp grid rounded at 2dp (see
            # pricing_summary boundary note)
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
                ),
                2,
            ).cast("double").alias("revenue"),
            F.countDistinct("o_orderkey").alias("n_orders"),
        )
    )


@_q(
    "shipping_priority_top10",
    """
    SELECT l_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           o_orderpriority,
           CAST(round(sum(l_extendedprice::DECIMAL(18,2)
                          * (1 - l_discount::DECIMAL(18,2))), 2)
                AS DOUBLE) AS revenue
    FROM customer
    JOIN orders   ON o_custkey  = c_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1997-01-01'
      AND l_shipdate  > TIMESTAMP '1997-01-01'
    GROUP BY l_orderkey, o_orderdate, o_orderpriority
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def shipping_priority_top10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape (shipping priority): unshipped-revenue top-10
    for one market segment at a cutoff date. customer broadcasts into
    orders, the date filters push into both scans, revenue sums in
    DECIMAL (the 4dp-grid rule), and the top-10 is fully tie-broken
    (revenue desc, orderdate, orderkey) so LIMIT is deterministic."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_mktsegment") == "BUILDING"
    )
    cutoff = "1997-01-01"
    rev = F.round(
        F.sum(
            F.col("l_extendedprice").cast("decimal(18,2)")
            * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        ),
        2,
    ).cast("double")
    return (
        orders.filter(F.col("o_orderdate") < F.lit(cutoff).cast("timestamp"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(
            li.filter(F.col("l_shipdate") > F.lit(cutoff).cast("timestamp")),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .groupBy("l_orderkey", "o_orderdate", "o_orderpriority")
        .agg(rev.alias("revenue"))
        .orderBy(
            F.col("revenue").desc(), F.col("o_orderdate"), F.col("l_orderkey")
        )
        .limit(10)
    )


@_q(
    "order_priority_late_ships",
    """
    SELECT o_orderpriority, count(*) AS n_orders
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey
        AND l_shipdate > o_orderdate + INTERVAL 30 DAY
    )
    GROUP BY o_orderpriority
    """,
)
def order_priority_late_ships(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4 shape (order priority checking): count orders per
    priority having at least one line that shipped more than 30 days
    after the order date. One LEFT SEMI hash join on the order key
    (the date predicate rides along as a join-side condition — no
    second pass, no distinct), then a 5-row aggregate."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_shipdate"
    )
    orders = load_table(spark, "orders", sf_dir)
    late = orders.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (
            F.col("l_shipdate")
            > F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS")
        ),
        "left_semi",
    )
    return late.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("n_orders")
    )


@_q(
    "brand_supplier_counts",
    """
    SELECT p_brand, p_size,
           count(DISTINCT l_suppkey) AS supplier_cnt,
           count(*) AS n_lines
    FROM part JOIN lineitem ON l_partkey = p_partkey
    WHERE p_brand != 'Brand#9'
    GROUP BY p_brand, p_size
    """,
)
def brand_supplier_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (parts/supplier relationship): distinct
    supplier count per (brand, size) with one brand excluded —
    lineitem plays the partsupp association. part broadcasts; the
    only shuffle is the grouped distinct."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey"
    )
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_brand") != "Brand#9"
    )
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(
            F.countDistinct("l_suppkey").alias("supplier_cnt"),
            F.count(F.lit(1)).alias("n_lines"),
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
    "asof_entry_price_skewsafe",
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
def asof_entry_price_skewsafe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SAME as-of join through the r7 hot-key two-phase fold
    (asof.skew_bucket_seconds — per-(key, day-bucket) running last +
    tiny per-key prefix carry) with the IDENTICAL oracle as
    asof_entry_price: the driver gate itself proves the fold exact,
    not just the local equivalence test. This is the form to use when
    one key dominates the feed (the SPX case) — SCALING.md's hot-key
    section measures plain 4.3 s vs fold 2.9 s on the 90%-hot 100×
    replica."""
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
        skew_bucket_seconds=86400,
    ).withColumnRenamed("value_entry", "entry_price")


@_q(
    "asof_next_quote",
    """
    WITH signals AS (
      SELECT user_id, event_id, ts, value FROM events WHERE event_type = 'purchase'
    ), pricing AS (
      SELECT user_id, ts, value, event_id FROM events WHERE event_type = 'view'
    ), tie AS (
      SELECT user_id, ts, value, event_id,
             row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id ASC) AS rn
      FROM pricing
    )
    SELECT s.user_id, s.event_id, s.ts, s.value,
           p.value AS next_price
    FROM signals s
    ASOF LEFT JOIN (SELECT * FROM tie WHERE rn = 1) p
      ON s.user_id = p.user_id AND s.ts <= p.ts
    """,
)
def asof_next_quote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 FORWARD as-of join — the fill-simulation direction (the
    earliest pricing row at or after each signal prices the order a
    backtest submits at signal time). Same union-tag single-shuffle
    plan traversed in descending time (operators/asof.py direction=
    'forward'); tie among same-timestamp quotes goes to the FIRST
    arrival, mirrored in the oracle's tie CTE."""
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
        suffix="_next",
        direction="forward",
    ).withColumnRenamed("value_next", "next_price")


@_q(
    "asof_entry_price_tolerance",
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
           CASE WHEN p.ts >= s.ts - INTERVAL 30 MINUTE
                THEN p.value END AS entry_price
    FROM signals s
    ASOF LEFT JOIN (SELECT * FROM tie WHERE rn = 1) p
      ON s.user_id = p.user_id AND s.ts >= p.ts
    """,
)
def asof_entry_price_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J5 with a staleness bound: matches older than 30 minutes are
    rejected (NULL entry) — the reference's 'pricing too stale to
    trust' guard, same union-tag plan plus one tolerance predicate."""
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
        tolerance=F.expr("INTERVAL 30 MINUTES"),
    ).withColumnRenamed("value_entry", "entry_price")


def _zorder_oracle_sql(bits: int = 8, k: int = 2) -> str:
    terms = []
    for i in range(bits):
        for c_idx, col in enumerate(["b_user", "b_hour"]):
            terms.append(f"(({col} >> {i}) & 1) * {1 << (i * k + c_idx)}")
    return f"""
    WITH b AS (
      SELECT event_id, user_id % 256 AS b_user,
             (epoch_ms(ts) // 3600000) % 256 AS b_hour
      FROM events
    )
    SELECT event_id, b_user, b_hour,
           ({" + ".join(terms)})::BIGINT AS zkey
    FROM b
    """


@_q("zorder_layout_key", _zorder_oracle_sql())
def zorder_layout_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Morton/Z-order clustering key over (user bucket, hour bucket):
    the write-time sort key that makes parquet min/max stats prune on
    BOTH dimensions (operators/scale.zorder_key)."""
    from tastytrade_sdk_spark.operators.scale import zorder_key

    ev = load_table(spark, "events", sf_dir)
    b = ev.select(
        "event_id",
        (F.col("user_id") % 256).alias("b_user"),
        # integer `div`, never double division: a ~1e12 epoch over a
        # double loses exactness right where truncation flips buckets
        (F.expr("unix_millis(ts) div 3600000") % 256).alias("b_hour"),
    )
    return b.select(
        "event_id", "b_user", "b_hour",
        zorder_key([F.col("b_user"), F.col("b_hour")], bits=8).alias("zkey"),
    )


@_q(
    "stats_pruned_scan",
    """
    SELECT l_returnflag,
           round(sum(l_quantity), 2) AS sum_qty,
           CAST(round(sum(l_extendedprice::DECIMAL(18,2) *
                          (1 - l_discount::DECIMAL(18,2))), 2)
                AS DOUBLE)           AS revenue,
           count(*)                  AS n_rows
    FROM lineitem
    WHERE l_shipdate BETWEEN TIMESTAMP '1995-01-01 00:00:00'
                         AND TIMESTAMP '1995-03-31 23:59:59'
    GROUP BY l_returnflag
    """,
)
def stats_pruned_scan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """File-level min/max data skipping (sources/skipping.py): write
    lineitem range-clustered on l_shipdate with a per-file stats
    sidecar, then answer a shipdate-range aggregate through the pruned
    reader — files whose [min, max] cannot intersect the range are
    dropped at PLANNING time, before any task is scheduled. The
    residual predicate always applies, so the result is byte-identical
    to the plain filtered scan the oracle runs; the pruning win itself
    (files skipped, wall-clock) is asserted in tests/test_skipping.py
    and measured at 100x by scale_probe --skipping.

    Scale notes: this is the hand-rolled Delta/Iceberg data-skipping
    recipe — at 100 TB a selective range predicate over the cluster
    column reads O(matching files), not O(table)."""
    import shutil
    import tempfile
    from datetime import datetime

    from tastytrade_sdk_spark.sources.skipping import (
        read_pruned,
        write_clustered,
    )

    # project to the query's columns BEFORE the clustered write (guide
    # §2.3): the range sort and the 16 files carry 5 columns instead of
    # 16 — the pruning/stats machinery is unchanged and the aggregate
    # is byte-identical
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_returnflag", "l_quantity", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    lo = datetime(1995, 1, 1, 0, 0, 0)
    hi = datetime(1995, 3, 31, 23, 59, 59)
    tmp = tempfile.mkdtemp(prefix="skipping_")
    try:
        write_clustered(li, f"{tmp}/li", ["l_shipdate"], n_files=16)
        pruned = read_pruned(spark, f"{tmp}/li", "l_shipdate", lo, hi)
        ep_d = F.col("l_extendedprice").cast("decimal(18,2)")
        disc_d = ep_d * (F.lit(1) - F.col("l_discount").cast("decimal(18,2)"))
        out = (
            pruned.groupBy("l_returnflag")
            .agg(
                F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
                F.round(F.sum(disc_d), 2).cast("double").alias("revenue"),
                F.count(F.lit(1)).alias("n_rows"),
            )
            .localCheckpoint(eager=True)
        )
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out


@_q(
    "retention_cap_per_user",
    """
    SELECT user_id, event_id, ts, value FROM (
      SELECT user_id, event_id, ts, value,
             row_number() OVER (PARTITION BY user_id
               ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    ) WHERE rn <= 5
    """,
)
def retention_cap_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O2 tail-cap: newest 5 rows per key under the composite
    deterministic order (the reference's per-frame row cap)."""
    ev = load_table(spark, "events", sf_dir)
    return retention_cap(
        ev.select("user_id", "event_id", "ts", "value"),
        ["user_id"],
        ["ts", "event_id"],
        5,
    )


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


# ---------------------------------------------------------------------------
# Time-series indicators (W1-W4, W7) over derived candle/daily series
# ---------------------------------------------------------------------------

_HOURLY_CLOSE_CTE = """
    WITH b AS (
      SELECT event_type AS symbol, date_trunc('hour', ts) AS time, value, ts, event_id
      FROM events
    ), c AS (
      SELECT symbol, time, value AS close
      FROM b
      QUALIFY row_number() OVER (
        PARTITION BY symbol, time ORDER BY ts DESC, event_id DESC) = 1
    )
"""

_DAILY_CTE = """
    WITH daily AS (
      -- CAST: DuckDB date_trunc('day') yields DATE; Spark yields TIMESTAMP
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             round(avg(value), 6) AS day_value
      FROM events GROUP BY 1, 2
    )
"""


def _hourly_close(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared derived series: last value per (event_type, hour) = candle close."""
    ev = load_table(spark, "events", sf_dir)
    return keep_last(
        ev.select(
            F.col("event_type").alias("symbol"),
            F.date_trunc("hour", F.col("ts")).alias("time"),
            F.col("value").alias("close"),
            "ts",
            "event_id",
        ),
        ["symbol", "time"],
        ["ts", "event_id"],
    ).select("symbol", "time", "close")


def _daily_series(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-(user, day) series. ONE explicit user-keyed exchange serves
    the whole consumer chain: partitioning by user_id satisfies the
    (user_id, day) groupBy clustering AND every downstream
    Window.partitionBy(user_id) (bollinger/beta/autocorr/drawdown...),
    so the plan has a single exchange instead of two. The explicit
    count pins it against AQE byte-based coalescing, which folded the
    tiny-byte daily frame onto one task and ran the window chains
    serially (measured: bollinger 1.14 -> 0.54 s with the pin)."""
    ev = load_table(spark, "events", sf_dir)
    try:
        # non-numeric on some platforms (e.g. "auto") — fall back to
        # defaultParallelism, the _partsupp_standin pattern
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    except ValueError:
        n_parts = spark.sparkContext.defaultParallelism
    return (
        ev.repartition(n_parts, F.col("user_id"))
        .groupBy("user_id", F.date_trunc("day", F.col("ts")).alias("day"))
        .agg(F.round(F.avg("value"), 6).alias("day_value"))
    )


@_q(
    "hull_ma_hourly",
    _HOURLY_CLOSE_CTE
    + """
    , p AS (
      SELECT symbol, time, close,
             first_value(close) OVER (PARTITION BY symbol ORDER BY time) AS pad
      FROM c
    ), w AS (
      SELECT symbol, time, close, pad,
        (coalesce(lag(close, 1) OVER win, pad)*1 + close*2) / 3.0 AS wma2,
        (coalesce(lag(close, 3) OVER win, pad)*1 + coalesce(lag(close, 2) OVER win, pad)*2
         + coalesce(lag(close, 1) OVER win, pad)*3 + close*4) / 10.0 AS wma4
      FROM p
      WINDOW win AS (PARTITION BY symbol ORDER BY time)
    ), d AS (
      SELECT symbol, time, close, pad, 2*wma2 - wma4 AS hdiff FROM w
    ), h AS (
      SELECT symbol, time, close,
        (coalesce(lag(hdiff, 1) OVER win, pad)*1 + hdiff*2) / 3.0 AS hma_raw
      FROM d
      WINDOW win AS (PARTITION BY symbol ORDER BY time)
    )
    SELECT symbol, time, close, round(hma_raw, 8) AS HMA,
           CASE WHEN hma_raw > lag(hma_raw) OVER (PARTITION BY symbol ORDER BY time)
                THEN 'Up' ELSE 'Down' END AS HMA_color
    FROM h
    """,
)
def hull_ma_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W2 Hull MA (length=4 => WMA(2)/WMA(4)/WMA(2) chain) over hourly
    candle closes, padded with the first close (momentum.py:43-98)."""
    from tastytrade_sdk_spark.operators.indicators import hull as hull_op

    candles = _hourly_close(spark, sf_dir)
    out = hull_op(
        candles, price_col="close", length=4,
        partition_by=["symbol"], order_by=["time"],
    )
    return out.select(
        "symbol", "time", "close", F.round(F.col("HMA"), 8).alias("HMA"), "HMA_color"
    )


@_q(
    "ema_seeded_daily",
    _DAILY_CTE
    + """
    , s AS (
      SELECT user_id, day, day_value,
             list(day_value) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr,
             first_value(day_value) OVER (PARTITION BY user_id ORDER BY day) AS seed
      FROM daily
    )
    SELECT user_id, day, day_value,
           round(list_reduce(list_prepend(seed, arr),
             (acc, x) -> acc*(1.0 - 2.0/13.0) + x*(2.0/13.0)), 8) AS ema
    FROM s
    """,
)
def ema_seeded_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3 seeded EMA (n=12, seed = first value) over the per-user daily
    series. Expression form (JVM prefix-fold — bounded daily series);
    the oracle replays the identical recurrence via list_reduce —
    bit-identical."""
    from tastytrade_sdk_spark.operators.indicators import ema_expr_col

    daily = _daily_series(spark, sf_dir)
    e = ema_expr_col(F.col("day_value"), 12, ["user_id"], ["day"])
    return daily.select(
        "user_id", "day", "day_value", F.round(e, 8).alias("ema")
    )


@_q(
    "macd_daily",
    _DAILY_CTE
    + """
    , s AS (
      SELECT user_id, day, day_value,
             list(day_value) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr,
             first_value(day_value) OVER (PARTITION BY user_id ORDER BY day) AS prior
      FROM daily
    ), v AS (
      SELECT user_id, day, day_value,
        list_reduce(list_prepend(prior, arr), (acc, x) -> acc*(1.0 - 2.0/13.0) + x*(2.0/13.0))
        - list_reduce(list_prepend(prior, arr), (acc, x) -> acc*(1.0 - 2.0/27.0) + x*(2.0/27.0))
          AS value
      FROM s
    ), v2 AS (
      SELECT *, list(value) OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS varr
      FROM v
    ), m AS (
      SELECT user_id, day, day_value, value,
        list_reduce(list_prepend(0.0, varr), (acc, x) -> acc*(1.0 - 2.0/10.0) + x*(2.0/10.0)) AS sig
      FROM v2
    ), d AS (
      -- color ladder on the ROUNDED histogram: sub-epsilon fp noise in
      -- value-sig must not flip a color
      SELECT user_id, day, day_value, value, sig,
             round(value - sig, 8) AS rdiff,
             lag(round(value - sig, 8)) OVER (PARTITION BY user_id ORDER BY day) AS prev
      FROM m
    )
    SELECT user_id, day, day_value,
           -- "+ 0.0" folds DuckDB's -0.0 (preserved by round()) into +0.0
           -- so the serialized hash matches Spark, which never emits -0.0
           round(value, 8) + 0.0 AS macd_value, round(sig, 8) + 0.0 AS macd_avg,
           rdiff + 0.0 AS macd_diff,
           CASE WHEN rdiff > 0
                THEN CASE WHEN prev IS NULL OR rdiff > prev THEN '#04FE00' ELSE '#006401' END
                ELSE CASE WHEN prev IS NULL OR rdiff < prev THEN '#FE0000' ELSE '#7E0100' END
           END AS diff_color
    FROM d
    """,
)
def macd_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W4 MACD(12,26,9): fast/slow EMAs seeded with the first value,
    signal seeded 0.0, 4-shade histogram colors (momentum.py:116-193).
    Expression form (JVM prefix-fold) — the Arrow kernel `macd` is the
    unbounded-series path."""
    from tastytrade_sdk_spark.operators.indicators import macd_expr

    daily = _daily_series(spark, sf_dir)
    out = macd_expr(
        daily, price_col="day_value",
        partition_by=["user_id"], order_by=["day"],
    )
    # recompute the color ladder from the ROUNDED histogram so an
    # eps-scale residue (ema_fast - ema_slow when both seed from x0)
    # cannot flip a shade
    rdiff = F.round(F.col("diff"), 8)
    w = Window.partitionBy("user_id").orderBy("day")
    prev = F.lag(rdiff).over(w)
    color = F.when(
        rdiff > 0,
        F.when(prev.isNull() | (rdiff > prev), "#04FE00").otherwise("#006401"),
    ).otherwise(
        F.when(prev.isNull() | (rdiff < prev), "#FE0000").otherwise("#7E0100")
    )
    return out.select(
        "user_id", "day", "day_value",
        (F.round(F.col("Value"), 8) + 0.0).alias("macd_value"),
        (F.round(F.col("avg"), 8) + 0.0).alias("macd_avg"),
        (rdiff + 0.0).alias("macd_diff"),
        color.alias("diff_color"),
    )


@_q(
    "candle_patterns_hourly",
    """
    WITH b AS (
      SELECT event_type, date_trunc('hour', ts) AS bucket, ts, event_id, value
      FROM events
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY event_type, bucket ORDER BY ts, event_id) AS rn_a,
             row_number() OVER (PARTITION BY event_type, bucket ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    ), c AS (
      SELECT event_type AS symbol, bucket AS time,
             max(CASE WHEN rn_a = 1 THEN value END) AS open,
             max(value) AS high, min(value) AS low,
             max(CASE WHEN rn_d = 1 THEN value END) AS close
      FROM r GROUP BY event_type, bucket
    ), w AS (
      SELECT symbol, time, open, high, low, close,
             lag(open)  OVER win AS p_open,
             lag(close) OVER win AS p_close
      FROM c WINDOW win AS (PARTITION BY symbol ORDER BY time)
    )
    SELECT symbol, time, open, high, low, close,
           (high > low AND abs(close - open) <= 0.1 * (high - low)) AS doji,
           (p_close IS NOT NULL AND p_close < p_open
            AND close > open AND open <= p_close AND close >= p_open)
             AS bullish_engulfing,
           (p_close IS NOT NULL AND p_close > p_open
            AND close < open AND open >= p_close AND close <= p_open)
             AS bearish_engulfing,
           (high > low
            AND least(open, close) - low >= 2 * abs(close - open)
            AND high - greatest(open, close) <= abs(close - open)) AS hammer
    FROM w
    """,
)
def candle_patterns_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candlestick pattern flags over the hourly OHLC candles — the
    charting-layer classification a reference user plots (doji,
    bullish/bearish engulfing, hammer; textbook geometric
    definitions). Candle construction is the proven A8 recipe; the
    pattern tests are pure comparisons of identical grid values plus
    one shared 0.1×range expression, so the booleans can't diverge.
    One window shuffle over the candle table (already hour-bucketed:
    tiny vs the event scan)."""
    from tastytrade_sdk_spark.operators.candles import ohlcv

    ev = load_table(spark, "events", sf_dir)
    candles = ohlcv(
        ev,
        symbol_col="event_type",
        time_col="ts",
        price_col="value",
        size_col=None,
        interval="1 hour",
        order_col="event_id",
    ).select(
        F.col("symbol"), F.col("time"), "open", "high", "low", "close"
    )
    w = Window.partitionBy("symbol").orderBy("time")
    c = candles.select(
        "*",
        F.lag("open").over(w).alias("p_open"),
        F.lag("close").over(w).alias("p_close"),
    )
    body = F.abs(F.col("close") - F.col("open"))
    rng = F.col("high") - F.col("low")
    return c.select(
        "symbol", "time", "open", "high", "low", "close",
        ((F.col("high") > F.col("low")) & (body <= 0.1 * rng)).alias("doji"),
        (
            F.col("p_close").isNotNull()
            & (F.col("p_close") < F.col("p_open"))
            & (F.col("close") > F.col("open"))
            & (F.col("open") <= F.col("p_close"))
            & (F.col("close") >= F.col("p_open"))
        ).alias("bullish_engulfing"),
        (
            F.col("p_close").isNotNull()
            & (F.col("p_close") > F.col("p_open"))
            & (F.col("close") < F.col("open"))
            & (F.col("open") >= F.col("p_close"))
            & (F.col("close") <= F.col("p_open"))
        ).alias("bearish_engulfing"),
        (
            (F.col("high") > F.col("low"))
            & (F.least("open", "close") - F.col("low") >= 2 * body)
            & (F.col("high") - F.greatest("open", "close") <= body)
        ).alias("hammer"),
    )


@_q(
    "rsi_daily",
    _DAILY_CTE
    + """
    , s AS (
      SELECT user_id, day, day_value,
             greatest(day_value - coalesce(lag(day_value) OVER win, day_value), 0.0) AS g,
             greatest(coalesce(lag(day_value) OVER win, day_value) - day_value, 0.0) AS l
      FROM daily
      WINDOW win AS (PARTITION BY user_id ORDER BY day)
    ), arrs AS (
      SELECT user_id, day, day_value,
             list(g) OVER w2 AS garr, list(l) OVER w2 AS larr
      FROM s
      WINDOW w2 AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), e AS (
      SELECT user_id, day, day_value,
        list_reduce(list_prepend(0.0, garr),
          (acc, x) -> acc*(1.0 - 2.0/28.0) + x*(2.0/28.0)) AS ag,
        list_reduce(list_prepend(0.0, larr),
          (acc, x) -> acc*(1.0 - 2.0/28.0) + x*(2.0/28.0)) AS al
      FROM arrs
    )
    SELECT user_id, day, day_value,
           round(CASE WHEN ag = 0 AND al = 0 THEN 50.0
                      WHEN al = 0 THEN 100.0
                      ELSE 100.0 - 100.0/(1.0 + ag/al) END, 6) AS rsi
    FROM e
    """,
)
def rsi_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder RSI(14) over the per-user daily series — beyond-reference
    indicator widening (the reference ships Hull/MACD only; RSI is the
    next thing its users chart). Wilder smoothing = seeded EMA of
    length 2n-1, so both engines run the identical prefix fold
    (operators/indicators.rsi); first-row delta is 0 and the 0/0 and
    /0 edges resolve to 50/100 by contract."""
    from tastytrade_sdk_spark.operators.indicators import rsi as rsi_op

    daily = _daily_series(spark, sf_dir)
    out = rsi_op(daily, "day_value", 14, ["user_id"], ["day"])
    return out.select(
        "user_id", "day", "day_value", F.round("rsi", 6).alias("rsi")
    )


@_q(
    "bollinger_daily",
    _DAILY_CTE
    + """
    , g AS (
      SELECT user_id, day, day_value,
             CAST(round(day_value * 1000000) AS HUGEINT) AS dv6
      FROM daily
    ), b AS (
      SELECT user_id, day, day_value,
             sum(dv6) OVER w20 AS s1,
             sum(dv6 * dv6) OVER w20 AS s2,
             count(*) OVER w20 AS n_win
      FROM g
      WINDOW w20 AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ), d AS (
      SELECT user_id, day, day_value, n_win,
             CAST(s1 AS DOUBLE) / n_win / 1000000 AS mid,
             sqrt(CAST(n_win * s2 - s1 * s1 AS DOUBLE)) / n_win / 1000000 AS sd
      FROM b
    )
    SELECT user_id, day, day_value,
           floor(mid * 1000000 + 0.5) / 1000000 + 0.0 AS mid_band,
           floor((mid + 2*sd) * 1000000 + 0.5) / 1000000 + 0.0 AS upper_band,
           floor((mid - 2*sd) * 1000000 + 0.5) / 1000000 + 0.0 AS lower_band,
           n_win
    FROM d
    """,
)
def bollinger_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (20, 2σ population) over the daily series —
    rolling mean ± 2 stddev with the window row count surfaced so
    consumers can gate on full windows. One window chain, single
    shuffle.

    Float discipline: the engines' stddev_pop implementations differ
    by ~1e-9 (Welford vs segment-tree sums), which the first cut of
    this query measured as 12/4006 boundary flips at the 6dp round.
    day_value sits on the 6dp grid, so the window sums run EXACTLY on
    scaled 1e-6 integers (decimal/HUGEINT — overflow-proof) and the
    variance n·Σx² − (Σx)² is an exact integer both engines cast to
    the IDENTICAL double before the one sqrt — bit-equal bands by
    construction. The output round is floor(x·1e6 + 0.5)/1e6 on BOTH
    engines (half-toward-+inf): small windows make the bands land on
    EXACT half-micro midpoints (n=2 ⇒ sd = |x−y|/2), where Spark's
    shortest-repr HALF_UP and DuckDB's binary-value round() disagree —
    floor on bit-identical doubles cannot."""
    w20 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-19, Window.currentRow)
    )
    daily = _daily_series(spark, sf_dir)
    staged = daily.withColumn(
        "__dv6", F.round(F.col("day_value") * 1e6).cast("decimal(38,0)")
    )
    s1 = F.sum("__dv6").over(w20)
    s2 = F.sum(F.col("__dv6") * F.col("__dv6")).over(w20)
    n = F.count(F.lit(1)).over(w20)
    mid = s1.cast("double") / n / F.lit(1e6)
    sd = F.sqrt((n * s2 - s1 * s1).cast("double")) / n / F.lit(1e6)
    def r6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6 + 0.0

    return staged.select(
        "user_id",
        "day",
        "day_value",
        r6(mid).alias("mid_band"),
        r6(mid + 2 * sd).alias("upper_band"),
        r6(mid - 2 * sd).alias("lower_band"),
        n.alias("n_win"),
    )


@_q(
    "stochastic_daily",
    _DAILY_CTE
    + """
    , s AS (
      SELECT user_id, day, day_value,
             min(day_value) OVER w14 AS lo,
             max(day_value) OVER w14 AS hi
      FROM daily
      WINDOW w14 AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 13 PRECEDING AND CURRENT ROW)
    ), k AS (
      SELECT user_id, day, day_value,
             CASE WHEN hi = lo THEN 50.0
                  ELSE 100.0 * (day_value - lo) / (hi - lo) END AS k_raw
      FROM s
    )
    SELECT user_id, day, day_value,
           floor(k_raw * 1000000 + 0.5) / 1000000 + 0.0 AS pct_k,
           floor(avg(k_raw) OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
                 * 1000000 + 0.5) / 1000000 + 0.0 AS pct_d
    FROM k
    """,
)
def stochastic_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stochastic oscillator (%K 14, %D 3) over the daily series: %K
    positions the value inside its rolling 14-row low/high channel
    (min/max windows are EXACT — only the final division is float),
    %D is the 3-row SMA of %K; flat channel (hi = lo) pins %K to 50
    by contract."""
    daily = _daily_series(spark, sf_dir)
    w14 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-13, Window.currentRow)
    )
    lo = F.min("day_value").over(w14)
    hi = F.max("day_value").over(w14)
    k_raw = F.when(hi == lo, F.lit(50.0)).otherwise(
        F.lit(100.0) * (F.col("day_value") - lo) / (hi - lo)
    )
    staged = daily.select(
        "user_id", "day", "day_value", k_raw.alias("__k")
    )
    w3 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-2, Window.currentRow)
    )
    def r6(c):
        return F.floor(c * 1e6 + 0.5) / 1e6 + 0.0

    return staged.select(
        "user_id",
        "day",
        "day_value",
        r6(F.col("__k")).alias("pct_k"),
        r6(F.avg("__k").over(w3)).alias("pct_d"),
    )


@_q(
    "cusum_alerts",
    _DAILY_CTE
    + """
    , g AS (
      SELECT user_id, day, day_value,
             CAST(round(day_value * 1000000) AS BIGINT) AS dv6
      FROM daily
    ), m AS (
      SELECT user_id, day, day_value,
             ((2 * sum(dv6) OVER (PARTITION BY user_id)
               + count(*) OVER (PARTITION BY user_id))
              // (2 * count(*) OVER (PARTITION BY user_id)))
             / 1000000.0 AS mu6,
             list(day_value) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
      FROM g
    ), c AS (
      SELECT user_id, day, day_value,
             list_reduce(list_prepend(0.0, list_transform(arr,
               x -> x - mu6 - 0.5)),
               (acc, x) -> greatest(0.0, acc + x)) AS s_hi,
             list_reduce(list_prepend(0.0, list_transform(arr,
               x -> mu6 - 0.5 - x)),
               (acc, x) -> greatest(0.0, acc + x)) AS s_lo
      FROM m
    )
    SELECT user_id, day, day_value,
           round(s_hi, 6) AS cusum_hi, round(s_lo, 6) AS cusum_lo,
           (s_hi > 5.0 OR s_lo > 5.0) AS alert
    FROM c
    """,
)
def cusum_alerts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sided CUSUM control chart (Page 1954) over the per-user
    daily series — the standard drift detector a data-quality pipeline
    runs on ingestion metrics: S⁺ = max(0, S⁺ + (x - μ - k)),
    S⁻ = max(0, S⁻ + (μ - k - x)), alert when either exceeds h
    (k = 0.5 slack, h = 5). The non-linear clamp recurrence replays
    EXACTLY in both engines as the same prefix fold (the seeded-EMA
    recipe — bounded daily series, whole-stage codegen, no Python).
    μ is the mean of 1e-6-grid values, which lands on EXACT 6dp
    midpoints (even denominators) where engine round() diverges
    (measured: 322/40k flips at sf0.1) — so it rounds half-away in
    INTEGER micro-space from exact window sums, and the folds consume
    bit-identical doubles."""
    w = Window.partitionBy("user_id")
    wo = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    daily = _daily_series(spark, sf_dir).withColumn(
        "__dv6", F.round(F.col("day_value") * 1e6).cast("long")
    )
    staged = daily.select(
        "user_id",
        "day",
        "day_value",
        F.sum("__dv6").over(w).alias("__s6"),
        F.count(F.lit(1)).over(w).alias("__n"),
        F.collect_list("day_value").over(wo).alias("__arr"),
    ).withColumn(
        "__mu",
        F.expr("((2 * __s6 + __n) div (2 * __n)) / 1000000.0"),
    )

    def clamped_fold(transform_fn):
        return F.aggregate(
            F.transform(F.col("__arr"), transform_fn),
            F.lit(0.0),
            lambda acc, x: F.greatest(F.lit(0.0), acc + x),
        )

    s_hi = clamped_fold(lambda x: x - F.col("__mu") - F.lit(0.5))
    s_lo = clamped_fold(lambda x: F.col("__mu") - F.lit(0.5) - x)
    return staged.select(
        "user_id",
        "day",
        "day_value",
        F.round(s_hi, 6).alias("cusum_hi"),
        F.round(s_lo, 6).alias("cusum_lo"),
        ((s_hi > 5.0) | (s_lo > 5.0)).alias("alert"),
    )


@_q(
    "macd_prior_session_seed",
    _DAILY_CTE
    + """
    , s0 AS (
      SELECT user_id, day, day_value,
             first_value(day_value) OVER (PARTITION BY user_id ORDER BY day) AS prior,
             row_number() OVER (PARTITION BY user_id ORDER BY day) AS rn
      FROM daily
    ), t AS (
      -- the first session is consumed as the SEED, not as a series row
      SELECT user_id, day, day_value, prior,
             list(day_value) OVER (PARTITION BY user_id ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
      FROM s0 WHERE rn > 1
    ), v AS (
      SELECT user_id, day, day_value,
        list_reduce(list_prepend(prior, arr), (acc, x) -> acc*(1.0 - 2.0/13.0) + x*(2.0/13.0))
        - list_reduce(list_prepend(prior, arr), (acc, x) -> acc*(1.0 - 2.0/27.0) + x*(2.0/27.0))
          AS value
      FROM t
    ), v2 AS (
      SELECT *, list(value) OVER (PARTITION BY user_id ORDER BY day
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS varr
      FROM v
    )
    SELECT user_id, day, day_value,
           round(value, 8) + 0.0 AS macd_value,
           round(list_reduce(list_prepend(0.0, varr),
                 (acc, x) -> acc*(1.0 - 2.0/10.0) + x*(2.0/10.0)), 8) + 0.0 AS macd_avg
    FROM v2
    """,
)
def macd_prior_session_seed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W3/W4 prior-session seed semantics: the reference seeds the
    fast/slow EMAs with the PRIOR session close, not the first series
    value (momentum.py:108,137-144). Here each user's first daily
    bucket plays the prior session: it seeds the EMAs via
    ``prior_close_col`` and is excluded from the series itself."""
    from tastytrade_sdk_spark.operators.indicators import macd_expr

    daily = _daily_series(spark, sf_dir)
    w = Window.partitionBy("user_id").orderBy("day")
    cum = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    base = daily.select(
        "user_id", "day", "day_value",
        F.first("day_value").over(cum).alias("prior_close"),
        F.row_number().over(w).alias("__rn"),
    )
    series = base.filter(F.col("__rn") > 1).drop("__rn")
    out = macd_expr(
        series, price_col="day_value",
        partition_by=["user_id"], order_by=["day"],
        prior_close_col="prior_close",
    )
    return out.select(
        "user_id", "day", "day_value",
        (F.round(F.col("Value"), 8) + 0.0).alias("macd_value"),
        (F.round(F.col("avg"), 8) + 0.0).alias("macd_avg"),
    )


@_q(
    "prior_day_value",
    _DAILY_CTE
    + """
    SELECT user_id, day AS prior_day, day_value AS prior_value
    FROM daily
    WHERE day < TIMESTAMP '2024-01-25' AND day >= TIMESTAMP '2024-01-18'
    QUALIFY row_number() OVER (PARTITION BY user_id ORDER BY day DESC) = 1
    """,
)
def prior_day_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W7 prior-day lookup with bounded walk-back (market.py:187-235):
    last non-null daily value strictly before 2024-01-25, <=7 days back."""
    from tastytrade_sdk_spark.operators.gapfill import prior_valid_value

    daily = _daily_series(spark, sf_dir)
    out = prior_valid_value(
        daily, ["user_id"], "day", "day_value",
        before=F.lit("2024-01-25").cast("timestamp"), max_lookback_days=7,
    )
    return out.select(
        "user_id",
        F.col("day").alias("prior_day"),
        F.col("day_value").alias("prior_value"),
    )


# ---------------------------------------------------------------------------
# Filters / predicates (P4, P8, P9) and bucketing (W8)
# ---------------------------------------------------------------------------


@_q(
    "session_gated_activity",
    """
    WITH et AS (
      SELECT user_id, value,
             (ts AT TIME ZONE 'UTC') AT TIME ZONE 'America/New_York' AS ts_et
      FROM events
    )
    SELECT user_id, count(*) AS n_events, round(sum(value), 6) AS session_value
    FROM et
    WHERE hour(ts_et)*60 + minute(ts_et) >= 600
      AND hour(ts_et)*60 + minute(ts_et) < 900
    GROUP BY user_id
    """,
)
def session_gated_activity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 session-time gating: only events between 10:00-15:00 ET
    (hull_macd.py:119-133), aggregated per key."""
    from tastytrade_sdk_spark.functions.scalar import in_session

    ev = load_table(spark, "events", sf_dir)
    return (
        ev.filter(in_session("ts"))
        .groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 6).alias("session_value"),
        )
    )


@_q(
    "bitmask_flag_filter",
    """
    WITH k AS (
      SELECT event_id, user_id, event_type,
             try_cast(regexp_extract(props, '"k": (\\d+)', 1) AS BIGINT) AS flag
      FROM events
    )
    SELECT event_id, user_id, event_type, flag
    FROM k WHERE (flag & 24) > 0
    """,
)
def bitmask_flag_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4 eventFlags bitmask predicate (SNAPSHOT_END|SNIP = 0x18):
    rows whose props flag has bit 0x08 or 0x10 set."""
    ev = load_table(spark, "events", sf_dir)
    flag = F.regexp_extract(F.col("props"), r'"k": (\d+)', 1).cast("long")
    return (
        ev.withColumn("flag", flag)
        .filter(F.col("flag").bitwiseAND(24) > 0)
        .select("event_id", "user_id", "event_type", "flag")
    )


@_q(
    "interval_floor_5m",
    """
    SELECT event_type,
           make_timestamp(((epoch_ms(ts) // 300000) * 300000) * 1000) AS bucket,
           count(*) AS n, round(sum(value), 6) AS bucket_value
    FROM events
    GROUP BY 1, 2
    """,
)
def interval_floor_5m(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W8 interval flooring: epoch_ms // interval * interval
    (messages.py:189-203), here 5-minute buckets."""
    from tastytrade_sdk_spark.functions.scalar import floor_time_to_interval

    ev = load_table(spark, "events", sf_dir)
    return (
        ev.withColumn("bucket", floor_time_to_interval("ts", F.lit(300_000)))
        .groupBy("event_type", "bucket")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("bucket_value"),
        )
    )


@_q(
    "weekday_order_counts",
    """
    SELECT dayname(o_orderdate) AS weekday,
           count(*) AS n_orders,
           CAST(sum(o_totalprice::DECIMAL(18,2)) AS DOUBLE) AS total_price
    FROM orders
    WHERE dayofweek(o_orderdate) BETWEEN 1 AND 5
    GROUP BY 1
    """,
)
def weekday_order_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9 trading-day filter (skip weekends) + per-weekday rollup."""
    from tastytrade_sdk_spark.functions.scalar import is_trading_day

    orders = load_table(spark, "orders", sf_dir)
    return (
        orders.filter(is_trading_day("o_orderdate"))
        .groupBy(F.date_format("o_orderdate", "EEEE").alias("weekday"))
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(18,2)"))
            .cast("double")
            .alias("total_price"),
        )
    )


@_q(
    "closest_order_per_priority",
    """
    SELECT o_orderpriority, o_orderkey, o_orderdate,
           abs(date_diff('day', DATE '1997-06-15', CAST(o_orderdate AS DATE))) AS days_off
    FROM orders
    QUALIFY row_number() OVER (
      PARTITION BY o_orderpriority
      ORDER BY abs(date_diff('day', DATE '1997-06-15', CAST(o_orderdate AS DATE))), o_orderkey) = 1
    """,
)
def closest_order_per_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6/O6 closest-match rank: per group, the row minimizing
    |date - target| (DTE nearest-expiration semantics,
    option_chains.py:144-172)."""
    orders = load_table(spark, "orders", sf_dir)
    days_off = F.abs(F.datediff(F.col("o_orderdate").cast("date"), F.lit("1997-06-15").cast("date")))
    w = Window.partitionBy("o_orderpriority").orderBy(days_off.asc(), F.col("o_orderkey").asc())
    return (
        orders.withColumn("days_off", days_off)
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select("o_orderpriority", "o_orderkey", "o_orderdate", "days_off")
    )


@_q(
    "viewers_without_purchase",
    """
    SELECT DISTINCT user_id FROM events WHERE event_type = 'view'
    EXCEPT
    SELECT DISTINCT user_id FROM events WHERE event_type = 'purchase'
    """,
)
def viewers_without_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SO1 subscription diff (current - subscribed) as a left-anti join."""
    ev = load_table(spark, "events", sf_dir)
    viewers = ev.filter(F.col("event_type") == "view").select("user_id").distinct()
    buyers = ev.filter(F.col("event_type") == "purchase").select("user_id").distinct()
    return viewers.join(buyers, "user_id", "left_anti")


# ---------------------------------------------------------------------------
# Sketches + range join (operators/sketches.py, operators/rangejoin.py)
# ---------------------------------------------------------------------------


@_q(
    "range_join_window_views",
    """
    SELECT v.user_id,
           p.event_id AS purchase_id,
           v.event_id AS view_id,
           (epoch_ms(v.ts) - epoch_ms(p.ts)) // 60000 AS minutes_after
    FROM events v
    JOIN events p
      ON v.user_id = p.user_id
     AND p.event_type = 'purchase' AND v.event_type = 'view'
     AND v.ts >= p.ts AND v.ts < p.ts + INTERVAL 30 MINUTE
    """,
)
def range_join_window_views(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval-overlap join via the binned equi-join plan (J5/J7 class;
    reference analog: time-bounded follow-up lookups,
    src/tastytrade/providers/market.py:119-185).

    Views landing inside the 30 minutes after each purchase by the same
    user. The naive plan is a per-user cross product filtered late; the
    binned form (operators/rangejoin.py) joins on (user, time_bin) so
    the shuffle key carries the time dimension too.
    """
    from tastytrade_sdk_spark.operators.rangejoin import range_join_binned

    ev = load_table(spark, "events", sf_dir)
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "user_id",
        F.col("event_id").alias("purchase_id"),
        F.col("ts").alias("win_start"),
        (F.col("ts") + F.expr("INTERVAL 30 MINUTES")).alias("win_end"),
    )
    views = ev.filter(F.col("event_type") == "view").select(
        "user_id", F.col("event_id").alias("view_id"), "ts"
    )
    joined = range_join_binned(
        views,
        purchases,
        on=["user_id"],
        point_time="ts",
        start="win_start",
        end="win_end",
        bin_width_ms=30 * 60 * 1000,
    )
    minutes = F.floor(
        (F.unix_micros(F.col("ts")) - F.unix_micros(F.col("win_start"))) / 60_000_000
    )
    return joined.select(
        "user_id", "purchase_id", "view_id", minutes.alias("minutes_after")
    )


@_q(
    "kmv_distinct_users",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ), r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    )
    SELECT event_type,
           count(*) AS kmv_seen,
           round(CASE WHEN count(*) < 64 THEN CAST(count(*) AS DOUBLE)
                 ELSE 63.0 / (CAST(max(h) AS DOUBLE) / 1152921504606846976.0)
                 END, 4) AS kmv_estimate
    FROM r WHERE rn <= 64
    GROUP BY event_type
    """,
)
def kmv_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV distinct-count sketch per event type (A9-class distinct
    metrics at sketch cost): engine-portable k-minimum-values estimator,
    hash-verified against the same construction in DuckDB."""
    from tastytrade_sdk_spark.operators.sketches import kmv_distinct

    ev = load_table(spark, "events", sf_dir)
    return kmv_distinct(ev, ["event_type"], "user_id", k=64)


@_q(
    "kmv_set_overlap",
    """
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ), r AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS rn
      FROM h
    ), sk AS (
      SELECT event_type, list_sort(list(h)) AS kmv
      FROM r WHERE rn <= 64 GROUP BY event_type
    ), p AS (
      SELECT a.event_type AS group_a, b.event_type AS group_b,
             a.kmv AS ka, b.kmv AS kb,
             list_sort(list_distinct(list_concat(a.kmv, b.kmv)))[1:64] AS m
      FROM sk a JOIN sk b ON a.event_type < b.event_type
    ), e AS (
      SELECT group_a, group_b, ka, kb, m, len(m) AS s,
             CASE WHEN len(m) < 64 THEN CAST(len(m) AS DOUBLE)
                  ELSE 63.0 / (CAST(m[64] AS DOUBLE) / 1152921504606846976.0)
             END AS union_raw,
             len(list_filter(m, x ->
               list_contains(ka, x) AND list_contains(kb, x))) AS shared
      FROM p
    )
    SELECT group_a, group_b,
           round(union_raw, 4) AS union_est,
           round(CAST(shared AS DOUBLE) / s, 6) AS jaccard,
           round((CAST(shared AS DOUBLE) / s) * union_raw, 4) AS inter_est
    FROM e
    """,
)
def kmv_set_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV set algebra (Beyer et al.): pairwise distinct-user overlap
    between event types computed ONLY from the mergeable k-min
    sketches — union via the merged sketch's k-th minimum, Jaccard as
    the both-present fraction of the merged sketch, intersection =
    jaccard * union. The raw events table is scanned once to build the
    sketch table; every pairwise question after that is array algebra
    on k longs per group (operators/sketches.kmv_sketch +
    kmv_pair_overlap)."""
    from tastytrade_sdk_spark.operators.sketches import (
        kmv_pair_overlap,
        kmv_sketch,
    )

    ev = load_table(spark, "events", sf_dir)
    return kmv_pair_overlap(
        kmv_sketch(ev, ["event_type"], "user_id", k=64), "event_type", k=64
    )


@_q(
    "cms_user_counts",
    """
    WITH rows AS (SELECT unnest([0, 1, 2, 3]) AS cms_row),
    cells AS (
      SELECT rows.cms_row,
             ('0x' || substring(md5(CAST(rows.cms_row AS VARCHAR) || ':' ||
                                    CAST(user_id AS VARCHAR)), 1, 15))::BIGINT
               % 1024 AS cms_col
      FROM events, rows
    ), sk AS (
      SELECT cms_row, cms_col, count(*) AS cms_count FROM cells GROUP BY 1, 2
    ), probe AS (
      SELECT DISTINCT user_id FROM events
    ), pc AS (
      SELECT probe.user_id, rows.cms_row,
             ('0x' || substring(md5(CAST(rows.cms_row AS VARCHAR) || ':' ||
                                    CAST(probe.user_id AS VARCHAR)), 1, 15))::BIGINT
               % 1024 AS cms_col
      FROM probe, rows
    )
    SELECT pc.user_id, min(coalesce(sk.cms_count, 0)) AS cms_estimate
    FROM pc LEFT JOIN sk USING (cms_row, cms_col)
    GROUP BY pc.user_id
    """,
)
def cms_user_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Count-min-sketch frequency estimates per user (A7-class count
    metrics from a fixed-size sketch): the 4x1024 counter table is
    data-volume-independent and broadcastable; the probe never shuffles
    the event stream itself."""
    from tastytrade_sdk_spark.operators.sketches import cms_build, cms_probe

    ev = load_table(spark, "events", sf_dir)
    sketch = cms_build(ev, "user_id", depth=4, width=1024)
    keys = ev.select("user_id").distinct()
    return cms_probe(sketch, keys, "user_id", depth=4, width=1024)


@_q(
    "histogram_quantiles_value",
    """
    WITH h AS (
      SELECT event_type,
             least(999, greatest(0, CAST(floor(value / 0.5) AS INT))) AS b,
             count(*) AS c
      FROM events WHERE value IS NOT NULL
      GROUP BY 1, 2
    ), cum AS (
      SELECT event_type, b, c,
             CAST(sum(c) OVER (PARTITION BY event_type ORDER BY b) AS BIGINT) AS cumc,
             CAST(sum(c) OVER (PARTITION BY event_type) AS BIGINT) AS n
      FROM h
    ), qs AS (SELECT CAST(unnest([0.5, 0.9, 0.99]) AS DOUBLE) AS q)
    SELECT event_type, q,
           round(0.0 + b * CAST(0.5 AS DOUBLE), 6) AS hq_value,
           CAST(ceil(q * n) AS BIGINT) AS hq_rank,
           n AS hq_n
    FROM cum, qs
    WHERE cumc >= ceil(q * n) AND cumc - c < ceil(q * n)
    """,
)
def histogram_quantiles_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-memory quantile sketch (A-family percentile metrics at
    scan cost): p50/p90/p99 of event value per type from a 1000-bin
    histogram — at most n_bins rows shuffle per group regardless of
    data volume, vs the exact path shuffling every value."""
    from tastytrade_sdk_spark.operators.sketches import histogram_quantiles

    ev = load_table(spark, "events", sf_dir)
    return histogram_quantiles(
        ev, ["event_type"], "value", [0.5, 0.9, 0.99], lo=0.0, hi=500.0, n_bins=1000
    )


@_q(
    "value_percentiles_exact",
    """
    SELECT event_type,
           round(quantile_cont(value, 0.25), 6) AS p25,
           round(quantile_cont(value, 0.5), 6)  AS p50,
           round(quantile_cont(value, 0.9), 6)  AS p90,
           round(quantile_cont(value, 0.99), 6) AS p99
    FROM events WHERE value IS NOT NULL
    GROUP BY event_type
    """,
)
def value_percentiles_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact per-group percentiles (A-family distribution metrics):
    Spark's percentile agg and DuckDB's quantile_cont share the
    rank = q*(n-1) linear-interpolation definition, so the rounded
    values hash-match. The exact path shuffles every value — the
    sketch twin (histogram_quantiles_value) is the fixed-memory
    alternative at lake scale."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    return ev.groupBy("event_type").agg(
        *[
            F.round(F.percentile("value", F.lit(q)), 6).alias(n)
            for q, n in [(0.25, "p25"), (0.5, "p50"), (0.9, "p90"), (0.99, "p99")]
        ]
    )


@_q(
    "twap_daily",
    """
    WITH o AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day, ts, value,
             lead(ts) OVER (PARTITION BY user_id, CAST(date_trunc('day', ts) AS DATE)
                            ORDER BY ts, event_id) AS nxt
      FROM events WHERE event_type = 'view'
    )
    SELECT user_id, day,
           round(sum(value * (epoch_ms(nxt) - epoch_ms(ts))) /
                 sum(epoch_ms(nxt) - epoch_ms(ts)), 6) AS twap,
           count(*) + 1 AS n_quotes
    FROM o WHERE nxt IS NOT NULL
    GROUP BY user_id, day
    """,
)
def twap_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-weighted average price per key per day (A6's time-weighted
    twin): each quote's weight is its holding duration until the next
    quote — one window pass + one grouped agg, both keyed on
    (user, day) so the window sort and the agg share a shuffle."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("event_type") == "view")
    day = F.date_trunc("day", F.col("ts")).cast("date")
    w = Window.partitionBy("user_id", "day").orderBy("ts", "event_id")
    o = ev.select(
        "user_id", day.alias("day"), "ts", "value", "event_id"
    ).withColumn("nxt", F.lead("ts").over(w))
    dur = (
        F.floor(F.unix_micros(F.col("nxt")) / 1000)
        - F.floor(F.unix_micros(F.col("ts")) / 1000)
    ).cast("double")
    return (
        o.filter(F.col("nxt").isNotNull())
        .groupBy("user_id", "day")
        .agg(
            F.round(F.sum(F.col("value") * dur) / F.sum(dur), 6).alias("twap"),
            (F.count(F.lit(1)) + 1).alias("n_quotes"),
        )
    )


@_q(
    "conversion_funnel",
    """
    WITH v AS (
      SELECT user_id, min(ts) AS view_ts FROM events
      WHERE event_type = 'view' GROUP BY user_id
    ), c AS (
      SELECT e.user_id, min(e.ts) AS click_ts
      FROM events e JOIN v ON e.user_id = v.user_id
      WHERE e.event_type = 'click' AND e.ts > v.view_ts
      GROUP BY e.user_id
    ), p AS (
      SELECT e.user_id, min(e.ts) AS purchase_ts
      FROM events e JOIN c ON e.user_id = c.user_id
      WHERE e.event_type = 'purchase' AND e.ts > c.click_ts
      GROUP BY e.user_id
    )
    SELECT v.user_id, v.view_ts, c.click_ts, p.purchase_ts,
           CASE WHEN p.user_id IS NOT NULL THEN 3
                WHEN c.user_id IS NOT NULL THEN 2 ELSE 1 END AS stage
    FROM v LEFT JOIN c ON v.user_id = c.user_id
           LEFT JOIN p ON v.user_id = p.user_id
    """,
)
def conversion_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered conversion funnel (ST1-adjacent sequence analytics in
    pure relational form): first view, first click strictly after it,
    first purchase strictly after that. Each stage is a grouped min
    plus an equi-join on user — the stage frontiers are tiny aggregated
    tables, so every join broadcasts; the event table is scanned, never
    shuffled whole."""
    ev = load_table(spark, "events", sf_dir)
    v = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("view_ts"))
    )
    c = (
        ev.filter(F.col("event_type") == "click")
        .join(F.broadcast(v), "user_id")
        .filter(F.col("ts") > F.col("view_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("click_ts"))
    )
    p = (
        ev.filter(F.col("event_type") == "purchase")
        .join(F.broadcast(c), "user_id")
        .filter(F.col("ts") > F.col("click_ts"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("purchase_ts"))
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            "view_ts",
            "click_ts",
            "purchase_ts",
            F.when(F.col("purchase_ts").isNotNull(), 3)
            .when(F.col("click_ts").isNotNull(), 2)
            .otherwise(1)
            .alias("stage"),
        )
    )


@_q(
    "cohort_retention",
    """
    WITH first_seen AS (
      SELECT user_id, CAST(date_trunc('week', min(ts)) AS DATE) AS cohort_week
      FROM events GROUP BY user_id
    )
    SELECT cohort_week,
           CAST(date_trunc('week', e.ts) AS DATE) AS active_week,
           count(DISTINCT e.user_id) AS active_users
    FROM events e JOIN first_seen f ON e.user_id = f.user_id
    GROUP BY 1, 2
    """,
)
def cohort_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-activity week,
    activity counted per calendar week. The cohort table is one row
    per user (broadcast side); the fact scan shuffles once on the
    (cohort, week) group key."""
    ev = load_table(spark, "events", sf_dir)
    first_seen = ev.groupBy("user_id").agg(
        F.date_trunc("week", F.min("ts")).cast("date").alias("cohort_week")
    )
    return (
        ev.join(F.broadcast(first_seen), "user_id")
        .groupBy(
            "cohort_week",
            F.date_trunc("week", F.col("ts")).cast("date").alias("active_week"),
        )
        .agg(F.countDistinct("user_id").alias("active_users"))
    )


@_q(
    "moment_stats_per_type",
    """
    WITH s AS (
      SELECT event_type, count(*) AS n,
             sum(value) AS s1, sum(value * value) AS s2,
             sum(value * value * value) AS s3
      FROM events WHERE value IS NOT NULL
      GROUP BY event_type
    )
    SELECT event_type, n,
           round(s1 / n, 6) AS mean,
           round(s2 / n - (s1 / n) * (s1 / n), 4) AS var_pop,
           round((s3 / n - 3 * (s1 / n) * (s2 / n) + 2 * (s1 / n) * (s1 / n) * (s1 / n))
                 / power(s2 / n - (s1 / n) * (s1 / n), 1.5), 4) AS skew_pop
    FROM s
    """,
)
def moment_stats_per_type(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution moments from raw power sums (one map-side-combined
    shuffle; no second pass): mean, population variance, population
    skewness. The explicit-sum formulation is written identically in
    both engines — no dependence on engine-private skewness()
    sample-adjustment conventions."""
    ev = load_table(spark, "events", sf_dir).filter(F.col("value").isNotNull())
    v = F.col("value")
    s = ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(v).alias("s1"),
        F.sum(v * v).alias("s2"),
        F.sum(v * v * v).alias("s3"),
    )
    m1 = F.col("s1") / F.col("n")
    m2 = F.col("s2") / F.col("n")
    m3 = F.col("s3") / F.col("n")
    var_pop = m2 - m1 * m1
    return s.select(
        "event_type",
        "n",
        F.round(m1, 6).alias("mean"),
        F.round(var_pop, 4).alias("var_pop"),
        F.round((m3 - 3 * m1 * m2 + 2 * m1 * m1 * m1) / F.pow(var_pop, 1.5), 4).alias(
            "skew_pop"
        ),
    )


@_q(
    "qty_price_corr",
    """
    WITH s AS (
      SELECT l_returnflag, count(*) AS n,
             sum(l_quantity) AS sx, sum(l_extendedprice) AS sy,
             sum(l_quantity * l_extendedprice) AS sxy,
             sum(l_quantity * l_quantity) AS sxx,
             sum(l_extendedprice * l_extendedprice) AS syy
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag, n,
           round((n * sxy - sx * sy) /
                 (sqrt(n * sxx - sx * sx) * sqrt(n * syy - sy * sy)), 6) AS corr_qty_price,
           round((n * sxy - sx * sy) / (n * sxx - sx * sx), 6) AS beta
    FROM s
    """,
)
def qty_price_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation + OLS slope from raw cross sums (single
    shuffle, explicit formula on both engines — engine corr()
    implementations differ in Welford vs naive accumulation order)."""
    li = load_table(spark, "lineitem", sf_dir)
    x, y = F.col("l_quantity"), F.col("l_extendedprice")
    s = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(x).alias("sx"),
        F.sum(y).alias("sy"),
        F.sum(x * y).alias("sxy"),
        F.sum(x * x).alias("sxx"),
        F.sum(y * y).alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxy, sxx, syy = F.col("sxy"), F.col("sxx"), F.col("syy")
    cov_n = n * sxy - sx * sy
    return s.select(
        "l_returnflag",
        "n",
        F.round(
            cov_n / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy)), 6
        ).alias("corr_qty_price"),
        F.round(cov_n / (n * sxx - sx * sx), 6).alias("beta"),
    )


@_q(
    "event_type_pivot",
    """
    SELECT user_id,
           count(CASE WHEN event_type = 'view' THEN 1 END)     AS n_view,
           count(CASE WHEN event_type = 'click' THEN 1 END)    AS n_click,
           count(CASE WHEN event_type = 'purchase' THEN 1 END) AS n_purchase,
           count(CASE WHEN event_type = 'signup' THEN 1 END)   AS n_signup,
           count(CASE WHEN event_type = 'error' THEN 1 END)    AS n_error
    FROM events GROUP BY user_id
    """,
)
def event_type_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide per-key activity matrix (P10-style partition-to-columns):
    conditional counts in ONE grouped pass — the pivot never needs a
    second shuffle because the column set is a fixed enum."""
    ev = load_table(spark, "events", sf_dir)
    aggs = [
        F.count(F.when(F.col("event_type") == t, 1)).alias(f"n_{t}")
        for t in ("view", "click", "purchase", "signup", "error")
    ]
    return ev.groupBy("user_id").agg(*aggs)


@_q(
    "zscore_anomalies",
    """
    WITH w AS (
      SELECT user_id, event_id, ts, value,
             avg(value)  OVER win AS mu,
             count(*)    OVER win AS n_win,
             sum(value * value) OVER win AS s2,
             sum(value)  OVER win AS s1
      FROM events
      WINDOW win AS (PARTITION BY user_id ORDER BY ts, event_id
                     ROWS BETWEEN 19 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, event_id, ts, value,
           round((value - s1 / n_win) /
                 sqrt(s2 / n_win - (s1 / n_win) * (s1 / n_win)), 4) AS zscore
    FROM w
    WHERE n_win >= 10
      AND s2 / n_win - (s1 / n_win) * (s1 / n_win) > 0
      AND abs((value - s1 / n_win) /
              sqrt(s2 / n_win - (s1 / n_win) * (s1 / n_win))) > 2.5
    """,
)
def zscore_anomalies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling z-score anomaly flags (W-family monitoring): each value
    scored against the TRAILING 20-row window (current row excluded —
    a spike must not contaminate its own baseline). Moments come from
    power sums over the window, identical formula both engines; one
    window sort keyed (user, ts, id)."""
    ev = load_table(spark, "events", sf_dir)
    # rowsBetween(-19, -1) == "19 PRECEDING AND 1 PRECEDING": 19 rows
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-19, -1)
    )
    n_win = F.count(F.lit(1)).over(w)
    s1 = F.sum("value").over(w)
    s2 = F.sum(F.col("value") * F.col("value")).over(w)
    return (
        ev.select("user_id", "event_id", "ts", "value",
                  n_win.alias("n_win"), s1.alias("s1"), s2.alias("s2"))
        .withColumn("mu", F.col("s1") / F.col("n_win"))
        .withColumn("var", F.col("s2") / F.col("n_win") - F.col("mu") * F.col("mu"))
        .filter(
            (F.col("n_win") >= 10)
            & (F.col("var") > 0)
            & (F.abs((F.col("value") - F.col("mu")) / F.sqrt(F.col("var"))) > 2.5)
        )
        .select(
            "user_id", "event_id", "ts", "value",
            F.round((F.col("value") - F.col("mu")) / F.sqrt(F.col("var")), 4).alias(
                "zscore"
            ),
        )
    )


@_q(
    "cdc_final_state",
    """
    SELECT user_id, event_id AS last_change_id, ts AS changed_at,
           event_type AS op, value
    FROM events
    QUALIFY row_number() OVER (PARTITION BY user_id
                               ORDER BY ts DESC, event_id DESC) = 1
       AND event_type != 'error'
    """,
)
def cdc_final_state(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CDC change-log application (D2 extended with delete semantics):
    events replay as a change stream keyed by user — 'error' plays the
    delete op, everything else upserts. Keys whose last change is a
    delete drop out of the final state; one shuffle total."""
    from tastytrade_sdk_spark.operators.dedup import cdc_apply

    ev = load_table(spark, "events", sf_dir)
    return cdc_apply(
        ev.withColumnRenamed("event_type", "op"),
        ["user_id"],
        ["ts", "event_id"],
        op_col="op",
        delete_ops=("error",),
    ).select(
        "user_id",
        F.col("event_id").alias("last_change_id"),
        F.col("ts").alias("changed_at"),
        "op",
        "value",
    )


@_q(
    "rollup_delta_maintain",
    """
    WITH pop AS (
      SELECT user_id, CAST(round(value * 100) AS BIGINT) AS cents
      FROM events
      WHERE (event_id % 7 = 0)
         OR (event_id % 7 != 0 AND event_type != 'error')
    )
    SELECT user_id,
           count(*) AS n_rows,
           CAST(sum(cents) AS DOUBLE) / 100 AS sum_value,
           CAST(sign(CAST(sum(cents) AS BIGINT))
                * ((abs(CAST(sum(cents) AS BIGINT)) * 20000 + count(*))
                   // (2 * count(*)))
                AS DOUBLE) / 1000000 AS avg_value
    FROM pop GROUP BY user_id
    """,
)
def rollup_delta_maintain(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental view maintenance (counting algorithm): a stored
    per-user rollup is maintained under a signed CDC batch — inserts
    (the rows the snapshot missed) plus retractions (the snapshot's
    'error' rows) — WITHOUT rescanning the base. The stored view is
    never shuffled (delta aggregate broadcasts into one left join;
    new groups via a key-column-pruned anti probe), and keys whose
    maintained count reaches zero drop out. The oracle recomputes the
    maintained population directly, so incremental == full recompute
    is the checked contract (operators/ivm.py).

    Money arithmetic per the module-header grid rule: value (2dp grid)
    is carried as scaled cents, sums stay exact integers through BOTH
    the stored aggregate and the delta fold, and the 6dp average
    rounds half-away in integer space (the position_summary recipe) —
    the 3138.54/64 = 49.0396875 midpoint is exactly the case double
    rounding gets wrong."""
    from tastytrade_sdk_spark.operators.ivm import delta_apply_agg

    ev = load_table(spark, "events", sf_dir).select(
        "user_id",
        "event_id",
        "event_type",
        F.round(F.col("value") * 100).cast("long").alias("cents"),
    )
    base = ev.filter(F.col("event_id") % 7 != 0)
    stored = base.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("cents").alias("sum_cents")
    )
    inserts = ev.filter(F.col("event_id") % 7 == 0).select(
        "user_id", "cents", F.lit(1).alias("sign")
    )
    retractions = base.filter(F.col("event_type") == "error").select(
        "user_id", "cents", F.lit(-1).alias("sign")
    )
    maintained = delta_apply_agg(
        stored, inserts.unionByName(retractions), ["user_id"], ["cents"]
    )
    return maintained.select(
        "user_id",
        "n_rows",
        (F.col("sum_cents").cast("double") / 100).alias("sum_value"),
        (
            F.expr(
                "signum(sum_cents) * ((abs(sum_cents) * 20000 + n_rows)"
                " div (2 * n_rows))"
            ).cast("double")
            / 1000000
        ).alias("avg_value"),
    )


@_q(
    "event_transition_counts",
    """
    WITH o AS (
      SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events
    )
    SELECT event_type AS from_type, next_type AS to_type,
           count(*) AS n_transitions
    FROM o WHERE next_type IS NOT NULL
    GROUP BY 1, 2
    """,
)
def event_transition_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey transition matrix (Markov bigram counts over each
    user's ordered event sequence): one window sort per user + one
    grouped count — the sequence never leaves its key's partition."""
    ev = load_table(spark, "events", sf_dir)
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        ev.select(
            F.col("event_type").alias("from_type"),
            F.lead("event_type").over(w).alias("to_type"),
        )
        .filter(F.col("to_type").isNotNull())
        .groupBy("from_type", "to_type")
        .agg(F.count(F.lit(1)).alias("n_transitions"))
    )


@_q(
    "realized_volatility_daily",
    """
    WITH r AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS DATE) AS day,
             ln(value / lag(value) OVER (PARTITION BY user_id
                                         ORDER BY ts, event_id)) AS lr
      FROM events
      WHERE event_type = 'view' AND value > 0
    )
    SELECT user_id, day,
           count(lr) AS n_returns,
           round(sqrt(sum(lr * lr)), 6) AS realized_vol
    FROM r WHERE lr IS NOT NULL
    GROUP BY user_id, day
    HAVING count(lr) >= 2
    """,
)
def realized_volatility_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Realized volatility per key per day: sqrt of summed squared log
    returns (the standard high-frequency estimator). One window sort
    for the lag + one grouped agg, both keyed on user — the return
    series never leaves its partition."""
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("event_type") == "view") & (F.col("value") > 0)
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    lr = F.log(F.col("value") / F.lag("value").over(w))
    day = F.date_trunc("day", F.col("ts")).cast("date")
    return (
        ev.select("user_id", day.alias("day"), lr.alias("lr"))
        .filter(F.col("lr").isNotNull())
        .groupBy("user_id", "day")
        .agg(
            F.count("lr").alias("n_returns"),
            F.round(F.sqrt(F.sum(F.col("lr") * F.col("lr"))), 6).alias(
                "realized_vol"
            ),
        )
        .filter(F.col("n_returns") >= 2)
    )


@_q(
    "max_drawdown_per_user",
    """
    WITH p AS (
      SELECT user_id, ts, event_id, value,
             max(value) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS peak
      FROM events WHERE event_type = 'view' AND value > 0
    )
    SELECT user_id,
           round(min(value / peak - 1), 6) AS max_drawdown,
           count(*) AS n_points
    FROM p GROUP BY user_id
    """,
)
def max_drawdown_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum drawdown: worst trough relative to the running peak —
    running max window + grouped min, one partition-local sort."""
    ev = load_table(spark, "events", sf_dir).filter(
        (F.col("event_type") == "view") & (F.col("value") > 0)
    )
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    peak = F.max("value").over(w)
    return (
        ev.select("user_id", (F.col("value") / peak - 1).alias("dd"))
        .groupBy("user_id")
        .agg(
            F.round(F.min("dd"), 6).alias("max_drawdown"),
            F.count(F.lit(1)).alias("n_points"),
        )
    )


_BLOOM_H = (
    "('0x' || substring(md5(CAST({k} AS VARCHAR)), 1, 8))::BIGINT"
)
_BLOOM_H2 = (
    "('0x' || substring(md5(CAST({k} AS VARCHAR)), 9, 8))::BIGINT"
)

_BLOOM_ORACLE = f"""
    WITH bkeys AS (
      SELECT DISTINCT c_custkey FROM customer WHERE c_acctbal > 9000
    ), bh AS (
      SELECT {_BLOOM_H.format(k='c_custkey')} AS h1,
             {_BLOOM_H2.format(k='c_custkey')} AS h2
      FROM bkeys
    ), bpos AS (
      SELECT DISTINCT (h1 + i * h2) % 1024 AS p FROM bh, range(3) r(i)
    ), probe AS (
      SELECT o_orderkey, o_custkey,
             {_BLOOM_H.format(k='o_custkey')} AS h1,
             {_BLOOM_H2.format(k='o_custkey')} AS h2
      FROM orders
    ), pp AS (
      SELECT o_orderkey, o_custkey, (h1 + i * h2) % 1024 AS p
      FROM probe, range(3) r(i)
    )
    SELECT pp.o_orderkey, pp.o_custkey
    FROM pp LEFT JOIN bpos ON pp.p = bpos.p
    GROUP BY pp.o_orderkey, pp.o_custkey
    HAVING count(bpos.p) = 3
"""


@_q("bloom_semijoin_prune", _BLOOM_ORACLE)
def bloom_semijoin_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter semi-join pruning (operators/bloom.py): a compact
    md5-double-hash bit set over the high-balance customers, probed as
    a pure JVM expression against the orders scan — the explicit form
    of the scan-reduction lever a lake join applies before shuffling.
    The bitmap is deliberately UNDERSIZED (1024 bits for ~hundreds of
    keys) so false positives occur and the oracle must reproduce them
    exactly — membership is a pure function of (keys, n_bits,
    n_hashes, md5), so it does."""
    from tastytrade_sdk_spark.operators.bloom import bloom_filter

    cust = load_table(spark, "customer", sf_dir).filter(
        F.col("c_acctbal") > 9000
    )
    orders = load_table(spark, "orders", sf_dir)
    return bloom_filter(
        orders, cust, "o_custkey", "c_custkey", n_bits=1024, n_hashes=3
    ).select("o_orderkey", "o_custkey")


@_q(
    "interpolate_hourly",
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
    ), j AS (
      -- membership flag, not value-nullness: a real bucket whose
      -- aggregate happens to be NULL must not read as synthetic
      -- (matches the operator's join-membership definition)
      SELECT c.user_id, c.bucket, h.hour_value,
             (h.bucket IS NULL) AS is_synth
      FROM cal c LEFT JOIN hourly h
        ON c.user_id = h.user_id AND c.bucket = h.bucket
    ), w AS (
      SELECT user_id, bucket, hour_value, is_synth,
        last_value(hour_value IGNORE NULLS) OVER wb AS pv,
        last_value(CASE WHEN hour_value IS NOT NULL
                        THEN CAST(epoch_us(bucket) AS DOUBLE) END IGNORE NULLS)
          OVER wb AS pt,
        first_value(hour_value IGNORE NULLS) OVER wf AS nv,
        first_value(CASE WHEN hour_value IS NOT NULL
                         THEN CAST(epoch_us(bucket) AS DOUBLE) END IGNORE NULLS)
          OVER wf AS nt
      FROM j
      WINDOW
        wb AS (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW),
        wf AS (PARTITION BY user_id ORDER BY bucket
               ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
    )
    SELECT user_id, bucket AS time,
           -- floor(x*1e6 + 0.5)/1e6 on BOTH engines: round() here is a
           -- shortest-repr-vs-binary trap (Spark BigDecimal.valueOf
           -- rounds the printed form, DuckDB rounds the binary value;
           -- 65.40468749999999.. diverges). The explicit formula is
           -- the same IEEE ops on both sides, so it cannot.
           floor(CASE WHEN hour_value IS NOT NULL THEN hour_value
                      WHEN pv IS NOT NULL AND nv IS NOT NULL
                      THEN pv + (nv - pv)
                           * (CAST(epoch_us(bucket) AS DOUBLE) - pt)
                           / (nt - pt)
                      ELSE coalesce(pv, nv) END * 1000000 + 0.5)
             / 1000000 AS hour_value,
           is_synth AS is_synthetic
    FROM w
    """,
)
def interpolate_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """W6+ linear interpolation (round 4): the numeric sibling of
    gap_fill_hourly — synthetic buckets get the time-weighted value
    between their real neighbors instead of a carried-forward copy
    (the resampling step before fixed-step feature models). Same
    scaffold + one keyed shuffle; the interpolation itself is two
    window passes, identical arithmetic order on both engines."""
    from tastytrade_sdk_spark.operators.gapfill import interpolate_linear

    ev = load_table(spark, "events", sf_dir)
    hourly = ev.groupBy(
        "user_id", F.date_trunc("hour", F.col("ts")).alias("bucket")
    ).agg(F.round(F.sum("value"), 6).alias("hour_value"))
    out = interpolate_linear(
        hourly,
        key_cols=["user_id"],
        time_col="bucket",
        interval="1 hour",
        value_cols=["hour_value"],
    )
    # shared explicit rounding site (see the oracle comment): the
    # same floor(x*1e6 + 0.5)/1e6 double arithmetic on both engines
    return out.select(
        "user_id",
        F.col("bucket").alias("time"),
        (
            F.floor(F.col("hour_value") * F.lit(1000000.0) + F.lit(0.5))
            / F.lit(1000000.0)
        ).alias("hour_value"),
        "is_synthetic",
    )


# 0.709 * m^2 * 2^scale for m=64/p=6 — computed ONCE in Python and
# spliced as the identical double literal into both engines, so the
# raw-estimate division is the only float op and is bit-identical.
_HLL_NUM = 0.709 * 64 * 64 * float(1 << 55)


@_q(
    "hll_distinct_users",
    f"""
    WITH h AS (
      SELECT DISTINCT event_type,
             ('0x' || substring(md5(CAST(user_id AS VARCHAR)), 1, 15))::BIGINT AS h
      FROM events
    ), rr AS (
      SELECT event_type, h & 63 AS reg,
             CASE WHEN h >> 6 = 0 THEN 55
                  ELSE 55 - length(bin(h >> 6)) END AS rho
      FROM h
    ), mr AS (
      SELECT event_type, reg, max(rho) AS mr FROM rr GROUP BY 1, 2
    ), agg AS (
      SELECT event_type,
             CAST(64 - count(*) AS INTEGER) AS hll_zero_regs,
             CAST(sum(CAST(1 AS BIGINT) << (55 - mr)) AS BIGINT)
               + (64 - count(*)) * (CAST(1 AS BIGINT) << 55) AS sum_int
      FROM mr GROUP BY event_type
    )
    SELECT event_type, hll_zero_regs,
           round({_HLL_NUM!r} / CAST(sum_int AS DOUBLE), 4) AS hll_raw,
           round(CASE WHEN {_HLL_NUM!r} / CAST(sum_int AS DOUBLE) <= 160.0
                       AND hll_zero_regs > 0
                      THEN 64.0 * ln(64.0 / CAST(hll_zero_regs AS DOUBLE))
                      ELSE {_HLL_NUM!r} / CAST(sum_int AS DOUBLE)
                 END, 4) AS hll_estimate
    FROM agg
    """,
)
def hll_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog distinct users per event type (the mergeable twin
    of kmv_distinct_users): explicit md5 register construction — NOT
    approx_count_distinct's engine-private HLL++ — so the identical
    sketch is rebuilt and hash-verified in DuckDB, and per-partition
    sketches merge by register max (tested in test_sketches).

    Plan shape: one (event_type, register) partial-agg shuffle — at
    most 64 rows per group survive the map-side combine — then the
    per-group estimate; the user_id column itself never shuffles."""
    from tastytrade_sdk_spark.operators.sketches import (
        hll_estimate,
        hll_sketch,
    )

    ev = load_table(spark, "events", sf_dir)
    sk = hll_sketch(ev, ["event_type"], "user_id", p=6)
    return hll_estimate(sk, p=6).select(
        "event_type", "hll_zero_regs", "hll_raw", "hll_estimate"
    )


# ---------------------------------------------------------------------------
# Indicator widening (r6 continuation): ATR / OBV / Donchian / Keltner
# over a per-user daily OHLC base — same exact-replay discipline as
# rsi/bollinger/stochastic (beyond-reference; reference ships
# Hull/MACD only, src/tastytrade/analytics/visualizations/momentum.py)
# ---------------------------------------------------------------------------

_DAILY_OHLC_CTE = """
    WITH b AS (
      SELECT user_id, CAST(date_trunc('day', ts) AS TIMESTAMP) AS day,
             ts, event_id, value
      FROM events
    ), r AS (
      SELECT *,
             row_number() OVER (PARTITION BY user_id, day ORDER BY ts DESC, event_id DESC) AS rn_d
      FROM b
    ), dohlc AS (
      SELECT user_id, day,
             max(value)                          AS high,
             min(value)                          AS low,
             max(CASE WHEN rn_d = 1 THEN value END) AS close,
             count(*)                            AS n_events
      FROM r
      GROUP BY user_id, day
    )
"""


def _daily_ohlc(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared derived series: per-user daily high/low/close/count via
    the A8 candle aggregation (min_by/max_by — one hash agg, no window
    sort; scan prunes to 4 columns)."""
    ev = load_table(spark, "events", sf_dir)
    c = ohlcv(
        ev,
        symbol_col="user_id",
        time_col="ts",
        price_col="value",
        size_col=None,
        interval="1 day",
        order_col="event_id",
    )
    return c.select(
        F.col("symbol").alias("user_id"),
        F.col("time").alias("day"),
        "high",
        "low",
        "close",
        F.col("count").alias("n_events"),
    )


@_q(
    "atr_daily",
    _DAILY_OHLC_CTE
    + """
    , t AS (
      SELECT user_id, day, high, low, close,
             CASE WHEN lag(close) OVER win IS NULL THEN high - low
                  ELSE greatest(high - low,
                                abs(high - lag(close) OVER win),
                                abs(low - lag(close) OVER win)) END AS tr
      FROM dohlc
      WINDOW win AS (PARTITION BY user_id ORDER BY day)
    ), a AS (
      SELECT user_id, day, close, tr,
             list(tr) OVER w2 AS arr,
             first_value(tr) OVER w2 AS seed
      FROM t
      WINDOW w2 AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    )
    SELECT user_id, day, close,
           round(tr, 6) AS tr,
           round(list_reduce(list_prepend(seed, arr),
             (acc, x) -> acc*(1.0 - 2.0/28.0) + x*(2.0/28.0)), 6) AS atr
    FROM a
    """,
)
def atr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wilder ATR(14) over the per-user daily OHLC series. TR is
    bit-identical across engines (differences of the same parquet
    doubles); the smoothing is the seeded-EMA exact fold (alpha=1/14
    == EMA length 27, seed = first TR), so round(,6) sites agree.
    Plan: one hash agg (candles) + one window chain — two shuffles on
    the same key, AQE-coalesced."""
    from tastytrade_sdk_spark.operators.indicators import (
        atr_col,
        true_range_col,
    )

    d = _daily_ohlc(spark, sf_dir)
    staged = d.withColumn(
        "__tr",
        true_range_col(
            F.col("high"), F.col("low"), F.col("close"), ["user_id"], ["day"]
        ),
    )
    a = atr_col(F.col("__tr"), 14, ["user_id"], ["day"])
    return staged.select(
        "user_id",
        "day",
        "close",
        F.round("__tr", 6).alias("tr"),
        F.round(a, 6).alias("atr"),
    )


@_q(
    "obv_daily",
    _DAILY_OHLC_CTE
    + """
    , s AS (
      SELECT user_id, day, close, n_events,
             CASE WHEN lag(close) OVER win IS NULL OR close = lag(close) OVER win
                    THEN CAST(0 AS BIGINT)
                  WHEN close > lag(close) OVER win THEN CAST(n_events AS BIGINT)
                  ELSE -CAST(n_events AS BIGINT) END AS signed_vol
      FROM dohlc
      WINDOW win AS (PARTITION BY user_id ORDER BY day)
    )
    SELECT user_id, day, close,
           CAST(sum(signed_vol) OVER (PARTITION BY user_id ORDER BY day
                ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS obv
    FROM s
    """,
)
def obv_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """On-balance volume over the per-user daily series (volume :=
    the day's event count — the synthetic stream has no size column).
    Exact BIGINT running sum; sign comparisons on identical grid
    doubles — no float output at all."""
    from tastytrade_sdk_spark.operators.indicators import obv_col

    d = _daily_ohlc(spark, sf_dir)
    o = obv_col(F.col("close"), F.col("n_events"), ["user_id"], ["day"])
    return d.select("user_id", "day", "close", o.alias("obv"))


@_q(
    "donchian_daily",
    _DAILY_CTE
    + """
    , c AS (
      SELECT user_id, day, day_value,
             max(day_value) OVER w20 AS upper_chan,
             min(day_value) OVER w20 AS lower_chan
      FROM daily
      WINDOW w20 AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 20 PRECEDING AND 1 PRECEDING)
    )
    SELECT user_id, day, day_value, upper_chan, lower_chan,
           floor((upper_chan + lower_chan) / 2 * 1000000 + 0.5) / 1000000 + 0.0 AS mid_chan,
           day_value > upper_chan AS breakout_up,
           day_value < lower_chan AS breakout_down
    FROM c
    """,
)
def donchian_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Donchian channel (20, prior-window): rolling min/max of the
    PRECEDING 20 rows (current row excluded so a new extreme reads as
    a breakout, the trading use). First row per user has a NULL
    channel by contract. min/max are exact; the midpoint can land on
    the half-micro grid, so it rounds with the bollinger floor recipe
    on both engines."""
    daily = _daily_series(spark, sf_dir)
    w20 = (
        Window.partitionBy("user_id").orderBy("day").rowsBetween(-20, -1)
    )
    upper = F.max("day_value").over(w20)
    lower = F.min("day_value").over(w20)
    return daily.select(
        "user_id",
        "day",
        "day_value",
        upper.alias("upper_chan"),
        lower.alias("lower_chan"),
        (F.floor((upper + lower) / 2 * 1e6 + 0.5) / 1e6 + 0.0).alias("mid_chan"),
        (F.col("day_value") > upper).alias("breakout_up"),
        (F.col("day_value") < lower).alias("breakout_down"),
    )


@_q(
    "keltner_daily",
    _DAILY_OHLC_CTE
    + """
    , t AS (
      SELECT user_id, day, high, low, close,
             CASE WHEN lag(close) OVER win IS NULL THEN high - low
                  ELSE greatest(high - low,
                                abs(high - lag(close) OVER win),
                                abs(low - lag(close) OVER win)) END AS tr
      FROM dohlc
      WINDOW win AS (PARTITION BY user_id ORDER BY day)
    ), a AS (
      SELECT user_id, day, close, tr,
             list(close) OVER w2 AS carr,
             first_value(close) OVER w2 AS cseed,
             list(tr) OVER w2 AS tarr,
             first_value(tr) OVER w2 AS tseed
      FROM t
      WINDOW w2 AS (PARTITION BY user_id ORDER BY day
                    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
    ), e AS (
      SELECT user_id, day, close,
             list_reduce(list_prepend(cseed, carr),
               (acc, x) -> acc*(1.0 - 2.0/21.0) + x*(2.0/21.0)) AS mid,
             list_reduce(list_prepend(tseed, tarr),
               (acc, x) -> acc*(1.0 - 2.0/20.0) + x*(2.0/20.0)) AS atr10
      FROM a
    )
    SELECT user_id, day, close,
           round(mid, 6) AS mid_line,
           round(mid + 2*atr10, 6) AS upper_band,
           round(mid - 2*atr10, 6) AS lower_band
    FROM e
    """,
)
def keltner_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keltner channel: EMA(20) midline (seed = first close) ± 2 ×
    Wilder ATR(10) over the per-user daily OHLC. Both folds are the
    exact seeded-EMA recurrence (alpha 2/21 and 1/10 == length 19), so
    the band arithmetic is bit-identical across engines before the
    round. Composes the atr_daily and ema_seeded_daily machinery in
    one window chain — still a single shuffle after the candle agg."""
    from tastytrade_sdk_spark.operators.indicators import (
        atr_col,
        ema_expr_col,
        true_range_col,
    )

    d = _daily_ohlc(spark, sf_dir)
    staged = d.withColumn(
        "__tr",
        true_range_col(
            F.col("high"), F.col("low"), F.col("close"), ["user_id"], ["day"]
        ),
    )
    mid = ema_expr_col(F.col("close"), 20, ["user_id"], ["day"])
    atr10 = atr_col(F.col("__tr"), 10, ["user_id"], ["day"])
    return staged.select(
        "user_id",
        "day",
        "close",
        F.round(mid, 6).alias("mid_line"),
        F.round(mid + 2 * atr10, 6).alias("upper_band"),
        F.round(mid - 2 * atr10, 6).alias("lower_band"),
    )


# ---------------------------------------------------------------------------
# TPC-H-shape widening (r6 continuation): Q2/Q8/Q10/Q14/Q17/Q18/Q19/Q22
# forms over the star schema (lineitem plays partsupp where needed —
# the synthetic schema has no partsupp/shipmode/commitdate columns)
# ---------------------------------------------------------------------------

_DISC_REV_DEC = """l_extendedprice::DECIMAL(18,2) * (1 - l_discount::DECIMAL(18,2))"""


def _disc_rev_dec() -> F.Column:
    """Exact decimal discounted revenue (4dp grid — the
    pricing_summary boundary rule)."""
    return F.col("l_extendedprice").cast("decimal(18,2)") * (
        F.lit(1) - F.col("l_discount").cast("decimal(18,2)")
    )


@_q(
    "promo_revenue_monthly",
    f"""
    SELECT CAST(date_trunc('month', l_shipdate) AS TIMESTAMP) AS month,
           round(100.0 * CAST(sum(CASE WHEN p_type = 'PROMO'
                                       THEN {_DISC_REV_DEC}
                                       ELSE 0::DECIMAL(18,2) END) AS DOUBLE)
                 / CAST(sum({_DISC_REV_DEC}) AS DOUBLE), 6) AS promo_share,
           count(*) AS n_lines
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
    GROUP BY 1
    """,
)
def promo_revenue_monthly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape (promotion effect): PROMO-part revenue share per
    ship month. part broadcasts into the lineitem scan (the date filter
    pushes down); both revenue sums run in exact DECIMAL and cast to
    double BEFORE the one division, so the ratio bits agree across
    engines; round(,6) on a continuous ratio is boundary-safe."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_type")
    promo = F.sum(
        F.when(F.col("p_type") == "PROMO", _disc_rev_dec()).otherwise(
            F.lit(0).cast("decimal(18,2)")
        )
    ).cast("double")
    total = F.sum(_disc_rev_dec()).cast("double")
    return (
        li.join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy(F.date_trunc("month", "l_shipdate").alias("month"))
        .agg(
            F.round(F.lit(100.0) * promo / total, 6).alias("promo_share"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "large_volume_customers",
    """
    WITH big AS (
      SELECT l_orderkey, CAST(sum(l_quantity) AS BIGINT) AS total_qty
      FROM lineitem GROUP BY 1 HAVING sum(l_quantity) > 250
    )
    SELECT c_name, c_custkey, o_orderkey,
           CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
           o_totalprice, total_qty
    FROM big
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN customer ON c_custkey  = o_custkey
    """,
)
def large_volume_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume customers): orders whose line
    quantities sum past 250 units, with their customer. The HAVING
    aggregate is map-side partial (integer-valued doubles sum exactly
    — no float boundary); the survivor set (~1-2% of orders) joins
    orders by key and broadcasts customer. At 100 TB the big-order
    aggregate is the only full shuffle; the join side is pre-shrunk."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_quantity"
    )
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum("l_quantity").alias("__qty"))
        .filter(F.col("__qty") > 250)
        .select("l_orderkey", F.col("__qty").cast("long").alias("total_qty"))
    )
    orders = load_table(spark, "orders", sf_dir)
    cust = load_table(spark, "customer", sf_dir).select("c_custkey", "c_name")
    return (
        big.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .select(
            "c_name", "c_custkey", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty",
        )
    )


@_q(
    "brand_size_disjunct_revenue",
    f"""
    SELECT CAST(round(sum({_DISC_REV_DEC}), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15
           AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#23' AND p_size BETWEEN 1 AND 25
           AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#3'  AND p_size BETWEEN 1 AND 35
           AND l_quantity BETWEEN 20 AND 30)
    """,
)
def brand_size_disjunct_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape (discounted revenue under a disjunctive
    predicate): three (brand, size-range, quantity-range) arms OR-ed
    together. The part arms prune the broadcast build side BEFORE the
    join (Catalyst pushes the common p_brand/p_size disjunction into
    the part scan); the quantity arms evaluate post-join. One exact
    DECIMAL sum, one row out."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).select(
        "p_partkey", "p_brand", "p_size"
    )
    q = F.col("l_quantity")
    arm1 = (
        (F.col("p_brand") == "Brand#12")
        & F.col("p_size").between(1, 15)
        & q.between(1, 11)
    )
    arm2 = (
        (F.col("p_brand") == "Brand#23")
        & F.col("p_size").between(1, 25)
        & q.between(10, 20)
    )
    arm3 = (
        (F.col("p_brand") == "Brand#3")
        & F.col("p_size").between(1, 35)
        & q.between(20, 30)
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .filter(arm1 | arm2 | arm3)
        .agg(
            F.round(F.sum(_disc_rev_dec()), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "idle_customer_balances",
    """
    WITH cents AS (
      SELECT c_custkey, c_nationkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS bal_cents
      FROM customer
    ), pos AS (
      SELECT count(*) AS n_pos, sum(bal_cents) AS tot_cents
      FROM cents WHERE bal_cents > 0
    )
    SELECT n_name,
           count(*) AS n_idle,
           CAST(sum(bal_cents) AS DOUBLE) / 100.0 AS total_bal
    FROM cents
    JOIN nation ON n_nationkey = c_nationkey
    CROSS JOIN pos
    WHERE bal_cents * n_pos > tot_cents
      AND NOT EXISTS (
        SELECT 1 FROM orders
        WHERE o_custkey = c_custkey
          AND o_orderdate >= TIMESTAMP '2000-01-01'
      )
    GROUP BY n_name
    """,
)
def idle_customer_balances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape (global sales opportunity): customers holding an
    above-average positive balance with no recent orders, rolled up by
    nation. The above-average test runs as an exact integer
    cross-multiplication (bal_cents · n_pos > tot_cents) against a
    1-row broadcast aggregate — no float average, no boundary flips.
    The no-recent-orders test is a LEFT ANTI hash join against the
    date-pruned orders scan; nation broadcasts. Scale: customer scans
    twice (once into the 1-row aggregate, once full) — both scans
    prune to 3 columns."""
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey",
        "c_nationkey",
        F.round(F.col("c_acctbal") * 100, 0).cast("long").alias("bal_cents"),
    )
    pos = cust.filter(F.col("bal_cents") > 0).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum("bal_cents").alias("tot_cents"),
    )
    recent = (
        load_table(spark, "orders", sf_dir)
        .filter(F.col("o_orderdate") >= F.lit("2000-01-01").cast("timestamp"))
        .select("o_custkey")
    )
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name"
    )
    return (
        cust.crossJoin(F.broadcast(pos))
        .filter(F.col("bal_cents") * F.col("n_pos") > F.col("tot_cents"))
        .join(recent, F.col("o_custkey") == F.col("c_custkey"), "left_anti")
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("n_name")
        .agg(
            F.count(F.lit(1)).alias("n_idle"),
            (F.sum("bal_cents").cast("double") / F.lit(100.0)).alias(
                "total_bal"
            ),
        )
    )


@_q(
    "min_cost_supplier_per_part",
    """
    WITH unit AS (
      -- l_quantity > 0 pins the zero-quantity edge: Spark (non-ANSI)
      -- yields NULL for x/0 while DuckDB yields inf, so the guard
      -- makes the division's domain identical on both engines
      SELECT l_partkey, l_suppkey,
             l_extendedprice / l_quantity AS unit_cost
      FROM lineitem
      WHERE l_quantity > 0
    ), ranked AS (
      SELECT l_partkey, l_suppkey, unit_cost,
             min(unit_cost) OVER (PARTITION BY l_partkey) AS min_cost
      FROM unit
    )
    SELECT DISTINCT p_partkey, p_brand, s_name, n_name,
           round(unit_cost, 6) AS unit_cost
    FROM ranked
    JOIN part     ON p_partkey  = l_partkey AND p_size = 15
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN nation   ON n_nationkey = s_nationkey
    WHERE unit_cost = min_cost
    """,
)
def min_cost_supplier_per_part(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): for every size-15 part,
    the supplier(s) quoting the lowest unit cost — lineitem plays the
    partsupp association. The classic correlated subquery rewrites to
    a window-min over the part key (one shuffle); part/supplier/nation
    broadcast. unit_cost is the same double division on both engines,
    so the min-equality match is bit-exact; ties keep every minimal
    supplier (DISTINCT absorbs repeat quotes). The l_quantity > 0
    guard (advisor r6) pins the zero-quantity edge where Spark's
    non-ANSI division yields NULL but DuckDB yields inf — TPC-H-style
    data never hits it, but the semantics shouldn't be data-dependent."""
    li = (
        load_table(spark, "lineitem", sf_dir)
        .filter(F.col("l_quantity") > 0)
        .select(
            "l_partkey",
            "l_suppkey",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"),
        )
    )
    w = Window.partitionBy("l_partkey")
    ranked = li.withColumn("__min", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("__min")
    )
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_size") == 15
    ).select("p_partkey", "p_brand")
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name"
    )
    return (
        ranked.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("s_nationkey"))
        .select(
            "p_partkey",
            "p_brand",
            "s_name",
            "n_name",
            F.round("unit_cost", 6).alias("unit_cost"),
        )
        .distinct()
    )


@_q(
    "returned_item_report",
    f"""
    WITH rev AS (
      SELECT c_custkey, c_name, n_name,
             sum({_DISC_REV_DEC}) AS rev_dec
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey  = o_custkey
      JOIN nation   ON n_nationkey = c_nationkey
      WHERE l_returnflag = 'R'
        AND o_orderdate >= TIMESTAMP '1997-01-01'
        AND o_orderdate <  TIMESTAMP '1997-04-01'
      GROUP BY 1, 2, 3
    )
    SELECT c_custkey, c_name, n_name,
           CAST(round(rev_dec, 2) AS DOUBLE) AS revenue
    FROM rev
    ORDER BY rev_dec DESC, c_custkey
    LIMIT 20
    """,
)
def returned_item_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape (returned-item reporting): top-20 customers by
    revenue lost to returns in one quarter. The revenue sort key is
    the EXACT decimal sum (ties broken by custkey), so the LIMIT is
    deterministic across engines; the double cast happens after the
    round, on the output only. orders date-prunes before the join;
    customer/nation broadcast."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        F.col("l_returnflag") == "R"
    )
    orders = load_table(spark, "orders", sf_dir).filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_name", "c_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name"
    )
    rev = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(nation), F.col("n_nationkey") == F.col("c_nationkey"))
        .groupBy("c_custkey", "c_name", "n_name")
        .agg(F.sum(_disc_rev_dec()).alias("__rev_dec"))
    )
    return (
        rev.orderBy(F.col("__rev_dec").desc(), F.col("c_custkey"))
        .limit(20)
        .select(
            "c_custkey",
            "c_name",
            "n_name",
            F.round("__rev_dec", 2).cast("double").alias("revenue"),
        )
    )


@_q(
    "nation_market_share",
    f"""
    WITH base AS (
      SELECT CAST(year(o_orderdate) AS INT) AS order_year,
             sn.n_name AS supp_nation,
             {_DISC_REV_DEC} AS rev_dec
      FROM lineitem
      JOIN orders   ON l_orderkey = o_orderkey
      JOIN customer ON c_custkey  = o_custkey
      JOIN nation   cn ON cn.n_nationkey = c_nationkey
      JOIN region   ON r_regionkey = cn.n_regionkey AND r_name = 'ASIA'
      JOIN supplier ON s_suppkey  = l_suppkey
      JOIN nation   sn ON sn.n_nationkey = s_nationkey
    ), per AS (
      SELECT order_year, supp_nation, sum(rev_dec) AS rev FROM base GROUP BY 1, 2
    )
    SELECT order_year, supp_nation,
           CAST(round(rev, 2) AS DOUBLE) AS revenue,
           round(CAST(rev AS DOUBLE) /
                 CAST(sum(rev) OVER (PARTITION BY order_year) AS DOUBLE),
                 6) AS market_share
    FROM per
    """,
)
def nation_market_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape (national market share): within the ASIA-customer
    market, each supplier nation's share of yearly discounted revenue.
    Five broadcast dim hops (customer→nation→region gate the probe
    side; supplier→nation labels it), one grouped decimal sum, then a
    25-row-per-year window ratio — numerator and denominator cast to
    double from exact decimals BEFORE the division so the share bits
    agree across engines."""
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey", "o_orderdate"
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir)
    region = load_table(spark, "region", sf_dir).filter(
        F.col("r_name") == "ASIA"
    )
    cnation = (
        nation.join(
            F.broadcast(region),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select(F.col("n_nationkey").alias("cn_key"))
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    snation = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    per = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cnation), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(snation), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(
            F.year("o_orderdate").cast("int").alias("order_year"),
            "supp_nation",
        )
        .agg(F.sum(_disc_rev_dec()).alias("__rev"))
    )
    wy = Window.partitionBy("order_year")
    return per.select(
        "order_year",
        "supp_nation",
        F.round("__rev", 2).cast("double").alias("revenue"),
        F.round(
            F.col("__rev").cast("double")
            / F.sum("__rev").over(wy).cast("double"),
            6,
        ).alias("market_share"),
    )


@_q(
    "small_quantity_revenue",
    """
    WITH pavg AS (
      SELECT l_partkey,
             sum(l_quantity) / count(*) AS avg_qty
      FROM lineitem GROUP BY 1
    )
    SELECT round(CAST(sum(l_extendedprice::DECIMAL(18,2)) AS DOUBLE) / 7.0, 6) AS avg_yearly,
           count(*) AS n_lines
    FROM lineitem
    JOIN part ON p_partkey = l_partkey AND p_brand = 'Brand#3'
    JOIN pavg ON pavg.l_partkey = lineitem.l_partkey
    WHERE l_quantity < 0.2 * avg_qty
    """,
)
def small_quantity_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity-order revenue): lines of one
    brand whose quantity is under 20% of that part's average. The
    correlated AVG rewrites to a grouped sum/count (integer-valued
    doubles — exact in any accumulation order) re-joined on the part
    key; the 0.2·avg threshold is the identical double on both
    engines, so the filter set matches bit-exactly. At scale: one
    lineitem aggregate (map-side combine) + one shuffle join on
    l_partkey, brand-pruned by the broadcast part filter."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    pavg = li.groupBy("l_partkey").agg(
        (F.sum("l_quantity") / F.count(F.lit(1))).alias("avg_qty")
    ).withColumnRenamed("l_partkey", "pk")
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_brand") == "Brand#3"
    ).select("p_partkey")
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(pavg, F.col("pk") == F.col("l_partkey"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice").cast("decimal(18,2)")).cast(
                    "double"
                )
                / 7.0,
                6,
            ).alias("avg_yearly"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "rolling_beta_daily",
    _DAILY_CTE
    + """
    , g AS (
      SELECT user_id, day, CAST(round(day_value * 1000000) AS HUGEINT) AS x
      FROM daily
    ), m AS (
      SELECT day, sum(x) AS y FROM g GROUP BY day
    ), j AS (
      SELECT g.user_id, g.day, g.x, m.y FROM g JOIN m ON m.day = g.day
    ), s AS (
      SELECT user_id, day,
             count(*)   OVER w20 AS n_win,
             sum(x)     OVER w20 AS sx,
             sum(y)     OVER w20 AS sy,
             sum(x * y) OVER w20 AS sxy,
             sum(x * x) OVER w20 AS sxx,
             sum(y * y) OVER w20 AS syy
      FROM j
      WINDOW w20 AS (PARTITION BY user_id ORDER BY day
                     ROWS BETWEEN 19 PRECEDING AND CURRENT ROW)
    ), d AS (
      SELECT user_id, day, n_win,
             CAST(n_win * sxy - sx * sy AS DOUBLE) AS cov_n,
             CAST(n_win * sxx - sx * sx AS DOUBLE) AS var_x,
             CAST(n_win * syy - sy * sy AS DOUBLE) AS var_y
      FROM s
    )
    SELECT user_id, day, n_win,
           CASE WHEN var_y = 0 THEN NULL
                ELSE round(cov_n / var_y, 6) END AS beta_20,
           CASE WHEN var_x = 0 OR var_y = 0 THEN NULL
                ELSE round(cov_n / (sqrt(var_x) * sqrt(var_y)), 6) END AS corr_20
    FROM d
    """,
)
def rolling_beta_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 20-day beta and correlation of each user's daily series
    against the cross-sectional market (the sum of all users' values
    that day — an exact integer in micro-space, unlike an average).
    The moment sums n·Σxy−ΣxΣy etc. run ENTIRELY on scaled 1e-6
    integers (decimal(38,0)/HUGEINT — the bollinger recipe widened to
    two series), and both engines cast the identical exact integers to
    double before the one division/sqrt — bit-equal outputs; flat
    windows yield NULL by contract.

    Scale: the market series is one tiny (day-keyed) aggregate that
    broadcasts back into the per-user stream; the window chain is the
    only real shuffle. Magnitude audit: x ≤ 5.6e8 micros, y ≤ 8.4e11
    (1500 users) → n·Σy² ≤ 3e26, and ≤ 3e30 at the 100× replica —
    inside decimal(38)/HUGEINT."""
    daily = _daily_series(spark, sf_dir)
    g = daily.select(
        "user_id",
        "day",
        F.round(F.col("day_value") * 1e6, 0)
        .cast("decimal(20,0)")
        .alias("x"),
    )
    # lineage cut: g feeds BOTH the market aggregate and the join's
    # probe side, and AQE exchange reuse is not guaranteed — without
    # it the events scan + user-day aggregation ran twice (one per
    # branch, plan-verified r11). g is daily-sized (users x days), so
    # the checkpoint blocks are tiny relative to the re-aggregation.
    # EAGER: a lazy checkpoint pins the pre-AQE partition count into
    # both consumers (the nn_descent/mmr finding; measured here
    # 1.83 -> 1.54 same-window when flipped to eager).
    g = g.localCheckpoint(eager=True)
    m = g.groupBy("day").agg(F.sum("x").cast("decimal(38,0)").alias("y"))
    j = g.join(F.broadcast(m), "day")
    w20 = (
        Window.partitionBy("user_id")
        .orderBy("day")
        .rowsBetween(-19, Window.currentRow)
    )
    # materialize the six window sums ONCE: Spark expands every
    # textual reuse of a window expression into a separate aggregate
    # (32 _we slots for the naive form — measured 5x slower), so the
    # derived moments must reference columns, not window expressions
    s = j.select(
        "user_id",
        "day",
        F.count(F.lit(1)).over(w20).alias("n_win"),
        F.sum("x").over(w20).alias("__sx"),
        F.sum("y").over(w20).alias("__sy"),
        F.sum(F.col("x") * F.col("y")).over(w20).alias("__sxy"),
        F.sum(F.col("x") * F.col("x")).over(w20).alias("__sxx"),
        F.sum(F.col("y") * F.col("y")).over(w20).alias("__syy"),
    )
    cov_n = (
        F.col("n_win") * F.col("__sxy") - F.col("__sx") * F.col("__sy")
    ).cast("double")
    var_x = (
        F.col("n_win") * F.col("__sxx") - F.col("__sx") * F.col("__sx")
    ).cast("double")
    var_y = (
        F.col("n_win") * F.col("__syy") - F.col("__sy") * F.col("__sy")
    ).cast("double")
    # beta = cov(user, market) / var(MARKET) — the regression slope of
    # the user's series on the market (the finance convention); the
    # first cut divided by var(user), which is the market-on-user
    # slope — caught by the exact linear-relation property test
    # (B = 2A ⇒ betas must be 1/3 and 2/3, not 3 and 3/2)
    return s.select(
        "user_id",
        "day",
        "n_win",
        F.when(var_y == 0, F.lit(None)).otherwise(
            F.round(cov_n / var_y, 6)
        ).alias("beta_20"),
        F.when((var_x == 0) | (var_y == 0), F.lit(None)).otherwise(
            F.round(cov_n / (F.sqrt(var_x) * F.sqrt(var_y)), 6)
        ).alias("corr_20"),
    )


@_q(
    "forecast_revenue_change",
    """
    SELECT CAST(round(sum(l_extendedprice::DECIMAL(18,2)
                          * l_discount::DECIMAL(18,2)), 2) AS DOUBLE) AS revenue_delta,
           count(*) AS n_lines
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1997-01-01'
      AND l_shipdate <  TIMESTAMP '1998-01-01'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def forecast_revenue_change(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape (forecasting revenue change): the all-filter
    single-scan aggregate — every predicate (date range, discount
    band, quantity cap) pushes to the parquet scan, the plan is one
    map-side partial agg with no shuffle beyond the 1-row gather.
    The discount-band endpoints are exact 2dp-grid doubles, so
    BETWEEN matches identically on both engines; the revenue product
    runs in DECIMAL per the 4dp-grid rule."""
    li = load_table(spark, "lineitem", sf_dir)
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
            & F.col("l_discount").between(0.05, 0.07)
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.round(
                F.sum(
                    F.col("l_extendedprice").cast("decimal(18,2)")
                    * F.col("l_discount").cast("decimal(18,2)")
                ),
                2,
            )
            .cast("double")
            .alias("revenue_delta"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "customer_order_distribution",
    """
    WITH per_cust AS (
      SELECT c_custkey, count(o_orderkey) AS n_orders
      FROM customer
      LEFT JOIN orders ON o_custkey = c_custkey
                      AND o_orderpriority != '1-URGENT'
      GROUP BY c_custkey
    )
    SELECT n_orders, count(*) AS n_customers
    FROM per_cust
    GROUP BY n_orders
    """,
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): histogram of per-
    customer order counts, zeros included — the LEFT OUTER join keeps
    order-less customers and count(o_orderkey) ignores the NULL rows.
    The priority exclusion rides the join condition (evaluated join-
    side, not as a post-filter that would fake zeros). Two shuffles:
    the outer join and the tiny histogram re-agg. All integers."""
    cust = load_table(spark, "customer", sf_dir).select("c_custkey")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_custkey", "o_orderkey", "o_orderpriority"
    )
    per_cust = (
        cust.join(
            orders,
            (F.col("o_custkey") == F.col("c_custkey"))
            & (F.col("o_orderpriority") != "1-URGENT"),
            "left_outer",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("n_orders"))
    )
    return per_cust.groupBy("n_orders").agg(
        F.count(F.lit(1)).alias("n_customers")
    )


@_q(
    "top_supplier_quarter",
    """
    WITH rev AS (
      SELECT l_suppkey,
             sum(l_extendedprice::DECIMAL(18,2)
                 * (1 - l_discount::DECIMAL(18,2))) AS total_rev
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate <  TIMESTAMP '1997-04-01'
      GROUP BY l_suppkey
    ), m AS (
      SELECT l_suppkey, total_rev,
             max(total_rev) OVER () AS max_rev
      FROM rev
    )
    SELECT s_suppkey, s_name,
           CAST(round(total_rev, 2) AS DOUBLE) AS total_rev
    FROM m JOIN supplier ON s_suppkey = l_suppkey
    WHERE total_rev = max_rev
    """,
)
def top_supplier_quarter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape (top supplier): the supplier(s) with the
    highest quarterly revenue — the view+subquery original rewritten
    as one grouped DECIMAL sum, a ONE-ROW max aggregate broadcast
    back, and an equality filter (r10: the previous empty-frame
    window max funneled the supplier-keyed agg — which grows with
    scale factor — through one task; the broadcast-threshold form is
    the sanctioned bounded-BNLJ pattern and keeps every row partition-
    local). The per-supplier frame is checkpointed so lineitem scans
    ONCE (the static plan gets no exchange reuse between the max agg
    and the join side; a snapshot of the supplier-sized agg is far
    cheaper than a second pass over the fact table). The max-equality
    match runs on the exact decimal, so ties keep every top supplier
    identically on both engines; the double cast is output-only."""
    li = load_table(spark, "lineitem", sf_dir).filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    rev = li.groupBy("l_suppkey").agg(
        F.sum(_disc_rev_dec()).alias("__rev")
    ).localCheckpoint(eager=True)
    mx = rev.agg(F.max("__rev").alias("__max"))
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name"
    )
    return (
        rev.crossJoin(F.broadcast(mx))
        .filter(F.col("__rev") == F.col("__max"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .select(
            "s_suppkey",
            "s_name",
            F.round("__rev", 2).cast("double").alias("total_rev"),
        )
    )


@_q(
    "volume_shipping_pair",
    f"""
    SELECT cn.n_name AS cust_nation, sn.n_name AS supp_nation,
           CAST(year(l_shipdate) AS INT) AS ship_year,
           CAST(round(sum({_DISC_REV_DEC}), 2) AS DOUBLE) AS revenue,
           count(*) AS n_lines
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON c_custkey  = o_custkey
    JOIN nation   cn ON cn.n_nationkey = c_nationkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN nation   sn ON sn.n_nationkey = s_nationkey
    WHERE (cn.n_name = 'NATION_1' AND sn.n_name = 'NATION_2')
       OR (cn.n_name = 'NATION_2' AND sn.n_name = 'NATION_1')
    GROUP BY 1, 2, 3
    """,
)
def volume_shipping_pair(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape (volume shipping): discounted revenue flowing
    between two trading nations in either direction, by ship year.
    The nation-pair disjunction is evaluated after both broadcast
    nation hops (each side pre-filtered to the two nations, so the
    broadcast build sides are 2 rows); one grouped DECIMAL sum."""
    na, nb = "NATION_1", "NATION_2"
    li = load_table(spark, "lineitem", sf_dir)
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_custkey"
    )
    cust = load_table(spark, "customer", sf_dir).select(
        "c_custkey", "c_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).filter(
        F.col("n_name").isin(na, nb)
    )
    cn = nation.select(
        F.col("n_nationkey").alias("cn_key"),
        F.col("n_name").alias("cust_nation"),
    )
    sn = nation.select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    return (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("c_custkey") == F.col("o_custkey"))
        .join(F.broadcast(cn), F.col("cn_key") == F.col("c_nationkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(sn), F.col("sn_key") == F.col("s_nationkey"))
        .filter(
            ((F.col("cust_nation") == na) & (F.col("supp_nation") == nb))
            | ((F.col("cust_nation") == nb) & (F.col("supp_nation") == na))
        )
        .groupBy(
            "cust_nation",
            "supp_nation",
            F.year("l_shipdate").cast("int").alias("ship_year"),
        )
        .agg(
            F.round(F.sum(_disc_rev_dec()), 2)
            .cast("double")
            .alias("revenue"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


@_q(
    "product_margin_by_nation",
    """
    SELECT sn.n_name AS supp_nation,
           CAST(year(o_orderdate) AS INT) AS order_year,
           CAST(round(sum(l_extendedprice::DECIMAL(18,2)
                          * (1 - l_discount::DECIMAL(18,2))
                          - l_quantity::DECIMAL(18,2)
                            * p_retailprice::DECIMAL(18,2)
                            * 0.10::DECIMAL(3,2)), 2) AS DOUBLE) AS margin
    FROM lineitem
    JOIN part     ON p_partkey  = l_partkey AND p_type = 'PROMO'
    JOIN orders   ON o_orderkey = l_orderkey
    JOIN supplier ON s_suppkey  = l_suppkey
    JOIN nation   sn ON sn.n_nationkey = s_nationkey
    GROUP BY 1, 2
    """,
)
def product_margin_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): per supplier nation and
    order year, revenue minus a supply-cost term for one part type.
    The schema has no partsupp.ps_supplycost, so cost is DEFINED as
    qty · 10% of the part's retail price — an exact DECIMAL product
    (integer-valued qty × 2dp grid × exact 0.10), so the margin sum
    stays in decimal until the output cast like every revenue query."""
    li = load_table(spark, "lineitem", sf_dir)
    part = load_table(spark, "part", sf_dir).filter(
        F.col("p_type") == "PROMO"
    ).select("p_partkey", "p_retailprice")
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate"
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    nation = load_table(spark, "nation", sf_dir).select(
        F.col("n_nationkey").alias("sn_key"),
        F.col("n_name").alias("supp_nation"),
    )
    margin = F.sum(
        _disc_rev_dec()
        - F.col("l_quantity").cast("decimal(18,2)")
        * F.col("p_retailprice").cast("decimal(18,2)")
        * F.lit("0.10").cast("decimal(3,2)")
    )
    return (
        li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))
        .join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .join(F.broadcast(nation), F.col("sn_key") == F.col("s_nationkey"))
        .groupBy(
            "supp_nation",
            F.year("o_orderdate").cast("int").alias("order_year"),
        )
        .agg(F.round(margin, 2).cast("double").alias("margin"))
    )


@_q(
    "sole_late_supplier_blame",
    """
    WITH ls AS (
      SELECT l_orderkey, l_suppkey,
             max(CASE WHEN l_shipdate > o_orderdate + INTERVAL 60 DAY
                      THEN 1 ELSE 0 END) AS is_late
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
      GROUP BY 1, 2
    ), per_order AS (
      SELECT l_orderkey,
             count(*) AS n_supp,
             sum(is_late) AS n_late
      FROM ls GROUP BY 1
    )
    SELECT s_name, count(*) AS n_blamed_orders
    FROM ls
    JOIN per_order USING (l_orderkey)
    JOIN supplier ON s_suppkey = l_suppkey
    WHERE ls.is_late = 1 AND n_late = 1 AND n_supp >= 2
    GROUP BY s_name
    """,
)
def sole_late_supplier_blame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): on
    multi-supplier orders, the supplier who was the ONLY late one.
    The original's EXISTS/NOT-EXISTS pair rewrites to one grouped
    pass: per (order, supplier) lateness flag (no commitdate/
    receiptdate in the schema — late := shipped >60 days after the
    order date), then per-order supplier/late counts re-joined to
    blame the sole offender. Two shuffles on the order key (AQE
    coalesces them); supplier broadcasts. All-integer flags/counts —
    exact."""
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate"
    )
    # ONE pass over the fact table: the per-order supplier/late counts
    # come from a window over the (order, supplier) aggregate instead
    # of a groupBy + join-back, so no intermediate needs two consumers
    # — which removes the r11 eager localCheckpoint of a frame that is
    # proportional to the fact table (near-lineitem-cardinality
    # non-resilient RDD blocks at lake scale; r11 advisor, medium).
    # The explicit order-key repartition lets the (order, supplier)
    # groupBy AND the order-key window share a single exchange
    # (HashPartitioning on a subset of the grouping keys satisfies the
    # groupBy's clustering — the _daily_series idiom).
    w_order = Window.partitionBy("l_orderkey")
    ls = (
        li.join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .repartition(F.col("l_orderkey"))
        .groupBy("l_orderkey", "l_suppkey")
        .agg(
            F.max(
                F.when(
                    F.col("l_shipdate")
                    > F.col("o_orderdate") + F.expr("INTERVAL 60 DAYS"),
                    1,
                ).otherwise(0)
            ).alias("is_late")
        )
        .withColumn("n_supp", F.count(F.lit(1)).over(w_order))
        .withColumn("n_late", F.sum("is_late").over(w_order))
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name"
    )
    return (
        ls.filter(
            (F.col("is_late") == 1)
            & (F.col("n_late") == 1)
            & (F.col("n_supp") >= 2)
        )
        .join(F.broadcast(supp), F.col("s_suppkey") == F.col("l_suppkey"))
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("n_blamed_orders"))
    )


@_q(
    "autocorr_daily",
    _DAILY_CTE
    + """
    , g AS (
      SELECT user_id, day, CAST(round(day_value * 1000000) AS HUGEINT) AS x
      FROM daily
    ), lagged AS (
      SELECT user_id, day, x,
             lag(x, 1) OVER win AS x1,
             lag(x, 5) OVER win AS x5
      FROM g
      WINDOW win AS (PARTITION BY user_id ORDER BY day)
    ), m1 AS (
      SELECT user_id, count(*) AS n,
             sum(x) AS sx, sum(x1) AS sy,
             sum(x * x1) AS sxy, sum(x * x) AS sxx, sum(x1 * x1) AS syy
      FROM lagged WHERE x1 IS NOT NULL GROUP BY user_id
    ), m5 AS (
      SELECT user_id, count(*) AS n,
             sum(x) AS sx, sum(x5) AS sy,
             sum(x * x5) AS sxy, sum(x * x) AS sxx, sum(x5 * x5) AS syy
      FROM lagged WHERE x5 IS NOT NULL GROUP BY user_id
    ), r AS (
      SELECT m1.user_id,
             CAST(m1.n AS BIGINT) AS n_pairs_1,
             CAST(m1.n * m1.sxy - m1.sx * m1.sy AS DOUBLE) AS c1,
             CAST(m1.n * m1.sxx - m1.sx * m1.sx AS DOUBLE) AS v1a,
             CAST(m1.n * m1.syy - m1.sy * m1.sy AS DOUBLE) AS v1b,
             CAST(m5.n AS BIGINT) AS n_pairs_5,
             CAST(m5.n * m5.sxy - m5.sx * m5.sy AS DOUBLE) AS c5,
             CAST(m5.n * m5.sxx - m5.sx * m5.sx AS DOUBLE) AS v5a,
             CAST(m5.n * m5.syy - m5.sy * m5.sy AS DOUBLE) AS v5b
      FROM m1 JOIN m5 ON m5.user_id = m1.user_id
    )
    SELECT user_id, n_pairs_1, n_pairs_5,
           CASE WHEN v1a = 0 OR v1b = 0 THEN NULL
                ELSE round(c1 / (sqrt(v1a) * sqrt(v1b)), 6) END AS acf_lag1,
           CASE WHEN v5a = 0 OR v5b = 0 THEN NULL
                ELSE round(c5 / (sqrt(v5a) * sqrt(v5b)), 6) END AS acf_lag5
    FROM r
    """,
)
def autocorr_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-1 and lag-5 autocorrelation of each user's daily series —
    the mean-reversion/momentum diagnostic a signal-research pass runs
    before committing an indicator. Same exactness recipe as
    rolling_beta_daily: Pearson moments on scaled 1e-6 integers
    (decimal(38,0)/HUGEINT), cast to double only for the final
    division; pairs are (t, t−k) rows where the lag exists. One window
    shuffle + one grouped aggregate on the same key.

    Row contract (advisor r6): the lag-1 and lag-5 moment tables are
    INNER-joined, so a user with fewer than 6 daily rows (no lag-5
    pair) is dropped entirely — including their valid lag-1 ACF. Both
    engines share the join, so parity holds; callers needing short
    series should full-outer on user_id and take acf_lag5 as NULL."""
    daily = _daily_series(spark, sf_dir)
    g = daily.select(
        "user_id",
        "day",
        F.round(F.col("day_value") * 1e6, 0)
        .cast("decimal(20,0)")
        .alias("x"),
    )
    w = Window.partitionBy("user_id").orderBy("day")
    lagged = g.select(
        "user_id",
        "x",
        F.lag("x", 1).over(w).alias("x1"),
        F.lag("x", 5).over(w).alias("x5"),
    )

    def moments(ycol: str, tag: str):
        d = lagged.filter(F.col(ycol).isNotNull())
        return d.groupBy("user_id").agg(
            F.count(F.lit(1)).alias(f"n_{tag}"),
            F.sum("x").alias(f"sx_{tag}"),
            F.sum(ycol).alias(f"sy_{tag}"),
            F.sum(F.col("x") * F.col(ycol)).alias(f"sxy_{tag}"),
            F.sum(F.col("x") * F.col("x")).alias(f"sxx_{tag}"),
            F.sum(F.col(ycol) * F.col(ycol)).alias(f"syy_{tag}"),
        )

    m1 = moments("x1", "1")
    m5 = moments("x5", "5").withColumnRenamed("user_id", "u5")
    j = m1.join(m5, F.col("u5") == F.col("user_id"))

    def acf(tag: str):
        n = F.col(f"n_{tag}")
        cov = (
            n * F.col(f"sxy_{tag}") - F.col(f"sx_{tag}") * F.col(f"sy_{tag}")
        ).cast("double")
        va = (
            n * F.col(f"sxx_{tag}") - F.col(f"sx_{tag}") * F.col(f"sx_{tag}")
        ).cast("double")
        vb = (
            n * F.col(f"syy_{tag}") - F.col(f"sy_{tag}") * F.col(f"sy_{tag}")
        ).cast("double")
        return F.when((va == 0) | (vb == 0), F.lit(None)).otherwise(
            F.round(cov / (F.sqrt(va) * F.sqrt(vb)), 6)
        )

    return j.select(
        "user_id",
        F.col("n_1").cast("long").alias("n_pairs_1"),
        F.col("n_5").cast("long").alias("n_pairs_5"),
        acf("1").alias("acf_lag1"),
        acf("5").alias("acf_lag5"),
    )


# ---------------------------------------------------------------------------
# TPC-H Q11 / Q12 / Q20 (r7): the synthetic schema carries no partsupp
# table and no l_shipmode/l_commitdate/l_receiptdate columns, so these
# three shapes derive DETERMINISTIC stand-ins inside the query — the
# established hash_embedding pattern: both engines compute the same
# md5-derived h32 values from the same keys, so parity is exact and the
# query shape (the thing TPC-H exercises) is the real one.

_H32_SQL = "(('0x' || substring(md5({s}), 1, 8))::BIGINT)"
_PS_KEY_SQL = "'{salt}:' || l_partkey::VARCHAR || ':' || l_suppkey::VARCHAR"
_PARTSUPP_SQL = f"""
    ps AS (
      SELECT l_partkey AS ps_partkey, l_suppkey AS ps_suppkey,
             1 + {_H32_SQL.format(s=_PS_KEY_SQL.format(salt='aq'))} % 10000
               AS ps_availqty,
             100 + {_H32_SQL.format(s=_PS_KEY_SQL.format(salt='sc'))} % 99900
               AS ps_supplycost_cents
      FROM (SELECT DISTINCT l_partkey, l_suppkey FROM lineitem)
    )
"""


def _partsupp_standin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """partsupp stand-in: the DISTINCT (l_partkey, l_suppkey) pairs the
    data actually relates, with availqty/supplycost_cents as h32 hashes
    of salted keys — integer-exact, engine-stable, and identical to the
    _PARTSUPP_SQL CTE. One distinct on the two join keys; everything
    else is a projection."""
    from tastytrade_sdk_spark.llmops.textops import h32

    # explicit-N keyed repartition: distinct reuses the partitioning
    # (same keys, same count — no second exchange) and the explicit
    # count stops AQE coalescing the tiny-byte exchange to ~1
    # partition, which would run the two h32 projections serially.
    target = spark.sparkContext.defaultParallelism
    li = (
        load_table(spark, "lineitem", sf_dir)
        .select("l_partkey", "l_suppkey")
        .repartition(target, F.col("l_partkey"), F.col("l_suppkey"))
        .distinct()
    )
    key = lambda salt: F.concat(  # noqa: E731
        F.lit(salt + ":"),
        F.col("l_partkey").cast("string"),
        F.lit(":"),
        F.col("l_suppkey").cast("string"),
    )
    return li.select(
        F.col("l_partkey").alias("ps_partkey"),
        F.col("l_suppkey").alias("ps_suppkey"),
        (F.lit(1) + h32(key("aq")) % 10000).alias("ps_availqty"),
        (F.lit(100) + h32(key("sc")) % 99900).alias("ps_supplycost_cents"),
    )


@_q(
    "important_stock_shares",
    f"""
    WITH {_PARTSUPP_SQL},
    g AS (
      SELECT ps_partkey,
             CAST(sum(CAST(ps_availqty AS BIGINT) * ps_supplycost_cents)
                  AS BIGINT) AS val_cents
      FROM ps
      JOIN supplier ON s_suppkey = ps_suppkey
      JOIN nation ON n_nationkey = s_nationkey
      WHERE n_nationkey % 5 = 2
      GROUP BY 1
    ),
    tot AS (
      SELECT CAST(sum(val_cents) AS BIGINT) AS t,
             CAST(count(*) AS BIGINT) AS n
      FROM g
    )
    SELECT ps_partkey,
           CAST(round(val_cents / 100.0, 2) AS DOUBLE) AS stock_value
    FROM g, tot
    WHERE val_cents * n > 2 * t
    ORDER BY stock_value DESC, ps_partkey
    """,
)
def important_stock_shares(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock identification): per-part stock
    value (availqty * supplycost, exact integer cents) over a 5-nation
    supplier bloc, keeping parts whose value exceeds 2x the mean — the
    'significant share of total' predicate as an exact integer
    cross-multiply (val * n > 2 * total) against a 1-row broadcast, the
    idle_customer_balances pattern. The fixed-fraction original is
    SF-scaled in TPC-H for the same reason (a constant fraction goes
    degenerate as group count grows); mean-relative is the scale-free
    form. Cross-multiply headroom: val_cents <= 1e9 and n is the
    per-bloc part count, so the product stays inside BIGINT until
    ~1e9 parts per bloc — beyond that, move both sides to DECIMAL(38).
    One shuffle on ps_partkey; supplier and nation broadcast."""
    ps = _partsupp_standin(spark, sf_dir)
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_nationkey"
    )
    nat = load_table(spark, "nation", sf_dir).select("n_nationkey").filter(
        F.col("n_nationkey") % 5 == 2
    )
    bloc = supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
    g = (
        ps.join(F.broadcast(bloc), F.col("s_suppkey") == F.col("ps_suppkey"))
        .groupBy("ps_partkey")
        .agg(
            F.sum(
                F.col("ps_availqty").cast("long")
                * F.col("ps_supplycost_cents")
            ).cast("long").alias("val_cents")
        )
    )
    tot = g.agg(
        F.sum("val_cents").cast("long").alias("t"),
        F.count(F.lit(1)).cast("long").alias("n"),
    )
    return (
        g.crossJoin(F.broadcast(tot))
        .filter(F.col("val_cents") * F.col("n") > 2 * F.col("t"))
        .select(
            "ps_partkey",
            F.round(F.col("val_cents") / 100.0, 2)
            .cast("double")
            .alias("stock_value"),
        )
        .orderBy(F.desc("stock_value"), "ps_partkey")
    )


_LINE_KEY_SQL = "'{salt}:' || l_orderkey::VARCHAR || ':' || l_linenumber::VARCHAR"
_SHIPMODES = ["MAIL", "SHIP", "TRUCK", "RAIL", "AIR", "REG AIR", "FOB"]


@_q(
    "shipmode_priority_counts",
    f"""
    WITH x AS (
      SELECT (ARRAY{_SHIPMODES!r})[
               1 + {_H32_SQL.format(s=_LINE_KEY_SQL.format(salt='sm'))} % 7
             ] AS l_shipmode,
             o_orderdate + to_days(
               (30 + {_H32_SQL.format(s=_LINE_KEY_SQL.format(salt='cd'))} % 60)::INT
             ) AS l_commitdate,
             l_shipdate + to_days(
               (1 + {_H32_SQL.format(s=_LINE_KEY_SQL.format(salt='rd'))} % 30)::INT
             ) AS l_receiptdate,
             l_shipdate, o_orderpriority
      FROM lineitem JOIN orders ON o_orderkey = l_orderkey
    )
    SELECT l_shipmode,
           CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(sum(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                         THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM x
    WHERE l_shipmode IN ('MAIL', 'SHIP')
      AND l_commitdate < l_receiptdate
      AND l_shipdate < l_commitdate
      AND l_receiptdate >= TIMESTAMP '1997-01-01'
      AND l_receiptdate < TIMESTAMP '1998-01-01'
    GROUP BY l_shipmode
    ORDER BY l_shipmode
    """,
)
def shipmode_priority_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (shipping modes and order priority): lines that
    arrived late relative to commitment, bucketed by ship mode, with
    high- vs low-priority counts. shipmode / commitdate / receiptdate
    are h32 stand-ins keyed on (orderkey, linenumber) — commit 30-89
    days after order, receipt 1-30 days after ship, both engines
    identical. The mode filter prunes ~5/7 of lines BEFORE the
    aggregate; one shuffle on the order key for the orders join, then
    a 2-group aggregate. All-integer counts — exact."""
    from tastytrade_sdk_spark.llmops.textops import h32

    from tastytrade_sdk_spark.llmops.dedup import _spread

    # _spread: the three per-row h32 stand-ins otherwise evaluate in
    # the serial one-file scan stage locally (measured (2+1)/3-task
    # straggler); no-op at lake scale where the scan is already wide
    li = _spread(
        load_table(spark, "lineitem", sf_dir).select(
            "l_orderkey", "l_linenumber", "l_shipdate"
        ),
        "l_orderkey",
    )
    orders = load_table(spark, "orders", sf_dir).select(
        "o_orderkey", "o_orderdate", "o_orderpriority"
    )
    key = lambda salt: F.concat(  # noqa: E731
        F.lit(salt + ":"),
        F.col("l_orderkey").cast("string"),
        F.lit(":"),
        F.col("l_linenumber").cast("string"),
    )
    modes = F.array(*[F.lit(m) for m in _SHIPMODES])
    x = (
        li.join(orders, F.col("o_orderkey") == F.col("l_orderkey"))
        .withColumn("__cd_days", (30 + h32(key("cd")) % 60).cast("int"))
        .withColumn("__rd_days", (1 + h32(key("rd")) % 30).cast("int"))
        .select(
            F.element_at(modes, (1 + h32(key("sm")) % 7).cast("int")).alias(
                "l_shipmode"
            ),
            F.expr(
                "timestampadd(DAY, __cd_days, o_orderdate)"
            ).alias("l_commitdate"),
            F.expr(
                "timestampadd(DAY, __rd_days, l_shipdate)"
            ).alias("l_receiptdate"),
            "l_shipdate",
            "o_orderpriority",
        )
    )
    hi = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        x.filter(
            F.col("l_shipmode").isin("MAIL", "SHIP")
            & (F.col("l_commitdate") < F.col("l_receiptdate"))
            & (F.col("l_shipdate") < F.col("l_commitdate"))
            & (F.col("l_receiptdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_receiptdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_shipmode")
        .agg(
            F.sum(F.when(hi, 1).otherwise(0)).cast("long").alias(
                "high_line_count"
            ),
            F.sum(F.when(hi, 0).otherwise(1)).cast("long").alias(
                "low_line_count"
            ),
        )
        .orderBy("l_shipmode")
    )


@_q(
    "excess_stock_suppliers",
    f"""
    WITH {_PARTSUPP_SQL},
    qty AS (
      SELECT l_partkey, l_suppkey, sum(l_quantity) AS q
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1997-01-01'
        AND l_shipdate < TIMESTAMP '1998-01-01'
      GROUP BY 1, 2
    )
    SELECT DISTINCT s_name
    FROM ps
    JOIN part ON p_partkey = ps_partkey AND p_name LIKE 'red%'
    JOIN qty ON qty.l_partkey = ps_partkey AND qty.l_suppkey = ps_suppkey
    JOIN supplier ON s_suppkey = ps_suppkey
    JOIN nation ON n_nationkey = s_nationkey AND n_name = 'NATION_3'
    WHERE CAST(2 * ps_availqty AS DOUBLE) > q
    ORDER BY s_name
    """,
)
def excess_stock_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (potential part promotion): suppliers in one
    nation holding more than half a year's shipped quantity of any
    red part — availqty > 0.5 * sum(qty) as the integer cross-multiply
    2*availqty > q (l_quantity is integer-valued, so the double sum is
    exact in any order). Plan: the year's lineitem slice aggregates
    per (part, supplier) once (the only fact shuffle, with map-side
    partials); part (name-filtered) and supplier⋈nation broadcast;
    DISTINCT s_name is a few-row final agg."""
    ps = _partsupp_standin(spark, sf_dir)
    li = load_table(spark, "lineitem", sf_dir).select(
        "l_partkey", "l_suppkey", "l_quantity", "l_shipdate"
    )
    qty = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("q"))
    )
    part = load_table(spark, "part", sf_dir).select("p_partkey", "p_name").filter(
        F.col("p_name").like("red%")
    )
    supp = load_table(spark, "supplier", sf_dir).select(
        "s_suppkey", "s_name", "s_nationkey"
    )
    nat = load_table(spark, "nation", sf_dir).select(
        "n_nationkey", "n_name"
    ).filter(F.col("n_name") == "NATION_3")
    sn = supp.join(F.broadcast(nat), F.col("n_nationkey") == F.col("s_nationkey"))
    return (
        ps.join(F.broadcast(part), F.col("p_partkey") == F.col("ps_partkey"))
        .join(
            qty,
            (F.col("l_partkey") == F.col("ps_partkey"))
            & (F.col("l_suppkey") == F.col("ps_suppkey")),
        )
        .join(F.broadcast(sn), F.col("s_suppkey") == F.col("ps_suppkey"))
        .filter((2 * F.col("ps_availqty")).cast("double") > F.col("q"))
        .select("s_name")
        .distinct()
        .orderBy("s_name")
    )
