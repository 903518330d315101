"""Kernel-backed correctness queries (SURVEY A5 LIFO, §2.10 classifier).

The driver tables carry no transactions/positions, so deterministic
fill/leg fixtures are DERIVED from events/part in-query (same
derivation on both engines).

- ``lifo_open_allocation``: opens-only scenario — LIFO reduces to a
  reverse-cumulative-sum allocation, which IS SQL-expressible, so the
  kernel gets a true DuckDB oracle.
- ``lifo_entry_credit``: full scenario with closes — the close-buffer
  cancellation is the clamped (Lindley) running sum
  ``b_t = S_t - min(0, min_k S_k)``, so the whole replay has a
  window-function closed form and gets a true DuckDB oracle too.
- ``strategy_classification``: greedy combinatorial matcher over
  synthesized option legs — order-dependent, not relational;
  rows-only check + unit-test coverage of every pattern.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from tastytrade_sdk_spark.kernels.classifier import classify_strategies
from tastytrade_sdk_spark.kernels.lifo import lifo_entry_credits
from tastytrade_sdk_spark.sources.tables import load_table

KERNEL_QUERIES: dict = {}
KERNEL_ORACLE_SQL: dict = {}


def _q(name: str, oracle: str | None = None):
    def deco(fn):
        KERNEL_QUERIES[name] = fn
        if oracle is not None:
            KERNEL_ORACLE_SQL[name] = oracle
        return fn

    return deco


def _synth_open_fills(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic opens-only fill synthesis from events:
    purchase -> Buy to Open (Debit), view -> Sell to Open (Credit);
    qty = 1 + event_id % 3; value = round(price*qty, 2)."""
    ev = load_table(spark, "events", sf_dir)
    f = ev.filter(F.col("event_type").isin("purchase", "view"))
    qty = (F.lit(1) + F.col("event_id") % 3).cast("decimal(18,6)")
    price = F.col("value").cast("decimal(18,6)")
    amount = F.round(F.col("value") * (F.lit(1) + F.col("event_id") % 3), 2).cast(
        "decimal(18,6)"
    )
    effect = F.when(F.col("event_type") == "view", "Credit").otherwise("Debit")
    action = F.when(
        F.col("event_type") == "view", "Sell to Open"
    ).otherwise("Buy to Open")
    fee = F.lit(0.5).cast("decimal(18,6)")
    net = F.when(effect == "Credit", amount - fee).otherwise(amount + fee)
    return f.select(
        F.concat(F.lit("U"), F.col("user_id")).alias("symbol"),
        F.col("ts").alias("executed_at"),
        action.alias("action"),
        qty.alias("quantity"),
        price.alias("price"),
        amount.cast("decimal(18,6)").alias("value"),
        net.cast("decimal(18,6)").alias("net_value"),
        effect.alias("value_effect"),
    )


def _synth_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, "events", sf_dir)
    return (
        ev.select("user_id")
        .distinct()
        .select(
            F.concat(F.lit("U"), F.col("user_id")).alias("symbol"),
            ((F.col("user_id") % 7) + 1).cast("double").alias("quantity"),
        )
    )


_SYNTH_SQL = """
    fills AS (
      SELECT 'U' || user_id AS symbol,
             ts AS executed_at,
             CASE WHEN event_type = 'view' THEN 'Sell to Open' ELSE 'Buy to Open' END AS action,
             (1 + event_id % 3) AS qty,
             value AS price,
             round(value * (1 + event_id % 3), 2) AS amount,
             CASE WHEN event_type = 'view' THEN 1 ELSE -1 END AS sign
      FROM events WHERE event_type IN ('purchase', 'view')
    ), pos AS (
      SELECT 'U' || user_id AS symbol, (user_id % 7) + 1 AS r
      FROM (SELECT DISTINCT user_id FROM events)
    )
"""


@_q(
    "lifo_open_allocation",
    "WITH "
    + _SYNTH_SQL
    + """
    , alloc AS (
      SELECT f.symbol, f.qty, f.price, f.amount, f.sign, p.r,
             coalesce(sum(f.qty) OVER (PARTITION BY f.symbol
               ORDER BY f.executed_at DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS cum_prev
      FROM fills f JOIN pos p ON f.symbol = p.symbol
    ), takes AS (
      SELECT symbol, r, qty, price, amount, sign,
             greatest(0, least(qty, r - cum_prev)) AS take
      FROM alloc
    )
    SELECT t.symbol,
           CAST(CASE WHEN sum(t.take) >= any_value(t.r)
                THEN round(sum(t.amount * t.sign * t.take / t.qty), 4) END
                AS DOUBLE) AS entry_credit,
           CAST(CASE WHEN sum(t.take) >= any_value(t.r)
                THEN round(sum(0.5 * t.take / t.qty), 4) END
                AS DOUBLE) AS fees,
           CAST(CASE WHEN sum(t.take) >= any_value(t.r)
                THEN round(sum(t.price * t.take) / sum(t.take), 6) END
                AS DOUBLE) AS weighted_price,
           (sum(t.take) >= any_value(t.r)) AS covered
    FROM takes t
    GROUP BY t.symbol
    """,
)
def lifo_open_allocation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 LIFO replay, opens-only scenario: the kernel's newest-first
    allocation equals a reverse cumulative-sum split, giving the
    Arrow kernel a true SQL oracle."""
    fills = _synth_open_fills(spark, sf_dir)
    pos = _synth_positions(spark, sf_dir)
    out = lifo_entry_credits(fills, pos)
    # the kernel's Decimal arithmetic stays INTERNAL: round the double
    # image at the oracle's dp for bit-identical tie behavior and emit
    # DOUBLE — DecimalType outputs are a driver-hash hazard (r4
    # pricing_summary regression; see plans/queries.py HARD RULE)
    return out.select(
        "symbol",
        F.round(F.col("entry_credit").cast("double"), 4).alias("entry_credit"),
        F.round(F.col("fees").cast("double"), 4).alias("fees"),
        F.round(F.col("weighted_price").cast("double"), 6).alias("weighted_price"),
        "covered",
    )


@_q(
    "lifo_entry_credit",
    """
    WITH fills AS (
      SELECT 'U' || user_id AS symbol,
             ts AS executed_at,
             CASE WHEN event_type = 'click' THEN 1 ELSE 0 END AS is_close,
             (1 + event_id % 3) AS qty,
             value AS price,
             round(value * (1 + event_id % 3), 2) AS amount,
             CASE WHEN event_type = 'view' THEN 1 ELSE -1 END AS sign
      FROM events WHERE event_type IN ('purchase', 'view', 'click')
    ), pos AS (
      SELECT 'U' || user_id AS symbol, (user_id % 7) + 1 AS r
      FROM (SELECT DISTINCT user_id FROM events)
    ), seq AS (
      -- newest-first prefix sum of (close: +qty, open: -qty); the close
      -- buffer before each row is the Lindley clamped running sum
      -- b_prev = s_prev - min(0, min_k<=prev s_k)
      SELECT p.symbol, p.r, f.executed_at, f.is_close, f.qty, f.price,
             f.amount, f.sign,
             sum(CASE WHEN f.is_close = 1 THEN f.qty ELSE -f.qty END)
               OVER (PARTITION BY p.symbol ORDER BY f.executed_at DESC
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS s
      FROM pos p LEFT JOIN fills f ON f.symbol = p.symbol
    ), seq2 AS (
      SELECT *,
             coalesce(min(s) OVER (PARTITION BY symbol ORDER BY executed_at DESC
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS min_prev
      FROM seq
    ), surv AS (
      SELECT *,
             CASE WHEN is_close = 0
                  THEN qty - least(qty, (s + qty) - least(0, min_prev))
                  ELSE 0 END AS surviving
      FROM seq2
    ), takes AS (
      SELECT *,
             least(surviving, greatest(0, r - coalesce(
               sum(surviving) OVER (PARTITION BY symbol ORDER BY executed_at DESC
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0))) AS take
      FROM surv
    )
    SELECT symbol,
           CAST(CASE WHEN coalesce(sum(surviving), 0) >= any_value(r)
                THEN round(sum(sign * amount * take / qty), 4) END
                AS DOUBLE) AS entry_credit,
           CAST(CASE WHEN coalesce(sum(surviving), 0) >= any_value(r)
                THEN round(sum(0.5 * take / qty), 4) END
                AS DOUBLE) AS fees,
           CAST(CASE WHEN coalesce(sum(surviving), 0) >= any_value(r) AND sum(take) > 0
                THEN round(sum(price * take) / sum(take), 6) END
                AS DOUBLE) AS weighted_price,
           coalesce(sum(surviving), 0) >= any_value(r) AS covered
    FROM takes
    GROUP BY symbol
    """,
)
def lifo_entry_credit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A5 full LIFO replay including close-buffer cancellation
    (clicks -> Buy to Close). The oracle exploits a closed form: the
    close buffer is the clamped (Lindley) running sum over the
    newest-first fill sequence, b_t = S_t - min(0, min_k S_k), so
    consumed/surviving/take all become window expressions; the Arrow
    kernel's sequential fold must match it exactly."""
    ev = load_table(spark, "events", sf_dir)
    f = ev.filter(F.col("event_type").isin("purchase", "view", "click"))
    qty = (F.lit(1) + F.col("event_id") % 3).cast("decimal(18,6)")
    amount = F.round(F.col("value") * (F.lit(1) + F.col("event_id") % 3), 2).cast(
        "decimal(18,6)"
    )
    effect = F.when(F.col("event_type") == "view", "Credit").otherwise("Debit")
    action = (
        F.when(F.col("event_type") == "view", "Sell to Open")
        .when(F.col("event_type") == "purchase", "Buy to Open")
        .otherwise("Buy to Close")
    )
    fee = F.lit(0.5).cast("decimal(18,6)")
    net = F.when(effect == "Credit", amount - fee).otherwise(amount + fee)
    fills = f.select(
        F.concat(F.lit("U"), F.col("user_id")).alias("symbol"),
        F.col("ts").alias("executed_at"),
        action.alias("action"),
        qty.alias("quantity"),
        F.col("value").cast("decimal(18,6)").alias("price"),
        amount.alias("value"),
        net.alias("net_value"),
        effect.alias("value_effect"),
    )
    pos = _synth_positions(spark, sf_dir)
    out = lifo_entry_credits(fills, pos)
    # the kernel's Decimal arithmetic stays INTERNAL: round the double
    # image at the oracle's dp for bit-identical tie behavior and emit
    # DOUBLE — DecimalType outputs are a driver-hash hazard (r4
    # pricing_summary regression; see plans/queries.py HARD RULE)
    return out.select(
        "symbol",
        F.round(F.col("entry_credit").cast("double"), 4).alias("entry_credit"),
        F.round(F.col("fees").cast("double"), 4).alias("fees"),
        F.round(F.col("weighted_price").cast("double"), 6).alias("weighted_price"),
        "covered",
    )


# Unique-greedy classifier fixture: each underlying carries EXACTLY one
# pattern instance, so the greedy matcher's outcome is order-independent
# and the exact labeled output is SQL-predictable (the oracle derives
# the expected label/legs from the same construction parameters).
# Pattern rows: (pattern_id, expected_label,
#                [(leg_type C/P/S, direction, strike_offset, qty_mult,
#                  expiration_id or None), ...]) — each pattern verified
# unreachable by every higher-priority matcher (MATCHERS order,
# patterns.py:678-704).
_CLS_PATTERNS: list[tuple[int, str, list]] = [
    (0, "Iron Condor", [("P", 1, -20, 1, 1), ("P", -1, -10, 1, 1), ("C", -1, 10, 1, 1), ("C", 1, 20, 1, 1)]),
    (1, "Iron Butterfly", [("P", 1, -10, 1, 1), ("P", -1, 0, 1, 1), ("C", -1, 0, 1, 1), ("C", 1, 10, 1, 1)]),
    (2, "Iron Broken Fly", [("P", 1, -15, 1, 1), ("P", -1, 0, 1, 1), ("C", -1, 0, 1, 1), ("C", 1, 10, 1, 1)]),
    (3, "Call Butterfly", [("C", 1, -10, 1, 1), ("C", -1, 0, 2, 1), ("C", 1, 10, 1, 1)]),
    (4, "Put Butterfly", [("P", 1, -10, 1, 1), ("P", -1, 0, 2, 1), ("P", 1, 10, 1, 1)]),
    (5, "Broken Fly", [("C", 1, -10, 1, 1), ("C", -1, 0, 2, 1), ("C", 1, 15, 1, 1)]),
    (6, "Big Lizard", [("P", -1, 0, 1, 1), ("C", -1, 0, 1, 1), ("C", 1, 10, 1, 1)]),
    (7, "Jade Lizard", [("P", -1, -10, 1, 1), ("C", -1, 0, 1, 1), ("C", 1, 10, 1, 1)]),
    (8, "Covered Jade Lizard", [("S", 1, None, 1, None), ("P", -1, -10, 1, 1), ("C", -1, 0, 1, 1), ("C", 1, 10, 1, 1)]),
    (9, "Collar", [("S", 1, None, 1, None), ("P", 1, -10, 1, 1), ("C", -1, 10, 1, 1)]),
    (10, "Covered Call", [("S", 1, None, 1, None), ("C", -1, 0, 1, 1)]),
    (11, "Protective Put", [("S", 1, None, 1, None), ("P", 1, 0, 1, 1)]),
    (12, "Bull Call Spread", [("C", 1, 0, 1, 1), ("C", -1, 10, 1, 1)]),
    (13, "Bear Call Spread", [("C", -1, 0, 1, 1), ("C", 1, 10, 1, 1)]),
    (14, "Bear Put Spread", [("P", 1, 0, 1, 1), ("P", -1, 10, 1, 1)]),
    (15, "Bull Put Spread", [("P", -1, 0, 1, 1), ("P", 1, 10, 1, 1)]),
    (16, "Ratio Spread", [("C", 1, 0, 1, 1), ("C", -1, 10, 2, 1)]),
    (17, "Short Straddle", [("C", -1, 0, 1, 1), ("P", -1, 0, 1, 1)]),
    (18, "Long Strangle", [("C", 1, 10, 1, 1), ("P", 1, -10, 1, 1)]),
    (19, "Synthetic Long", [("C", 1, 0, 1, 1), ("P", -1, 0, 1, 1)]),
    (20, "Calendar Spread", [("C", 1, 0, 1, 1), ("C", -1, 0, 1, 2)]),
    (21, "Diagonal Spread", [("C", 1, 0, 1, 1), ("C", -1, 10, 1, 2)]),
    (22, "Naked Put", [("P", -1, 0, 1, 1)]),
    (23, "Long Call", [("C", 1, 0, 1, 1)]),
    (24, "Long Straddle", [("C", 1, 0, 1, 1), ("P", 1, 0, 1, 1)]),
    (25, "Short Strangle", [("C", -1, 10, 1, 1), ("P", -1, -10, 1, 1)]),
    (26, "Synthetic Short", [("C", -1, 0, 1, 1), ("P", 1, 0, 1, 1)]),
    (27, "Naked Call", [("C", -1, 0, 1, 1)]),
    (28, "Long Put", [("P", 1, 0, 1, 1)]),
    (29, "Short Stock", [("S", -1, None, 1, None)]),
]


def _cls_oracle_sql() -> str:
    """Expected classifier output derived straight from _CLS_PATTERNS —
    the oracle never simulates the greedy scan; the fixture guarantees
    a unique outcome, so expected = construction."""
    label_cases = " ".join(f"WHEN {p} THEN '{lb}'" for p, lb, _ in _CLS_PATTERNS)
    n_cases = " ".join(f"WHEN {p} THEN {len(legs)}" for p, _, legs in _CLS_PATTERNS)
    sym_by_n = {
        n: " || ',' || ".join(f"u || '-{i}'" for i in range(1, n + 1))
        for n in sorted({len(legs) for _, _, legs in _CLS_PATTERNS})
    }
    sym_cases = " ".join(f"WHEN {n} THEN {e}" for n, e in sym_by_n.items())
    return f"""
    WITH o AS (
      SELECT 'G' || o_orderkey AS u, o_orderkey % 30 AS p FROM orders
    )
    SELECT u AS underlying,
           0 AS strategy_id,
           CASE p {label_cases} END AS strategy_type,
           CASE p {n_cases} END AS n_legs,
           CASE (CASE p {n_cases} END) {sym_cases} END AS leg_symbols
    FROM o
    """


@_q("strategy_classification", _cls_oracle_sql())
def strategy_classification(spark: SparkSession, sf_dir: str) -> DataFrame:
    """§2.10 combinatorial strategy classifier, exact-oracled: every
    order becomes an underlying holding one unambiguous pattern
    instance from _CLS_PATTERNS (strike ladder off o_orderkey, qty
    1-3, fixed expirations), so the greedy matcher must reproduce the
    construction labels exactly (patterns.py:678-704 priority order).
    Messy multi-strategy portfolios stay covered by unit tests and the
    leg-conservation invariant query below."""
    rows = []
    for p, _label, legs in _CLS_PATTERNS:
        for i, (typ, d, off, qm, exp_id) in enumerate(legs, start=1):
            rows.append((p, i, typ, d, off, qm, exp_id))
    spec = spark.createDataFrame(
        rows, "p int, leg int, typ string, dir int, off int, qm int, exp_id int"
    )
    orders = load_table(spark, "orders", sf_dir).select(
        F.concat(F.lit("G"), F.col("o_orderkey")).alias("u"),
        (F.col("o_orderkey") % 30).alias("p"),
        (F.lit(100) + F.col("o_orderkey") % 40).alias("base"),
        (F.lit(1) + F.col("o_orderkey") % 3).alias("q"),
    )
    legs_df = orders.join(F.broadcast(spec), "p").select(
        F.concat("u", F.lit("-"), F.col("leg")).alias("symbol"),
        F.col("u").alias("underlying"),
        F.when(F.col("typ") == "S", "Equity")
        .otherwise("Equity Option")
        .alias("instrument_type"),
        (F.col("dir") * F.col("q") * F.col("qm")).cast("double").alias(
            "signed_quantity"
        ),
        F.when(F.col("typ") == "S", F.lit(None)).otherwise(F.col("typ")).alias(
            "option_type"
        ),
        F.when(F.col("typ") == "S", F.lit(None))
        .otherwise((F.col("base") + F.col("off")).cast("double"))
        .alias("strike"),
        F.when(F.col("exp_id") == 1, F.lit("2024-06-21").cast("date"))
        .when(F.col("exp_id") == 2, F.lit("2024-07-19").cast("date"))
        .alias("expiration"),
    )
    out = classify_strategies(legs_df)
    # sorted symbol list: consumption SET is the contract here;
    # per-matcher presentation order stays pinned by unit tests
    return out.select(
        "underlying",
        "strategy_id",
        "strategy_type",
        "n_legs",
        F.concat_ws(",", F.array_sort("leg_symbols")).alias("leg_symbols"),
    )


@_q(
    "strategy_leg_conservation",
    """
    SELECT p_brand || '#' || (p_partkey % 64) AS underlying,
           count(*) AS legs_consumed,
           count(*) AS distinct_legs
    FROM part
    GROUP BY p_brand || '#' || (p_partkey % 64)
    """,
)
def strategy_leg_conservation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Greedy-invariant oracle over the MESSY portfolio fixture (multi
    strategy, leftovers): whatever the greedy outcome, every input leg
    must be consumed exactly once (classifier.py:430-447), so per
    underlying sum(n_legs) == count(input legs) == count(distinct
    consumed symbols). The oracle recomputes both from the fixture."""
    part = load_table(spark, "part", sf_dir)
    # same bounded sub-bucketing as round 1: groups stay ~8-16 legs so
    # the C(n,4) scan is bounded at every scale factor
    legs = part.select(
        F.concat(F.lit("P"), F.col("p_partkey")).alias("symbol"),
        F.concat(
            F.col("p_brand"), F.lit("#"), (F.col("p_partkey") % 64).cast("string")
        ).alias("underlying"),
        F.lit("Equity Option").alias("instrument_type"),
        (
            F.when(F.col("p_size") % 2 == 0, 1.0).otherwise(-1.0)
            * ((F.col("p_partkey") % 3) + 1)
        ).alias("signed_quantity"),
        F.when(F.col("p_size") % 4 < 2, "C").otherwise("P").alias("option_type"),
        (F.round(F.col("p_retailprice") / 100) * 10).cast("double").alias("strike"),
        F.to_date(
            F.concat(F.lit("2024-0"), ((F.col("p_size") % 3) + 1), F.lit("-15"))
        ).alias("expiration"),
    )
    out = classify_strategies(legs)
    return (
        out.select("underlying", F.explode("leg_symbols").alias("sym"))
        .groupBy("underlying")
        .agg(
            F.count("sym").alias("legs_consumed"),
            F.countDistinct("sym").alias("distinct_legs"),
        )
    )


def _wma_sql(col: str, period: int, pad: str = "pad", win: str = "win") -> str:
    """Oldest-first padded-WMA terms — the left-associative sum matches
    padded_wma_np's accumulation order bit-for-bit."""
    terms = []
    for j in range(1, period + 1):
        lagn = period - j
        src = f"coalesce(lag({col}, {lagn}) OVER {win}, {pad})" if lagn else col
        terms.append(f"{src}*{j}")
    return "(" + " + ".join(terms) + f") / {float(period * (period + 1) // 2)}"


def _signal_oracle_sql(candle_where: str = "", wrap_tail: str | None = None) -> str:
    """Full relational form of the ST1 engine: windowed indicators
    (prefix == full series because 2h candles stay under CANDLE_CAP)
    + the 36-state arming automaton as a recursive CTE.

    ``candle_where`` scopes the candle series (backtest warm-up range);
    ``wrap_tail`` turns the final select into a ``sigs`` CTE and
    appends the given SQL (backtest suppression + as-of enrichment)."""
    a12, a26, a9 = 2.0 / 13.0, 2.0 / 27.0, 2.0 / 10.0
    ema = "list_reduce(list_prepend({seed}, {arr}), (acc, x) -> acc*(1-{a}) + x*{a})"
    return f"""
    WITH RECURSIVE cand AS (
      SELECT event_type AS symbol,
             make_timestamp(((epoch_ms(ts) // 7200000) * 7200000) * 1000) AS time,
             value, ts, event_id
      FROM events
    ), c AS (
      SELECT symbol, time, value AS close FROM cand
      {candle_where}
      QUALIFY row_number() OVER (
        PARTITION BY symbol, time ORDER BY ts DESC, event_id DESC) = 1
    ), cf AS (
      SELECT symbol, time, close FROM c
      WHERE close IS NOT NULL AND NOT isnan(close)
    ), p AS (
      SELECT symbol, time, close,
             first_value(close) OVER wop AS pad,
             row_number() OVER wop AS rn,
             list(close) OVER (PARTITION BY symbol ORDER BY time
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS arr
      FROM cf WINDOW wop AS (PARTITION BY symbol ORDER BY time)
    ), w AS (
      SELECT symbol, time, close, pad, rn,
             {_wma_sql('close', 10, win='winw')} AS wma10,
             {_wma_sql('close', 20, win='winw')} AS wma20,
             {ema.format(seed='pad', arr='arr', a=a12)} AS ema12,
             {ema.format(seed='pad', arr='arr', a=a26)} AS ema26
      FROM p WINDOW winw AS (PARTITION BY symbol ORDER BY time)
    ), d AS (
      SELECT symbol, time, close, pad, rn,
             2*wma10 - wma20 AS hdiff, ema12 - ema26 AS mval
      FROM w
    ), h AS (
      SELECT symbol, time, close, rn, mval,
             {_wma_sql('hdiff', 4, win='winh')} AS hma,
             list(mval) OVER (PARTITION BY symbol ORDER BY time
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS mvarr
      FROM d WINDOW winh AS (PARTITION BY symbol ORDER BY time)
    ), ind0 AS (
      SELECT symbol, time, close, rn, mval, hma,
             {ema.format(seed='0.0', arr='mvarr', a=a9)} AS mavg,
             CASE WHEN hma > lag(hma) OVER (PARTITION BY symbol ORDER BY time)
                  THEN 'Up' ELSE 'Down' END AS dir
      FROM h
    ), ind AS (
      SELECT symbol, time, close, rn, mval, hma, mavg, mval - mavg AS mdiff, dir,
             CASE WHEN mval > mavg THEN 'bullish' ELSE 'bearish' END AS mp,
             CASE WHEN rn <= 2 THEN false
                  ELSE dir <> lag(dir) OVER woi END AS hc,
             CASE WHEN rn <= 2 THEN false
                  ELSE (mval > mavg) <>
                       (lag(mval) OVER woi > lag(mavg) OVER woi) END AS mc,
             CASE WHEN 60*extract(hour FROM (time AT TIME ZONE 'UTC')
                          AT TIME ZONE 'America/New_York')
                       + extract(minute FROM (time AT TIME ZONE 'UTC')
                          AT TIME ZONE 'America/New_York') < 600 THEN 'pre'
                  WHEN 60*extract(hour FROM (time AT TIME ZONE 'UTC')
                          AT TIME ZONE 'America/New_York')
                       + extract(minute FROM (time AT TIME ZONE 'UTC')
                          AT TIME ZONE 'America/New_York') >= 900 THEN 'late'
                  ELSE 'mid' END AS phase
      FROM ind0 WINDOW woi AS (PARTITION BY symbol ORDER BY time)
    ), auto AS (
      SELECT symbol, 1 AS rn,
             CAST(NULL AS VARCHAR) AS ha, CAST(NULL AS VARCHAR) AS ma,
             false AS bull_open, false AS bear_open,
             false AS f_close_bull, CAST(NULL AS VARCHAR) AS t_close_bull,
             false AS f_close_bear, CAST(NULL AS VARCHAR) AS t_close_bear,
             false AS f_open, CAST(NULL AS VARCHAR) AS d_open
      FROM (SELECT DISTINCT symbol FROM ind)
      UNION ALL
      SELECT symbol, rn,
             CASE WHEN phase <> 'mid' THEN ha1
                  WHEN open_fire THEN NULL
                  WHEN disagree AND ((mc AND NOT hc) OR (hc AND mc)) THEN NULL
                  ELSE ha1 END,
             CASE WHEN phase <> 'mid' THEN ma1
                  WHEN open_fire THEN NULL
                  WHEN disagree AND ((hc AND NOT mc) OR (hc AND mc)) THEN NULL
                  ELSE ma1 END,
             bull1 OR (open_fire AND ha1 = 'BULLISH'),
             bear1 OR (open_fire AND ha1 = 'BEARISH'),
             cb, cb_trig, ce, ce_trig, open_fire, ha1
      FROM (
        SELECT *,
               s_bull AND NOT cb AS bull1,
               s_bear AND NOT ce AS bear1,
               ha1 IS NOT NULL AND ma1 IS NOT NULL AND ha1 = ma1 AS agree,
               ha1 IS NOT NULL AND ma1 IS NOT NULL AND ha1 <> ma1 AS disagree,
               phase = 'mid'
                 AND ha1 IS NOT NULL AND ma1 IS NOT NULL AND ha1 = ma1
                 AND NOT ((ha1 = 'BULLISH' AND (s_bull AND NOT cb))
                          OR (ha1 = 'BEARISH' AND (s_bear AND NOT ce)))
                 AS open_fire
        FROM (
          SELECT i.symbol, i.rn, i.dir, i.mp, i.hc, i.mc, i.phase,
                 s.ha AS s_ha, s.ma AS s_ma,
                 s.bull_open AS s_bull, s.bear_open AS s_bear,
                 i.phase <> 'pre'
                   AND s.bull_open
                   AND ((i.hc AND i.dir = 'Down') OR (i.mc AND i.mp = 'bearish'))
                   AS cb,
                 CASE WHEN i.hc AND i.dir = 'Down' THEN 'hull' ELSE 'macd' END
                   AS cb_trig,
                 i.phase <> 'pre'
                   AND s.bear_open
                   AND ((i.hc AND i.dir = 'Up') OR (i.mc AND i.mp = 'bullish'))
                   AS ce,
                 CASE WHEN i.hc AND i.dir = 'Up' THEN 'hull' ELSE 'macd' END
                   AS ce_trig,
                 CASE WHEN i.phase = 'mid' AND i.hc THEN
                        CASE WHEN i.dir = 'Up' THEN 'BULLISH' ELSE 'BEARISH' END
                      ELSE s.ha END AS ha1,
                 CASE WHEN i.phase = 'mid' AND i.mc THEN
                        CASE WHEN i.mp = 'bullish' THEN 'BULLISH' ELSE 'BEARISH' END
                      ELSE s.ma END AS ma1
          FROM auto s JOIN ind i ON i.symbol = s.symbol AND i.rn = s.rn + 1
        ) x
      ) y
    ), em AS (
      SELECT symbol, rn,
             unnest(list_filter([
               struct_pack(st := 'CLOSE', dirn := 'BULLISH',
                           trg := t_close_bull, fire := f_close_bull),
               struct_pack(st := 'CLOSE', dirn := 'BEARISH',
                           trg := t_close_bear, fire := f_close_bear),
               struct_pack(st := 'OPEN', dirn := d_open,
                           trg := 'confluence', fire := f_open)
             ], x -> x.fire)) AS sg
      FROM auto
    )
    {"" if wrap_tail is None else ", sigs AS ("}
    SELECT em.symbol, i.time AS start_time, em.sg.st AS signal_type,
           em.sg.dirn AS direction, 'hull_macd' AS engine,
           em.sg.trg AS "trigger", i.dir AS hull_direction,
           round(i.hma, 8) AS hull_value, round(i.mval, 8) AS macd_value,
           round(i.mavg, 8) AS macd_signal, round(i.mdiff, 8) AS macd_histogram,
           i.close AS close_price
    FROM em JOIN ind i ON i.symbol = em.symbol AND i.rn = em.rn
    {"" if wrap_tail is None else ")" + wrap_tail}
    """


@_q("signal_detection", _signal_oracle_sql())
def signal_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST1 Hull+MACD confluence signal engine over 2-hour candle closes
    derived from the event stream (2h keeps every symbol's history
    under CANDLE_CAP, so the engine's growing buffer equals the full
    series and the indicators are ordinary window computations). The
    DuckDB oracle replays the arming automaton as a recursive CTE;
    batch==streaming equivalence is pinned separately by tests
    (tests/test_streaming.py::test_streaming_equals_batch)."""
    from tastytrade_sdk_spark.functions.scalar import floor_time_to_interval
    from tastytrade_sdk_spark.operators.dedup import keep_last
    from tastytrade_sdk_spark.streaming.signal_engine import detect_signals_batch

    ev = load_table(spark, "events", sf_dir)
    candles = keep_last(
        ev.select(
            F.col("event_type").alias("symbol"),
            floor_time_to_interval("ts", F.lit(7_200_000)).alias("time"),
            F.col("value").alias("close"),
            "ts",
            "event_id",
        ),
        ["symbol", "time"],
        ["ts", "event_id"],
    ).select("symbol", "time", "close")
    out = detect_signals_batch(candles, hull_length=20)
    # decisions run on raw doubles inside the engine; emitted indicator
    # floats are display values, rounded 8dp at the same site as the
    # oracle (pandas-ewm vs list_reduce EMA differ at ~1e-13)
    return out.select(
        "symbol", "start_time", "signal_type", "direction", "engine",
        "trigger", "hull_direction",
        F.round("hull_value", 8).alias("hull_value"),
        F.round("macd_value", 8).alias("macd_value"),
        F.round("macd_signal", 8).alias("macd_signal"),
        F.round("macd_histogram", 8).alias("macd_histogram"),
        "close_price",
    )


# Backtest window constants: start mid-range so the 5-day 'h'-class
# warm-up (replay.py WARMUP_DAYS) genuinely prepends history whose
# emissions must be suppressed.
_BT_START = "2024-01-15 00:00:00"
_BT_WARM = "2024-01-10 00:00:00"
_BT_END = "2024-01-31 00:00:00"


def _backtest_oracle_sql() -> str:
    tail = f"""
    , pr AS (
      SELECT event_type AS symbol,
             make_timestamp(((epoch_ms(ts) // 1800000) * 1800000) * 1000) AS p_time,
             value AS p_close, ts, event_id
      FROM events WHERE value IS NOT NULL
    ), prc AS (
      SELECT symbol, p_time, p_close FROM pr
      QUALIFY row_number() OVER (PARTITION BY symbol, p_time
        ORDER BY ts DESC, event_id DESC) = 1
    )
    SELECT s.symbol, s.start_time, s.signal_type, s.direction, s."trigger",
           s.close_price, p.p_close AS entry_price
    FROM (SELECT * FROM sigs WHERE start_time >= TIMESTAMP '{_BT_START}') s
    ASOF LEFT JOIN prc p
      ON s.symbol = p.symbol AND s.start_time >= p.p_time
    """
    return _signal_oracle_sql(
        candle_where=(
            f"WHERE time >= TIMESTAMP '{_BT_WARM}' "
            f"AND time <= TIMESTAMP '{_BT_END}'"
        ),
        wrap_tail=tail,
    )


@_q("backtest_entry_enrichment", _backtest_oracle_sql())
def backtest_entry_enrichment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ST8/ST9/J5 as one oracled pipeline: replay 2h signal candles
    through the engine with the 5-day warm-up prepended, suppress
    warm-up emissions (start_time < start), and as-of-enrich surviving
    signals with the last 30m pricing-candle close at or before the
    signal time (backtest/replay.py:26-135, publisher.py:48-128). The
    oracle replays the automaton over the SCOPED candle range and uses
    DuckDB's native ASOF JOIN for the entry price."""
    import datetime as dtm

    from tastytrade_sdk_spark.functions.scalar import floor_time_to_interval
    from tastytrade_sdk_spark.operators.dedup import keep_last
    from tastytrade_sdk_spark.streaming.replay import run_backtest

    ev = load_table(spark, "events", sf_dir)

    def candles(src: DataFrame, ms: int) -> DataFrame:
        return keep_last(
            src.select(
                F.col("event_type").alias("symbol"),
                floor_time_to_interval("ts", F.lit(ms)).alias("time"),
                F.col("value").alias("close"),
                "ts",
                "event_id",
            ),
            ["symbol", "time"],
            ["ts", "event_id"],
        ).select("symbol", "time", "close")

    sig_candles = candles(ev, 7_200_000)
    # non-null pricing filtered BEFORE the keep-last dedup, exactly as
    # the oracle's `WHERE value IS NOT NULL` precedes its QUALIFY: if a
    # bucket's newest event had a NULL value, filtering after dedup
    # would drop the whole bucket while the oracle keeps the older
    # non-null row
    pricing = candles(ev.filter(F.col("value").isNotNull()), 1_800_000)
    out = run_backtest(
        sig_candles,
        pricing,
        dtm.datetime(2024, 1, 15),
        dtm.datetime(2024, 1, 31),
        signal_interval="2h",
    )
    return out.select(
        "symbol", "start_time", "signal_type", "direction", "trigger",
        "close_price", "entry_price",
    )
