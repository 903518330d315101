"""Typed account-event envelope schemas and demux (S10 surface).

The reference's account streamer receives a WebSocket envelope and
routes ``CurrentPosition`` / ``AccountBalance`` / order events into
per-type asyncio queues of pydantic models with kebab-case JSON
aliases and nested order -> leg -> fill structure (reference
src/tastytrade/accounts/streamer.py:1-50, accounts/models.py:813-946).

Spark-first re-expression:

* the pydantic models become :class:`~pyspark.sql.types.StructType`
  schemas (``PLACED_ORDER_SCHEMA`` et al.) usable in ``from_json`` on
  a batch or streaming DataFrame;
* the kebab-case wire aliases become a declared *wire* schema
  (``PLACED_ORDER_WIRE_SCHEMA``) plus a pure-expression rename pass
  (``parse_order_json``) — no Python-side parsing, stays inside
  whole-stage codegen;
* the per-type queues become :func:`demux_account_events`, one
  filtered DataFrame per event type (each its own streaming sink);
* nested envelopes are built/unwound with ``collect_list(struct)`` /
  ``explode`` (:func:`nest_order_envelope`,
  :func:`explode_order_fills`) — one shuffle to nest, zero to
  explode, so the round-trip scales to arbitrarily many orders.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

# ---------------------------------------------------------------------------
# Typed schemas (snake_case, the engine-internal shape)
# ---------------------------------------------------------------------------

#: A single fill execution within an order leg
#: (reference accounts/models.py:813-826 ``OrderFill``).
ORDER_FILL_SCHEMA = StructType(
    [
        StructField("fill_id", StringType(), False),
        StructField("quantity", DoubleType(), True),
        StructField("fill_price", DoubleType(), True),
        StructField("filled_at", TimestampType(), True),
        StructField("destination_venue", StringType(), True),
    ]
)

#: A single leg within an order
#: (reference accounts/models.py:829-865 ``OrderLeg``).
ORDER_LEG_SCHEMA = StructType(
    [
        StructField("leg_index", LongType(), False),
        StructField("instrument_type", StringType(), True),
        StructField("symbol", StringType(), True),
        StructField("action", StringType(), True),
        StructField("quantity", DoubleType(), True),
        StructField("remaining_quantity", DoubleType(), True),
        StructField("fills", ArrayType(ORDER_FILL_SCHEMA), True),
    ]
)

#: An order envelope from the account streamer
#: (reference accounts/models.py:868-946 ``PlacedOrder``).
PLACED_ORDER_SCHEMA = StructType(
    [
        StructField("id", LongType(), False),
        StructField("account_number", StringType(), True),
        StructField("order_type", StringType(), True),
        StructField("time_in_force", StringType(), True),
        StructField("price", DoubleType(), True),
        StructField("price_effect", StringType(), True),
        StructField("status", StringType(), True),
        StructField("cancellable", BooleanType(), True),
        StructField("editable", BooleanType(), True),
        StructField("underlying_symbol", StringType(), True),
        StructField("legs", ArrayType(ORDER_LEG_SCHEMA), True),
    ]
)

#: Position snapshot (reference accounts/models.py:130-273 ``Position``,
#: trimmed to the analytic columns the engine consumes).
POSITION_SCHEMA = StructType(
    [
        StructField("account_number", StringType(), False),
        StructField("symbol", StringType(), False),
        StructField("instrument_type", StringType(), True),
        StructField("underlying_symbol", StringType(), True),
        StructField("quantity", DoubleType(), True),
        StructField("quantity_direction", StringType(), True),
        StructField("close_price", DoubleType(), True),
        StructField("average_open_price", DoubleType(), True),
        StructField("multiplier", DoubleType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

#: Account balance snapshot (reference accounts/models.py:349-754
#: ``AccountBalance``, trimmed).
ACCOUNT_BALANCE_SCHEMA = StructType(
    [
        StructField("account_number", StringType(), False),
        StructField("cash_balance", DoubleType(), True),
        StructField("net_liquidating_value", DoubleType(), True),
        StructField("equity_buying_power", DoubleType(), True),
        StructField("maintenance_requirement", DoubleType(), True),
        StructField("updated_at", TimestampType(), True),
    ]
)

#: A single leg within a trade-chain order node
#: (reference accounts/models.py:1007-1014 ``TradeChainLeg``; wire
#: quantities-as-strings become typed doubles engine-side).
TRADE_CHAIN_LEG_SCHEMA = StructType(
    [
        StructField("symbol", StringType(), True),
        StructField("instrument_type", StringType(), True),
        StructField("action", StringType(), True),
        StructField("fill_quantity", DoubleType(), True),
        StructField("order_quantity", DoubleType(), True),
    ]
)

#: A node in a trade chain — open-positions or an order
#: (reference accounts/models.py:1042-1068 ``TradeChainNode``).
TRADE_CHAIN_NODE_SCHEMA = StructType(
    [
        StructField("occurred_at", TimestampType(), True),
        StructField("node_id", LongType(), False),
        StructField("node_type", StringType(), True),
        StructField("description", StringType(), True),
        StructField("total_fill_cost", DoubleType(), True),
        StructField("total_fill_cost_effect", StringType(), True),
        StructField("total_fees", DoubleType(), True),
        StructField("roll", BooleanType(), True),
        StructField("legs", ArrayType(TRADE_CHAIN_LEG_SCHEMA), True),
    ]
)

#: Chain-level computed P&L / lifecycle data
#: (reference accounts/models.py:1071-1113 ``TradeChainComputedData``).
TRADE_CHAIN_COMPUTED_SCHEMA = StructType(
    [
        StructField("open", BooleanType(), True),
        StructField("realized_gain", DoubleType(), True),
        StructField("realized_gain_effect", StringType(), True),
        StructField("winner_realized", BooleanType(), True),
        StructField("roll_count", LongType(), True),
        StructField("opened_at", TimestampType(), True),
        StructField("last_occurred_at", TimestampType(), True),
    ]
)

#: Full trade lifecycle envelope
#: (reference accounts/models.py:1116-1146 ``TradeChain``).
TRADE_CHAIN_SCHEMA = StructType(
    [
        StructField("id", StringType(), False),
        StructField("description", StringType(), True),
        StructField("underlying_symbol", StringType(), True),
        StructField("computed_data", TRADE_CHAIN_COMPUTED_SCHEMA, True),
        StructField("lite_nodes", ArrayType(TRADE_CHAIN_NODE_SCHEMA), True),
    ]
)

#: The demuxed envelope: one event per row, exactly one typed payload
#: non-null (the streamer's per-type queues, as a union-typed column
#: set — Spark has no sum types, so the idiom is nullable payloads +
#: an ``event_type`` discriminator).
ACCOUNT_EVENT_SCHEMA = StructType(
    [
        StructField("event_type", StringType(), False),
        StructField("account_number", StringType(), True),
        StructField("received_at", TimestampType(), True),
        StructField("order", PLACED_ORDER_SCHEMA, True),
        StructField("position", POSITION_SCHEMA, True),
        StructField("balance", ACCOUNT_BALANCE_SCHEMA, True),
    ]
)

#: Known event-type discriminators (reference
#: config/enumerations.AccountEventType; ``CurrentPosition`` — not
#: ``Position`` — per the streamer's protocol notes).
ACCOUNT_EVENT_TYPES = ("Order", "CurrentPosition", "AccountBalance")


# ---------------------------------------------------------------------------
# Wire-format parsing (kebab-case JSON -> typed snake_case structs)
# ---------------------------------------------------------------------------

def _wire_name(snake: str) -> str:
    return snake.replace("_", "-")


def _wire_struct(schema: StructType) -> StructType:
    """Kebab-case twin of a typed schema (the reference's pydantic
    ``Field(alias="fill-id")`` mapping, declared once).

    Leaf fields parse as STRING and are cast to their typed form in
    ``_snakeify``: the reference wire encodes quantities/money as JSON
    strings in places (TradeChain models, accounts/models.py:995-1014)
    and as numbers elsewhere — from_json's StringType accepts either
    token and keeps its text, where a DoubleType field would null out
    the whole record on a quoted number (PERMISSIVE-mode data loss)."""
    fields = []
    for f in schema.fields:
        dt = f.dataType
        if isinstance(dt, StructType):
            dt = _wire_struct(dt)
        elif isinstance(dt, ArrayType) and isinstance(dt.elementType, StructType):
            dt = ArrayType(_wire_struct(dt.elementType))
        else:
            dt = StringType()
        fields.append(StructField(_wire_name(f.name), dt, True))
    return StructType(fields)


PLACED_ORDER_WIRE_SCHEMA = _wire_struct(PLACED_ORDER_SCHEMA)
TRADE_CHAIN_WIRE_SCHEMA = _wire_struct(TRADE_CHAIN_SCHEMA)


def _snakeify_elem(elem: StructType):
    """One-arg lambda factory for F.transform (a two-parameter
    callable would be treated as the (element, index) form)."""

    def fn(e):
        return _snakeify(e, elem)

    return fn


def _snakeify(col, schema: StructType):
    """Rebuild a kebab-case struct column as its snake_case twin —
    pure struct/transform expressions, no UDF."""
    parts = []
    for f in schema.fields:
        child = col.getField(_wire_name(f.name))
        if isinstance(f.dataType, StructType):
            child = _snakeify(child, f.dataType)
        elif isinstance(f.dataType, ArrayType) and isinstance(
            f.dataType.elementType, StructType
        ):
            child = F.transform(child, _snakeify_elem(f.dataType.elementType))
        else:
            child = child.cast(f.dataType)
        parts.append(child.alias(f.name))
    return F.struct(*parts)


def parse_order_json(df: DataFrame, json_col: str = "payload") -> DataFrame:
    """Parse a kebab-case order-envelope JSON column into a typed
    ``order`` struct column (reference models' alias layer, as
    expressions)."""
    wire = F.from_json(F.col(json_col), PLACED_ORDER_WIRE_SCHEMA)
    return df.withColumn("order", _snakeify(wire, PLACED_ORDER_SCHEMA))


def parse_trade_chain_json(df: DataFrame, json_col: str = "payload") -> DataFrame:
    """Parse a kebab-case TradeChain JSON column (OrderChain event wire
    format, reference accounts/models.py:1116-1146) into a typed
    ``trade_chain`` struct — same expression-only alias layer, three
    nesting levels deep (chain -> nodes -> legs, plus computed-data)."""
    wire = F.from_json(F.col(json_col), TRADE_CHAIN_WIRE_SCHEMA)
    return df.withColumn("trade_chain", _snakeify(wire, TRADE_CHAIN_SCHEMA))


# ---------------------------------------------------------------------------
# Demux + nest/explode
# ---------------------------------------------------------------------------

def demux_account_events(df: DataFrame) -> dict[str, DataFrame]:
    """Split an ACCOUNT_EVENT_SCHEMA stream into per-type DataFrames —
    the Spark idiom for the streamer's typed queues (reference
    accounts/streamer.py routing). Works on batch and streaming
    DataFrames alike (filters are stateless)."""
    out: dict[str, DataFrame] = {}
    for etype in ACCOUNT_EVENT_TYPES:
        out[etype] = df.filter(F.col("event_type") == etype)
    return out


def nest_order_envelope(fills: DataFrame) -> DataFrame:
    """Build nested leg/fill arrays from flat per-fill rows.

    ``fills`` columns: ``id`` (order key), ``leg_index``,
    ``instrument_type``, ``symbol``, ``action``, ``quantity`` (leg
    quantity), ``fill_id``, ``fill_quantity``, ``fill_price``.
    Returns one row per ``id`` with a ``legs`` array typed like
    ``PLACED_ORDER_SCHEMA.legs`` (``remaining_quantity`` null,
    fill ``filled_at``/``destination_venue`` null).

    Two ``collect_list(struct)`` passes (fill -> leg, leg -> order),
    each a single keyed shuffle; arrays are ``array_sort``-ed on their
    leading (unique) key so the envelope is deterministic regardless
    of shuffle order. Scales: state per group is one order's
    legs/fills, never a partition's.
    """
    leg_grp = fills.groupBy(
        "id", "leg_index", "instrument_type", "symbol", "action", "quantity"
    ).agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("fill_id"),
                    F.col("fill_quantity").alias("quantity"),
                    F.col("fill_price"),
                    F.lit(None).cast(TimestampType()).alias("filled_at"),
                    F.lit(None).cast(StringType()).alias("destination_venue"),
                )
            )
        ).alias("fills")
    )
    return leg_grp.groupBy("id").agg(
        F.array_sort(
            F.collect_list(
                F.struct(
                    F.col("leg_index"),
                    F.col("instrument_type"),
                    F.col("symbol"),
                    F.col("action"),
                    F.col("quantity"),
                    F.lit(None).cast(DoubleType()).alias("remaining_quantity"),
                    F.col("fills"),
                )
            )
        ).alias("legs")
    )


def chain_computed_data(nodes):
    """Derive ``TradeChainComputedData`` from a ``lite_nodes`` array
    column — the reference pre-computes this server-side (reference
    accounts/models.py:1071-1113); here it is pure higher-order
    expressions over the node array (zero additional shuffles, stays
    in whole-stage codegen).

    Money math runs in DECIMAL inside the fold (exact, order-free), so
    ``realized_gain``/``winner_realized`` are reproducible across
    engines and partitionings.
    """
    signed = lambda n: F.when(  # noqa: E731
        n.getField("total_fill_cost_effect") == "Credit",
        n.getField("total_fill_cost").cast("decimal(18,2)"),
    ).otherwise(-n.getField("total_fill_cost").cast("decimal(18,2)"))
    realized_d = F.aggregate(
        nodes,
        F.lit(0).cast("decimal(28,2)"),
        lambda acc, n: (acc + signed(n)).cast("decimal(28,2)"),
    )
    occurred = F.transform(nodes, lambda n: n.getField("occurred_at"))
    return F.struct(
        F.exists(nodes, lambda n: n.getField("node_type") == "open-positions").alias(
            "open"
        ),
        realized_d.cast("double").alias("realized_gain"),
        F.when(realized_d >= 0, F.lit("Credit")).otherwise(F.lit("Debit")).alias(
            "realized_gain_effect"
        ),
        (realized_d > 0).alias("winner_realized"),
        F.size(F.filter(nodes, lambda n: n.getField("roll")))
        .cast("long")
        .alias("roll_count"),
        F.array_min(occurred).alias("opened_at"),
        F.array_max(occurred).alias("last_occurred_at"),
    )


def explode_order_fills(
    nested: DataFrame, envelope_col: str = "order", outer: bool = False
) -> DataFrame:
    """Unwind a typed order envelope back to one row per fill with
    order and leg context — ``explode`` twice, narrow (no shuffle).

    With ``outer=False`` (default) orders with no legs and legs with
    no fills vanish (inner-explode semantics — right for fill
    summaries). ``outer=True`` keeps them as rows with null leg/fill
    columns (right for audits that must see every order)."""
    expl = F.explode_outer if outer else F.explode
    o = F.col(envelope_col)
    legs = nested.select(
        o.getField("id").alias("order_id"),
        o.getField("account_number").alias("account_number"),
        o.getField("status").alias("status"),
        expl(o.getField("legs")).alias("leg"),
    )
    return legs.select(
        "order_id",
        "account_number",
        "status",
        F.col("leg.leg_index").alias("leg_index"),
        F.col("leg.symbol").alias("symbol"),
        F.col("leg.action").alias("action"),
        F.col("leg.instrument_type").alias("instrument_type"),
        F.col("leg.quantity").alias("leg_quantity"),
        expl(F.col("leg.fills")).alias("fill"),
    ).select(
        "order_id",
        "account_number",
        "status",
        "leg_index",
        "symbol",
        "action",
        "instrument_type",
        "leg_quantity",
        F.col("fill.fill_id").alias("fill_id"),
        F.col("fill.quantity").alias("fill_quantity"),
        F.col("fill.fill_price").alias("fill_price"),
    )
