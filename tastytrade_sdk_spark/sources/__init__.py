from tastytrade_sdk_spark.sources.accounts import (
    ACCOUNT_BALANCE_SCHEMA,
    ACCOUNT_EVENT_SCHEMA,
    ACCOUNT_EVENT_TYPES,
    PLACED_ORDER_SCHEMA,
    POSITION_SCHEMA,
    TRADE_CHAIN_SCHEMA,
    chain_computed_data,
    demux_account_events,
    explode_order_fills,
    nest_order_envelope,
    parse_order_json,
    parse_trade_chain_json,
)
from tastytrade_sdk_spark.sources.skipping import (
    append_clustered,
    pruned_file_plan,
    read_pruned,
    write_clustered,
)
from tastytrade_sdk_spark.sources.tables import TABLE_NAMES, load_table, load_tables

__all__ = [
    "TABLE_NAMES",
    "append_clustered",
    "pruned_file_plan",
    "read_pruned",
    "write_clustered",
    "load_table",
    "load_tables",
    "ACCOUNT_BALANCE_SCHEMA",
    "ACCOUNT_EVENT_SCHEMA",
    "ACCOUNT_EVENT_TYPES",
    "PLACED_ORDER_SCHEMA",
    "POSITION_SCHEMA",
    "TRADE_CHAIN_SCHEMA",
    "chain_computed_data",
    "demux_account_events",
    "explode_order_fills",
    "nest_order_envelope",
    "parse_order_json",
    "parse_trade_chain_json",
]
