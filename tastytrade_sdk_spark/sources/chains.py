"""Nested option-chain flattening (SURVEY S8).

Reference shape (src/tastytrade/market/option_chains.py:32-141): the
REST chain payload nests roots -> expirations -> strikes ->
{call, put}; the scan flattens to one row per contract.

Spark form: chained ``explode`` over ArrayType(StructType) columns —
Catalyst pushes the projection into the generate nodes, so only the
selected leaf fields are materialized.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def flatten_chain(
    chain: DataFrame,
    expirations_col: str = "expirations",
    strikes_field: str = "strikes",
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """roots(expirations[].strikes[].{call,put}) -> one row per
    contract with (expiration_date, dte, strike_price, option_type,
    symbol)."""
    keep = keep_cols or [c for c in chain.columns if c != expirations_col]
    exp = chain.select(*keep, F.explode(F.col(expirations_col)).alias("__exp"))
    strikes = exp.select(
        *keep,
        F.col("__exp.expiration_date").alias("expiration_date"),
        F.col("__exp.days_to_expiration").alias("days_to_expiration"),
        F.explode(F.col(f"__exp.{strikes_field}")).alias("__strike"),
    )
    # one explode of a 2-element {call,put} array instead of a union of
    # two branches: a union would re-run the whole upstream (scan +
    # nested build) once per side
    cp = F.explode(
        F.array(
            F.struct(
                F.lit("C").alias("option_type"),
                F.col("__strike.call").alias("symbol"),
            ),
            F.struct(
                F.lit("P").alias("option_type"),
                F.col("__strike.put").alias("symbol"),
            ),
        )
    )
    return (
        strikes.select(
            *keep,
            "expiration_date",
            "days_to_expiration",
            F.col("__strike.strike_price").alias("strike_price"),
            cp.alias("__cp"),
        )
        .select(
            *keep, "expiration_date", "days_to_expiration", "strike_price",
            F.col("__cp.option_type").alias("option_type"),
            F.col("__cp.symbol").alias("symbol"),
        )
        .filter(F.col("symbol").isNotNull())
    )


def closest_dte_expirations(
    contracts: DataFrame,
    target_dtes: list[int],
    dte_col: str = "days_to_expiration",
) -> DataFrame:
    """P6/O6: for each target DTE keep every contract of the single
    closest available expiration (option_chains.py:144-172)."""
    from pyspark.sql import Window

    targets = contracts.sparkSession.createDataFrame(
        [(t,) for t in target_dtes], "target_dte int"
    )
    # a NULL dte would out-rank every real one (ASC window order is
    # NULLS FIRST and abs(NULL - target) is NULL) and then equi-join
    # to nothing — silently emptying the result for every target
    dtes = contracts.select(dte_col).filter(F.col(dte_col).isNotNull()).distinct()
    ranked = (
        dtes.crossJoin(F.broadcast(targets))
        .withColumn(
            "__rnk",
            F.row_number().over(
                Window.partitionBy("target_dte").orderBy(
                    F.abs(F.col(dte_col) - F.col("target_dte")), F.col(dte_col)
                )
            ),
        )
        .filter(F.col("__rnk") == 1)
        .select("target_dte", dte_col)
    )
    return contracts.join(F.broadcast(ranked), dte_col)
