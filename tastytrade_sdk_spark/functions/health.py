"""Strategy health monitoring (SURVEY §2.9 conditional classification /
health thresholds).

Re-expressed from src/tastytrade/analytics/strategies/health.py:28-199:
configurable DTE and delta-drift thresholds with per-strategy-type
overrides; delta drift normalized to per-position (net_delta / qty)
and exempt for delta-1/covered strategies where high delta is
inherent; CRITICAL beats WARNING per check.

Pure Column expressions — the config dict becomes a when-ladder, so
the evaluator runs in whole-stage codegen over millions of strategies.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_THRESHOLDS = {
    "dte_warning": 14,
    "dte_critical": 7,
    "delta_drift_warning": 0.30,
    "delta_drift_critical": 0.50,
}

DELTA_EXEMPT = (
    "Long Stock",
    "Short Stock",
    "Long Crypto",
    "Short Crypto",
    "Long Future",
    "Short Future",
    "Covered Call",
    "Protective Put",
)


def _threshold_col(
    strategy_type: Column, key: str, overrides: dict[str, dict] | None
) -> Column:
    base = F.lit(DEFAULT_THRESHOLDS[key])
    if not overrides:
        return base
    expr = base
    for stype, ov in overrides.items():
        if key in ov:
            expr = F.when(strategy_type == stype, F.lit(ov[key])).otherwise(expr)
    return expr


def health_alerts(
    df: DataFrame,
    strategy_type_col: str = "strategy_type",
    dte_col: str = "days_to_expiration",
    net_delta_col: str = "net_delta",
    qty_col: str = "quantity",
    overrides: dict[str, dict] | None = None,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """One row per fired alert: (..keep_cols.., alert_kind, level).

    alert_kind in {'dte', 'delta_drift'}; level in {'CRITICAL',
    'WARNING'}. Strategies with no alert produce no rows.
    """
    st = F.col(strategy_type_col)
    dte = F.col(dte_col)
    dte_warn = _threshold_col(st, "dte_warning", overrides)
    dte_crit = _threshold_col(st, "dte_critical", overrides)
    drift_warn = _threshold_col(st, "delta_drift_warning", overrides)
    drift_crit = _threshold_col(st, "delta_drift_critical", overrides)

    dte_level = (
        F.when(dte.isNull(), F.lit(None))
        .when(dte <= dte_crit, F.lit("CRITICAL"))
        .when(dte <= dte_warn, F.lit("WARNING"))
        .otherwise(F.lit(None))
    )

    qty = F.col(qty_col)
    per_pos = F.when(qty > 0, F.col(net_delta_col) / qty).otherwise(
        F.col(net_delta_col)
    )
    drift_level = (
        F.when(F.col(net_delta_col).isNull() | st.isin(*DELTA_EXEMPT), F.lit(None))
        .when(F.abs(per_pos) > drift_crit, F.lit("CRITICAL"))
        .when(F.abs(per_pos) > drift_warn, F.lit("WARNING"))
        .otherwise(F.lit(None))
    )

    keep = keep_cols or [strategy_type_col]
    alerts = F.array(
        F.struct(F.lit("dte").alias("alert_kind"), dte_level.alias("level")),
        F.struct(F.lit("delta_drift").alias("alert_kind"), drift_level.alias("level")),
    )
    exploded = df.select(*keep, F.explode(alerts).alias("__a"))
    return exploded.filter(F.col("__a.level").isNotNull()).select(
        *keep,
        F.col("__a.alert_kind").alias("alert_kind"),
        F.col("__a.level").alias("level"),
    )
