"""NumPy indicator kernels shared by the Arrow operators and the
signal engine (batch AND streaming use the same functions, which is
what makes replay equivalence exact — SURVEY ST6).

Semantics match src/tastytrade/analytics/indicators/momentum.py
(re-expressed; see operators/indicators.py for the contract notes).
"""

from __future__ import annotations

import math

import numpy as np


def padded_wma_np(values: np.ndarray, period: int, pad_value: float) -> np.ndarray:
    """Weighted MA (weights 1..period) with warm-up rows left-padded by
    ``pad_value``.

    Accumulates terms oldest-first (weight 1 first) instead of a BLAS
    dot product: the left-associative sum is bit-identical to the SQL
    expression form ``(lag(x,n-1)*1 + ... + x*n) / sum`` used by both
    the JVM operator and the DuckDB oracles, so engine outputs
    hash-match without rounding tolerance."""
    n = len(values)
    if n == 0:
        return np.empty(0)
    padded = np.concatenate(
        (np.full(period - 1, float(pad_value)), np.asarray(values, dtype=float))
    )
    acc = np.zeros(n)
    for j in range(1, period + 1):
        acc = acc + j * padded[j - 1 : j - 1 + n]
    return acc / (period * (period + 1) / 2.0)


def ema_seeded_np(values: np.ndarray, length: int, seed: float) -> np.ndarray:
    """out[0] = a*x0 + (1-a)*seed; forward recurrence, a = 2/(n+1)."""
    import pandas as pd

    if len(values) == 0:
        return np.empty(0)
    alpha = 2.0 / (length + 1.0)
    s = pd.Series(np.concatenate(([seed], np.asarray(values, dtype=float))))
    return s.ewm(alpha=alpha, adjust=False).mean().to_numpy()[1:]


def hull_np(
    closes: np.ndarray, length: int = 20, pad_value: float | None = None
) -> tuple[np.ndarray, np.ndarray]:
    """Hull MA values + Up/Down colors (momentum.py:43-98)."""
    closes = np.asarray(closes, dtype=float)
    if len(closes) == 0:
        return np.empty(0), np.empty(0, dtype=object)
    if pad_value is None:
        pad_value = float(closes[0])
    half = int(round(length / 2))
    sq = int(round(math.sqrt(length)))
    diff = 2 * padded_wma_np(closes, half, pad_value) - padded_wma_np(
        closes, length, pad_value
    )
    hma = padded_wma_np(diff, sq, pad_value)
    prev = np.concatenate(([np.nan], hma[:-1]))
    colors = np.where(hma > prev, "Up", "Down")
    return hma, colors


def macd_np(
    closes: np.ndarray,
    prior_close: float | None = None,
    fast_length: int = 12,
    slow_length: int = 26,
    macd_length: int = 9,
) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(value, avg, diff) per momentum.py:116-163; fast/slow seeded by
    prior_close (fallback first close), signal seeded 0.0."""
    closes = np.asarray(closes, dtype=float)
    if len(closes) == 0:
        return np.empty(0), np.empty(0), np.empty(0)
    if prior_close is None:
        # first NON-NaN close, like the reference's validated series —
        # seeding with a NaN head would poison both EMA states
        finite = closes[~np.isnan(closes)]
        prior_close = float(finite[0]) if len(finite) else float("nan")
    value = ema_seeded_np(closes, fast_length, prior_close) - ema_seeded_np(
        closes, slow_length, prior_close
    )
    avg = ema_seeded_np(value, macd_length, 0.0)
    return value, avg, value - avg
