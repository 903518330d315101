"""Incremental O(1)-per-candle indicator state (SURVEY W5).

The reference maintains two implementations of Hull/MACD: the batch
recompute (momentum.py) and an O(1) streaming form carrying rolling
state across candles (src/tastytrade/charting/indicators.py:26-284).
These classes are that second form, re-expressed: bounded state
(trailing windows + EMA registers) instead of a candle buffer — the
state schema a ``transformWithState`` deployment carries per symbol.

Equivalence with the batch kernels is asserted in tests
(post-warm-up values agree to fp tolerance; the batch kernels use
vectorized dots whose summation order differs at ~1e-15).
"""

from __future__ import annotations

import math
from dataclasses import dataclass, field


@dataclass
class IncrementalWMA:
    """Padded WMA over a trailing window; O(period) per update,
    O(period) state."""

    period: int
    pad_value: float | None = None
    window: list = field(default_factory=list)

    def update(self, value: float) -> float:
        if self.pad_value is None:
            self.pad_value = float(value)
        self.window.append(float(value))
        if len(self.window) > self.period:
            self.window.pop(0)
        pad_n = self.period - len(self.window)
        vals = [self.pad_value] * pad_n + self.window
        num = sum(v * w for v, w in zip(vals, range(1, self.period + 1)))
        return num / (self.period * (self.period + 1) / 2)


@dataclass
class IncrementalHull:
    """HMA = WMA(2*WMA(n/2) - WMA(n), sqrt(n)) with rolling windows."""

    length: int = 20
    pad_value: float | None = None
    _half: IncrementalWMA = None
    _full: IncrementalWMA = None
    _sqrt: IncrementalWMA = None
    _prev_hma: float | None = None

    def __post_init__(self):
        half = int(round(self.length / 2))
        sq = int(round(math.sqrt(self.length)))
        self._half = IncrementalWMA(half, self.pad_value)
        self._full = IncrementalWMA(self.length, self.pad_value)
        self._sqrt = IncrementalWMA(sq, self.pad_value)

    def update(self, close: float) -> tuple[float, str]:
        if self.pad_value is None:
            self.pad_value = float(close)
            for w in (self._half, self._full, self._sqrt):
                w.pad_value = self.pad_value
        diff = 2 * self._half.update(close) - self._full.update(close)
        hma = self._sqrt.update(diff)
        color = "Up" if self._prev_hma is not None and hma > self._prev_hma else "Down"
        self._prev_hma = hma
        return hma, color


@dataclass
class IncrementalEMA:
    """Seeded EMA register: O(1) state, O(1) update."""

    length: int
    seed: float | None = None
    _value: float | None = None

    def update(self, x: float) -> float:
        alpha = 2.0 / (self.length + 1.0)
        prev = self._value if self._value is not None else (
            self.seed if self.seed is not None else float(x)
        )
        self._value = alpha * float(x) + (1 - alpha) * prev
        return self._value


@dataclass
class IncrementalMACD:
    """MACD registers: fast/slow EMAs seeded with prior close
    (fallback first close), signal EMA seeded 0."""

    fast_length: int = 12
    slow_length: int = 26
    macd_length: int = 9
    prior_close: float | None = None
    _fast: IncrementalEMA = None
    _slow: IncrementalEMA = None
    _signal: IncrementalEMA = None

    def __post_init__(self):
        self._fast = IncrementalEMA(self.fast_length, self.prior_close)
        self._slow = IncrementalEMA(self.slow_length, self.prior_close)
        self._signal = IncrementalEMA(self.macd_length, 0.0)

    def update(self, close: float) -> tuple[float, float, float]:
        if self._fast.seed is None and self._fast._value is None:
            seed = self.prior_close if self.prior_close is not None else float(close)
            self._fast.seed = seed
            self._slow.seed = seed
        value = self._fast.update(close) - self._slow.update(close)
        avg = self._signal.update(value)
        return value, avg, value - avg


@dataclass
class IncrementalRSI:
    """Wilder RSI register: O(1) state (prev value + two smoothed
    averages). Wilder alpha = 1/n == seeded EMA(2n-1), the identity
    the batch form (operators/indicators.rsi) uses — same recurrence,
    same 0/0 → 50 and /0 → 100 edge contract, exactly equal output."""

    n: int = 14
    _prev: float | None = None
    _ag: float = 0.0
    _al: float = 0.0

    def update(self, x: float) -> float:
        x = float(x)
        prev = x if self._prev is None else self._prev
        gain, loss = max(x - prev, 0.0), max(prev - x, 0.0)
        a = 1.0 / self.n  # == 2 / ((2n - 1) + 1)
        self._ag = self._ag * (1 - a) + gain * a
        self._al = self._al * (1 - a) + loss * a
        self._prev = x
        if self._ag == 0.0 and self._al == 0.0:
            return 50.0
        if self._al == 0.0:
            return 100.0
        return 100.0 - 100.0 / (1.0 + self._ag / self._al)


@dataclass
class IncrementalCUSUM:
    """Two-sided CUSUM register (Page 1954): O(1) state — the clamped
    S+/S- sums. Mirrors the cusum_alerts batch fold exactly (same op
    order), so streaming == batch is an equality, not a tolerance."""

    mu: float
    k: float = 0.5
    h: float = 5.0
    s_hi: float = 0.0
    s_lo: float = 0.0

    def update(self, x: float) -> tuple[float, float, bool]:
        x = float(x)
        self.s_hi = max(0.0, self.s_hi + (x - self.mu - self.k))
        self.s_lo = max(0.0, self.s_lo + (self.mu - self.k - x))
        return self.s_hi, self.s_lo, (self.s_hi > self.h or self.s_lo > self.h)


@dataclass
class IncrementalATR:
    """Wilder ATR register: O(1) state (prev close + smoothed TR).
    Replays operators/indicators.atr_col's fold EXACTLY — including
    the seed step (acc starts at the first TR and still runs through
    acc·(1−a) + tr·a, because tr·(1−a) + tr·a can differ from tr by
    one ulp and the batch fold takes the former path), so streaming
    == batch is an equality, not a tolerance."""

    n: int = 14
    _prev_close: float | None = None
    _acc: float | None = None

    def update(self, high: float, low: float, close: float) -> tuple[float, float]:
        high, low, close = float(high), float(low), float(close)
        if self._prev_close is None:
            tr = high - low
        else:
            pc = self._prev_close
            tr = max(high - low, abs(high - pc), abs(low - pc))
        if self._acc is None:
            self._acc = tr  # seed = first TR (atr_col contract)
        a = 2.0 / (2.0 * self.n)  # == ema_expr_col alpha for length 2n-1
        self._acc = self._acc * (1 - a) + tr * a
        self._prev_close = close
        return tr, self._acc


@dataclass
class IncrementalOBV:
    """On-balance-volume register: O(1) state (prev close + running
    integer sum). Mirrors operators/indicators.obv_col — the first
    candle and flat closes contribute 0; all-integer, exact."""

    _prev_close: float | None = None
    obv: int = 0

    def update(self, close: float, volume: int) -> int:
        close = float(close)
        if self._prev_close is not None and close != self._prev_close:
            self.obv += int(volume) if close > self._prev_close else -int(volume)
        self._prev_close = close
        return self.obv
