"""Multi-leg option strategy classification (SURVEY §2.10).

Greedy combinatorial pattern matcher re-expressed from the reference
(src/tastytrade/analytics/strategies/patterns.py:48-704,
classifier.py:104-163). Semantics preserved exactly — matcher priority
order, greedy leg consumption, combination order — but decomposed
differently: the iron-family and butterfly-family matchers here are
single parameterized helpers instead of four near-identical functions.

Deterministic by construction: legs are processed in input order
(pass an ordered frame), combinations() follows that order, and the
matcher list is fixed. Runs per-underlying via applyInPandas — groups
are position portfolios (dozens of rows), so the O(C(n,4)) scan is
trivial per group and parallelism is per-underlying.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from decimal import Decimal
from itertools import combinations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

STOCK_TYPES = {"Equity", "Future", "Cryptocurrency"}


@dataclass(frozen=True)
class Leg:
    symbol: str
    underlying: str
    instrument_type: str
    signed_quantity: float
    option_type: str | None = None  # 'C'/'P'
    strike: Decimal | None = None
    expiration: object | None = None  # datetime.date
    # derived predicates cached as real fields: the combinatorial scan
    # reads them O(C(n,4)) times per group, where property-call
    # overhead dominated the whole kernel
    is_long: bool = field(init=False)
    is_short: bool = field(init=False)
    is_option: bool = field(init=False)
    is_call: bool = field(init=False)
    is_put: bool = field(init=False)
    is_stock: bool = field(init=False)
    abs_quantity: float = field(init=False)

    def __post_init__(self):
        s = object.__setattr__
        s(self, "is_long", self.signed_quantity > 0)
        s(self, "is_short", self.signed_quantity < 0)
        is_option = self.option_type in ("C", "P")
        s(self, "is_option", is_option)
        s(self, "is_call", self.option_type == "C")
        s(self, "is_put", self.option_type == "P")
        s(self, "is_stock", not is_option and self.instrument_type in STOCK_TYPES)
        s(self, "abs_quantity", abs(self.signed_quantity))


def _same_exp(legs) -> bool:
    # == one distinct non-None expiration (all-None -> False), without
    # allocating a set per combination
    first = None
    for l in legs:
        e = l.expiration
        if e is None:
            continue
        if first is None:
            first = e
        elif e != first:
            return False
    return first is not None


def _same_qty(legs) -> bool:
    it = iter(legs)
    q = next(it, None)
    if q is None:
        return False
    q = q.abs_quantity
    for l in it:
        if l.abs_quantity != q:
            return False
    return True


def _split_pc(combo):
    puts = sorted((l for l in combo if l.is_put), key=lambda x: x.strike or 0)
    calls = sorted((l for l in combo if l.is_call), key=lambda x: x.strike or 0)
    return puts, calls


def _match_iron_family(legs, want: str):
    """Iron condor / iron butterfly / iron BWB share one skeleton:
    4 options, same exp+qty, long-low-put/short-high-put/
    short-low-call/long-high-call; they differ only in the strike
    relation (patterns.py:48-135,201-246)."""
    options = [l for l in legs if l.is_option]
    if len(options) < 4:
        return None
    for combo in combinations(options, 4):
        a, b, c, d = combo
        # cheap order-independent prefilters before any allocation;
        # the combination scan order (and thus greedy consumption) is
        # identical to the reference. Inlined qty first: 3 float
        # compares with ~4% pass rate kill most combos outright.
        q = a.abs_quantity
        if b.abs_quantity != q or c.abs_quantity != q or d.abs_quantity != q:
            continue
        if a.is_put + b.is_put + c.is_put + d.is_put != 2:
            continue
        if not _same_exp(combo):
            continue
        puts, calls = _split_pc(combo)
        if not (puts[0].is_long and puts[1].is_short and calls[0].is_short and calls[1].is_long):
            continue
        combo = list(combo)
        if want == "condor":
            # the reference condor matcher only needs the two INNER
            # strikes (short put / short call) non-null — a None outer
            # wing still classifies (patterns.py:48-135); requiring all
            # four would change greedy consumption for that group
            if puts[1].strike is None or calls[0].strike is None:
                continue
            if puts[1].strike < calls[0].strike:
                return "Iron Condor", combo
        else:
            if any(l.strike is None for l in combo):
                continue
            if puts[1].strike != calls[0].strike:
                continue
            put_w = puts[1].strike - puts[0].strike
            call_w = calls[1].strike - calls[0].strike
            if want == "butterfly" and put_w == call_w:
                return "Iron Butterfly", combo
            if want == "bwb" and put_w != call_w:
                return "Iron Broken Fly", combo
    return None


def _match_butterfly_family(legs, opt_type: str | None, broken: bool):
    """1:2:1 butterflies (patterns.py:137-199,248-279): 3 same-type
    options, same exp, long-short2x-long; equal wing spacing for the
    regular fly, unequal for the broken wing. opt_type None => try
    calls then puts (BWB definition)."""
    for ot in ([opt_type] if opt_type else ["C", "P"]):
        options = [l for l in legs if l.is_option and l.option_type == ot]
        if len(options) < 3:
            continue
        for combo in combinations(options, 3):
            trio = sorted(combo, key=lambda x: x.strike or 0)
            if not _same_exp(trio):
                continue
            low, mid, high = trio
            if any(l.strike is None for l in trio):
                continue
            equal_spacing = (mid.strike - low.strike) == (high.strike - mid.strike)
            if broken == equal_spacing:
                continue
            if (
                low.is_long
                and mid.is_short
                and high.is_long
                and low.abs_quantity == high.abs_quantity
                and mid.abs_quantity == 2 * low.abs_quantity
            ):
                if broken:
                    return "Broken Fly", trio
                return ("Call Butterfly" if ot == "C" else "Put Butterfly"), trio
    return None


def _match_covered_jade_lizard(legs):
    stocks = [l for l in legs if l.is_stock and l.is_long]
    options = [l for l in legs if l.is_option]
    if not stocks or len(options) < 3:
        return None
    for combo in combinations(options, 3):
        combo = list(combo)
        if not _same_exp(combo):
            continue
        sp = [l for l in combo if l.is_put and l.is_short]
        sc = [l for l in combo if l.is_call and l.is_short]
        lc = [l for l in combo if l.is_call and l.is_long]
        if len(sp) == 1 == len(sc) == len(lc):
            if sc[0].strike is not None and lc[0].strike is not None and sc[0].strike < lc[0].strike:
                return "Covered Jade Lizard", [stocks[0]] + combo
    return None


def _match_big_lizard(legs):
    options = [l for l in legs if l.is_option]
    if len(options) < 3:
        return None
    for combo in combinations(options, 3):
        combo = list(combo)
        if not _same_exp(combo):
            continue
        sc = [l for l in combo if l.is_call and l.is_short]
        sp = [l for l in combo if l.is_put and l.is_short]
        lc = [l for l in combo if l.is_call and l.is_long]
        if len(sc) == 1 == len(sp) == len(lc):
            if sc[0].strike != sp[0].strike:
                continue
            if lc[0].strike is not None and sc[0].strike is not None and lc[0].strike > sc[0].strike:
                return "Big Lizard", combo
    return None


def _match_jade_lizard(legs):
    options = [l for l in legs if l.is_option]
    if len(options) < 3:
        return None
    for combo in combinations(options, 3):
        combo = list(combo)
        if not _same_exp(combo) or not _same_qty(combo):
            continue
        sp = [l for l in combo if l.is_put and l.is_short]
        sc = [l for l in combo if l.is_call and l.is_short]
        lc = [l for l in combo if l.is_call and l.is_long]
        lp = [l for l in combo if l.is_put and l.is_long]
        # variant A: short put + bear call spread
        if len(sp) == 1 == len(sc) == len(lc):
            if sc[0].strike is not None and lc[0].strike is not None and sc[0].strike < lc[0].strike:
                return "Jade Lizard", combo
        # variant B: short call + bull put spread
        if len(sc) == 1 == len(sp) == len(lp):
            if lp[0].strike is not None and sp[0].strike is not None and lp[0].strike < sp[0].strike:
                return "Jade Lizard", combo
    return None


def _match_collar(legs):
    stocks = [l for l in legs if l.is_stock and l.is_long]
    options = [l for l in legs if l.is_option]
    if not stocks or len(options) < 2:
        return None
    for combo in combinations(options, 2):
        combo = list(combo)
        if not _same_exp(combo):
            continue
        lp = [l for l in combo if l.is_put and l.is_long]
        sc = [l for l in combo if l.is_call and l.is_short]
        if len(lp) == 1 == len(sc):
            return "Collar", [stocks[0]] + combo
    return None


def _match_covered_call(legs):
    stocks = [l for l in legs if l.is_stock and l.is_long]
    scs = [l for l in legs if l.is_option and l.is_call and l.is_short]
    if stocks and scs:
        return "Covered Call", [stocks[0], scs[0]]
    return None


def _match_protective_put(legs):
    stocks = [l for l in legs if l.is_stock and l.is_long]
    lps = [l for l in legs if l.is_option and l.is_put and l.is_long]
    if stocks and lps:
        return "Protective Put", [stocks[0], lps[0]]
    return None


def _match_vertical(legs):
    options = [l for l in legs if l.is_option]
    for a, b in combinations(options, 2):
        if (
            a.option_type != b.option_type
            or a.expiration != b.expiration
            or a.expiration is None
            or a.strike == b.strike
            or a.strike is None
            or b.strike is None
            or a.abs_quantity != b.abs_quantity
        ):
            continue
        low, high = (a, b) if a.strike < b.strike else (b, a)
        if a.is_call:
            if low.is_long and high.is_short:
                return "Bull Call Spread", [low, high]
            if low.is_short and high.is_long:
                return "Bear Call Spread", [low, high]
        else:
            if low.is_long and high.is_short:
                return "Bear Put Spread", [low, high]
            if low.is_short and high.is_long:
                return "Bull Put Spread", [low, high]
    return None


def _match_ratio(legs):
    options = [l for l in legs if l.is_option]
    for a, b in combinations(options, 2):
        if (
            a.option_type != b.option_type
            or a.expiration != b.expiration
            or a.expiration is None
            or a.strike == b.strike
            or a.strike is None
            or b.strike is None
            or a.abs_quantity == b.abs_quantity
        ):
            continue
        if (a.is_long and b.is_short) or (a.is_short and b.is_long):
            return "Ratio Spread", [a, b]
    return None


def _match_pair_diff_type(legs, want: str):
    """Straddle / strangle / synthetic share the call+put same-exp
    skeleton (patterns.py:517-604); dispatch on strike/direction.

    ``want`` selects which family this scan is FOR: the reference runs
    three independent full scans (patterns.py match_straddle /
    match_strangle / match_synthetic), so a strangle pair earlier in
    combination order must not shadow a straddle pair later in the
    list — each wrapper keeps scanning until a pair of ITS kind."""
    options = [l for l in legs if l.is_option]
    for a, b in combinations(options, 2):
        if (
            a.option_type == b.option_type
            or a.expiration != b.expiration
            or a.expiration is None
            or a.abs_quantity != b.abs_quantity
        ):
            continue
        same_strike = a.strike == b.strike and a.strike is not None
        same_dir = a.is_long == b.is_long
        if same_strike and same_dir:
            kind = ("Long Straddle" if a.is_long else "Short Straddle"), [a, b]
            fam = "Straddle"
        elif (
            not same_strike
            and a.strike is not None
            and b.strike is not None
            and same_dir
        ):
            kind = ("Long Strangle" if a.is_long else "Short Strangle"), [a, b]
            fam = "Strangle"
        elif same_strike and not same_dir:
            call = a if a.is_call else b
            put = b if a.is_call else a
            if call.is_long and put.is_short:
                kind = "Synthetic Long", [a, b]
            else:
                kind = "Synthetic Short", [a, b]
            fam = "Synthetic"
        else:
            continue
        if fam == want:
            return kind
    return None


def _match_straddle(legs):
    return _match_pair_diff_type(legs, "Straddle")


def _match_strangle(legs):
    return _match_pair_diff_type(legs, "Strangle")


def _match_synthetic(legs):
    return _match_pair_diff_type(legs, "Synthetic")


def _match_calendar(legs):
    options = [l for l in legs if l.is_option]
    for a, b in combinations(options, 2):
        if (
            a.option_type == b.option_type
            and a.strike == b.strike
            and a.strike is not None
            and a.expiration != b.expiration
            and a.expiration is not None
            and b.expiration is not None
            and a.abs_quantity == b.abs_quantity
        ):
            return "Calendar Spread", [a, b]
    return None


def _match_diagonal(legs):
    options = [l for l in legs if l.is_option]
    for a, b in combinations(options, 2):
        if (
            a.option_type == b.option_type
            and a.strike != b.strike
            and a.strike is not None
            and b.strike is not None
            and a.expiration != b.expiration
            and a.expiration is not None
            and b.expiration is not None
            and a.abs_quantity == b.abs_quantity
        ):
            return "Diagonal Spread", [a, b]
    return None


def _single_leg_type(leg: Leg) -> str:
    if leg.instrument_type == "Equity" and not leg.is_option:
        return "Long Stock" if leg.is_long else "Short Stock"
    if leg.instrument_type == "Future" and not leg.is_option:
        return "Long Future" if leg.is_long else "Short Future"
    if leg.instrument_type == "Cryptocurrency" and not leg.is_option:
        return "Long Crypto" if leg.is_long else "Short Crypto"
    if leg.is_call:
        return "Long Call" if leg.is_long else "Naked Call"
    if leg.is_put:
        return "Long Put" if leg.is_long else "Naked Put"
    return "Custom"


# Greedy priority order — mirrors patterns.py:678-704 exactly. The
# paired int is the matcher's STRUCTURAL minimum group size (4 options
# for the iron family, stock+3 for the covered lizard, ...): a matcher
# can never match a group smaller than its skeleton, so classify_group
# skips it outright — for the dominant 1-2 leg portfolios this removes
# most of the 19-matcher scan without touching match semantics.
MATCHERS = [
    (lambda legs: _match_iron_family(legs, "condor"), 4),
    (lambda legs: _match_iron_family(legs, "butterfly"), 4),
    (lambda legs: _match_iron_family(legs, "bwb"), 4),
    (_match_covered_jade_lizard, 4),
    (_match_big_lizard, 3),
    (lambda legs: _match_butterfly_family(legs, "C", broken=False), 3),
    (lambda legs: _match_butterfly_family(legs, "P", broken=False), 3),
    (lambda legs: _match_butterfly_family(legs, None, broken=True), 3),
    (_match_jade_lizard, 3),
    (_match_collar, 3),
    (_match_covered_call, 2),
    (_match_protective_put, 2),
    (_match_vertical, 2),
    (_match_ratio, 2),
    (_match_straddle, 2),
    (_match_strangle, 2),
    (_match_synthetic, 2),
    (_match_calendar, 2),
    (_match_diagonal, 2),
]


def classify_group(legs: list[Leg]) -> list[tuple[str, list[Leg]]]:
    """Greedy classification of one underlying's legs: each matcher
    repeats until it stops matching, consuming legs; leftovers become
    single-leg strategies (classifier.py:128-163)."""
    remaining = list(legs)
    out: list[tuple[str, list[Leg]]] = []
    for matcher, min_n in MATCHERS:
        while len(remaining) >= min_n:
            res = matcher(remaining)
            if res is None:
                break
            name, matched = res
            out.append((name, matched))
            matched_ids = {id(m) for m in matched}
            remaining = [l for l in remaining if id(l) not in matched_ids]
    for leg in remaining:
        out.append((_single_leg_type(leg), [leg]))
    return out


RESULT_SCHEMA = T.StructType(
    [
        T.StructField("underlying", T.StringType()),
        T.StructField("strategy_id", T.IntegerType()),
        T.StructField("strategy_type", T.StringType()),
        T.StructField("n_legs", T.IntegerType()),
        T.StructField("leg_symbols", T.ArrayType(T.StringType())),
    ]
)


def classify_strategies(
    legs_df: DataFrame,
    underlying_col: str = "underlying",
    order_col: str = "symbol",
) -> DataFrame:
    """Spark entry: one row per detected strategy per underlying.

    ``legs_df`` columns: symbol, underlying, instrument_type,
    signed_quantity, option_type, strike, expiration. ``order_col``
    fixes the leg processing order (greedy matching is order-dependent,
    so determinism requires an explicit order).
    """
    import pandas as pd

    def kernel(recs: list[dict]) -> list[dict]:
        recs = sorted(recs, key=lambda r: r[order_col])  # stable, as before
        legs = [
            Leg(
                symbol=r["symbol"],
                underlying=r[underlying_col],
                instrument_type=r["instrument_type"],
                signed_quantity=float(r["signed_quantity"]),
                option_type=(
                    r["option_type"] if isinstance(r["option_type"], str) else None
                ),
                strike=(
                    Decimal(str(r["strike"])) if pd.notna(r["strike"]) else None
                ),
                expiration=(
                    r["expiration"] if pd.notna(r["expiration"]) else None
                ),
            )
            for r in recs
        ]
        rows = []
        for i, (name, matched) in enumerate(classify_group(legs)):
            rows.append(
                {
                    "underlying": legs[0].underlying if legs else None,
                    "strategy_id": i,
                    "strategy_type": name,
                    "n_legs": len(matched),
                    "leg_symbols": [m.symbol for m in matched],
                }
            )
        return rows

    from tastytrade_sdk_spark.operators.grouped import grouped_apply

    return grouped_apply(legs_df, underlying_col, kernel, RESULT_SCHEMA, records=True)
