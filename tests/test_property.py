"""Property-based tests (hypothesis) for the two subtlest pieces of
the engine:

1. The Lindley closed form that powers the lifo_entry_credit oracle:
   walking fills newest-first, the close buffer follows
   b_t = max(0, b_{t-1} + d_t), whose closed form is
   b_t = S_t - min(0, min_k S_k). The SQL oracle derives
   consumed/surviving/take from that; here the same derivation is
   checked against the sequential kernel on arbitrary fill sequences.

2. grouped_apply's cross-batch carry: a group whose rows span two
   Arrow batches must still reach the kernel as ONE group. Forced by
   shrinking spark.sql.execution.arrow.maxRecordsPerBatch below the
   group size.
"""

from __future__ import annotations

import datetime as dt
from decimal import Decimal

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from tastytrade_sdk_spark.kernels.lifo import replay_one_symbol

_fill = st.tuples(
    st.sampled_from(["Buy to Open", "Sell to Open", "Buy to Close", "Sell to Close"]),
    st.integers(min_value=1, max_value=5),  # quantity
    st.integers(min_value=100, max_value=99999),  # price cents
)


def _closed_form(fills: list[dict], current_qty: int) -> dict:
    """The oracle's windowed derivation, evaluated in plain Python:
    newest-first prefix sums + Lindley buffer + greedy take."""
    if current_qty == 0:
        return {
            "entry_credit": Decimal("0"),
            "fees": Decimal("0"),
            "weighted_price": None,
            "covered": True,
        }
    ordered = sorted(fills, key=lambda r: r["executed_at"], reverse=True)
    r = abs(current_qty)
    s = 0
    min_prev = 0  # min over S_0..S_{t-1}, S_0 = 0
    v_prev = 0  # cumulative surviving over prior opens
    credit = Decimal("0")
    fees = Decimal("0")
    pq = Decimal("0")
    tq = 0
    for f in ordered:
        qty = int(f["quantity"])
        is_close = f["action"] in ("Buy to Close", "Sell to Close")
        s_prev = s
        s += qty if is_close else -qty
        b_prev = s_prev - min(0, min_prev)
        min_prev = min(min_prev, s)
        if is_close:
            continue
        surviving = qty - min(qty, b_prev)
        take = min(surviving, max(0, r - v_prev))
        v_prev += surviving
        if take > 0:
            frac = Decimal(take) / Decimal(qty)
            sign = Decimal(1) if f["value_effect"] == "Credit" else Decimal(-1)
            credit += Decimal(str(f["value"])) * frac * sign
            fees += abs(
                Decimal(str(f["net_value"])) - Decimal(str(f["value"]))
            ) * frac
            pq += Decimal(str(f["price"])) * take
            tq += take
    covered = v_prev >= r
    if not covered:
        return {
            "entry_credit": None,
            "fees": None,
            "weighted_price": None,
            "covered": False,
        }
    return {
        "entry_credit": credit,
        "fees": fees,
        "weighted_price": (pq / tq) if tq > 0 else None,
        "covered": True,
    }


@given(
    fills=st.lists(_fill, min_size=0, max_size=40),
    current_qty=st.integers(min_value=0, max_value=15),
)
@settings(max_examples=300, deadline=None)
def test_lindley_closed_form_equals_sequential_replay(fills, current_qty):
    t0 = dt.datetime(2024, 1, 1)
    rows = []
    for i, (action, qty, cents) in enumerate(fills):
        price = Decimal(cents) / 100
        value = price * qty
        effect = "Credit" if action.startswith("Sell") else "Debit"
        net = value - Decimal("0.5") if effect == "Credit" else value + Decimal("0.5")
        rows.append(
            {
                "executed_at": t0 + dt.timedelta(minutes=i),
                "action": action,
                "quantity": qty,
                "price": price,
                "value": value,
                "net_value": net,
                "value_effect": effect,
            }
        )
    got = replay_one_symbol(rows, current_qty)
    exp = _closed_form(rows, current_qty)
    assert got["covered"] == exp["covered"]
    for k in ("entry_credit", "fees", "weighted_price"):
        if exp[k] is None:
            assert got[k] is None
        else:
            assert got[k] is not None
            assert abs(got[k] - exp[k]) < Decimal("1e-18")


def test_grouped_apply_carry_across_arrow_batches(spark):
    """Groups spanning Arrow-batch boundaries must arrive whole."""
    from pyspark.sql import types as T

    from tastytrade_sdk_spark.operators.grouped import grouped_apply

    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch", None)
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        # 10 groups x 13 rows >> batch size 7: every group spans batches
        rows = [(f"g{i % 10}", i) for i in range(130)]
        df = spark.createDataFrame(rows, ["k", "v"]).repartition(2)
        schema = T.StructType(
            [
                T.StructField("k", T.StringType()),
                T.StructField("n", T.IntegerType()),
                T.StructField("total", T.LongType()),
            ]
        )

        def kern(pdf):
            return [{"k": pdf["k"].iloc[0], "n": len(pdf), "total": int(pdf["v"].sum())}]

        out = {r["k"]: (r["n"], r["total"]) for r in grouped_apply(df, "k", kern, schema).collect()}
        assert len(out) == 10
        for i in range(10):
            members = [v for g, v in rows if g == f"g{i}"]
            assert out[f"g{i}"] == (len(members), sum(members))

        # records mode: same contract
        def kern_rec(recs):
            return [{"k": recs[0]["k"], "n": len(recs), "total": sum(r["v"] for r in recs)}]

        out2 = {
            r["k"]: (r["n"], r["total"])
            for r in grouped_apply(df, "k", kern_rec, schema, records=True).collect()
        }
        assert out2 == out
    finally:
        if old is None:
            spark.conf.unset("spark.sql.execution.arrow.maxRecordsPerBatch")
        else:
            spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)


# ---------------------------------------------------------------------------
# Exact substring dedup (llmops/substr.py) vs a brute-force reference:
# the window-cover identity (covered char <=> inside a >=L duplicated
# substring) is the operator's correctness core — fuzz it.


def _brute_spans(texts, L):
    """All maximal per-doc ranges of chars covered by a length-L
    window whose content occurs >= 2 times across the corpus."""
    from collections import Counter

    wins = Counter()
    for t in texts.values():
        for i in range(len(t) - L + 1):
            wins[t[i : i + L]] += 1
    out = []
    for d, t in texts.items():
        covered = [False] * len(t)
        for i in range(len(t) - L + 1):
            if wins[t[i : i + L]] >= 2:
                for j in range(i, i + L):
                    covered[j] = True
        i = 0
        while i < len(t):
            if covered[i]:
                j = i
                while j < len(t) and covered[j]:
                    j += 1
                out.append((d, i + 1, j + 1))  # 1-based, exclusive end
                i = j
            else:
                i += 1
    return sorted(out)


@settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    docs=st.lists(
        st.text(alphabet="ab ", min_size=0, max_size=40),
        min_size=1,
        max_size=8,
    ),
    L=st.integers(min_value=3, max_value=7),
)
def test_duplicate_spans_match_bruteforce(spark, docs, L):
    texts = {i: t for i, t in enumerate(docs)}
    df = spark.createDataFrame(
        list(texts.items()), "doc_id long, text string"
    )
    from tastytrade_sdk_spark.llmops.substr import duplicate_spans

    got = sorted(
        (r.doc_id, r.span_start, r.span_end)
        for r in duplicate_spans(df, min_len=L).collect()
    )
    assert got == _brute_spans(texts, L)


# --- r10: the scale-safe ranking machinery -----------------------------------
#
# quality_threshold's two-level binned prefix and global_row_number's
# range-partition + offset reconstruction replaced single-partition
# windows this round; both carry exact-equivalence obligations (the
# k-th smallest rounded value; the total (cols, id) order) that a
# binning/offset bug would violate only on adversarial distributions —
# hypothesis hunts those.


@settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    scores=st.lists(
        st.one_of(
            # hot-bin cluster: many values inside one 3-dp coarse bin
            st.floats(min_value=0.123, max_value=0.1239),
            # full-range spread, incl. the 0.0/1.0 bin edges
            st.sampled_from([0.0, 1.0]),
            st.floats(min_value=0.0, max_value=1.0),
        ),
        min_size=1,
        max_size=120,
    ),
    pct=st.sampled_from([0.1, 0.25, 0.5, 0.75, 0.9, 1.0]),
)
def test_quality_threshold_binned_prefix_is_exact_kth(spark, scores, pct):
    import math

    from pyspark.sql import functions as F

    from tastytrade_sdk_spark.llmops.pipeline import quality_threshold

    rounded = [round(s, 6) for s in scores]
    df = spark.createDataFrame([(v,) for v in rounded], "quality double")
    df = df.select(F.round("quality", 6).alias("quality"))
    got = quality_threshold(df, pct).collect()[0].threshold
    k = math.ceil(pct * len(rounded))
    want = sorted(round(v, 6) for v in rounded)[k - 1]
    assert got == want


# --- r11 (r10 verdict item 7): the two riskiest kernels, driven
# END-TO-END through their distributed operators on randomized
# fixtures. Each hypothesis example packs MANY independent per-key
# cases into one DataFrame so one Spark job verifies dozens of cases —
# ≥200 cases total per property at single-digit example counts.


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    cases=st.lists(
        st.tuples(
            st.lists(_fill, min_size=0, max_size=12),
            st.integers(min_value=0, max_value=8),
        ),
        min_size=26,
        max_size=34,
    )
)
def test_lifo_entry_credits_distributed_matches_closed_form(spark, cases):
    """The DISTRIBUTED operator (grouped_apply + Arrow + decimal
    quantization) must agree with the independent Lindley closed-form
    derivation per symbol, and satisfy the two kernel invariants:
    (a) allocation conservation — a position is covered iff the
    surviving open quantity walked newest-first actually reaches the
    current quantity; (b) entry_credit/fees are None IFF the position
    is under-covered (never a partial number)."""
    from tastytrade_sdk_spark.kernels.lifo import lifo_entry_credits

    t0 = dt.datetime(2024, 1, 1)
    tx_rows, pos_rows, expected = [], [], {}
    for si, (fills, current_qty) in enumerate(cases):
        sym = f"S{si}"
        rows = []
        for i, (action, qty, cents) in enumerate(fills):
            price = Decimal(cents) / 100
            value = price * qty
            effect = "Credit" if action.startswith("Sell") else "Debit"
            net = (
                value - Decimal("0.5")
                if effect == "Credit"
                else value + Decimal("0.5")
            )
            rows.append(
                {
                    "executed_at": t0 + dt.timedelta(minutes=i),
                    "action": action,
                    "quantity": qty,
                    "price": price,
                    "value": value,
                    "net_value": net,
                    "value_effect": effect,
                }
            )
        expected[sym] = _closed_form(rows, current_qty)
        pos_rows.append((sym, current_qty))
        for r in rows:
            tx_rows.append((sym, *[r[k] for k in (
                "executed_at", "action", "quantity", "price", "value",
                "net_value", "value_effect",
            )]))
    tx_schema = (
        "symbol string, executed_at timestamp, action string, "
        "quantity long, price decimal(18,6), value decimal(18,6), "
        "net_value decimal(18,6), value_effect string"
    )
    tx = (
        spark.createDataFrame(tx_rows, tx_schema)
        if tx_rows
        else spark.createDataFrame([], tx_schema)
    )
    pos = spark.createDataFrame(pos_rows, "symbol string, quantity long")
    got = {
        r["symbol"]: r
        for r in lifo_entry_credits(tx, pos).collect()
    }
    assert set(got) == set(expected)
    six = Decimal("0.000001")
    for sym, exp in expected.items():
        g = got[sym]
        assert g["covered"] == exp["covered"], sym
        # invariant (b): numbers present IFF covered (weighted_price
        # additionally None for a zero-quantity position)
        assert (g["entry_credit"] is None) == (not exp["covered"]), sym
        assert (g["fees"] is None) == (not exp["covered"]), sym
        for k in ("entry_credit", "fees", "weighted_price"):
            if exp[k] is None:
                assert g[k] is None, (sym, k)
            else:
                assert g[k] is not None, (sym, k)
                assert abs(g[k] - exp[k].quantize(six)) <= six, (sym, k)


_asof_key_case = st.tuples(
    # left probe times
    st.lists(st.integers(min_value=0, max_value=60), min_size=1, max_size=6),
    # right events: (time, value or None => null-walk skip)
    st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=60),
            st.one_of(st.none(), st.integers(min_value=1, max_value=99)),
        ),
        min_size=0,
        max_size=8,
    ),
)


def _brute_asof(lefts, rights, direction, exact, tol):
    """Reference: per left time, scan all right rows (bisect-equivalent
    on the sorted candidate list), pick the nearest non-null-value row
    on the correct side, break timestamp ties by arrival seq (last
    arrival wins backward, first wins forward), then null the pick if
    it falls outside the tolerance — mirroring the operator's
    select-then-gate contract."""
    out = []
    for tl in lefts:
        best = None  # (t, seq, v)
        for seq, (tr, v) in enumerate(rights):
            if v is None:
                continue
            if direction == "backward":
                ok = tr <= tl if exact else tr < tl
            else:
                ok = tr >= tl if exact else tr > tl
            if not ok:
                continue
            if best is None:
                best = (tr, seq, v)
            elif direction == "backward" and (tr, seq) > (best[0], best[1]):
                best = (tr, seq, v)
            elif direction == "forward" and (
                tr < best[0] or (tr == best[0] and seq < best[1])
            ):
                best = (tr, seq, v)
        if best is not None and tol is not None:
            dist = tl - best[0] if direction == "backward" else best[0] - tl
            if dist > tol:
                best = None
        out.append(best[2] if best is not None else None)
    return out


@settings(
    deadline=None,
    max_examples=8,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(cases=st.lists(_asof_key_case, min_size=26, max_size=34))
def test_asof_join_matches_bruteforce_bisect(spark, cases):
    """asof_join (union-tag single-shuffle plan) vs the brute-force
    reference on random event sets — backward inclusive, backward
    strict + tolerance, and forward, all keys in one frame per run."""
    from pyspark.sql import functions as F

    from tastytrade_sdk_spark.operators.asof import asof_join

    left_rows, right_rows = [], []
    for ki, (lefts, rights) in enumerate(cases):
        key = f"K{ki}"
        for li, tl in enumerate(lefts):
            left_rows.append((key, li, tl))
        for seq, (tr, v) in enumerate(rights):
            right_rows.append((key, tr, seq, v))
    left = spark.createDataFrame(left_rows, "k string, lid long, t long")
    right = (
        spark.createDataFrame(
            right_rows, "k string, rt long, seq long, px long"
        )
        if right_rows
        else spark.createDataFrame([], "k string, rt long, seq long, px long")
    )

    def run(direction, exact, tol):
        got = asof_join(
            left,
            right,
            on=["k"],
            left_time="t",
            right_time="rt",
            value_cols=["px"],
            right_order="seq",
            direction=direction,
            allow_exact_match=exact,
            tolerance=None if tol is None else F.lit(tol),
        ).collect()
        by_key: dict = {}
        for r in got:
            by_key.setdefault(r["k"], {})[r["lid"]] = r["px"]
        for ki, (lefts, rights) in enumerate(cases):
            want = _brute_asof(lefts, rights, direction, exact, tol)
            for li in range(len(lefts)):
                assert by_key[f"K{ki}"][li] == want[li], (
                    direction, exact, tol, ki, li,
                )

    run("backward", True, None)
    run("backward", False, 5)
    run("forward", True, None)


@settings(
    deadline=None,
    max_examples=10,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    vals=st.lists(
        # tiny value domain forces heavy ties: the range partitioner
        # must split same-value runs by the id tiebreaker
        st.integers(min_value=0, max_value=3),
        min_size=1,
        max_size=150,
    ),
    parts=st.integers(min_value=1, max_value=9),
)
def test_global_row_number_is_total_order_enumeration(spark, vals, parts):
    from tastytrade_sdk_spark.operators.scale import global_row_number

    rows = [(i, float(v)) for i, v in enumerate(vals)]
    df = spark.createDataFrame(rows, "doc_id long, quality double")
    out = {
        r["doc_id"]: r["__rn"]
        for r in global_row_number(
            df, ["quality", "doc_id"], num_partitions=parts
        ).collect()
    }
    want = {
        doc_id: rn
        for rn, (quality, doc_id) in enumerate(
            sorted((q, i) for i, q in rows), start=1
        )
    }
    assert out == want
