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
