"""Incremental view maintenance (operators/ivm.py): the counting
algorithm's contract — maintained view == full recompute — plus the
tombstone rule and the broadcast-merge plan shape."""

import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.operators.ivm import delta_apply_agg, delta_aggregate


@pytest.fixture(scope="module")
def frames(spark):
    # base snapshot: keys a (2 rows), b (1 row), c (1 row, null measure)
    base = spark.createDataFrame(
        [("a", 10.0), ("a", 20.0), ("b", 5.0), ("c", None)],
        "k string, v double",
    )
    stored = base.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    # delta: insert into a, delete b entirely (tombstone), brand-new d,
    # and a null-measure insert into c
    delta = spark.createDataFrame(
        [
            ("a", 5.0, 1),
            ("b", 5.0, -1),
            ("d", 7.0, 1),
            ("d", 3.0, 1),
            ("c", None, 1),
        ],
        "k string, v double, sign int",
    )
    return base, stored, delta


def test_maintained_equals_recompute(spark, frames):
    base, stored, delta = frames
    maintained = delta_apply_agg(stored, delta, ["k"], ["v"])
    # full recompute over (base minus deletes) plus inserts
    final_rows = base.unionByName(
        delta.filter(F.col("sign") == 1).select("k", "v")
    ).join(
        delta.filter(F.col("sign") == -1).select("k", "v"),
        ["k", "v"],
        "left_anti",
    )
    recomputed = final_rows.groupBy("k").agg(
        F.count(F.lit(1)).alias("n_rows"), F.sum("v").alias("sum_v")
    )
    got = {r["k"]: (r["n_rows"], r["sum_v"]) for r in maintained.collect()}
    want = {r["k"]: (r["n_rows"], r["sum_v"]) for r in recomputed.collect()}
    assert got == want
    # spot values: a grew, d is new, c keeps a NULL sum with 2 rows
    assert got["a"] == (3, 35.0)
    assert got["d"] == (2, 10.0)
    assert got["c"][0] == 2 and got["c"][1] is None


def test_tombstone_drops_zero_count_group(spark, frames):
    _, stored, delta = frames
    maintained = delta_apply_agg(stored, delta, ["k"], ["v"])
    assert maintained.filter(F.col("k") == "b").count() == 0


def test_delta_aggregate_signs(spark, frames):
    _, _, delta = frames
    dv = {
        r["k"]: (r["n_rows"], r["sum_v"])
        for r in delta_aggregate(delta, ["k"], ["v"]).collect()
    }
    assert dv["a"] == (1, 5.0)
    assert dv["b"] == (-1, -5.0)
    assert dv["d"] == (2, 10.0)
    assert dv["c"][0] == 1 and dv["c"][1] is None


def test_integer_sums_stay_integer(spark):
    """Scaled-grid (cents) measures must not be silently promoted to
    double by the merge's coalesce literal."""
    stored = spark.createDataFrame(
        [("a", 2, 1000)], "k string, n_rows long, sum_c long"
    )
    delta = spark.createDataFrame(
        [("a", 25, 1)], "k string, c long, sign int"
    )
    out = delta_apply_agg(stored, delta, ["k"], ["c"], count_col="n_rows")
    # stored names its sum 'sum_c' to match delta_aggregate's output
    assert dict(out.dtypes)["sum_c"] == "bigint"
    assert out.collect()[0]["sum_c"] == 1025


def test_merge_is_broadcast_no_stored_shuffle(spark, frames):
    """The stored view must flow through the merge without an
    exchange: the delta aggregate broadcasts."""
    _, stored, delta = frames
    stored = stored.localCheckpoint(eager=True)  # freeze lineage
    maintained = delta_apply_agg(stored, delta, ["k"], ["v"])
    maintained.collect()
    plan = maintained._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan


def test_empty_delta_is_identity(spark, frames):
    _, stored, delta = frames
    empty = delta.filter("1 = 0")
    out = delta_apply_agg(stored, empty, ["k"], ["v"])
    got = sorted(map(tuple, out.collect()))
    want = sorted(map(tuple, stored.collect()))
    assert got == want
