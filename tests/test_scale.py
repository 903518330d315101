"""Scale-toolkit tests: salted aggregation/join equivalence and the
exchange-free bucketed join plan."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.operators.scale import (
    read_bucketed,
    salted_groupby,
    salted_join,
    write_bucketed,
)


def _skewed(spark):
    # 90% of rows on one hot key
    rows = [("HOT" if i % 10 else f"k{i}", i % 7, float(i)) for i in range(5000)]
    return spark.createDataFrame(rows, ["sym", "grp", "v"])


def test_salted_groupby_equals_plain(spark):
    df = _skewed(spark)
    plain = {
        (r["sym"],): (r["s"], r["c"], r["mn"], r["mx"], r["a"])
        for r in df.groupBy("sym")
        .agg(
            F.sum("v").alias("s"),
            F.count("v").alias("c"),
            F.min("v").alias("mn"),
            F.max("v").alias("mx"),
            F.avg("v").alias("a"),
        )
        .collect()
    }
    salted = {
        (r["sym"],): (r["s"], r["c"], r["mn"], r["mx"], r["a"])
        for r in salted_groupby(
            df,
            ["sym"],
            {
                "s": ("sum", "v"),
                "c": ("count", "v"),
                "mn": ("min", "v"),
                "mx": ("max", "v"),
                "a": ("avg", "v"),
            },
            n_salts=8,
        ).collect()
    }
    assert set(plain) == set(salted)
    for k in plain:
        p, s = plain[k], salted[k]
        assert p[:4] == s[:4]
        assert abs(p[4] - s[4]) < 1e-9


def test_salted_groupby_rejects_non_algebraic(spark):
    df = _skewed(spark)
    with pytest.raises(ValueError):
        salted_groupby(df, ["sym"], {"x": ("median", "v")})


def test_salted_join_equals_plain(spark):
    fact = _skewed(spark)
    dim = spark.createDataFrame(
        [("HOT", 1.5)] + [(f"k{i}", float(i)) for i in range(5000)],
        ["sym", "weight"],
    )
    plain = sorted(
        (r["sym"], r["v"], r["weight"])
        for r in fact.join(dim, "sym").collect()
    )
    salted = sorted(
        (r["sym"], r["v"], r["weight"])
        for r in salted_join(fact, dim, "sym", n_salts=8).collect()
    )
    assert plain == salted


def test_bucketed_join_has_no_exchange(spark):
    left = spark.createDataFrame(
        [(i % 50, float(i)) for i in range(2000)], ["k", "v"]
    )
    right = spark.createDataFrame(
        [(i, f"dim{i}") for i in range(50)], ["k", "name"]
    )
    write_bucketed(left, "t_scale_left", "k", n_buckets=8)
    write_bucketed(right, "t_scale_right", "k", n_buckets=8)
    # force the shuffle-join path so bucketing is what saves the exchange
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        j = read_bucketed(spark, "t_scale_left").join(
            read_bucketed(spark, "t_scale_right"), "k"
        )
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        assert j.count() == 2000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "64MB")
        spark.sql("DROP TABLE IF EXISTS t_scale_left")
        spark.sql("DROP TABLE IF EXISTS t_scale_right")
