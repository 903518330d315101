"""Permanent physical-plan gate over the whole declared suite: no
cartesian products, no row-at-a-time Python UDFs, and every parquet
scan column-pruned (never SELECT *-width) — the 100x-scale smells the
plan audit (tools/audit_plans.py) checks, enforced in CI."""

import re

import pytest

import __spark_entry__ as entrymod

SF = "/root/testdata/sf0.001"

# full column counts of the driver tables; a scan reading every column
# of a wide table means projection pushdown was lost
WIDE_TABLES = {"lineitem": 16, "orders": 9, "part": 9, "customer": 8}


def _plan(spark, df) -> str:
    mode = spark._jvm.org.apache.spark.sql.execution.ExplainMode
    return df._jdf.queryExecution().explainString(mode.fromString("formatted"))


@pytest.fixture(scope="module")
def plans(spark):
    out = {}
    for name, fn in entrymod.queries().items():
        out[name] = _plan(spark, fn(spark, SF))
    return out


def test_no_cartesian_products(plans):
    offenders = [n for n, p in plans.items() if "CartesianProduct" in p]
    assert offenders == []


def test_every_bnlj_build_side_is_bounded(spark):
    """A BroadcastNestedLoopJoin is only acceptable when its build side
    is bounded by construction (no-key aggregate, literal relation, or
    limit — the crossJoin(broadcast(threshold)) pattern). A regression
    to nested-looping a data-sized side must fail here even though
    Spark does not spell it CartesianProduct."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from audit_plans import unbounded_bnljs

    offenders = {}
    for name, fn in entrymod.queries().items():
        bad = unbounded_bnljs(fn(spark, SF))
        if bad:
            offenders[name] = bad
    assert offenders == {}


def test_unbounded_bnlj_detector_catches_real_cartesian(spark):
    """Negative control: a genuine data x data nested-loop join IS
    flagged (so the green assertion above means something)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    from audit_plans import unbounded_bnljs

    from pyspark.sql import functions as F

    a = spark.range(100).withColumnRenamed("id", "a")
    b = spark.range(100).withColumnRenamed("id", "b")
    crossed = a.join(F.broadcast(b), F.col("a") % 7 > F.col("b") % 5)
    assert unbounded_bnljs(crossed), "data-sized BNLJ build side missed"
    # while the sanctioned pattern stays clean
    thr = b.agg(F.max("b").alias("m"))
    ok = a.crossJoin(F.broadcast(thr))
    assert unbounded_bnljs(ok) == []


def test_no_row_at_a_time_python_udfs(plans):
    offenders = [n for n, p in plans.items() if "BatchEvalPython" in p]
    assert offenders == []


def test_scans_are_column_pruned(plans):
    offenders = []
    for name, p in plans.items():
        for schema in re.findall(r"ReadSchema: struct<([^>]*)>", p):
            cols = [c for c in schema.split(",") if c]
            names = {c.split(":")[0].strip() for c in cols}
            for table, width in WIDE_TABLES.items():
                # crude ownership test: the table's key column present
                key = {"lineitem": "l_orderkey", "orders": "o_orderkey",
                       "part": "p_partkey", "customer": "c_custkey"}[table]
                if key in names and len(cols) >= width:
                    offenders.append((name, table, len(cols)))
    assert offenders == []
