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
