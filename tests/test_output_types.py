"""Schema sweep: no declared query may emit a DecimalType output column.

Driver-hash hazard class found in round 4 (CORRECTNESS_r04
pricing_summary): the driver's hasher canonicalizes DECIMAL result
columns differently per engine (float64 on the DuckDB fetch path vs
Python Decimal on Spark's), so byte-identical values still
hash-mismatch. The rule (plans/queries.py module docstring): decimal
arithmetic stays internal; final money columns cast to DOUBLE after
the round on BOTH sides.

Cost note: the DuckDB side is plan-only (rel.types needs no
execution). The Spark side is MOSTLY plan-only, but a few stateful
queries execute by construction when built (corpus_filter_pipeline's
components loop, the mg/band store replays — see their docstrings), so
the sweep runs at sf0.001 where those complete in seconds.
"""

from __future__ import annotations

import duckdb
import pytest

import __spark_entry__ as entrymod
from tastytrade_sdk_spark.sources.tables import TABLE_NAMES
from tools.check_oracle import type_tag

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def duck():
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'")
    yield con
    con.close()


def test_no_decimal_output_columns_spark(spark):
    bad = []
    for name, fn in entrymod.queries().items():
        sdf = fn(spark, SF_DIR)
        for f in sdf.schema.fields:
            if type_tag(f.dataType.simpleString()) == "decimal":
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, (
        "DecimalType output columns (driver-hash hazard, r4 "
        f"pricing_summary): {bad}"
    )


def test_no_decimal_output_columns_oracle(duck):
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            if type_tag(str(typ)) == "decimal":
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "DECIMAL/HUGEINT oracle output columns (driver-hash hazard, "
        f"r4 pricing_summary): {bad}"
    )


def test_no_nested_output_columns_spark(spark):
    """Driver-hash hazard class found in round 11 (CORRECTNESS_r11
    embedding_quantize_int8): the driver's comparator canonicalizes by
    a pandas sort over ALL columns, and pandas cannot factorize
    list/map/struct-typed cells (TypeError: unhashable type 'list') —
    the query errors instead of matching. Declared outputs must be
    scalar-only; vectors are emitted as deterministic string digests
    (comma-joined) on BOTH engines."""
    from pyspark.sql import types as T

    bad = []
    for name, fn in entrymod.queries().items():
        sdf = fn(spark, SF_DIR)
        for f in sdf.schema.fields:
            if isinstance(f.dataType, (T.ArrayType, T.MapType, T.StructType)):
                bad.append(f"{name}.{f.name}: {f.dataType.simpleString()}")
    assert not bad, (
        "nested-typed output columns (driver-comparator hazard, r11 "
        f"embedding_quantize_int8): {bad}"
    )


def test_no_nested_output_columns_oracle(duck):
    bad = []
    for name, sql in entrymod.oracle_sql().items():
        rel = duck.sql(sql)
        for col, typ in zip(rel.columns, rel.types):
            t = str(typ).upper()
            if "[]" in t or t.startswith(("MAP", "STRUCT", "LIST", "UNION")):
                bad.append(f"{name}.{col}: {typ}")
    assert not bad, (
        "nested-typed oracle output columns (driver-comparator hazard, "
        f"r11 embedding_quantize_int8): {bad}"
    )
