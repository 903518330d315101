"""COMPACT wire-format decode (SURVEY S2) — schema-projected
positional parse.

Reference semantics (src/tastytrade/messaging/handlers.py:156-203):
the feed delivers a flat value array holding N back-to-back events of
one type; the field list comes from the event schema; decoding chunks
the array by field count and zips each chunk with the field names.
Incomplete trailing chunks are dropped (logged), never fatal —
invalid events must not crash the pipeline (handlers.py:187-195).

Spark form: pure Column expressions — slice the array per chunk index
(`transform(sequence(...), i -> slice(...))`), explode, then
positional `element_at` + cast per StructField. Whole-stage codegen,
no UDF; corrupt (short) chunks land in a `_corrupt` flag column
instead of being silently lost.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def decode_compact(
    df: DataFrame,
    array_col: str,
    event_schema: T.StructType,
    keep_cols: list[str] | None = None,
    corrupt_col: str | None = "_corrupt",
) -> DataFrame:
    """Decode a flat string-array column into typed event rows.

    One input row may carry multiple events (chunked by field count);
    output has one row per decoded event. A trailing partial chunk
    yields a row with ``corrupt_col=True`` and NULL fields (drop it or
    route it to a dead-letter sink).
    """
    nf = len(event_schema.fields)
    arr = F.col(array_col)
    n_chunks = F.ceil(F.size(arr) / nf).cast("int")
    # sequence(0, -1) is a DESCENDING [0, -1] in Spark, so an empty
    # payload would explode into two phantom corrupt rows; the
    # reference decodes zero events from an empty array
    # (handlers.py:156-203), so guard the index build on size > 0
    idx = F.when(n_chunks > 0, F.sequence(F.lit(0), n_chunks - 1)).otherwise(
        F.array().cast("array<int>")
    )
    chunks = F.transform(idx, lambda i: F.slice(arr, i * nf + 1, nf))
    keep = keep_cols or []
    exploded = df.select(*keep, F.explode(chunks).alias("__chunk"))

    cols: list[Column] = []
    for pos, field in enumerate(event_schema.fields, start=1):
        # try_element_at: short chunks yield NULL fields (ANSI
        # element_at would abort the job — the opposite of the
        # never-crash boundary contract)
        raw = F.try_element_at(F.col("__chunk"), F.lit(pos))
        # try_cast: malformed values -> NULL (invalid events are
        # skipped-with-warning in the reference, handlers.py:187-195,
        # never a pipeline crash)
        cols.append(raw.try_cast(field.dataType).alias(field.name))
    out = exploded.select(
        *keep, *cols, (F.size("__chunk") < nf).alias("__short")
    )
    if corrupt_col:
        out = out.withColumnRenamed("__short", corrupt_col)
    else:
        out = out.filter(~F.col("__short")).drop("__short")
    return out


def parse_json_events(
    df: DataFrame,
    json_col: str,
    event_schema: T.StructType,
    keep_cols: list[str] | None = None,
) -> DataFrame:
    """Redis-boundary JSON parse (S5): ``from_json`` in PERMISSIVE
    spirit — unparseable rows give NULL fields rather than failing."""
    keep = keep_cols or []
    parsed = F.from_json(F.col(json_col), event_schema)
    return df.select(
        *keep, *[parsed[f.name].alias(f.name) for f in event_schema.fields]
    )
