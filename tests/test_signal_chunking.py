"""Regression: a symbol whose micro-batch exceeds the Arrow chunk size
must still process in global time order (the state func receives an
ITERATOR of chunks with arbitrary cross-chunk order), and the slow
batch path must coerce string-coded closes like the fast path."""

import datetime as dt

from tastytrade_sdk_spark.streaming.signal_engine import detect_signals_batch


def _candles(n):
    t0 = dt.datetime(2024, 3, 1, 9, 30)
    rows = []
    px = 100.0
    for i in range(n):
        px += (1.0 if (i // 7) % 2 == 0 else -1.0) * (0.5 + (i % 3) * 0.3)
        rows.append(("SPX", t0 + dt.timedelta(minutes=5 * i), px))
    return rows


def test_streaming_group_larger_than_arrow_chunk_matches_batch(spark):
    import shutil
    import tempfile

    from tastytrade_sdk_spark.streaming.signal_engine import (
        detect_signals_streaming,
    )

    rows = _candles(160)
    schema = "symbol string, time timestamp, close double"
    saved = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    src = tempfile.mkdtemp(prefix="chunk_src_")
    ckpt = tempfile.mkdtemp(prefix="chunk_ckpt_")
    try:
        # force many small Arrow chunks per group within ONE micro-batch
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "16")
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append"
        ).parquet(src)
        stream = spark.readStream.schema(schema).parquet(src)
        q = (
            detect_signals_streaming(stream, hull_length=4)
            .writeStream.outputMode("append")
            .format("memory")
            .queryName("chunked_sigs")
            .option("checkpointLocation", ckpt)
            .start()
        )
        q.processAllAvailable()
        q.stop()
        streamed = [
            (r["start_time"], r["signal_type"], r["direction"])
            for r in spark.sql(
                "select * from chunked_sigs order by start_time"
            ).collect()
        ]
        batch = [
            (r["start_time"], r["signal_type"], r["direction"])
            for r in sorted(
                detect_signals_batch(
                    spark.createDataFrame(rows, schema), hull_length=4
                ).collect(),
                key=lambda r: r["start_time"],
            )
        ]
        assert streamed == batch
        assert len(batch) > 0
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", saved)
        shutil.rmtree(src, ignore_errors=True)
        shutil.rmtree(ckpt, ignore_errors=True)


def test_batch_slow_path_coerces_string_closes(spark):
    rows = _candles(30)
    # duplicate timestamp forces the slow path; string closes + junk
    str_rows = [(s, t, str(c)) for (s, t, c) in rows]
    str_rows.append(("SPX", rows[5][1], "N/A"))  # dup time + junk close
    schema_d = "symbol string, time timestamp, close double"
    schema_s = "symbol string, time timestamp, close string"
    out_s = detect_signals_batch(
        spark.createDataFrame(str_rows, schema_s), hull_length=4
    ).collect()
    # numeric twin WITHOUT the junk row (the NaN is skipped either way):
    # emissions must match instead of the task dying in float("N/A")
    dup_rows = rows + []
    out_d = detect_signals_batch(
        spark.createDataFrame(dup_rows, schema_d), hull_length=4
    ).collect()
    key = lambda r: (r["start_time"], r["signal_type"], r["direction"])  # noqa: E731
    assert sorted(map(key, out_s)) == sorted(map(key, out_d))
