"""Bounded streaming Misra-Gries heavy-hitter store: capacity bound,
share-floor coverage, lower-bound error, replay absorption, epoch
regression."""

import collections
import random

import pytest

from tastytrade_sdk_spark.streaming.heavy_stream import (
    mg_store_batch,
    read_mg_store,
)


def _batches(rng, n_batches=4, rows_per=800):
    """Zipf-ish batches: 2 hot keys + a long tail, arrival-shuffled."""
    out = []
    for b in range(n_batches):
        rows = (
            ["hot_a"] * 300 + ["hot_b"] * 150
            + [f"tail{b}_{i}" for i in range(rows_per - 450)]
        )
        rng.shuffle(rows)
        out.append(rows)
    return out


def test_mg_store_bounds_and_coverage(spark, tmp_path):
    store = str(tmp_path / "mg_store")
    rng = random.Random(7)
    batches = _batches(rng)
    truth = collections.Counter()
    capacity = 50
    for epoch, rows in enumerate(batches):
        truth.update(rows)
        df = spark.createDataFrame([(r,) for r in rows], "k string").repartition(4)
        mg_store_batch(df, store, "k", capacity, epoch)

    cands, total = read_mg_store(spark, store, "k")
    got = {r["k"]: r["mg_lb"] for r in cands.collect()}
    n = sum(truth.values())
    assert total == n  # exact denominator survives the merges
    assert len(got) <= capacity  # bounded forever
    # coverage (strict MG bound): every key whose count strictly
    # exceeds n/(capacity+1) is present; a key exactly ON the floor
    # may legally be decremented away
    floor = n / (capacity + 1)
    for key, cnt in truth.items():
        if cnt > floor:
            assert key in got, key
    # MG bound: lb <= true count <= lb + n/(capacity+1)
    for key, lb in got.items():
        assert lb <= truth[key] <= lb + floor + 1, key


def test_mg_store_replay_and_regression(spark, tmp_path):
    store = str(tmp_path / "mg_replay")
    rows = [("a",)] * 30 + [("b",)] * 5
    df = spark.createDataFrame(rows, "k string")
    mg_store_batch(df, store, "k", 10, 0)
    before = dict(
        (r["k"], r["mg_lb"]) for r in read_mg_store(spark, store, "k")[0].collect()
    )
    # replayed epoch is absorbed wholesale (MG merge is NOT idempotent)
    mg_store_batch(df, store, "k", 10, 0)
    after_replay, total = read_mg_store(spark, store, "k")
    assert dict((r["k"], r["mg_lb"]) for r in after_replay.collect()) == before
    assert total == 35
    # epoch regression (checkpoint rebuilt) fails loudly
    mg_store_batch(df, store, "k", 10, 1)
    with pytest.raises(ValueError, match="epoch regression"):
        mg_store_batch(df, store, "k", 10, 0)
    with pytest.raises(ValueError):
        mg_store_batch(df, store, "k", 0, 5)


def test_mg_store_matches_single_pass_summary(spark, tmp_path):
    """Streaming merge over batches keeps the SAME guarantee class as a
    one-shot MG over the concatenated stream (strict-floor key set and
    capacity bound match), and is deterministic across a full replay."""
    rng = random.Random(11)
    batches = _batches(rng, n_batches=3)
    capacity = 30
    s1, s2, one = (str(tmp_path / d) for d in ("s1", "s2", "one"))
    for epoch, rows in enumerate(batches):
        df = spark.createDataFrame([(r,) for r in rows], "k string")
        mg_store_batch(df, s1, "k", capacity, epoch)
        mg_store_batch(df, s2, "k", capacity, epoch)
    all_rows = [r for rows in batches for r in rows]
    mg_store_batch(
        spark.createDataFrame([(r,) for r in all_rows], "k string"),
        one, "k", capacity, 0,
    )
    a = {r["k"]: r["mg_lb"] for r in read_mg_store(spark, s1, "k")[0].collect()}
    b = {r["k"]: r["mg_lb"] for r in read_mg_store(spark, s2, "k")[0].collect()}
    single, n_single = read_mg_store(spark, one, "k")
    sp = {r["k"]: r["mg_lb"] for r in single.collect()}
    assert a == b  # byte-identical across independent replays
    # same guarantee class as the one-shot summary: both are bounded
    # by capacity, agree on the exact total, and both contain every
    # key strictly above the n/(capacity+1) floor
    import collections

    truth = collections.Counter(all_rows)
    n = sum(truth.values())
    assert n_single == n
    assert len(a) <= capacity and len(sp) <= capacity
    floor = n / (capacity + 1)
    heavy = {k for k, c in truth.items() if c > floor}
    assert heavy <= set(a) and heavy <= set(sp)
    # lower bounds stay bounds in both forms
    for k_, lb in {**a, **sp}.items():
        assert lb <= truth[k_]


def test_mg_store_survives_checkpoint_restart(spark, tmp_path):
    """ST7 for the heavy-hitter store: hard-stop mid-stream, restart a
    NEW query on the same checkpoint — no epoch is replayed into the
    non-idempotent merge and no batch is lost, so the final store is
    byte-identical to an uninterrupted run over the same files."""
    from tastytrade_sdk_spark.streaming.heavy_stream import (
        mg_store_sink,
        read_mg_store,
    )

    files = [
        ["a"] * 6 + ["b"] * 3 + ["c"],
        ["a"] * 4 + ["d"] * 5 + ["e"] * 2,
        ["b"] * 7 + ["f"] * 1 + ["a"] * 2,
    ]

    def run(tag, restart_after_first):
        src = str(tmp_path / f"src_{tag}")
        store = str(tmp_path / f"store_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")

        def write(keys):
            spark.createDataFrame(
                [(k,) for k in keys], "k string"
            ).coalesce(1).write.mode("append").parquet(src)

        def start():
            stream = (
                spark.readStream.schema("k string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src)
            )
            return mg_store_sink(stream, store, "k", capacity=3, checkpoint=ckpt).start()

        write(files[0])
        q = start()
        q.processAllAvailable()
        if restart_after_first:
            q.stop()  # crash between micro-batches
            for f in files[1:]:
                write(f)
            q = start()  # NEW query, SAME checkpoint
        else:
            for f in files[1:]:
                write(f)
        q.processAllAvailable()
        q.stop()
        cands, total = read_mg_store(spark, store, "k")
        return {(r["k"], r["mg_lb"]) for r in cands.collect()}, total

    got_r, n_r = run("restart", True)
    got_s, n_s = run("straight", False)
    assert n_r == n_s == sum(len(f) for f in files)
    assert got_r == got_s


def test_never_written_store_reads_empty(spark, tmp_path):
    """All-empty replay: a store no batch ever wrote reads as the
    zero-event state (0 candidates, 0 seen), not a path error."""
    store = str(tmp_path / "never_written")
    df = spark.createDataFrame([], "k string")
    for epoch in range(3):
        mg_store_batch(df, store, "k", 10, epoch)
    cands, total = read_mg_store(spark, store, "k")
    assert total == 0
    assert cands.collect() == []
    assert [f.name for f in cands.schema.fields] == ["k", "mg_lb"]


class TestDecayedTopK:
    def _batch(self, spark, pairs):
        rows = [(k,) for k, n in pairs for _ in range(n)]
        return spark.createDataFrame(rows, "k string")

    def test_decay_and_truncation(self, spark, tmp_path):
        from tastytrade_sdk_spark.streaming.heavy_stream import (
            decayed_topk_batch,
            read_decayed_topk,
        )

        store = str(tmp_path / "store")
        decayed_topk_batch(
            self._batch(spark, [("a", 8), ("b", 4)]), store, "k", 3, 0
        )
        # epoch 1: a,b halve (4, 2); c arrives with 5
        decayed_topk_batch(
            self._batch(spark, [("c", 5)]), store, "k", 3, 1
        )
        got = {r["k"]: r["score"] for r in
               read_decayed_topk(spark, store, "k").collect()}
        assert got == {"a": 4, "b": 2, "c": 5}

    def test_epoch_gap_decays_multiple_halvings(self, spark, tmp_path):
        from tastytrade_sdk_spark.streaming.heavy_stream import (
            decayed_topk_batch,
            read_decayed_topk,
        )

        store = str(tmp_path / "store")
        decayed_topk_batch(
            self._batch(spark, [("a", 16)]), store, "k", 4, 0
        )
        # epoch jumps 0 -> 3: three halvings (16 -> 2)
        decayed_topk_batch(
            self._batch(spark, [("b", 1)]), store, "k", 4, 3
        )
        got = {r["k"]: r["score"] for r in
               read_decayed_topk(spark, store, "k").collect()}
        assert got == {"a": 2, "b": 1}

    def test_capacity_truncates_lowest(self, spark, tmp_path):
        from tastytrade_sdk_spark.streaming.heavy_stream import (
            decayed_topk_batch,
            read_decayed_topk,
        )

        store = str(tmp_path / "store")
        decayed_topk_batch(
            self._batch(spark, [("a", 5), ("b", 4), ("c", 3), ("d", 2)]),
            store, "k", 2, 0,
        )
        got = {r["k"]: r["score"] for r in
               read_decayed_topk(spark, store, "k").collect()}
        assert got == {"a": 5, "b": 4}

    def test_replayed_epoch_absorbed(self, spark, tmp_path):
        from tastytrade_sdk_spark.streaming.heavy_stream import (
            decayed_topk_batch,
            read_decayed_topk,
        )

        store = str(tmp_path / "store")
        decayed_topk_batch(self._batch(spark, [("a", 4)]), store, "k", 4, 0)
        decayed_topk_batch(self._batch(spark, [("a", 4)]), store, "k", 4, 0)
        got = {r["k"]: r["score"] for r in
               read_decayed_topk(spark, store, "k").collect()}
        assert got == {"a": 4}  # redelivery skipped, no decay+re-add

    def test_trailing_empty_batch_still_decays(self, spark, tmp_path):
        from tastytrade_sdk_spark.streaming.heavy_stream import (
            decayed_topk_batch,
            read_decayed_topk,
        )

        store = str(tmp_path / "store")
        decayed_topk_batch(self._batch(spark, [("a", 8), ("b", 1)]),
                           store, "k", 4, 0)
        empty = spark.createDataFrame([], "k string")
        decayed_topk_batch(empty, store, "k", 4, 1)
        got = {r["k"]: r["score"] for r in
               read_decayed_topk(spark, store, "k").collect()}
        # a halves to 4; b floors to 0 and drops — time advanced
        assert got == {"a": 4}
        # and the epoch committed: replaying epoch 1 must be a no-op
        decayed_topk_batch(self._batch(spark, [("c", 9)]), store, "k", 4, 1)
        got = {r["k"]: r["score"] for r in
               read_decayed_topk(spark, store, "k").collect()}
        assert got == {"a": 4}
