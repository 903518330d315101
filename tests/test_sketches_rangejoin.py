"""Sketches (KMV, count-min) and the binned range join.

Property checks that the oracle gate can't express: sketch error
bounds against exact counts, CMS's one-sided guarantee, range-join
equivalence to the naive non-equi plan, and sample stability under
corpus growth.
"""

import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.operators.rangejoin import range_join_binned
from tastytrade_sdk_spark.operators.sketches import cms_build, cms_probe, kmv_distinct


@pytest.fixture(scope="module")
def keyed_rows(spark):
    # 3 groups with known distinct cardinalities 10 / 100 / 1000
    rows = []
    for g, n in (("a", 10), ("b", 100), ("c", 1000)):
        rows += [(g, f"{g}-{i % n}") for i in range(n * 2)]
    return spark.createDataFrame(rows, "g string, v string")


class TestKMV:
    def test_small_groups_exact(self, keyed_rows):
        out = {
            r["g"]: r
            for r in kmv_distinct(keyed_rows, ["g"], "v", k=64).collect()
        }
        assert out["a"]["kmv_estimate"] == 10.0  # below k -> exact
        assert out["a"]["kmv_seen"] == 10

    def test_error_bound(self, keyed_rows):
        out = {
            r["g"]: r["kmv_estimate"]
            for r in kmv_distinct(keyed_rows, ["g"], "v", k=64).collect()
        }
        # ~1/sqrt(64) = 12.5% standard error; allow 3 sigma
        assert abs(out["b"] - 100) / 100 < 0.4
        assert abs(out["c"] - 1000) / 1000 < 0.4

    def test_merge_property(self, spark, keyed_rows):
        """KMV of a union == KMV over the merged k-min sets: estimate from
        the unioned raw data equals estimate from unioning each half's
        top-k hash sets (what per-partition partial merging does)."""
        half1 = keyed_rows.filter(F.col("v").substr(-1, 1).isin("0", "1", "2", "3", "4"))
        half2 = keyed_rows.subtract(half1)
        full = kmv_distinct(keyed_rows, ["g"], "v", k=32)
        # merge halves' sketches by re-running KMV over their kept values
        from pyspark.sql import Window

        h = F.conv(F.substring(F.md5(F.col("v")), 1, 15), 16, 10).cast("long")
        kept = []
        for part in (half1, half2):
            w = Window.partitionBy("g").orderBy(h.asc())
            kept.append(
                part.select("g", "v").distinct()
                .withColumn("__rn", F.row_number().over(w))
                .filter(F.col("__rn") <= 32)
                .drop("__rn")
            )
        merged = kept[0].unionByName(kept[1])
        remerged = kmv_distinct(merged, ["g"], "v", k=32)
        a = {r["g"]: r["kmv_estimate"] for r in full.collect()}
        b = {r["g"]: r["kmv_estimate"] for r in remerged.collect()}
        assert a == b


class TestKMVSetOps:
    @staticmethod
    def _mk(spark):
        # groups with a KNOWN overlap structure: g1 = 0..599,
        # g2 = 300..899 (overlap 300, union 900), g3 disjoint 5000..5099
        rows = (
            [("g1", f"u{i}") for i in range(600)]
            + [("g2", f"u{i}") for i in range(300, 900)]
            + [("g3", f"u{i}") for i in range(5000, 5100)]
        )
        return spark.createDataFrame(rows, "g string, v string")

    def test_overlap_estimates_within_sketch_error(self, spark):
        from tastytrade_sdk_spark.operators.sketches import (
            kmv_pair_overlap,
            kmv_sketch,
        )

        df = self._mk(spark)
        out = {
            (r["group_a"], r["group_b"]): r
            for r in kmv_pair_overlap(
                kmv_sketch(df, ["g"], "v", k=64), "g", k=64
            ).collect()
        }
        r12 = out[("g1", "g2")]
        # ~1/sqrt(64) = 12.5% sigma; allow 3-4 sigma on each figure
        assert abs(r12["union_est"] - 900) / 900 < 0.4
        assert abs(r12["jaccard"] - 300 / 900) < 0.15
        assert abs(r12["inter_est"] - 300) / 300 < 0.6
        # disjoint pairs: zero shared hashes is EXACT, not estimated
        assert out[("g1", "g3")]["jaccard"] == 0.0
        assert out[("g1", "g3")]["inter_est"] == 0.0
        # small union (g2 u g3 = 700) with both sketches saturated
        # still estimates; identical-set sanity via self-union bound
        assert out[("g2", "g3")]["jaccard"] == 0.0

    def test_small_groups_exact_union(self, spark):
        from tastytrade_sdk_spark.operators.sketches import (
            kmv_pair_overlap,
            kmv_sketch,
        )

        rows = [("a", f"x{i}") for i in range(20)] + [
            ("b", f"x{i}") for i in range(10, 40)
        ]
        df = spark.createDataFrame(rows, "g string, v string")
        r = kmv_pair_overlap(
            kmv_sketch(df, ["g"], "v", k=64), "g", k=64
        ).collect()[0]
        # both sketches complete -> merged set is the exact union
        assert r["union_est"] == 40.0
        assert r["jaccard"] == round(10 / 40, 6)
        assert r["inter_est"] == 10.0


class TestCMS:
    def test_never_underestimates_and_tight_here(self, keyed_rows):
        sketch = cms_build(keyed_rows, "v", depth=4, width=2048)
        keys = keyed_rows.select("v").distinct()
        est = {
            r["v"]: r["cms_estimate"]
            for r in cms_probe(sketch, keys, "v", depth=4, width=2048).collect()
        }
        exact = {
            r["v"]: r["cnt"]
            for r in keyed_rows.groupBy("v").agg(F.count("*").alias("cnt")).collect()
        }
        for k, c in exact.items():
            assert est[k] >= c  # CMS one-sided guarantee
        # 1110 distinct keys in 4x2048 cells: collisions possible but
        # the total overestimate must stay small
        assert sum(est.values()) - sum(exact.values()) <= sum(exact.values()) * 0.05

    def test_sketch_size_is_bounded(self, keyed_rows):
        sketch = cms_build(keyed_rows, "v", depth=4, width=64)
        assert sketch.count() <= 4 * 64


class TestRangeJoinBinned:
    @pytest.fixture(scope="class")
    def frames(self, spark):
        import datetime as dt

        t0 = dt.datetime(2024, 1, 1)
        pts = spark.createDataFrame(
            [(i % 3, i, t0 + dt.timedelta(minutes=7 * i)) for i in range(200)],
            "k int, pid int, ts timestamp",
        )
        ivs = spark.createDataFrame(
            [
                (
                    j % 3,
                    j,
                    t0 + dt.timedelta(minutes=45 * j),
                    t0 + dt.timedelta(minutes=45 * j + 33),
                )
                for j in range(30)
            ],
            "k int, iid int, lo timestamp, hi timestamp",
        )
        return pts, ivs

    def _naive(self, pts, ivs):
        p, v = pts.alias("p"), ivs.alias("v")
        return (
            p.join(
                v,
                (F.col("p.k") == F.col("v.k"))
                & (F.col("p.ts") >= F.col("v.lo"))
                & (F.col("p.ts") < F.col("v.hi")),
            )
            .select("p.pid", "v.iid")
        )

    @pytest.mark.parametrize("bin_ms", [60_000, 600_000, 3_600_000])
    def test_equals_naive_inner(self, frames, bin_ms):
        pts, ivs = frames
        got = range_join_binned(
            pts, ivs, on=["k"], point_time="ts", start="lo", end="hi",
            bin_width_ms=bin_ms,
        ).select("pid", "iid")
        expected = self._naive(pts, ivs)
        assert sorted(map(tuple, got.collect())) == sorted(
            map(tuple, expected.collect())
        )

    def test_left_preserves_unmatched_points(self, frames):
        pts, ivs = frames
        got = range_join_binned(
            pts, ivs, on=["k"], point_time="ts", start="lo", end="hi",
            bin_width_ms=600_000, how="left",
        )
        assert got.filter(F.col("iid").isNull()).count() > 0
        assert got.select("pid").distinct().count() == pts.count()

    def test_no_nested_loop_join(self, frames):
        pts, ivs = frames
        plan = range_join_binned(
            pts, ivs, on=["k"], point_time="ts", start="lo", end="hi",
            bin_width_ms=600_000,
        )._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastNestedLoopJoin" not in plan
        assert "CartesianProduct" not in plan


class TestStratifiedSample:
    def test_stable_under_growth(self, spark):
        """Adding documents can only displace sample members with
        smaller-hash rows — the sample never reshuffles wholesale."""
        from tastytrade_sdk_spark.llmops.pipeline import stratified_hash_sample

        base = spark.createDataFrame(
            [(i, "en" if i % 2 else "de") for i in range(200)], "doc_id long, lang string"
        )
        grown = base.unionByName(
            spark.createDataFrame(
                [(i, "en" if i % 2 else "de") for i in range(200, 260)],
                "doc_id long, lang string",
            )
        )
        s1 = {
            (r["lang"], r["doc_id"])
            for r in stratified_hash_sample(base, ["lang"], "doc_id", 10).collect()
        }
        s2 = {
            (r["lang"], r["doc_id"])
            for r in stratified_hash_sample(grown, ["lang"], "doc_id", 10).collect()
        }
        # every departure must be explained by a new smaller-hash arrival:
        # arrivals can only be NEW docs, and they displace 1:1
        departed = s1 - s2
        arrived = s2 - s1
        assert len(departed) == len(arrived)
        assert all(doc_id >= 200 for (_, doc_id) in arrived)

    def test_exact_k_per_stratum(self, spark):
        from tastytrade_sdk_spark.llmops.pipeline import stratified_hash_sample

        df = spark.createDataFrame(
            [(i, ["en", "de", "fr"][i % 3]) for i in range(300)],
            "doc_id long, lang string",
        )
        out = stratified_hash_sample(df, ["lang"], "doc_id", 7)
        counts = {r["lang"]: r["n"] for r in out.groupBy("lang").agg(F.count("*").alias("n")).collect()}
        assert counts == {"en": 7, "de": 7, "fr": 7}


class TestStreamingIntervalJoin:
    def test_equals_batch_range_join(self, spark, tmp_path):
        """Stream-stream interval join produces the same pairs as the
        batch binned range join with end = start + window."""
        import datetime as dt

        from tastytrade_sdk_spark.streaming.streams import streaming_interval_join

        t0 = dt.datetime(2024, 1, 1)
        pts = [(i % 3, i, t0 + dt.timedelta(minutes=7 * i)) for i in range(60)]
        ivs = [(j % 3, j, t0 + dt.timedelta(minutes=45 * j)) for j in range(10)]
        pdir, idir = str(tmp_path / "p"), str(tmp_path / "i")
        spark.createDataFrame(pts, "k int, pid int, ts timestamp").write.parquet(pdir)
        spark.createDataFrame(ivs, "k int, iid int, win_start timestamp").write.parquet(idir)

        ps = spark.readStream.schema("k int, pid int, ts timestamp").parquet(pdir)
        ivs_s = spark.readStream.schema("k int, iid int, win_start timestamp").parquet(idir)
        joined = streaming_interval_join(
            ps, ivs_s, on="k", point_time="ts", start_col="win_start",
            window="30 minutes",
        ).select("pid", "iid")
        q = (
            joined.writeStream.format("memory")
            .queryName("sij")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = sorted(map(tuple, spark.table("sij").collect()))
        finally:
            q.stop()

        batch_p = spark.read.parquet(pdir)
        batch_i = spark.read.parquet(idir).withColumn(
            "win_end", F.col("win_start") + F.expr("INTERVAL 30 MINUTES")
        )
        expected = sorted(
            map(
                tuple,
                range_join_binned(
                    batch_p, batch_i, on=["k"], point_time="ts",
                    start="win_start", end="win_end", bin_width_ms=600_000,
                ).select("pid", "iid").collect(),
            )
        )
        assert got == expected and len(got) > 0


class TestHistogramQuantiles:
    def test_within_bin_resolution_of_exact(self, spark):
        from tastytrade_sdk_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame(
            [("g", float(i)) for i in range(1, 1001)], "g string, v double"
        )
        out = {
            r["q"]: r
            for r in histogram_quantiles(
                df, ["g"], "v", [0.5, 0.9], lo=0.0, hi=1000.0, n_bins=100
            ).collect()
        }
        # bin width 10: estimate is the lower edge of the hit bucket
        assert abs(out[0.5]["hq_value"] - 500.0) <= 10.0
        assert abs(out[0.9]["hq_value"] - 900.0) <= 10.0
        assert out[0.5]["hq_n"] == 1000
        assert out[0.5]["hq_rank"] == 500

    def test_out_of_range_values_clamp(self, spark):
        from tastytrade_sdk_spark.operators.sketches import histogram_quantiles

        df = spark.createDataFrame(
            [("g", v) for v in (-5.0, 0.5, 1.5, 99.0)], "g string, v double"
        )
        out = histogram_quantiles(df, ["g"], "v", [1.0], lo=0.0, hi=10.0, n_bins=10)
        row = out.collect()[0]
        # max (99.0) clamps into the last bucket: lower edge 9.0
        assert row["hq_value"] == 9.0 and row["hq_n"] == 4


class TestSemDeDup:
    def test_drops_exact_duplicates_keeps_min_id(self, spark):
        import numpy as np

        from tastytrade_sdk_spark.llmops.cluster import semdedup_prune
        from tastytrade_sdk_spark.llmops.similarity import hyperplanes

        cents = hyperplanes(4, 8, seed=3)
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        base = [float(x) for x in range(1, 9)]
        rot = [float(x) for x in (8, 7, 6, 5, 4, 3, 2, 1)]
        rows = [
            (1, base), (2, base), (3, [2 * x for x in base]),  # 3 colinear dups
            (10, rot),                                          # distinct
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {r["vec_id"]: r for r in semdedup_prune(df, cents, threshold=0.999).collect()}
        assert out[1]["keep"] is True            # min id of the dup set survives
        assert out[2]["keep"] is False and out[3]["keep"] is False
        assert out[10]["keep"] is True           # no high-cosine cluster-mate
        # colinear rows must land in the same cluster for the test to bite
        assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"]

    def test_threshold_above_one_keeps_everything(self, spark):
        import numpy as np

        from tastytrade_sdk_spark.llmops.cluster import semdedup_prune
        from tastytrade_sdk_spark.llmops.similarity import hyperplanes

        cents = hyperplanes(4, 8, seed=3)
        cents = cents / np.linalg.norm(cents, axis=1, keepdims=True)
        df = spark.createDataFrame(
            [(i, [float(i + j) for j in range(8)]) for i in range(1, 20)],
            "vec_id long, embedding array<float>",
        )
        out = semdedup_prune(df, cents, threshold=1.01)
        assert out.filter(~F.col("keep")).count() == 0
        assert out.count() == 19


class TestSemDeDupScaled:
    def test_lsh_bucket_bits_integer_derivation(self):
        """b = smallest bit count with target*2^b >= n, clamped —
        pure integer math incl. exact power-of-two boundaries."""
        from tastytrade_sdk_spark.llmops.cluster import lsh_bucket_bits

        assert lsh_bucket_bits(0, 64) == 3          # clamp floor
        assert lsh_bucket_bits(512, 64) == 3        # m=8 -> exactly 2^3
        assert lsh_bucket_bits(513, 64) == 4        # one past the boundary
        assert lsh_bucket_bits(2000, 64) == 5       # sf0.1 fixture
        assert lsh_bucket_bits(10**9, 64) == 12     # clamp ceiling
        # bucket-size invariant: target * 2^b >= n whenever unclamped
        for n in (100, 1000, 5000, 40_000, 200_000):
            b = lsh_bucket_bits(n, 64)
            if b < 12:
                assert 64 * (1 << b) >= n

    def test_drops_exact_duplicates_keeps_min_id(self, spark):
        """Colinear duplicates share every sign bit (same bucket) so
        the scaled prune must drop all but the min id, exactly like
        the fixed-k form."""
        from tastytrade_sdk_spark.llmops.cluster import semdedup_prune_scaled

        base = [float(x) for x in range(1, 9)]
        rot = [float(x) for x in (8, 7, 6, 5, 4, 3, 2, 1)]
        rows = [
            (1, base), (2, base), (3, [2 * x for x in base]),
            (10, rot), (11, [-x for x in base]),  # antipodal: cos=-1
        ]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
        out = {
            r["vec_id"]: r
            for r in semdedup_prune_scaled(df, threshold=0.999).collect()
        }
        assert out[1]["keep"] is True
        assert out[2]["keep"] is False and out[3]["keep"] is False
        assert out[10]["keep"] is True and out[11]["keep"] is True
        assert out[1]["cluster_id"] == out[2]["cluster_id"] == out[3]["cluster_id"]
        # antipodal vector flips every sign bit: complementary bucket
        assert out[11]["cluster_id"] != out[1]["cluster_id"]

    def test_bucket_count_grows_with_corpus(self, spark):
        """The k ∝ n lever itself: a larger corpus must spread over
        more buckets (b derived from count(*))."""
        from tastytrade_sdk_spark.llmops.cluster import semdedup_prune_scaled

        def corpus(n):
            return spark.createDataFrame(
                [(i, [float((i * 7 + j * 3) % 13 - 6) for j in range(8)])
                 for i in range(n)],
                "vec_id long, embedding array<float>",
            )

        small = semdedup_prune_scaled(corpus(100), target_bucket=16)
        big = semdedup_prune_scaled(corpus(2000), target_bucket=16)
        n_small = small.select("cluster_id").distinct().count()
        n_big = big.select("cluster_id").distinct().count()
        assert n_big > n_small
        assert big.count() == 2000  # one row per input, always


class TestStreamingDedupWithinWatermark:
    def test_absorbs_redelivery(self, spark, tmp_path):
        import datetime as dt

        from tastytrade_sdk_spark.streaming.streams import (
            streaming_dedup_within_watermark,
        )

        t0 = dt.datetime(2024, 1, 1)
        # fill 7 delivered twice with a re-stamped event time
        rows = [(i, t0 + dt.timedelta(seconds=i)) for i in range(10)]
        rows.append((7, t0 + dt.timedelta(seconds=7, milliseconds=500)))
        src = str(tmp_path / "fills")
        spark.createDataFrame(rows, "fill_id int, ts timestamp").write.parquet(src)
        stream = spark.readStream.schema("fill_id int, ts timestamp").parquet(src)
        deduped = streaming_dedup_within_watermark(
            stream, ["fill_id"], time_col="ts", watermark="1 minute"
        )
        q = (
            deduped.writeStream.format("memory")
            .queryName("fills_dedup")
            .outputMode("append")
            .start()
        )
        try:
            q.processAllAvailable()
            got = spark.table("fills_dedup").collect()
        finally:
            q.stop()
        ids = sorted(r["fill_id"] for r in got)
        assert ids == list(range(10))


class TestAdditiveAggSink:
    def test_incremental_equals_batch_and_absorbs_replay(self, spark, tmp_path):
        import datetime as dt

        from tastytrade_sdk_spark.streaming.sinks import (
            additive_agg_batch,
            additive_agg_sink,
        )

        t0 = dt.datetime(2024, 1, 1)
        rows = [
            (i % 5, t0 + dt.timedelta(seconds=i), float(i)) for i in range(100)
        ]
        src = str(tmp_path / "src")
        spark.createDataFrame(rows, "k int, ts timestamp, v double").write.parquet(src)
        table = str(tmp_path / "agg")
        stream = spark.readStream.schema("k int, ts timestamp, v double").parquet(src)
        q = additive_agg_sink(
            stream, table, ["k"], ["v"], checkpoint=str(tmp_path / "ckpt")
        ).start()
        try:
            q.processAllAvailable()
        finally:
            q.stop()

        def state():
            return {
                r["k"]: (round(r["v"], 6), r["n"])
                for r in spark.read.parquet(table).collect()
            }

        expected = {
            r["k"]: (round(r["v"], 6), r["n"])
            for r in spark.read.parquet(src)
            .groupBy("k")
            .agg(F.sum("v").alias("v"), F.count("*").alias("n"))
            .collect()
        }
        assert state() == expected

        # replayed epoch (same id as the one the stream committed, 0)
        # must be a no-op — additive double-add is the failure mode
        replay = spark.read.parquet(src)
        additive_agg_batch(replay, table, ["k"], ["v"], epoch_id=0)
        assert state() == expected

        # a NEW epoch does merge
        additive_agg_batch(replay, table, ["k"], ["v"], epoch_id=1)
        assert state() != expected
        assert state()[0][1] == expected[0][1] * 2


class TestCdcApply:
    def test_delete_then_upsert_resurrects(self, spark):
        from tastytrade_sdk_spark.operators.dedup import cdc_apply

        rows = [
            # key 1: insert -> update -> delete  => gone
            (1, 1, "insert", 10.0), (1, 2, "update", 11.0), (1, 3, "delete", None),
            # key 2: insert -> delete -> insert  => resurrected with last value
            (2, 1, "insert", 20.0), (2, 2, "delete", None), (2, 3, "insert", 22.0),
            # key 3: plain upserts => last wins
            (3, 1, "insert", 30.0), (3, 2, "update", 33.0),
        ]
        df = spark.createDataFrame(rows, "k int, seq int, op string, v double")
        out = {r["k"]: r for r in cdc_apply(df, ["k"], ["seq"]).collect()}
        assert 1 not in out
        assert out[2]["v"] == 22.0 and out[2]["op"] == "insert"
        assert out[3]["v"] == 33.0 and out[3]["op"] == "update"


def test_heavy_hitters_exact_vs_group_count(spark):
    import random

    from pyspark.sql import functions as F

    from tastytrade_sdk_spark.operators.sketches import (
        heavy_hitters_exact,
        mg_candidates,
    )

    rng = random.Random(41)
    # zipf-ish: few heavy keys + a long tail, shuffled arrival order
    rows = (
        ["hot_a"] * 3000 + ["hot_b"] * 1500 + ["warm"] * 400
        + [f"tail{i}" for i in range(5000)]
    )
    rng.shuffle(rows)
    df = spark.createDataFrame([(r,) for r in rows], "k string").repartition(8)

    for permille in (5, 40, 200):
        got = {
            r["k"]: (r["cnt"], r["share"])
            for r in heavy_hitters_exact(df, "k", permille).collect()
        }
        # ground truth: plain exact count with the same integer filter
        truth = {
            r["k"]: r["cnt"]
            for r in df.groupBy("k")
            .agg(F.count(F.lit(1)).alias("cnt"))
            .filter(F.col("cnt") * 1000 >= permille * len(rows))
            .collect()
        }
        assert {k: v[0] for k, v in got.items()} == truth, permille
        for k, (cnt, share) in got.items():
            assert abs(share - cnt / len(rows)) < 1e-6

    # sieve coverage: every key above the 1/(capacity+1) share floor
    # appears among the union of per-partition candidates
    cands = {
        r["k"] for r in mg_candidates(df, "k", capacity=200).collect()
    }
    assert {"hot_a", "hot_b", "warm"} <= cands


def test_heavy_hitters_null_keys_and_validation(spark):
    import pytest
    from pyspark.sql import functions as F

    from tastytrade_sdk_spark.operators.sketches import heavy_hitters_exact

    # NULLs are excluded from candidates AND the denominator — the
    # non-null key's share is computed over non-null rows only
    rows = [("a",)] * 6 + [(None,)] * 14
    df = spark.createDataFrame(rows, "k string").repartition(4)
    out = heavy_hitters_exact(df, "k", 500).collect()
    assert len(out) == 1
    assert out[0]["k"] == "a" and out[0]["cnt"] == 6
    assert out[0]["share"] == 1.0  # 6 of 6 non-null rows
    # a genuine 'None' STRING is a real key, not the NULL bucket
    df2 = spark.createDataFrame(
        [("None",)] * 4 + [(None,)] * 4 + [("x",)] * 2, "k string"
    )
    out2 = {r["k"]: r["cnt"] for r in heavy_hitters_exact(df2, "k", 300).collect()}
    assert out2 == {"None": 4, "x": 2}
    for bad in (0, -5, 1001):
        with pytest.raises(ValueError):
            heavy_hitters_exact(df, "k", bad)


class TestBloom:
    def test_no_false_negatives_and_deterministic(self, spark):
        from tastytrade_sdk_spark.operators.bloom import (
            bloom_build,
            bloom_filter,
        )

        build = spark.createDataFrame(
            [(i * 13 + 1,) for i in range(200)], "k long"
        )
        fact = spark.createDataFrame([(i,) for i in range(3000)], "k long")
        out = {
            r["k"]
            for r in bloom_filter(
                fact, build, "k", "k", n_bits=1 << 10, n_hashes=3
            ).collect()
        }
        true = {i * 13 + 1 for i in range(200) if i * 13 + 1 < 3000}
        assert true <= out  # EVERY real key survives
        # membership is a pure function of inputs: two builds agree
        a = bloom_build(build, "k", 1 << 10, 3)
        b = bloom_build(build, "k", 1 << 10, 3)
        assert (a == b).all()

    def test_null_keys_probe_false_and_build_ignores_null(self, spark):
        from pyspark.sql import functions as F

        from tastytrade_sdk_spark.operators.bloom import (
            bloom_build,
            bloom_probe_col,
        )

        build = spark.createDataFrame([(1,), (None,)], "k long")
        probe = spark.createDataFrame([(1,), (None,)], "k long")
        for hf in ("md5", "xxhash64"):
            bm = bloom_build(build, "k", 256, 4, hash_fn=hf)
            got = {
                r["k"]: r["p"]
                for r in probe.select(
                    "k",
                    bloom_probe_col(F.col("k"), bm, 4, hash_fn=hf).alias("p"),
                ).collect()
            }
            # xxhash64(NULL) returns the SEED, so the NULL verdict
            # must come from the explicit isNull guard, not from
            # null-propagation
            assert got[1] is True and got[None] is False, hf

    def test_rejects_unaligned_bits(self, spark):
        import pytest

        from tastytrade_sdk_spark.operators.bloom import bloom_build

        df = spark.createDataFrame([(1,)], "k long")
        with pytest.raises(ValueError, match="multiple of 64"):
            bloom_build(df, "k", 100, 3)

    def test_xxhash64_step_never_collapses(self, spark):
        """xxhash64's two streams share the function (different seed),
        so a plain h2 % n_bits occasionally hits 0, collapsing all
        n_hashes probes onto the single bit h1 — the step is remapped
        into [1, n_bits-1], so every key must set >= 2 distinct bits
        (4 probes with a nonzero step can coincide only at step
        n_bits/2, never all four)."""
        from pyspark.sql import functions as F

        from tastytrade_sdk_spark.operators.bloom import _h12

        n_bits, n_hashes = 64, 4
        keys = spark.createDataFrame([(i,) for i in range(2000)], "k long")
        h1, h2 = _h12(F.col("k"), n_bits, "xxhash64")
        pos = F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(n_bits)),
        )
        stats = keys.select(
            h2.alias("step"), F.size(F.array_distinct(pos)).alias("nd")
        ).collect()
        assert all(1 <= r["step"] <= n_bits - 1 for r in stats)
        assert all(r["nd"] >= 2 for r in stats)
        # and the raw second stream DOES hit 0 mod n_bits on this key
        # range — i.e. the remap is load-bearing, not vacuous
        raw_zero = keys.filter(
            F.pmod(F.xxhash64("k", F.lit(0x9E3779B9)), F.lit(n_bits)) == 0
        ).count()
        assert raw_zero > 0


class TestHLL:
    def _ev(self, spark, n, offset=0):
        return spark.createDataFrame(
            [(("g%d" % (i % 2)), "u%d" % (i + offset)) for i in range(n)],
            "grp string, uid string",
        )

    def test_estimate_within_sketch_error(self, spark):
        from tastytrade_sdk_spark.operators.sketches import (
            hll_estimate,
            hll_sketch,
        )

        # 2000 distinct uids split over 2 groups (1000 each); m=64 ->
        # relative error ~1.04/8 = 13%; assert a generous 3-sigma 40%
        sk = hll_sketch(self._ev(spark, 2000), ["grp"], "uid", p=6)
        rows = hll_estimate(sk, p=6).collect()
        assert len(rows) == 2
        for r in rows:
            assert 600 < r["hll_estimate"] < 1400

    def test_merge_equals_union_sketch(self, spark):
        from tastytrade_sdk_spark.operators.sketches import (
            hll_merge,
            hll_sketch,
        )

        a = self._ev(spark, 500)
        b = self._ev(spark, 500, offset=300)  # overlapping halves
        both = a.union(b)
        sk_union = {
            r["grp"]: r["hll_regs"]
            for r in hll_sketch(both, ["grp"], "uid", p=6).collect()
        }
        sk_a = hll_sketch(a, ["grp"], "uid", p=6)
        sk_b = hll_sketch(b, ["grp"], "uid", p=6).withColumnRenamed(
            "hll_regs", "regs_b"
        )
        merged = {
            r["grp"]: r["m"]
            for r in sk_a.join(sk_b, "grp")
            .select("grp", hll_merge(F.col("hll_regs"), F.col("regs_b")).alias("m"))
            .collect()
        }
        assert merged == sk_union

    def test_small_group_linear_counting_near_exact(self, spark):
        from tastytrade_sdk_spark.operators.sketches import (
            hll_estimate,
            hll_sketch,
        )

        ev = spark.createDataFrame(
            [("g", "u%d" % i) for i in range(10)], "grp string, uid string"
        )
        sk = hll_sketch(ev, ["grp"], "uid", p=6)
        r = hll_estimate(sk, p=6).collect()[0]
        # linear counting at n=10, m=64: worst case all distinct regs
        assert r["hll_zero_regs"] >= 54
        assert 8 <= r["hll_estimate"] <= 13

    def test_duplicates_do_not_change_sketch(self, spark):
        from tastytrade_sdk_spark.operators.sketches import hll_sketch

        ev = self._ev(spark, 300)
        once = hll_sketch(ev, ["grp"], "uid", p=6).collect()
        tripled = hll_sketch(
            ev.union(ev).union(ev), ["grp"], "uid", p=6
        ).collect()
        assert sorted((r["grp"], tuple(r["hll_regs"])) for r in once) == sorted(
            (r["grp"], tuple(r["hll_regs"])) for r in tripled
        )
