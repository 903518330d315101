"""Manifest commit protocol: snapshot isolation, time travel, replay
convergence, pruning."""

import pytest

from tastytrade_sdk_spark.streaming.manifest_store import (
    vacuum_store,
    version_changes,
    current_version,
    prune_versions,
    publish_version,
    read_version,
    versioned_upsert_batch,
)


def _df(spark, rows):
    return spark.createDataFrame(rows, "sym string, seq int, px double")


def test_publish_read_and_time_travel(spark, tmp_path):
    root = str(tmp_path / "store")
    v0 = publish_version(_df(spark, [("A", 1, 10.0)]), root)
    v1 = publish_version(_df(spark, [("A", 2, 11.0), ("B", 1, 5.0)]), root)
    assert (v0, v1) == (0, 1)
    assert current_version(root) == 1
    assert read_version(spark, root).count() == 2
    # any committed version stays readable
    old = read_version(spark, root, version=0).collect()
    assert [(r["sym"], r["px"]) for r in old] == [("A", 10.0)]


def test_versioned_upsert_converges_on_replay(spark, tmp_path):
    root = str(tmp_path / "latest")
    versioned_upsert_batch(
        _df(spark, [("A", 1, 10.0), ("A", 2, 11.0)]), root, ["sym"], ["seq"]
    )
    versioned_upsert_batch(
        _df(spark, [("A", 3, 12.0), ("B", 1, 5.0)]), root, ["sym"], ["seq"]
    )
    snap = {r["sym"]: r["px"] for r in read_version(spark, root).collect()}
    assert snap == {"A": 12.0, "B": 5.0}
    # replay the second batch (failure recovery): same final state,
    # new version
    v = versioned_upsert_batch(
        _df(spark, [("A", 3, 12.0), ("B", 1, 5.0)]), root, ["sym"], ["seq"]
    )
    snap2 = {r["sym"]: r["px"] for r in read_version(spark, root).collect()}
    assert snap2 == snap and v == 2


def test_prune_keeps_newest_and_pointer(spark, tmp_path):
    root = str(tmp_path / "pruned")
    for i in range(4):
        publish_version(_df(spark, [("A", i, float(i))]), root)
    pruned = prune_versions(root, keep=2)
    assert pruned == [0, 1]
    assert current_version(root) == 3
    assert read_version(spark, root, version=2).count() == 1
    assert read_version(spark, root).first()["px"] == 3.0


class TestVacuumStore:
    """Delta-VACUUM analog: orphan/uncommitted debris reclaim."""

    def _seed(self, spark, root, n=3):
        for i in range(n):
            publish_version(_df(spark, [("A", i, float(i))]), root)

    def test_orphan_data_dir_removed_after_grace(self, spark, tmp_path):
        import os

        root = str(tmp_path / "s")
        self._seed(spark, root)
        # crashed writer: data dir exists, no manifest
        orphan = os.path.join(root, "v=99")
        os.makedirs(orphan)
        rep = vacuum_store(root, keep=2, grace_s=0)
        assert rep["orphan_dirs"] == [99]
        assert not os.path.exists(orphan)
        assert read_version(spark, root).count() == 1  # store intact

    def test_grace_window_protects_in_flight_writer(self, spark, tmp_path):
        import os

        root = str(tmp_path / "s")
        self._seed(spark, root)
        orphan = os.path.join(root, "v=99")
        os.makedirs(orphan)
        rep = vacuum_store(root, keep=2, grace_s=3600)
        assert rep["orphan_dirs"] == []
        assert os.path.exists(orphan)

    def test_uncommitted_manifest_past_pointer_removed(self, spark, tmp_path):
        import json
        import os

        root = str(tmp_path / "s")
        self._seed(spark, root)
        # crash between manifest write and pointer flip
        v = current_version(root) + 1
        os.makedirs(os.path.join(root, f"v={v}"))
        with open(os.path.join(root, f"_manifest.{v}.json"), "w") as f:
            json.dump({"version": v, "data_dir": os.path.join(root, f"v={v}")}, f)
        rep = vacuum_store(root, keep=2, grace_s=0)
        assert rep["stale_manifests"] == [v]
        assert not os.path.exists(os.path.join(root, f"v={v}"))
        assert current_version(root) == v - 1  # pointer untouched

    def test_stale_pointer_temps_removed(self, spark, tmp_path):
        import os

        root = str(tmp_path / "s")
        self._seed(spark, root)
        with open(os.path.join(root, "._latest.dead"), "w") as f:
            f.write("2")
        rep = vacuum_store(root, keep=2, grace_s=0)
        assert rep["tmp_files"] == 1

    def test_never_touches_pointer_target_or_kept_versions(
        self, spark, tmp_path
    ):
        import os

        root = str(tmp_path / "s")
        self._seed(spark, root, n=4)
        rep = vacuum_store(root, keep=2, grace_s=0)
        # versions 0,1 pruned by retention; 2,3 kept; latest readable
        assert rep["pruned_versions"] == [0, 1]
        assert current_version(root) == 3
        assert read_version(spark, root, version=2).count() == 1
        assert not os.path.exists(os.path.join(root, "v=0"))

    def test_missing_root_is_noop(self, tmp_path):
        rep = vacuum_store(str(tmp_path / "nope"))
        assert rep["pruned_versions"] == []


class TestVacuumReviewRegressions:
    """Round-5 review findings: pointer corruption, retry-writer
    race, uncommitted manifests in the keep window."""

    def _seed(self, spark, root, n=4):
        for i in range(n):
            publish_version(_df(spark, [("A", i, float(i))]), root)

    def test_corrupt_pointer_refuses_instead_of_reclaiming_all(
        self, spark, tmp_path
    ):
        import os

        import pytest as _pt

        root = str(tmp_path / "s")
        self._seed(spark, root)
        with open(os.path.join(root, "_latest"), "w") as f:
            f.write("")  # torn write
        with _pt.raises(ValueError, match="unreadable"):
            vacuum_store(root, keep=2, grace_s=0)
        # every version dir survived
        assert all(
            os.path.exists(os.path.join(root, f"v={v}")) for v in range(4)
        )

    def test_stale_manifest_with_fresh_data_dir_is_protected(
        self, spark, tmp_path
    ):
        """Retry writers REUSE the crashed version number; an old
        leftover manifest must not condemn a freshly rewritten data
        dir."""
        import json
        import os

        root = str(tmp_path / "s")
        self._seed(spark, root)
        v = current_version(root) + 1
        d = os.path.join(root, f"v={v}")
        os.makedirs(d)  # fresh in-flight rewrite (mtime = now)
        m = os.path.join(root, f"_manifest.{v}.json")
        with open(m, "w") as f:
            json.dump({"version": v, "data_dir": d}, f)
        os.utime(m, (0, 0))  # manifest is ancient
        rep = vacuum_store(root, keep=2, grace_s=3600)
        assert rep["stale_manifests"] == []
        assert os.path.exists(d)

    def test_uncommitted_manifest_does_not_consume_keep_slot(
        self, spark, tmp_path
    ):
        import json
        import os

        root = str(tmp_path / "s")
        self._seed(spark, root)  # committed 0..3
        v = 4  # crash between manifest write and pointer flip
        os.makedirs(os.path.join(root, f"v={v}"))
        with open(os.path.join(root, f"_manifest.{v}.json"), "w") as f:
            json.dump({"version": v, "data_dir": f"{root}/v={v}"}, f)
        pruned = prune_versions(root, keep=2)
        # keep=2 COMMITTED snapshots: 2 and 3 stay, 0 and 1 go
        assert pruned == [0, 1]
        assert read_version(spark, root, version=2).count() == 1

    def test_never_committed_store_reclaims_after_grace(
        self, spark, tmp_path
    ):
        """First-ever publish crashed before the pointer flip (no
        _latest file at all): nothing was committed, so vacuum must
        age the debris out — not raise (that path is reserved for an
        EXISTING-but-unreadable pointer)."""
        import json
        import os

        root = str(tmp_path / "s")
        os.makedirs(os.path.join(root, "v=0"))
        with open(os.path.join(root, "_manifest.0.json"), "w") as f:
            json.dump({"version": 0, "data_dir": f"{root}/v=0"}, f)
        os.utime(os.path.join(root, "_manifest.0.json"), (0, 0))
        os.utime(os.path.join(root, "v=0"), (0, 0))
        rep = vacuum_store(root, keep=2, grace_s=3600)
        assert rep["stale_manifests"] == [0]
        assert not os.path.exists(os.path.join(root, "v=0"))


class TestVersionChanges:
    """Change feed (Delta-CDF analog): classification + reconstruction."""

    @pytest.fixture(scope="class")
    def store(self, spark, tmp_path_factory):
        import pyspark.sql.functions as F  # noqa: F401

        root = str(tmp_path_factory.mktemp("cdf") / "s")
        publish_version(
            _df(spark, [("A", 1, 10.0), ("B", 1, 5.0), ("C", 1, 7.0)]), root
        )
        # v1: A updated, B unchanged, C deleted, D inserted
        publish_version(
            _df(spark, [("A", 2, 11.0), ("B", 1, 5.0), ("D", 1, 9.0)]), root
        )
        return root

    def test_classification(self, spark, store):
        feed = {
            r.sym: (r.op, r.seq, r.px)
            for r in version_changes(spark, store, 0, 1, ["sym"]).collect()
        }
        assert feed == {
            "A": ("update", 2, 11.0),   # post-image
            "C": ("delete", 1, 7.0),    # pre-image
            "D": ("insert", 1, 9.0),
        }  # B unchanged -> excluded

    def test_apply_feed_reconstructs_new_snapshot(self, spark, store):
        from pyspark.sql import functions as F

        feed = version_changes(spark, store, 0, 1, ["sym"])
        old = read_version(spark, store, version=0)
        dels = feed.filter(F.col("op") == "delete").select("sym")
        ups = feed.filter(F.col("op") != "delete").drop("op")
        rebuilt = (
            old.join(feed.select("sym"), "sym", "left_anti")
            .unionByName(ups)
            .join(dels, "sym", "left_anti")
        )
        want = {tuple(r) for r in read_version(spark, store, version=1).collect()}
        assert {tuple(r) for r in rebuilt.collect()} == want

    def test_null_key_value_matches_null_safely(self, spark, tmp_path):
        root = str(tmp_path / "s")
        publish_version(_df(spark, [(None, 1, 1.0), ("A", 1, 2.0)]), root)
        publish_version(_df(spark, [(None, 2, 3.0), ("A", 1, 2.0)]), root)
        feed = version_changes(spark, root, 0, 1, ["sym"]).collect()
        # the NULL-sym row is ONE updated key, not an insert+delete pair
        assert [(r.sym, r.op, r.px) for r in feed] == [(None, "update", 3.0)]

    def test_value_column_named_present_is_fine(self, spark, tmp_path):
        root = str(tmp_path / "s")
        df0 = spark.createDataFrame([("A", True)], "sym string, present boolean")
        df1 = spark.createDataFrame([("A", False)], "sym string, present boolean")
        publish_version(df0, root)
        publish_version(df1, root)
        feed = version_changes(spark, root, 0, 1, ["sym"]).collect()
        assert [(r.sym, r.op, r.present) for r in feed] == [("A", "update", False)]

    def test_op_column_refused(self, spark, tmp_path):
        root = str(tmp_path / "s")
        df = spark.createDataFrame([("A", "x")], "sym string, op string")
        publish_version(df, root)
        publish_version(df, root)
        with pytest.raises(ValueError, match="'op' column"):
            version_changes(spark, root, 0, 1, ["sym"])
