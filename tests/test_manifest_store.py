"""Manifest commit protocol: snapshot isolation, time travel, replay
convergence, pruning."""

from tastytrade_sdk_spark.streaming.manifest_store import (
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
