"""Randomized cross-checks (seeded rng, one Spark action per op) for
the round-2 operators: connected components vs a union-find replay,
pack_sequences vs a pure-Python prefix walk, zorder_key vs a Python
bit-interleave."""

import random

from pyspark.sql import functions as F


def test_connected_components_vs_union_find(spark):
    from tastytrade_sdk_spark.llmops.cluster import connected_components

    rng = random.Random(1234)
    edges, nodes = [], set()
    # 30 random mini-graphs in disjoint id spaces (chains, stars,
    # cycles, isolated nodes) unioned into one problem
    for g in range(30):
        base = g * 100
        n = rng.randint(1, 12)
        ids = [base + i for i in range(n)]
        nodes.update(ids)
        for _ in range(rng.randint(0, n + 2)):
            a, b = rng.sample(ids, 2) if n > 1 else (ids[0], ids[0])
            if a != b:
                edges.append((a, b))

    # union-find ground truth with min-id labels
    parent = {x: x for x in nodes}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    truth = {x: find(x) for x in nodes}

    edf = spark.createDataFrame(edges or [(0, 0)], "doc_a int, doc_b int")
    ndf = spark.createDataFrame([(x,) for x in sorted(nodes)], "doc_id int")
    got = {
        r["doc_id"]: r["component"]
        for r in connected_components(edf, nodes=ndf).collect()
    }
    assert got == truth


def test_pack_sequences_vs_prefix_walk(spark):
    from tastytrade_sdk_spark.llmops.pipeline import pack_sequences

    rng = random.Random(77)
    rows = [(i, rng.randint(0, 900)) for i in range(300)]
    budget, n_shards = 512, 4
    out = pack_sequences(
        spark.createDataFrame(rows, "doc_id int, n int"),
        "n",
        budget=budget,
        n_shards=n_shards,
    ).collect()
    by_id = {r["doc_id"]: r for r in out}
    assert set(by_id) == {i for i, _ in rows}

    # replay per shard in id order with a plain prefix sum
    shard_of = {r["doc_id"]: r["shard"] for r in out}
    for s in range(n_shards):
        cursor = 0
        for doc_id, n in rows:
            if shard_of[doc_id] != s:
                continue
            r = by_id[doc_id]
            assert r["start_offset"] == cursor
            assert r["pack_id"] == cursor // budget
            end = cursor + max(n, 1) - 1
            assert r["crosses_boundary"] == (cursor // budget != end // budget)
            cursor += n


def test_zorder_key_vs_python_interleave(spark):
    from tastytrade_sdk_spark.operators.scale import zorder_key

    rng = random.Random(5)
    rows = [
        (i, rng.randint(0, 255), rng.randint(0, 255), rng.randint(0, 255))
        for i in range(500)
    ]

    def morton(vals, bits=8):
        out = 0
        for i in range(bits):
            for c, v in enumerate(vals):
                out |= ((v >> i) & 1) << (i * len(vals) + c)
        return out

    df = spark.createDataFrame(rows, "id int, a int, b int, c int")
    got = {
        r["id"]: r["z"]
        for r in df.select(
            "id",
            zorder_key([F.col("a"), F.col("b"), F.col("c")], bits=8).alias("z"),
        ).collect()
    }
    for i, a, b, c in rows:
        assert got[i] == morton([a, b, c])
