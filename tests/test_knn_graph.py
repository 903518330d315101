"""NN-descent k-NN graph + the ANN recall-vs-nprobe curve
(llmops/similarity.py)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tastytrade_sdk_spark.llmops.similarity import (
    ann_recall_curve,
    axis_centroids,
    brute_force_topk,
    nn_descent,
)


def _clustered_embeddings(spark, n_per=10, n_clusters=3, dim=8, seed=7):
    """Tight clusters around orthogonal-ish anchors: ground-truth
    neighbors are unambiguous (same-cluster >> cross-cluster)."""
    rng = np.random.default_rng(seed)
    anchors = rng.standard_normal((n_clusters, dim)) * 10
    rows = []
    vid = 0
    for c in range(n_clusters):
        for _ in range(n_per):
            v = anchors[c] + rng.standard_normal(dim) * 0.1
            rows.append((vid, c, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(
        rows, "vec_id long, cluster int, embedding array<float>"
    )


@pytest.fixture(scope="module")
def emb(spark):
    return _clustered_embeddings(spark)


def test_nn_descent_shape_and_determinism(spark, emb):
    g1 = nn_descent(emb, k=4, rounds=2).collect()
    g2 = nn_descent(emb, k=4, rounds=2).collect()
    assert sorted(map(tuple, g1)) == sorted(map(tuple, g2))
    by_src = {}
    for r in g1:
        assert r["vec_id"] != r["nbr_id"]
        assert 1 <= r["rnk"] <= 4
        by_src.setdefault(r["vec_id"], []).append(r["nbr_id"])
    assert all(len(v) <= 4 and len(v) == len(set(v)) for v in by_src.values())
    assert len(by_src) == 30


def test_nn_descent_improves_over_rounds(spark, emb):
    m1 = (
        nn_descent(emb, k=4, rounds=1)
        .agg(F.avg("cosine").alias("m")).collect()[0]["m"]
    )
    m2 = (
        nn_descent(emb, k=4, rounds=2)
        .agg(F.avg("cosine").alias("m")).collect()[0]["m"]
    )
    assert m2 >= m1 - 1e-9


def test_nn_descent_converges_to_clusters(spark, emb):
    """After 2 rounds on well-separated clusters, every node's
    neighbors are same-cluster (ring init is mostly cross-cluster, so
    this demonstrates genuine refinement)."""
    g = nn_descent(emb, k=4, rounds=2)
    labels = emb.select("vec_id", "cluster")
    joined = (
        g.join(labels, "vec_id")
        .join(
            labels.select(
                F.col("vec_id").alias("nbr_id"),
                F.col("cluster").alias("nbr_cluster"),
            ),
            "nbr_id",
        )
    )
    n_cross = joined.filter(F.col("cluster") != F.col("nbr_cluster")).count()
    assert n_cross == 0


def test_nn_descent_custom_init(spark, emb):
    init = emb.select(F.col("vec_id").alias("src")).crossJoin(
        spark.range(1).select(F.lit(0).alias("dst"))
    ).filter(F.col("src") != F.col("dst"))
    g = nn_descent(emb, k=4, rounds=2, init_edges=init)
    assert g.count() > 0


def test_recall_curve_monotone_and_exact_at_full_probe(spark, emb):
    queries = emb.filter(F.col("vec_id") < 5).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = axis_centroids(4, 8)
    curve = ann_recall_curve(
        emb, queries, nprobes=(1, 2, 4), k=5, n_lists=4, centroids=cent
    )
    rows = curve.collect()
    assert all(0.0 <= r["recall"] <= 1.0 for r in rows)
    means = {
        r["nprobe"]: r["m"]
        for r in curve.groupBy("nprobe").agg(F.avg("recall").alias("m")).collect()
    }
    assert means[1] <= means[2] + 1e-9 <= means[4] + 2e-9
    # probing every list IS brute force: recall must be exactly 1
    assert means[4] == pytest.approx(1.0)


def test_recall_curve_against_manual_intersection(spark, emb):
    """Recall values must equal |approx ∩ truth| / k computed by hand
    from the two searches."""
    queries = emb.filter(F.col("vec_id") < 3).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = axis_centroids(4, 8)
    curve = {
        (r["nprobe"], r["query_id"]): r["recall"]
        for r in ann_recall_curve(
            emb, queries, nprobes=(1,), k=5, n_lists=4, centroids=cent
        ).collect()
    }
    truth = brute_force_topk(emb, queries, k=5).collect()
    truth_sets = {}
    for r in truth:
        truth_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    from tastytrade_sdk_spark.llmops.similarity import ivf_topk

    approx = ivf_topk(
        emb, queries, k=5, n_lists=4, nprobe=1, centroids=cent
    ).collect()
    approx_sets = {}
    for r in approx:
        approx_sets.setdefault(r["query_id"], set()).add(r["vec_id"])
    for q, aset in approx_sets.items():
        want = round(len(aset & truth_sets[q]) / 5.0, 6)
        assert curve[(1, q)] == pytest.approx(want)


def test_graph_expand_search_quality(spark, emb):
    """Graph search (entry + 2-hop expansion + exact rescore) finds
    same-cluster neighbors on well-separated clusters, and its top-1
    agrees with brute force whenever the true top-1 is reachable."""
    from tastytrade_sdk_spark.llmops.similarity import graph_expand_topk

    graph = nn_descent(emb, k=4, rounds=2).select("vec_id", "nbr_id")
    queries = emb.filter(F.col("vec_id") < 6).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    cent = axis_centroids(4, 8)
    out = graph_expand_topk(emb, graph, queries, cent, k=5, hops=2)
    labels = {r["vec_id"]: r["cluster"] for r in emb.collect()}
    rows = out.collect()
    assert rows, "graph search returned nothing"
    by_q = {}
    for r in rows:
        assert r["query_id"] != r["vec_id"]
        by_q.setdefault(r["query_id"], []).append(r)
    for q, rs in by_q.items():
        ranks = sorted(r["rnk"] for r in rs)
        assert ranks == list(range(1, len(rs) + 1))
        # after convergence every returned neighbor of a cluster-0
        # query that the graph can reach should be scored correctly:
        # cosine must be non-increasing in rank
        coss = [r["cosine"] for r in sorted(rs, key=lambda r: r["rnk"])]
        assert coss == sorted(coss, reverse=True)
        # top-1 lands in the query's own cluster (clusters are tight)
        top1 = min(rs, key=lambda r: r["rnk"])
        assert labels[top1["vec_id"]] == labels[q]


def test_nn_descent_tiny_corpus(spark):
    """n <= k: the ring wraps onto fewer distinct neighbors than k —
    degree caps at n-1, no self-edges, no duplicates, no crash."""
    rows = [(i, [float(i), 1.0]) for i in range(3)]
    tiny = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    g = nn_descent(tiny, k=4, rounds=2).collect()
    by_src = {}
    for r in g:
        assert r["vec_id"] != r["nbr_id"]
        by_src.setdefault(r["vec_id"], []).append(r["nbr_id"])
    for src, nbrs in by_src.items():
        assert len(nbrs) == len(set(nbrs)) <= 2
