"""Near-duplicate CLUSTER assignment: connected components over the
LSH candidate-pair graph.

Pair lists (llmops/dedup.py) answer "which docs look alike"; a
training-data pipeline needs the transitive closure — one canonical id
per near-dup cluster so the dedup policy ("keep canonical, drop rest")
is a plain filter. This is the standard MinHash-LSH -> components ->
keep-one recipe used by large-scale corpus dedup.

Spark form: iterative min-label propagation. Each round is one join of
the (symmetrized) edge list against current labels plus a min-agg —
both shuffles keyed on node id — and converges in O(component
diameter) rounds. Near-dup graphs have tiny, star-ish components, so
the loop terminates in a handful of rounds; ``max_iters`` bounds the
pathological chain. Lineage is cut with an eager localCheckpoint per
round (the loop would otherwise stack O(iters) shuffle stages into one
plan). At lake scale the same loop upgrades to the alternating
large-star/small-star algorithm (Kiveris et al., "Connected Components
in MapReduce"), which converges in O(log n) rounds regardless of
diameter — the driver loop and per-round shuffle structure stay the
same shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "doc_a",
    dst: str = "doc_b",
    nodes: DataFrame | None = None,
    id_col: str = "doc_id",
    max_iters: int = 25,
    strict: bool = True,
) -> DataFrame:
    """Per-node component label = MIN node id reachable from it.

    ``nodes`` (optional) supplies isolated vertices — rows never seen
    in ``edges`` come back as their own singleton component. Output:
    (id_col, component).

    Convergence is O(component diameter) rounds; if labels are still
    moving after ``max_iters`` the result would be silently WRONG
    (one real cluster split across labels), so ``strict`` raises
    instead — raise max_iters, or switch to the large-star/small-star
    variant for pathological chain graphs.
    """
    sym = edges.select(F.col(src).alias("__n"), F.col(dst).alias("__m"))
    sym = sym.unionByName(
        sym.select(F.col("__m").alias("__n"), F.col("__n").alias("__m"))
    )
    # materialize the edge list ONCE: every propagation round joins
    # against it, and without the barrier the upstream pair-generation
    # pipeline (e.g. the whole MinHash-LSH plan) would re-execute per
    # round
    sym = sym.localCheckpoint(eager=True)
    base = (
        nodes.select(F.col(id_col).alias("__n"))
        if nodes is not None
        else sym.select("__n")
    )
    labels = base.distinct().withColumn("__lbl", F.col("__n"))

    changed = False
    for _ in range(max_iters):
        nbr_min = (
            sym.join(
                labels.select(
                    F.col("__n").alias("__m"), F.col("__lbl").alias("__mlbl")
                ),
                "__m",
            )
            .groupBy("__n")
            .agg(F.min("__mlbl").alias("__nbr"))
        )
        stepped = labels.join(nbr_min, "__n", "left").select(
            "__n",
            F.col("__lbl"),
            F.least(F.col("__lbl"), F.coalesce("__nbr", F.col("__lbl"))).alias(
                "__new"
            ),
        )
        stepped = stepped.localCheckpoint(eager=True)
        changed = not stepped.filter(F.col("__new") < F.col("__lbl")).isEmpty()
        labels = stepped.select("__n", F.col("__new").alias("__lbl"))
        if not changed:
            break
    if changed and strict:
        raise RuntimeError(
            f"connected_components did not converge in {max_iters} rounds "
            "(a component's diameter exceeds max_iters); labels would be "
            "silently split — raise max_iters or use a star-contraction "
            "variant for chain-shaped graphs"
        )
    return labels.select(F.col("__n").alias(id_col), F.col("__lbl").alias("component"))


def near_dup_clusters(
    docs: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    src: str = "doc_a",
    dst: str = "doc_b",
) -> DataFrame:
    """Cluster assignment for every document: cluster id = min doc id
    in the component (docs with no near-dup are their own singleton),
    plus cluster_size and the keep-canonical flag the dedup filter
    uses."""
    comp = connected_components(pairs, src=src, dst=dst, nodes=docs, id_col=id_col)
    sizes = comp.groupBy("component").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        comp.join(sizes, "component")
        .select(
            id_col,
            F.col("component").alias("cluster_id"),
            "cluster_size",
            (F.col(id_col) == F.col("component")).alias("is_canonical"),
        )
    )
