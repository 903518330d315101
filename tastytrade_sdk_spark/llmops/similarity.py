"""Similarity search over embedding columns (array<float>).

Two paths:

- **brute_force_topk** — exact cosine top-k of every query against the
  corpus. The query set is broadcast (it is small by construction);
  the corpus is never shuffled — each task scores its local partition
  and a per-query top-k window reduces the candidates. Baseline and
  verification oracle.
- **lsh_topk** — random-hyperplane LSH: 16 deterministic hyperplanes
  -> 16-bit bucket signature; queries only score docs in the same
  bucket (or within Hamming radius via banded buckets). The scale
  path: bucket assignment is a narrow projection, and the join key
  (bucket) replaces the all-pairs product.

All arithmetic is done in double after an explicit cast from float —
summation order is the array order (F.aggregate is a sequential
fold), which keeps results reproducible.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def _spread(df: DataFrame) -> DataFrame:
    """Small-file inputs arrive single-partition; pair-scan stages must
    not run single-task."""
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def with_unit_vector(
    df: DataFrame, vec_col: str = "embedding", out_col: str = "__unit"
) -> DataFrame:
    """Precompute the L2-normalized double vector ONCE per row — pair
    scans then use a plain dot product instead of recomputing two
    norms per pair (3x less HOF work, and the normalization stays in
    one projection)."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = F.sqrt(
        F.aggregate(
            F.transform(v, lambda x: x * x), F.lit(0.0), lambda acc, x: acc + x
        )
    )
    return df.withColumn(out_col, F.transform(v, lambda x: x / n))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    round_dp: int = 6,
) -> DataFrame:
    """Exact cosine top-k per query. Ranking uses the rounded cosine
    with the candidate id as tiebreak (deterministic across engines)."""
    from pyspark.sql import Window

    q = with_unit_vector(queries, vec_col, "__qunit").select(
        F.col(query_id_col), F.col("__qunit")
    )
    c = _spread(with_unit_vector(corpus, vec_col, "__cunit").select(id_col, "__cunit"))
    scored = (
        c.join(F.broadcast(q), F.col(id_col) != F.col(query_id_col))
        .withColumn(
            "cosine", F.round(_dot(F.col("__qunit"), F.col("__cunit")), round_dp)
        )
        .select(query_id_col, id_col, "cosine")
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("cosine").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(query_id_col, id_col, "cosine", "rnk")
    )


def hyperplanes(n_planes: int = 16, dim: int = 64, seed: int = 42) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim))


def bucket_signature(vec: Column, planes: np.ndarray) -> Column:
    """Sign-bit bucket id: bit i set iff vec . plane_i > 0."""
    sig = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lit_plane = F.array(*[F.lit(float(x)) for x in plane])
        d = _dot(vec, lit_plane)
        sig = sig + F.when(d > 0, F.lit(1 << i)).otherwise(F.lit(0))
    return sig


def lsh_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    k: int = 5,
    n_planes: int = 16,
    bands: int = 4,
    seed: int = 42,
    round_dp: int = 6,
) -> DataFrame:
    """Approximate top-k: only candidates sharing >=1 signature band
    with the query are scored. bands divides n_planes; fewer rows per
    band = higher recall, more candidates."""
    from pyspark.sql import Window

    assert n_planes % bands == 0
    rows = n_planes // bands
    dim = len(corpus.select(vec_col).first()[0])
    planes = hyperplanes(n_planes, dim, seed)

    def banded(df: DataFrame, idc: str) -> DataFrame:
        df = _spread(df) if idc == id_col else df
        sig = bucket_signature(F.col(vec_col), planes)
        out = df.withColumn("__sig", sig)
        band_cols = []
        for b in range(bands):
            mask = ((1 << rows) - 1) << (b * rows)
            band_cols.append(
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.col("__sig").bitwiseAND(F.lit(mask)).alias("band_val"),
                )
            )
        return out.select(
            idc, vec_col, F.explode(F.array(*band_cols)).alias("band")
        ).select(idc, vec_col, "band.band_id", "band.band_val")

    cb = banded(corpus, id_col)
    qb = banded(queries.withColumnRenamed(query_id_col, "__qid"), "__qid").select(
        "__qid", F.col(vec_col).alias("__qvec"), "band_id", "band_val"
    )
    cands = (
        cb.join(F.broadcast(qb), ["band_id", "band_val"])
        .filter(F.col(id_col) != F.col("__qid"))
        .select("__qid", id_col, vec_col, "__qvec")
        .distinct()
    )
    cands = with_unit_vector(cands, vec_col, "__cu")
    cands = with_unit_vector(cands, "__qvec", "__qu")
    scored = cands.withColumn(
        "cosine", F.round(_dot(F.col("__qu"), F.col("__cu")), round_dp)
    )
    w = Window.partitionBy("__qid").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select(F.col("__qid").alias(query_id_col), id_col, "cosine", "rnk")
    )
