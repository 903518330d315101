"""Lexical retrieval over an inverted postings table: BM25 top-k.

The sparse/lexical twin of llmops/similarity.py's dense-ANN paths
(reference parity: the reference has no retrieval engine at all — this
is part of the training-data-pipeline surface, e.g. mining lexical
hard negatives or more-like-this corpus expansion).

Shape at 100 TB:

- ``build_postings`` is the classic inverted-index build — one explode
  + ONE (term, doc)-keyed shuffle with map-side combine. The postings
  table is the scale structure: term-keyed, so every downstream
  retrieval touches only the posting lists of its query terms.
- ``bm25_topk`` broadcasts the (small) query-term set, semi-joins it
  into the postings table (corpus-side postings never shuffle for the
  df/idf pass — document frequency is computed only for the probed
  terms), and aggregates per-(query, doc) partial scores with map-side
  combine. No all-pairs product anywhere; cost is proportional to the
  probed posting lists, exactly like an IVF nprobe search.
- Floats follow the house parity rules (plans/queries.py): idf and the
  tf normalization are rounded to 6dp at the source, the per-term
  score is summed as DECIMAL (order-independent exact sum), and the
  final score is cast to DOUBLE at the result boundary.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from tastytrade_sdk_spark.llmops.textops import tokens_expr

BM25_K1 = 1.2
BM25_B = 0.75


def build_postings(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Inverted postings: one row per (term, doc) with the term
    frequency. One explode + one hash aggregation (map-side combined);
    the output is term-keyed — the natural bucketing/partition column
    for a persisted index table."""
    return (
        docs.select(id_col, F.explode(tokens_expr(F.col(text_col))).alias("term"))
        .groupBy("term", id_col)
        .agg(F.count(F.lit(1)).alias("tf"))
    )


def doc_lengths(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc token counts (the BM25 length normalization input)."""
    return docs.select(
        id_col, F.size(tokens_expr(F.col(text_col))).cast("long").alias("dl")
    )


def bm25_topk(
    corpus: DataFrame,
    query_docs: DataFrame,
    k: int = 5,
    k1: float = BM25_K1,
    b: float = BM25_B,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """BM25 more-like-this: for each query doc, the top-k corpus docs
    by BM25 score over the query's distinct terms (self-matches
    excluded). Robertson/Sparck-Jones BM25 with the standard
    ``ln(1 + (N - df + 0.5)/(df + 0.5))`` idf.

    Plan: query terms are broadcast (queries are few); postings are
    filtered to probed terms BEFORE the df aggregation, so document
    frequency costs one agg over the probed posting lists only; the
    per-(query, doc) sum is a map-side-combinable decimal aggregation;
    top-k is a per-query window over candidates only.
    """
    postings = build_postings(corpus, text_col, id_col)
    dl = doc_lengths(corpus, text_col, id_col)
    glob = dl.agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.round(F.avg("dl"), 6).alias("avgdl"),
    )

    qterms = query_docs.select(
        F.col(id_col).alias("query_id"),
        F.explode(tokens_expr(F.col(text_col))).alias("term"),
    ).distinct()

    probed = postings.join(
        F.broadcast(qterms.select("term").distinct()), "term"
    )
    dfreq = probed.groupBy("term").agg(F.count(F.lit(1)).alias("df"))

    # per-(query, doc, term) partial score; constants inlined so the
    # DuckDB oracle can replay the exact float expression order
    cand = (
        F.broadcast(qterms)
        .join(probed, "term")
        .join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(glob))
        .filter(F.col(id_col) != F.col("query_id"))
    )
    idf = F.round(
        F.log(
            (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5) + 1.0
        ),
        6,
    )
    tfnorm = F.round(
        F.col("tf") * (k1 + 1.0)
        / (
            F.col("tf")
            + k1 * (1.0 - b + b * F.col("dl") / F.col("avgdl"))
        ),
        6,
    )
    scored = cand.select(
        "query_id",
        id_col,
        F.round(idf * tfnorm, 6).cast("decimal(20,6)").alias("s"),
    )
    summed = scored.groupBy("query_id", id_col).agg(F.sum("s").alias("sd"))
    w = Window.partitionBy("query_id").orderBy(
        F.col("sd").desc(), F.col(id_col)
    )
    return (
        summed.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(
            "query_id",
            F.col("rank").cast("long").alias("rank"),
            id_col,
            F.col("sd").cast("double").alias("bm25"),
        )
    )
