"""Distributed n-gram language-model quality scoring.

The CCNet/KenLM-style corpus filter: train a bigram LM on a
deterministic hash split of the corpus, score every document by its
smoothed average token log-probability, and drop the tail. Here the
whole loop — counting, smoothing, scoring — is relational, so it runs
as ordinary shuffles with map-side partial aggregation instead of a
single-node KenLM binary (reference has no LM stage; this is part of
the training-data extension surface, BASELINE.json north star).

Model: add-k smoothed bigram LM over `textops.tokens_expr` tokens.

    P(w2 | w1) = (c(w1 w2) + k) / (c(w1 ·) + k * V)

with c(w1 ·) = number of training bigrams whose first token is w1
(derived from the bigram table itself, so the model is
self-consistent: sum_w2 P(w2|w1) = 1) and V = distinct training
tokens. A document's score is the mean log-prob over its bigrams;
documents with < 2 tokens score NULL.

Scale shape (100 TB):
- Training: one explode + groupBy per count table — shuffles on the
  bigram / token string key with map-side combine, output bounded by
  vocabulary growth (Heaps' law), orders of magnitude below corpus
  size.
- Scoring: per-doc bigram multiplicities (groupBy doc_id+bigram),
  then a shuffle hash join against the count tables on the bigram
  key, then one agg back onto doc_id. No driver materialization;
  V joins in as a broadcast single-row table.
- Cross-engine parity: every probability is formed by the same
  rational expression on both engines; the per-doc mean is rounded
  (float-sum order across engines costs ~1e-13; ln differs by ≤1 ulp)
  far above the noise floor.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from tastytrade_sdk_spark.llmops.textops import tokens_expr


def bigrams_expr(tokens: Column) -> Column:
    """Adjacent-token bigram strings ``"w_i w_{i+1}"``; empty array for
    fewer than 2 tokens (guarded — sequence(1, 0) would DESCEND)."""
    n = F.size(tokens)
    pairs = F.transform(
        F.sequence(F.lit(1), n - 1),
        lambda i: F.concat(
            F.element_at(tokens, i), F.lit(" "), F.element_at(tokens, i + 1)
        ),
    )
    return F.when(n >= 2, pairs).otherwise(F.array().cast("array<string>"))


def train_bigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    is_train: Column | None = None,
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count tables for the add-k bigram LM over the training slice.

    ``is_train`` defaults to the corpus-standard 80% hash split
    (pipeline.split_assignment convention: h32('split:'||id) % 100
    < 80), so the held-out 20% is never seen by the model.

    Returns ``(bigram_counts[bigram, c], context_counts[w1, cc],
    vocab[v])`` — three small-relative-to-corpus tables produced by
    two explode+groupBy passes and one distinct-count.
    """
    from tastytrade_sdk_spark.llmops.textops import h32

    if is_train is None:
        is_train = (
            h32(F.concat(F.lit("split:"), F.col(id_col).cast("string"))) % 100 < 80
        )
    toks = docs.filter(is_train).select(tokens_expr(text_col).alias("__t"))
    big = toks.select(F.explode(bigrams_expr(F.col("__t"))).alias("bigram"))
    bigram_counts = big.groupBy("bigram").agg(F.count(F.lit(1)).alias("c"))
    context_counts = bigram_counts.groupBy(
        F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)).alias("w1")
    ).agg(F.sum("c").alias("cc"))
    vocab = toks.select(F.explode("__t").alias("w")).agg(
        F.count_distinct("w").alias("v")
    )
    return bigram_counts, context_counts, vocab


def score_docs_bigram_lm(
    docs: DataFrame,
    bigram_counts: DataFrame,
    context_counts: DataFrame,
    vocab: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """Average bigram log-probability per document under the add-k LM.

    Unseen bigrams back off through the smoothing mass (coalesce the
    missing counts to 0 — the k/(0 + kV) floor), so every document is
    scorable, not just in-vocabulary ones. Output: (id, n_bigrams,
    avg_logprob) with avg_logprob NULL when the doc has no bigram.
    """
    doc_big = docs.select(
        F.col(id_col), F.explode(bigrams_expr(tokens_expr(text_col))).alias("bigram")
    ).groupBy(id_col, "bigram").agg(F.count(F.lit(1)).alias("m"))
    terms = (
        doc_big.join(bigram_counts, "bigram", "left")
        .withColumn("w1", F.split_part(F.col("bigram"), F.lit(" "), F.lit(1)))
        .join(context_counts, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .select(
            F.col(id_col),
            F.col("m"),
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(k))
                / (F.coalesce(F.col("cc"), F.lit(0)) + F.lit(k) * F.col("v"))
            ).alias("lp"),
        )
    )
    scores = terms.groupBy(id_col).agg(
        F.sum("m").alias("n_bigrams"),
        F.round(F.sum(F.col("m") * F.col("lp")) / F.sum("m"), round_dp).alias(
            "avg_logprob"
        ),
    )
    return (
        docs.select(id_col)
        .join(scores, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_bigrams"), F.lit(0)).alias("n_bigrams"),
            "avg_logprob",
        )
    )


def train_unigram_lm(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    is_train: Column | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Count tables for the add-k UNIGRAM LM over the training slice —
    the weak 'proxy model' in doremi_domain_weights (the bigram LM is
    the stronger reference). Same 80% hash split default as
    train_bigram_lm.

    Returns ``(token_counts[w, c], totals[n, v])`` — one explode +
    groupBy (map-side combine, output bounded by vocabulary) plus a
    2-value fold over that count table.
    """
    from tastytrade_sdk_spark.llmops.textops import h32

    if is_train is None:
        is_train = (
            h32(F.concat(F.lit("split:"), F.col(id_col).cast("string"))) % 100 < 80
        )
    toks = docs.filter(is_train).select(
        F.explode(tokens_expr(text_col)).alias("w")
    )
    counts = toks.groupBy("w").agg(F.count(F.lit(1)).alias("c"))
    totals = counts.agg(
        F.sum("c").alias("n"), F.count(F.lit(1)).alias("v")
    )
    return counts, totals


def score_docs_unigram_lm(
    docs: DataFrame,
    token_counts: DataFrame,
    totals: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """Average token log-probability per document under the add-k
    unigram LM, P(w) = (c(w)+k)/(N+kV). Mirrors score_docs_bigram_lm:
    per-doc token multiplicities, a hash join on the token key, one
    agg back onto the id; empty docs score NULL with n_tokens 0."""
    doc_tok = docs.select(
        F.col(id_col), F.explode(tokens_expr(text_col)).alias("w")
    ).groupBy(id_col, "w").agg(F.count(F.lit(1)).alias("m"))
    terms = (
        doc_tok.join(token_counts, "w", "left")
        .crossJoin(F.broadcast(totals))
        .select(
            F.col(id_col),
            F.col("m"),
            F.log(
                (F.coalesce(F.col("c"), F.lit(0)) + F.lit(k))
                / (F.col("n") + F.lit(k) * F.col("v"))
            ).alias("lp"),
        )
    )
    scores = terms.groupBy(id_col).agg(
        F.sum("m").alias("n_tokens"),
        F.round(F.sum(F.col("m") * F.col("lp")) / F.sum("m"), round_dp).alias(
            "avg_logprob"
        ),
    )
    return (
        docs.select(id_col)
        .join(scores, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "avg_logprob",
        )
    )


def dsir_importance_weights(
    docs: DataFrame,
    is_target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 256,
    k: float = 0.5,
    round_dp: int = 6,
) -> DataFrame:
    """DSIR-style importance weights (Xie et al. 2023, "Data Selection
    for Language Models via Importance Resampling"): score every
    document by how target-domain-like its hashed unigram distribution
    is, w(doc) = mean over tokens of log(p_target(b)/p_background(b)),
    where b = h32('dsir:'||token) % n_buckets and both distributions
    are add-k smoothed bucket frequencies (target = ``is_target`` docs,
    background = whole corpus). Resample by these weights to tilt a
    100 TB crawl toward a high-quality target domain.

    Scale shape: the token explode runs ONCE — it aggregates straight
    to the (doc, bucket) multiplicity table ``doc_b`` (map-side
    combine; lineage-cut with an eager localCheckpoint because THREE
    consumers need it: the bucket count tables, the totals, and the
    scoring join — the r5 form re-derived the explode once per
    consumer, 3 full token passes). Both 256-row distributions fold
    out of doc_b (target mass = the when(__tgt) branch of the same
    sum), totals are one more 1-row agg over those 256 rows, and the
    ratio table BROADCASTS into the scoring join. Nothing driver-side,
    nothing quadratic; the returned frame is a SNAPSHOT (declared-
    query contract: build then execute).

    Output: (id, n_tokens, avg_log_ratio) — NULL score for empty docs.
    """
    from tastytrade_sdk_spark.llmops.textops import h32

    bucket = lambda w: h32(F.concat(F.lit("dsir:"), w)) % n_buckets  # noqa: E731
    tok = docs.select(
        F.col(id_col), is_target.alias("__tgt"),
        F.explode(tokens_expr(text_col)).alias("w"),
    ).select(id_col, "__tgt", bucket(F.col("w")).alias("b"))

    doc_b = tok.groupBy(id_col, "__tgt", "b").agg(
        F.count(F.lit(1)).alias("m")
    ).localCheckpoint(eager=True)
    per_b = doc_b.groupBy("b").agg(
        F.sum("m").alias("cb"),
        F.sum(F.when(F.col("__tgt"), F.col("m")).otherwise(F.lit(0))).alias(
            "ct"
        ),
    )
    tots = per_b.agg(F.sum("cb").alias("nb"), F.sum("ct").alias("nt"))
    # log ratio per bucket: both smoothed over the SAME bucket space,
    # so buckets unseen in the target fall back to the k-mass floor
    ratios = per_b.crossJoin(F.broadcast(tots)).select(
        "b",
        F.log(
            ((F.col("ct") + F.lit(k))
             / (F.col("nt") + F.lit(k) * n_buckets))
            / ((F.col("cb") + F.lit(k))
               / (F.col("nb") + F.lit(k) * n_buckets))
        ).alias("lr"),
    )
    scores = (
        doc_b.join(F.broadcast(ratios), "b")
        .groupBy(id_col)
        .agg(
            F.sum("m").alias("n_tokens"),
            # ratios straddle 0, so the rounded mean can hit the -0.0
            # representation hazard; "+ 0.0" folds it to +0.0
            (
                F.round(F.sum(F.col("m") * F.col("lr")) / F.sum("m"), round_dp)
                + F.lit(0.0)
            ).alias("avg_log_ratio"),
        )
    )
    return (
        docs.select(id_col)
        .join(scores, id_col, "left")
        .select(
            id_col,
            F.coalesce(F.col("n_tokens"), F.lit(0)).alias("n_tokens"),
            "avg_log_ratio",
        )
    )
