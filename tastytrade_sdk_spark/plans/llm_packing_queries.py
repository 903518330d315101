"""Packing / mixture / tokenization queries: sequence packing, NFD bins, splits, DoReMi/UniMax/temperature mixtures, BPE induction+apply, sampling plans.

Split from plans/llm_queries.py (r9); shared helpers live in plans/_llm_base.py and the registry aggregation point stays plans/llm_queries.py.
"""

from __future__ import annotations


from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from tastytrade_sdk_spark.llmops import textops
from tastytrade_sdk_spark.llmops.dedup import (
    default_coeffs,
    exact_duplicates,
    lsh_candidate_pairs,
    minhash_signatures,
    ngram_jaccard_pairs,
    simhash_fingerprints,
)
from tastytrade_sdk_spark.llmops.multimodal import attach_payload_meta
from tastytrade_sdk_spark.llmops.similarity import brute_force_topk, lsh_topk
from tastytrade_sdk_spark.sources.tables import load_table

from tastytrade_sdk_spark.plans._llm_base import (  # noqa: F401
    _H32,
    _LM_SCORE_SQL,
    _LM_SPLIT,
    _QUALITY_SQL,
    _TOKS_CTE,
    _TOKS_SQL,
    _lang_score_sql,
    _q,
    _tokenized_docs,
)

@_q(
    "split_assignment",
    f"""
    SELECT doc_id,
           ({_H32.format(s="'split:' || doc_id")} % 100)::INT AS bucket,
           CASE WHEN {_H32.format(s="'split:' || doc_id")} % 100 < 80 THEN 'train'
                WHEN {_H32.format(s="'split:' || doc_id")} % 100 < 90 THEN 'val'
                ELSE 'test' END AS split
    FROM documents
    """,
)
def split_assignment_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic 80/10/10 train/val/test split by salted id hash —
    stable under corpus growth, engine-independent (md5-derived, not a
    partitioner hash), zero shuffle."""
    from tastytrade_sdk_spark.llmops.pipeline import split_assignment

    docs = load_table(spark, "documents", sf_dir)
    return split_assignment(docs)

@_q(
    "pack_sequences",
    _TOKS_CTE
    + f"""
    , nt AS (
      SELECT doc_id, len(t) AS ntok,
             ({_H32.format(s="'pack:' || doc_id")} % 8)::INT AS shard
      FROM toks
    ), s AS (
      SELECT doc_id, shard, ntok,
             coalesce(sum(ntok) OVER (PARTITION BY shard ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS start
      FROM nt
    )
    SELECT doc_id, shard, start::BIGINT AS start_offset,
           (start // 512)::BIGINT AS pack_id,
           ((start // 512) != ((start + greatest(ntok, 1) - 1) // 512))::BOOLEAN
             AS crosses_boundary
    FROM s
    """,
)
def pack_sequences_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Concat-then-chunk sequence packing into 512-token training
    sequences across 8 hash shards (prefix-sum window per shard)."""
    from tastytrade_sdk_spark.llmops.pipeline import pack_sequences

    docs = _tokenized_docs(spark, sf_dir)
    with_counts = docs.select(
        "doc_id", F.size(F.col("__toks")).alias("n_tokens")
    )
    return pack_sequences(with_counts, "n_tokens", budget=512, n_shards=8)

@_q(
    "nfd_pack_bins",
    # Recursive-CTE replay of the size-class fold: the recursion is
    # over <= 128 size classes (corpus-size independent, the same
    # bound as the Spark side's collected sidecar), NOT over docs —
    # each step consumes one class and carries (open_bin, rem).
    # Standalone WITH RECURSIVE (the shared _TOKS_CTE is plain WITH).
    f"""
    WITH RECURSIVE toks AS (
      SELECT doc_id, text, {_TOKS_SQL} AS t FROM documents
    ), sized AS (
      SELECT doc_id, len(t)::BIGINT AS nt,
             greatest(len(t), 1)::BIGINT AS s
      FROM toks
    ), reg AS (
      SELECT * FROM sized WHERE s <= 128
    ), cls AS (
      SELECT s, count(*)::BIGINT AS c FROM reg GROUP BY s
    ), ord AS MATERIALIZED (
      -- MATERIALIZED: the recursive term references ord each step;
      -- left inline, DuckDB re-runs the whole tokenize->histogram
      -- chain once per iteration (measured 12s -> ~1s at sf0.1)
      SELECT s, c, row_number() OVER (ORDER BY s DESC)::BIGINT AS i
      FROM cls
    ), fold AS (
      SELECT 0::BIGINT AS i, 0::BIGINT AS open_bin, 128::BIGINT AS rem,
             0::BIGINT AS s, 0::BIGINT AS ob, 0::BIGINT AS u,
             1::BIGINT AS k
      UNION ALL
      SELECT o.i,
             CASE WHEN o.c - least(o.c, f.rem // o.s) = 0 THEN f.open_bin
                  ELSE f.open_bin
                       + (o.c - least(o.c, f.rem // o.s) + (128 // o.s) - 1)
                         // (128 // o.s) END,
             CASE WHEN o.c - least(o.c, f.rem // o.s) = 0
                  THEN f.rem - least(o.c, f.rem // o.s) * o.s
                  ELSE 128 - (o.c - least(o.c, f.rem // o.s)
                       - ((o.c - least(o.c, f.rem // o.s) + (128 // o.s) - 1)
                          // (128 // o.s) - 1) * (128 // o.s)) * o.s END,
             o.s, f.open_bin, least(o.c, f.rem // o.s), 128 // o.s
      FROM fold f JOIN ord o ON o.i = f.i + 1
    ), place AS (
      SELECT s, ob, u, k FROM fold WHERE i > 0
    ), tot AS (
      -- packed-bin count; 0 when nothing fit the budget (the i>0
      -- filter drops the seed row so an all-oversize corpus doesn't
      -- leave a phantom empty bin 0)
      SELECT coalesce(max(open_bin) + 1, 0) AS total_bins
      FROM fold WHERE i > 0
    ), ranked AS (
      SELECT doc_id, nt, s,
             row_number() OVER (PARTITION BY s ORDER BY doc_id)::BIGINT AS j
      FROM reg
    )
    SELECT r.doc_id, r.nt AS n_tokens,
           CASE WHEN r.j <= p.u THEN p.ob
                ELSE p.ob + 1 + (r.j - p.u - 1) // p.k END AS bin_id,
           FALSE AS oversize
    FROM ranked r JOIN place p USING (s)
    UNION ALL
    SELECT doc_id, nt AS n_tokens,
           (SELECT total_bins FROM tot)
             + row_number() OVER (ORDER BY s DESC, doc_id) - 1 AS bin_id,
           TRUE AS oversize
    FROM sized WHERE s > 128
    """,
)
def nfd_pack_bins_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boundary-respecting NFD bin packing of documents into 128-token
    training sequences (docs never straddle a boundary — the SFT
    packing policy; pack_sequences is the concat-then-chunk twin)."""
    from tastytrade_sdk_spark.llmops.pipeline import nfd_pack_bins

    docs = _tokenized_docs(spark, sf_dir)
    with_counts = docs.select(
        "doc_id", F.size(F.col("__toks")).alias("n_tokens")
    )
    return nfd_pack_bins(with_counts, "n_tokens", budget=128)

@_q(
    "mixture_sample_manifest",
    _TOKS_CTE
    + f"""
    , lang AS (
      SELECT doc_id, len(t) AS n_tokens,
             CASE WHEN greatest(s_de, s_en, s_es, s_fr) = 0 THEN 'und'
                  WHEN s_de = greatest(s_de, s_en, s_es, s_fr) THEN 'de'
                  WHEN s_en = greatest(s_de, s_en, s_es, s_fr) THEN 'en'
                  WHEN s_es = greatest(s_de, s_en, s_es, s_fr) THEN 'es'
                  ELSE 'fr' END AS lang,
             {_QUALITY_SQL} AS quality
      FROM (SELECT doc_id, t, text,
                   {_lang_score_sql('de')} AS s_de,
                   {_lang_score_sql('en')} AS s_en,
                   {_lang_score_sql('es')} AS s_es,
                   {_lang_score_sql('fr')} AS s_fr
            FROM toks)
    ), ranked AS (
      SELECT doc_id, lang, quality, n_tokens,
             row_number() OVER wql AS rn,
             count(*) OVER (PARTITION BY lang) AS n_lang,
             (sum(n_tokens) OVER (wql ROWS BETWEEN UNBOUNDED PRECEDING
                                  AND CURRENT ROW))::BIGINT AS cum_tokens
      FROM lang
      WINDOW wql AS (PARTITION BY lang ORDER BY quality DESC, doc_id)
    )
    SELECT doc_id, lang, quality, n_tokens, rn, cum_tokens
    FROM ranked WHERE rn <= ceil(0.3 * n_lang)
    """,
)
def mixture_sample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic mixture construction: per language, keep the top
    30% of documents by (quality desc, id) with a running token budget
    along the selection order — how a training mixture is actually
    assembled (quota per source, quality-ranked, token-accounted).
    Rank-quota selection instead of random sampling keeps the manifest
    reproducible and engine-independent."""
    from tastytrade_sdk_spark.llmops.textops import (
        predicted_lang,
        quality_score,
    )

    toked = _tokenized_docs(spark, sf_dir)
    t = F.col("__toks")
    base = toked.select(
        "doc_id",
        F.size(t).alias("n_tokens"),
        predicted_lang(t).alias("lang"),
        F.round(quality_score(t, F.col("text")), 6).alias("quality"),
    )
    w = Window.partitionBy("lang").orderBy(F.col("quality").desc(), "doc_id")
    ranked = base.select(
        "doc_id", "lang", "quality", "n_tokens",
        F.row_number().over(w).alias("rn"),
        F.count(F.lit(1)).over(Window.partitionBy("lang")).alias("n_lang"),
        F.sum("n_tokens")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cum_tokens"),
    )
    return ranked.filter(
        F.col("rn") <= F.ceil(F.lit(0.3) * F.col("n_lang"))
    ).select("doc_id", "lang", "quality", "n_tokens", "rn", "cum_tokens")

def _bpe_oracle_sql() -> str:
    from tastytrade_sdk_spark.llmops.textops import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH bt AS (
      SELECT doc_id, regexp_extract_all(text, '{pat}') AS toks
      FROM documents
    )
    SELECT doc_id,
           len(toks) AS n_bpe_tokens,
           len(list_filter(toks, x -> NOT regexp_matches(x, '^\\s+$')))
             AS n_content_tokens,
           md5(array_to_string(toks, chr(31))) AS segmentation_hash
    FROM bt
    """

def _fertility_oracle_sql() -> str:
    from tastytrade_sdk_spark.llmops.textops import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH bt AS (
      SELECT lang,
             length(text) AS nc,
             len(regexp_extract_all(text, '{pat}')) AS nb,
             len({_TOKS_SQL}) AS nw
      FROM documents
    )
    SELECT lang, count(*)::BIGINT AS n_docs,
           sum(nc)::BIGINT AS n_chars,
           sum(nb)::BIGINT AS n_bpe_tokens,
           sum(nw)::BIGINT AS n_words,
           round(sum(nc) * 1.0 / greatest(sum(nb), 1), 6) AS chars_per_token,
           round(sum(nb) * 1.0 / greatest(sum(nw), 1), 6) AS tokens_per_word
    FROM bt GROUP BY lang
    """

@_q("tokenizer_fertility_per_lang", _fertility_oracle_sql())
def tokenizer_fertility_per_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility diagnostics per language: chars per BPE-ish
    token (compression) and BPE tokens per whitespace word (fertility)
    — the standard per-language tokenizer-quality report a multilingual
    pipeline tracks, since high-fertility languages pay more sequence
    budget per word. All-integer sums; the two ratios divide exact
    longs. One scan + one tiny groupBy."""
    from tastytrade_sdk_spark.llmops.textops import bpe_ish_tokens

    docs = load_table(spark, "documents", sf_dir)
    bt = docs.select(
        "lang",
        F.length("text").alias("nc"),
        F.size(bpe_ish_tokens(F.col("text"))).alias("nb"),
        F.size(textops.tokens_expr(F.col("text"))).alias("nw"),
    )
    return bt.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("nc").alias("n_chars"),
        F.sum("nb").alias("n_bpe_tokens"),
        F.sum("nw").alias("n_words"),
        F.round(
            F.sum("nc") / F.greatest(F.sum("nb"), F.lit(1)), 6
        ).alias("chars_per_token"),
        F.round(
            F.sum("nb") / F.greatest(F.sum("nw"), F.lit(1)), 6
        ).alias("tokens_per_word"),
    )

@_q("bpe_token_stats", _bpe_oracle_sql())
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-style pre-tokenization budget stats: token counts under the
    GPT-2-style segmentation (restricted to Java-regex/RE2-common
    syntax) plus an md5 over the full token sequence, so the two
    engines must agree on every boundary, not just the counts."""
    from tastytrade_sdk_spark.llmops.textops import bpe_ish_tokens

    docs = load_table(spark, "documents", sf_dir)
    bt = bpe_ish_tokens(F.col("text"))
    return docs.select(
        "doc_id",
        F.size(bt).alias("n_bpe_tokens"),
        F.size(
            F.filter(bt, lambda x: ~x.rlike(r"^\s+$"))
        ).alias("n_content_tokens"),
        F.md5(F.concat_ws(chr(31), bt)).alias("segmentation_hash"),
    )

def _bpe_merge_oracle_sql() -> str:
    from tastytrade_sdk_spark.llmops.textops import BPE_ISH_PATTERN

    pat = BPE_ISH_PATTERN.replace("'", "''")
    return f"""
    WITH pt AS (
      SELECT unnest(regexp_extract_all(text, '{pat}')) AS t FROM documents
    ), nw AS (
      SELECT t FROM pt WHERE NOT regexp_matches(t, '^[\\t\\n\\f\\r ]+$')
    ), pairs AS (
      SELECT substring(t, i, 2) AS pair
      FROM nw, unnest(generate_series(1, length(t) - 1)) AS g(i)
      WHERE length(t) >= 2
    ), c AS (
      SELECT pair, count(*) AS cnt FROM pairs GROUP BY pair
    )
    SELECT row_number() OVER (ORDER BY cnt DESC, pair ASC) AS rnk, pair, cnt
    FROM c
    QUALIFY rnk <= 20
    """

@_q("bpe_merge_candidates", _bpe_merge_oracle_sql())
def bpe_merge_candidates_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One BPE-training induction round: corpus-wide adjacent
    character-pair counts inside pre-token occurrences, top-20 merge
    candidates (count desc, pair asc). The distributed primitive the
    full merge loop repeats; pair cardinality is alphabet^2-bounded so
    the final ranking window is tiny at any scale."""
    from tastytrade_sdk_spark.llmops.pipeline import bpe_merge_candidates

    docs = load_table(spark, "documents", sf_dir)
    return bpe_merge_candidates(docs, top_k=20)

@_q(
    "doremi_domain_weights",
    # bigram scoring replayed via the shared _LM_SCORE_SQL subquery
    # (its internal `toks` is shadowed inside the subquery, the ccnet
    # wrapping trick); unigram twin inline. All cross-doc sums run on
    # 6-dp micro-unit BIGINTs, so every aggregate is order-free exact.
    f"""
    WITH bsc AS (
      SELECT * FROM ({_LM_SCORE_SQL})
    ), toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), uc AS (
      SELECT w, count(*) AS c
      FROM (SELECT doc_id, unnest(t) AS w FROM toks) WHERE {_LM_SPLIT}
      GROUP BY 1
    ), ut AS (
      SELECT sum(c)::BIGINT AS n, count(*)::BIGINT AS v FROM uc
    ), docu AS (
      SELECT doc_id, w, count(*) AS m
      FROM (SELECT doc_id, unnest(t) AS w FROM toks) GROUP BY 1, 2
    ), uterms AS (
      SELECT doc_id, m,
             ln((coalesce(c, 0) + 0.5) / (n + 0.5 * v)) AS lp
      FROM docu LEFT JOIN uc USING (w) CROSS JOIN ut
    ), usc0 AS (
      SELECT doc_id, sum(m)::BIGINT AS n_tokens,
             round(sum(m * lp) / sum(m), 6) AS avg_logprob
      FROM uterms GROUP BY 1
    ), usc AS (
      SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens, avg_logprob
      FROM documents d LEFT JOIN usc0 USING (doc_id)
    ), perdoc AS (
      SELECT d.source, u.n_tokens,
             CASE WHEN u.avg_logprob IS NOT NULL
                   AND b.avg_logprob IS NOT NULL THEN 1 ELSE 0 END AS sc,
             CAST(round(u.avg_logprob * 1000000, 0) AS BIGINT) AS ui,
             CAST(round(b.avg_logprob * 1000000, 0) AS BIGINT) AS bi
      FROM documents d
      JOIN usc u ON d.doc_id = u.doc_id
      JOIN bsc b ON d.doc_id = b.doc_id
    ), agg AS (
      SELECT source, count(*)::BIGINT AS n_docs,
             sum(n_tokens)::BIGINT AS n_tokens,
             sum(sc)::BIGINT AS ns,
             coalesce(sum(CASE WHEN sc = 1 THEN ui END), 0)::BIGINT AS su,
             coalesce(sum(CASE WHEN sc = 1 THEN bi END), 0)::BIGINT AS sb
      FROM perdoc GROUP BY 1
    ), tot AS (
      SELECT sum(n_tokens)::BIGINT AS tt, count(*)::BIGINT AS kk FROM agg
    ), stage AS (
      SELECT source, n_docs, n_tokens, tt, kk,
             round(CASE WHEN ns > 0 AND (sb - su) > 0
                        THEN (sb - su) / ns / 1000000.0
                        ELSE 0.0 END, 6) AS excess_loss
      FROM agg CROSS JOIN tot
    ), stage2 AS (
      SELECT *,
             CAST(round(round((n_tokens * 1.0 / tt)
                              * exp(1.0 * excess_loss), 6)
                        * 1000000, 0) AS BIGINT) AS wi
      FROM stage
    ), nrm AS (
      SELECT sum(wi)::BIGINT AS norm FROM stage2
    )
    SELECT source, n_docs, n_tokens,
           round(n_tokens * 1.0 / tt, 6) AS alpha0,
           excess_loss,
           round(0.8 * wi / norm + 0.2 / kk, 6) AS alpha1
    FROM stage2 CROSS JOIN nrm
    """,
)
def doremi_domain_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi mixture-reweighting step over the source domains:
    unigram proxy vs bigram reference excess loss -> multiplicative
    update of the token-share mixture, smoothed toward uniform."""
    from tastytrade_sdk_spark.llmops.pipeline import doremi_domain_weights

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    return doremi_domain_weights(docs, eta=1.0, smooth=0.2)

@_q(
    "dsir_importance_weights",
    f"""
    WITH tok AS (
      SELECT doc_id, source = 'src0' AS tgt,
             {_H32.format(s="'dsir:' || w")} % 256 AS b
      FROM (SELECT doc_id, source, unnest({_TOKS_SQL}) AS w FROM documents)
    ), tgt AS (
      SELECT b, count(*) AS ct FROM tok WHERE tgt GROUP BY 1
    ), bg AS (
      SELECT b, count(*) AS cb FROM tok GROUP BY 1
    ), tot AS (SELECT sum(cb) AS nb FROM bg),
    ntgt AS (SELECT sum(ct) AS nt FROM tgt),
    ratios AS (
      SELECT b,
             ln(((coalesce(ct, 0) + 0.5) / (nt + 0.5 * 256))
                / ((cb + 0.5) / (nb + 0.5 * 256))) AS lr
      FROM bg LEFT JOIN tgt USING (b) CROSS JOIN tot CROSS JOIN ntgt
    ), docb AS (
      SELECT doc_id, b, count(*) AS m FROM tok GROUP BY 1, 2
    ), sc AS (
      SELECT doc_id, sum(m)::BIGINT AS n_tokens,
             round(sum(m * lr) / sum(m), 6) + 0.0 AS avg_log_ratio
      FROM docb JOIN ratios USING (b) GROUP BY 1
    )
    SELECT d.doc_id, coalesce(n_tokens, 0) AS n_tokens, avg_log_ratio
    FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id
    """,
)
def dsir_importance_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR domain-selection weights: target = source 'src0' docs,
    background = whole corpus, hashed-unigram (256-bucket) smoothed
    log-ratio averaged per doc. Bucket maps broadcast; per-doc pass is
    one agg — the importance-resampling precursor to a mixture tilt
    (llmops/lm.py:dsir_importance_weights scale notes)."""
    from tastytrade_sdk_spark.llmops.lm import dsir_importance_weights

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    return dsir_importance_weights(docs, F.col("source") == "src0")

@_q(
    "stratified_sample_perlang",
    """
    SELECT lang, doc_id, sample_rank FROM (
      SELECT lang, doc_id,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY ('0x' || substring(md5('strat-v1:' ||
                         CAST(doc_id AS VARCHAR)), 1, 15))::BIGINT,
                        doc_id
             ) AS sample_rank
      FROM documents
    ) WHERE sample_rank <= 25
    """,
)
def stratified_sample_perlang(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-language eval sample: 25 smallest salted
    hashes per stratum (llmops/pipeline.stratified_hash_sample) —
    reproducible across engines and stable under corpus growth, the
    sampling discipline an eval/inspection pipeline needs."""
    from tastytrade_sdk_spark.llmops.pipeline import stratified_hash_sample

    docs = load_table(spark, "documents", sf_dir)
    return stratified_hash_sample(docs, ["lang"], "doc_id", 25).select(
        "lang", "doc_id", "sample_rank"
    )

@_q(
    "split_distribution_drift",
    f"""
    WITH s AS (
      SELECT d.lang,
             CASE WHEN {_H32.format(s="'split:' || doc_id")} % 100 < 80
                  THEN 'train'
                  WHEN {_H32.format(s="'split:' || doc_id")} % 100 < 90
                  THEN 'val' ELSE 'test' END AS split
      FROM documents d
    ), counts AS (
      SELECT lang,
             count(CASE WHEN split = 'train' THEN 1 END) AS n_train,
             count(CASE WHEN split = 'val' THEN 1 END)   AS n_val
      FROM s GROUP BY lang
    ), tot AS (
      SELECT lang, n_train, n_val,
             sum(n_train) OVER () AS t_train, sum(n_val) OVER () AS t_val
      FROM counts
    )
    SELECT lang, n_train, n_val,
           round(CAST(n_train AS DOUBLE) / t_train, 6) AS p_train,
           round(CAST(n_val AS DOUBLE) / t_val, 6)     AS p_val,
           round(CASE WHEN n_train > 0 AND n_val > 0 THEN
                   (CAST(n_train AS DOUBLE) / t_train) *
                   ln((CAST(n_train AS DOUBLE) / t_train) /
                      (CAST(n_val AS DOUBLE) / t_val))
                 END, 6) AS kl_term,
           round(abs(CAST(n_train AS DOUBLE) / t_train -
                     CAST(n_val AS DOUBLE) / t_val) / 2, 6) AS tv_term
    FROM tot
    """,
)
def split_distribution_drift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Held-out-split drift monitor: per-language KL and total-variation
    contributions between the train and val distributions (the check a
    training pipeline runs after any sampling/filter change — held-out
    mix silently diverging from train is a classic eval bug). One
    grouped pass + a scalar window; no joins."""
    from tastytrade_sdk_spark.llmops.pipeline import split_assignment

    docs = load_table(spark, "documents", sf_dir)
    s = docs.join(split_assignment(docs), "doc_id").select("lang", "split")
    counts = s.groupBy("lang").agg(
        F.count(F.when(F.col("split") == "train", 1)).alias("n_train"),
        F.count(F.when(F.col("split") == "val", 1)).alias("n_val"),
    )
    from pyspark.sql import Window

    tot = Window.partitionBy()
    p = F.col("n_train").cast("double") / F.sum("n_train").over(tot)
    q = F.col("n_val").cast("double") / F.sum("n_val").over(tot)
    return counts.select(
        "lang",
        "n_train",
        "n_val",
        F.round(p, 6).alias("p_train"),
        F.round(q, 6).alias("p_val"),
        F.round(
            F.when((F.col("n_train") > 0) & (F.col("n_val") > 0), p * F.log(p / q)),
            6,
        ).alias("kl_term"),
        F.round(F.abs(p - q) / 2, 6).alias("tv_term"),
    )

@_q(
    "doc_chunking",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), bounds AS (
      SELECT doc_id, t, len(t) AS n,
             greatest(1, len(t) - 64 + 48) AS last_start
      FROM toks
    ), chunks AS (
      SELECT doc_id, n,
             CAST(g.s AS INT) AS start_tok,
             list_slice(t, g.s, least(g.s + 63, n)) AS chunk
      FROM bounds, unnest(range(1, last_start + 1, 48)) AS g(s)
      WHERE n > 0
    )
    SELECT doc_id,
           CAST((start_tok - 1) / 48 AS INT) AS chunk_idx,
           len(chunk) AS n_chunk_tokens,
           md5(array_to_string(chunk, ' ')) AS chunk_hash
    FROM chunks
    """,
)
def doc_chunking(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RAG/training chunking: overlapping token windows (size 64,
    stride 48) with stable content hashes. Start positions run to
    len - size + stride so the tail is always covered; one projection
    + explode, no shuffle at all — chunking is embarrassingly parallel
    and stays that way at any corpus size."""
    docs = _tokenized_docs(spark, sf_dir)
    size, stride = 64, 48
    n = F.size(F.col("__toks"))
    starts = F.sequence(
        F.lit(1), F.greatest(F.lit(1), n - size + stride), F.lit(stride)
    )
    ex = docs.filter(n > 0).select(
        "doc_id",
        n.alias("n"),
        F.col("__toks").alias("t"),
        F.explode(starts).alias("start_tok"),
    )
    chunk = F.slice(F.col("t"), F.col("start_tok"), F.lit(size))
    return ex.select(
        "doc_id",
        ((F.col("start_tok") - 1) / stride).cast("int").alias("chunk_idx"),
        F.size(chunk).alias("n_chunk_tokens"),
        F.md5(F.array_join(chunk, " ")).alias("chunk_hash"),
    )

_SHUFFLE_ORACLE = """
    WITH k AS (
      SELECT doc_id,
             md5('shuf-v1:' || CAST(doc_id AS VARCHAR)) AS shuffle_key
      FROM documents
    ), s AS (
      SELECT doc_id, shuffle_key,
             (('0x' || substring(shuffle_key, 1, 8))::BIGINT) % 64
               AS shard
      FROM k
    ), p AS (
      SELECT doc_id, shuffle_key, shard,
             CAST(row_number() OVER (
                    PARTITION BY shard ORDER BY shuffle_key, doc_id
                  ) - 1 AS BIGINT) AS pos_in_shard
      FROM s
    ), sz AS (
      SELECT shard, count(*) AS n FROM s GROUP BY shard
    ), off AS (
      SELECT shard,
             CAST(coalesce(sum(n) OVER (
                    ORDER BY shard
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                  ), 0) AS BIGINT) AS shard_offset
      FROM sz
    )
    SELECT p.doc_id, p.shuffle_key,
           CAST(p.shard AS BIGINT) AS shard, p.pos_in_shard,
           p.pos_in_shard + off.shard_offset AS global_pos
    FROM p JOIN off USING (shard)
"""

@_q("training_shuffle_order", _SHUFFLE_ORACLE)
def training_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic global training order without a single-task global
    sort: hash-sharded local enumeration + broadcast shard offsets
    reconstruct an exact corpus-wide position (see
    llmops/pipeline.training_shuffle for the 100 TB rationale)."""
    from tastytrade_sdk_spark.llmops.pipeline import training_shuffle

    return training_shuffle(load_table(spark, "documents", sf_dir))

_TEMP_RESAMPLE_ORACLE = f"""
    WITH c AS (
      SELECT lang, CAST(count(*) AS BIGINT) AS n_g FROM documents
      WHERE lang IS NOT NULL GROUP BY lang
    ), w AS (
      SELECT lang, n_g, CAST(floor(sqrt(n_g)) AS BIGINT) AS w_g FROM c
    ), t AS (
      SELECT CAST(sum(w_g) AS BIGINT) AS w_sum,
             CAST(sum(n_g) AS BIGINT) AS n_total
      FROM w
    ), tg AS (
      SELECT lang, n_g,
             CAST((n_total * w_g) // w_sum AS BIGINT) AS target_g
      FROM w, t
    )
    SELECT d.doc_id, d.lang, tg.n_g, tg.target_g,
           CAST(tg.target_g // tg.n_g
                + CASE WHEN {_H32.format(s="'tsamp:' || d.doc_id")} % tg.n_g
                            < tg.target_g % tg.n_g
                       THEN 1 ELSE 0 END AS BIGINT) AS n_copies
    FROM documents d JOIN tg ON tg.lang = d.lang
"""

@_q("temperature_resample_manifest", _TEMP_RESAMPLE_ORACLE)
def temperature_resample_manifest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T=2 temperature mixture resampling (weight ∝ sqrt(group size),
    the standard multilingual upsampling recipe): rare languages get
    whole repeats plus a deterministic hash lottery for the fractional
    remainder; dominant languages subsample. All-integer arithmetic —
    no float boundary for engines to disagree on. One tiny per-group
    aggregate broadcast back onto the scan; the corpus never
    shuffles."""
    from tastytrade_sdk_spark.llmops.pipeline import temperature_resample

    return temperature_resample(
        load_table(spark, "documents", sf_dir), group_col="lang"
    )

_LENGTH_BATCH_ORACLE = (
    _TOKS_CTE
    + """
    , c AS (
      SELECT doc_id, CAST(len(t) AS BIGINT) AS n_tokens,
             CASE WHEN len(t) <= 64 THEN 0
                  WHEN len(t) <= 128 THEN 1
                  WHEN len(t) <= 256 THEN 2
                  WHEN len(t) <= 512 THEN 3
                  WHEN len(t) <= 1024 THEN 4
                  ELSE 5 END AS bucket
      FROM toks WHERE len(t) IS NOT NULL
    ), seq AS (
      SELECT doc_id, n_tokens, CAST(bucket AS INT) AS bucket,
             row_number() OVER (PARTITION BY bucket
               ORDER BY n_tokens, doc_id) AS rn
      FROM c
    ), b AS (
      SELECT doc_id, n_tokens, bucket,
             CAST((rn - 1) // 32 AS BIGINT) AS batch_id,
             CAST(rn AS BIGINT) AS pos_in_bucket
      FROM seq
    )
    SELECT doc_id, n_tokens, bucket, batch_id, pos_in_bucket,
           max(n_tokens) OVER wb AS batch_max_tokens,
           CAST(count(*) OVER wb AS BIGINT) AS batch_rows
    FROM b
    WINDOW wb AS (PARTITION BY bucket, batch_id)
    """
)

@_q("length_bucketed_batches", _LENGTH_BATCH_ORACLE)
def length_bucketed_batches_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Padding-efficient batch assignment: docs bucketed by token
    length, enumerated into 32-doc batches within each bucket with a
    deterministic (length, id) order, plus per-batch max-length and
    row-count for padding-waste accounting."""
    from tastytrade_sdk_spark.llmops.pipeline import length_bucketed_batches

    toked = _tokenized_docs(spark, sf_dir).select(
        "doc_id", F.size("__toks").alias("__nt")
    )
    return length_bucketed_batches(toked, "__nt", batch_size=32)

def _bpe_oracle() -> str:
    """Unrolled BPE replay: each merge round is ONE MATERIALIZED CTE
    applying the same dual-dialect round expression
    (llmops/pipeline.bpe_round_sql) the Spark kernel implements —
    identical rank table, identical chain-parity merge rule."""
    from tastytrade_sdk_spark.llmops.pipeline import (
        BPE_DEFAULT_MERGES,
        BPE_MAX_ROUNDS,
        bpe_round_sql,
    )

    rnd = bpe_round_sql(BPE_DEFAULT_MERGES, "duckdb")
    ctes = [
        """vocab AS (
      SELECT DISTINCT word
      FROM (SELECT unnest(t) AS word FROM toks)
    ),
    r0 AS MATERIALIZED (
      SELECT word, string_split(word, '') AS t FROM vocab
    )"""
    ]
    for i in range(1, BPE_MAX_ROUNDS + 1):
        ctes.append(
            f"r{i} AS MATERIALIZED (SELECT word, {rnd} AS t FROM r{i - 1})"
        )
    return (
        _TOKS_CTE
        + ", "
        + ",\n    ".join(ctes)
        + f"""
    SELECT word, array_to_string(t, ' ') AS pieces,
           CAST(len(t) AS BIGINT) AS n_pieces
    FROM r{BPE_MAX_ROUNDS}
    """
    )

@_q("bpe_encode_vocab", _bpe_oracle())
def bpe_encode_vocab(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE tokenizer APPLY (the other half of bpe_merge_candidates:
    encode with a trained merge table): the corpus vocabulary is
    encoded once by the sanctioned Arrow kernel
    (llmops/pipeline.bpe_encode_kernel — lowest-rank pair per round,
    all non-overlapping occurrences merged left-to-right, 12 rounds)
    and at scale joins back to the corpus by word — vocab-sized work,
    not corpus-sized. The oracle unrolls the identical rounds as
    MATERIALIZED CTEs via the shared dual-dialect round expression;
    the declarative Spark twin is equivalence-tested in
    tests/test_bpe.py."""
    from tastytrade_sdk_spark.llmops.pipeline import bpe_encode_kernel

    docs = _tokenized_docs(spark, sf_dir)
    vocab = docs.select(
        F.explode(F.col("__toks")).alias("word")
    ).distinct()
    arr = bpe_encode_kernel()(F.col("word"))
    return vocab.select(
        "word",
        F.concat_ws(" ", arr).alias("pieces"),
        F.size(arr).cast("long").alias("n_pieces"),
    )

@_q(
    "weighted_doc_sample",
    """
    WITH keyed AS (
      SELECT lang, doc_id, greatest(n_chars, 1) AS weight_used,
             ('0x' || substring(md5('prio-v1:' || CAST(doc_id AS VARCHAR)),
                                1, 15))::BIGINT AS u
      FROM documents
    ), pr AS (
      SELECT lang, doc_id, weight_used,
             u // weight_used AS priority,
             row_number() OVER (
               PARTITION BY lang
               ORDER BY u // weight_used, doc_id) AS sample_rank
      FROM keyed
    )
    SELECT lang, doc_id, weight_used, priority, sample_rank
    FROM pr WHERE sample_rank <= 20
    """,
)
def weighted_doc_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-weighted 20-doc sample per language via integer priority
    sampling (Duffield-Lund-Thorup) — the deterministic weighted
    counterpart of stratified_sample_perlang; longer documents are
    proportionally likelier to be drawn, and the all-integer priority
    makes the boundary rows bit-stable across engines."""
    from tastytrade_sdk_spark.llmops.pipeline import priority_sample

    docs = load_table(spark, "documents", sf_dir)
    return priority_sample(
        docs, ["lang"], "doc_id", "n_chars", k=20, salt="prio-v1"
    )

_UNIMAX_BUDGET = 3_000_000

_UNIMAX_EPOCHS = 2

@_q(
    "unimax_language_budget",
    f"""
    WITH caps AS (
      SELECT lang, CAST(sum(n_chars) AS BIGINT) * {_UNIMAX_EPOCHS} AS capacity
      FROM documents GROUP BY lang
    ), st AS (
      SELECT lang, capacity,
             row_number() OVER (ORDER BY capacity, lang) AS i,
             CAST(count(*) OVER () AS BIGINT) AS n,
             CAST(coalesce(sum(capacity) OVER (
               ORDER BY capacity, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
             AS BIGINT) AS p_prev
      FROM caps
    ), flag AS (
      SELECT *,
             greatest({_UNIMAX_BUDGET} - p_prev, 0) // (n - i + 1) AS t_i
      FROM st
    ), pref AS (
      SELECT *,
             min(CASE WHEN capacity <= t_i THEN 1 ELSE 0 END) OVER (
               ORDER BY capacity, lang
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cap_i
      FROM flag
    ), tot AS (
      SELECT CAST(sum(CASE WHEN cap_i = 1 THEN capacity ELSE 0 END)
                  AS BIGINT) AS p_k,
             CAST(sum(cap_i) AS BIGINT) AS k,
             CAST(max(n) AS BIGINT) AS n_tot
      FROM pref
    )
    SELECT lang, capacity,
           CAST(CASE WHEN cap_i = 1 THEN capacity
                ELSE greatest({_UNIMAX_BUDGET} - p_k, 0) // (n_tot - k)
                     + CASE WHEN i - k <=
                           greatest({_UNIMAX_BUDGET} - p_k, 0) % (n_tot - k)
                       THEN 1 ELSE 0 END
                END AS BIGINT) AS allocated,
           cap_i = 1 AS capped
    FROM pref, tot
    """,
)
def unimax_language_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UniMax (Chung et al. 2023) token-budget allocation across the
    corpus languages: every language capped at 2 epochs of its
    character volume, the rest of the 3M-char budget waterfilled
    uniformly over the uncapped languages (closed-form threshold, all
    integer — see llmops/pipeline.unimax_allocation)."""
    from tastytrade_sdk_spark.llmops.pipeline import unimax_allocation

    docs = load_table(spark, "documents", sf_dir)
    return unimax_allocation(
        docs,
        "lang",
        "n_chars",
        total_budget=_UNIMAX_BUDGET,
        epoch_cap=_UNIMAX_EPOCHS,
    )

@_q(
    "span_corruption_plan",
    _TOKS_CTE
    + """
    , pl AS (
      SELECT doc_id, len(t) AS n_tokens,
             (len(t) * 150) // 3000 AS n_spans
      FROM toks
    ), sp AS (
      SELECT doc_id, n_tokens, n_spans, i AS span_idx,
             (i * n_tokens) // n_spans AS ss,
             ((i + 1) * n_tokens) // n_spans AS se
      FROM pl, unnest(generate_series(0, n_spans - 1)) AS g(i)
      WHERE n_spans >= 1
    )
    SELECT doc_id, span_idx,
           CAST(ss + ('0x' || substring(md5('spanc-v1:' ||
                  CAST(doc_id AS VARCHAR) || ':' ||
                  CAST(span_idx AS VARCHAR)), 1, 8))::BIGINT
                % (se - ss - least(3, se - ss) + 1) AS BIGINT) AS start_tok,
           CAST(least(3, se - ss) AS BIGINT) AS len_tok,
           CAST(n_tokens AS BIGINT) AS n_tokens
    FROM sp
    """,
)
def span_corruption_plan_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 span-corruption mask plan over the documents table: ~15%
    of tokens in non-overlapping ~3-token spans, one sentinel per
    span, deterministic across engines (segment-local hash offsets —
    see llmops/pipeline.span_corruption_plan)."""
    from tastytrade_sdk_spark.llmops.pipeline import span_corruption_plan

    docs = load_table(spark, "documents", sf_dir)
    return span_corruption_plan(
        docs, "doc_id", "text", density_permille=150, mean_span=3,
        salt="spanc-v1",
    )
