"""Merged query/oracle registry.

Declaration ORDER matters: the driver's per-round correctness gate
samples the FIRST 50 declared queries (verified against
CORRECTNESS_r01..r08 — sample indices are always exactly 0..49 of
``__spark_entry__.queries()``). ``_SAMPLE_WINDOW`` below pins that
window explicitly and is ROTATED each round onto names no prior
round's CORRECTNESS record attested (r8 pinned the first representative
LLM cross-section; r9 rotates fully onto never-attested names), so the
whole registry converges to driver-attested; everything else follows
in its original declared order. The rotation contract is enforced by
tests/test_full_gate.py::test_driver_sample_window_is_rotated_and_representative.
"""

from tastytrade_sdk_spark.plans.domain_queries import (
    DOMAIN_ORACLE_SQL,
    DOMAIN_QUERIES,
)
from tastytrade_sdk_spark.plans.kernel_queries import (
    KERNEL_ORACLE_SQL,
    KERNEL_QUERIES,
)
from tastytrade_sdk_spark.plans.llm_queries import LLM_ORACLE_SQL, LLM_QUERIES
from tastytrade_sdk_spark.plans.queries import ORACLE_SQL, QUERIES

# Bench-side oracle splits for search-only [Q]s (r10 advisor, medium):
# {name: {"setup": [sql...], "timed": sql}} — the setup materializes
# the index-equivalent into DuckDB temp tables untimed, mirroring the
# Spark side's pre-built fixture; only "timed" enters the bench oracle
# clock. Correctness gates always use ORACLE_SQL (full end-to-end).
from tastytrade_sdk_spark.plans.llm_ann_queries import (
    BENCH_ORACLE_SPLIT as _ANN_SPLIT,
)
from tastytrade_sdk_spark.plans.llm_retrieval_queries import (
    BENCH_ORACLE_SPLIT as _RETR_SPLIT,
)

ORACLE_BENCH_SPLIT: dict[str, dict] = {**_ANN_SPLIT, **_RETR_SPLIT}

QUERIES.update(LLM_QUERIES)
ORACLE_SQL.update(LLM_ORACLE_SQL)
QUERIES.update(KERNEL_QUERIES)
ORACLE_SQL.update(KERNEL_ORACLE_SQL)
QUERIES.update(DOMAIN_QUERIES)
ORACLE_SQL.update(DOMAIN_ORACLE_SQL)

# The driver-sampled window, ROTATED per round (r8 judge item 1):
# rounds 1-9 attested 157 distinct queries, leaving 71 never sampled.
# This r10 window takes 45 of those 71 (5 TPC-H stragglers, all 7
# remaining domain queries, 33 LLM-pipeline queries spanning dedup /
# ANN / retrieval / quality / mixtures / chunking / multimodal, plus
# the new search-only graph-index [Q]) — the maximum the rotation
# guard's family floors allow, since only 5 core names remain
# unattested and the floor requires 10 core slots; the other 5 core
# slots are cheap already-attested re-confirmations. 27 names remain
# for r11, at which point rotation is complete (assuming the driver
# attests this window; recompute as registry minus the union of
# CORRECTNESS_r*.json keys): ngram_containment_pairs,
# corpus_snapshot_diff, dup_shingle_fraction, prototypes_prune,
# frequent_span_removal, segment_dedup_rebuild, soft_dedup_weights,
# dedup_best_canonical, embedding_quantize_int8, similar_docs_topk,
# hard_negatives_topk, doc_embedding_pool, rendezvous_reshard,
# tfidf_top_terms, rag_chunk_documents, bm25_more_like_this,
# corpus_language_cube, repetition_stats, source_quality_rollup,
# ngram_topk_per_lang, vocab_oov_rate, hashed_classifier_scores,
# mixture_sample_manifest, split_distribution_drift,
# training_shuffle_order, length_bucketed_batches,
# span_corruption_plan.
_SAMPLE_WINDOW = [
    # TPC-H stragglers — the last 5 never-attested core queries
    "large_volume_customers",
    "brand_size_disjunct_revenue",
    "small_quantity_revenue",
    "forecast_revenue_change",
    "shipmode_priority_counts",
    # core re-confirmations (already attested; fill the 10-core floor)
    "pricing_summary",
    "latest_event_per_user",
    "interval_floor_5m",
    "top3_values_per_user",
    "weekday_order_counts",
    # domain remainder (7)
    "props_json_parse",
    "channel_pattern_filter",
    "strategy_health_alerts",
    "rollup_order_revenue",
    "session_window_activity",
    "sliding_window_counts",
    "salted_skew_aggregate",
    # dedup remainder (11)
    "winnowing_fingerprints",
    "winnowing_overlap_pairs",
    "cdc_chunk_dedup",
    "cross_snapshot_dedup",
    "dedup_tier_policy",
    "semdedup_keep_scaled",
    "d4_curation",
    "contamination_check",
    "contamination_near_dup",
    "dedup_normalized_text",
    "kmeans_lloyd_step",
    # ANN remainder + the new search-only graph [Q] (7)
    "ivf_pq_search",
    "pq_encode_codes",
    "ann_hamming_rescore",
    "sq8_rescore_topk",
    "random_projection_16",
    "dim_truncation_recall",
    "knn_graph_search_only",
    # retrieval remainder (3)
    "bm25_rm3_search",
    "rag_chunk_retrieval",
    "pagerank_fixed",
    # quality remainder — incl. the r10 binned-prefix rework (8)
    "pii_scrub",
    "ccnet_ppl_buckets",
    "quality_deciles",
    "c4_line_filters",
    "lm_doc_logprob",
    "quality_percentile_filter",
    "quality_threshold_sweep",
    "corpus_filter_pipeline",
    # mixtures (2)
    "dsir_importance_weights",
    "stratified_sample_perlang",
    # chunking (1)
    "doc_chunking",
    # multimodal resize plumbing (1)
    "multimodal_resize_meta",
]

assert len(_SAMPLE_WINDOW) == 50, len(_SAMPLE_WINDOW)
_missing = [n for n in _SAMPLE_WINDOW if n not in QUERIES]
assert not _missing, _missing

_reordered = {k: QUERIES[k] for k in _SAMPLE_WINDOW}
_reordered.update(QUERIES)  # existing keys keep position; rest append
QUERIES = _reordered
ORACLE_SQL = {k: ORACLE_SQL[k] for k in QUERIES if k in ORACLE_SQL}

__all__ = ["ORACLE_BENCH_SPLIT", "ORACLE_SQL", "QUERIES"]
