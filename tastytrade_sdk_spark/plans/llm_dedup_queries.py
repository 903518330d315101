"""Deduplication queries: exact/normalized/URL-canonical, MinHash+LSH (+calibration audits), SimHash, n-gram Jaccard/containment, winnowing, SemDeDup/D4/prototypes, exact-substring, CDC/snapshot dedup.

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
    _MINHASH_CTE,
    _SHINGLES_CTE,
    _SPLIT_BUCKET_SQL,
    _TOKS_CTE,
    _TOKS_SQL,
    _band_rows_sql,
    _q,
    _tokenized_docs,
)

@_q(
    "dedup_exact_text",
    """
    SELECT md5(text) AS content_hash,
           min(doc_id) AS canonical_id,
           count(*) AS n_docs
    FROM documents
    GROUP BY md5(text)
    """,
)
def dedup_exact_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: content-digest groupBy (no text ever shuffles)."""
    docs = load_table(spark, "documents", sf_dir)
    return exact_duplicates(docs)

@_q(
    "doc_fingerprint",
    _TOKS_CTE
    + f"""
    SELECT doc_id,
           list_reduce(
             list_prepend(0::BIGINT, list_transform(t, s -> {_H32.format(s='s')})),
             (acc, h) -> (acc * 31 + h) % 1000000007) AS fingerprint
    FROM toks
    """,
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Order-sensitive rolling-hash document fingerprint."""
    docs = _tokenized_docs(spark, sf_dir)
    return docs.select(
        "doc_id", textops.rolling_fingerprint(F.col("__toks")).alias("fingerprint")
    )

# winnowing (k=3 token-grams, window w=4): the gram/window/rightmost-
# min pipeline, shared by the fingerprint and overlap-pair queries.
# The oracle materializes every (window, gram) candidate and picks
# rn=1 ordered (h ASC, gpos DESC) — rightmost minimal hash, the
# paper's tie rule, identical to the Spark-side <=-update fold.
_WINNOW_SEL_CTE = (
    _TOKS_CTE
    + f"""
    , grams AS (
      SELECT doc_id, i::BIGINT AS gpos,
             {_H32.format(s="t[i] || ' ' || t[i+1] || ' ' || t[i+2]")} AS h
      FROM toks, unnest(generate_series(1, greatest(len(t)-2, 0))) AS g(i)
    ), nw AS (
      SELECT doc_id, greatest(len(t)-2, 0) AS m FROM toks WHERE len(t) >= 3
    ), wins AS (
      SELECT doc_id, wi::BIGINT AS wi
      FROM nw, unnest(generate_series(
             1, CASE WHEN m >= 4 THEN m - 3 ELSE 1 END)) AS g(wi)
    ), cand AS (
      SELECT w.doc_id, w.wi, g.gpos, g.h
      FROM wins w
      JOIN grams g ON g.doc_id = w.doc_id
                  AND g.gpos BETWEEN w.wi AND w.wi + 3
    ), pick AS (
      SELECT doc_id, wi, h, gpos,
             row_number() OVER (PARTITION BY doc_id, wi
                                ORDER BY h ASC, gpos DESC) AS rn
      FROM cand
    ), sel AS (
      SELECT DISTINCT doc_id, h AS fp, gpos AS pos FROM pick WHERE rn = 1
    )
"""
)

@_q(
    "winnowing_fingerprints",
    _WINNOW_SEL_CTE + "SELECT doc_id, fp, pos FROM sel",
)
def winnowing_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Winnowed document fingerprints (Schleimer et al. 2003): the
    rightmost-min hash per 4-hash window over word-3-gram h32 hashes.
    Per-row expression fold — no shuffle, scan-bound. The gram-hash
    array is materialized behind the repartition barrier so the md5
    pass runs once per doc, not once per window (gram_hashes note)."""
    docs = _tokenized_docs(spark, sf_dir)
    hashed = docs.select(
        "doc_id", textops.gram_hashes(F.col("__toks"), k=3).alias("__g")
    ).repartition(spark.sparkContext.defaultParallelism)
    sel = textops.winnow_from_hashes(F.col("__g"), w=4)
    return hashed.select("doc_id", F.explode(sel).alias("__s")).select(
        "doc_id", F.col("__s.fp").alias("fp"), F.col("__s.pos").alias("pos")
    )

@_q(
    "winnowing_overlap_pairs",
    _WINNOW_SEL_CTE
    + """
    , fsel AS (
      SELECT DISTINCT doc_id, fp FROM sel
    ), rare AS (
      SELECT fp FROM (SELECT fp, count(*) AS dfc FROM fsel GROUP BY fp)
      WHERE dfc <= 50
    ), kept AS (
      SELECT f.doc_id, f.fp FROM fsel f JOIN rare USING (fp)
    ), sizes AS (
      SELECT doc_id, count(*) AS n FROM kept GROUP BY doc_id
    ), shared AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_shared
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 2
    )
    SELECT doc_a, doc_b, n_shared, sa.n AS n_a, sb.n AS n_b,
           round(n_shared / least(sa.n, sb.n), 6) AS containment
    FROM shared
    JOIN sizes sa ON sa.doc_id = doc_a
    JOIN sizes sb ON sb.doc_id = doc_b
    """,
)
def winnowing_overlap_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MOSS-style overlap pairs: docs sharing >= 2 winnowed
    fingerprints, with containment over the smaller capped set. The
    max_df=50 cap drops boilerplate fingerprints before the self-join
    (the hot-key guard bounding it to true candidates)."""
    from tastytrade_sdk_spark.llmops.dedup import winnowing_overlap_pairs

    docs = load_table(spark, "documents", sf_dir)
    return winnowing_overlap_pairs(
        docs, k=3, w=4, min_shared=2, max_df=50
    )

def _winnow_cluster_oracle_sql() -> str:
    """Transitive closure over the winnowing-overlap graph — the
    dedup_clusters recursive-CTE recipe with MOSS pairs as edges."""
    base = (
        _WINNOW_SEL_CTE
        + """
    , fsel AS (
      SELECT DISTINCT doc_id, fp FROM sel
    ), rare AS (
      SELECT fp FROM (SELECT fp, count(*) AS dfc FROM fsel GROUP BY fp)
      WHERE dfc <= 50
    ), kept AS (
      SELECT f.doc_id, f.fp FROM fsel f JOIN rare USING (fp)
    ), pairs AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM kept a JOIN kept b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2 HAVING count(*) >= 3
    ), eg AS (
      SELECT doc_a AS n, doc_b AS m FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ), reach AS (
      SELECT doc_id AS n, doc_id AS lbl FROM documents
      UNION
      SELECT e.n, r.lbl FROM reach r JOIN eg e ON e.m = r.n
    ), comp AS (
      SELECT n AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY n
    ), szs AS (
      SELECT cluster_id, count(*) AS cluster_size
      FROM comp GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           c.doc_id = c.cluster_id AS is_canonical
    FROM comp c JOIN szs s USING (cluster_id)
    """
    )
    return base.replace("WITH toks AS", "WITH RECURSIVE toks AS", 1)

@_q("winnowing_dedup_clusters", _winnow_cluster_oracle_sql())
def winnowing_dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Keep-canonical dedup clusters over the WINNOWING overlap graph:
    MOSS pairs (>= 3 shared winnowed fingerprints, max_df-capped —
    stricter than the pair query's 2 because transitive closure
    amplifies weak edges into giant clusters) feed
    the same connected-components + canonical policy as the MinHash
    path (dedup_clusters) — winnowing catches ordered local overlap
    (plagiarized spans, templated boilerplate) that set-based MinHash
    dilutes away on long docs."""
    from tastytrade_sdk_spark.llmops.cluster import near_dup_clusters
    from tastytrade_sdk_spark.llmops.dedup import winnowing_overlap_pairs

    docs = load_table(spark, "documents", sf_dir)
    # with_containment=False: the closure only consumes the edges, so
    # the sizes joins (two un-prunable inner joins) stay out of the
    # plan — identical pair set (r11)
    pairs = winnowing_overlap_pairs(
        docs, k=3, w=4, min_shared=3, max_df=50, with_containment=False
    ).select("doc_a", "doc_b")
    return near_dup_clusters(docs, pairs)

@_q(
    "minhash_signatures",
    _MINHASH_CTE + "SELECT * FROM sigs",
)
def minhash_signatures_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=16) over distinct 3-gram shingles
    (explode + hash-once + k-min aggregate plan shape)."""
    docs = load_table(spark, "documents", sf_dir)
    return minhash_signatures(docs, k=16)

@_q(
    "lsh_candidate_pairs",
    _MINHASH_CTE
    + f"""
    , banded AS ({_band_rows_sql()})
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM banded a JOIN banded b
      ON a.band_id = b.band_id AND a.band_hash = b.band_hash
     AND a.doc_id < b.doc_id
    """,
)
def lsh_candidate_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH near-dup candidates: 4 bands x 4 rows; one shuffle
    on (band_id, band_hash) instead of an n^2 pair scan."""
    docs = load_table(spark, "documents", sf_dir)
    return lsh_candidate_pairs(docs, k=16, bands=4)

@_q(
    "lsh_dedup_eval",
    _MINHASH_CTE.replace("FROM documents", "FROM docs_s", 1).replace(
        "WITH toks AS",
        "WITH dmod AS (SELECT greatest(1, CAST(ceil(count(*) / 2000.0)"
        " AS BIGINT)) AS md FROM documents), docs_s AS (SELECT d.* FROM"
        " documents d, dmod WHERE "
        + _H32.format(s="'lde:' || doc_id")
        + " % dmod.md = 0), toks AS",
        1,
    )
    + f"""
    , banded AS ({_band_rows_sql()}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    truth AS (
      SELECT doc_a, doc_b
      FROM common
      JOIN sz sa ON sa.doc_id = doc_a
      JOIN sz sb ON sb.doc_id = doc_b
      WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
    ),
    m AS (
      SELECT
        (SELECT count(*) FROM truth)::BIGINT AS n_truth,
        (SELECT count(*) FROM cand)::BIGINT AS n_candidates,
        (SELECT count(*) FROM cand JOIN truth
           USING (doc_a, doc_b))::BIGINT AS n_hit
    )
    SELECT n_truth, n_candidates, n_hit,
           round(n_hit * 1.0 / greatest(n_candidates, 1), 6)
             AS lsh_precision,
           round(n_hit * 1.0 / greatest(n_truth, 1), 6) AS lsh_recall
    FROM m
    """,
)
def lsh_dedup_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-quality evaluation (the ann_recall_curve idea applied to
    near-dup detection), bounded BY CONSTRUCTION to a CONSTANT audit
    universe: a deterministic hash-sample of DOCUMENTS with an
    ADAPTIVE modulus M = max(1, ceil(n_docs / 2000)) — keep docs where
    h32('lde:'||doc_id) % M = 0 — caps the universe at ~2000 docs at
    ANY corpus scale (and the FULL corpus wherever it is already under
    2000, e.g. the sf0.01 driver gate). Within the sample, MinHash-LSH
    candidate pairs are scored against the exact 3-gram-Jaccard>=0.5
    ground truth — one row of n_truth / n_candidates / n_hit with
    banding precision and recall. Recall needs truth pairs LSH
    *missed*, so the truth side cannot be restricted to candidate
    pairs — sampling DOCUMENTS (not pairs) is what bounds the exact
    shingle self-join: with a ≤2000-doc universe the worst case is a
    constant, independent of both corpus size and duplicate-class
    size, while precision/recall remain unbiased estimates of the
    full-corpus metrics under pair-exchangeable sampling. M is a pure
    function of the corpus count, computed identically in both
    engines, so the oracle replays the sample exactly. The unsampled
    form survives only in tools/scale_probe.py as the measured
    counterexample (39 s at 10×, unrunnable at 100×).

    Plan shape (r11): three eager checkpoints on the TINY frames —
    the ~2000-doc sample (consumed by both the truth and the LSH
    branch, which otherwise each re-run the corpus scan + count +
    sample filter) and the truth/cand pair frames (each consumed
    twice: own count + the hit semi-join). All three are bounded by
    construction (sample cap / pairs over a capped sample), so
    materialization is cheap and cuts each doubled pipeline to one
    execution."""
    from tastytrade_sdk_spark.llmops.dedup import (
        lsh_candidate_pairs as _lshp,
        ngram_jaccard_pairs as _njp,
    )
    from tastytrade_sdk_spark.llmops.textops import h32

    docs0 = load_table(spark, "documents", sf_dir)
    dmod = docs0.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.count(F.lit(1)) / F.lit(2000.0)),
        ).alias("__md")
    )
    docs = (
        docs0.crossJoin(F.broadcast(dmod))
        .filter(
            h32(F.concat(F.lit("lde:"), F.col("doc_id").cast("string")))
            % F.col("__md")
            == 0
        )
        .drop("__md")
        .localCheckpoint(eager=True)
    )
    truth = (
        _njp(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    cand = _lshp(docs, k=16, bands=4).localCheckpoint(eager=True)
    t = truth.agg(F.count(F.lit(1)).cast("long").alias("n_truth"))
    c = cand.agg(F.count(F.lit(1)).cast("long").alias("n_candidates"))
    h = cand.join(truth, ["doc_a", "doc_b"], "left_semi").agg(
        F.count(F.lit(1)).cast("long").alias("n_hit")
    )
    return (
        t.crossJoin(c)
        .crossJoin(h)
        .select(
            "n_truth",
            "n_candidates",
            "n_hit",
            F.round(
                F.col("n_hit") / F.greatest(F.col("n_candidates"), F.lit(1)),
                6,
            ).alias("lsh_precision"),
            F.round(
                F.col("n_hit") / F.greatest(F.col("n_truth"), F.lit(1)), 6
            ).alias("lsh_recall"),
        )
    )

def _cluster_oracle_sql() -> str:
    """Transitive closure of the LSH candidate graph as a recursive
    CTE: reach = every (node, reachable id) pair, component = min."""
    base = (
        _MINHASH_CTE
        + f"""
    , banded AS ({_band_rows_sql()})
    , pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ), eg AS (
      SELECT doc_a AS n, doc_b AS m FROM pairs
      UNION ALL SELECT doc_b, doc_a FROM pairs
    ), reach AS (
      SELECT doc_id AS n, doc_id AS lbl FROM documents
      UNION
      SELECT e.n, r.lbl FROM reach r JOIN eg e ON e.m = r.n
    ), comp AS (
      SELECT n AS doc_id, min(lbl) AS cluster_id FROM reach GROUP BY n
    ), szs AS (
      SELECT cluster_id, count(*) AS cluster_size FROM comp GROUP BY cluster_id
    )
    SELECT c.doc_id, c.cluster_id, s.cluster_size,
           c.doc_id = c.cluster_id AS is_canonical
    FROM comp c JOIN szs s USING (cluster_id)
    """
    )
    return base.replace("WITH toks AS", "WITH RECURSIVE toks AS", 1)

@_q("dedup_clusters", _cluster_oracle_sql())
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTER assignment: MinHash-LSH candidate pairs ->
    connected components (min-label propagation, O(diameter) rounds)
    -> one canonical doc per cluster. The keep-canonical dedup policy
    becomes `WHERE is_canonical`."""
    from tastytrade_sdk_spark.llmops.cluster import near_dup_clusters

    docs = load_table(spark, "documents", sf_dir)
    pairs = lsh_candidate_pairs(docs, k=16, bands=4)
    return near_dup_clusters(docs, pairs)

@_q(
    "contamination_check",
    _SHINGLES_CTE
    + f"""
    , sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
    sp AS (SELECT doc_id,
                  CASE WHEN {_SPLIT_BUCKET_SQL} < 80 THEN 'train'
                       WHEN {_SPLIT_BUCKET_SQL} < 90 THEN 'val'
                       ELSE 'test' END AS split
           FROM documents),
    train_sh AS (
      SELECT DISTINCT s.shingle FROM sh s JOIN sp ON sp.doc_id = s.doc_id
      WHERE sp.split = 'train'
    ),
    test_docs AS (SELECT doc_id FROM sp WHERE split = 'test'),
    test_sh AS (
      SELECT s.doc_id, s.shingle FROM sh s JOIN test_docs t ON t.doc_id = s.doc_id
    ),
    stats AS (
      SELECT t.doc_id,
             count(*) AS n_shingles,
             count(ts.shingle) AS n_overlap
      FROM test_sh t LEFT JOIN train_sh ts ON ts.shingle = t.shingle
      GROUP BY t.doc_id
    )
    SELECT d.doc_id,
           coalesce(s.n_shingles, 0) AS n_shingles,
           coalesce(s.n_overlap, 0) AS n_overlap,
           round(coalesce(s.n_overlap, 0)
                 / greatest(coalesce(s.n_shingles, 0), 1), 6) AS overlap_ratio,
           round(coalesce(s.n_overlap, 0)
                 / greatest(coalesce(s.n_shingles, 0), 1), 6) >= 0.5
             AS contaminated
    FROM test_docs d LEFT JOIN stats s ON s.doc_id = d.doc_id
    """,
)
def contamination_check(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train/test contamination audit: for every TEST doc, the share
    of its distinct 3-gram shingles that also appear in any TRAIN doc
    (the held-out-integrity check run before training).

    Plan shape (the broadcast semi-join rewrite):
    - split comes from the same doc_id hash as split_assignment,
      computed INLINE — no join against a splits frame;
    - only the TEST side (10% of the corpus) dedups (doc_id, shingle);
      the train side never builds a global distinct-shingle set — its
      exploded shingles stream map-side against the broadcast
      test-shingle set (semi join, no train-side pre-shuffle), and
      only the surviving intersection — smaller still — is deduped and
      broadcast back onto the test rows.
    Exchanges: test-row distinct, test-set distinct, hit-set distinct,
    final per-doc agg. (Per-doc array_distinct in the projection would
    avoid the test-row shuffle but is O(len²) string compares per doc
    — measured 10x slower than the hash shuffle.)
    At lake scale, where even the test split's distinct shingles
    outgrow a broadcast, drop the two F.broadcast hints: the same plan
    degrades to a shuffle semi-join on the shingle key (AQE picks the
    strategy), still never |test| x |train|."""
    from tastytrade_sdk_spark.llmops.textops import h32, shingles_expr

    # token barrier (_tokenized_docs): without it CollapseProject
    # inlines the regex split into every element_at of the shingle
    # transform — measured ~10x slower — and the single-row-group
    # input would run the whole projection in one task
    toked = _tokenized_docs(spark, sf_dir)
    bucket = h32(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    # explode_outer keeps zero-shingle test docs (null shingle row), so
    # no final re-join against the doc list is needed
    test_rows = (
        toked.filter(bucket >= 90)
        .select(
            "doc_id",
            F.explode_outer(shingles_expr(F.col("__toks"))).alias("shingle"),
        )
        .distinct()
        .localCheckpoint(eager=False)  # one scan feeds both consumers
    )
    test_set = (
        test_rows.filter(F.col("shingle").isNotNull())
        .select("shingle")
        .distinct()
    )
    hits = (
        toked.filter(bucket < 80)
        .select(F.explode(shingles_expr(F.col("__toks"))).alias("shingle"))
        .join(F.broadcast(test_set), "shingle", "left_semi")
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    stats = (
        test_rows.join(F.broadcast(hits), "shingle", "left")
        .groupBy("doc_id")
        .agg(
            F.count("shingle").alias("n_shingles"),
            F.count("__hit").alias("n_overlap"),
        )
    )
    ratio = F.round(
        F.col("n_overlap") / F.greatest(F.col("n_shingles"), F.lit(1)), 6
    )
    return stats.select(
        "doc_id",
        "n_shingles",
        "n_overlap",
        ratio.alias("overlap_ratio"),
        (ratio >= 0.5).alias("contaminated"),
    )

@_q(
    "ngram_jaccard_pairs",
    _SHINGLES_CTE
    + """
    , sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           round(n_common / (sa.n + sb.n - n_common), 6) AS jaccard
    FROM common
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
    """,
)
def ngram_jaccard_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact 3-gram Jaccard similarity join at threshold 0.5."""
    docs = load_table(spark, "documents", sf_dir)
    return ngram_jaccard_pairs(docs, threshold=0.5)

_MINHASH_EST_SIG_EQ = " + ".join(
    f"CASE WHEN a.sig_{i} = b.sig_{i} THEN 1 ELSE 0 END" for i in range(16)
)

@_q(
    "minhash_estimate_error",
    _MINHASH_CTE
    + f"""
    , banded AS ({_band_rows_sql()}),
    cand AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM banded a JOIN banded b
        ON a.band_id = b.band_id AND a.band_hash = b.band_hash
       AND a.doc_id < b.doc_id
    ),
    cmod AS (
      SELECT greatest(1, CAST(ceil(count(*) / 2000.0) AS BIGINT)) AS md
      FROM cand
    ),
    cand_s AS (
      SELECT c.* FROM cand c, cmod
      WHERE {_H32.format(s="'mhe:' || doc_a || '|' || doc_b")} % cmod.md = 0
    ),
    est AS (
      SELECT c.doc_a, c.doc_b,
             ({_MINHASH_EST_SIG_EQ})::BIGINT AS n_match
      FROM cand_s c
      JOIN sigs a ON a.doc_id = c.doc_a
      JOIN sigs b ON b.doc_id = c.doc_b
    ),
    sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT c.doc_a, c.doc_b, count(*) AS n_common
      FROM cand_s c
      JOIN sh a ON a.doc_id = c.doc_a
      JOIN sh b ON b.doc_id = c.doc_b AND b.shingle = a.shingle
      GROUP BY 1, 2
    ),
    exact AS (
      SELECT doc_a, doc_b,
             round(n_common / (sa.n + sb.n - n_common), 6) AS exact_jaccard
      FROM common
      JOIN sz sa ON sa.doc_id = doc_a
      JOIN sz sb ON sb.doc_id = doc_b
    )
    SELECT e.doc_a, e.doc_b, e.n_match,
           round(e.n_match / 16.0, 6) AS est_jaccard,
           coalesce(x.exact_jaccard, 0.0) AS exact_jaccard,
           round(abs(e.n_match / 16.0
                     - coalesce(x.exact_jaccard, 0.0)), 6) AS abs_err
    FROM est e LEFT JOIN exact x USING (doc_a, doc_b)
    """,
)
def minhash_estimate_error(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sketch-accuracy audit, bounded BY CONSTRUCTION to a CONSTANT
    sample size: LSH candidate pairs are hash-sampled with an ADAPTIVE
    modulus M = max(1, ceil(n_candidates / 2000)) — keep pairs where
    h32('mhe:'||a||'|'||b) % M = 0 — so the audited set is ~2000 pairs
    at ANY corpus scale (and the FULL candidate set wherever it is
    already under 2000, e.g. the sf0.01 driver gate — no degenerate
    small-scale result). Each sampled pair gets the MinHash Jaccard
    estimate (matching signature positions / 16) scored against the
    exact shingle Jaccard via pair_exact_jaccard (pairs ⋈ shingles per
    END, never a shingle self-join), with absolute error — the
    calibration check behind choosing k and the banding threshold.

    Why adaptive, not a fixed fraction: on a duplicate-heavy corpus
    the candidate set itself grows with duplicate-CLASS size squared
    (banding correctly pairs every near-dup), so a fixed-modulus
    sample still inherits that growth — measured: the mod-4 form spun
    >45 min at the 100× duplicate-heavy replica before being killed.
    M is a pure function of the candidate count, computed identically
    in both engines (1-row aggregate broadcast), so the oracle replays
    the sample exactly. The unsampled full-pair self-join form
    survives only in tools/scale_probe.py as the measured
    counterexample. Pairs sharing no shingle (banding false
    positives) ground to exact 0.

    Plan shape (r11): the corpus tokenize+MinHash pass runs ONCE — the
    per-doc signature frame is eagerly checkpointed and feeds BOTH the
    LSH band keys (band_hashes_from_sigs -> band_pairs) and the two
    signature joins of the estimate; the r10 form built signatures
    twice (once inside lsh_candidate_pairs, once for the estimate).
    include_missing=False is equivalent here: est inner-joins on
    candidate docs, which by construction have band keys and therefore
    shingles. pair_exact_jaccard still re-tokenizes for the exact
    shingle sets — checkpointing the exploded shingle frame itself
    measured slower (the shingle-frame rule, OPTIMIZATION_r11.md).
    """
    from tastytrade_sdk_spark.llmops.dedup import (
        band_hashes_from_sigs as _bands,
        band_pairs as _bpairs,
        minhash_signatures as _msig,
        pair_exact_jaccard as _pxj,
    )
    from tastytrade_sdk_spark.llmops.textops import h32

    docs = load_table(spark, "documents", sf_dir)
    sigs = _msig(docs, k=16, include_missing=False).localCheckpoint(
        eager=True
    )
    cand0 = _bpairs(_bands(sigs, k=16, bands=4)).localCheckpoint(eager=True)
    cmod = cand0.agg(
        F.greatest(
            F.lit(1).cast("long"),
            F.ceil(F.count(F.lit(1)) / F.lit(2000.0)),
        ).alias("__md")
    )
    cand = (
        cand0.crossJoin(F.broadcast(cmod))
        .filter(
            h32(
                F.concat(
                    F.lit("mhe:"),
                    F.col("doc_a").cast("string"),
                    F.lit("|"),
                    F.col("doc_b").cast("string"),
                )
            )
            % F.col("__md")
            == 0
        )
        .drop("__md")
    )
    a = sigs.select(
        F.col("doc_id").alias("doc_a"),
        *[F.col(f"sig_{i}").alias(f"__a{i}") for i in range(16)],
    )
    b = sigs.select(
        F.col("doc_id").alias("doc_b"),
        *[F.col(f"sig_{i}").alias(f"__b{i}") for i in range(16)],
    )
    n_match = sum(
        F.when(F.col(f"__a{i}") == F.col(f"__b{i}"), 1).otherwise(0)
        for i in range(16)
    ).cast("long")
    est = (
        cand.join(a, "doc_a")
        .join(b, "doc_b")
        .select("doc_a", "doc_b", n_match.alias("n_match"))
    )
    exact = _pxj(docs, cand).select(
        "doc_a", "doc_b", F.col("jaccard").alias("exact_jaccard")
    )
    return est.join(exact, ["doc_a", "doc_b"], "left").select(
        "doc_a",
        "doc_b",
        "n_match",
        F.round(F.col("n_match") / F.lit(16.0), 6).alias("est_jaccard"),
        F.coalesce("exact_jaccard", F.lit(0.0)).alias("exact_jaccard"),
        F.round(
            F.abs(
                F.col("n_match") / F.lit(16.0)
                - F.coalesce("exact_jaccard", F.lit(0.0))
            ),
            6,
        ).alias("abs_err"),
    )

@_q(
    "ngram_containment_pairs",
    _SHINGLES_CTE
    + """
    , sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT doc_a, doc_b, n_common,
           sa.n AS size_a, sb.n AS size_b,
           round(n_common / sa.n, 6) AS containment_a,
           round(n_common / sb.n, 6) AS containment_b,
           round(n_common / least(sa.n, sb.n), 6) AS containment
    FROM common
    JOIN sz sa ON sa.doc_id = doc_a
    JOIN sz sb ON sb.doc_id = doc_b
    WHERE round(n_common / least(sa.n, sb.n), 6) >= 0.8
    """,
)
def ngram_containment_pairs_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broder containment join at 0.8: near-subset pairs (excerpts,
    quotes, wrappers) that symmetric Jaccard under-scores because the
    union is dominated by the longer doc."""
    from tastytrade_sdk_spark.llmops.dedup import ngram_containment_pairs

    docs = load_table(spark, "documents", sf_dir)
    return ngram_containment_pairs(docs, threshold=0.8)

def _simhash_sql() -> str:
    terms = []
    for j in range(32):
        bit = 1 << j
        terms.append(
            f"CASE WHEN list_sum(list_transform(ht, h -> "
            f"CASE WHEN (h & {bit}) > 0 THEN 1 ELSE -1 END)) > 0 THEN {bit} ELSE 0 END"
        )
    return " + ".join(terms)

@_q(
    "simhash_fingerprints",
    _TOKS_CTE
    + f"""
    , ht AS (
      SELECT doc_id, list_transform(t, s -> {_H32.format(s='s')}) AS ht FROM toks
    )
    SELECT doc_id, ({_simhash_sql()})::BIGINT AS simhash FROM ht
    """,
)
def simhash_fingerprints_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """32-bit SimHash fingerprints over token multisets."""
    docs = load_table(spark, "documents", sf_dir)
    return simhash_fingerprints(docs)

@_q(
    "corpus_snapshot_diff",
    """
    WITH old AS (
      SELECT doc_id, md5(text) AS old_hash
      FROM documents WHERE doc_id % 7 <> 0
    ), new AS (
      SELECT doc_id,
             md5(CASE WHEN doc_id % 5 = 0 THEN text || ' [rev2]'
                      ELSE text END) AS new_hash
      FROM documents WHERE doc_id % 10 <> 0
    )
    SELECT coalesce(old.doc_id, new.doc_id) AS doc_id,
           CASE WHEN old_hash IS NULL THEN 'added'
                WHEN new_hash IS NULL THEN 'removed'
                WHEN old_hash <> new_hash THEN 'modified'
                ELSE 'unchanged' END AS status,
           old_hash, new_hash
    FROM old FULL OUTER JOIN new USING (doc_id)
    """,
)
def corpus_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental-pipeline delta report (llmops/dedup.snapshot_diff):
    added/removed/modified/unchanged per doc id between two simulated
    corpus snapshots — ONE id-keyed full outer join over (id, digest)
    projections; text never shuffles. This is the gate an incremental
    run consults to re-process only changed documents."""
    from tastytrade_sdk_spark.llmops.dedup import snapshot_diff

    docs = load_table(spark, "documents", sf_dir)
    old = docs.filter(F.col("doc_id") % 7 != 0)
    new = docs.filter(F.col("doc_id") % 10 != 0).select(
        "doc_id",
        F.when(
            F.col("doc_id") % 5 == 0, F.concat(F.col("text"), F.lit(" [rev2]"))
        )
        .otherwise(F.col("text"))
        .alias("text"),
    )
    return snapshot_diff(old, new)

def _cdc_oracle_sql(w: int = 8, bmax: str = "03", max_freq: int = 100,
                    t_num: int = 1, t_den: int = 2) -> str:
    """Replays the CDC pipeline exactly: hex-encoded payload, trailing
    rolling-window boundary rule, chunk fingerprints, hot-chunk guard,
    integer-threshold Jaccard pairs."""
    return f"""
    WITH p AS (
      SELECT doc_id, hex(encode(text)) AS hx,
             octet_length(encode(text)) AS n
      FROM documents WHERE octet_length(encode(text)) >= 1
    ), b AS (
      SELECT doc_id, hx, n,
             CASE WHEN n >= {w} THEN
               list_filter(range({w}, n + 1), i ->
                 substring(md5(substring(hx, (i - {w})*2 + 1, {2*w})),
                           1, 2) <= '{bmax}')
             ELSE CAST([] AS BIGINT[]) END AS bnd
      FROM p
    ), e AS (
      SELECT doc_id, hx,
             CASE WHEN len(bnd) > 0 AND bnd[-1] = n THEN bnd
                  ELSE list_concat(bnd, [n]) END AS ends
      FROM b
    ), c AS (
      SELECT doc_id,
             md5(substring(hx,
                 ((CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END) - 1)*2 + 1,
                 (ends[j] -
                  (CASE WHEN j = 1 THEN 1 ELSE ends[j - 1] + 1 END) + 1)*2))
               AS fp
      FROM e, unnest(range(1, len(ends) + 1)) AS t(j)
    ), fps AS (SELECT DISTINCT doc_id, fp FROM c
    ), rare AS (SELECT fp FROM fps GROUP BY fp HAVING count(*) <= {max_freq}
    ), g AS (SELECT fps.* FROM fps JOIN rare USING (fp)
    ), sz AS (SELECT doc_id, count(*) AS nch FROM g GROUP BY 1
    ), sh AS (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS shared_chunks
      FROM g a JOIN g b ON a.fp = b.fp AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    )
    SELECT id_a, id_b, shared_chunks,
           sa.nch AS chunks_a, sb.nch AS chunks_b,
           round(shared_chunks / (sa.nch + sb.nch - shared_chunks), 6)
             AS jaccard
    FROM sh
    JOIN sz sa ON sa.doc_id = id_a
    JOIN sz sb ON sb.doc_id = id_b
    WHERE {t_den} * shared_chunks >=
          {t_num} * (sa.nch + sb.nch - shared_chunks)
    """

@_q("cdc_chunk_dedup", _cdc_oracle_sql())
def cdc_chunk_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Content-defined-chunking near-dup pairs over binary payloads
    (llmops/multimodal.cdc_chunk_fingerprints +
    payload_near_dup_pairs): the storage-dedup recipe for opaque media
    blobs — shift-invariant chunk boundaries from a rolling content
    window, fingerprint-keyed pair join with a hot-chunk guard,
    integer-threshold Jaccard. Narrow per-row HOF chunking (no UDF, no
    explode-before-shuffle), one fp-keyed shuffle for pairs."""
    from tastytrade_sdk_spark.llmops.multimodal import (
        cdc_chunk_fingerprints,
        payload_near_dup_pairs,
    )

    docs = load_table(spark, "documents", sf_dir)
    payload = docs.select(
        "doc_id", F.encode(F.col("text"), "UTF-8").alias("payload")
    )
    fps = cdc_chunk_fingerprints(payload)
    return payload_near_dup_pairs(fps)

@_q(
    "embedding_near_dup_pairs",
    """
    WITH p AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b, a.embedding AS ea, b.embedding AS eb
      FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
    ), flat AS (
      SELECT id_a, id_b, unnest(ea)::DOUBLE AS x, unnest(eb)::DOUBLE AS y FROM p
    ), s AS (
      SELECT id_a, id_b, sum(x*y) AS dot, sqrt(sum(x*x)) AS na, sqrt(sum(y*y)) AS nb
      FROM flat GROUP BY 1, 2
    )
    SELECT id_a, id_b, round(dot/(na*nb), 6) AS cosine
    FROM s WHERE round(dot/(na*nb), 6) >= 0.4
    """,
)
def embedding_near_dup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-duplicate detection: all pairs with
    cosine >= 0.4. The oracle is the exact all-pairs form; the Spark
    plan is a blocked matrix product (hash rows into blocks, join
    block pairs once, score each with one BLAS matmul) — at lake
    scale the LSH-bucketed variant (ann_lsh_cosine) replaces the
    exact quadratic scan."""
    from tastytrade_sdk_spark.llmops.similarity import all_pairs_cosine

    emb = load_table(spark, "embeddings", sf_dir)
    return all_pairs_cosine(emb, "vec_id", "embedding", threshold=0.4)

_H32S = "(('0x' || substring(md5({s}), 1, 8))::BIGINT)"

@_q(
    "dup_shingle_fraction",
    _SHINGLES_CTE
    + f"""
    , sh AS (
      SELECT DISTINCT doc_id, {_H32S.format(s='shingle')} AS h FROM sh0
    ), shared AS (
      SELECT h, count(*) > 1 AS is_shared FROM sh GROUP BY h
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_shingles,
             sum(CASE WHEN is_shared THEN 1 ELSE 0 END)::BIGINT AS n_shared
      FROM sh JOIN shared USING (h) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_shingles, 0) AS n_shingles,
           coalesce(p.n_shared, 0) AS n_shared,
           round(coalesce(p.n_shared, 0)
                 / greatest(coalesce(p.n_shingles, 0), 1), 6) AS dup_frac
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def dup_shingle_fraction_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-doc duplicated-shingle fraction (substring-dedup proxy,
    Lee et al. 2022): share of each doc's distinct 3-gram shingles
    that occur in >=1 other document. Both engines count by the h32
    shingle hash — the 8-byte key the 100 TB shuffle would use — so
    hash collisions (possible at corpus scale) can never diverge the
    gate."""
    from tastytrade_sdk_spark.llmops.dedup import dup_shingle_fraction

    docs = load_table(spark, "documents", sf_dir)
    return dup_shingle_fraction(docs)

def _kmeans_centroids():
    """Fixed deterministic centroid matrix for the oracle-checked
    Lloyd step: 16 pseudo-random 64-dim rows, L2-normalized (the
    trained-quantizer path uses ivf_centroids; the [Q] pins the
    centroids so both engines replay the same iteration)."""
    import numpy as np

    from tastytrade_sdk_spark.llmops.similarity import hyperplanes

    m = hyperplanes(16, 64, seed=11)
    return m / np.linalg.norm(m, axis=1, keepdims=True)

def _kmeans_oracle_sql() -> str:
    cents = _kmeans_centroids()
    dim, k = cents.shape[1], cents.shape[0]
    fold = (
        "list_reduce(list_prepend(0.0, {terms}), (acc, x) -> acc + x)"
    )
    norm_terms = f"list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)"
    unit = (
        f"list_transform(embedding, x -> x::DOUBLE / "
        f"sqrt({fold.format(terms=norm_terms)}))"
    )
    dot_exprs = []
    for row in cents:
        lits = ", ".join(repr(float(x)) for x in row)
        terms = f"list_transform(range(1, {dim + 1}), j -> u[j] * ([{lits}])[j])"
        dot_exprs.append(f"round({fold.format(terms=terms)}, 8)")
    return f"""
    WITH unitv AS (
      SELECT vec_id, {unit} AS u FROM embeddings
    ), dots AS (
      SELECT vec_id, u, [{", ".join(dot_exprs)}] AS d FROM unitv
    ), asg AS (
      SELECT vec_id, u, array_position(d, list_max(d)) - 1 AS cluster_id
      FROM dots
    ), ex AS (
      SELECT cluster_id, g.i - 1 AS dim, u[g.i] AS val
      FROM asg, unnest(range(1, {dim + 1})) AS g(i)
    ), sums AS (
      SELECT cluster_id, dim, sum(val) AS s, count(*) AS n_members
      FROM ex GROUP BY 1, 2
    ), norms AS (
      SELECT cluster_id, sqrt(sum(s * s)) AS norm FROM sums GROUP BY 1
    )
    SELECT cluster_id, dim, round(s / norm, 6) AS centroid, n_members
    FROM sums JOIN norms USING (cluster_id)
    """

@_q("kmeans_lloyd_step", _kmeans_oracle_sql())
def kmeans_lloyd_step_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One full-corpus Lloyd iteration of spherical k-means against a
    pinned centroid matrix (literals spliced into both engines):
    assignment = rounded left-fold dots + first-argmax, recompute =
    one (cluster, dim)-keyed agg. The distributed trainer whose
    bounded-sample shortcut is ivf_centroids."""
    from tastytrade_sdk_spark.llmops.cluster import kmeans_lloyd_step

    emb = load_table(spark, "embeddings", sf_dir)
    target = spark.sparkContext.defaultParallelism
    return kmeans_lloyd_step(emb.repartition(target), _kmeans_centroids())

def _prototypes_oracle_sql(drop_num: int = 1, drop_den: int = 5) -> str:
    """Replays prototypes_prune exactly: the pinned-centroid rounded
    dot-fold assignment (same literals as the kmeans oracle), then a
    per-cluster prototypicality rank with id tiebreak and the INTEGER
    drop boundary rank <= (n * num) // den."""
    cents = _kmeans_centroids()
    dim = cents.shape[1]
    fold = "list_reduce(list_prepend(0.0, {terms}), (acc, x) -> acc + x)"
    norm_terms = "list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)"
    unit = (
        f"list_transform(embedding, x -> x::DOUBLE / "
        f"sqrt({fold.format(terms=norm_terms)}))"
    )
    dot_exprs = []
    for row in cents:
        lits = ", ".join(repr(float(x)) for x in row)
        terms = f"list_transform(range(1, {dim + 1}), j -> u[j] * ([{lits}])[j])"
        dot_exprs.append(f"round({fold.format(terms=terms)}, 8)")
    return f"""
    WITH unitv AS (
      SELECT vec_id, {unit} AS u FROM embeddings
    ), dots AS (
      SELECT vec_id, [{", ".join(dot_exprs)}] AS d FROM unitv
    ), asg AS (
      SELECT vec_id,
             CAST(array_position(d, list_max(d)) - 1 AS INTEGER) AS cluster_id,
             list_max(d) AS proto_sim
      FROM dots
    ), rk AS (
      SELECT vec_id, cluster_id, proto_sim,
             CAST(row_number() OVER (
               PARTITION BY cluster_id
               ORDER BY proto_sim DESC, vec_id ASC) AS INTEGER) AS proto_rank,
             count(*) OVER (PARTITION BY cluster_id) AS n_members
      FROM asg
    )
    SELECT vec_id, cluster_id, proto_sim, proto_rank, n_members,
           proto_rank <= (n_members * {drop_num}) // {drop_den} AS is_dropped
    FROM rk
    """

@_q("prototypes_prune", _prototypes_oracle_sql())
def prototypes_prune_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SSL-prototypes pruning (Sorscher et al.; D4's second stage):
    drop the top 1/5 most-prototypical vectors per k-means cluster —
    the dense cluster cores training benefits from least. One window
    shuffle on cluster_id after a narrow no-shuffle assignment; with
    semdedup_keep this composes into the full D4 curation recipe."""
    from tastytrade_sdk_spark.llmops.cluster import prototypes_prune

    emb = load_table(spark, "embeddings", sf_dir)
    target = spark.sparkContext.defaultParallelism
    return prototypes_prune(
        emb.repartition(target), _kmeans_centroids(), drop_num=1, drop_den=5
    )

@_q(
    "frequent_span_removal",
    f"""
    WITH toks AS (
      SELECT doc_id, {_TOKS_SQL} AS t FROM documents
    ), nd AS (SELECT count(*) AS n_docs FROM documents),
    sh AS (
      SELECT doc_id, i AS pos, t[i] || ' ' || t[i+1] || ' ' || t[i+2] AS shingle
      FROM toks, unnest(generate_series(1, greatest(len(t)-2, 0))) AS g(i)
    ), freq AS (
      SELECT shingle FROM sh CROSS JOIN nd GROUP BY shingle, n_docs
      HAVING count(DISTINCT doc_id) >= greatest(2, 0.01 * n_docs)
    ), cov AS (
      SELECT doc_id, list_sort(list(pos)) AS starts
      FROM sh JOIN freq USING (shingle) GROUP BY doc_id
    ), rec AS (
      -- coalesce INSIDE the lambda: an alias named like the raw cov
      -- column would be shadowed by it in lambda scope (NULL for
      -- uncovered docs), silently emptying the keep list
      SELECT d.doc_id, t,
             list_filter(generate_series(1, len(t)),
                         j -> len(list_filter(coalesce(starts, []),
                                   s -> j >= s AND j <= s + 2)) = 0) AS keep
      FROM toks d LEFT JOIN cov USING (doc_id)
    )
    SELECT doc_id, len(t) - len(keep) AS n_removed,
           array_to_string(list_transform(keep, j -> t[j]), ' ') AS clean_text
    FROM rec
    """,
)
def frequent_span_removal_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact-substring boilerplate scrub (Lee et al. 2022 style) at
    trigram granularity with full text reconstruction: spans in >= 1%
    of documents are cut from every document. Doc-frequency count +
    frequent-set join + per-doc rebuild (llmops/dedup.py:
    frequent_span_removal scale notes)."""
    from tastytrade_sdk_spark.llmops.dedup import frequent_span_removal

    docs = load_table(spark, "documents", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    return frequent_span_removal(docs)

def _d4_oracle_sql(threshold: float = 0.4, drop_num: int = 1,
                   drop_den: int = 5) -> str:
    """The composed D4 oracle: the semdedup drop set and the
    prototypes rank computed over the SAME pinned assignment, then
    keep = survived both."""
    cents = _kmeans_centroids()
    dim = cents.shape[1]
    fold = "list_reduce(list_prepend(0.0, {terms}), (acc, x) -> acc + x)"
    norm_terms = "list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)"
    unit = (
        f"list_transform(embedding, x -> x::DOUBLE / "
        f"sqrt({fold.format(terms=norm_terms)}))"
    )
    dot_exprs = []
    for row in cents:
        lits = ", ".join(repr(float(x)) for x in row)
        terms = f"list_transform(range(1, {dim + 1}), j -> u[j] * ([{lits}])[j])"
        dot_exprs.append(f"round({fold.format(terms=terms)}, 8)")
    pair_terms = (
        f"list_transform(range(1, {dim + 1}), j -> a.u[j] * b.u[j])"
    )
    return f"""
    WITH unitv AS MATERIALIZED (
      SELECT vec_id, {unit} AS u FROM embeddings
    ), dots AS (
      SELECT vec_id, u, [{", ".join(dot_exprs)}] AS d FROM unitv
    ), asg AS MATERIALIZED (
      SELECT vec_id, u,
             CAST(array_position(d, list_max(d)) - 1 AS INTEGER)
               AS cluster_id,
             list_max(d) AS proto_sim
      FROM dots
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM asg a JOIN asg b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE round({fold.format(terms=pair_terms)}, 6) >= {threshold}
    ), rk AS (
      SELECT vec_id, cluster_id,
             row_number() OVER (PARTITION BY cluster_id
                                ORDER BY proto_sim DESC, vec_id ASC)
               AS proto_rank,
             count(*) OVER (PARTITION BY cluster_id) AS n_members
      FROM asg
    )
    SELECT rk.vec_id, rk.cluster_id,
           dropped.vec_id IS NULL AS keep_semdedup,
           NOT (proto_rank <= (n_members * {drop_num}) // {drop_den})
             AS keep_prototypes,
           (dropped.vec_id IS NULL
            AND NOT (proto_rank <= (n_members * {drop_num}) // {drop_den}))
             AS keep
    FROM rk LEFT JOIN dropped ON rk.vec_id = dropped.vec_id
    """

@_q("d4_curation", _d4_oracle_sql())
def d4_curation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The full D4 recipe (Tirumala et al.) composed from its two
    oracled halves over ONE shared pinned assignment: SemDeDup drops
    near-exact semantic copies within clusters, SSL-prototypes drops
    the over-represented cluster cores; keep = survived both. Plan:
    the k*dim assignment folds run ONCE (checkpointed — they are the
    dominant narrow cost and both halves consume them); the semdedup
    pair scan (cluster-bounded) and the prototypes rank (one
    cluster-keyed window) branch from the checkpoint, and the final
    keep set is one vec_id-keyed join of two boolean columns."""
    from pyspark.sql import Window

    from tastytrade_sdk_spark.llmops.cluster import (
        kmeans_assign,
        semdedup_prune_assigned,
    )

    emb = load_table(spark, "embeddings", sf_dir).repartition(
        spark.sparkContext.defaultParallelism
    )
    assigned = (
        kmeans_assign(emb, _kmeans_centroids(), keep_sim=True)
        .select(
            "vec_id",
            F.col("__cluster").alias("cluster_id"),
            "__unit",
            "__sim",
        )
        .localCheckpoint(eager=True)
    )
    sem = semdedup_prune_assigned(
        assigned.select("vec_id", "cluster_id", "__unit"),
        threshold=0.4,
        checkpoint=False,  # `assigned` is already pinned above
    ).select("vec_id", "cluster_id", F.col("keep").alias("keep_semdedup"))
    w = Window.partitionBy("cluster_id").orderBy(
        F.col("__sim").desc(), F.col("vec_id").asc()
    )
    wc = Window.partitionBy("cluster_id")
    # the house INTEGER drop boundary — rank <= (n * num) div den —
    # exactly as prototypes_prune and the oracle's `//` compute it
    proto = assigned.select(
        "vec_id",
        F.row_number().over(w).alias("proto_rank"),
        F.count(F.lit(1)).over(wc).alias("n_members"),
    ).select(
        "vec_id",
        (
            ~(F.col("proto_rank") <= F.expr("(n_members * 1) div 5"))
        ).alias("keep_prototypes"),
    )
    return sem.join(proto, "vec_id").select(
        "vec_id",
        "cluster_id",
        "keep_semdedup",
        "keep_prototypes",
        (F.col("keep_semdedup") & F.col("keep_prototypes")).alias("keep"),
    )

def _semdedup_scaled_oracle_sql(
    threshold: float = 0.4,
    target_bucket: int = 64,
    b_min: int = 3,
    b_max: int = 12,
    seed: int = 11,
) -> str:
    """Oracle for the k ∝ n scaled SemDeDup: b (the hyperplane count,
    so 2^b buckets) is derived from count(*) with the SAME pure
    integer arithmetic as cluster.lsh_bucket_bits, the b_max plane
    literals are spliced once, and each plane's sign bit is gated on
    i < b — so the one static SQL string replays the data-dependent
    bucket count at any sf."""
    from tastytrade_sdk_spark.llmops.similarity import hyperplanes

    planes = hyperplanes(b_max, 64, seed)
    fold = "list_reduce(list_prepend(0.0, {terms}), (acc, x) -> acc + x)"
    norm_terms = "list_transform(embedding, x -> x::DOUBLE * x::DOUBLE)"
    unit = (
        f"list_transform(embedding, x -> x::DOUBLE / "
        f"sqrt({fold.format(terms=norm_terms)}))"
    )
    bit_exprs = []
    for i, row in enumerate(planes):
        lits = ", ".join(repr(float(x)) for x in row)
        terms = f"list_transform(range(1, 65), j -> u[j] * ([{lits}])[j])"
        bit_exprs.append(
            f"CASE WHEN {i} < bb.b AND "
            f"round({fold.format(terms=terms)}, 8) >= 0 "
            f"THEN {1 << i} ELSE 0 END"
        )
    cmps = " + ".join(
        f"(CASE WHEN {1 << i} < m THEN 1 ELSE 0 END)" for i in range(b_max)
    )
    pair_terms = "list_transform(range(1, 65), j -> a.u[j] * b.u[j])"
    return f"""
    WITH unitv AS MATERIALIZED (
      SELECT vec_id, {unit} AS u FROM embeddings
    ), nn AS (
      SELECT (count(*) + {target_bucket - 1}) // {target_bucket} AS m
      FROM unitv
    ), bb AS (
      SELECT least({b_max}, greatest({b_min}, {cmps})) AS b FROM nn
    ), asg AS MATERIALIZED (
      SELECT vec_id, u,
             CAST({" + ".join(bit_exprs)} AS INTEGER) AS cluster_id
      FROM unitv CROSS JOIN bb
    ), dropped AS (
      SELECT DISTINCT b.vec_id
      FROM asg a JOIN asg b
        ON a.cluster_id = b.cluster_id AND a.vec_id < b.vec_id
      WHERE round({fold.format(terms=pair_terms)}, 6) >= {threshold}
    )
    SELECT asg.vec_id, cluster_id,
           dropped.vec_id IS NULL AS keep
    FROM asg LEFT JOIN dropped ON asg.vec_id = dropped.vec_id
    """

@_q("semdedup_keep_scaled", _semdedup_scaled_oracle_sql())
def semdedup_keep_scaled(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup in its LINEAR-regime form — the driver-checked scale
    path (the fixed-k semdedup_keep is the paper-literal trained-
    centroid form, whose k*(n/k)^2 pair scan is the documented
    quadratic once n outgrows its fixed k; SCALING.md measures both).
    Sign-LSH buckets give k ∝ n with constant cluster size: b =
    O(log n) hyperplanes (integer-derived from count(*), shared with
    the oracle) route each unit vector to one of 2^b buckets, the
    pair scan shuffles once on cluster_id, and total cost stays
    ~n * target_bucket at any corpus size."""
    from tastytrade_sdk_spark.llmops.cluster import semdedup_prune_scaled

    emb = load_table(spark, "embeddings", sf_dir)
    return semdedup_prune_scaled(emb, threshold=0.4)

@_q(
    "semdedup_keep",
    _semdedup_scaled_oracle_sql(threshold=0.5, target_bucket=48),
)
def semdedup_keep(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semantic dedup (SemDeDup recipe) in the k ∝ n scale regime,
    at a STRICTER threshold / smaller bucket than semdedup_keep_scaled
    (the two [Q]s pin the parameter surface). The paper-literal
    fixed-k trained-centroid form (cluster.py:semdedup_prune) is the
    documented quadratic honest-negative once n outgrows k — it was
    retired from the registry in r7 and survives only in
    tools/scale_probe.py as a regression sentinel; its prune half is
    the SAME shared semdedup_prune_assigned, so coverage of the prune
    semantics is unchanged."""
    from tastytrade_sdk_spark.llmops.cluster import semdedup_prune_scaled

    emb = load_table(spark, "embeddings", sf_dir)
    return semdedup_prune_scaled(emb, threshold=0.5, target_bucket=48)

from tastytrade_sdk_spark.llmops.textops import CANONICAL_URL_SQL, canonical_url

_URL_SYNTH_SQL = """
      CASE doc_id % 4 WHEN 0 THEN 'http://' WHEN 1 THEN 'https://'
           WHEN 2 THEN 'https://www.' ELSE 'HTTPS://WWW.' END
      || source || '.example.com/Articles/' || CAST(doc_id % 50 AS VARCHAR)
      || CASE doc_id % 3 WHEN 0 THEN '' WHEN 1 THEN '/'
              ELSE '?utm_source=feed&ref=rss&utm_campaign=x' END
"""

_URL_DEDUP_ORACLE = (
    """
    WITH urls AS (
      SELECT doc_id, {canon} AS canonical_url
      FROM (SELECT doc_id, {synth} AS url FROM documents)
    )
    SELECT canonical_url,
           split_part(canonical_url, '/', 1) AS domain,
           (split_part(canonical_url, '/', 1) = 'src0.example.com') AS blocked,
           CAST(count(*) AS BIGINT) AS n_variants,
           min(doc_id) AS keep_doc_id
    FROM urls GROUP BY canonical_url
    """
).format(canon=CANONICAL_URL_SQL.format(u="url"), synth=_URL_SYNTH_SQL)

@_q("url_canonical_dedup", _URL_DEDUP_ORACLE)
def url_canonical_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level dedup (RefinedWeb's first dedup stage): canonicalize
    each document's URL (lowercase, scheme/www stripped, tracking
    params dropped, trailing slash removed), group by canonical form,
    keep the lowest doc_id, and flag blocklisted domains.

    Scale shape: canonicalization is scan-bound expressions; the
    groupBy shuffles on canonical_url (high cardinality, well spread);
    the blocklist is a literal predicate (a real one would be a
    broadcast join against a domain dimension). URLs are synthesized
    deterministically from (doc_id, source) on BOTH engines since the
    documents table carries no URL column.
    """
    docs = load_table(spark, "documents", sf_dir)
    d = F.col("doc_id")
    scheme = (
        F.when(d % 4 == 0, F.lit("http://"))
        .when(d % 4 == 1, F.lit("https://"))
        .when(d % 4 == 2, F.lit("https://www."))
        .otherwise(F.lit("HTTPS://WWW."))
    )
    tail = (
        F.when(d % 3 == 0, F.lit(""))
        .when(d % 3 == 1, F.lit("/"))
        .otherwise(F.lit("?utm_source=feed&ref=rss&utm_campaign=x"))
    )
    url = F.concat(
        scheme,
        F.col("source"),
        F.lit(".example.com/Articles/"),
        (d % 50).cast("string"),
        tail,
    )
    canon = canonical_url(url)
    urls = docs.select(d.alias("doc_id"), canon.alias("canonical_url"))
    domain = F.substring_index(F.col("canonical_url"), "/", 1)
    return urls.groupBy("canonical_url").agg(
        F.min("doc_id").alias("keep_doc_id"),
        F.count(F.lit(1)).alias("n_variants"),
    ).select(
        "canonical_url",
        domain.alias("domain"),
        (domain == "src0.example.com").alias("blocked"),
        "n_variants",
        "keep_doc_id",
    )

def _dedup_policy_oracle_sql() -> str:
    """Replay of the three-tier dedup decision chain. Tier 3's killer
    rule is ONE-SHOT greedy: a doc dies if any jaccard>=0.5 partner
    with a LOWER id survived tiers 1-2 (no transitive closure — the
    deterministic pairwise policy production MinHash dedup applies;
    the closure-based variant is dedup_clusters)."""
    from tastytrade_sdk_spark.llmops.textops import CANONICAL_URL_SQL

    return (
        _SHINGLES_CTE
        + f"""
    , sh AS (SELECT DISTINCT doc_id, shingle FROM sh0),
    sz AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY doc_id),
    common AS (
      SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS n_common
      FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
      GROUP BY 1, 2
    ),
    pairs AS (
      SELECT doc_a, doc_b FROM common
      JOIN sz sa ON sa.doc_id = doc_a
      JOIN sz sb ON sb.doc_id = doc_b
      WHERE round(n_common / (sa.n + sb.n - n_common), 6) >= 0.5
    ),
    ex AS (
      SELECT doc_id,
             min(doc_id) OVER (PARTITION BY md5(text)) AS ex_canon
      FROM documents
    ),
    urls AS (
      SELECT doc_id, {CANONICAL_URL_SQL.format(u="url")} AS curl
      FROM (SELECT doc_id, {_URL_SYNTH_SQL} AS url FROM documents)
    ),
    ucan AS (
      SELECT u.curl, min(u.doc_id) AS uc
      FROM urls u JOIN ex ON ex.doc_id = u.doc_id AND ex.doc_id = ex.ex_canon
      GROUP BY u.curl
    ),
    j1 AS (
      SELECT ex.doc_id, ex.ex_canon, ucan.uc
      FROM ex JOIN urls u ON u.doc_id = ex.doc_id
      LEFT JOIN ucan ON ucan.curl = u.curl
    ),
    surv12 AS (SELECT doc_id FROM j1 WHERE doc_id = ex_canon AND doc_id = uc),
    nd AS (
      SELECT p.doc_b AS doc_id, min(p.doc_a) AS nd_canon
      FROM pairs p JOIN surv12 s ON s.doc_id = p.doc_a
      GROUP BY p.doc_b
    )
    SELECT doc_id, killed_by, canonical_id, killed_by IS NULL AS keep
    FROM (
      SELECT j1.doc_id,
             CASE WHEN j1.doc_id != j1.ex_canon THEN 'exact'
                  WHEN j1.doc_id != j1.uc THEN 'url'
                  WHEN nd.nd_canon IS NOT NULL THEN 'near_dup' END AS killed_by,
             CASE WHEN j1.doc_id != j1.ex_canon THEN j1.ex_canon
                  WHEN j1.doc_id != j1.uc THEN j1.uc
                  WHEN nd.nd_canon IS NOT NULL THEN nd.nd_canon END AS canonical_id
      FROM j1 LEFT JOIN nd ON nd.doc_id = j1.doc_id
    )
    """
    )

@_q("dedup_tier_policy", _dedup_policy_oracle_sql())
def dedup_tier_policy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The END-TO-END dedup DECISION a corpus stage actually applies —
    the RefinedWeb-style tier chain in precedence order: (1) exact
    text (md5 group, min-id canonical), (2) canonical-URL among exact
    survivors, (3) pairwise greedy near-dup (jaccard >= 0.5 against a
    lower-id tier-1/2 survivor; the transitive-closure variant is
    dedup_clusters). Each doc reports which tier killed it and by
    whom. Plan: one md5-keyed window, one URL-keyed aggregate
    broadcast back, the shingle-keyed jaccard join — every shuffle is
    content-keyed; tiers compose as column expressions, not passes
    over the corpus."""
    from tastytrade_sdk_spark.llmops.dedup import ngram_jaccard_pairs
    from tastytrade_sdk_spark.llmops.textops import canonical_url

    docs = load_table(spark, "documents", sf_dir)
    d = F.col("doc_id")
    scheme = (
        F.when(d % 4 == 0, F.lit("http://"))
        .when(d % 4 == 1, F.lit("https://"))
        .when(d % 4 == 2, F.lit("https://www."))
        .otherwise(F.lit("HTTPS://WWW."))
    )
    tail = (
        F.when(d % 3 == 0, F.lit(""))
        .when(d % 3 == 1, F.lit("/"))
        .otherwise(F.lit("?utm_source=feed&ref=rss&utm_campaign=x"))
    )
    url = F.concat(
        scheme, F.col("source"), F.lit(".example.com/Articles/"),
        (d % 50).cast("string"), tail,
    )
    base = docs.select(
        "doc_id",
        F.min("doc_id")
        .over(Window.partitionBy(F.md5("text")))
        .alias("ex_canon"),
        canonical_url(url).alias("curl"),
    )
    ucan = (
        base.filter(F.col("doc_id") == F.col("ex_canon"))
        .groupBy("curl")
        .agg(F.min("doc_id").alias("uc"))
    )
    j1 = base.join(ucan, "curl", "left").select("doc_id", "ex_canon", "uc")
    surv12 = j1.filter(
        (F.col("doc_id") == F.col("ex_canon")) & (F.col("doc_id") == F.col("uc"))
    ).select(F.col("doc_id").alias("doc_a"))
    nd = (
        ngram_jaccard_pairs(docs, threshold=0.5)
        .select("doc_a", "doc_b")
        .join(surv12, "doc_a")
        .groupBy(F.col("doc_b").alias("doc_id"))
        .agg(F.min("doc_a").alias("nd_canon"))
    )
    out = j1.join(nd, "doc_id", "left")
    killed_by = (
        F.when(F.col("doc_id") != F.col("ex_canon"), F.lit("exact"))
        .when(F.col("doc_id") != F.col("uc"), F.lit("url"))
        .when(F.col("nd_canon").isNotNull(), F.lit("near_dup"))
    )
    canonical_id = (
        F.when(F.col("doc_id") != F.col("ex_canon"), F.col("ex_canon"))
        .when(F.col("doc_id") != F.col("uc"), F.col("uc"))
        .when(F.col("nd_canon").isNotNull(), F.col("nd_canon"))
    )
    staged = out.select(
        "doc_id", killed_by.alias("killed_by"), canonical_id.alias("canonical_id")
    )
    return staged.select(
        "doc_id", "killed_by", "canonical_id",
        F.col("killed_by").isNull().alias("keep"),
    )

def _band_rows_nonnull_sql() -> str:
    # band_hashes() drops shingle-less docs (all-NULL signature) so
    # they never form md5('') cliques; the oracle must mirror that
    return _band_rows_sql(where=" WHERE sig_0 IS NOT NULL")

@_q(
    "cross_snapshot_dedup",
    _MINHASH_CTE
    + f"""
    , banded AS ({_band_rows_nonnull_sql()}),
    sp AS (SELECT doc_id,
                  ({_H32.format(s="'split:' || doc_id")} % 100) AS bucket
           FROM documents),
    newd AS (SELECT d.doc_id, md5(d.text) AS h
             FROM documents d JOIN sp ON sp.doc_id = d.doc_id
             WHERE sp.bucket >= 90),
    corph AS (SELECT DISTINCT md5(d.text) AS h
              FROM documents d JOIN sp ON sp.doc_id = d.doc_id
              WHERE sp.bucket < 80),
    exact AS (SELECT DISTINCT n.doc_id FROM newd n JOIN corph c ON n.h = c.h),
    corpb AS (SELECT DISTINCT b.band_id, b.band_hash
              FROM banded b JOIN sp ON sp.doc_id = b.doc_id
              WHERE sp.bucket < 80),
    near AS (SELECT DISTINCT b.doc_id
             FROM banded b
             JOIN sp ON sp.doc_id = b.doc_id
             JOIN corpb c ON c.band_id = b.band_id
                         AND c.band_hash = b.band_hash
             WHERE sp.bucket >= 90)
    SELECT n.doc_id,
           CASE WHEN e.doc_id IS NOT NULL THEN 'exact_dup'
                WHEN nr.doc_id IS NOT NULL THEN 'near_dup'
                ELSE 'new' END AS verdict,
           (e.doc_id IS NULL AND nr.doc_id IS NULL) AS keep
    FROM newd n
    LEFT JOIN exact e ON e.doc_id = n.doc_id
    LEFT JOIN near nr ON nr.doc_id = n.doc_id
    """,
)
def cross_snapshot_dedup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental corpus ingestion gate: the test-split docs (hash
    bucket >= 90) arrive as a NEW batch and are classified against the
    train-split corpus (bucket < 80) as exact_dup / near_dup (LSH band
    collision) / new. Corpus is touched only via two distinct-hash
    semi-joins — never a |new| x |corpus| pair scan."""
    from tastytrade_sdk_spark.llmops.dedup import cross_snapshot_dedup
    from tastytrade_sdk_spark.llmops.textops import h32

    docs = load_table(spark, "documents", sf_dir)
    bucket = h32(
        F.concat(F.lit("split:"), F.col("doc_id").cast("string"))
    ) % 100
    return cross_snapshot_dedup(
        docs.filter(bucket >= 90), docs.filter(bucket < 80)
    )

@_q(
    "dedup_normalized_text",
    _TOKS_CTE
    + """
    SELECT md5(array_to_string(t, ' ')) AS content_hash,
           CAST(min(doc_id) AS BIGINT) AS canonical_id,
           CAST(count(*) AS BIGINT) AS n_docs
    FROM toks GROUP BY 1
    """,
)
def dedup_normalized_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Normalization-invariant exact dedup: the digest is taken over
    the token-normalized text (lowercase, punctuation/whitespace
    collapsed), so case and punctuation variants of the same content
    collapse into one group — the tier between raw-byte exact dedup
    and MinHash near-dedup. Same single hash-groupBy plan as
    dedup_exact_text."""
    from tastytrade_sdk_spark.llmops.dedup import exact_duplicates

    toked = _tokenized_docs(spark, sf_dir).select(
        "doc_id", F.concat_ws(" ", F.col("__toks")).alias("__norm")
    )
    return exact_duplicates(toked, text_col="__norm")

# ---------------------------------------------------------------------------
# Exact substring dedup (Lee et al. ExactSubstr — llmops/substr.py)

_SUBSTR_SPANS_ORACLE = """
    WITH w AS (
      SELECT doc_id, i, substring(text, i, 40) AS win
      FROM documents,
           unnest(generate_series(1, greatest(len(text) - 39, 0))) AS g(i)
      WHERE text IS NOT NULL
    ), dup AS (
      SELECT win FROM w GROUP BY win HAVING count(*) >= 2
    ), a AS (
      SELECT doc_id, i FROM w JOIN dup USING (win)
    ), fl AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 40
                  THEN 0 ELSE 1 END AS brk
      FROM a
    ), isl AS (
      SELECT doc_id, i,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM fl
    )
    SELECT doc_id, CAST(min(i) AS INT) AS span_start,
           CAST(max(i) + 40 AS INT) AS span_end
    FROM isl GROUP BY doc_id, grp
"""

@_q("exact_substring_spans", _SUBSTR_SPANS_ORACLE)
def exact_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact duplicate-span extraction (Lee et al. ExactSubstr): every
    maximal character range lying inside a substring of length >= 40
    that occurs at least twice anywhere in the corpus. Global
    window-anchor plan: one narrow per-char window Generate, one
    shuffle on the window content with map-side partials, one per-doc
    island merge — linear in corpus characters."""
    from tastytrade_sdk_spark.llmops.substr import duplicate_spans

    docs = load_table(spark, "documents", sf_dir)
    return duplicate_spans(docs, min_len=40)

_SUBSTR_SCRUB_ORACLE = """
    WITH w AS (
      SELECT doc_id, i, substring(text, i, 40) AS win
      FROM documents,
           unnest(generate_series(1, greatest(len(text) - 39, 0))) AS g(i)
      WHERE text IS NOT NULL
    ), dup AS (
      SELECT win FROM w GROUP BY win HAVING count(*) >= 2
    ), a AS (
      SELECT doc_id, i FROM w JOIN dup USING (win)
    ), fl AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 40
                  THEN 0 ELSE 1 END AS brk
      FROM a
    ), isl AS (
      SELECT doc_id, i,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM fl
    ), spans AS (
      SELECT doc_id, min(i) AS s, max(i) + 40 AS e
      FROM isl GROUP BY doc_id, grp
    ), seg AS (
      SELECT doc_id, s, e,
             lag(e, 1, 1) OVER (PARTITION BY doc_id ORDER BY s) AS prev_e
      FROM spans
    ), agg AS (
      SELECT seg.doc_id,
             string_agg(substring(d.text, seg.prev_e, seg.s - seg.prev_e),
                        '' ORDER BY seg.s) AS head,
             max(seg.e) AS last_e,
             CAST(sum(seg.e - seg.s) AS BIGINT) AS n_dup
      FROM seg JOIN documents d USING (doc_id)
      GROUP BY seg.doc_id
    )
    SELECT d.doc_id,
           CAST(coalesce(a.n_dup, 0) AS BIGINT) AS n_dup_chars,
           CASE WHEN d.text IS NULL THEN NULL
                WHEN a.doc_id IS NULL THEN d.text
                ELSE a.head || substring(d.text, a.last_e) END AS clean_text
    FROM documents d LEFT JOIN agg a USING (doc_id)
"""

@_q("exact_substring_scrub", _SUBSTR_SCRUB_ORACLE)
def exact_substring_scrub_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr with text reconstruction: duplicate spans cut and
    the document re-assembled from the survivors (n_dup_chars +
    clean_text per doc, every input doc preserved). The rebuild is a
    narrow per-row fold over the doc's sorted span array."""
    from tastytrade_sdk_spark.llmops.substr import exact_substring_scrub

    docs = load_table(spark, "documents", sf_dir)
    return exact_substring_scrub(docs, min_len=40)

@_q("sa_substring_spans", _SUBSTR_SPANS_ORACLE)
def sa_substring_spans_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The paper's literal mechanism: per-shard suffix array + Kasai
    LCP as a grouped Arrow kernel (llmops/substr.py:sa_duplicate_spans),
    in its SCALE form — n_shards > 1 with ``exact`` routing, where
    duplicate-window connected components co-locate every cross-doc
    duplicate pair, so the output is provably identical to the global
    window-anchor tier (and to the oracle) at any shard count. Size
    n_shards ∝ corpus bytes at 100 TB; the retired n_shards=1
    single-SA form (the documented quadratic honest-negative) lives
    only in tools/scale_probe.py as a regression sentinel."""
    from tastytrade_sdk_spark.llmops.substr import sa_duplicate_spans

    docs = load_table(spark, "documents", sf_dir)
    # n_shards follows the session's parallelism (floor 8): output is
    # provably identical at ANY shard count under exact routing (see
    # sa_duplicate_spans — oracle + equivalence keep proving it), the
    # superlinear kernel only gets cheaper per shard, and a fixed 8
    # left 3/4 of the cores idle in the kernel stage (guide §2.2 —
    # scale-adaptive partitioning, not a local[32] constant)
    shards = max(8, spark.sparkContext.defaultParallelism)
    return sa_duplicate_spans(
        docs, min_len=40, n_shards=shards, routing="exact"
    )

_XSNAP_SUBSTR_ORACLE = """
    WITH w AS (
      SELECT doc_id, i, md5(substring(text, i, 40)) AS h
      FROM documents,
           unnest(generate_series(1, greatest(len(text) - 39, 0))) AS g(i)
      WHERE text IS NOT NULL
    ), corpus AS (
      SELECT DISTINCT h FROM w WHERE doc_id % 2 = 0
    ), nw AS (
      SELECT doc_id, i, h FROM w WHERE doc_id % 2 = 1
    ), loc AS (
      SELECT h FROM nw GROUP BY h HAVING count(*) >= 2
    ), a AS (
      SELECT DISTINCT doc_id, i FROM nw
      WHERE h IN (SELECT h FROM corpus) OR h IN (SELECT h FROM loc)
    ), fl AS (
      SELECT doc_id, i,
             CASE WHEN i - lag(i) OVER (PARTITION BY doc_id ORDER BY i) <= 40
                  THEN 0 ELSE 1 END AS brk
      FROM a
    ), isl AS (
      SELECT doc_id, i,
             sum(brk) OVER (PARTITION BY doc_id ORDER BY i
                            ROWS UNBOUNDED PRECEDING) AS grp
      FROM fl
    )
    SELECT doc_id, CAST(min(i) AS INT) AS span_start,
           CAST(max(i) + 40 AS INT) AS span_end
    FROM isl GROUP BY doc_id, grp
"""

@_q("cross_snapshot_substring_spans", _XSNAP_SUBSTR_ORACLE)
def cross_snapshot_substring_spans_q(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Incremental ExactSubstr: the corpus (even doc ids) keeps a
    distinct window-hash store; the arriving batch (odd doc ids) is
    probed against it with ONE hash-keyed semi-join plus a
    within-batch count — duplicate spans identical to a full-lake
    re-scan (equivalence-tested), without touching corpus text. The
    steady-state path persists the store between batches
    (llmops/substr.py:substring_store_batch)."""
    from tastytrade_sdk_spark.llmops.substr import (
        cross_snapshot_substring_spans,
        window_hash_state,
    )

    docs = load_table(spark, "documents", sf_dir)
    corpus = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return cross_snapshot_substring_spans(
        new, window_hash_state(corpus, min_len=40), min_len=40
    )

_SEG_LEN = 12

@_q(
    "segment_dedup_rebuild",
    _TOKS_CTE
    + f"""
    , segs AS (
      SELECT doc_id, i AS seg_idx,
             array_to_string(t[(i*{_SEG_LEN}+1):(i*{_SEG_LEN}+{_SEG_LEN})],
                             ' ') AS seg
      FROM toks,
           unnest(generate_series(
             0, CAST(ceil(len(t) / {_SEG_LEN}.0) AS INT) - 1)) AS g(i)
      WHERE len(t) > 0
    ), marked AS (
      SELECT doc_id, seg_idx, seg,
             row_number() OVER (PARTITION BY md5(seg)
                                ORDER BY doc_id, seg_idx) = 1 AS keep
      FROM segs
    ), agg AS (
      SELECT doc_id,
             CAST(count(*) AS BIGINT) AS n_segments,
             CAST(sum(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
             coalesce(string_agg(CASE WHEN keep THEN seg END, ' '
                                 ORDER BY seg_idx), '') AS text_rebuilt
      FROM marked
      GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(n_segments, 0) AS n_segments,
           coalesce(n_kept, 0) AS n_kept,
           coalesce(text_rebuilt, '') AS text_rebuilt
    FROM documents d LEFT JOIN agg USING (doc_id)
    """,
)
def segment_dedup_rebuild(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/RefinedWeb-style segment(line)-level dedup: keep the
    first corpus-wide occurrence of every distinct 12-token segment,
    rebuild each doc from its survivors (llmops/dedup.segment_dedup —
    narrow segment build, one digest-keyed window, one doc-keyed
    rebuild)."""
    from tastytrade_sdk_spark.llmops.dedup import segment_dedup

    docs = load_table(spark, "documents", sf_dir)
    return segment_dedup(docs, seg_len=_SEG_LEN)

@_q(
    "contamination_near_dup",
    _MINHASH_CTE
    + f"""
    , banded AS MATERIALIZED (
        {_band_rows_sql(" WHERE sig_0 IS NOT NULL")})
    , ev AS (SELECT * FROM banded WHERE doc_id % 11 = 0)
    , co AS (SELECT * FROM banded WHERE doc_id % 11 <> 0)
    SELECT co.doc_id AS doc_id,
           CAST(count(DISTINCT ev.doc_id) AS BIGINT) AS n_eval_partners,
           CAST(count(*) AS BIGINT) AS n_shared_bands
    FROM co JOIN ev
      ON co.band_id = ev.band_id AND co.band_hash = ev.band_hash
    GROUP BY co.doc_id
    """,
)
def contamination_near_dup_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate benchmark contamination: corpus docs sharing an
    LSH band with the (deterministic doc_id%11 slice) eval set —
    catches the rephrased leakage the exact n-gram contamination_check
    misses (llmops/dedup.near_dup_contamination: one MinHash pass per
    side, eval side broadcast, corpus never shuffles)."""
    from tastytrade_sdk_spark.llmops.dedup import near_dup_contamination

    docs = load_table(spark, "documents", sf_dir)
    return near_dup_contamination(
        docs.filter(F.col("doc_id") % 11 != 0),
        docs.filter(F.col("doc_id") % 11 == 0),
    )

@_q(
    "soft_dedup_weights",
    _SHINGLES_CTE
    + f"""
    , sh AS (
      SELECT DISTINCT doc_id, {_H32S.format(s='shingle')} AS h FROM sh0
    ), freq AS (
      SELECT h, count(*) AS n_docs FROM sh GROUP BY h
    ), per_doc AS (
      SELECT doc_id, count(*) AS n_shingles,
             CAST(sum(n_docs) AS BIGINT) AS commonness_sum
      FROM sh JOIN freq USING (h) GROUP BY doc_id
    )
    SELECT d.doc_id,
           coalesce(p.n_shingles, 0) AS n_shingles,
           coalesce(p.commonness_sum, 0) AS commonness_sum,
           CASE WHEN coalesce(p.n_shingles, 0) = 0
                THEN CAST(1000000 AS BIGINT)
                ELSE CAST(p.n_shingles * 1000000 AS BIGINT)
                     // p.commonness_sum END AS weight_ppm
    FROM documents d LEFT JOIN per_doc p USING (doc_id)
    """,
)
def soft_dedup_weights_q(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDedup reweighting (He et al. 2024): per-doc integer
    sampling weight inversely proportional to mean docs-per-shingle —
    keep everything, downweight the duplicated mass; feeds
    priority_sample(weight_col='weight_ppm') for the actual draw."""
    from tastytrade_sdk_spark.llmops.dedup import soft_dedup_weights

    docs = load_table(spark, "documents", sf_dir)
    return soft_dedup_weights(docs)

@_q(
    "dedup_best_canonical",
    """
    WITH corpus AS (
      SELECT doc_id, text, (doc_id * 37) % 101 AS q FROM documents
      UNION ALL
      SELECT doc_id + 100000, text, ((doc_id + 100000) * 37) % 101
      FROM documents WHERE doc_id % 5 = 0
    ), ranked AS (
      SELECT md5(text) AS content_hash, doc_id,
             CAST(q AS DOUBLE) AS q,
             row_number() OVER (
               PARTITION BY md5(text)
               ORDER BY q DESC, doc_id ASC) AS rn,
             count(*) OVER (PARTITION BY md5(text)) AS n_docs
      FROM corpus
    )
    SELECT content_hash,
           doc_id AS canonical_id,
           q AS best_score,
           CAST(n_docs AS BIGINT) AS n_docs
    FROM ranked WHERE rn = 1
    """,
)
def dedup_best_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quality-aware canonical selection (llmops/dedup.
    best_copy_canonical): the corpus is the documents table plus a
    fabricated re-crawl of every fifth doc (same text, new id, its own
    synthetic source-rank score) — within each duplicate group the
    HIGHEST-scoring copy wins (tiebreak min id), the RefinedWeb-style
    keep-best-extraction policy, in ONE content-hash-keyed aggregate
    (no window, no join)."""
    from tastytrade_sdk_spark.llmops.dedup import best_copy_canonical

    docs = load_table(spark, "documents", sf_dir)
    recrawl = docs.filter(F.col("doc_id") % 5 == 0).withColumn(
        "doc_id", F.col("doc_id") + 100000
    )
    corpus = docs.select("doc_id", "text").unionByName(
        recrawl.select("doc_id", "text")
    )
    scored = corpus.withColumn("q", (F.col("doc_id") * 37) % 101)
    return best_copy_canonical(scored, "q")
