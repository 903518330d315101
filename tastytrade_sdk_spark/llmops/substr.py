"""Exact substring-level deduplication (Lee et al. 2022,
"Deduplicating Training Data Makes Language Models Better",
ExactSubstr): find every character that lies inside a substring of
length >= ``min_len`` occurring at least twice anywhere in the corpus
(across documents or repeated within one), emit the maximal duplicate
spans per document, and optionally rebuild the scrubbed text.

Two tiers, identical output by construction (equivalence-tested):

- **Global window-anchor path** (``duplicate_spans`` /
  ``exact_substring_scrub``) — the cross-shard-EXACT tier. A char is
  in a duplicated substring of length >= L iff it is covered by some
  length-L window whose content occurs >= 2 times in the corpus
  (a duplicated span [p, p+m), m >= L, duplicates every one of its
  L-windows; conversely every duplicated L-window IS a duplicated
  substring). So: explode one length-L window per char position
  (narrow Generate, no shuffle), groupBy window content with map-side
  partial counts (the ONLY wide shuffle, keyed by the L-char window;
  at 100 TB put an xxhash64 prefilter in front so the shuffle key is
  8 bytes and only hash-colliding buckets re-verify on text), join
  the >=2 set back, then a per-doc lag/cumsum island merge. Linear in
  corpus characters end to end — the same asymptotics as the paper's
  suffix array, with Spark-native partial aggregation instead of a
  global sort.
- **Per-shard suffix-array kernel** (``sa_duplicate_spans``) — the
  paper's literal mechanism as a grouped Arrow kernel: documents are
  hash-sharded, each shard's texts are concatenated with distinct
  out-of-alphabet sentinels, a suffix array (numpy prefix-doubling,
  O(n log^2 n)) + a vectorized adjacent-suffix LCP scan find all
  >=min_len repeats, and
  covered positions map back to per-doc spans. One shard sees only
  its own documents, so cross-shard duplicate PAIRS are found only
  when shard routing co-locates them (n_shards=1 == the global
  tier; at scale route near-dup candidates, e.g. an LSH band, to the
  same shard). Within-doc repeats are always found regardless of
  sharding. Use this tier when the window explode's row blowup
  (1 row/char) is the bottleneck and shard routing is available; use
  the global tier when exactness across arbitrary shards is required.

No counterpart in the reference SDK (this is the training-pipeline
mandate); the proxy tier lives at llmops/dedup.py:229
(dup_shingle_fraction) and the word-level scrub at dedup.py:335
(frequent_span_removal).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

__all__ = [
    "duplicate_spans",
    "exact_substring_scrub",
    "sa_duplicate_spans",
]


def _window_rows(
    df: DataFrame, text_col: str, id_col: str, min_len: int
) -> DataFrame:
    """(id, i, __win) — one length-L window per 1-based char position.
    The ONE copy of the window-generation scaffolding (NULL-text
    greatest() guard, spread for one-file local sources, per-char
    Generate) every substring tier projects from."""
    from tastytrade_sdk_spark.llmops.dedup import _spread

    L = min_len
    # greatest() ignores NULLs in Spark, so a NULL text yields 0
    # windows rather than a NULL sequence bound
    n_win = F.greatest(F.length(F.col(text_col)) - F.lit(L - 1), F.lit(0))
    idx = F.when(n_win > 0, F.sequence(F.lit(1), n_win)).otherwise(
        F.array().cast("array<int>")
    )
    # the per-char window Generate is the dominant cost and is
    # consumed multiple times downstream: spread the doc scan across
    # the cluster first or it runs single-task on a one-file source
    return _spread(df.select(id_col, text_col), id_col).select(
        F.col(id_col), F.col(text_col), F.explode(idx).alias("i")
    ).select(
        F.col(id_col),
        F.col("i"),
        F.substring(F.col(text_col), F.col("i"), L).alias("__win"),
    )


def _anchors(df: DataFrame, text_col: str, id_col: str, min_len: int) -> DataFrame:
    """(id, i) rows: 1-based positions whose length-L window occurs
    >= 2 times in the corpus (multiplicity counts within-doc repeats).
    """
    wins = _window_rows(df, text_col, id_col, min_len)
    dup = (
        wins.groupBy("__win")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("__win")
    )
    return wins.join(dup, "__win").select(id_col, "i")


def _merge_islands(anchors: DataFrame, id_col: str, min_len: int) -> DataFrame:
    """Gaps-and-islands merge of [i, i+L) anchor intervals into maximal
    spans: all windows share length L, so intervals touch iff
    i - lag(i) <= L. One shuffle keyed by doc."""
    L = min_len
    w = Window.partitionBy(id_col).orderBy("i")
    brk = F.when(F.col("i") - F.lag("i").over(w) <= F.lit(L), F.lit(0)).otherwise(
        F.lit(1)
    )
    g = F.sum(F.col("__brk")).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        anchors.withColumn("__brk", brk)
        .withColumn("__g", g)
        .groupBy(id_col, "__g")
        .agg(
            F.min("i").alias("span_start"),
            (F.max("i") + F.lit(L)).alias("span_end"),
        )
        .select(id_col, "span_start", "span_end")
    )


def duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 40,
) -> DataFrame:
    """Maximal duplicate spans per document: (id, span_start,
    span_end), 1-based start, exclusive end — every character in
    [span_start, span_end) lies in some corpus-duplicated substring of
    length >= min_len, and no covered character is missed (exact, not
    a proxy). Docs with no duplicated substring emit no rows."""
    return _merge_islands(_anchors(df, text_col, id_col, min_len), id_col, min_len)


def exact_substring_scrub(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 40,
) -> DataFrame:
    """Rebuild each document with its duplicate spans cut: (id,
    n_dup_chars, clean_text). Every input doc survives — a doc with no
    spans keeps its full text; a NULL text stays NULL with 0 dup
    chars. The rebuild is a narrow per-row fold over the doc's sorted
    span array (no second shuffle beyond the span agg itself)."""
    spans = duplicate_spans(df, text_col, id_col, min_len)
    per_doc = spans.groupBy(id_col).agg(
        F.sort_array(
            F.collect_list(F.struct("span_start", "span_end"))
        ).alias("__spans")
    )
    joined = df.select(id_col, text_col).join(per_doc, id_col, "left")
    empty = F.array().cast(
        "array<struct<span_start:int,span_end:int>>"
    )
    sp = F.coalesce(F.col("__spans"), empty)
    n_dup = F.aggregate(
        sp,
        F.lit(0).cast("long"),
        lambda acc, s: acc + (s["span_end"] - s["span_start"]).cast("long"),
    )
    text = F.col(text_col)
    rebuilt = F.aggregate(
        sp,
        F.struct(
            F.lit("").alias("acc"), F.lit(1).cast("int").alias("prev")
        ),
        lambda a, s: F.struct(
            F.concat(
                a["acc"],
                F.substring(text, a["prev"], s["span_start"] - a["prev"]),
            ).alias("acc"),
            s["span_end"].alias("prev"),
        ),
        lambda a: F.concat(
            a["acc"],
            F.substring(
                text, a["prev"], F.length(text) - a["prev"] + F.lit(1)
            ),
        ),
    )
    return joined.select(
        F.col(id_col),
        n_dup.alias("n_dup_chars"),
        F.when(text.isNull(), F.lit(None).cast("string"))
        .otherwise(rebuilt)
        .alias("clean_text"),
    )


# ---------------------------------------------------------------------------
# Per-shard suffix-array tier


def _suffix_array(a: np.ndarray) -> np.ndarray:
    """Suffix array of an integer sequence via prefix doubling
    (O(n log^2 n): one numpy argsort per doubling over a fused int64
    key) — alphabet-agnostic, so per-doc sentinel values (distinct
    negatives) need no remapping."""
    n = len(a)
    if n == 0:
        return np.empty(0, dtype=np.int64)
    sa = np.argsort(a)
    rank = np.empty(n, dtype=np.int64)
    sorted_vals = a[sa]
    rank[sa] = np.cumsum(
        np.concatenate(([0], (sorted_vals[1:] != sorted_vals[:-1]).astype(np.int64)))
    )
    k = 1
    while k < n and rank[sa[-1]] < n - 1:
        # single fused sort key rank*(n+1) + (rank[i+k]+1): ranks are
        # < n and the shifted rank is in [-1, n-1], so the key fits
        # int64 for any corpus below ~3e9 chars per shard — one
        # argsort per doubling instead of a two-key lexsort (~2x)
        second = np.full(n, -1, dtype=np.int64)
        second[: n - k] = rank[k:]
        key = rank * np.int64(n + 1) + (second + 1)
        sa = np.argsort(key)
        ks = key[sa]
        changed = np.concatenate(([0], (ks[1:] != ks[:-1]).astype(np.int64)))
        rank[sa] = np.cumsum(changed)
        k *= 2
    return sa


def _adjacent_lcp(a: np.ndarray, sa: np.ndarray) -> np.ndarray:
    """LCP array (lcp[j] = common prefix of suffixes sa[j], sa[j+1])
    by vectorized simultaneous extension: every adjacent pair advances
    one character per numpy pass, dead pairs drop out. Total work is
    O(n + sum(lcp)) — on text the alive set collapses within a few
    passes, which beats Kasai's per-char Python walk ~10x."""
    n = len(a)
    lcp = np.zeros(max(n - 1, 0), dtype=np.int64)
    if n < 2:
        return lcp
    idx = np.arange(n - 1)
    p1 = sa[:-1].copy()
    p2 = sa[1:].copy()
    t = 0
    while idx.size:
        q1 = p1 + t
        q2 = p2 + t
        inb = (q1 < n) & (q2 < n)
        match = np.zeros(idx.size, dtype=bool)
        match[inb] = a[q1[inb]] == a[q2[inb]]
        alive = idx[match]
        lcp[alive] = t + 1
        idx, p1, p2 = alive, p1[match], p2[match]
        t += 1
    return lcp


def _shard_spans(pdf: pd.DataFrame, min_len: int) -> pd.DataFrame:
    """One shard: concatenate texts with distinct negative sentinels,
    SA + LCP, mark every position covered by an adjacent-suffix common
    prefix >= min_len, map runs back to per-doc 1-based spans."""
    pdf = pdf.sort_values("doc_id", kind="stable")
    pieces, bounds = [], []
    off = 0
    for sep, (doc_id, text) in enumerate(
        zip(pdf["doc_id"].tolist(), pdf["text"].tolist())
    ):
        if text is None or (isinstance(text, float) and np.isnan(text)):
            continue
        codes = np.frombuffer(text.encode("utf-32-le"), dtype=np.uint32).astype(
            np.int64
        )
        pieces.append(codes)
        pieces.append(np.array([-(sep + 1)], dtype=np.int64))
        bounds.append((doc_id, off, off + len(codes)))
        off += len(codes) + 1
    if not pieces:
        return pd.DataFrame(
            {"doc_id": pd.Series(dtype="object"),
             "span_start": pd.Series(dtype="int32"),
             "span_end": pd.Series(dtype="int32")}
        )
    a = np.concatenate(pieces)
    sa = _suffix_array(a)
    lcp = _adjacent_lcp(a, sa)
    n = len(a)
    diff = np.zeros(n + 1, dtype=np.int64)
    hit = np.nonzero(lcp >= min_len)[0]
    starts = np.concatenate((sa[hit], sa[hit + 1]))
    lens = np.concatenate((lcp[hit], lcp[hit]))
    np.add.at(diff, starts, 1)
    np.add.at(diff, starts + lens, -1)
    covered = np.cumsum(diff[:-1]) > 0
    out_id, out_s, out_e = [], [], []
    for doc_id, lo, hi in bounds:
        c = covered[lo:hi]
        if not c.any():
            continue
        edges = np.diff(np.concatenate(([0], c.astype(np.int8), [0])))
        starts = np.nonzero(edges == 1)[0]
        ends = np.nonzero(edges == -1)[0]
        for s, e in zip(starts, ends):
            out_id.append(doc_id)
            out_s.append(s + 1)          # 1-based inclusive start
            out_e.append(e + 1)          # exclusive end, 1-based frame
    return pd.DataFrame(
        {
            # id dtype follows the input values (long/int/string ids
            # all pass through; Arrow casts to the declared schema)
            "doc_id": pd.Series(out_id),
            "span_start": pd.Series(out_s, dtype="int32"),
            "span_end": pd.Series(out_e, dtype="int32"),
        }
    )


def sa_duplicate_spans(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 40,
    n_shards: int = 1,
    routing: str = "hash",
    k: int = 16,
    bands: int = 4,
    shingle_n: int = 3,
) -> DataFrame:
    """Duplicate spans via per-shard suffix arrays (grouped Arrow
    kernel). With n_shards=1 output is IDENTICAL to duplicate_spans
    (equivalence-tested). Kernel cost is O(n log^2 n) per shard in
    numpy, one shuffle keyed by the shard id.

    SIZE n_shards WITH THE CORPUS (n_shards ∝ corpus bytes / target
    shard size, ~one task's worth of text): a fixed shard count makes
    per-shard n grow with the corpus and the superlinear kernel
    dominates — measured in SCALING.md (100× corpus: n_shards=32 →
    112 s, n_shards=3200 → 5.8 s). Same lever as SemDeDup's k ∝ n.

    ``routing`` picks how documents map to shards when n_shards > 1:

    - ``"hash"``: plain id hash. Within-doc repeats are always found,
      but a cross-doc duplicate pair is found only when the two docs
      happen to co-locate — the fast, approximate tier.
    - ``"exact"``: duplicate-window co-location — the EXACT sharded
      tier. Any cross-doc duplicate of length >= L shares at least one
      length-L window, so docs are linked whenever they carry the same
      duplicated window hash (xxhash64, 8-byte shuffle key; per-hash
      edges go doc -> min-doc, a star, so edge count is linear in the
      distinct (hash, doc) pairs, never quadratic in a hash's doc
      list). Connected components of that graph route each duplicate
      cluster to ONE shard; untouched docs hash-route. Output is
      therefore IDENTICAL to the global tier at ANY n_shards: a hash
      collision can only add a spurious edge (over-co-locating, never
      separating a true pair), and the SA kernel re-verifies on real
      text. Shard size is bounded by the largest duplicate-connected
      component — the exact-grouping floor any scheme carries. The
      window pass reuses the linear _window_rows scaffold, so the
      routing pre-pass costs one extra hash-keyed shuffle.
    - ``"lsh"``: near-dup-candidate co-location. The MinHash-LSH band
      graph (dedup.lsh_candidate_pairs, k/bands/shingle_n) is
      clustered into connected components and each component routes to
      ONE shard, so every candidate pair — including transitive
      chains across band buckets — shares a suffix array; docs with
      no candidate (the overwhelming majority) hash into the n_shards
      buckets as before. Output equals the global tier whenever every
      cross-doc duplicate pair is an LSH candidate at the chosen
      k/bands (equivalence-tested on a seeded cross-shard fixture);
      shard size is bounded by the largest candidate component, the
      same bound every LSH consumer already carries. The routing join
      is SUBGRAPH-bounded (only edge-touched docs have a component
      row), so AQE broadcasts it against the corpus scan."""
    # the output id column keeps the CALLER's name and type (like
    # duplicate_spans), so the two tiers stay drop-in interchangeable
    # for any id column, not just a long doc_id
    schema = T.StructType(
        [
            T.StructField("doc_id", df.schema[id_col].dataType),
            T.StructField("span_start", T.IntegerType()),
            T.StructField("span_end", T.IntegerType()),
        ]
    )
    if routing not in ("hash", "lsh", "exact"):
        # validate BEFORE the n_shards branch: with the check inside
        # the elif chain a typo'd routing silently ran the hash tier
        # whenever n_shards <= 1 and only raised once the caller
        # scaled the shard count up
        raise ValueError(f"unknown routing: {routing}")
    hash_bucket = F.pmod(F.xxhash64(F.col(id_col)), F.lit(n_shards))
    # each candidate-routing tier produces a (id, component) frame;
    # the base construction (component shard, hash-bucket fallback)
    # is shared so the tiers can't drift
    comp = None
    if routing == "exact" and n_shards > 1:
        from tastytrade_sdk_spark.llmops.cluster import connected_components

        hd = (
            _window_rows(df, text_col, id_col, min_len)
            .select(F.col(id_col), F.xxhash64(F.col("__win")).alias("__wh"))
            .distinct()
        )
        per_hash = Window.partitionBy("__wh")
        edges = (
            hd.select(
                F.col(id_col),
                F.min(id_col).over(per_hash).alias("__rep"),
                F.count(F.lit(1)).over(per_hash).alias("__nd"),
            )
            .filter((F.col("__nd") >= 2) & (F.col(id_col) != F.col("__rep")))
            .select(
                F.col(id_col).alias("doc_a"), F.col("__rep").alias("doc_b")
            )
            .distinct()
        )
        comp = connected_components(edges, id_col=id_col)
    elif routing == "lsh" and n_shards > 1:
        from tastytrade_sdk_spark.llmops.cluster import connected_components
        from tastytrade_sdk_spark.llmops.dedup import lsh_candidate_pairs

        comp = connected_components(
            lsh_candidate_pairs(
                df,
                text_col=text_col,
                id_col=id_col,
                k=k,
                bands=bands,
                shingle_n=shingle_n,
            ),
            id_col=id_col,
        )
    if comp is not None:
        comp = comp.select(
            F.col(id_col).alias("__rid"), F.col("component").alias("__comp")
        )
        base = (
            df.select(F.col(id_col), F.col(text_col))
            .join(comp, F.col(id_col) == F.col("__rid"), "left")
            .select(
                F.col(id_col).alias("doc_id"),
                F.col(text_col).alias("text"),
                F.coalesce(
                    F.concat(F.lit("c"), F.col("__comp").cast("string")),
                    F.concat(F.lit("h"), hash_bucket.cast("string")),
                ).alias("__shard"),
            )
        )
    else:
        base = df.select(
            F.col(id_col).alias("doc_id"),
            F.col(text_col).alias("text"),
            hash_bucket.alias("__shard"),
        )
    out = base.groupBy("__shard").applyInPandas(
        lambda pdf: _shard_spans(pdf, min_len), schema
    )
    return out.withColumnRenamed("doc_id", id_col)


# ---------------------------------------------------------------------------
# Incremental (cross-snapshot) tier: the continuous-ingestion form of
# ExactSubstr, mirroring llmops/dedup.cross_snapshot_dedup — a growing
# corpus keeps a WINDOW STORE (distinct md5 of every length-L window
# ever admitted) and each arriving batch probes it instead of
# re-scanning the lake.


def _hashed_windows(
    df: DataFrame, text_col: str, id_col: str, min_len: int
) -> DataFrame:
    """(id, i, __h=md5(window)) per char position — the probe unit of
    the incremental tier, projected from the shared _window_rows
    scaffold. md5 keeps the shuffle key 32 bytes instead of L chars
    and is replayable in the DuckDB oracle; both engines hash
    identically, so even a (cosmically unlikely) collision stays
    parity-exact."""
    return _window_rows(df, text_col, id_col, min_len).select(
        F.col(id_col), F.col("i"), F.md5(F.col("__win")).alias("__h")
    )


def window_hash_state(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 40,
) -> DataFrame:
    """The persisted substring store: DISTINCT md5 of every length-L
    window in the corpus — linear state keyed on a uniform hash
    (column ``__h``), exactly what a lake pipeline checkpoints between
    ingestion batches."""
    return _hashed_windows(df, text_col, id_col, min_len).select("__h").distinct()


def cross_snapshot_substring_spans(
    new_docs: DataFrame,
    window_state: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 40,
) -> DataFrame:
    """Duplicate spans of NEW documents against corpus ∪ batch: a
    position anchors iff its window's hash is already in the corpus
    store OR occurs >= 2 times within the batch itself. By the same
    window-cover argument as duplicate_spans, the output EQUALS
    running duplicate_spans over corpus ∪ new and keeping the new
    docs' rows (equivalence-tested) — without ever re-scanning the
    corpus text.

    Scale shape: the batch's windows are scanned once; the store is
    touched by ONE hash-keyed semi-join (AQE broadcast-promotes the
    batch side when it fits); nothing pairs |new| x |corpus|."""
    # the window explode is the dominant cost and has THREE consumers
    # (local-dup agg + two semi-join branches): cut the lineage once.
    # EAGER: materializing under AQE beat the lazy pin by ~35% (r11,
    # the nn_descent finding)
    wins = _hashed_windows(new_docs, text_col, id_col, min_len).localCheckpoint(
        eager=True
    )
    dup_local = (
        wins.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("__h")
    )
    anchors = (
        wins.join(window_state.select("__h"), "__h", "left_semi")
        .unionByName(wins.join(dup_local, "__h", "left_semi"))
        .select(id_col, "i")
        .distinct()
    )
    return _merge_islands(anchors, id_col, min_len)


def substring_store_batch(
    batch_df: DataFrame,
    store_path: str,
    out_path: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 40,
) -> None:
    """One micro-batch through the incremental substring dedup: emit
    the batch's duplicate spans (vs store ∪ batch) to ``out_path`` and
    fold the batch's window hashes into the store.

    The store records the OWNING doc id per hash (min contributor,
    the same self-collision guard as the streaming band store,
    dedup_stream.py): a REPLAYED batch finds its own hashes in the
    store, and without the owner check every one of its windows would
    self-anchor and the whole batch would be scrubbed as duplicate.
    Replay safety: span output is keyed-upserted on (id, span_start)
    so a replayed batch converges; the store append is a left-anti on
    the hash, so replays add nothing and the store stays distinct."""
    import os

    from tastytrade_sdk_spark.streaming.sinks import upsert_parquet_batch

    spark = batch_df.sparkSession
    if batch_df.isEmpty():
        return
    id_type = dict(batch_df.dtypes)[id_col]
    if os.path.exists(store_path):
        state = spark.read.parquet(store_path)
    else:
        state = spark.createDataFrame([], f"__h string, owner {id_type}")
    wins = _hashed_windows(batch_df, text_col, id_col, min_len)
    wins = wins.localCheckpoint(eager=True)
    store_hits = (
        wins.join(state, "__h")
        .filter(F.col("owner") != F.col(id_col))
        .select(id_col, "i")
    )
    dup_local = (
        wins.groupBy("__h")
        .agg(F.count(F.lit(1)).alias("__n"))
        .filter(F.col("__n") >= 2)
        .select("__h")
    )
    local_hits = wins.join(dup_local, "__h", "left_semi").select(id_col, "i")
    anchors = store_hits.unionByName(local_hits).distinct()
    spans = _merge_islands(anchors, id_col, min_len)
    spans = spans.localCheckpoint(eager=True)
    upsert_parquet_batch(
        spans, out_path, [id_col, "span_start"], [id_col, "span_start"]
    )
    new_hashes = (
        wins.groupBy("__h")
        # owner keeps the id column's own type: a long cast would
        # NULL string ids and the owner != id guard (NULL) would then
        # silently drop every store hit
        .agg(F.min(F.col(id_col)).alias("owner"))
        .join(state.select("__h"), "__h", "left_anti")
    )
    new_hashes.write.mode("append").parquet(store_path)


def substring_dedup_sink(
    stream: DataFrame,
    store_path: str,
    out_path: str,
    checkpoint: str,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_len: int = 40,
):
    """writeStream wiring for the incremental substring dedup: each
    micro-batch probes the persisted window store, upserts its
    duplicate spans, and folds its hashes in (substring_store_batch)."""
    return (
        stream.writeStream.outputMode("append")
        .option("checkpointLocation", checkpoint)
        .foreachBatch(
            lambda df, epoch: substring_store_batch(
                df, store_path, out_path, text_col, id_col, min_len
            )
        )
    )
