"""Deterministic cardinality / frequency sketches as pure expressions.

Spark ships approx_count_distinct (HLL++) and count_min_sketch, but
their register layouts are engine-private — results can't be
cross-checked against another engine, merged with sketches built
elsewhere, or reproduced run-to-run across versions. These two
operators rebuild the textbook sketches from an explicit md5-based
hash so the SAME sketch is computable (and hash-verified) in DuckDB:

- **KMV (k-minimum-values)** distinct-count: keep the k smallest
  distinct normalized hashes per group; estimate = (k-1)/h_(k).
  One shuffle on (group, hash) for the distinct, one tiny top-k.
  Sketch size is O(k) per group regardless of data volume, and two
  KMV sketches union by merging their k-min sets — the property that
  makes per-partition partials and cross-day rollups work at 100 TB.
- **Count-min sketch** frequency table: d independent hash rows x w
  counters; est(key) = min_r counter[r, h_r(key)]. The sketch build is
  a groupBy over (row, col) — d*w cells TOTAL, independent of key
  cardinality — and the heavy-hitter probe is an equi-join of candidate
  keys against those cells. At lake scale the sketch is a broadcast
  table; the full key list never shuffles.

The 60-bit md5 prefix hash is the same construction the dedup/split
operators use (llmops/textops.h32): uniform, stable across engines,
and wide enough that collision probability at any realistic group size
is negligible.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

__all__ = [
    "kmv_distinct",
    "cms_build",
    "cms_probe",
    "histogram_quantiles",
    "mg_candidates",
    "heavy_hitters_exact",
    "hll_sketch",
    "hll_merge",
    "hll_estimate",
]

_H60_DEN = float(1 << 60)


def _h60(c: Column) -> Column:
    """Uniform 60-bit integer hash of a column's string form."""
    from tastytrade_sdk_spark.llmops.textops import h60

    return h60(c.cast("string"))


def kmv_distinct(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group distinct-count estimate from the k minimum hash values.

    Returns (group_cols..., kmv_seen, kmv_estimate): if fewer than k
    distinct hashes exist the count is exact; otherwise the classic
    unbiased estimator (k-1) / normalized k-th minimum. The estimate is
    rounded to 4dp — far above IEEE division noise, far below sketch
    error (~1/sqrt(k) ≈ 12% at k=64).
    """
    h = _h60(F.col(value_col)).alias("__h")
    distinct = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h"))
    topk = distinct.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return topk.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("kmv_seen"),
        F.round(
            F.when(F.count(F.lit(1)) < k, F.count(F.lit(1)).cast("double")).otherwise(
                F.lit(float(k - 1)) / (F.max("__h").cast("double") / F.lit(_H60_DEN))
            ),
            4,
        ).alias("kmv_estimate"),
    )


def kmv_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, k: int = 64
) -> DataFrame:
    """Per-group MERGEABLE KMV sketch: the sorted k minimum hash
    values as an array column (group_cols..., kmv). Unlike the scalar
    estimate (kmv_distinct), the array form supports downstream SET
    ALGEBRA — union/intersection/Jaccard between groups — without
    touching the raw data again; at lake scale the sketches are tiny
    (k longs per group) and every pairwise overlap query runs on the
    sketch table alone."""
    h = _h60(F.col(value_col)).alias("__h")
    distinct = df.select(*group_cols, h).distinct()
    w = Window.partitionBy(*group_cols).orderBy(F.col("__h"))
    topk = distinct.withColumn("__rn", F.row_number().over(w)).filter(
        F.col("__rn") <= k
    )
    return topk.groupBy(*group_cols).agg(
        F.sort_array(F.collect_list("__h")).alias("kmv")
    )


def kmv_pair_overlap(
    sketches: DataFrame, group_col: str, k: int = 64,
    max_groups: int = 1024,
) -> DataFrame:
    """Pairwise distinct-set overlap between groups, from KMV sketches
    only (Beyer et al.): merge two sketches by keeping the k smallest
    of the union; the union estimate is the standard (k-1)/kth-min on
    the merged sketch (exact when the merged set is still smaller than
    k); Jaccard is the fraction of merged-sketch hashes present in
    BOTH input sketches; intersection = jaccard * union. Cost: a
    groups x groups self-join over k-long arrays — the raw corpus is
    never rescanned.

    Outputs (group_a, group_b, union_est, jaccard, inter_est), halves
    ordered group_a < group_b; estimates rounded at 4dp (division
    noise ~1e-16, sketch error ~1/sqrt(k)).

    Pairwise overlap is QUADRATIC in groups by definition (the a < b
    self-join has no equi key), so the operator refuses more than
    ``max_groups`` sketch rows instead of silently nested-looping a
    data-sized side: the sketch table is materialized (tiny — k longs
    per group), counted, and the explicit limit() makes the broadcast
    build side bounded BY CONSTRUCTION (the plan-smell gate rejects
    any BNLJ it cannot prove bounded). Millions of groups need a
    different question — e.g. kmv per group joined to a fixed probe
    set — not all-pairs."""
    sketches = sketches.localCheckpoint(eager=True)
    n = sketches.count()
    if n > max_groups:
        raise ValueError(
            f"kmv_pair_overlap: {n} groups > max_groups={max_groups}; "
            "all-pairs overlap is quadratic — raise max_groups "
            "deliberately or restructure the question"
        )
    bounded = sketches.limit(max_groups)
    a = bounded.select(
        F.col(group_col).alias("group_a"), F.col("kmv").alias("__ka")
    )
    b = bounded.select(
        F.col(group_col).alias("group_b"), F.col("kmv").alias("__kb")
    )
    pairs = a.join(b, F.col("group_a") < F.col("group_b"))
    merged = F.slice(
        F.array_sort(F.array_union(F.col("__ka"), F.col("__kb"))), 1, k
    )
    pairs = pairs.withColumn("__m", merged)
    s = F.size("__m")
    # F.get (0-based) NULLs on out-of-bounds instead of raising under
    # ANSI — the when() guard's other branch is still evaluated
    # vectorized, so element_at(k) would throw on short merged sets
    union_raw = F.when(s < k, s.cast("double")).otherwise(
        F.lit(float(k - 1))
        / (F.get("__m", k - 1).cast("double") / F.lit(_H60_DEN))
    )
    shared = F.size(
        F.filter(
            F.col("__m"),
            lambda h: F.array_contains(F.col("__ka"), h)
            & F.array_contains(F.col("__kb"), h),
        )
    )
    jac_raw = shared.cast("double") / s.cast("double")
    return pairs.select(
        "group_a",
        "group_b",
        F.round(union_raw, 4).alias("union_est"),
        F.round(jac_raw, 6).alias("jaccard"),
        F.round(jac_raw * union_raw, 4).alias("inter_est"),
    )


def _cms_col(key: Column, row: Column, width: int) -> Column:
    """Row-seeded counter index: md5('<row>:<key>') mod width."""
    digest = F.md5(F.concat_ws(":", row.cast("string"), key.cast("string")))
    return F.pmod(
        F.conv(F.substring(digest, 1, 15), 16, 10).cast("long"), F.lit(width)
    )


def cms_build(
    df: DataFrame, key_col: str, depth: int = 4, width: int = 2048
) -> DataFrame:
    """Build the (cms_row, cms_col, cms_count) counter table.

    Each input row increments one counter per hash row: explode the
    depth indices (constant fan-out), then a single groupBy over at
    most depth*width cells — map-side partials make the shuffle tiny.
    """
    r = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cms_row")
    cells = df.select(F.col(key_col).alias("__k"), r).select(
        "cms_row", _cms_col(F.col("__k"), F.col("cms_row"), width).alias("cms_col")
    )
    return cells.groupBy("cms_row", "cms_col").agg(
        F.count(F.lit(1)).alias("cms_count")
    )


def cms_probe(
    sketch: DataFrame,
    keys: DataFrame,
    key_col: str,
    depth: int = 4,
    width: int = 2048,
) -> DataFrame:
    """Estimate each candidate key's frequency: min over its d counters.

    ``keys`` is typically small (distinct candidates); the sketch is
    d*w rows and broadcast-joins against it. Returns
    (key_col, cms_estimate) — an over-estimate only (CMS guarantee).
    """
    r = F.explode(F.sequence(F.lit(0), F.lit(depth - 1))).alias("cms_row")
    probe = keys.select(F.col(key_col), r).withColumn(
        "cms_col", _cms_col(F.col(key_col), F.col("cms_row"), width)
    )
    joined = probe.join(F.broadcast(sketch), ["cms_row", "cms_col"], "left").fillna(
        {"cms_count": 0}
    )
    return joined.groupBy(key_col).agg(F.min("cms_count").alias("cms_estimate"))


def histogram_quantiles(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    qs: list[float],
    lo: float,
    hi: float,
    n_bins: int = 1024,
) -> DataFrame:
    """Single-pass approximate quantiles from a fixed-width histogram.

    The exact path (sort / percentile agg) shuffles every value; this
    shuffles at most n_bins rows per group no matter the data volume —
    the classic fixed-memory quantile sketch, with deterministic
    integer bucket math so the same construction is SQL-replayable.

    Values are clamped into [lo, hi); each quantile q reports the LOWER
    EDGE of the first bucket whose cumulative count reaches
    ceil(q * n): resolution (hi-lo)/n_bins, zero float accumulation.
    Returns (group_cols..., q, hq_value, hq_rank, hq_n).
    """
    width = (hi - lo) / n_bins
    bucket = F.least(
        F.lit(n_bins - 1),
        F.greatest(
            F.lit(0), F.floor((F.col(value_col) - F.lit(lo)) / F.lit(width)).cast("int")
        ),
    )
    hist = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(*group_cols, bucket.alias("__b"))
        .agg(F.count(F.lit(1)).alias("__c"))
    )
    gw = Window.partitionBy(*group_cols).orderBy("__b")
    cum = hist.withColumn("__cum", F.sum("__c").over(gw)).withColumn(
        "__n", F.sum("__c").over(Window.partitionBy(*group_cols))
    )
    qdf = df.sparkSession.createDataFrame([(float(q),) for q in qs], "q double")
    # rank = ceil(q * n): the 1-indexed order statistic the quantile needs
    joined = cum.crossJoin(F.broadcast(qdf)).withColumn(
        "__rank", F.ceil(F.col("q") * F.col("__n")).cast("long")
    )
    # first bucket whose cumulative count covers the rank
    hit = joined.filter(
        (F.col("__cum") >= F.col("__rank"))
        & (F.col("__cum") - F.col("__c") < F.col("__rank"))
    )
    return hit.select(
        *group_cols,
        "q",
        F.round(F.lit(lo) + F.col("__b") * F.lit(width), 6).alias("hq_value"),
        F.col("__rank").alias("hq_rank"),
        F.col("__n").alias("hq_n"),
    )


def mg_candidates(
    df: DataFrame,
    key_col: str,
    capacity: int,
    emit_partition_rows: bool = False,
) -> DataFrame:
    """Per-partition Misra-Gries summaries: at most ``capacity`` keys
    per partition with count lower bounds. The classic mergeable
    heavy-hitter sieve (Misra & Gries 1982; mergeability per Agarwal
    et al., "Mergeable Summaries"): any key whose share of a
    partition's rows exceeds 1/(capacity+1) is guaranteed to survive
    that partition's summary.

    NULL keys are excluded before the sieve (astype(str) would
    otherwise alias them with the literal string 'None' — a candidate
    real equality can never verify).

    Arrow batches merge in value_counts-sized steps (no per-row Python
    loop): add the batch's counts, then apply the summary decrement —
    subtract the (capacity+1)-largest count from everyone and drop the
    non-positive — which is exactly the MG merge operation.

    ``emit_partition_rows=True`` appends ONE sentinel row per
    partition (NULL key, part_rows = non-null rows seen) so a caller
    can recover the exact corpus total from the same scan instead of
    paying a second one.
    """
    import pandas as pd

    out_schema = f"{key_col} string, mg_lb long, part_rows long"

    def run(batches):
        counters: dict[str, int] = {}
        seen = 0
        for pdf in batches:
            col = pdf[key_col].dropna()
            seen += len(col)
            vc = col.astype(str).value_counts()
            for key, c in vc.items():
                counters[key] = counters.get(key, 0) + int(c)
            if len(counters) > capacity:
                cut = sorted(counters.values(), reverse=True)[capacity]
                counters = {
                    k: v - cut for k, v in counters.items() if v > cut
                }
        keys = list(counters)
        lbs = [counters[k] for k in keys]
        rows = [0] * len(keys)
        if emit_partition_rows:
            keys.append(None)
            lbs.append(0)
            rows.append(seen)
        if keys:
            yield pd.DataFrame(
                {key_col: keys, "mg_lb": lbs, "part_rows": rows}
            )

    out = df.select(
        F.col(key_col).cast("string")
    ).filter(F.col(key_col).isNotNull()).mapInPandas(run, out_schema)
    if not emit_partition_rows:
        out = out.drop("part_rows")
    return out


def heavy_hitters_exact(
    df: DataFrame,
    key_col: str,
    min_share_permille: int,
    capacity: int | None = None,
) -> DataFrame:
    """EXACT heavy hitters at lake scale without a full-cardinality
    shuffle: keys whose share of all rows is >= min_share_permille/1000,
    with exact counts.

    Two passes over the data, neither of which shuffles the raw key
    space:
    1. sieve — per-partition Misra-Gries summaries (``mg_candidates``).
       A key with global share s >= 1/(capacity+1) must, by weighted
       average, hold share > 1/(capacity+1) in at least one partition,
       so the candidate union provably contains every qualifying key
       for capacity >= 1000/min_share_permille. Candidate volume is
       <= capacity x partitions rows — broadcastable.
    2. verify — exact counts for candidates only (broadcast semi-join,
       then one aggregation whose key domain is the candidate set, not
       the corpus). The exact row total comes from the SIEVE's
       per-partition sentinel rows — no third scan; the share filter
       runs in integer arithmetic (cnt * 1000 >= permille * total) so
       there is no float-boundary ambiguity between engines.

    NULL keys are excluded throughout (from candidates AND the total),
    matching the groupBy-count-over-non-null ground truth.

    Result: exact counts/shares, deterministic, with shuffle volume
    proportional to true heavy hitters. The groupBy-count alternative
    shuffles every distinct key; at 100 TB of long-tail tokens that is
    the difference between a broadcast and a corpus-wide exchange.
    """
    if min_share_permille < 1 or min_share_permille > 1000:
        raise ValueError("min_share_permille must be in [1, 1000]")
    keyed = df.select(F.col(key_col).cast("string").alias(key_col)).filter(
        F.col(key_col).isNotNull()
    )
    if capacity is None:
        capacity = max(1, (1000 + min_share_permille - 1) // min_share_permille)
    partials = mg_candidates(
        keyed, key_col, capacity, emit_partition_rows=True
    ).localCheckpoint(eager=False)  # one sieve scan feeds both consumers
    cand = (
        partials.filter(F.col(key_col).isNotNull())
        .select(key_col)
        .distinct()
    )
    totals = partials.agg(F.sum("part_rows").alias("__total"))
    counts = (
        keyed.join(F.broadcast(cand), key_col, "left_semi")
        .groupBy(key_col)
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    return (
        counts.crossJoin(F.broadcast(totals))
        .filter(
            F.col("cnt") * F.lit(1000)
            >= F.lit(min_share_permille) * F.col("__total")
        )
        .select(
            key_col,
            "cnt",
            F.round(F.col("cnt") / F.col("__total"), 6).alias("share"),
        )
    )


def _hll_reg_rho(value: Column, p: int) -> tuple[Column, Column]:
    """(register, rho) for one value: low ``p`` hash bits pick the
    register, rho = leading-zero count of the remaining 60-p bits + 1
    (the textbook HLL decomposition, Flajolet et al.).

    bit_length is length(bin(x)) — ``bin`` exists with identical
    semantics in Spark and DuckDB, so rho is engine-portable without
    any float log2 (whose ulp behavior differs across libms).
    """
    m = 1 << p
    h = _h60(value)
    reg = h.bitwiseAND(F.lit(m - 1))
    rest = F.shiftright(h, p)
    width = 60 - p
    rho = F.when(rest == 0, F.lit(width + 1)).otherwise(
        F.lit(width + 1) - F.length(F.bin(rest))
    )
    return reg.cast("int"), rho.cast("int")


def hll_sketch(
    df: DataFrame, group_cols: list[str], value_col: str, p: int = 6
) -> DataFrame:
    """Per-group MERGEABLE HyperLogLog sketch: a dense array of
    m = 2**p register values (group_cols..., hll_regs).

    Unlike Spark's approx_count_distinct (engine-private HLL++ layout),
    the registers come from the explicit md5 construction shared by the
    whole repo, so the SAME sketch is computable in DuckDB and two
    sketches built anywhere merge by element-wise max — the property
    that makes per-day partials roll up into month/year cardinalities
    at 100 TB without rescanning raw data.

    Distributed shape: ONE partial-aggregating shuffle on
    (group, register) — at most m rows per group survive the map-side
    combine regardless of input volume — then a tiny per-group dense
    assembly. The raw value column never shuffles.
    """
    m = 1 << p
    reg, rho = _hll_reg_rho(F.col(value_col), p)
    per_reg = (
        # NULL values carry no identity and would become a NULL map
        # key (a hard error) in the dense assembly below — drop them,
        # matching kmv_distinct's effective semantics
        df.filter(F.col(value_col).isNotNull())
        .select(*group_cols, reg.alias("__reg"), rho.alias("__rho"))
        .groupBy(*group_cols, "__reg")
        .agg(F.max("__rho").alias("__mr"))
    )
    # build the (reg -> max rho) map ONCE per group, then index it m
    # times — map_from_entries inside the transform lambda would be
    # rebuilt per element (O(m^2) per group)
    as_map = per_reg.groupBy(*group_cols).agg(
        F.map_from_entries(F.collect_list(F.struct("__reg", "__mr"))).alias(
            "__map"
        )
    )
    regs = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda i: F.coalesce(F.element_at("__map", i), F.lit(0)),
    )
    return as_map.select(*group_cols, regs.alias("hll_regs"))


def hll_merge(regs_a: Column, regs_b: Column) -> Column:
    """Element-wise max of two register arrays — the HLL union."""
    return F.zip_with(regs_a, regs_b, lambda a, b: F.greatest(a, b))


def hll_estimate(sketches: DataFrame, p: int = 6) -> DataFrame:
    """Cardinality estimate from an hll_regs column, appended as
    (hll_zero_regs, hll_raw, hll_estimate).

    The harmonic sum is computed in EXACT integer arithmetic:
    sum(2^-rho) scaled by 2^(61-p) is a sum of integers (rho is at
    most 61-p), so the raw estimate is a single exact division —
    no float pow accumulation. Linear counting (m*ln(m/V)) replaces
    the raw estimate in the small range per the standard correction;
    ln is the one libm call, rounded at 4dp like every sketch output.
    alpha_64 = 0.709 (the published bias constant for m >= 64).
    """
    m = 1 << p
    if m < 64:
        raise ValueError("hll_estimate: p < 6 needs per-m alpha, use p >= 6")
    # a register array whose length disagrees with p (store written at
    # a different p, or the wrong p passed here) would silently score
    # with the wrong m — raise instead. assert_true is woven INTO the
    # harmonic-sum expression so column pruning cannot drop the check.
    length_ok = F.assert_true(
        F.size("hll_regs") == F.lit(m),
        F.concat(
            F.lit(f"hll_estimate: register array length != m={m} (got "),
            F.size("hll_regs").cast("string"),
            F.lit(") — sketch built with a different p"),
        ),
    )
    scale = 61 - p  # max rho, so 2^(scale - rho) is integral
    # 2^(scale - r) via shiftright of the fixed 2^scale: pure integer
    # arithmetic (the Python F.shiftright wrapper rejects column shift
    # amounts; the SQL function accepts them)
    sum_int = F.when(
        length_ok.isNull(),
        F.expr(
            f"aggregate(hll_regs, CAST(0 AS BIGINT), "
            f"(acc, r) -> acc + shiftright(CAST({1 << scale} AS BIGINT), r))"
        ),
    )
    v = F.size(F.filter(F.col("hll_regs"), lambda r: r == 0))
    # published bias constants (Flajolet et al. §4): alpha_64 = 0.709
    # exactly; for larger m the closed form 0.7213/(1 + 1.079/m)
    alpha = 0.709 if m == 64 else 0.7213 / (1.0 + 1.079 / m)
    raw = F.lit(alpha * m * m * float(1 << scale)) / sum_int.cast("double")
    est = F.when(
        (raw <= F.lit(2.5 * m)) & (v > 0),
        F.lit(float(m)) * F.log(F.lit(float(m)) / v.cast("double")),
    ).otherwise(raw)
    return sketches.select(
        "*",
        v.alias("hll_zero_regs"),
        F.round(raw, 4).alias("hll_raw"),
        F.round(est, 4).alias("hll_estimate"),
    )
