"""Binned interval/range join — equi-join plan for ``ts BETWEEN lo AND hi``.

A naive range join (``l.key = r.key AND l.ts >= r.lo AND l.ts < r.hi``)
gives Catalyst no equi-key beyond ``key``; with a skewed or
low-cardinality key the plan degenerates to a huge per-key cross
product (and with no key at all, BroadcastNestedLoopJoin). The classic
distributed fix — same trick the reference's time-window lookups get
from their column store's time index (src/tastytrade/providers/
market.py:119-185 time-bounded Flux queries) — is to discretize time
into fixed-width bins:

- each interval row is replicated once per bin it overlaps,
- each point row lands in exactly ONE bin,
- the join becomes an equi-join on (key, bin) — hash-partitionable,
  AQE-skew-splittable, broadcast-able — followed by the exact
  between-predicate as a cheap post-filter.

A (point, interval) pair can only meet in the point's single bin, so
the output needs no dedup. Replication factor is
``ceil(interval_len / bin_width) + 1`` — pick ``bin_width`` near the
typical interval length so it stays O(1); at 100 TB the bin key also
co-locates with a date-bucketed lake layout, making the shuffle
map-local.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["range_join_binned"]


def _epoch_ms(c: Column) -> Column:
    return F.floor(F.unix_micros(c) / 1000)


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    on: list[str],
    point_time: str,
    start: str,
    end: str,
    bin_width_ms: int,
    how: str = "inner",
    max_bins_per_interval: int = 100_000,
) -> DataFrame:
    """Join point rows to interval rows with ``start <= point_time < end``.

    ``on`` are additional equi-keys (may be empty: the bin itself then
    carries the whole join). ``how`` supports 'inner' and 'left'
    (point-preserving). Interval columns keep their names; callers
    project/alias beforehand if the two sides share names.

    Corrupt-input guards: inverted intervals (``end < start`` — an
    empty half-open range, and a DESCENDING F.sequence emitting
    spurious bins) are dropped before the explode, and an interval
    spanning more than ``max_bins_per_interval`` bins (one bad
    far-future end date would otherwise explode into millions of rows
    and OOM an executor) raises at execution time rather than
    silently truncating coverage.
    """
    if how not in ("inner", "left"):
        raise ValueError("range_join_binned supports how='inner'|'left' only")

    bin_col = "__rj_bin"
    pt = points.withColumn(
        bin_col, F.floor(_epoch_ms(F.col(point_time)) / F.lit(bin_width_ms))
    )
    lo_bin = F.floor(_epoch_ms(F.col(start)) / F.lit(bin_width_ms))
    hi_bin = F.floor(_epoch_ms(F.col(end)) / F.lit(bin_width_ms))
    guarded_hi = F.when(
        hi_bin - lo_bin > F.lit(max_bins_per_interval),
        F.raise_error(
            F.concat(
                F.lit(
                    "range_join_binned: interval spans more than "
                    f"{max_bins_per_interval} bins of {bin_width_ms}ms "
                    "(corrupt end timestamp?): start="
                ),
                F.col(start).cast("string"),
                F.lit(" end="),
                F.col(end).cast("string"),
            )
        ).cast("long"),
    ).otherwise(hi_bin)
    # half-open [start, end): an interval ending exactly on a bin edge
    # contributes nothing to that edge bin, but emitting it is harmless
    # (the post-filter rejects) and keeps the expression branch-free
    iv = intervals.filter(F.col(end) >= F.col(start)).withColumn(
        bin_col, F.explode(F.sequence(lo_bin, guarded_hi))
    )
    between = (F.col(point_time) >= F.col(start)) & (F.col(point_time) < F.col(end))

    # Rename the interval's join columns so the join condition is
    # unambiguous, then drop the helpers after the join.
    iv2 = iv
    for k in on:
        iv2 = iv2.withColumnRenamed(k, f"__rj_{k}")
    iv2 = iv2.withColumnRenamed(bin_col, "__rj_bin_r")
    cond2 = F.col(bin_col) == F.col("__rj_bin_r")
    for k in on:
        cond2 = cond2 & (F.col(k) == F.col(f"__rj_{k}"))
    joined = pt.join(iv2, cond2 & between, how)
    drop = [bin_col, "__rj_bin_r"] + [f"__rj_{k}" for k in on]
    return joined.drop(*drop)
