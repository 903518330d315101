"""Incremental view maintenance for grouped sum/count rollups.

At lake scale a materialized rollup (per-key counts and sums over a
100 TB fact table) is never recomputed from scratch — each CDC batch
of signed deltas (+1 insert / -1 delete; an update is a delete+insert
pair) is FOLDED into the stored aggregate. Sums and counts are
self-maintainable: V' = V ⊕ ΔV with ΔV computable from the delta batch
alone (Blakeley et al., "Efficiently Updating Materialized Views",
SIGMOD'86 — the classic counting algorithm).

Plan shape (the part that matters at 100 TB):
- ΔV is one grouped aggregate over the BATCH — tiny by construction.
- The merge is stored LEFT JOIN broadcast(ΔV): the stored view is
  scanned once and NEVER shuffled; groups the batch didn't touch
  stream through the join untouched.
- Brand-new groups (delta keys absent from the stored view) come from
  a left-anti join of ΔV against the stored KEYS ONLY — column
  pruning makes that second pass a key-column scan, and the shuffle
  (if AQE doesn't broadcast it) moves only key columns of the store,
  never full rows. If the stored view is bucketed by its keys, both
  passes are shuffle-free.
- Groups whose maintained count reaches 0 are dropped (the counting
  algorithm's tombstone rule), so deletes fully retract.

The reference's latest-state stores (same event-sourcing shape:
src/tastytrade/connections/subscription.py keeps running per-symbol
state rather than recomputing) motivate the operator; the Spark form
is the declarative counting algorithm over DataFrames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def delta_aggregate(
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    sign_col: str = "sign",
    count_col: str = "n_rows",
) -> DataFrame:
    """ΔV: per-key signed count and signed sums of the delta batch.
    ``sign_col`` is +1 for inserts, -1 for deletes."""
    aggs = [F.sum(F.col(sign_col)).alias(count_col)] + [
        F.sum(F.col(sign_col) * F.col(c)).alias(f"sum_{c}") for c in sum_cols
    ]
    return delta.groupBy(*keys).agg(*aggs)


def delta_apply_agg(
    stored: DataFrame,
    delta: DataFrame,
    keys: list[str],
    sum_cols: list[str],
    sign_col: str = "sign",
    count_col: str = "n_rows",
) -> DataFrame:
    """Maintain ``stored`` (keys, n_rows, sum_<c>...) under a signed
    ``delta`` batch, without rescanning the base fact table.

    Returns the maintained view with the same schema as ``stored``.
    Correctness contract (tested against full recompute): for every
    key, n_rows' = n_rows + Σ sign and sum' = sum + Σ sign*c; keys
    with n_rows' = 0 drop out; keys only in the delta appear."""
    dv = delta_aggregate(delta, keys, sum_cols, sign_col, count_col)
    sum_names = [f"sum_{c}" for c in sum_cols]

    d_renamed = dv.select(
        *keys,
        F.col(count_col).alias("__d_n"),
        *[F.col(s).alias(f"__d_{s}") for s in sum_names],
    )
    # touched + untouched groups in ONE stored scan, zero stored-side
    # shuffle: the delta aggregate is broadcast
    merged = (
        stored.join(F.broadcast(d_renamed), keys, "left")
        .select(
            *keys,
            (F.col(count_col) + F.coalesce(F.col("__d_n"), F.lit(0))).alias(
                count_col
            ),
            *[
                # untyped 0 literal: keeps integer (scaled-grid) sums
                # integer and double sums double
                (
                    F.col(s) + F.coalesce(F.col(f"__d_{s}"), F.lit(0))
                ).alias(s)
                for s in sum_names
            ],
        )
        .filter(F.col(count_col) > 0)
    )
    # brand-new groups: delta keys the store has never seen — the
    # anti-join probes the stored KEYS ONLY (column-pruned scan)
    new_groups = dv.join(
        stored.select(*keys), keys, "left_anti"
    ).filter(F.col(count_col) > 0)
    return merged.unionByName(new_groups)
