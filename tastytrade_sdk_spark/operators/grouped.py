"""Batched grouped-map execution: applyInPandas semantics at
mapInPandas cost.

``DataFrame.groupBy(k).applyInPandas`` makes one Arrow transfer and
one Python call PER GROUP. For workloads with many small groups (a
position's fill history, an underlying's option legs — dozens of rows
each, thousands of groups) the per-call overhead dominates the actual
kernel by 10-50x.

``grouped_apply`` keeps the same per-group kernel contract but ships
whole partitions through ``mapInPandas``: hash-repartition on the
group key, sort within partitions so groups are contiguous, stream
Arrow batches, and carry the (possibly incomplete) trailing group
over to the next batch. One Python call per Arrow batch, and peak
memory is O(batch_size + largest group) — strictly better than
applyInPandas' O(largest group) per call with thousands of calls.

At cluster scale this also removes the per-group scheduling floor:
the shuffle is identical (one exchange keyed by the group key), only
the Python-boundary crossing count changes.
"""

from __future__ import annotations

from typing import Callable, Iterable, Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def grouped_apply(
    df: DataFrame,
    key_cols: str | list[str],
    group_fn: Callable[..., Iterable[dict]],
    schema: T.StructType,
    records: bool = False,
) -> DataFrame:
    """Run ``group_fn`` once per distinct key, with all of a key's rows
    together (row order within the group is NOT guaranteed — sort
    inside the kernel if the logic is order-dependent, exactly as with
    applyInPandas).

    ``records=False``: group_fn(group_pdf) gets a pandas DataFrame.
    ``records=True``: group_fn(list_of_row_dicts) — the batch is
    converted to records ONCE and split with itertools.groupby, which
    removes the per-group pandas slicing/to_dict overhead that
    dominates when groups are tiny (profiled 50x the actual kernel
    cost for the LIFO replay). Requires non-null group keys.
    """
    import pandas as pd

    keys = [key_cols] if isinstance(key_cols, str) else list(key_cols)
    cols = [f.name for f in schema.fields]
    parted = df.repartition(*[F.col(k) for k in keys]).sortWithinPartitions(*keys)

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        from itertools import groupby as igroupby

        carry: pd.DataFrame | None = None

        def emit(part: pd.DataFrame) -> "pd.DataFrame | None":
            rows: list[dict] = []
            if records:
                recs = part.to_dict("records")
                for _, grp in igroupby(
                    recs, key=lambda r: tuple(r[k] for k in keys)
                ):
                    rows.extend(group_fn(list(grp)))
            else:
                for _, g in part.groupby(keys, sort=False, dropna=False):
                    rows.extend(group_fn(g))
            if not rows:
                return None
            return pd.DataFrame(rows, columns=cols)

        for pdf in batches:
            if carry is not None:
                pdf = pd.concat([carry, pdf], ignore_index=True)
                carry = None
            if len(pdf) == 0:
                continue
            # The trailing key may continue in the next Arrow batch of
            # this partition (sortWithinPartitions makes groups
            # contiguous) — hold it back until the key changes or the
            # partition ends.
            mask = pd.Series(True, index=pdf.index)
            for k in keys:
                last = pdf[k].iloc[-1]
                col = pdf[k]
                mask &= col.isna() if pd.isna(last) else (col == last)
            carry = pdf[mask]
            head = pdf[~mask]
            if len(head):
                out = emit(head)
                if out is not None:
                    yield out
        if carry is not None and len(carry):
            out = emit(carry)
            if out is not None:
                yield out

    return parted.mapInPandas(run, schema)
