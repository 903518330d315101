"""Bloom-filter semi-join pruning (engine-portable, exactly
reproducible).

The classic scan-reduction lever at lake scale: build a compact bit
set over the small side's join keys, broadcast it, and drop fact rows
whose key cannot be present BEFORE the shuffle/join — Spark's own
runtime row-group skipping does this opaquely; this operator is the
explicit, engine-portable form whose false positives are a pure
function of (keys, n_bits, n_hashes, md5), so a DuckDB oracle
reproduces the filtered result EXACTLY, false positives included.

Construction: double hashing (Kirsch-Mitzenstelle): h1/h2 = first/
second 8 hex chars of md5(key); bit_i = (h1 + i*h2) mod n_bits for
i in [0, n_hashes). Membership = all n_hashes bits set.

Scale shape: the build side aggregates to DISTINCT BIT POSITIONS —
at most n_bits rows BY CONSTRUCTION, so collecting them to splice a
literal bitmap into the probe expression is bounded the same way the
IVF quantizer literals are (similarity.py). The probe is a pure JVM
expression over a broadcast literal array (n_bits/64 longs): no
shuffle, no UDF, whole-stage codegen, pushed right against the scan.
"""

from __future__ import annotations

import numpy as np
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

__all__ = ["bloom_positions", "bloom_build", "bloom_probe_col", "bloom_filter"]


def _h12(key: Column, n_bits: int, hash_fn: str = "md5") -> tuple[Column, Column]:
    """Base and step hash streams, already reduced mod n_bits.

    Reducing both streams BEFORE combining keeps h1 + i*h2 inside the
    long range under ANSI ((a%m + i*(b%m)) % m == (a + i*b) % m, so
    md5 oracle parity is untouched).

    "md5" is the engine-portable form the DuckDB oracle replicates
    (h1/h2 = first/second 8 hex chars, each mod n_bits — frozen).
    "xxhash64" is the production probe — native, no string
    materialization, ~20x cheaper per row (the md5 probe was MEASURED
    dominating the very join it prunes: scale_probe --bloom). Its two
    streams come from the SAME function under different seeds, so the
    step is forced into [1, n_bits-1]: when a plain h2 % n_bits hit 0,
    all n_hashes probes collapsed onto the single bit h1, inflating
    the false-positive rate past (1-e^{-kn/m})^k. Build and probe
    share the formula, so remapping cannot introduce false
    negatives."""
    if hash_fn == "md5":
        md5 = F.md5(key.cast("string"))
        h1 = F.conv(F.substring(md5, 1, 8), 16, 10).cast("long")
        h2 = F.conv(F.substring(md5, 9, 8), 16, 10).cast("long")
        return F.pmod(h1, F.lit(n_bits)), F.pmod(h2, F.lit(n_bits))
    if hash_fn == "xxhash64":
        h1 = F.xxhash64(key)
        h2 = F.xxhash64(key, F.lit(0x9E3779B9))
        return (
            F.pmod(h1, F.lit(n_bits)),
            F.pmod(h2, F.lit(n_bits - 1)) + F.lit(1),
        )
    raise ValueError(f"unknown hash_fn: {hash_fn}")


def bloom_positions(
    df: DataFrame,
    key_col: str,
    n_bits: int,
    n_hashes: int,
    hash_fn: str = "md5",
) -> DataFrame:
    """DISTINCT bit positions set by the build side's keys — one
    explode + one distinct, output <= n_bits rows by construction."""
    h1, h2 = _h12(F.col(key_col), n_bits, hash_fn)
    pos = F.explode(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(n_bits)),
        )
    )
    return (
        df.filter(F.col(key_col).isNotNull())
        .select(pos.alias("p"))
        .distinct()
    )


def bloom_build(
    df: DataFrame,
    key_col: str,
    n_bits: int = 1 << 14,
    n_hashes: int = 4,
    hash_fn: str = "md5",
) -> np.ndarray:
    """Bitmap (uint64 words, little bit-endian within the word) from
    the build side. The only driver transfer is the <= n_bits distinct
    positions (bounded by construction)."""
    if n_bits % 64 != 0:
        raise ValueError("n_bits must be a multiple of 64")
    words = np.zeros(n_bits // 64, dtype=np.uint64)
    for row in bloom_positions(df, key_col, n_bits, n_hashes, hash_fn).collect():
        p = int(row["p"])
        words[p // 64] |= np.uint64(1) << np.uint64(p % 64)
    return words


def bloom_probe_col(
    key: Column,
    bitmap: np.ndarray,
    n_hashes: int = 4,
    hash_fn: str = "md5",
) -> Column:
    """Membership test as a pure JVM expression over the spliced
    literal bitmap: TRUE iff every probe bit is set. NULL keys probe
    FALSE via an EXPLICIT isNull guard — a NULL never joins, and the
    guard cannot be left to null-propagation because xxhash64(NULL)
    returns the SEED (a non-null long), which would probe a fixed
    position set and pass on a dense bitmap."""
    n_bits = len(bitmap) * 64
    # a TRUE array Literal (F.lit of a list), NOT F.array(*lits): the
    # latter is a CreateArray expression that re-materializes the
    # whole words array PER PROBED ROW — measured 3-5x the entire
    # join's cost at 60M rows x 2048 words before this change
    bm = F.lit(
        [int(w) - (1 << 64 if int(w) >= 1 << 63 else 0) for w in bitmap]
    )
    h1, h2 = _h12(key, n_bits, hash_fn)
    probe = F.forall(
        F.transform(
            F.sequence(F.lit(0), F.lit(n_hashes - 1)),
            lambda i: F.pmod(h1 + i.cast("long") * h2, F.lit(n_bits)),
        ),
        lambda p: F.getbit(
            F.element_at(bm, (p / 64).cast("int") + 1), p % 64
        )
        == 1,
    )
    return F.when(key.isNull(), F.lit(False)).otherwise(probe)


def bloom_filter(
    fact: DataFrame,
    build: DataFrame,
    fact_key: str,
    build_key: str,
    n_bits: int = 1 << 14,
    n_hashes: int = 4,
    hash_fn: str = "md5",
) -> DataFrame:
    """Prune ``fact`` to rows whose key MIGHT be in ``build`` — every
    true match survives (no false negatives by construction); false
    positives pass at ~(1 - e^{-kn/m})^k and are eliminated by the
    real join downstream. Deterministic: the same rows pass on any
    engine that reproduces the md5 double-hash (the oracle does)."""
    bitmap = bloom_build(build, build_key, n_bits, n_hashes, hash_fn)
    return fact.filter(
        bloom_probe_col(F.col(fact_key), bitmap, n_hashes, hash_fn)
    )
