"""PII detection and redaction for training-data pipelines.

A pretraining corpus scrub pass: detect and mask emails, IPv4
addresses, SSN-like ids, US-style phone numbers and long digit runs
(card-like) before the text reaches a tokenizer. Everything is pure
``regexp_count`` / ``regexp_replace`` Column expressions — JVM-side,
codegen'd, scan-bound; at 100 TB this is a narrow per-row projection
with no shuffle and the regexes are the only cost.

Cross-engine contract: the patterns restrict themselves to syntax that
Java regex (Spark) and RE2 (DuckDB) interpret identically — explicit
character classes (never ``\\s``/``\\w``/``\\d`` shorthand, whose
Unicode/ASCII behavior differs between engines), no lookaround, no
backreferences. Replacement order is part of the contract: patterns
are applied in PII_PATTERNS order, so an SSN is masked before the
phone pattern could see its digits.

The reference has no PII pass (it's a market-data SDK); this operator
is part of the LLM-pipeline extension surface (SURVEY §2 extensions).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_D = "[0-9]"

# Ordered (name, pattern, replacement). ORDER MATTERS: each pattern is
# applied to the output of the previous replacement, and counts are
# taken against the same partially-redacted text, so overlapping
# matches (an SSN inside a longer digit run) resolve identically on
# both engines. Word-ish boundaries are expressed with explicit
# guards (start/end or a non-digit neighbor) instead of \b, which RE2
# and Java agree on only for ASCII.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    (
        "email",
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
        "<EMAIL>",
    ),
    (
        "ssn",
        f"{_D}{{3}}-{_D}{{2}}-{_D}{{4}}",
        "<SSN>",
    ),
    (
        "phone",
        f"{_D}{{3}}-{_D}{{3}}-{_D}{{4}}",
        "<PHONE>",
    ),
    (
        "ipv4",
        f"{_D}{{1,3}}[.]{_D}{{1,3}}[.]{_D}{{1,3}}[.]{_D}{{1,3}}",
        "<IP>",
    ),
    (
        "digit_run",
        f"{_D}{{13,19}}",  # card-like long digit runs
        "<NUM>",
    ),
)


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-type match counts, evaluated in PII_PATTERNS order against
    the progressively-redacted text (so types never double-count the
    same span). Returns {name: count Column}."""
    cur = _c(text)
    out: dict[str, Column] = {}
    for name, pat, rep in PII_PATTERNS:
        out[name] = F.regexp_count(cur, F.lit(pat))
        cur = F.regexp_replace(cur, pat, rep)
    return out


def redact_pii(text: Column | str) -> Column:
    """Text with every PII span replaced by its placeholder token,
    applying PII_PATTERNS in order."""
    cur = _c(text)
    for _, pat, rep in PII_PATTERNS:
        cur = F.regexp_replace(cur, pat, rep)
    return cur
