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
# (name, core pattern, placeholder, (leading guard, trailing guard)).
# Guards are CAPTURING groups re-emitted around the placeholder ($1/$2
# in Spark, \1/\2 in DuckDB — regexp_replace backref syntax is the one
# engine difference, handled by spark_replacement/duck_replacement).
# Without them a core pattern matches INSIDE longer runs: 'sku
# 123-456-78901' would lose its first 12 chars to <PHONE>, '1.2.3.4.5'
# would become '<IP>.5', and a 26-digit run would be HALF-masked
# (19 digits -> <NUM>, 7 left raw beside it — a partial-redaction
# leak). One guard char is consumed per match, so two PII spans
# separated by a single character redact on the left-most first —
# acceptable for a scrub pass, and identical on both engines.
_PII_RULES: tuple[tuple[str, str, str, tuple[str, str]], ...] = (
    (
        "email",
        "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z][A-Za-z]+",
        "<EMAIL>",
        ("(^|[^A-Za-z0-9._%+-])", "($|[^A-Za-z0-9.-])"),
    ),
    (
        "ssn",
        f"{_D}{{3}}-{_D}{{2}}-{_D}{{4}}",
        "<SSN>",
        ("(^|[^0-9-])", "($|[^0-9-])"),
    ),
    (
        "phone",
        f"{_D}{{3}}-{_D}{{3}}-{_D}{{4}}",
        "<PHONE>",
        ("(^|[^0-9-])", "($|[^0-9-])"),
    ),
    (
        "ipv4",
        f"{_D}{{1,3}}[.]{_D}{{1,3}}[.]{_D}{{1,3}}[.]{_D}{{1,3}}",
        "<IP>",
        ("(^|[^0-9.])", "($|[^0-9.])"),
    ),
    (
        "digit_run",
        f"{_D}{{13,19}}",  # card-like long digit runs
        "<NUM>",
        ("(^|[^0-9])", "($|[^0-9])"),
    ),
)

#: (name, guarded pattern, Spark replacement) — guards baked in.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = tuple(
    (name, f"{gl}(?:{core}){gr}", f"$1{tag}$2")
    for name, core, tag, (gl, gr) in _PII_RULES
)


def duck_replacement(spark_repl: str) -> str:
    """DuckDB's regexp_replace spells backrefs \\1, not $1."""
    return spark_repl.replace("$", "\\")


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
