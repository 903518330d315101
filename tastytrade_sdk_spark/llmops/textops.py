"""Text-analysis primitives for training-data pipelines.

All pure Column expressions (JVM-side, codegen'd) — tokenization,
word-shingling, 32-bit hashing, rolling fingerprints, quality stats,
n-gram language ID. The exact token/hash definitions are part of the
cross-engine contract (the DuckDB oracle replays them verbatim), so
they are deliberately simple and locale-free:

- tokens: lower(text) split on /[^a-z0-9]+/ with empties dropped
- h32(s): first 8 hex digits of md5(s) as unsigned 32-bit int
- shingle(i) = tokens[i] + ' ' + tokens[i+1] + ' ' + tokens[i+2]

At 100 TB these are narrow per-row projections — no shuffle, scan-
bound, and the md5-based hashing is stable across engines, JVM
versions and cluster sizes (unlike xxhash64/hash which are fine
within Spark but unusable as cross-system fingerprints).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

MERSENNE_PRIME = 4294967311  # smallest prime > 2^32
FP_MOD = 1_000_000_007


def _c(col: Column | str) -> Column:
    return F.col(col) if isinstance(col, str) else col


def tokens_expr(text: Column | str) -> Column:
    """lower + split on non-alphanumeric runs, empties removed."""
    t = _c(text)
    return F.filter(
        F.split(F.lower(t), "[^a-z0-9]+"), lambda x: x != ""
    )


# GPT-2-style pre-tokenization pattern, restricted to syntax BOTH Java
# regex (Spark) and RE2 (DuckDB) interpret IDENTICALLY: no lookahead
# (the original's `\s+(?!\S)` is dropped; trailing spaces fold into
# the whitespace branch), and whitespace is an EXPLICIT class — Java's
# \s matches \x0B (vertical tab) while RE2's does not, which would
# shift token boundaries between engines.
_WS = r"\t\n\f\r "
BPE_ISH_PATTERN = (
    r"'(?:s|t|re|ve|m|ll|d)"
    r"| ?\p{L}+"
    r"| ?\p{N}+"
    rf"| ?[^{_WS}\p{{L}}\p{{N}}]+"
    rf"|[{_WS}]+"
)


def bpe_ish_tokens(text: Column | str) -> Column:
    """BPE-style pre-tokens (the segmentation step a byte-pair encoder
    runs before merges): contraction suffixes, space-prefixed word /
    number / punctuation runs, whitespace runs. Token COUNT under this
    segmentation is the standard training-data budget estimate when
    the real tokenizer is not on the cluster."""
    return F.regexp_extract_all(_c(text), F.lit(BPE_ISH_PATTERN), 0)


def shingles_expr(tokens: Column, n: int = 3) -> Column:
    """Word n-gram shingles (space-joined); [] when fewer than n tokens.

    Guarded: Spark's sequence(1, 0) yields a DESCENDING [1, 0], so the
    short-doc case must short-circuit to an empty array.
    """
    idx = F.sequence(F.lit(1), F.size(tokens) - (n - 1))
    parts = lambda i: [F.element_at(tokens, i + j) for j in range(n)]  # noqa: E731
    return F.when(
        F.size(tokens) >= n,
        F.transform(idx, lambda i: F.concat_ws(" ", *parts(i))),
    ).otherwise(F.array().cast("array<string>"))


def hex32(hexstr: Column) -> Column:
    """Leading 8 hex digits of an existing digest as an unsigned
    32-bit integer — the parse half of h32, for call sites that
    already hold an md5 hex string and must not pay a second md5."""
    return F.conv(F.substring(hexstr, 1, 8), 16, 10).cast("long")


def h32(s: Column) -> Column:
    """First 8 md5 hex digits as unsigned 32-bit integer (cross-engine
    stable fingerprint hash)."""
    return hex32(F.md5(s))


def h60(s: Column) -> Column:
    """First 15 md5 hex digits as an unsigned 60-bit integer — the
    repo's single wide cross-engine hash (DuckDB twin:
    ``('0x' || substring(md5(x), 1, 15))::BIGINT``). Every sketch and
    sampler derives from THIS helper so the width/idiom contract lives
    in one place."""
    return F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long")


def minhash_signature(
    shingles: Column, coeffs: list[tuple[int, int]]
) -> list[Column]:
    """One min-hash per (a, b) coefficient pair:
    min over shingles of (a*h32(s) + b) mod MERSENNE_PRIME.

    ``a`` must stay below 2^30 so a*h32 fits in a signed 64-bit int.
    Returns NULL for docs with no shingles.
    """
    out = []
    for a, b in coeffs:
        assert a < (1 << 30)
        hashed = F.transform(
            shingles, lambda s: (F.lit(a) * h32(s) + F.lit(b)) % F.lit(MERSENNE_PRIME)
        )
        out.append(F.array_min(hashed))
    return out


def simhash32(tokens: Column) -> Column:
    """32-bit SimHash over (duplicated) tokens: bit j of the output is
    set iff sum over tokens of +/-1 (token-hash bit j) is positive."""
    hashed = F.transform(tokens, h32)
    fp = F.lit(0).cast("long")
    for j in range(32):
        bit_sum = F.aggregate(
            hashed,
            F.lit(0),
            lambda acc, h: acc
            + F.when(h.bitwiseAND(F.lit(1 << j)) > 0, F.lit(1)).otherwise(F.lit(-1)),
        )
        fp = fp + F.when(bit_sum > 0, F.lit(1 << j)).otherwise(F.lit(0))
    return fp


def rolling_fingerprint(tokens: Column) -> Column:
    """Polynomial rolling hash of the token-hash sequence:
    acc = (acc*31 + h32(tok)) mod 1e9+7 — an order-sensitive document
    fingerprint (content AND sequence)."""
    return F.aggregate(
        F.transform(tokens, h32),
        F.lit(0).cast("long"),
        lambda acc, h: (acc * 31 + h) % F.lit(FP_MOD),
    )


def gram_hashes(tokens: Column, k: int = 3) -> Column:
    """h32 over word k-gram shingles — the hash sequence winnowing
    slides over. Materialize this as a REAL column (behind a
    projection barrier) before calling ``winnow_from_hashes``:
    higher-order lambdas do not get common-subexpression elimination,
    so an inlined gram expression would re-run the md5 pass once per
    window — O(grams * w) digests per doc instead of O(grams)."""
    return F.transform(shingles_expr(tokens, k), h32)


def winnow_selections(tokens: Column, k: int = 3, w: int = 4) -> Column:
    """Winnowing fingerprint selections (Schleimer, Wilkerson & Aiken
    2003 — the MOSS local-fingerprinting scheme): hash every word
    k-gram with h32, slide a window of ``w`` consecutive gram hashes,
    and in each window keep the RIGHTMOST minimal hash; identical
    (hash, position) selections from overlapping windows collapse.

    Convenience form over ``gram_hashes`` + ``winnow_from_hashes`` —
    fine for tests/small frames, but plan-shape-sensitive callers
    should materialize the hash column first (see gram_hashes).
    """
    return winnow_from_hashes(gram_hashes(tokens, k), w)


def winnow_from_hashes(grams: Column, w: int = 4) -> Column:
    """Winnowing window selection over a precomputed gram-hash array.

    Returns ``array<struct<fp:bigint, pos:bigint>>`` with ``pos`` the
    1-based k-gram start index. The paper's guarantee holds: any match
    of length >= w + k - 1 tokens shares a fingerprint, and a doc with
    >= 1 gram always yields at least one selection (a hash sequence
    shorter than ``w`` is treated as a single window).

    Pure per-row JVM expression — the window scan is an ``aggregate``
    fold over a length-<=w slice, so cost is O(grams * w) array reads
    per row with no shuffle; scan-bound at 100 TB.
    """
    m = F.size(grams)
    wins = (
        F.when(m >= w, F.sequence(F.lit(1), m - (w - 1)))
        .when(m >= 1, F.array(F.lit(1)))
        .otherwise(F.array().cast("array<int>"))
    )

    def pick(i: Column) -> Column:
        # rightmost-min fold over the window slice: <= lets a later
        # equal hash displace the earlier one (the paper's tie rule)
        return F.aggregate(
            F.slice(grams, i, w),
            F.struct(
                F.lit(None).cast("long").alias("bh"),
                F.lit(0).alias("bp"),
                F.lit(0).alias("cur"),
            ),
            lambda acc, x: F.struct(
                F.when(acc["bh"].isNull() | (x <= acc["bh"]), x)
                .otherwise(acc["bh"])
                .alias("bh"),
                F.when(acc["bh"].isNull() | (x <= acc["bh"]), acc["cur"] + 1)
                .otherwise(acc["bp"])
                .alias("bp"),
                (acc["cur"] + 1).alias("cur"),
            ),
            lambda acc: F.struct(
                acc["bh"].alias("fp"),
                (i + acc["bp"] - 1).cast("long").alias("pos"),
            ),
        )

    return F.array_distinct(F.transform(wins, pick))


STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for", "with")

LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein"),
    "en": ("the", "and", "of", "to", "is", "in", "that", "it"),
    "es": ("el", "la", "de", "que", "y", "en", "un", "es"),
    "fr": ("le", "la", "et", "les", "des", "est", "un", "une"),
}


def stopword_ratio(tokens: Column, stopwords=STOPWORDS) -> Column:
    hits = F.size(F.filter(tokens, lambda t: t.isin(*stopwords)))
    return hits / F.greatest(F.size(tokens), F.lit(1))


def punct_ratio(text: Column | str) -> Column:
    t = _c(text)
    return F.regexp_count(t, F.lit(r"[^a-zA-Z0-9\s]")) / F.greatest(
        F.length(t), F.lit(1)
    )


def quality_score(tokens: Column, text: Column | str) -> Column:
    """Deterministic doc-quality heuristic in [0,1]: length saturation,
    low punctuation, presence of function words (the reference-style
    length/punct/stopword recipe)."""
    length_term = F.least(F.size(tokens) / F.lit(100.0), F.lit(1.0))
    return (
        F.lit(0.4) * length_term
        + F.lit(0.3) * (F.lit(1.0) - punct_ratio(text))
        + F.lit(0.3) * stopword_ratio(tokens)
    )


def langid_scores(tokens: Column) -> dict[str, Column]:
    """Stopword-profile match count per language."""
    return {
        lang: F.size(F.filter(tokens, lambda t: t.isin(*words)))
        for lang, words in LANG_PROFILES.items()
    }


def predicted_lang(tokens: Column) -> Column:
    """argmax of langid_scores, ties broken alphabetically; 'und'
    (undetermined) when no profile word matches."""
    scores = langid_scores(tokens)
    best = F.lit("und")
    best_score = F.lit(0)
    for lang in sorted(LANG_PROFILES, reverse=True):
        s = scores[lang]
        # iterate reverse-alphabetically with >= so the alphabetically
        # first language wins ties
        cond = (s > 0) & (s >= best_score)
        best = F.when(cond, F.lit(lang)).otherwise(best)
        best_score = F.when(cond, s).otherwise(best_score)
    return best


def canonical_url(url: Column | str) -> Column:
    """Canonicalize a URL for URL-level dedup (the RefinedWeb /
    CommonCrawl-pipeline normalization): lowercase; drop the scheme;
    drop a leading ``www.``; strip tracking query params (``utm_*``,
    ``ref``) and any dangling ``?``/``&``; strip one trailing slash.

    Pure regexp/string expressions — scan-bound, no shuffle, and the
    exact same regex chain runs on the DuckDB oracle (patterns are
    RE2-and-Java-regex compatible: no lookaround; the one backref in
    the replacement differs only in syntax, $1 vs \\1).
    """
    u = F.lower(_c(url))
    u = F.regexp_replace(u, r"^https?://", "")
    u = F.regexp_replace(u, r"^www\.", "")
    # kill tracking params wherever they sit in the query string —
    # anchored on the preceding ?/& (kept via backref) so params whose
    # names merely CONTAIN "ref"/"utm_" (href=, pref=) are untouched
    u = F.regexp_replace(u, r"([?&])(utm_[a-z0-9]+|ref)=[^&#]*", "$1")
    # collapse separators left behind: "?&", "&&", then a dangling
    # "?"/"&" before a fragment or at end of string
    u = F.regexp_replace(u, r"\?&+", "?")
    u = F.regexp_replace(u, r"&&+", "&")
    u = F.regexp_replace(u, r"[?&]+#", "#")
    u = F.regexp_replace(u, r"[?&]+$", "")
    u = F.regexp_replace(u, r"/$", "")
    return u


#: DuckDB twin of canonical_url — same chain, 'g' flag where Spark
#: replaces globally by default (backref spelled \\1 instead of $1).
#: {u} is the input SQL expression.
CANONICAL_URL_SQL = (
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "regexp_replace(regexp_replace(regexp_replace(regexp_replace("
    "lower({u}),"
    " '^https?://', ''),"
    " '^www\\.', ''),"
    " '([?&])(utm_[a-z0-9]+|ref)=[^&#]*', '\\1', 'g'),"
    " '\\?&+', '?', 'g'),"
    " '&&+', '&', 'g'),"
    " '[?&]+#', '#', 'g'),"
    " '[?&]+$', ''),"
    " '/$', '')"
)


# Gopher quality-rule thresholds (Rae et al., "Scaling Language
# Models: ... Gopher", Table A1), adapted to this corpus's scale: the
# word-count floor is the paper's 50, the ceiling its 100k; mean word
# length [3, 10]; symbol-to-word ratio (hash marks + ellipses) <= 0.1;
# >= 80% of words must contain an alphabetic character; and at least 2
# distinct stopword hits (the paper requires 2 of a small function-
# word set, evidence the text is prose rather than a token list).
GOPHER_MIN_WORDS = 50
GOPHER_MAX_WORDS = 100_000
GOPHER_MIN_MEAN_WORD_LEN = 3.0
GOPHER_MAX_MEAN_WORD_LEN = 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_WORD_RATIO = 0.8
GOPHER_MIN_STOPWORD_HITS = 2


# C4 cleaning rules (Raffel et al., "Exploring the Limits of Transfer
# Learning with a Unified Text-to-Text Transformer", §2.2): retain only
# lines that end in a terminal punctuation mark and contain at least
# C4_MIN_LINE_WORDS words; drop lines containing the word "javascript";
# drop whole pages containing a curly brace or the phrase "lorem
# ipsum"; drop pages with fewer than C4_MIN_LINES retained lines (the
# paper's 3-sentence floor, applied at line granularity).
C4_MIN_LINE_WORDS = 5
C4_MIN_LINES = 3
# explicit inner-whitespace class (not \s): Java \s matches \x0B,
# RE2's does not — same cross-engine pitfall as BPE_ISH_PATTERN.
_LWS = r" \t\r"


def _c4_trim(line: Column) -> Column:
    return F.regexp_replace(line, rf"^[{_LWS}]+|[{_LWS}]+$", "")


def _c4_line_keep(trimmed: Column) -> Column:
    n_words = F.size(
        F.filter(F.split(trimmed, rf"[{_LWS}]+"), lambda x: x != "")
    )
    return (
        (n_words >= C4_MIN_LINE_WORDS)
        & trimmed.rlike(r'[.!?"]$')
        & ~F.lower(trimmed).contains("javascript")
    )


def c4_line_flags(text: Column | str) -> dict[str, Column]:
    """C4-style line-level cleaning (Raffel et al. §2.2) as pure JVM
    array/regexp expressions — one narrow projection fused into the
    corpus scan, no shuffle, no UDF; at 100 TB this is scan-bound
    exactly like gopher_flags.

    Returns per-doc columns: line counts before/after the line rules,
    the two page-level drop flags (curly brace, "lorem ipsum"), the
    conjunction ``keep``, and ``cleaned_text`` (retained lines re-
    joined with newlines; NULL when the page is dropped). Lines are
    whitespace-trimmed before the rules and in the rebuilt text."""
    t = _c(text)
    lines = F.transform(F.split(t, "\n"), _c4_trim)
    kept = F.filter(lines, _c4_line_keep)
    n_lines = F.size(lines)
    n_kept = F.size(kept)
    drop_brace = t.contains("{") | t.contains("}")
    drop_lorem = F.lower(t).contains("lorem ipsum")
    keep = ~drop_brace & ~drop_lorem & (n_kept >= C4_MIN_LINES)
    return {
        "n_lines": n_lines.cast("long"),
        "n_kept_lines": n_kept.cast("long"),
        "drop_brace": drop_brace,
        "drop_lorem": drop_lorem,
        "keep": keep,
        "cleaned_text": F.when(keep, F.array_join(kept, "\n")),
    }


def gopher_flags(tokens: Column, text: Column | str) -> dict[str, Column]:
    """Per-rule Gopher quality flags (True = rule PASSED) plus the
    underlying measurements. Pure JVM expressions — one narrow
    projection, no shuffle, no UDF; at 100 TB this fuses into the
    corpus scan alongside every other per-doc signal.

    Returns measurement and flag columns keyed by name; ``keep`` is
    the conjunction. Ratio measurements are rounded to 6dp at the
    SOURCE so both engines compare the same grid (the float-parity
    rule from plans/queries.py)."""
    t = _c(text)
    n_words = F.size(tokens)
    n_words_f = F.greatest(n_words, F.lit(1)).cast("double")
    mean_wl = F.round(
        F.aggregate(
            tokens, F.lit(0), lambda acc, x: acc + F.length(x)
        ).cast("double")
        / n_words_f,
        6,
    )
    symbol_ratio = F.round(
        (
            F.regexp_count(t, F.lit("#"))
            + F.regexp_count(t, F.lit(r"\.\.\."))
        ).cast("double")
        / n_words_f,
        6,
    )
    alpha_ratio = F.round(
        F.size(F.filter(tokens, lambda x: x.rlike("[a-z]"))).cast("double")
        / n_words_f,
        6,
    )
    stop_hits = F.size(
        F.array_intersect(tokens, F.array(*[F.lit(s) for s in STOPWORDS]))
    )
    flags = {
        "n_words": n_words.cast("long"),
        "mean_word_len": mean_wl,
        "symbol_ratio": symbol_ratio,
        "alpha_word_ratio": alpha_ratio,
        "n_stopword_hits": stop_hits.cast("long"),
        "pass_word_count": (n_words >= GOPHER_MIN_WORDS)
        & (n_words <= GOPHER_MAX_WORDS),
        "pass_mean_word_len": (mean_wl >= GOPHER_MIN_MEAN_WORD_LEN)
        & (mean_wl <= GOPHER_MAX_MEAN_WORD_LEN),
        "pass_symbol_ratio": symbol_ratio <= GOPHER_MAX_SYMBOL_RATIO,
        "pass_alpha_words": alpha_ratio >= GOPHER_MIN_ALPHA_WORD_RATIO,
        "pass_stopwords": stop_hits >= GOPHER_MIN_STOPWORD_HITS,
    }
    flags["keep"] = (
        flags["pass_word_count"]
        & flags["pass_mean_word_len"]
        & flags["pass_symbol_ratio"]
        & flags["pass_alpha_words"]
        & flags["pass_stopwords"]
    )
    return flags
