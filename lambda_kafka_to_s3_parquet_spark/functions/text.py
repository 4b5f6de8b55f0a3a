"""Text-analysis column expressions (SURVEY.md §2.9).

Everything here returns a :class:`pyspark.sql.Column` built purely from
JVM-side builtins (``split``/``filter``/``transform``/``aggregate`` higher-
order functions) so the hot path stays inside whole-stage codegen — no
Python UDFs. These are the building blocks for the tokenization, quality
scoring, language-ID, shingling, and fingerprinting operators registered in
``plans/extensions.py``.

Scale notes: every expression is per-row (narrow), so these ops add zero
shuffles; the only shuffles in the downstream operators are their explicit
``groupBy``/``join`` stages.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

#: Token pattern shared with the DuckDB oracles (ASCII corpus; lower() first).
TOKEN_SPLIT_RE = "[^a-z0-9]+"

#: Tiny per-language stopword profiles for the n-gram/stopword language-ID
#: heuristic. Deliberately small and ASCII-only so the same literal lists can
#: be embedded in the DuckDB oracle SQL.
LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a", "in", "is", "that", "it", "for"),
    "de": ("der", "die", "das", "und", "ist", "nicht", "mit", "ein", "ich", "zu"),
    "es": ("el", "la", "que", "los", "y", "en", "un", "es", "se", "no"),
    "fr": ("le", "les", "des", "et", "une", "dans", "pour", "ce", "pas", "sur"),
}

#: Stopword set for quality scoring (English-profile, matches oracle literal).
STOPWORDS = LANG_PROFILES["en"]


def tokens(col: Column | str) -> Column:
    """Lower-cased word tokens with empties removed: array<string>."""
    raw = F.split(F.lower(col), TOKEN_SPLIT_RE)
    return F.filter(raw, lambda t: t != "")


def token_count(col: Column | str) -> Column:
    return F.size(tokens(col))


def word_ngrams(tok: Column, n: int = 3) -> Column:
    """All n-word grams of a token array, WITH multiplicity: array<string>.

    Built by zipping the token array with its shifted selves (n-1 zip_with
    passes) instead of per-index ``slice`` calls — ~3× faster in the
    interpreted higher-order-function path, same output. The shifted
    arrays are shorter, so zip_with null-pads the tail; ``concat``
    propagates those nulls and the filter drops them, leaving exactly
    size-n+1 grams (empty when the document has fewer than n tokens).
    Multiplicity is preserved so repetition metrics (Gopher-style
    duplicate-n-gram fractions) can compare total vs distinct counts.
    """
    acc = tok
    for step in range(1, n):
        shifted = F.slice(tok, step + 1, F.size(tok))
        acc = F.zip_with(acc, shifted, lambda a, b: F.concat(a, F.lit(" "), b))
    return F.filter(acc, lambda s: s.isNotNull())


def word_shingles(tok: Column, n: int = 3) -> Column:
    """Distinct n-word shingles of a token array (MinHash/Jaccard input)."""
    return F.array_distinct(word_ngrams(tok, n))


def dup_ngram_frac(tok: Column, n: int) -> Column:
    """Fraction of n-grams that are repeats of an earlier n-gram (0..1).

    ``(total - distinct) / total`` — the Gopher/RefinedWeb repetition
    signal: natural text scores near 0, templated/looping text near 1.
    0 when the document has fewer than n tokens.
    """
    grams = word_ngrams(tok, n)
    total = F.size(grams)
    dup = total - F.size(F.array_distinct(grams))
    return F.when(total > 0, dup.cast("double") / total).otherwise(F.lit(0.0))


def stopword_count(tok: Column, words: tuple[str, ...] = STOPWORDS) -> Column:
    """Number of tokens (with multiplicity) found in ``words``."""
    return F.size(F.filter(tok, lambda t: t.isin(*words)))


def lang_scores(tok: Column) -> dict[str, Column]:
    """Per-language stopword hit counts for the language-ID heuristic."""
    return {lang: stopword_count(tok, words) for lang, words in LANG_PROFILES.items()}


def lang_guess(tok: Column) -> Column:
    """argmax over LANG_PROFILES scores; ties break in profile order.

    A stopword-profile classifier — the classic cheap language-ID heuristic
    for large corpus triage. 'und' (undetermined) when nothing matches.
    """
    scores = lang_scores(tok)
    langs = list(LANG_PROFILES)
    best = F.greatest(*[scores[lang] for lang in langs])
    out = F.lit("und")
    # Build the when-chain in reverse so earlier profiles win ties.
    for lang in reversed(langs):
        out = F.when((scores[lang] > 0) & (scores[lang] == best), F.lit(lang)).otherwise(out)
    return out


def alpha_ratio(col: Column | str) -> Column:
    """Fraction of characters that are a-z after lower-casing (0 for empty)."""
    low = F.lower(col)
    n = F.length(low)
    n_alpha = F.length(F.regexp_replace(low, "[^a-z]", ""))
    return F.when(n > 0, n_alpha.cast("double") / n).otherwise(F.lit(0.0))


def fingerprint(col: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of the normalized text.

    Normalization = lower-case + collapse whitespace runs + trim, so
    documents differing only in case/spacing collapse to one fingerprint.
    md5 is used (not xxhash64) because the oracle engine computes the
    identical digest.
    """
    norm = F.trim(F.regexp_replace(F.lower(col), r"\s+", " "))
    return F.md5(norm)


def rolling_hash(col: Column | str, mod: int = 1_000_000_007, mult: int = 31) -> Column:
    """Portable polynomial rolling hash of a string (engine-agnostic).

    Folds ``acc*mult + ascii(char) (mod m)`` left-to-right — the textbook
    Rabin-Karp construction, reproducible in any engine with a list-fold.
    Used where a hash must agree across engines (oracle checks); prefer
    ``xxhash64`` when only Spark computes it.
    """
    chars = F.split(col, "")
    return F.aggregate(
        F.filter(chars, lambda c: c != ""),
        F.lit(0).cast("bigint"),
        lambda acc, c: (acc * mult + F.ascii(c)) % F.lit(mod),
    )


def whitespace_tokens(col: Column | str) -> Column:
    """Raw whitespace tokenization (no lowercasing/stripping)."""
    return F.filter(F.split(col, r"\s+"), lambda t: t != "")


def bpe_token_estimate(col: Column | str) -> Column:
    """BPE-style LLM token-count estimate, engine-replicable.

    Real BPE needs a merges table; the standard estimation heuristic —
    alphanumeric runs contribute ~1 subword per 4 characters (the
    empirical English BPE average), every punctuation character is its
    own token — tracks real tokenizer counts closely enough for corpus
    budgeting, and is exact integer arithmetic both in Spark and in the
    DuckDB oracle. Whitespace contributes nothing.
    """
    clean = F.filter(
        F.transform(
            F.split(col, r"\s+"),
            lambda w: F.regexp_replace(w, "[^a-zA-Z0-9]", ""),
        ),
        lambda w: w != "",
    )
    word_tokens = F.aggregate(
        clean,
        F.lit(0).cast("long"),
        lambda acc, w: acc + F.ceil(F.length(w) / 4).cast("long"),
    )
    punct_tokens = F.length(F.regexp_replace(col, r"[a-zA-Z0-9\s]", ""))
    return (word_tokens + punct_tokens).cast("long")


#: PII patterns, ordered. Each regex is written in the dialect-portable
#: subset shared by Java regex (Spark) and RE2 (DuckDB): character
#: classes, non-capturing groups, bounded repetition, \b, \d — no
#: lookarounds, no backreferences — so the DuckDB oracle can apply the
#: IDENTICAL pattern text and the redacted output is byte-comparable.
PII_PATTERNS: tuple[tuple[str, str, str], ...] = (
    ("email", r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}", "<EMAIL>"),
    ("phone", r"\b\d{3}-\d{3}-\d{4}\b", "<PHONE>"),
    ("ipv4", r"\b(?:\d{1,3}\.){3}\d{1,3}\b", "<IP>"),
)


def pii_counts(col: Column | str) -> dict[str, Column]:
    """Per-kind PII occurrence counts (email/phone/ipv4), JVM regexp_count."""
    c = F.col(col) if isinstance(col, str) else col
    return {name: F.regexp_count(c, F.lit(pat)) for name, pat, _ in PII_PATTERNS}


def redact_pii(col: Column | str) -> Column:
    """Replace every PII match with its typed placeholder token.

    Patterns apply in :data:`PII_PATTERNS` order (email before phone
    before IP — the formats are disjoint, so order only matters for
    pathological overlaps). Pure chained ``regexp_replace``: per-row,
    narrow, codegen'd — the right shape for a 100 TB scrub pass where
    this rides the same scan as every other per-document signal.
    """
    out = F.col(col) if isinstance(col, str) else col
    for _, pat, placeholder in PII_PATTERNS:
        out = F.regexp_replace(out, pat, placeholder)
    return out
