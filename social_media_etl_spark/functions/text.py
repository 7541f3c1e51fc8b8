"""Text-analysis column expressions for training-data pipelines:
tokenization, shingling, quality scoring, language ID, fingerprinting.

All built-in expressions (split/transform/aggregate/filter) — scale to
100 TB of documents as a single codegen'd projection, no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = [
    "tokens",
    "token_count",
    "bpe_ish_token_count",
    "BPE_TOKEN_RE",
    "word_shingles",
    "avg_token_len",
    "char_class_ratio",
    "stopword_ratio",
    "quality_score",
    "lang_scores",
    "lang_id",
    "fingerprint",
    "simhash",
    "PII_PATTERNS",
    "pii_counts",
    "redact_pii",
    "LANG_STOPWORDS",
    "PUNCT_CLASS",
    "FINGERPRINT_MOD",
]

PUNCT_CLASS = "[.,!?;:]"
FINGERPRINT_MOD = 1_000_000_007

# Tiny per-language function-word lists for the n-gram/stopword
# language-ID heuristic. Order matters for deterministic tiebreak.
LANG_STOPWORDS: dict[str, tuple[str, ...]] = {
    "de": ("der", "die", "das", "und", "ist", "nicht", "ein", "mit", "für", "auf"),
    "en": ("the", "and", "is", "of", "to", "in", "that", "it", "with", "for"),
    "es": ("el", "la", "los", "las", "es", "y", "de", "que", "en", "por"),
    "fr": ("le", "la", "les", "et", "est", "de", "que", "en", "une", "pour"),
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization (empty string → empty array)."""
    text = F.col(text) if isinstance(text, str) else text
    t = F.split(F.trim(F.lower(text)), r"\s+")
    return F.when(F.trim(text) == "", F.array().cast("array<string>")).otherwise(t)


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


# GPT-2-style pre-tokenizer shape (contractions, letter runs, digit
# runs, punctuation runs, whitespace), restricted to syntax valid in
# BOTH Java regex (Spark) and RE2 (DuckDB oracle): no lookarounds.
BPE_TOKEN_RE = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def bpe_ish_token_count(text: Column | str) -> Column:
    """Approximate LLM token count: number of matches of a BPE-style
    pre-tokenizer regex (letter runs / digit runs / punct runs /
    contractions). Upper-bounds the merged-BPE count the way
    pre-tokenization does; pure `regexp_count` — codegen'd, no UDF."""
    text = F.col(text) if isinstance(text, str) else text
    return F.regexp_count(text, F.lit(BPE_TOKEN_RE))


def word_shingles(text: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles (the MinHash/Jaccard input unit).

    Built by zipping ``n`` shifted slices of the token array rather
    than slicing inside a ``transform`` lambda: an expression
    referenced INSIDE a higher-order-function lambda is re-evaluated
    on every lambda call, so the original
    ``transform(sequence(...), i -> slice(tokens, i+1, n))`` form
    re-ran the regex tokenizer once per gram position — O(tokens²)
    work per document (measured 8× slower at sf0.1). Here the token
    array appears only in top-level expressions (evaluated once per
    row) and the lambda touches nothing but its own struct argument.
    """
    t = tokens(text)
    m = F.size(t) - (n - 1)  # gram count when size >= n
    zipped = F.arrays_zip(*[F.slice(t, i + 1, m) for i in range(n)])
    grams = F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )
    empty = F.array().cast("array<string>")
    return F.array_distinct(F.when(F.size(t) >= n, grams).otherwise(empty))


def avg_token_len(text: Column | str) -> Column:
    t = tokens(text)
    total = F.aggregate(
        t, F.lit(0).cast("long"), lambda acc, w: acc + F.length(w)
    )
    return F.when(F.size(t) > 0, total / F.size(t))


def char_class_ratio(text: Column | str, char_class: str = PUNCT_CLASS) -> Column:
    """Fraction of characters matching a regex character class."""
    text = F.col(text) if isinstance(text, str) else text
    n = F.length(text)
    stripped = F.length(F.regexp_replace(text, char_class, ""))
    return F.when(n > 0, (n - stripped) / n)


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] | None = None) -> Column:
    """Fraction of token OCCURRENCES that are stopwords. An explicitly
    EMPTY stopword tuple means "no stopwords" (ratio 0), not the
    English default (r8 review: the falsy-or check silently swapped in
    English for languages configured with no list)."""
    words = stopwords if stopwords is not None else LANG_STOPWORDS["en"]
    if not words:
        t = tokens(text)
        return F.when(F.size(t) > 0, F.lit(0.0))
    t = tokens(text)
    lit_words = F.array(*[F.lit(w) for w in words])
    hits = F.size(F.filter(t, lambda w: F.array_contains(lit_words, w)))
    return F.when(F.size(t) > 0, hits / F.size(t))


def quality_score(text: Column | str) -> Column:
    """Heuristic document-quality score in [0,1]: rewards mid-range
    length and word size, penalizes punctuation/digit soup. The exact
    formula is this engine's own; what matters is determinism and
    single-pass evaluation."""
    text = F.col(text) if isinstance(text, str) else text
    n_tok = token_count(text)
    len_score = F.least(n_tok / F.lit(50.0), F.lit(1.0))
    awl = F.coalesce(avg_token_len(text), F.lit(0.0))
    wordlen_score = F.when((awl >= 3) & (awl <= 10), 1.0).otherwise(0.5)
    punct_pen = F.coalesce(char_class_ratio(text, PUNCT_CLASS), F.lit(0.0))
    digit_pen = F.coalesce(char_class_ratio(text, "[0-9]"), F.lit(0.0))
    raw = (
        0.4 * len_score
        + 0.3 * wordlen_score
        + 0.3 * (1 - F.least(punct_pen + digit_pen, F.lit(1.0)))
    )
    return F.round(raw, 6)


def lang_scores(text: Column | str) -> dict[str, Column]:
    """Stopword-hit count per language (occurrence-weighted)."""
    t = tokens(text)
    out = {}
    for lang, words in LANG_STOPWORDS.items():
        lit_words = F.array(*[F.lit(w) for w in words])
        out[lang] = F.size(F.filter(t, lambda w: F.array_contains(lit_words, w)))
    return out


def lang_id(text: Column | str, default: str = "unknown") -> Column:
    """Argmax language by stopword hits; ties broken by reverse-
    alphabetical language code (via struct max); zero hits → default."""
    scores = lang_scores(text)
    pairs = F.array(
        *[F.struct(s.alias("score"), F.lit(lang).alias("lang")) for lang, s in scores.items()]
    )
    best = F.array_max(pairs)
    return F.when(best["score"] > 0, best["lang"]).otherwise(F.lit(default))


def fingerprint(text: Column | str, mod: int = FINGERPRINT_MOD) -> Column:
    """Deterministic rolling polynomial document fingerprint:
    fold(acc*131 + (37*len(w) + ascii(w[0]))) over tokens, mod a prime.
    Pure integer arithmetic — reproducible in any engine."""
    t = tokens(text)
    mapped = F.transform(
        t, lambda w: (F.length(w).cast("long") * 37 + F.ascii(F.substring(w, 1, 1)))
    )
    return F.aggregate(
        mapped,
        F.lit(0).cast("long"),
        lambda acc, x: (acc * 131 + x) % F.lit(mod),
    )


def simhash(text: Column | str, bits: int = 32) -> Column:
    """SimHash over tokens: per-bit majority vote of token hashes
    (xxhash64). Near-duplicate texts differ in few bits (Charikar'02).
    """
    if not 1 <= bits <= 64:
        raise ValueError(f"simhash: bits must be in [1, 64], got {bits}")
    # hash each token ONCE into an array, then vote over the hashes —
    # referencing xxhash64(w) inside the per-bit whens re-hashed every
    # token `bits` times (no CSE inside HOF lambdas; r8 review)
    hashes = F.transform(tokens(text), lambda w: F.xxhash64(w))
    # per-token ±1 contributions for each bit, summed across tokens
    zeros = F.array_repeat(F.lit(0), bits)
    sums = F.aggregate(
        hashes,
        zeros,
        lambda acc, h: F.zip_with(
            acc,
            F.array(
                *[
                    F.when(
                        F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1
                    ).otherwise(-1)
                    for i in range(bits)
                ]
            ),
            lambda a, b: a + b,
        ),
    )
    out = F.lit(0).cast("long")
    for i in range(bits):
        # bit 63 of a signed long is the sign bit: its two's-complement
        # weight is -2^63 (a +2^63 literal would overflow LongType)
        weight = -(1 << 63) if i == 63 else (1 << i)
        out = out + F.when(
            F.element_at(sums, i + 1) > 0, F.lit(weight).cast("long")
        ).otherwise(F.lit(0).cast("long"))
    return out


# PII patterns restricted to syntax valid in BOTH Java regex (Spark)
# and RE2 (DuckDB oracle): no lookarounds, no backrefs.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    "url": r"https?://[^\s]+",
    "phone": r"\+?[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}",
    "ipv4": r"\b[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\b",
}


def pii_counts(text: Column | str) -> dict[str, Column]:
    """Per-category PII match counts (codegen'd regexp_count)."""
    text = F.col(text) if isinstance(text, str) else text
    return {
        name: F.regexp_count(text, F.lit(pat))
        for name, pat in PII_PATTERNS.items()
    }


def redact_pii(text: Column | str, token: str = "<PII>") -> Column:
    """Replace every PII match with ``token`` — the standard scrubbing
    stage of a training-data pipeline, applied in category order
    (email, url, phone, ipv4) as chained regexp_replace, all JVM-side."""
    out = F.col(text) if isinstance(text, str) else text
    for pat in PII_PATTERNS.values():
        out = F.regexp_replace(out, pat, token)
    return out
