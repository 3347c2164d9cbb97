"""Text-analysis operators for large-scale training-data pipelines:
tokenization, token counting, quality scoring, language ID,
document fingerprinting.

Everything is built-in `pyspark.sql.functions` (split / regexp /
higher-order lambdas) — JVM-side and codegen-friendly; the operators
scale linearly with no shuffle (pure per-row projections). ASCII-ish
input is assumed for the rolling-hash fingerprint (ascii() takes the
first code point).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Deterministic stopword/marker lists (shared with the DuckDB oracle
# SQL in suite/textops.py — keep in sync).
STOPWORDS_EN = ["the", "a", "an", "of", "and", "to", "in", "is", "it", "for"]
LANG_MARKERS = {
    "en": ["the", "a", "of", "and", "to", "in"],
    "fr": ["le", "la", "les", "de", "et", "un"],
    "es": ["el", "los", "las", "de", "y", "un"],
    "de": ["der", "die", "das", "und", "ein", "zu"],
}
# BPE-ish pre-tokenizer: letter runs, digit runs, single punctuation.
BPE_REGEX = "[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]"
PUNCT_REGEX = "[^a-zA-Z0-9\\s]"
FINGERPRINT_MOD = 2147483647  # 2^31 - 1, keeps acc*31+c < 2^62 in a long


def tokens(text: Column) -> Column:
    """Whitespace tokenization; empty string -> empty array."""
    trimmed = F.trim(text)
    return F.when(trimmed == "", F.array().cast("array<string>")).otherwise(
        F.split(trimmed, "\\s+")
    )


def whitespace_token_count(text: Column) -> Column:
    return F.size(tokens(text)).cast("bigint")


def bpe_token_count(text: Column) -> Column:
    """Count of BPE-style pre-tokens (letter runs / digit runs /
    punctuation singles) via regexp_extract_all — a cheap proxy for a
    real BPE vocab size estimate."""
    return F.size(F.regexp_extract_all(text, F.lit(BPE_REGEX), F.lit(0))).cast("bigint")


def punct_count(text: Column) -> Column:
    return F.size(F.regexp_extract_all(text, F.lit(PUNCT_REGEX), F.lit(0))).cast("bigint")


def stopword_count(text: Column, stopwords: list[str] | None = None) -> Column:
    sw = F.array(*[F.lit(s) for s in (stopwords or STOPWORDS_EN)])
    return F.size(
        F.filter(tokens(text), lambda t: F.array_contains(sw, F.lower(t)))
    ).cast("bigint")


def avg_token_len(text: Column) -> Column:
    toks = tokens(text)
    total = F.aggregate(
        toks, F.lit(0).cast("bigint"), lambda acc, t: acc + F.length(t)
    )
    n = F.size(toks)
    return F.when(n > 0, total.cast("double") / n).otherwise(F.lit(0.0))


def quality_score(text: Column) -> Column:
    """Deterministic [0,1] quality heuristic: stopword density +
    length saturation + punctuation penalty (weights documented in the
    oracle SQL)."""
    n_tok = whitespace_token_count(text)
    sw_ratio = F.when(n_tok > 0, stopword_count(text).cast("double") / n_tok).otherwise(0.0)
    len_sat = F.least(n_tok.cast("double") / 100.0, F.lit(1.0))
    p_ratio = F.when(
        F.length(text) > 0, punct_count(text).cast("double") / F.length(text)
    ).otherwise(0.0)
    from nyc_etl_pipeline_spark.functions import round_half_up

    return round_half_up(0.4 * sw_ratio + 0.3 * len_sat + 0.3 * (1.0 - p_ratio), 4)


def lang_id(text: Column) -> Column:
    """Marker-word language ID: count hits per language's marker list,
    argmax with fixed precedence (en > fr > es > de), 'und' when no
    marker hits at all. An n-gram model would need training data; a
    marker heuristic is deterministic and oracle-expressible."""
    toks = tokens(text)
    counts = {}
    for lang, markers in LANG_MARKERS.items():
        arr = F.array(*[F.lit(m) for m in markers])
        counts[lang] = F.size(F.filter(toks, lambda t: F.array_contains(arr, F.lower(t))))
    best = F.greatest(*counts.values())
    expr = F.lit("und")
    # build the precedence chain backwards so 'en' wins ties
    for lang in reversed(list(LANG_MARKERS)):
        expr = F.when((counts[lang] == best) & (best > 0), F.lit(lang)).otherwise(expr)
    return expr


# PII patterns, deliberately restricted to syntax RE2 (DuckDB) and
# java.util.regex (Spark) interpret identically: character classes,
# bounded repeats, alternation — no lookaround, no backrefs.
PII_EMAIL_REGEX = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PII_PHONE_REGEX = "[0-9]{3}-[0-9]{3}-[0-9]{4}"
PII_SSN_REGEX = "[0-9]{3}-[0-9]{2}-[0-9]{4}"


def normalize_text(text: Column) -> Column:
    """Canonical normalization before hashing/dedup: lowercase, strip
    everything but [a-z0-9 ], collapse whitespace runs, trim. Exact
    dedup over `normalize_text` catches trivially-reformatted copies
    that byte-level digests miss. Pure per-row projection — JVM regex,
    no shuffle, scales linearly."""
    lowered = F.lower(text)
    stripped = F.regexp_replace(lowered, "[^a-z0-9\\s]", "")
    collapsed = F.regexp_replace(stripped, "\\s+", " ")
    return F.trim(collapsed)


def pii_counts(text: Column) -> dict[str, Column]:
    """Match counts per PII class (email / phone / SSN-shaped)."""
    return {
        "n_emails": F.size(F.regexp_extract_all(text, F.lit(PII_EMAIL_REGEX), F.lit(0))).cast(
            "bigint"
        ),
        "n_phones": F.size(F.regexp_extract_all(text, F.lit(PII_PHONE_REGEX), F.lit(0))).cast(
            "bigint"
        ),
        "n_ssns": F.size(F.regexp_extract_all(text, F.lit(PII_SSN_REGEX), F.lit(0))).cast(
            "bigint"
        ),
    }


def redact_pii(text: Column) -> Column:
    """Replace PII matches with typed placeholder tokens. SSN first:
    an SSN-shaped string is also a substring-match for nothing else,
    but phone (3-3-4) and SSN (3-2-4) patterns can overlap in longer
    digit runs — fixed application order keeps output deterministic."""
    out = F.regexp_replace(text, PII_SSN_REGEX, "<SSN>")
    out = F.regexp_replace(out, PII_PHONE_REGEX, "<PHONE>")
    return F.regexp_replace(out, PII_EMAIL_REGEX, "<EMAIL>")


def fingerprint_rolling(text: Column) -> Column:
    """Polynomial rolling hash over characters:
    acc = (acc * 31 + ascii(char)) mod (2^31 - 1). Order-sensitive,
    collision-cheap — the classic document fingerprint."""
    chars = F.split(text, "")
    return F.aggregate(
        chars,
        F.lit(0).cast("bigint"),
        lambda acc, ch: (acc * 31 + F.ascii(ch)) % FINGERPRINT_MOD,
    )


def fingerprint_md5(text: Column) -> Column:
    return F.md5(text)
