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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.hygiene import scratch_persist

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


# Repetition thresholds (Gopher-rule style: Rae et al. 2021, "Scaling
# Language Models", Table A1 uses top-2-gram/duplicate-n-gram fraction
# cutoffs in this range). Shared with the oracle SQL in
# suite/training.py — keep in sync.
TOP_TOKEN_REPETITIVE = 0.20
DUP_NGRAM_REPETITIVE = 0.30


def token_frequencies(
    df: DataFrame, text_col: str = "text", top_k: int = 100, ndigits: int = 6
) -> DataFrame:
    """Corpus-level token frequency table (the Zipf/vocab-coverage
    report a tokenizer build starts from): the top_k most frequent
    tokens with rank, count, corpus share, and cumulative coverage
    ("the top 100 tokens cover X% of all token positions").

    Deliberately NOT one global window over the whole vocabulary:
    - explode -> groupBy(token) is one fine-grained shuffle with full
      map-side combine (vocab-cardinality output);
    - total token count rides the frequency table (a second tiny agg
      over vocab rows, NOT a second corpus scan);
    - top_k selection is orderBy+limit = TakeOrderedAndProject (per-
      partition heaps, no global sort);
    - only the top_k survivors (bounded, tiny) see the running-sum
      window for cumulative coverage.
    A 100M-row vocabulary never passes through a single-partition
    window; the only single-partition work is over top_k rows.
    Ties broken (count desc, token asc) — a total order, so rank and
    cumulative sums are deterministic."""
    from pyspark.sql import Window as W

    from nyc_etl_pipeline_spark.functions import round_half_up

    freq = (
        df.select(F.explode(tokens(F.col(text_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    freq = scratch_persist(freq)
    total = freq.agg(F.sum("freq").alias("__total"))
    top = freq.orderBy(F.col("freq").desc(), F.col("token").asc()).limit(top_k)
    # single-partition OK: the window input is `top` (<= top_k rows from
    # TakeOrderedAndProject), never the vocabulary — the WindowExec
    # "No Partition Defined" warning is K-bounded by construction
    # (plan-pinned in test_plans.test_q73_zipf_window_is_topk_bounded)
    w = W.orderBy(F.col("freq").desc(), F.col("token").asc())
    return (
        top.crossJoin(F.broadcast(total))
        .select(
            F.row_number().over(w).alias("rank"),
            "token",
            "freq",
            round_half_up(F.col("freq") / F.col("__total"), ndigits).alias("share"),
            round_half_up(
                F.sum("freq").over(w.rowsBetween(W.unboundedPreceding, 0))
                / F.col("__total"),
                ndigits,
            ).alias("cum_share"),
        )
    )


def ngrams_from_tokens(toks: Column, n: int = 2) -> Column:
    """ALL contiguous word n-grams (duplicates preserved — this is the
    point for repetition measurement; `dedup.shingles_from_tokens` is
    the distinct variant). Same staging contract: `toks` must be a
    materialized projection column, not an inline tokens(text)
    expression, or codegen re-tokenizes per element_at read (14x
    measured — see shingles_from_tokens docstring)."""
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", *[F.element_at(toks, i + j + 1) for j in range(n)]),
    )
    return F.when(k >= n, grams).otherwise(F.array().cast("array<string>"))


def repetition_stats(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 2,
    ndigits: int = 3,
) -> DataFrame:
    """Gopher-style repetition filter signals per document:

    - uniq_token_frac: distinct/total tokens (low -> repetitive);
    - top_token_frac:  count of the single most frequent token / total;
    - dup_ngram_frac:  1 - distinct/total n-grams — the fraction of
      gram positions that are excess repeats of an earlier gram;
    - is_repetitive:   (top token occurs >1 time AND top_token_frac >
      0.20) OR dup_ngram_frac > 0.30. The occurs->1 guard keeps short
      all-unique docs (where max count 1 / few tokens already exceeds
      the ratio) from being flagged.

    Unlike the rest of this module these need more than a projection:
    the distinct/dup fractions are per-row JVM array ops (array_distinct
    over a staged token/gram projection — zero shuffle), while the
    top-token mode is explode -> two-level hash agg keyed (id, token)
    then (id): partial map-side combine does most of the work, the
    shuffle key is fine-grained, and the final join back to the
    per-row stats is id-keyed. Nothing touches the driver; scales
    linearly with corpus size at any document length."""
    toks_t = df.select(F.col(id_col), tokens(F.col(text_col)).alias("__toks"))
    grams_t = toks_t.select(
        id_col, "__toks", ngrams_from_tokens(F.col("__toks"), n).alias("__grams")
    )
    base = grams_t.select(
        id_col,
        F.size("__toks").cast("bigint").alias("n_tokens"),
        F.size(F.array_distinct("__toks")).cast("bigint").alias("__n_uniq"),
        F.size("__grams").cast("bigint").alias("__n_grams"),
        F.size(F.array_distinct("__grams")).cast("bigint").alias("__n_uniq_grams"),
    )
    top = (
        toks_t.select(id_col, F.explode("__toks").alias("__tok"))
        .groupBy(id_col, "__tok")
        .agg(F.count(F.lit(1)).alias("__c"))
        .groupBy(id_col)
        .agg(F.max("__c").alias("__top_c"))
    )
    from nyc_etl_pipeline_spark.functions import round_half_up

    j = base.join(top, on=id_col, how="left")
    n_tok = F.col("n_tokens")
    n_grams = F.col("__n_grams")
    frac = lambda num, den: F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0))  # noqa: E731
    top_frac = frac(F.coalesce(F.col("__top_c"), F.lit(0)), n_tok)
    dup_frac = frac(n_grams - F.col("__n_uniq_grams"), n_grams)
    return j.select(
        id_col,
        "n_tokens",
        round_half_up(frac(F.col("__n_uniq"), n_tok), ndigits).alias("uniq_token_frac"),
        round_half_up(top_frac, ndigits).alias("top_token_frac"),
        round_half_up(dup_frac, ndigits).alias("dup_ngram_frac"),
        (
            ((F.coalesce(F.col("__top_c"), F.lit(0)) > 1) & (top_frac > TOP_TOKEN_REPETITIVE))
            | (dup_frac > DUP_NGRAM_REPETITIVE)
        ).alias("is_repetitive"),
    )


def chunk_windows(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    size: int = 500,
    stride: int = 400,
) -> DataFrame:
    """Fixed-stride character windows over documents — the
    context-window chunking step before tokenization/embedding
    (stride < size gives overlapping chunks so no boundary context is
    lost). Emits (id, chunk_idx, chunk, n_chunk_chars).

    Pure JVM expressions: chunk starts come from `sequence()` +
    posexplode (no UDF, no driver loop); `substring` clips the final
    window at end-of-text. Chunk count per doc is
    ceil(max(len-size,0)/stride)+1 — every character lands in at
    least one chunk (the ceil covers the tail past the last full
    stride). Scales as a projection + explode: no shuffle at
    all; downstream ops see ~len/stride rows per doc.
    """
    if size <= 0 or stride <= 0:
        raise ValueError("size and stride must be positive")
    n_extra = F.ceil(
        F.greatest(F.length(F.col(text_col)) - size, F.lit(0)) / stride
    ).cast("int")
    starts = F.sequence(F.lit(0), n_extra)
    exploded = df.select(
        F.col(id_col),
        F.col(text_col).alias("__txt"),
        F.posexplode(starts).alias("chunk_idx", "__k"),
    )
    chunk = F.expr(f"substring(__txt, __k * {stride} + 1, {size})")
    return exploded.select(
        id_col,
        "chunk_idx",
        chunk.alias("chunk"),
        F.length(chunk).alias("n_chunk_chars"),
    )
