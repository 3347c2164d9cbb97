"""Corpus language-model scoring: per-document negative log-likelihood
under an add-k-smoothed unigram model fit on the corpus itself — the
perplexity-proxy quality filter of a CCNet-style curation pipeline
(documents far from the corpus distribution score high and get cut).

Scale design: the corpus reduces to per-(doc, term) frequencies first
(one shuffle keyed by (doc, term), map-side combinable), so the join
with the vocabulary counts moves tf rows — not raw tokens. Vocabulary
counts shuffle on term (a vocabulary is millions of rows at worst, far
below corpus size; broadcast is deliberately NOT assumed). Corpus
totals (token count, vocab size) are a 1-row broadcast. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import round_half_up
from nyc_etl_pipeline_spark.operators.text import tokens


def unigram_nll_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Per-document mean negative log-likelihood under the corpus
    unigram model with add-alpha smoothing:

        P(t) = (c_t + alpha) / (C + alpha * V)
        nll(d) = - Σ_t tf_{d,t} * ln P(t) / Σ_t tf_{d,t}

    where c_t is the corpus count of t, C total tokens, V distinct
    tokens. Smoothing keeps the score finite for any future document
    scored against a frozen model. Empty documents are dropped (no
    tokens to score). Rounded floor-form at 6 dp.
    """
    post = docs.select(
        F.col(id_col).alias("doc"),
        F.explode(tokens(F.col(text_col))).alias("term"),
    )
    tf = post.groupBy("doc", "term").agg(F.count(F.lit(1)).cast("double").alias("tf"))
    counts = tf.groupBy("term").agg(F.sum("tf").alias("c"))
    totals = counts.agg(
        F.sum("c").alias("corpus_tokens"),
        F.count(F.lit(1)).cast("double").alias("vocab"),
    )
    logp = F.log(
        (F.col("c") + F.lit(alpha))
        / (F.col("corpus_tokens") + F.lit(alpha) * F.col("vocab"))
    )
    return (
        tf.join(counts, "term")
        .crossJoin(F.broadcast(totals))
        .groupBy(F.col("doc").alias(id_col))
        .agg(
            round_half_up(-F.sum(F.col("tf") * logp) / F.sum("tf"), 6).alias("nll"),
            F.sum("tf").cast("long").alias("n_tokens"),
        )
    )
