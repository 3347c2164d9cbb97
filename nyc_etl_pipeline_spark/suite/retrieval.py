"""Retrieval + weighted-sampling gate queries over the documents
table: BM25 top-k, conjunctive boolean search, Efraimidis-Spirakis
weighted sample. Oracles generated from the SAME constants as the
operators (query terms, k1/b, salt) so the two sides cannot drift.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators.retrieval import bm25_topk, boolean_and_search
from nyc_etl_pipeline_spark.operators.sampling import weighted_sample
from nyc_etl_pipeline_spark.suite import QuerySpec

BM25_TERMS = ["join", "window", "hash", "stream"]
BM25_K = 25
BM25_K1 = 1.2
BM25_B = 0.75
BOOL_TERMS = ["customer", "stream", "batch"]
WSAMPLE_N = 50
WSAMPLE_SALT = "v1"

# DuckDB fragment matching operators.text.tokens (trim + split on \s+,
# empty string -> zero tokens).
_TOK = "string_split_regex(trim(text), '\\s+')"
_DL = f"CASE WHEN trim(text) = '' THEN 0.0 ELSE CAST(len({_TOK}) AS DOUBLE) END"


def q109_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lucene-form BM25 over the corpus for a fixed 4-term query —
    see operators/retrieval.py for the scale shape (immediate term
    filter on the posting explode, broadcast stats, top-k heap)."""
    docs = read_testdata(spark, sf_dir, "documents")
    return bm25_topk(docs, BM25_TERMS, k=BM25_K, k1=BM25_K1, b=BM25_B)


def _bm25_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BM25_TERMS)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents WHERE trim(text) <> ''
),
dl_all AS (SELECT {_DL} AS dl FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl_all
),
dl AS (SELECT doc_id, {_DL} AS dl FROM documents),
tf AS (
  SELECT tok.doc_id, term, CAST(count(*) AS DOUBLE) AS tf, any_value(dl.dl) AS dl
  FROM tok JOIN dl USING (doc_id)
  WHERE term IN ({terms})
  GROUP BY 1, 2
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1)
SELECT doc_id,
       floor((list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(
         ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
         * (tf * {BM25_K1 + 1.0}) / (tf + {BM25_K1} * (1.0 - {BM25_B} + {BM25_B} * dl / avgdl))
       AS DOUBLE) ORDER BY term)), (acc, x) -> acc + x)) * 1000000.0 + 0.5) / 1000000.0 AS bm25
FROM tf JOIN dfreq USING (term) CROSS JOIN stats
GROUP BY doc_id
ORDER BY bm25 DESC, doc_id ASC
LIMIT {BM25_K}
"""


def q110_boolean_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conjunctive posting intersection: documents containing every
    query term. Integer-only output."""
    docs = read_testdata(spark, sf_dir, "documents")
    return boolean_and_search(docs, BOOL_TERMS)


def _bool_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in BOOL_TERMS)
    return f"""
WITH tok AS (
  SELECT DISTINCT doc_id, term FROM (
    SELECT doc_id, unnest({_TOK}) AS term FROM documents WHERE trim(text) <> ''
  ) WHERE term IN ({terms})
)
SELECT doc_id FROM tok GROUP BY doc_id HAVING count(*) = {len(set(BOOL_TERMS))}
"""


def q111_weighted_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weight-proportional sample without replacement (A-Res keys on
    the portable md5 uniform), weighted by document length — the
    quality-weighted subsampling cut of a curation pipeline."""
    docs = read_testdata(spark, sf_dir, "documents").select("doc_id", "source", "n_chars")
    return weighted_sample(docs, ["doc_id"], "n_chars", WSAMPLE_N, salt=WSAMPLE_SALT)


def _wsample_sql() -> str:
    from nyc_etl_pipeline_spark.operators.sampling import sql_bucket

    bucket = sql_bucket(["doc_id"], WSAMPLE_SALT)
    return f"""
SELECT doc_id, source, n_chars
FROM documents
WHERE n_chars > 0
ORDER BY pow(((({bucket}) + 0.5) / 1000000.0), 1.0 / CAST(n_chars AS DOUBLE)) DESC,
         doc_id ASC
LIMIT {WSAMPLE_N}
"""


NLL_ALPHA = 0.5


def q113_unigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Perplexity-proxy quality scores: per-doc mean NLL under the
    corpus's own add-alpha unigram model (operators/lm.py)."""
    from nyc_etl_pipeline_spark.operators.lm import unigram_nll_scores

    docs = read_testdata(spark, sf_dir, "documents")
    return unigram_nll_scores(docs, alpha=NLL_ALPHA)


def _nll_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents WHERE trim(text) <> ''
),
tf AS (SELECT doc_id, term, CAST(count(*) AS DOUBLE) AS tf FROM tok GROUP BY 1, 2),
counts AS (SELECT term, sum(tf) AS c FROM tf GROUP BY 1),
totals AS (
  SELECT sum(c) AS corpus_tokens, CAST(count(*) AS DOUBLE) AS vocab FROM counts
)
SELECT doc_id,
       floor((CAST(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(
         tf * ln((c + {NLL_ALPHA}) / (corpus_tokens + {NLL_ALPHA} * vocab))
       AS DOUBLE) ORDER BY term)), (acc, x) -> acc + x) / sum(tf) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS nll,
       CAST(sum(tf) AS BIGINT) AS n_tokens
FROM tf JOIN counts USING (term) CROSS JOIN totals
GROUP BY doc_id
"""


# --------------------------------------------------------------------------
# q179 — interpolated bigram LM NLL (the KenLM-shaped perplexity filter)
# --------------------------------------------------------------------------

BIGRAM_LAM = 0.75  # dyadic: lam and 1-lam exact in binary64


def q179_bigram_nll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-doc mean NLL under the corpus's interpolated bigram model
    (ML bigram conditional backed off to the add-alpha unigram) —
    q113's sharper sibling: fluency now depends on word ORDER, not
    just vocabulary. Same ordered-fold determinism discipline."""
    from nyc_etl_pipeline_spark.operators.lm import bigram_nll_scores

    docs = read_testdata(spark, sf_dir, "documents")
    return bigram_nll_scores(docs, lam=BIGRAM_LAM, alpha=NLL_ALPHA)


def _bigram_nll_sql() -> str:
    from nyc_etl_pipeline_spark.functions import sql_md5_long

    bh = sql_md5_long("bigram")
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents WHERE trim(text) <> ''
),
pos AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1])) AS bigram
  FROM toks
),
dbig AS (
  SELECT doc_id, {bh} AS bh, CAST(count(*) AS DOUBLE) AS bf
  FROM pos GROUP BY 1, 2
),
vocab AS (
  SELECT {bh} AS bh,
         string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2
  FROM (SELECT DISTINCT bigram FROM pos)
),
big AS (SELECT bh, sum(bf) AS c_ab FROM dbig GROUP BY 1),
sb AS (SELECT big.bh, c_ab, w1, w2 FROM big JOIN vocab USING (bh)),
prefix AS (SELECT w1, sum(c_ab) AS c_prefix FROM sb GROUP BY 1),
uni AS (
  SELECT w2, CAST(count(*) AS DOUBLE) AS c_w
  FROM (SELECT unnest(t) AS w2 FROM toks) GROUP BY 1
),
totals AS (
  SELECT sum(c_w) AS corpus_tokens, CAST(count(*) AS DOUBLE) AS vocab FROM uni
),
stats AS (
  SELECT bh,
         ln({BIGRAM_LAM} * (c_ab / c_prefix)
            + {1.0 - BIGRAM_LAM} * ((c_w + {NLL_ALPHA})
                                    / (corpus_tokens + {NLL_ALPHA} * vocab))) AS lnp
  FROM sb JOIN prefix USING (w1) JOIN uni USING (w2) CROSS JOIN totals
)
SELECT doc_id,
       floor((CAST(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(
         bf * lnp
       AS DOUBLE) ORDER BY bh)), (acc, x) -> acc + x) / sum(bf) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS nll,
       CAST(sum(bf) AS BIGINT) AS n_bigrams
FROM dbig JOIN stats USING (bh)
GROUP BY doc_id
"""


PMI_MIN_COUNT = 5
PMI_TOP_K = 25


def q116_pmi_collocations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top collocations by PMI over adjacent word pairs — phrase
    mining for tokenizer vocabulary induction (operators/lm.py)."""
    from nyc_etl_pipeline_spark.operators.lm import pmi_collocations

    docs = read_testdata(spark, sf_dir, "documents")
    return pmi_collocations(docs, min_count=PMI_MIN_COUNT, top_k=PMI_TOP_K)


def _pmi_sql() -> str:
    return f"""
WITH toks AS (
  SELECT {_TOK} AS t FROM documents WHERE trim(text) <> ''
),
uni AS (
  SELECT w, CAST(count(*) AS DOUBLE) AS c FROM (SELECT unnest(t) AS w FROM toks)
  GROUP BY 1
),
totals AS (SELECT sum(c) AS t_tokens FROM uni),
big AS (
  SELECT bigram, CAST(count(*) AS DOUBLE) AS c_ab FROM (
    SELECT unnest(list_transform(range(1, len(t)), i -> t[i] || ' ' || t[i + 1]))
           AS bigram
    FROM toks
  ) GROUP BY 1
),
btot AS (SELECT sum(c_ab) AS t_bigrams FROM big),
cand AS (
  SELECT bigram, c_ab,
         string_split(bigram, ' ')[1] AS w1,
         string_split(bigram, ' ')[2] AS w2
  FROM big WHERE c_ab >= {PMI_MIN_COUNT}
)
SELECT bigram,
       CAST(c_ab AS BIGINT) AS n_pair,
       floor((ln((c_ab / t_bigrams) / ((ua.c / t_tokens) * (ub.c / t_tokens)))) * 1000000.0 + 0.5) / 1000000.0 AS pmi
FROM cand
JOIN uni ua ON cand.w1 = ua.w
JOIN uni ub ON cand.w2 = ub.w
CROSS JOIN totals CROSS JOIN btot
ORDER BY pmi DESC, bigram ASC
LIMIT {PMI_TOP_K}
"""


# --------------------------------------------------------------------------
# q151 — TF-IDF keyword extraction (top-K terms per document)
# --------------------------------------------------------------------------

TFIDF_K = 3


def q151_tfidf_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    from nyc_etl_pipeline_spark.operators.retrieval import tfidf_keywords

    docs = read_testdata(spark, sf_dir, "documents")
    return tfidf_keywords(docs, k=TFIDF_K)


def _tfidf_sql() -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents WHERE trim(text) <> ''
),
tf AS (SELECT doc_id, term, CAST(count(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (SELECT term, CAST(count(*) AS BIGINT) AS df FROM tf GROUP BY 1),
n AS (SELECT count(*) AS n FROM documents),
scored AS (
  SELECT tf.doc_id, tf.term, tf.tf * ln(n.n * 1.0 / dfreq.df) AS score
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
r AS (
  SELECT doc_id, term, score,
         row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, term) AS rk
  FROM scored
)
SELECT doc_id, term, CAST(rk AS BIGINT) AS rk,
       floor(score * 1000000.0 + 0.5) / 1000000.0 AS score
FROM r WHERE rk <= {TFIDF_K}
"""


# --------------------------------------------------------------------------
# q154 — exact phrase search (positional postings)
# --------------------------------------------------------------------------

PHRASE = ["big", "order", "scan"]


def q154_phrase_search(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-postings chain join on Spark; the oracle scans each
    doc's token array for the same consecutive run (list_filter over
    start positions) — two very different plans, identical counts."""
    from nyc_etl_pipeline_spark.operators.retrieval import phrase_search

    return phrase_search(read_testdata(spark, sf_dir, "documents"), PHRASE)


def _phrase_sql() -> str:
    k = len(PHRASE)
    cond = " AND ".join(f"t[i + {j}] = '{w}'" for j, w in enumerate(PHRASE))
    return f"""
WITH toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents WHERE trim(text) <> ''
),
occ AS (
  SELECT doc_id,
         CAST(len(list_filter(range(1, len(t) - {k - 2}), i -> {cond})) AS BIGINT)
           AS n_occ
  FROM toks
)
SELECT doc_id, n_occ FROM occ WHERE n_occ > 0
"""


# --------------------------------------------------------------------------
# q161 — phrase search with slop (ordered, greedy minimal completion)
# --------------------------------------------------------------------------

SLOP_PHRASE = ["big", "order", "scan"]  # q154's phrase, loosened
SLOP_K = 2


def q161_phrase_slop(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered sloppy phrase match: q154's phrase with up to SLOP_K
    interleaved tokens in total. The operator's greedy
    minimal-completion chain (operators/retrieval.phrase_search_slop)
    is replicated step for step in the oracle — per-word position
    CTEs, windowed min per start — so the exactness argument (greedy
    minimizes span) is tested on both engines, not assumed."""
    from nyc_etl_pipeline_spark.operators.retrieval import phrase_search_slop

    return phrase_search_slop(
        read_testdata(spark, sf_dir, "documents"), SLOP_PHRASE, SLOP_K
    )


def _phrase_slop_sql() -> str:
    k = len(SLOP_PHRASE)
    ctes = [
        f"""toks AS (
  SELECT doc_id, {_TOK} AS t FROM documents WHERE trim(text) <> ''
)"""
    ]
    for i, w in enumerate(SLOP_PHRASE):
        ctes.append(
            f"""p{i} AS (
  SELECT doc_id, unnest(list_filter(range(1, len(t) + 1), i -> t[i] = '{w}')) AS p
  FROM toks
)"""
        )
    prev, start = "p0", "p0.p"
    for i in range(1, k):
        ctes.append(
            f"""g{i} AS (
  SELECT {prev}.doc_id, {start} AS p1, min(p{i}.p) AS cur
  FROM {prev} JOIN p{i}
    ON p{i}.doc_id = {prev}.doc_id
   AND p{i}.p > {"p0.p" if i == 1 else f"{prev}.cur"}
   AND p{i}.p <= {"p0.p" if i == 1 else f"{prev}.cur"} + 1 + {SLOP_K}
  GROUP BY 1, 2
)"""
        )
        prev, start = f"g{i}", f"g{i}.p1"
    return f"""
WITH {", ".join(ctes)},
sel AS (
  SELECT doc_id, (cur - p1) - {k - 1} AS sl
  FROM g{k - 1} WHERE (cur - p1) - {k - 1} <= {SLOP_K}
)
SELECT doc_id, CAST(count(*) AS BIGINT) AS n_occ, CAST(min(sl) AS BIGINT) AS min_slop
FROM sel GROUP BY 1
"""


HYBRID_TERMS = ["query", "batch", "window"]
HYBRID_QVEC = 0
HYBRID_POOL = 50
HYBRID_TOPK = 20
HYBRID_RRF_K = 60


def q170_hybrid_rrf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hybrid sparse+dense retrieval (the RAG fusion primitive):
    BM25 pool over `documents` + exact-cosine pool over `embeddings`
    (vec_id ≡ doc_id in the fixture) fused by Reciprocal Rank Fusion.
    Both ranks are engine-deterministic (rounded-bm25 / exact
    index-ordered cosine, ties by id) and the fused score is a
    fixed-association coalesce chain — see operators/retrieval.rrf_fuse."""
    from nyc_etl_pipeline_spark.operators.retrieval import hybrid_search

    docs = read_testdata(spark, sf_dir, "documents")
    emb = read_testdata(spark, sf_dir, "embeddings")
    return hybrid_search(
        docs, emb, HYBRID_TERMS, HYBRID_QVEC,
        pool=HYBRID_POOL, topk=HYBRID_TOPK, rrf_k=HYBRID_RRF_K,
    )


def _hybrid_sql() -> str:
    terms = ", ".join(f"'{t}'" for t in HYBRID_TERMS)
    k1, b = BM25_K1, BM25_B
    cos = (
        "list_dot_product(qv, v.e) / "
        "(sqrt(list_dot_product(qv, qv)) * sqrt(list_dot_product(v.e, v.e)))"
    )
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents WHERE trim(text) <> ''
),
dl_all AS (SELECT {_DL} AS dl FROM documents),
stats AS (
  SELECT CAST(count(*) AS DOUBLE) AS n_docs, avg(dl) AS avgdl FROM dl_all
),
dl AS (SELECT doc_id, {_DL} AS dl FROM documents),
tf AS (
  SELECT tok.doc_id, term, CAST(count(*) AS DOUBLE) AS tf, any_value(dl.dl) AS dl
  FROM tok JOIN dl USING (doc_id)
  WHERE term IN ({terms})
  GROUP BY 1, 2
),
dfreq AS (SELECT term, CAST(count(*) AS DOUBLE) AS df FROM tf GROUP BY 1),
bm AS (
  SELECT doc_id,
         floor((list_reduce(list_prepend(CAST(0.0 AS DOUBLE), list(CAST(
           ln(1.0 + (n_docs - df + 0.5) / (df + 0.5))
           * (tf * {k1 + 1.0}) / (tf + {k1} * (1.0 - {b} + {b} * dl / avgdl))
         AS DOUBLE) ORDER BY term)), (acc, x) -> acc + x)) * 1000000.0 + 0.5) / 1000000.0 AS bm25
  FROM tf JOIN dfreq USING (term) CROSS JOIN stats
  GROUP BY doc_id
  ORDER BY bm25 DESC, doc_id ASC
  LIMIT {HYBRID_POOL}
),
sparse AS (
  SELECT doc_id, row_number() OVER (ORDER BY bm25 DESC, doc_id ASC) AS r FROM bm
),
v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT e AS qv FROM v WHERE vec_id = {HYBRID_QVEC}),
dense_scored AS (
  SELECT v.vec_id AS doc_id, {cos} AS cos
  FROM v CROSS JOIN q WHERE v.vec_id != {HYBRID_QVEC}
),
dense AS (
  SELECT doc_id, row_number() OVER (ORDER BY cos DESC, doc_id ASC) AS r
  FROM dense_scored ORDER BY cos DESC, doc_id ASC LIMIT {HYBRID_POOL}
),
fused AS (
  SELECT coalesce(sparse.doc_id, dense.doc_id) AS doc_id,
         floor((coalesce(1.0 / ({HYBRID_RRF_K} + CAST(sparse.r AS DOUBLE)), 0.0)
              + coalesce(1.0 / ({HYBRID_RRF_K} + CAST(dense.r AS DOUBLE)), 0.0))
               * 1000000.0 + 0.5) / 1000000.0 AS rrf
  FROM sparse FULL OUTER JOIN dense USING (doc_id)
)
SELECT doc_id, rrf,
       CAST(row_number() OVER (ORDER BY rrf DESC, doc_id ASC) AS INTEGER) AS rank
FROM fused
QUALIFY rank <= {HYBRID_TOPK}
"""


# --------------------------------------------------------------------------
# q178 — sparse TF-IDF cosine pairs through the inverted index
# --------------------------------------------------------------------------

SPARSE_COS_MAX_DF = 50
SPARSE_COS_THRESHOLD = 0.25


def q178_sparse_cosine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted term-overlap document similarity: TF-IDF cosine >=
    threshold via the postings self-join, with the max_df stopword cap
    that bounds per-term fan-out (the sparse companion of the dense
    embedding near-dup family). Norms and dots are decimal-accumulated
    so the whole pipeline after one ln() per term is order-independent
    and fully oracle-replicated."""
    from nyc_etl_pipeline_spark.operators.retrieval import sparse_cosine_pairs

    return sparse_cosine_pairs(
        read_testdata(spark, sf_dir, "documents"),
        max_df=SPARSE_COS_MAX_DF,
        threshold=SPARSE_COS_THRESHOLD,
    )


def q199_sparse_cosine_hugevocab(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """q178's computation on the HUGE-VOCAB plan (r11): idf attached
    as a count window over term instead of a broadcast vocabulary —
    the form for Heaps-law vocabularies past broadcast limits. Same
    float expression, same oracle SQL: the driver gate pins the two
    plans value-identical, not just the pytest."""
    from nyc_etl_pipeline_spark.operators.retrieval import sparse_cosine_pairs

    return sparse_cosine_pairs(
        read_testdata(spark, sf_dir, "documents"),
        max_df=SPARSE_COS_MAX_DF,
        threshold=SPARSE_COS_THRESHOLD,
        vocab_broadcast=False,
    )


def _sparse_cos_sql() -> str:
    from nyc_etl_pipeline_spark.functions import sql_dec_sum, sql_round_half_up

    idf6 = sql_round_half_up("ln(n_docs * 1.0 / df)", 6)
    return f"""
WITH tok AS (
  SELECT doc_id, unnest({_TOK}) AS term FROM documents WHERE trim(text) <> ''
),
tf AS (SELECT doc_id, term, count(*) AS tf FROM tok GROUP BY 1, 2),
dfreq AS (
  SELECT term, count(*) AS df FROM tf GROUP BY 1
  HAVING count(*) <= {SPARSE_COS_MAX_DF}
),
n AS (SELECT count(*) AS n_docs FROM documents),
w AS (
  SELECT doc_id, term, tf * ({idf6}) AS w
  FROM tf JOIN dfreq USING (term) CROSS JOIN n
),
norms AS (
  -- zero-norm profiles (all retained terms corpus-universal) join no
  -- pairs; mirrors the operator's ANSI-safe filter
  SELECT doc_id, nrm FROM (
    SELECT doc_id, sqrt({sql_dec_sum('w * w')}) AS nrm FROM w GROUP BY 1
  ) WHERE nrm > 0.0
),
dots AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, {sql_dec_sum('a.w * b.w')} AS dot
  FROM w a JOIN w b ON a.term = b.term AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT a_id, b_id,
       {sql_round_half_up('dot / (na.nrm * nb.nrm)', 4)} AS cosine
FROM dots
JOIN norms na ON a_id = na.doc_id
JOIN norms nb ON b_id = nb.doc_id
WHERE dot / (na.nrm * nb.nrm) >= {SPARSE_COS_THRESHOLD}
"""


SPECS = [
    QuerySpec("q109_bm25_topk", q109_bm25_topk, _bm25_sql(),
              "BM25 top-k retrieval (broadcast stats, filtered postings)"),
    QuerySpec("q178_sparse_cosine", q178_sparse_cosine, _sparse_cos_sql(),
              "TF-IDF cosine pairs via postings self-join (max_df-capped)"),
    QuerySpec("q199_sparse_cosine_hugevocab", q199_sparse_cosine_hugevocab,
              _sparse_cos_sql(),
              "TF-IDF cosine pairs on the huge-vocab window-df plan "
              "(vocab_broadcast=False; same oracle as q178)"),
    QuerySpec("q110_boolean_search", q110_boolean_search, _bool_sql(),
              "conjunctive boolean search via posting intersection"),
    QuerySpec("q111_weighted_sample", q111_weighted_sample, _wsample_sql(),
              "deterministic weighted sample (Efraimidis-Spirakis A-Res)"),
    QuerySpec("q113_unigram_nll", q113_unigram_nll, _nll_sql(),
              "perplexity-proxy scores under the corpus unigram LM"),
    QuerySpec("q179_bigram_nll", q179_bigram_nll, _bigram_nll_sql(),
              "interpolated bigram LM NLL (order-aware perplexity filter)"),
    QuerySpec("q116_pmi_collocations", q116_pmi_collocations, _pmi_sql(),
              "PMI collocation mining over adjacent word pairs"),
    QuerySpec("q151_tfidf_keywords", q151_tfidf_keywords, _tfidf_sql(),
              "TF-IDF top-K keyword extraction per document"),
    QuerySpec("q154_phrase_search", q154_phrase_search, _phrase_sql(),
              "exact phrase search via positional-postings chain join"),
    QuerySpec("q161_phrase_slop", q161_phrase_slop, _phrase_slop_sql(),
              "sloppy phrase search (ordered, greedy minimal completion)"),
    QuerySpec("q170_hybrid_rrf", q170_hybrid_rrf, _hybrid_sql(),
              "hybrid sparse+dense retrieval fused by reciprocal rank fusion"),
]
