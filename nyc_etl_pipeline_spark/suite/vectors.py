"""Similarity-search suite over `embeddings` (array<float> column)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators import similarity as SIM
from nyc_etl_pipeline_spark.functions import round_half_up as R
from nyc_etl_pipeline_spark.suite import QuerySpec

TOPK_K = 5
TOPK_QUERIES = 5  # vec_id < 5
NEARDUP_COSINE = 0.4  # max pairwise cosine in the synthetic data ~0.51

_COS_SQL = (
    "list_dot_product({a}, {b}) / "
    "(sqrt(list_dot_product({a}, {a})) * sqrt(list_dot_product({b}, {b})))"
)


def q25_embedding_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force exact cosine top-k: broadcast query set, per-
    partition local top-k (window), k*|Q| merge. The corpus is never
    shuffled — this is the exact-baseline ANN path."""
    emb = read_testdata(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERIES)
    return SIM.cosine_topk(emb, queries, k=TOPK_K)


_Q25_SQL = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings),
q AS (SELECT vec_id AS query_id, e AS qv FROM v WHERE vec_id < {TOPK_QUERIES}),
scored AS (
  SELECT query_id, v.vec_id AS neighbor_id,
         {_COS_SQL.format(a="qv", b="v.e")} AS cos
  FROM q, v
  WHERE v.vec_id != query_id
),
ranked AS (
  SELECT query_id, neighbor_id, cos,
         row_number() OVER (PARTITION BY query_id ORDER BY cos DESC, neighbor_id) AS rn
  FROM scored
)
SELECT query_id, neighbor_id, floor((cos) * 10000.0 + 0.5) / 10000.0 AS cosine, CAST(rn AS INTEGER) AS rank
FROM ranked WHERE rn <= {TOPK_K}
"""


def q26_embedding_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, exact n^2/2 baseline."""
    emb = read_testdata(spark, sf_dir, "embeddings")
    return SIM.cosine_pairs(emb, threshold=NEARDUP_COSINE)


_Q26_SQL = f"""
WITH v AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS e FROM embeddings)
SELECT a.vec_id AS a_id, b.vec_id AS b_id,
       floor(({_COS_SQL.format(a="a.e", b="b.e")}) * 10000.0 + 0.5) / 10000.0 AS cosine
FROM v a JOIN v b ON a.vec_id < b.vec_id
WHERE {_COS_SQL.format(a="a.e", b="b.e")} >= {NEARDUP_COSINE}
"""


def q27_lsh_bucketed_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scale path: sign-random-projection buckets + exact in-bucket
    rescoring. No oracle (probabilistic recall); precision asserted vs
    q26 in pytest."""
    emb = read_testdata(spark, sf_dir, "embeddings")
    return SIM.lsh_bucketed_pairs(emb, threshold=NEARDUP_COSINE, n_planes=6)


def q35_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF approximate top-k (KMeans coarse quantizer, n_probe cells).
    No oracle (clustering-dependent recall); recall vs exact q25 is
    pinned in pytest."""
    emb = read_testdata(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < TOPK_QUERIES)
    return SIM.ivf_topk(emb, queries, k=TOPK_K, n_lists=8, n_probe=3)


SPECS = [
    QuerySpec("q25_embedding_topk", q25_embedding_topk, _Q25_SQL,
              "exact cosine top-k (broadcast queries, no corpus shuffle)"),
    QuerySpec("q26_embedding_neardup", q26_embedding_neardup, _Q26_SQL,
              "exact cosine near-dup pairs"),
    QuerySpec("q27_lsh_bucketed_pairs", q27_lsh_bucketed_pairs, None,
              "LSH-bucketed near-dup (subset of q26; recall tested in pytest)"),
    QuerySpec("q35_ivf_topk", q35_ivf_topk, None,
              "IVF approximate top-k (recall vs exact q25 in pytest)"),
]
