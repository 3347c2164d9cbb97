"""Graph suite: fixed-point weighted PageRank over the customer→
supplier nation trade graph (who supplies whom, weighted by lineitem
count).

The interesting property: an ITERATIVE algorithm with a full
value-hash oracle. Ranks are computed in scaled integer arithmetic
(operators/graph.py) so summation order can't shift a digit; the
DuckDB oracle unrolls the same recurrence as a CTE chain and must
match bit-for-bit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import round_half_up as R
from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators.graph import (
    PR_SCALE,
    pagerank_fixedpoint,
    sql_pagerank_chain,
)
from nyc_etl_pipeline_spark.suite import QuerySpec

PR_ITERS = 5


def _trade_edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(src=customer nation, dst=supplier nation, w=lineitem count).
    lineitem⋈orders is the one big-big shuffle; customer/supplier are
    key-lookup dimensions (AQE broadcasts them at gate scale; at 100 TB
    they'd shuffle-hash-join, the 625-row output is unchanged)."""
    li = read_testdata(spark, sf_dir, "lineitem")
    o = read_testdata(spark, sf_dir, "orders")
    c = read_testdata(spark, sf_dir, "customer")
    s = read_testdata(spark, sf_dir, "supplier")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(s, li.l_suppkey == s.s_suppkey)
        .groupBy(
            F.col("c_nationkey").alias("src"), F.col("s_nationkey").alias("dst")
        )
        .agg(F.count(F.lit(1)).alias("weight"))
    )


_EDGES_SQL = """
SELECT c.c_nationkey AS src, s.s_nationkey AS dst, count(*) AS w
FROM lineitem l
JOIN orders o ON l.l_orderkey = o.o_orderkey
JOIN customer c ON o.o_custkey = c.c_custkey
JOIN supplier s ON l.l_suppkey = s.s_suppkey
GROUP BY 1, 2
"""


def q76_pagerank_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    edges = _trade_edges(spark, sf_dir)
    ranks = pagerank_fixedpoint(edges, n_iter=PR_ITERS)
    nation = read_testdata(spark, sf_dir, "nation")
    return ranks.join(
        F.broadcast(nation), ranks.node == nation.n_nationkey
    ).select(
        F.col("node").cast("int").alias("nationkey"),
        F.col("n_name").alias("nation"),
        "rank_scaled",
        R(F.col("rank_scaled") / F.lit(float(PR_SCALE)), 9).alias("rank"),
    )


def _q76_sql() -> str:
    chain = sql_pagerank_chain(_EDGES_SQL, n_iter=PR_ITERS)
    return f"""
WITH pr AS ({chain})
SELECT CAST(pr.node AS INTEGER) AS nationkey,
       n.n_name AS nation,
       pr.rank_scaled,
       floor((pr.rank_scaled / {float(PR_SCALE)}) * 1000000000.0 + 0.5) / 1000000000.0
         AS rank
FROM pr JOIN nation n ON pr.node = n.n_nationkey
"""


SPECS = [
    QuerySpec("q76_pagerank_nations", q76_pagerank_nations, _q76_sql(),
              "fixed-point weighted PageRank, integer-exact oracle"),
]
