"""Iterative graph algorithms as DataFrame loops.

`pagerank_fixedpoint` runs weighted PageRank for a FIXED number of
iterations in scaled 64-bit integer arithmetic instead of doubles.
Rationale: floating-point summation order differs between engines (and
between Spark task schedules), so a double-typed rank can drift by
ulps and flip a rounded digit — integer sums are exactly associative,
making the result bit-identical across Spark, DuckDB, and plain
Python, and across reruns. That turns an "approximately verifiable"
iterative algorithm into a hash-matchable one.

Semantics (shared with the oracle generator `sql_pagerank_chain`):
  rank_0(v)   = SCALE // n_nodes
  contrib(e)  = rank_i(src) * weight // out_weight(src)     (floor div)
  rank_{i+1}(v) = (SCALE * (den-num) // den) // n_nodes
                  + num * sum(contrib into v) // den
with damping num/den (default 85/100). Floor-division truncation loses
≤ out_degree units of 1e-12 mass per node per round — far below any
reported digit. Dangling nodes (no out-edges) leak their mass rather
than redistributing it: identical formula in both engines, documented.

Scale shape: the rank table is node-cardinality — broadcast it; each
iteration is one broadcast-hash join edges⋈rank plus a partial+final
hash agg keyed dst. Edges are scanned n_iter times → persist them.
For billion-node graphs swap the broadcast for a shuffle hash join on
src; the iteration structure is unchanged.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

PR_SCALE = 10**12


def pagerank_fixedpoint(
    edges: DataFrame,
    n_iter: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
) -> DataFrame:
    """-> (node, rank_scaled bigint). `edges` columns: src, dst,
    weight (positive integers). Node set = src ∪ dst."""
    e = edges.select(
        F.col(src).alias("src"),
        F.col(dst).alias("dst"),
        F.col(weight).cast("bigint").alias("w"),
    ).persist()
    nodes = (
        e.select(F.col("src").alias("node"))
        .unionByName(e.select(F.col("dst").alias("node")))
        .distinct()
        .persist()
    )
    n_nodes = nodes.count()  # scalar: needed to seed rank_0; node-cardinality
    outw = e.groupBy("src").agg(F.sum("w").alias("ow"))
    ew = e.join(F.broadcast(outw), on="src").persist()
    ew.count()  # materialize once; iterations reuse the cached edge table
    e.unpersist()

    base = (PR_SCALE * (damping_den - damping_num) // damping_den) // n_nodes
    rank = nodes.select("node", F.lit(PR_SCALE // n_nodes).alias("rank_scaled"))
    for _ in range(n_iter):
        contrib = (
            ew.join(F.broadcast(rank), on=[ew.src == rank.node])
            .select("dst", F.expr("(rank_scaled * w) div ow").alias("c"))
            .groupBy("dst")
            .agg(F.sum("c").alias("s"))
        )
        rank = nodes.join(contrib, on=[nodes.node == contrib.dst], how="left").select(
            "node",
            (
                F.lit(base)
                + F.expr(f"({damping_num} * coalesce(s, 0L)) div {damping_den}")
            ).alias("rank_scaled"),
        )
    return rank


def sql_pagerank_chain(
    edges_cte: str,
    n_iter: int = 5,
    damping_num: int = 85,
    damping_den: int = 100,
) -> str:
    """DuckDB SQL computing the identical fixed-point iteration as an
    unrolled CTE chain (pr0 .. pr{n}). `edges_cte` must be a SELECT
    producing (src, dst, w). Unrolling instead of WITH RECURSIVE keeps
    the per-round aggregation in plain SQL (recursive terms restrict
    grouping); n_iter is a small fixed constant by contract."""
    parts = [
        f"edges AS ({edges_cte})",
        "nodes AS (SELECT src AS node FROM edges UNION SELECT dst FROM edges)",
        "nn AS (SELECT count(*) AS n FROM nodes)",
        "outw AS (SELECT src, sum(w) AS ow FROM edges GROUP BY 1)",
        f"pr0 AS (SELECT node, CAST({PR_SCALE} AS BIGINT) // (SELECT n FROM nn)"
        " AS r FROM nodes)",
    ]
    base = (
        f"(CAST({PR_SCALE} AS BIGINT) * {damping_den - damping_num} // {damping_den})"
        " // (SELECT n FROM nn)"
    )
    for i in range(1, n_iter + 1):
        parts.append(
            f"c{i} AS (SELECT e.dst AS node, sum((p.r * e.w) // o.ow) AS s"
            f" FROM edges e JOIN pr{i - 1} p ON e.src = p.node"
            f" JOIN outw o ON o.src = e.src GROUP BY 1)"
        )
        parts.append(
            f"pr{i} AS (SELECT n.node,"
            f" {base} + ({damping_num} * coalesce(c.s, 0)) // {damping_den} AS r"
            f" FROM nodes n LEFT JOIN c{i} c USING (node))"
        )
    return (
        "WITH " + ",\n".join(parts) + f"\nSELECT node, r AS rank_scaled FROM pr{n_iter}"
    )
