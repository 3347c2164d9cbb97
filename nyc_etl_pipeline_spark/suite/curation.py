"""Data-curation suite: near-dup clustering (connected components),
exact percentiles, TPC-H Q1, data-quality profiling."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import dec_avg, dec_sum
from nyc_etl_pipeline_spark.functions import round_half_up as R
from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators import dedup as D
from nyc_etl_pipeline_spark.operators.quality import profile
from nyc_etl_pipeline_spark.suite import QuerySpec
from nyc_etl_pipeline_spark.suite.textops import _SHINGLES, _TOKS, JACCARD_THRESHOLD, NGRAM_N


def q41_neardup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical-document selection: connected components over the
    exact n-gram-Jaccard pair graph (q18), min-id representative,
    singletons included."""
    docs = read_testdata(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=NGRAM_N, threshold=JACCARD_THRESHOLD)
    return D.neardup_clusters(docs, pairs)


# The exact-Jaccard pair graph + recursive-CTE connected components,
# as reusable CTE bodies: q41 selects the cluster map directly; the
# split suite (q167/q168) builds cluster-aware split assignments on
# top of the same `pairs`/`reach` relations.
CC_CTES = f"""toks AS (SELECT doc_id, {_TOKS} AS t FROM documents),
sh AS (SELECT doc_id, unnest({_SHINGLES}) AS s FROM toks),
sizes AS (SELECT doc_id, count(*) AS n FROM sh GROUP BY 1),
ov AS (
  SELECT a.doc_id AS a_id, b.doc_id AS b_id, count(*) AS ov
  FROM sh a JOIN sh b ON a.s = b.s AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
pairs AS (
  SELECT a_id, b_id FROM ov
  JOIN sizes sa ON a_id = sa.doc_id
  JOIN sizes sb ON b_id = sb.doc_id
  WHERE ov * 1.0 / (sa.n + sb.n - ov) >= {JACCARD_THRESHOLD}
),
edges AS (SELECT a_id AS a, b_id AS b FROM pairs UNION SELECT b_id, a_id FROM pairs),
reach(node, root) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.b, r.root FROM reach r JOIN edges e ON e.a = r.node
)"""

_Q41_SQL = f"""
WITH RECURSIVE {CC_CTES}
SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_rep
FROM reach GROUP BY node
"""


def q42_percentiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT percentiles (linear interpolation) — the ground truth the
    q34 sketches approximate.

    NOT a gate/bench entry since round 5: `F.percentile` buffers every
    group value in executor memory, which is the dataset itself when
    groups are few — a scale-killer formulation. It survives only as
    the oracle ANCHOR for q58's distributed-sort formulation
    (tests/test_advanced_ops.py::test_percentile_formulations_agree
    pins both algorithms to the same DuckDB-checked digits)."""
    li = read_testdata(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        R(F.percentile("l_extendedprice", 0.25), 3).alias("p25"),
        R(F.percentile("l_extendedprice", 0.5), 3).alias("p50"),
        R(F.percentile("l_extendedprice", 0.75), 3).alias("p75"),
        R(F.percentile("l_extendedprice", 0.99), 3).alias("p99"),
    )


_Q42_SQL = """
SELECT l_returnflag AS returnflag,
       floor((quantile_cont(l_extendedprice, 0.25)) * 1000.0 + 0.5) / 1000.0 AS p25,
       floor((quantile_cont(l_extendedprice, 0.50)) * 1000.0 + 0.5) / 1000.0 AS p50,
       floor((quantile_cont(l_extendedprice, 0.75)) * 1000.0 + 0.5) / 1000.0 AS p75,
       floor((quantile_cont(l_extendedprice, 0.99)) * 1000.0 + 0.5) / 1000.0 AS p99
FROM lineitem
GROUP BY 1
"""


def q43_tpch_q1(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 (pricing summary report) — the canonical wide
    aggregation: one scan, partial+final hash agg, filter pushed to
    parquet."""
    li = read_testdata(spark, sf_dir, "lineitem")
    disc_price = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    charge = disc_price * (1 + F.col("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02").cast("timestamp"))
        .groupBy(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
        )
        .agg(
            R(dec_sum("l_quantity"), 3).alias("sum_qty"),
            R(dec_sum("l_extendedprice"), 3).alias("sum_base_price"),
            R(dec_sum(disc_price), 3).alias("sum_disc_price"),
            R(dec_sum(charge), 3).alias("sum_charge"),
            R(dec_avg("l_quantity"), 3).alias("avg_qty"),
            R(dec_avg("l_extendedprice"), 3).alias("avg_price"),
            R(dec_avg("l_discount"), 3).alias("avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


_Q43_SQL = """
SELECT l_returnflag AS returnflag,
       l_linestatus AS linestatus,
       floor((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS sum_qty,
       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS sum_base_price,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS sum_disc_price,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) * (1 + l_tax) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS sum_charge,
       floor(((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(l_quantity))) * 1000.0 + 0.5) / 1000.0 AS avg_qty,
       floor(((CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(l_extendedprice))) * 1000.0 + 0.5) / 1000.0 AS avg_price,
       floor(((CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE) / count(l_discount))) * 1000.0 + 0.5) / 1000.0 AS avg_disc,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY 1, 2
"""


def q44_data_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-column null/distinct profile of orders — one aggregate pass
    for all columns, reshaped to long."""
    return profile(read_testdata(spark, sf_dir, "orders"))


def _profile_sql() -> str:
    cols = [
        "o_orderkey",
        "o_custkey",
        "o_orderstatus",
        "o_totalprice",
        "o_orderdate",
        "o_orderpriority",
    ]
    parts = [
        f"""SELECT '{c}' AS column, count(*) AS n_rows,
            CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
            CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct
            FROM orders"""
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def q58_percentiles_sorted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same exact percentiles as q42, via the distributed-sort
    formulation (operators/quality.exact_percentiles_sorted) — the
    spillable 100 TB path; `F.percentile`'s in-memory per-group buffer
    is the dataset itself when groups are few. Shares q42's oracle:
    both algorithms must agree to the last rounded digit."""
    from nyc_etl_pipeline_spark.operators.quality import exact_percentiles_sorted

    li = read_testdata(spark, sf_dir, "lineitem")
    out = exact_percentiles_sorted(
        li.select(F.col("l_returnflag").alias("returnflag"), "l_extendedprice"),
        group_col="returnflag",
        value_col="l_extendedprice",
        percentiles=[0.25, 0.5, 0.75, 0.99],
    )
    return out.select(
        "returnflag",
        R(F.col("p_25"), 3).alias("p25"),
        R(F.col("p_5"), 3).alias("p50"),
        R(F.col("p_75"), 3).alias("p75"),
        R(F.col("p_99"), 3).alias("p99"),
    )


def q112_cluster_canonical(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The dedup "keep best" finish: one surviving document per
    near-dup cluster — longest text wins, id tie-break. Composes
    q18's pair graph, q41's connected components, and
    dedup.canonical_per_cluster."""
    docs = read_testdata(spark, sf_dir, "documents")
    pairs = D.ngram_jaccard_pairs(docs, n=NGRAM_N, threshold=JACCARD_THRESHOLD)
    clusters = D.neardup_clusters(docs, pairs)
    return D.canonical_per_cluster(docs, clusters, score_col="n_chars")


_Q112_SQL = _Q41_SQL.replace(
    """SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_rep
FROM reach GROUP BY node""",
    """, clus AS (
  SELECT node AS doc_id, CAST(min(root) AS BIGINT) AS cluster_rep
  FROM reach GROUP BY node
)
SELECT cluster_rep, doc_id, n_chars, cluster_size FROM (
  SELECT c.cluster_rep, d.doc_id, d.n_chars,
         count(*) OVER (PARTITION BY c.cluster_rep) AS cluster_size,
         row_number() OVER (PARTITION BY c.cluster_rep
                            ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
  FROM clus c JOIN documents d USING (doc_id)
) ranked
WHERE rn = 1""",
)
assert _Q112_SQL != _Q41_SQL, "q112 oracle failed to extend q41's CTEs"


def q117_dq_expectations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality report (the dbt-test / Deequ surface):
    null/range/accepted-values rules fold into one conditional-sum
    pass over orders, uniqueness its own group-by, plus a
    lineitem→orders orphan check — all COUNTED, never materialized
    (operators/quality.expectations)."""
    from nyc_etl_pipeline_spark.operators.quality import (
        expectations,
        referential_integrity,
    )

    o = read_testdata(spark, sf_dir, "orders")
    li = read_testdata(spark, sf_dir, "lineitem")
    report = expectations(
        o,
        not_null=["o_custkey", "o_orderdate"],
        unique=[["o_orderkey"]],
        ranges={"o_totalprice": (0.0, 1_000_000.0)},
        accepted={"o_orderpriority": [
            "1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW",
        ]},
    )
    orphans = referential_integrity(li, o, "l_orderkey", "o_orderkey")
    return report.unionByName(orphans)


_Q117_SQL = """
SELECT 'not_null' AS rule, 'o_custkey' AS "column",
       CAST(sum(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_violations
FROM orders
UNION ALL
SELECT 'not_null', 'o_orderdate',
       CAST(sum(CASE WHEN o_orderdate IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'range', 'o_totalprice',
       CAST(sum(CASE WHEN NOT (o_totalprice BETWEEN 0.0 AND 1000000.0)
                       OR o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'accepted_values', 'o_orderpriority',
       CAST(sum(CASE WHEN o_orderpriority NOT IN
                  ('1-URGENT', '2-HIGH', '3-MEDIUM', '4-NOT SPECIFIED', '5-LOW')
                       OR o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT)
FROM orders
UNION ALL
SELECT 'unique', 'o_orderkey',
       CAST(coalesce((SELECT sum(n - 1) FROM (
         SELECT count(*) AS n FROM orders GROUP BY o_orderkey HAVING count(*) > 1
       )), 0) AS BIGINT)
UNION ALL
SELECT 'ref_integrity', 'l_orderkey',
       CAST((SELECT count(*) FROM lineitem l
             WHERE l.l_orderkey IS NOT NULL
               AND NOT EXISTS (SELECT 1 FROM orders o
                               WHERE o.o_orderkey = l.l_orderkey)) AS BIGINT)
"""


SPECS = [
    QuerySpec("q41_neardup_clusters", q41_neardup_clusters, _Q41_SQL,
              "connected-components canonical-doc selection over near-dup pairs"),
    QuerySpec("q43_tpch_q1", q43_tpch_q1, _Q43_SQL, "TPC-H Q1 pricing summary"),
    QuerySpec("q44_data_profile", q44_data_profile, _profile_sql(),
              "per-column null/distinct profile, single-pass"),
    QuerySpec("q58_percentiles_sorted", q58_percentiles_sorted, _Q42_SQL,
              "exact percentiles via spillable distributed sort (same oracle as q42)"),
    QuerySpec("q112_cluster_canonical", q112_cluster_canonical, _Q112_SQL,
              "dedup keep-best: canonical doc per near-dup cluster"),
    QuerySpec("q117_dq_expectations", q117_dq_expectations, _Q117_SQL,
              "declarative data-quality expectations report"),
]
