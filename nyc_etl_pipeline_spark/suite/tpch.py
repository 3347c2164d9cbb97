"""TPC-H-shaped join/aggregation queries (beyond q43's Q1).

The reference pipeline's heaviest shapes are star joins into wide
group-aggs (assets/platinum.py); TPC-H Q3/Q5/Q10/Q18 are the canonical
stress variants of those shapes — selective-filter join pipelines,
multi-way joins with a co-location predicate, top-k over a join, and
aggregate-then-join. Adapted to the driver testdata (no partsupp /
commitdate columns; date constants chosen for the 1995-2001 data range).

Scale notes (100 TB posture) per query in the docstrings; the common
themes: filters reach the parquet scans (PushedFilters), nation/region
always broadcast, lineitem⋈orders is the one genuine big-big shuffle
(AQE skew-handles it), and top-k is TakeOrderedAndProject — never a
global sort.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import round_half_up as R
from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.suite import QuerySpec


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return read_testdata(spark, sf_dir, name)


def _rev():
    # Built lazily: constructing a Column requires an active SparkContext
    # in PySpark 4.x, and this module must import before the session exists
    # (the driver may call queries()/oracle_sql() pre-session).
    return F.col("l_extendedprice") * (1 - F.col("l_discount"))


# --------------------------------------------------------------------------
# q61 — TPC-H Q3: shipping priority (selective filters + top-k over join)
# --------------------------------------------------------------------------

def q61_tpch_q3(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Both date filters and the mktsegment filter are scan-level
    predicates (pushed to parquet); customer is filtered to ~1/5 before
    joining, so Catalyst/AQE broadcast it at test SF and shuffle it at
    cluster scale. The top-10 is TakeOrderedAndProject (per-partition
    heap + driver merge), never a global sort. Ties broken by orderkey
    on the ROUNDED revenue so both engines pick the same set."""
    cutoff = F.lit("1998-03-15").cast("timestamp")
    c = _t(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    o = _t(spark, sf_dir, "orders").filter(F.col("o_orderdate") < cutoff)
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_shipdate") > cutoff)
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .groupBy(
            F.col("l_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            F.col("o_orderpriority").alias("orderpriority"),
        )
        .agg(R(F.sum(_rev()), 3).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


_Q61_SQL = """
SELECT l_orderkey AS orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
       o_orderpriority AS orderpriority,
       floor((CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
WHERE c_mktsegment = 'BUILDING'
  AND o_orderdate < TIMESTAMP '1998-03-15 00:00:00'
  AND l_shipdate  > TIMESTAMP '1998-03-15 00:00:00'
GROUP BY 1, 2, 3
ORDER BY revenue DESC, orderkey ASC
LIMIT 10
"""


# --------------------------------------------------------------------------
# q62 — TPC-H Q5: local supplier volume (multi-way join + co-location key)
# --------------------------------------------------------------------------

def q62_tpch_q5(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Six-table join whose distinguishing predicate is the non-key
    equality c_nationkey = s_nationkey (customer and supplier in the
    same nation). supplier/nation/region are broadcast (supplier is
    1/10 of customer in TPC-H and static); the single shuffle is
    lineitem⋈orders. The year filter prunes orders at the scan."""
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(
            F.broadcast(s),
            (li.l_suppkey == s.s_suppkey) & (c.c_nationkey == s.s_nationkey),
        )
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy(F.col("n_name").alias("nation_name"))
        .agg(
            R(F.sum(_rev()), 3).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q62_SQL = """
SELECT n_name AS nation_name,
       floor((CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue,
       count(*) AS n_items
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
WHERE r_name = 'ASIA'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q63 — TPC-H Q10: returned-item reporting (top-20 customers by lost rev)
# --------------------------------------------------------------------------

def q63_tpch_q10(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quarter + returnflag filters prune both fact scans; the group-by
    key is the customer (wide payload carried through the agg — tests
    that non-agg payload columns ride the grouping, as in the
    reference's report queries). Top-20 via TakeOrderedAndProject with
    custkey tie-break on rounded revenue."""
    c = _t(spark, sf_dir, "customer")
    n = _t(spark, sf_dir, "nation")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            R(F.col("c_acctbal"), 3).alias("acctbal"),
            F.col("n_name").alias("nation_name"),
        )
        .agg(R(F.sum(_rev()), 3).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


_Q63_SQL = """
SELECT c_custkey AS custkey,
       c_name AS cust_name,
       floor((c_acctbal) * 1000.0 + 0.5) / 1000.0 AS acctbal,
       n_name AS nation_name,
       floor((CAST(sum(l_extendedprice * (1 - l_discount)) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
FROM customer
JOIN orders   ON c_custkey = o_custkey
JOIN lineitem ON l_orderkey = o_orderkey
JOIN nation   ON c_nationkey = n_nationkey
WHERE l_returnflag = 'R'
  AND o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-04-01 00:00:00'
GROUP BY 1, 2, 3, 4
ORDER BY revenue DESC, custkey ASC
LIMIT 20
"""


# --------------------------------------------------------------------------
# q64 — TPC-H Q18: large-volume orders (aggregate-then-join)
# --------------------------------------------------------------------------

def q64_tpch_q18(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The scale-critical rewrite: aggregate lineitem FIRST (partial
    map-side combine shrinks 4 rows/order to 1 before any join), filter
    on the HAVING threshold, then join the small survivor set to orders
    and customer. TPC-H's textbook form re-scans lineitem after a semi
    join; pre-aggregating reads it once and ships only qualifying
    orderkeys — at 100 TB that is the difference between one shuffle of
    ~N/4 aggregated rows and two full scans."""
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    c = _t(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(R(F.sum("l_quantity"), 3).alias("total_qty"))
        .filter(F.col("total_qty") > 150)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            F.col("c_custkey").alias("custkey"),
            F.col("c_name").alias("cust_name"),
            F.col("o_orderkey").alias("orderkey"),
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
            R(F.col("o_totalprice"), 3).alias("totalprice"),
            F.col("total_qty"),
        )
    )


_Q64_SQL = """
SELECT c_custkey AS custkey,
       c_name AS cust_name,
       o_orderkey AS orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
       floor((o_totalprice) * 1000.0 + 0.5) / 1000.0 AS totalprice,
       total_qty
FROM (
  SELECT l_orderkey,
         floor((CAST(sum(l_quantity) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_qty
  FROM lineitem
  GROUP BY 1
  HAVING floor((CAST(sum(l_quantity) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 > 150
) big
JOIN orders   ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


# --------------------------------------------------------------------------
# q83 — TPC-H Q21 shape: chained EXISTS / NOT EXISTS correlation.
# "Suppliers who single-handedly held up multi-supplier orders": a
# line is LATE when it ships >90 days after the order date; keep
# (supplier, order) pairs where the order has another supplier's line
# (EXISTS -> left_semi) but no OTHER supplier's line is late
# (NOT EXISTS -> left_anti). The canonical decorrelation exercise: both
# subqueries correlate on orderkey AND an inequality on suppkey, so
# they cannot collapse into simple IN-lists — the engine must plan
# them as semi/anti hash joins on orderkey with the suppkey
# inequality as a join residual. Adapted from TPC-H Q21 (no
# receiptdate/commitdate in the fixture schema).
# --------------------------------------------------------------------------

LATE_DAYS = 90


def q83_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    o = _t(spark, sf_dir, "orders")
    lo = li.join(o, li.l_orderkey == o.o_orderkey).select(
        "l_orderkey", "l_suppkey", "l_shipdate", "o_orderdate"
    )
    late = lo.filter(
        F.col("l_shipdate") > F.date_add(F.col("o_orderdate").cast("date"), LATE_DAYS)
    )
    # EXISTS other-supplier line in the same order
    others = li.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    multi = late.join(
        others,
        (late.l_orderkey == others.__ok) & (late.l_suppkey != others.__sk),
        "left_semi",
    )
    # NOT EXISTS other-supplier LATE line in the same order
    other_late = late.select(
        F.col("l_orderkey").alias("__ok"), F.col("l_suppkey").alias("__sk")
    )
    only_late = multi.join(
        other_late,
        (multi.l_orderkey == other_late.__ok) & (multi.l_suppkey != other_late.__sk),
        "left_anti",
    )
    return (
        only_late.groupBy(F.col("l_suppkey").alias("suppkey"))
        .agg(F.count(F.lit(1)).alias("numwait"))
    )


_Q83_SQL = f"""
WITH lo AS (
  SELECT l_orderkey, l_suppkey, l_shipdate, o_orderdate
  FROM lineitem JOIN orders ON l_orderkey = o_orderkey
),
late AS (
  SELECT * FROM lo
  WHERE l_shipdate > CAST(o_orderdate AS DATE) + INTERVAL {LATE_DAYS} DAY
)
SELECT l_suppkey AS suppkey, count(*) AS numwait
FROM late l1
WHERE EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey)
  AND NOT EXISTS (
        SELECT 1 FROM late l3
        WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q88 — TPC-H Q22 shape: global scalar-subquery threshold + NOT EXISTS.
# "Well-funded customers with no URGENT order": acctbal above the
# global positive-balance average (a scalar aggregate broadcast to
# every row — no shuffle for the comparison) and NOT EXISTS a
# 1-URGENT order (left_anti against a filtered orders scan — the
# filter pushes into the anti join's build side). Adapted from TPC-H
# Q22 (fixture has no phone column and every customer has orders, so
# nation replaces the phone-prefix grouping and the urgency filter
# keeps the anti join non-vacuous).
# --------------------------------------------------------------------------

def q88_tpch_q22(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders")
    avg_bal = c.filter(F.col("c_acctbal") > 0).agg(
        F.avg("c_acctbal").alias("__avg")
    )
    rich = (
        c.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("__avg"))
        .select("c_custkey", "c_nationkey", "c_acctbal")
    )
    never_urgent = rich.join(
        o.filter(F.col("o_orderpriority") == "1-URGENT").select(
            F.col("o_custkey").alias("c_custkey")
        ),
        on="c_custkey",
        how="left_anti",
    )
    return never_urgent.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_custs"),
        R(F.sum("c_acctbal"), 3).alias("total_bal"),
    )


_Q88_SQL = """
SELECT c_nationkey AS nationkey,
       count(*) AS n_custs,
       floor((CAST(sum(c_acctbal) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1
"""


SPECS = [
    QuerySpec("q61_tpch_q3", q61_tpch_q3, _Q61_SQL,
              "TPC-H Q3: selective filters + top-k over a 3-way join"),
    QuerySpec("q62_tpch_q5", q62_tpch_q5, _Q62_SQL,
              "TPC-H Q5: 6-way join with non-key co-location predicate"),
    QuerySpec("q63_tpch_q10", q63_tpch_q10, _Q63_SQL,
              "TPC-H Q10: top-20 customers by returned revenue"),
    QuerySpec("q64_tpch_q18", q64_tpch_q18, _Q64_SQL,
              "TPC-H Q18: aggregate-then-join large-volume orders"),
    QuerySpec("q83_tpch_q21", q83_tpch_q21, _Q83_SQL,
              "TPC-H Q21 shape: chained EXISTS/NOT EXISTS semi+anti joins"),
    QuerySpec("q88_tpch_q22", q88_tpch_q22, _Q88_SQL,
              "TPC-H Q22 shape: scalar-subquery threshold + NOT EXISTS anti join"),
]
