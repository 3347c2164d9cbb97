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

from nyc_etl_pipeline_spark.functions import dec_avg, dec_sum
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
        .agg(R(dec_sum(_rev()), 3).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("orderkey"))
        .limit(10)
    )


_Q61_SQL = """
SELECT l_orderkey AS orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS orderdate,
       o_orderpriority AS orderpriority,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
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
            R(dec_sum(_rev()), 3).alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )


_Q62_SQL = """
SELECT n_name AS nation_name,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue,
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
        .agg(R(dec_sum(_rev()), 3).alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("custkey"))
        .limit(20)
    )


_Q63_SQL = """
SELECT c_custkey AS custkey,
       c_name AS cust_name,
       floor((c_acctbal) * 1000.0 + 0.5) / 1000.0 AS acctbal,
       n_name AS nation_name,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
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
        .agg(R(dec_sum("l_quantity"), 3).alias("total_qty"))
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
         floor((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_qty
  FROM lineitem
  GROUP BY 1
  HAVING floor((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 > 150
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
        R(dec_sum("c_acctbal"), 3).alias("total_bal"),
    )


_Q88_SQL = """
SELECT c_nationkey AS nationkey,
       count(*) AS n_custs,
       floor((CAST(sum(CAST(c_acctbal AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_bal
FROM customer c
WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer WHERE c_acctbal > 0)
  AND NOT EXISTS (SELECT 1 FROM orders
                  WHERE o_custkey = c.c_custkey AND o_orderpriority = '1-URGENT')
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q93 — TPC-H Q2 shape: correlated scalar MIN. "Cheapest EUROPE supplier
# per part": unit cost = l_extendedprice / l_quantity; keep the
# (part, supplier) rows achieving the per-part minimum cost among
# suppliers in EUROPE. The fixture has no partsupp, so lineitem is the
# part-supplier bridge. The correlated subquery
# (SELECT min(cost) WHERE partkey = outer.partkey) decorrelates to an
# aggregate + equi-join on partkey — the plan Catalyst produces and the
# only one that scales: one shuffle for the per-part min, one for the
# join back, no per-row re-scan. Cross-engine float safety: cost is a
# single IEEE division both engines evaluate identically, and MIN
# selects an existing value (no arithmetic), so the equality join on
# the min cost is bit-exact.
# --------------------------------------------------------------------------

def q93_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "PROMO")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "EUROPE")
    li = _t(spark, sf_dir, "lineitem")
    costs = (
        li.join(F.broadcast(s), li.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .select(
            "p_partkey", "p_name", "s_suppkey", "s_name", "s_acctbal", "n_name",
            (F.col("l_extendedprice") / F.col("l_quantity")).alias("__cost"),
        )
    )
    min_cost = costs.groupBy(F.col("p_partkey").alias("__pk")).agg(
        F.min("__cost").alias("__min_cost")
    )
    return (
        costs.join(
            min_cost,
            (costs.p_partkey == F.col("__pk")) & (costs.__cost == F.col("__min_cost")),
        )
        .select(
            F.col("p_partkey").alias("partkey"),
            F.col("p_name").alias("part_name"),
            F.col("s_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            R(F.col("s_acctbal"), 3).alias("supp_acctbal"),
            F.col("n_name").alias("nation_name"),
            R(F.col("__cost"), 6).alias("min_cost"),
        )
        .dropDuplicates()
    )


_Q93_SQL = """
WITH costs AS (
  SELECT p_partkey, p_name, s_suppkey, s_name, s_acctbal, n_name,
         l_extendedprice / l_quantity AS cost
  FROM lineitem
  JOIN supplier ON l_suppkey = s_suppkey
  JOIN nation   ON s_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  JOIN part     ON l_partkey = p_partkey
  WHERE r_name = 'EUROPE' AND p_type = 'PROMO'
)
SELECT DISTINCT
       c.p_partkey AS partkey,
       c.p_name AS part_name,
       c.s_suppkey AS suppkey,
       c.s_name AS supp_name,
       floor((c.s_acctbal) * 1000.0 + 0.5) / 1000.0 AS supp_acctbal,
       c.n_name AS nation_name,
       floor((c.cost) * 1000000.0 + 0.5) / 1000000.0 AS min_cost
FROM costs c
WHERE c.cost = (SELECT min(c2.cost) FROM costs c2 WHERE c2.p_partkey = c.p_partkey)
"""


# --------------------------------------------------------------------------
# q94 — TPC-H Q4: order priority checking (EXISTS -> left-semi join).
# Orders placed in 1997Q3 where at least one line shipped more than
# 60 days after the order date. The correlated EXISTS carries a
# non-equi residual (the date comparison references the outer row), so
# it must plan as a LEFT SEMI hash join on orderkey with the date
# predicate as join residual — exactly one probe of lineitem, no
# re-scan per order. Both date filters prune the orders scan.
# --------------------------------------------------------------------------

def q94_tpch_q4(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1997-07-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-10-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    late = o.join(
        li,
        (o.o_orderkey == li.l_orderkey)
        & (li.l_shipdate > F.date_add(o.o_orderdate.cast("date"), 60)),
        "left_semi",
    )
    return late.groupBy(F.col("o_orderpriority").alias("orderpriority")).agg(
        F.count(F.lit(1)).alias("order_count")
    )


_Q94_SQL = """
SELECT o_orderpriority AS orderpriority, count(*) AS order_count
FROM orders o
WHERE o_orderdate >= TIMESTAMP '1997-07-01 00:00:00'
  AND o_orderdate <  TIMESTAMP '1997-10-01 00:00:00'
  AND EXISTS (SELECT 1 FROM lineitem
              WHERE l_orderkey = o.o_orderkey
                AND l_shipdate > CAST(o.o_orderdate AS DATE) + INTERVAL 60 DAY)
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q95 — TPC-H Q11 shape: HAVING over a global scalar subquery.
# "Parts that concentrate volume": per-part total quantity exceeding
# 0.06% of the global total. The scalar total broadcasts to every
# group (no shuffle for the comparison). Float safety: l_quantity is
# integer-valued, so both engines' sums are EXACT (order-independent
# under 2^53) and the threshold comparison is deterministic — revenue
# is reported but never compared.
# --------------------------------------------------------------------------

Q95_FRACTION = 0.0006


def q95_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("partkey")).agg(
        # dec_sum in lockstep with the oracle's decimal total_qty (ADVICE
        # r5); the HAVING-style threshold below stays a double compare on
        # both engines (documented threshold-comparison exception — the
        # integer-valued l_quantity sums are exact either way).
        dec_sum("l_quantity").alias("total_qty"),
        R(dec_sum(_rev()), 3).alias("revenue"),
    )
    total = li.agg(F.sum("l_quantity").alias("__total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("total_qty") > Q95_FRACTION * F.col("__total"))
        .select("partkey", R(F.col("total_qty"), 3).alias("total_qty"), "revenue")
    )


_Q95_SQL = f"""
SELECT l_partkey AS partkey,
       floor((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_qty,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
FROM lineitem
GROUP BY 1
HAVING sum(l_quantity) > {Q95_FRACTION} * (SELECT sum(l_quantity) FROM lineitem)
"""


# --------------------------------------------------------------------------
# q96 — TPC-H Q13: customer order-count distribution (left join + count,
# then re-aggregate). The LEFT join keeps zero-order customers (count
# 0 rows appear in the histogram); counting o_orderkey (not *) makes
# the null join rows count as zero. Two shuffles total: custkey for
# the join+first agg, c_count for the histogram — the second input is
# at most |distinct counts| rows.
# --------------------------------------------------------------------------

def q96_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = _t(spark, sf_dir, "customer")
    o = _t(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") != "4-NOT SPECIFIED"
    )
    per_cust = (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(
        F.count(F.lit(1)).alias("custdist")
    )


_Q96_SQL = """
SELECT c_count, count(*) AS custdist
FROM (
  SELECT c_custkey, count(o_orderkey) AS c_count
  FROM customer LEFT JOIN orders
    ON c_custkey = o_custkey AND o_orderpriority <> '4-NOT SPECIFIED'
  GROUP BY 1
) per_cust
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q97 — TPC-H Q15: top supplier (max over a revenue view). The view
# aggregates a quarter of lineitem per supplier; the max is a scalar
# broadcast back onto the view — no second scan of lineitem, no
# global sort. Ties (several suppliers at the exact max) all surface,
# as in the spec.
# --------------------------------------------------------------------------

def q97_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    s = _t(spark, sf_dir, "supplier")
    rev = li.groupBy(F.col("l_suppkey").alias("suppkey")).agg(
        dec_sum(_rev()).alias("__rev")
    )
    top = (
        rev.crossJoin(F.broadcast(rev.agg(F.max("__rev").alias("__max"))))
        .filter(F.col("__rev") == F.col("__max"))
    )
    return top.join(F.broadcast(s), top.suppkey == s.s_suppkey).select(
        "suppkey",
        F.col("s_name").alias("supp_name"),
        R(F.col("__rev"), 3).alias("total_revenue"),
    )


_Q97_SQL = """
WITH revenue AS (
  SELECT l_suppkey AS suppkey,
         CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) AS total_rev
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
  GROUP BY 1
)
SELECT r.suppkey AS suppkey,
       s_name AS supp_name,
       floor((CAST(r.total_rev AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_revenue
FROM revenue r JOIN supplier ON r.suppkey = s_suppkey
WHERE r.total_rev = (SELECT max(total_rev) FROM revenue)
"""


# --------------------------------------------------------------------------
# q98 — TPC-H Q16 shape: NOT IN -> left-anti join. Distinct supplier
# count per (brand, type) for mid-size parts, excluding "complaint"
# suppliers (negative account balance stands in for the spec's
# comment LIKE '%Customer%Complaints%'). The NOT IN subquery is
# uncorrelated over a non-null key, so it plans as a broadcast
# LEFT ANTI join — the only safe NOT IN form (a nullable key would
# need null-aware anti join). lineitem is the part-supplier bridge.
# --------------------------------------------------------------------------

def q98_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") != "Brand#1") & (F.col("p_size").isin(1, 5, 10, 15, 20, 25))
    )
    li = _t(spark, sf_dir, "lineitem")
    bad = _t(spark, sf_dir, "supplier").filter(F.col("s_acctbal") < 0).select(
        F.col("s_suppkey").alias("l_suppkey")
    )
    ps = (
        li.select("l_partkey", "l_suppkey")
        .join(F.broadcast(bad), on="l_suppkey", how="left_anti")
        .join(F.broadcast(p), li.l_partkey == p.p_partkey)
    )
    return ps.groupBy(
        F.col("p_brand").alias("brand"), F.col("p_type").alias("ptype"),
        F.col("p_size").alias("psize"),
    ).agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))


_Q98_SQL = """
SELECT p_brand AS brand, p_type AS ptype, p_size AS psize,
       CAST(count(DISTINCT l_suppkey) AS BIGINT) AS supplier_cnt
FROM lineitem JOIN part ON l_partkey = p_partkey
WHERE p_brand <> 'Brand#1'
  AND p_size IN (1, 5, 10, 15, 20, 25)
  AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q99 — TPC-H Q17: small-quantity-order revenue (correlated per-group
# AVG). Lines of one brand whose quantity is below 20% of that part's
# average quantity; report sum(extendedprice)/7 as "avg yearly". The
# correlated (SELECT 0.2*avg(l_quantity) WHERE partkey = outer)
# decorrelates to a per-part aggregate joined back — and because the
# part filter cuts to ~1/25 of parts, the per-part avg table is tiny
# and broadcasts. Float safety: quantities are integer-valued, so
# avg = exact_sum/count is identical cross-engine, as is 0.2*avg.
# --------------------------------------------------------------------------

def q99_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = _t(spark, sf_dir, "part").filter(
        (F.col("p_brand") == "Brand#3") & (F.col("p_type") == "SMALL")
    )
    li = _t(spark, sf_dir, "lineitem")
    branded = li.join(F.broadcast(p), li.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    avg_qty = branded.groupBy(F.col("l_partkey").alias("__pk")).agg(
        (F.lit(0.2) * F.avg("l_quantity")).alias("__thresh")
    )
    small = branded.join(
        F.broadcast(avg_qty),
        (branded.l_partkey == F.col("__pk"))
        & (branded.l_quantity < F.col("__thresh")),
    )
    return small.agg(
        R(dec_sum("l_extendedprice") / 7.0, 3).alias("avg_yearly"),
        F.count(F.lit(1)).alias("n_lines"),
    )


_Q99_SQL = """
SELECT floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / 7.0) * 1000.0 + 0.5) / 1000.0 AS avg_yearly,
       count(*) AS n_lines
FROM lineitem l1 JOIN part ON l_partkey = p_partkey
WHERE p_brand = 'Brand#3' AND p_type = 'SMALL'
  AND l_quantity < (SELECT 0.2 * avg(l_quantity) FROM lineitem l2
                    WHERE l2.l_partkey = l1.l_partkey)
"""


# --------------------------------------------------------------------------
# q100 — TPC-H Q20 shape: per-group scalar threshold -> dominant
# suppliers. Suppliers shipping more than TWICE their fair share of a
# part's total quantity (fair share = part total / number of suppliers
# of that part), for 'small%' parts — partsupp.availqty is stood in by
# the shipped-quantity bridge, and the fair-share multiple (rather than
# the spec's absolute 50%) keeps the predicate non-vacuous at every SF:
# with ~N suppliers per part an absolute majority never happens in the
# uniform fixture. Plan: one shuffle aggregates to (part, supplier)
# grain, then window SUM/COUNT over partkey on the ALREADY-AGGREGATED
# rows (≤ one row per part-supplier pair) compute the per-part total
# and supplier count — cheaper than a second scan-level aggregate +
# join. Quantities are integer-valued => supp_qty * n_supp and
# 2 * part_qty are both EXACT doubles => deterministic comparison.
# --------------------------------------------------------------------------

Q100_FAIR_SHARE_MULT = 2.0


def q100_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql import Window

    p = _t(spark, sf_dir, "part").filter(F.col("p_name").like("small%"))
    li = _t(spark, sf_dir, "lineitem")
    s = _t(spark, sf_dir, "supplier")
    n = _t(spark, sf_dir, "nation")
    ps = (
        li.join(F.broadcast(p), li.l_partkey == p.p_partkey)
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum("l_quantity").alias("supp_qty"))
    )
    w = Window.partitionBy("l_partkey")
    dominant = (
        ps.withColumn("__part_qty", F.sum("supp_qty").over(w))
        .withColumn("__n_supp", F.count(F.lit(1)).over(w))
        .filter(
            F.col("supp_qty") * F.col("__n_supp")
            > Q100_FAIR_SHARE_MULT * F.col("__part_qty")
        )
    )
    return (
        dominant.join(F.broadcast(s), dominant.l_suppkey == s.s_suppkey)
        .join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .select(
            F.col("l_partkey").alias("partkey"),
            F.col("l_suppkey").alias("suppkey"),
            F.col("s_name").alias("supp_name"),
            F.col("n_name").alias("nation_name"),
            R(F.col("supp_qty"), 3).alias("supp_qty"),
            R(F.col("__part_qty"), 3).alias("part_qty"),
        )
    )


_Q100_SQL = f"""
WITH ps AS (
  SELECT l_partkey, l_suppkey, sum(l_quantity) AS supp_qty
  FROM lineitem JOIN part ON l_partkey = p_partkey
  WHERE p_name LIKE 'small%'
  GROUP BY 1, 2
),
tot AS (SELECT l_partkey, sum(supp_qty) AS part_qty, count(*) AS n_supp
        FROM ps GROUP BY 1)
SELECT ps.l_partkey AS partkey,
       ps.l_suppkey AS suppkey,
       s_name AS supp_name,
       n_name AS nation_name,
       floor((CAST(ps.supp_qty AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS supp_qty,
       floor((CAST(tot.part_qty AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS part_qty
FROM ps
JOIN tot ON ps.l_partkey = tot.l_partkey
JOIN supplier ON ps.l_suppkey = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
WHERE ps.supp_qty * tot.n_supp > {Q100_FAIR_SHARE_MULT} * tot.part_qty
"""


# --------------------------------------------------------------------------
# q102 — TPC-H Q6: forecasting revenue change (pure scan-level agg)
# --------------------------------------------------------------------------

def q102_tpch_q6(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The canonical pushdown query: every predicate (shipdate range,
    discount bracket, quantity cap) is a parquet scan filter, the
    aggregation is a single partial+final sum with no grouping key —
    zero shuffles beyond the 1-row final merge. At 100 TB this is
    bounded purely by scan bandwidth; row-group min/max statistics
    skip whole chunks outside the date window."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_discount") >= 0.05)
        & (F.col("l_discount") <= 0.07)
        & (F.col("l_quantity") < 24)
    )
    return li.agg(
        R(dec_sum(F.col("l_extendedprice") * F.col("l_discount")), 3).alias("revenue")
    )


_Q102_SQL = """
SELECT floor((CAST(sum(CAST(l_extendedprice * l_discount AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
FROM lineitem
WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
  AND l_discount BETWEEN 0.05 AND 0.07
  AND l_quantity < 24
"""


# --------------------------------------------------------------------------
# q103 — TPC-H Q7: volume shipping between two nations
# --------------------------------------------------------------------------

def q103_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The nation-pair filter lands BEFORE the big join: supplier and
    customer each join their (broadcast, 25-row) nation table and keep
    only the two named nations, shrinking both to ~2/25 of their rows
    — small enough to broadcast into the lineitem⋈orders spine. The
    disjunctive pair predicate is evaluated on the two decorated
    nation names, not re-joined. One big-big shuffle (lineitem⋈orders
    on orderkey); everything else broadcasts."""
    n = _t(spark, sf_dir, "nation")
    s = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_12", "NATION_11"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .filter(F.col("n_name").isin("NATION_12", "NATION_11"))
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(c), F.col("o_custkey") == F.col("c_custkey"))
        .filter(
            ((F.col("supp_nation") == "NATION_12") & (F.col("cust_nation") == "NATION_11"))
            | ((F.col("supp_nation") == "NATION_11") & (F.col("cust_nation") == "NATION_12"))
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(R(dec_sum(_rev()), 3).alias("revenue"))
    )


_Q103_SQL = """
SELECT n1.n_name AS supp_nation,
       n2.n_name AS cust_nation,
       year(l_shipdate) AS l_year,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN customer ON o_custkey  = c_custkey
JOIN nation n1 ON s_nationkey = n1.n_nationkey
JOIN nation n2 ON c_nationkey = n2.n_nationkey
WHERE ((n1.n_name = 'NATION_12' AND n2.n_name = 'NATION_11')
    OR (n1.n_name = 'NATION_11' AND n2.n_name = 'NATION_12'))
  AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1, 2, 3
"""


# --------------------------------------------------------------------------
# q104 — TPC-H Q8: national market share
# --------------------------------------------------------------------------

def q104_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share of one supplier-nation's revenue within a customer-region
    market. The region restriction prunes customer via two broadcast
    hops (nation⋈region, both tiny) before the join spine; the share
    is a conditional-sum / sum over the same grouped pass — one
    aggregation, no self-join, no second scan. Rounded floor-form at
    6 dp so both engines agree bit-for-bit on the ratio."""
    n = _t(spark, sf_dir, "nation")
    r = _t(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    cust_in_region = (
        _t(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == F.col("n_nationkey"))
        .join(F.broadcast(r), F.col("n_regionkey") == F.col("r_regionkey"))
        .select("c_custkey")
    )
    supp_nation = (
        _t(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    p = _t(spark, sf_dir, "part").filter(F.col("p_type") == "STANDARD")
    o = _t(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= F.lit("1995-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp"))
    )
    li = _t(spark, sf_dir, "lineitem")
    vol = F.col("__vol")
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust_in_region), F.col("o_custkey") == F.col("c_custkey"), "left_semi")
        .join(F.broadcast(supp_nation), F.col("l_suppkey") == F.col("s_suppkey"))
        .select(
            F.year("o_orderdate").cast("long").alias("o_year"),
            _rev().alias("__vol"),
            F.col("supp_nation"),
        )
        .groupBy("o_year")
        .agg(
            R(
                dec_sum(F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0))
                / dec_sum(vol),
                6,
            ).alias("mkt_share")
        )
    )


_Q104_SQL = """
SELECT o_year,
       floor((CAST(sum(CAST(CASE WHEN supp_nation = 'NATION_5' THEN volume ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE) / CAST(sum(CAST(volume AS DECIMAL(28,6))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS mkt_share
FROM (
  SELECT year(o_orderdate) AS o_year,
         l_extendedprice * (1 - l_discount) AS volume,
         n2.n_name AS supp_nation
  FROM lineitem
  JOIN part     ON l_partkey  = p_partkey
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey  = c_custkey
  JOIN nation n1 ON c_nationkey = n1.n_nationkey
  JOIN region    ON n1.n_regionkey = r_regionkey
  JOIN supplier  ON l_suppkey = s_suppkey
  JOIN nation n2 ON s_nationkey = n2.n_nationkey
  WHERE r_name = 'ASIA'
    AND p_type = 'STANDARD'
    AND o_orderdate >= TIMESTAMP '1995-01-01 00:00:00'
    AND o_orderdate <  TIMESTAMP '1997-01-01 00:00:00'
) all_nations
GROUP BY o_year
"""


# --------------------------------------------------------------------------
# q105 — TPC-H Q9 shape: product-type profit by nation and year.
# Testdata has no partsupp, so ps_supplycost is proxied by
# 0.1 * p_retailprice (a per-part constant, preserving the query's
# join/agg shape: part-name filter, 4-way join, nation x year rollup).
# --------------------------------------------------------------------------

def q105_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part is filtered by a contains-predicate then broadcast;
    supplier+nation fold to a 10-row broadcast map. The only shuffle
    is lineitem⋈orders on orderkey, then the (25 nations x 7 years)
    group-by — partial aggregation collapses almost everything
    map-side. The profit expression stays JVM-side codegen."""
    p = _t(spark, sf_dir, "part").filter(F.col("p_name").contains("widget"))
    s = (
        _t(spark, sf_dir, "supplier")
        .join(
            F.broadcast(_t(spark, sf_dir, "nation")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    o = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    # The profit expression mixes subtraction into the sum, so a pure
    # double SUM lands within 1 ulp of a rounding boundary for a few
    # (nation, year) groups at sf0.01 and the floor-form round flips
    # between engines. Summing per-row DECIMAL(20,6) casts is exact and
    # order-independent on both engines — bit-identical regardless of
    # partitioning.
    amount = (_rev() - F.lit(0.1) * F.col("p_retailprice") * F.col("l_quantity")).cast(
        "decimal(20,6)"
    )
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .join(F.broadcast(s), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy("nation", F.year("o_orderdate").cast("long").alias("o_year"))
        .agg(R(F.sum(amount).cast("double"), 3).alias("sum_profit"))
    )


_Q105_SQL = """
SELECT n_name AS nation,
       year(o_orderdate) AS o_year,
       floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) - 0.1 * p_retailprice * l_quantity AS DECIMAL(20,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS sum_profit
FROM lineitem
JOIN part     ON l_partkey  = p_partkey
JOIN supplier ON l_suppkey  = s_suppkey
JOIN nation   ON s_nationkey = n_nationkey
JOIN orders   ON l_orderkey = o_orderkey
WHERE p_name LIKE '%widget%'
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q106 — TPC-H Q12 shape: priority counts per line status. Testdata
# has no l_shipmode/commitdate/receiptdate; l_linestatus plays the
# mode role and the one-year window filters on l_shipdate — the
# CASE-count-over-join skeleton is identical.
# --------------------------------------------------------------------------

def q106_tpch_q12(spark: SparkSession, sf_dir: str) -> DataFrame:
    """orders⋈lineitem on orderkey is the single shuffle; the
    conditional counts are a two-branch CASE folded into one grouped
    pass over a 3-value key (partial agg collapses each partition to
    ≤3 rows before the exchange)."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = _t(spark, sf_dir, "orders")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.join(o, F.col("l_orderkey") == F.col("o_orderkey"))
        .groupBy(F.col("l_linestatus").alias("linestatus"))
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(high, 0).otherwise(1)).alias("low_line_count"),
        )
    )


_Q106_SQL = """
SELECT l_linestatus AS linestatus,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
       CAST(sum(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH') THEN 0 ELSE 1 END) AS BIGINT) AS low_line_count
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
WHERE l_shipdate >= TIMESTAMP '1997-01-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q107 — TPC-H Q14: promotion effect (conditional share over a join)
# --------------------------------------------------------------------------

def q107_tpch_q14(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One month of lineitem (scan-pruned) against broadcast part; the
    promo share is numerator/denominator from the SAME ungrouped agg —
    single pass, single 1-row result, no second scan."""
    li = _t(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= F.lit("1997-03-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1997-04-01").cast("timestamp"))
    )
    p = _t(spark, sf_dir, "part")
    rev = _rev()
    return (
        li.join(F.broadcast(p), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            R(
                F.lit(100.0)
                * dec_sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(0.0))
                / dec_sum(rev),
                6,
            ).alias("promo_revenue")
        )
    )


_Q107_SQL = """
SELECT floor((100.0 * CAST(sum(CAST(CASE WHEN p_type = 'PROMO' THEN l_extendedprice * (1 - l_discount) ELSE 0.0 END AS DECIMAL(28,6))) AS DOUBLE)
                 / CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000000.0 + 0.5) / 1000000.0 AS promo_revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE l_shipdate >= TIMESTAMP '1997-03-01 00:00:00'
  AND l_shipdate <  TIMESTAMP '1997-04-01 00:00:00'
"""


# --------------------------------------------------------------------------
# q108 — TPC-H Q19 shape: discounted revenue under disjunctive
# bracket predicates. Testdata lacks p_container/l_shipmode; the
# surviving structure is the interesting part — an equi-join whose
# residual is an OR of three (brand, size-range, quantity-range)
# conjuncts that no single-column pushdown can express.
# --------------------------------------------------------------------------

def q108_tpch_q19(spark: SparkSession, sf_dir: str) -> DataFrame:
    """part broadcasts; the OR-of-ANDs predicate rides the join as a
    residual condition evaluated inside codegen. Catalyst still pushes
    the derivable single-column envelopes (quantity ≤ max bracket) to
    the lineitem scan."""
    li = _t(spark, sf_dir, "lineitem")
    p = _t(spark, sf_dir, "part")
    bracket = (
        ((F.col("p_brand") == "Brand#1") & F.col("p_size").between(1, 15)
         & F.col("l_quantity").between(1, 20))
        | ((F.col("p_brand") == "Brand#5") & F.col("p_size").between(10, 30)
           & F.col("l_quantity").between(10, 30))
        | ((F.col("p_brand") == "Brand#9") & F.col("p_size").between(20, 50)
           & F.col("l_quantity").between(20, 40))
    )
    return (
        li.join(F.broadcast(p), (F.col("l_partkey") == F.col("p_partkey")) & bracket)
        .agg(R(dec_sum(_rev()), 3).alias("revenue"))
    )


_Q108_SQL = """
SELECT floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
FROM lineitem
JOIN part ON l_partkey = p_partkey
WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 20)
   OR (p_brand = 'Brand#5' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 30)
   OR (p_brand = 'Brand#9' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 40)
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
    QuerySpec("q93_tpch_q2", q93_tpch_q2, _Q93_SQL,
              "TPC-H Q2 shape: correlated scalar MIN decorrelated to agg+join"),
    QuerySpec("q94_tpch_q4", q94_tpch_q4, _Q94_SQL,
              "TPC-H Q4: EXISTS with non-equi residual -> left-semi join"),
    QuerySpec("q95_tpch_q11", q95_tpch_q11, _Q95_SQL,
              "TPC-H Q11 shape: HAVING over broadcast global scalar"),
    QuerySpec("q96_tpch_q13", q96_tpch_q13, _Q96_SQL,
              "TPC-H Q13: left-join count distribution (zero-order customers kept)"),
    QuerySpec("q97_tpch_q15", q97_tpch_q15, _Q97_SQL,
              "TPC-H Q15: max over a revenue view, scalar broadcast back"),
    QuerySpec("q98_tpch_q16", q98_tpch_q16, _Q98_SQL,
              "TPC-H Q16 shape: NOT IN -> left-anti + count distinct"),
    QuerySpec("q99_tpch_q17", q99_tpch_q17, _Q99_SQL,
              "TPC-H Q17: correlated per-group AVG decorrelated to broadcast join"),
    QuerySpec("q100_tpch_q20", q100_tpch_q20, _Q100_SQL,
              "TPC-H Q20 shape: dominant supplier via window over aggregated grain"),
    QuerySpec("q102_tpch_q6", q102_tpch_q6, _Q102_SQL,
              "TPC-H Q6: pure scan-level predicate pushdown + 1-row agg"),
    QuerySpec("q103_tpch_q7", q103_tpch_q7, _Q103_SQL,
              "TPC-H Q7: nation-pair volume, filters before the join spine"),
    QuerySpec("q104_tpch_q8", q104_tpch_q8, _Q104_SQL,
              "TPC-H Q8: market share via conditional-sum ratio, one pass"),
    QuerySpec("q105_tpch_q9", q105_tpch_q9, _Q105_SQL,
              "TPC-H Q9 shape: product profit rollup (retailprice cost proxy)"),
    QuerySpec("q106_tpch_q12", q106_tpch_q12, _Q106_SQL,
              "TPC-H Q12 shape: CASE-count priority split over the big join"),
    QuerySpec("q107_tpch_q14", q107_tpch_q14, _Q107_SQL,
              "TPC-H Q14: promo revenue share, numerator/denominator one agg"),
    QuerySpec("q108_tpch_q19", q108_tpch_q19, _Q108_SQL,
              "TPC-H Q19 shape: disjunctive bracket residual on broadcast join"),
]
