"""Advanced operator suite: as-of join, range join, cube, unpivot,
set ops, distinct & approximate aggregates (beyond the reference
surface — SURVEY §7 M4 breadth)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import dec_avg, dec_sum
from nyc_etl_pipeline_spark.functions import round_half_up as R
from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators.joins import asof_join_backward, range_join_small
from nyc_etl_pipeline_spark.suite import QuerySpec

# --------------------------------------------------------------------------
# q28 — as-of join (backward, inclusive): purchase <- latest prior click
# --------------------------------------------------------------------------

def q28_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    purchases = e.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    clicks = e.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    out = asof_join_backward(purchases, clicks, by="user_id", ts="ts", right_value_cols=["value"])
    return out.select(
        "event_id",
        "user_id",
        "ts",
        F.col("asof_ts").alias("click_ts"),
        F.col("asof_value").alias("click_value"),
    )


_Q28_SQL = """
WITH purchases AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase'
),
clicks AS (SELECT user_id, ts, value FROM events WHERE event_type = 'click')
SELECT p.event_id, p.user_id, p.ts,
       c.ts AS click_ts, c.value AS click_value
FROM purchases p
ASOF LEFT JOIN clicks c ON p.user_id = c.user_id AND c.ts <= p.ts
"""


# --------------------------------------------------------------------------
# q29 — range join into value tiers (non-equi, broadcast small side)
# --------------------------------------------------------------------------

_TIERS = [("T0", 0.0, 5.0), ("T1", 5.0, 10.0), ("T2", 10.0, 20.0), ("T3", 20.0, 1e9)]


def q29_range_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    tiers = spark.createDataFrame(_TIERS, "tier string, lo double, hi double")
    joined = range_join_small(e, tiers, "value")
    return (
        joined.groupBy("tier", "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            R(dec_sum("value"), 3).alias("total_value"),
        )
    )


_Q29_SQL = f"""
WITH tiers(tier, lo, hi) AS (
  VALUES {", ".join(f"('{t}', {lo}, {hi})" for t, lo, hi in _TIERS)}
)
SELECT tier, event_type,
       count(*) AS n_events,
       floor((CAST(sum(CAST(value AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_value
FROM events JOIN tiers ON value >= lo AND value < hi
GROUP BY 1, 2
"""


# --------------------------------------------------------------------------
# q30 — cube (all grouping-set combinations)
# --------------------------------------------------------------------------

def q30_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(
            R(dec_sum("l_quantity"), 3).alias("total_qty"),
            F.count(F.lit(1)).alias("n_items"),
        )
        .select(
            F.col("l_returnflag").alias("returnflag"),
            F.col("l_linestatus").alias("linestatus"),
            "total_qty",
            "n_items",
        )
    )


_Q30_SQL = """
SELECT l_returnflag AS returnflag, l_linestatus AS linestatus,
       floor((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_qty,
       count(*) AS n_items
FROM lineitem
GROUP BY CUBE (l_returnflag, l_linestatus)
"""


# --------------------------------------------------------------------------
# q31 — unpivot (wide measures -> long key/value)
# --------------------------------------------------------------------------

def q31_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    wide = li.groupBy("l_returnflag").agg(
        R(dec_sum("l_quantity"), 3).alias("qty"),
        R(dec_sum("l_extendedprice"), 3).alias("price"),
        R(dec_sum("l_discount"), 3).alias("discount"),
    )
    return wide.unpivot(
        ids=["l_returnflag"],
        values=["qty", "price", "discount"],
        variableColumnName="measure",
        valueColumnName="amount",
    ).select(F.col("l_returnflag").alias("returnflag"), "measure", "amount")


_Q31_SQL = """
WITH wide AS (
  SELECT l_returnflag AS returnflag,
         floor((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS qty,
         floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS price,
         floor((CAST(sum(CAST(l_discount AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS discount
  FROM lineitem GROUP BY 1
)
SELECT returnflag, measure, amount
FROM wide UNPIVOT (amount FOR measure IN (qty, price, discount))
"""


# --------------------------------------------------------------------------
# q32 — set operations: INTERSECT / EXCEPT (distinct semantics)
# --------------------------------------------------------------------------

def q32_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = read_testdata(spark, sf_dir, "orders")
    y95 = o.filter(F.year("o_orderdate") == 1995).select(F.col("o_custkey").alias("custkey"))
    y96 = o.filter(F.year("o_orderdate") == 1996).select(F.col("o_custkey").alias("custkey"))
    y97f = (
        o.filter((F.year("o_orderdate") == 1997) & (F.col("o_orderstatus") == "F"))
        .select(F.col("o_custkey").alias("custkey"))
    )
    return y95.intersect(y96).exceptAll(y97f.distinct())


_Q32_SQL = """
SELECT o_custkey AS custkey FROM orders WHERE year(o_orderdate) = 1995
INTERSECT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1996
EXCEPT
SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1997 AND o_orderstatus = 'F'
"""


# --------------------------------------------------------------------------
# q33 — distinct aggregates
# --------------------------------------------------------------------------

def q33_distinct_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    return li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.countDistinct("l_suppkey").alias("n_suppliers"),
        R(F.sum_distinct(F.col("l_quantity").cast("decimal(28,6)")).cast("double"), 3).alias("sum_distinct_qty"),
        F.count(F.lit(1)).alias("n_items"),
    )


_Q33_SQL = """
SELECT l_returnflag AS returnflag,
       count(DISTINCT l_orderkey) AS n_orders,
       count(DISTINCT l_suppkey) AS n_suppliers,
       floor((CAST(sum(DISTINCT CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS sum_distinct_qty,
       count(*) AS n_items
FROM lineitem
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q34 — approximate aggregates (HLL / quantile sketch). Sketch
# algorithms differ across engines, so the raw estimates have no
# engine-independent oracle. The gate output is a VERIFIABLE CONTRACT
# instead: exact values (oracle-computable) plus booleans asserting the
# sketches landed within declared error bounds; the oracle computes the
# exact side and the same literal TRUEs. A sketch regression flips a
# boolean and fails the gate. pytest keeps the tighter quantitative pin
# vs exact q33.
# --------------------------------------------------------------------------

HLL_RSD = 0.02
HLL_TOL = 0.10       # 5x the declared rsd — deterministic sketch, wide margin
PCTL_TOL = 0.05      # relative tolerance for approx percentile vs exact


def q34_approx_aggs(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = read_testdata(spark, sf_dir, "lineitem")
    qs = F.array(F.lit(0.5), F.lit(0.99))
    # one non-distinct pass for every sketch + exact percentile: mixing
    # countDistinct with object-typed sketch aggregates forces an
    # Expand plan that re-feeds every row to every aggregate (measured
    # 12.5s -> <1s at sf0.01 after splitting)
    sketches = li.groupBy(F.col("l_returnflag").alias("returnflag")).agg(
        F.approx_count_distinct("l_orderkey", rsd=HLL_RSD).alias("__approx_orders"),
        F.percentile_approx("l_extendedprice", qs).alias("__ap"),
        F.percentile("l_extendedprice", qs).alias("__ep"),
    )
    # exact distinct via pre-aggregated pairs (two cheap hash aggs —
    # the map-side-combinable formulation of countDistinct)
    exact = (
        li.select(F.col("l_returnflag").alias("returnflag"), "l_orderkey")
        .distinct()
        .groupBy("returnflag")
        .agg(F.count(F.lit(1)).alias("exact_orders"))
    )
    within = lambda approx, ex, tol: F.abs(approx - ex) <= tol * F.abs(ex)  # noqa: E731
    return sketches.join(exact, on="returnflag").select(
        "returnflag",
        "exact_orders",
        R(F.col("__ep")[0], 3).alias("p50_price"),
        R(F.col("__ep")[1], 3).alias("p99_price"),
        within(
            F.col("__approx_orders").cast("double"), F.col("exact_orders"), HLL_TOL
        ).alias("orders_within_tol"),
        within(F.col("__ap")[0], F.col("__ep")[0], PCTL_TOL).alias("p50_within_tol"),
        within(F.col("__ap")[1], F.col("__ep")[1], PCTL_TOL).alias("p99_within_tol"),
    )


# --------------------------------------------------------------------------
# q80 — MERGEABLE distinct-count sketches (Apache DataSketches HLL).
# q34 proves approx_count_distinct's estimate; this proves the property
# that matters at 100 TB: sketches built per-partition-of-time (daily)
# and MERGED later give the same answer as sketching the raw union —
# i.e. you can keep a tiny daily rollup and still answer "distinct
# users this quarter" without rescanning a quarter of raw events.
# Same oracle contract as q34: exact values + within-tolerance booleans
# (the sketch is deterministic for fixed input, but its error is
# data-dependent — the boolean is the portable assertion).
# --------------------------------------------------------------------------

def q80_sketch_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_testdata(spark, sf_dir, "events")
    daily = e.groupBy(
        F.to_date("ts").alias("day"), "event_type"
    ).agg(F.hll_sketch_agg("user_id").alias("__sk"))
    merged = daily.groupBy("event_type").agg(
        F.hll_sketch_estimate(F.hll_union_agg("__sk")).alias("__merged_est"),
        F.count(F.lit(1)).alias("n_days"),
    )
    exact = (
        e.select("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("exact_users"))
    )
    within = F.abs(F.col("__merged_est").cast("double") - F.col("exact_users")) <= (
        HLL_TOL * F.col("exact_users")
    )
    return merged.join(exact, on="event_type").select(
        "event_type",
        "exact_users",
        "n_days",
        within.alias("merged_within_tol"),
    )


_Q80_SQL = """
SELECT event_type,
       count(DISTINCT user_id) AS exact_users,
       count(DISTINCT CAST(ts AS DATE)) AS n_days,
       TRUE AS merged_within_tol
FROM events
GROUP BY 1
"""


_Q34_SQL = """
SELECT l_returnflag AS returnflag,
       count(DISTINCT l_orderkey) AS exact_orders,
       floor((quantile_cont(l_extendedprice, 0.50)) * 1000.0 + 0.5) / 1000.0 AS p50_price,
       floor((quantile_cont(l_extendedprice, 0.99)) * 1000.0 + 0.5) / 1000.0 AS p99_price,
       TRUE AS orders_within_tol,
       TRUE AS p50_within_tol,
       TRUE AS p99_within_tol
FROM lineitem
GROUP BY 1
"""


# --------------------------------------------------------------------------
# q69 — window gauntlet: lead / ntile / percent_rank / cume_dist /
#        first_value / nth_value (the distribution + navigation half of
#        the window surface; q09 covers rank / dense_rank / lag / sums)
# --------------------------------------------------------------------------

def q69_window_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """All functions share one per-customer window over a TOTAL order
    (date, then orderkey) so ntile/cume_dist tie-handling is identical
    in any engine. One shuffle keyed o_custkey serves every function —
    Spark collapses same-window expressions into a single Window exec;
    at 100 TB this is one exchange + one per-partition sort, and
    customer keys are high-cardinality so the sort parallelizes."""
    from pyspark.sql import Window as W

    o = read_testdata(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wf = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    return o.select(
        F.col("o_custkey").alias("custkey"),
        F.col("o_orderkey").alias("orderkey"),
        R(F.col("o_totalprice"), 3).alias("price"),
        R(F.lead("o_totalprice", 1).over(w), 3).alias("next_price"),
        F.ntile(4).over(w).cast("int").alias("quartile"),
        R(F.percent_rank().over(w), 4).alias("pct_rank"),
        R(F.cume_dist().over(w), 4).alias("cume"),
        R(F.first("o_totalprice").over(wf), 3).alias("first_price"),
        R(F.nth_value("o_totalprice", 2).over(wf), 3).alias("second_price"),
    )


_Q69_SQL = """
SELECT o_custkey AS custkey,
       o_orderkey AS orderkey,
       floor((o_totalprice) * 1000.0 + 0.5) / 1000.0 AS price,
       floor((lead(o_totalprice, 1) OVER w) * 1000.0 + 0.5) / 1000.0 AS next_price,
       CAST(ntile(4) OVER w AS INTEGER) AS quartile,
       floor((percent_rank() OVER w) * 10000.0 + 0.5) / 10000.0 AS pct_rank,
       floor((cume_dist() OVER w) * 10000.0 + 0.5) / 10000.0 AS cume,
       floor((first_value(o_totalprice) OVER wf) * 1000.0 + 0.5) / 1000.0 AS first_price,
       floor((nth_value(o_totalprice, 2) OVER wf) * 1000.0 + 0.5) / 1000.0 AS second_price
FROM orders
WINDOW w  AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey),
       wf AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey
              ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
"""


# --------------------------------------------------------------------------
# q86 — explicit GROUPING SETS + grouping() flags. cube (q30) and
# rollup (q10) are the fixed lattices; arbitrary GROUPING SETS is the
# general form (only the aggregation levels a report actually needs —
# at scale that's the difference between 2^n Expand rows per input row
# and exactly the sets requested). Issued through the SQL surface;
# grouping(col) flags disambiguate "NULL because aggregated" from
# data NULLs, per set.
# --------------------------------------------------------------------------

def q86_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    read_testdata(spark, sf_dir, "orders").createOrReplaceTempView("__q86_orders")
    # NB: in Spark SQL a bare `1000.0` literal is DECIMAL (the
    # DataFrame API's lit(1000.0) is double) — the 1e3/5e-1 forms keep
    # the arithmetic in doubles to match the oracle's type.
    return spark.sql("""
        SELECT o_orderpriority,
               o_orderstatus,
               CAST(grouping(o_orderpriority) AS INT) AS g_priority,
               CAST(grouping(o_orderstatus) AS INT) AS g_status,
               count(*) AS n_orders,
               floor(sum(o_totalprice) * 1e3 + 5e-1) / 1e3 AS total_price
        FROM __q86_orders
        GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                                (o_orderpriority), ())
    """)


_Q86_SQL = """
SELECT o_orderpriority,
       o_orderstatus,
       CAST(grouping(o_orderpriority) AS INT) AS g_priority,
       CAST(grouping(o_orderstatus) AS INT) AS g_status,
       count(*) AS n_orders,
       floor(sum(o_totalprice) * 1000.0 + 0.5) / 1000.0 AS total_price
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority, o_orderstatus),
                        (o_orderpriority), ())
"""


# --------------------------------------------------------------------------
# q87 — blocked fuzzy matching (entity-resolution shape). All-pairs
# edit distance is quadratic; COMPOUND blocking (nation + name prefix)
# bounds each block's pair count, then levenshtein verifies within
# the block — identical distances in both engines. Blocking trades
# recall for tractability (a pair differing inside the prefix is
# never compared — here: candidates must share the first 15 chars, so
# matches differ only in the name's tail); production systems run
# SEVERAL blocking passes with different keys (prefix, suffix,
# phonetic) and union the candidates to recover recall. One pass is
# gated; the pass structure is the operator. Nation-only blocking
# measured 15.3 s at sf0.1 (4.5M distance evals); the compound key is
# ~20x tighter.
# --------------------------------------------------------------------------

FUZZY_MAX_DIST = 2
FUZZY_PREFIX = 15


def q87_fuzzy_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    c = read_testdata(spark, sf_dir, "customer").select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.substring("c_name", 1, FUZZY_PREFIX).alias("__blk"),
    )
    a = c.select(
        F.col("c_nationkey").alias("nation"),
        F.col("__blk"),
        F.col("c_custkey").alias("a_key"),
        F.col("c_name").alias("a_name"),
    )
    b = c.select(
        F.col("c_nationkey").alias("nation"),
        F.col("__blk"),
        F.col("c_custkey").alias("b_key"),
        F.col("c_name").alias("b_name"),
    )
    dist = F.levenshtein("a_name", "b_name")
    return (
        a.join(b, on=["nation", "__blk"])
        .filter(F.col("a_key") < F.col("b_key"))
        .filter(dist <= FUZZY_MAX_DIST)
        .select("nation", "a_key", "b_key", dist.alias("dist"))
    )


_Q87_SQL = f"""
SELECT a.c_nationkey AS nation,
       a.c_custkey AS a_key,
       b.c_custkey AS b_key,
       CAST(levenshtein(a.c_name, b.c_name) AS INT) AS dist
FROM customer a
JOIN customer b
  ON a.c_nationkey = b.c_nationkey
 AND substr(a.c_name, 1, {FUZZY_PREFIX}) = substr(b.c_name, 1, {FUZZY_PREFIX})
 AND a.c_custkey < b.c_custkey
WHERE levenshtein(a.c_name, b.c_name) <= {FUZZY_MAX_DIST}
"""


# --------------------------------------------------------------------------
# q122 — Z-order clustering key (multi-dimensional data-skipping layout)
# --------------------------------------------------------------------------

ZORDER_BITS = 16
ZORDER_SAMPLE_MOD = 97  # keep the gated output to ~1/97 of lineitem


def q122_zorder_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The Z-order clustering key the layout optimizer sorts by
    (operators/layout.py): bucket l_partkey and l_suppkey into 2^16
    ranks and interleave their bits. The key itself is pure integer
    math, so the oracle replicates it bit-for-bit; the physical
    data-skipping effect it exists for is measured in
    tests/test_scale.py (per-row-group min/max width contract)."""
    from nyc_etl_pipeline_spark.operators import layout

    li = read_testdata(spark, sf_dir, "lineitem")
    keyed = layout.zorder_key(li, "l_partkey", "l_suppkey", ZORDER_BITS)
    return keyed.filter(F.col("l_orderkey") % ZORDER_SAMPLE_MOD == 0).select(
        "l_orderkey", "l_linenumber", "l_partkey", "l_suppkey", "zkey"
    )


def _q122_sql() -> str:
    from nyc_etl_pipeline_spark.operators.layout import (
        sql_bucketize,
        sql_interleave_bits,
    )

    b1 = sql_bucketize(
        "l_partkey", "(SELECT min(l_partkey) FROM lineitem)",
        "(SELECT max(l_partkey) FROM lineitem)", ZORDER_BITS,
    )
    b2 = sql_bucketize(
        "l_suppkey", "(SELECT min(l_suppkey) FROM lineitem)",
        "(SELECT max(l_suppkey) FROM lineitem)", ZORDER_BITS,
    )
    return f"""
WITH keyed AS (
  SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
         {b1} AS b1, {b2} AS b2
  FROM lineitem
  WHERE l_orderkey % {ZORDER_SAMPLE_MOD} = 0
)
SELECT l_orderkey, l_linenumber, l_partkey, l_suppkey,
       {sql_interleave_bits("b1", "b2", ZORDER_BITS)} AS zkey
FROM keyed
"""


# --------------------------------------------------------------------------
# q129 — bucketed interval-overlap self-join (large-large interval join)
# --------------------------------------------------------------------------

INTERVAL_BUCKET_US = 600_000_000  # 600 s bands


def q129_interval_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Overlapping event intervals per user ([ts, ts + value seconds)),
    via the interval-banding equi-join (operators/joins.
    interval_overlap_pairs) — the large-large interval join shape that
    broadcast range joins can't serve. Integer microseconds end to
    end, so the overlap lengths are exact in both engines."""
    from nyc_etl_pipeline_spark.operators.joins import interval_overlap_pairs

    e = read_testdata(spark, sf_dir, "events")
    iv = e.select(
        "event_id",
        "user_id",
        F.unix_micros("ts").alias("s_us"),
        (F.unix_micros("ts") + F.floor(F.col("value") * 1000000.0).cast("bigint")).alias("e_us"),
    )
    return interval_overlap_pairs(
        iv, "event_id", "s_us", "e_us",
        key_cols=["user_id"], bucket_width=INTERVAL_BUCKET_US,
    )


_Q129_SQL = f"""
WITH iv AS (
  SELECT event_id, user_id, epoch_us(ts) AS s,
         epoch_us(ts) + CAST(floor(value * 1000000.0) AS BIGINT) AS e
  FROM events
  -- replicate interval_overlap_pairs' degenerate-interval drop: an
  -- empty interval (value < 1e-6 -> e == s) would still get one
  -- generate_series bucket here and emit phantom overlap=0 pairs
  -- against any interval spanning that instant (ADVICE r5)
  WHERE floor(value * 1000000.0) > 0
),
ex AS (
  SELECT *, unnest(generate_series(
      CAST(floor(s / {float(INTERVAL_BUCKET_US)}) AS BIGINT),
      CAST(floor(e / {float(INTERVAL_BUCKET_US)}) AS BIGINT))) AS bucket
  FROM iv
)
SELECT DISTINCT a.event_id AS a_id, b.event_id AS b_id, a.user_id,
       least(a.e, b.e) - greatest(a.s, b.s) AS overlap
FROM ex a
JOIN ex b ON a.user_id = b.user_id AND a.bucket = b.bucket
         AND a.event_id < b.event_id
WHERE a.s < b.e AND b.s < a.e
"""


# --------------------------------------------------------------------------
# q135 — fixed-grid histogram sketch quantiles (mergeable scale path)
# --------------------------------------------------------------------------

HIST_LO = 0.0
HIST_HI = 110592.0  # 512 bins x dyadic width 216.0 covers l_extendedprice
HIST_BINS = 512
HIST_W = (HIST_HI - HIST_LO) / HIST_BINS  # 216.0 exact in binary
HIST_PCTS = [50, 90, 95, 99]


def q135_hist_quantiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Quantile estimates for l_extendedprice from a fixed-grid
    histogram sketch (operators/sketches.hist_build/hist_quantiles) —
    the mergeable, one-pass, fixed-size alternative to the exact
    sort-based percentiles of q58. The emitted upper-edge estimates
    are fully deterministic (integer bin counts + fixed-order dyadic
    double arithmetic), so the gate is exact, and the <= one-bin-width
    error contract vs the true order statistic is pinned in
    tests/test_advanced_ops.py along with merge == direct parity."""
    from nyc_etl_pipeline_spark.operators.sketches import hist_build, hist_quantiles

    li = read_testdata(spark, sf_dir, "lineitem")
    h = hist_build(li, "l_extendedprice", HIST_LO, HIST_HI, HIST_BINS)
    return hist_quantiles(h, HIST_PCTS, HIST_LO, HIST_HI, HIST_BINS)


def _q135_sql() -> str:
    pcts = ", ".join(str(p) for p in HIST_PCTS)
    # constants injected as STRING-cast doubles ('<repr>' not <repr>):
    # a bare numeric literal is DECIMAL in DuckDB, and a future grid
    # retune to a constant with a >2^53 decimal mantissa would hit the
    # decimal->double 1-ulp conversion trap (functions/__init__); the
    # string path is strtod, correctly rounded for ANY constant
    lo, w = f"CAST('{HIST_LO!r}' AS DOUBLE)", f"CAST('{HIST_W!r}' AS DOUBLE)"
    return f"""
WITH h AS (
  SELECT least({HIST_BINS - 1}, greatest(0, CAST(floor(
           (CAST(l_extendedprice AS DOUBLE) - {lo}) / {w}) AS INTEGER))) AS bin,
         count(*) AS cnt
  FROM lineitem WHERE l_extendedprice IS NOT NULL GROUP BY 1
),
tot AS (SELECT sum(cnt) AS n_total FROM h),
cum AS (SELECT bin, sum(cnt) OVER (ORDER BY bin) AS cum FROM h),
p AS (SELECT unnest([{pcts}]) AS pct)
SELECT p.pct,
       {lo} + (min(c.bin) + 1) * {w} AS q_upper
FROM p CROSS JOIN tot t
JOIN cum c ON c.cum >= ceil((p.pct * t.n_total) / CAST(100 AS DOUBLE))
GROUP BY p.pct
"""


# --------------------------------------------------------------------------
# q143 — 2D Pareto skyline (revenue-efficiency frontier per part)
# --------------------------------------------------------------------------

def q143_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts on the (min total_qty, max revenue) Pareto frontier —
    most revenue from least volume shipped. Dominance compares the
    ROUNDED metrics on both engines (same convention as q61's rounded
    tie-break) so the surviving set is deterministic. Spark runs the
    grid-pruned O(n log n) `skyline_2d`; the oracle is the O(n^2)
    NOT-EXISTS dominance definition — hash equality proves the pruned
    plan exact."""
    from nyc_etl_pipeline_spark.operators.joins import skyline_2d

    li = read_testdata(spark, sf_dir, "lineitem")
    m = li.groupBy("l_partkey").agg(
        R(dec_sum("l_quantity"), 3).alias("total_qty"),
        R(dec_sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 3).alias(
            "revenue"
        ),
    )
    return skyline_2d(m, "total_qty", "revenue").select(
        F.col("l_partkey").alias("partkey"), "total_qty", "revenue"
    )


_Q143_SQL = """
WITH m AS (
  SELECT l_partkey AS partkey,
         floor((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS total_qty,
         floor((CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE)) * 1000.0 + 0.5) / 1000.0 AS revenue
  FROM lineitem
  GROUP BY 1
)
SELECT partkey, total_qty, revenue
FROM m a
WHERE NOT EXISTS (
  SELECT 1 FROM m b
  WHERE b.total_qty <= a.total_qty AND b.revenue >= a.revenue
    AND (b.total_qty < a.total_qty OR b.revenue > a.revenue)
)
"""


SPECS = [
    QuerySpec("q28_asof_join", q28_asof_join, _Q28_SQL,
              "as-of join (backward inclusive) via tagged-union window"),
    QuerySpec("q143_skyline", q143_skyline, _Q143_SQL,
              "2D Pareto skyline (grid-pruned exact plan vs NOT-EXISTS oracle)"),
    QuerySpec("q29_range_join", q29_range_join, _Q29_SQL,
              "non-equi range join, broadcast small side"),
    QuerySpec("q30_cube", q30_cube, _Q30_SQL, "cube grouping sets"),
    QuerySpec("q31_unpivot", q31_unpivot, _Q31_SQL, "unpivot wide->long"),
    QuerySpec("q32_set_ops", q32_set_ops, _Q32_SQL, "intersect + except"),
    QuerySpec("q33_distinct_aggs", q33_distinct_aggs, _Q33_SQL,
              "multiple distinct aggregates"),
    QuerySpec("q34_approx_aggs", q34_approx_aggs, _Q34_SQL,
              "HLL distinct + quantile sketches (error-bound contract, oracle-checked)"),
    QuerySpec("q80_sketch_rollup", q80_sketch_rollup, _Q80_SQL,
              "mergeable DataSketches HLL rollup (daily sketches -> merged estimate)"),
    QuerySpec("q86_grouping_sets", q86_grouping_sets, _Q86_SQL,
              "explicit GROUPING SETS with grouping() flags (SQL surface)"),
    QuerySpec("q87_fuzzy_pairs", q87_fuzzy_pairs, _Q87_SQL,
              "blocked fuzzy matching via levenshtein (entity resolution)"),
    QuerySpec("q69_window_gauntlet", q69_window_gauntlet, _Q69_SQL,
              "window gauntlet: lead/ntile/percent_rank/cume_dist/nth_value"),
    QuerySpec("q122_zorder_key", q122_zorder_key, _q122_sql(),
              "Z-order clustering key (Morton interleave of rank buckets)"),
    QuerySpec("q129_interval_overlap", q129_interval_overlap, _Q129_SQL,
              "bucketed interval-overlap self-join (large-large intervals)"),
    QuerySpec("q135_hist_quantiles", q135_hist_quantiles, _q135_sql(),
              "fixed-grid histogram sketch quantiles (mergeable, one pass)"),
]
