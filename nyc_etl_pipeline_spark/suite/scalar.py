"""Scalar-surface suite: correlated subqueries (Catalyst
decorrelation) and wide string/date function gauntlets — broad
coverage of the scalar-function library under oracle parity."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.suite import QuerySpec


def q38_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts priced above their type's average — written as a
    correlated scalar subquery; Catalyst decorrelates it into an
    aggregate + join (no per-row execution). Same SQL runs on both
    engines."""
    read_testdata(spark, sf_dir, "part").createOrReplaceTempView("part")
    return spark.sql("""
        SELECT p_partkey AS partkey, p_type AS type,
               floor(p_retailprice * 1e3 + 0.5) / 1e3 AS price
        FROM part p
        WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                               WHERE p2.p_type = p.p_type)
    """)


_Q38_SQL = """
SELECT p_partkey AS partkey, p_type AS type,
       floor(p_retailprice * 1000.0 + 0.5) / 1000.0 AS price
FROM part p
WHERE p_retailprice > (SELECT avg(p2.p_retailprice) FROM part p2
                       WHERE p2.p_type = p.p_type)
"""


def q39_string_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide string-function pass over part names (SURVEY §2.2: the
    engine inherits the full function library; this pins a broad
    sample under oracle parity)."""
    p = read_testdata(spark, sf_dir, "part")
    name = F.col("p_name")
    return p.select(
        F.col("p_partkey").alias("partkey"),
        F.upper(name).alias("upper_name"),
        F.lower(F.col("p_brand")).alias("lower_brand"),
        F.length(name).cast("bigint").alias("name_len"),
        F.substring(name, 1, 5).alias("name_prefix"),
        F.concat_ws("|", name, F.col("p_brand")).alias("name_brand"),
        F.regexp_replace(name, "[aeiou]", "_").alias("devoweled"),
        F.lpad(F.col("p_partkey").cast("string"), 8, "0").alias("padded_key"),
        F.reverse(F.col("p_brand")).alias("brand_rev"),
        F.split(name, " ").getItem(0).alias("first_word"),
        F.instr(name, "a").cast("bigint").alias("first_a"),
        F.translate(F.col("p_brand"), "#", "-").alias("brand_dash"),
        F.trim(F.concat(F.lit("  "), name, F.lit("  "))).alias("retrimmed"),
    )


_Q39_SQL = """
SELECT p_partkey AS partkey,
       upper(p_name) AS upper_name,
       lower(p_brand) AS lower_brand,
       CAST(length(p_name) AS BIGINT) AS name_len,
       substring(p_name, 1, 5) AS name_prefix,
       concat_ws('|', p_name, p_brand) AS name_brand,
       regexp_replace(p_name, '[aeiou]', '_', 'g') AS devoweled,
       lpad(CAST(p_partkey AS VARCHAR), 8, '0') AS padded_key,
       reverse(p_brand) AS brand_rev,
       string_split(p_name, ' ')[1] AS first_word,
       CAST(instr(p_name, 'a') AS BIGINT) AS first_a,
       translate(p_brand, '#', '-') AS brand_dash,
       trim('  ' || p_name || '  ') AS retrimmed
FROM part
"""


def q40_datetime_gauntlet(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time function pass over order dates: truncation, parts,
    arithmetic, boundaries, formatting. DATE-typed results are emitted
    as ISO strings in BOTH engines — Spark surfaces datetime.date while
    DuckDB surfaces pandas Timestamps, which hash differently."""
    o = read_testdata(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        F.col("o_orderkey").alias("orderkey"),
        F.date_format(d, "yyyy-MM-dd").alias("order_date"),
        F.year(d).cast("int").alias("y"),
        F.quarter(d).cast("int").alias("q"),
        F.month(d).cast("int").alias("m"),
        F.dayofmonth(d).cast("int").alias("dom"),
        F.dayofyear(d).cast("int").alias("doy"),
        F.hour(d).cast("int").alias("h"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_format(F.last_day(d), "yyyy-MM-dd").alias("month_end"),
        F.date_format(F.date_add(F.to_date(d), 30), "yyyy-MM-dd").alias("due_date"),
        F.date_format(F.add_months(F.to_date(d), 3), "yyyy-MM-dd").alias("q_later"),
        F.datediff(F.lit("1999-01-01").cast("date"), F.to_date(d)).cast("bigint").alias("days_to_1999"),
        F.date_format(d, "yyyy-MM").alias("ym_str"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


_Q40_SQL = """
SELECT o_orderkey AS orderkey,
       strftime(CAST(o_orderdate AS DATE), '%Y-%m-%d') AS order_date,
       CAST(year(o_orderdate) AS INTEGER) AS y,
       CAST(quarter(o_orderdate) AS INTEGER) AS q,
       CAST(month(o_orderdate) AS INTEGER) AS m,
       CAST(dayofmonth(o_orderdate) AS INTEGER) AS dom,
       CAST(dayofyear(o_orderdate) AS INTEGER) AS doy,
       CAST(hour(o_orderdate) AS INTEGER) AS h,
       date_trunc('month', o_orderdate) AS month_start,
       strftime(last_day(CAST(o_orderdate AS DATE)), '%Y-%m-%d') AS month_end,
       strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE), '%Y-%m-%d') AS due_date,
       strftime(CAST(CAST(o_orderdate AS DATE) + INTERVAL 3 MONTH AS DATE), '%Y-%m-%d') AS q_later,
       CAST(date_diff('day', CAST(o_orderdate AS DATE), DATE '1999-01-01') AS BIGINT) AS days_to_1999,
       strftime(o_orderdate, '%Y-%m') AS ym_str,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
"""


SPECS = [
    QuerySpec("q38_correlated_subquery", q38_correlated_subquery, _Q38_SQL,
              "correlated scalar subquery (Catalyst decorrelation)"),
    QuerySpec("q39_string_gauntlet", q39_string_gauntlet, _Q39_SQL,
              "wide string-function parity pass"),
    QuerySpec("q40_datetime_gauntlet", q40_datetime_gauntlet, _Q40_SQL,
              "wide date/time-function parity pass"),
]
