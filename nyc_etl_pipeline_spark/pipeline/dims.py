"""Dimension builds and incremental upsert.

Replaces the reference's MySQL-seeded dimensions + per-dim Dagster
assets (Databases/create_datamart.sql, assets/gold.py:77-239) with
Spark-generated DataFrames and ONE generic upsert.

The reference's "find new dim keys" pattern is a hand-rolled left-anti
join: right-outer join old->new then ``where(old.key.isNull())``
(gold.py:93-94/153-154/211-213, SURVEY J3). Here it IS a left-anti
join, with the same downstream semantics kept: new keys get default
names (Q5, gold.py:101/160/218), key 0 (null-coerced sentinel, Q4) is
dropped from dims (gold.py:104/163/220) except dim_payment which seeds
0 = 'Flex Fare trip' (create_datamart.sql:117).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_csv
from nyc_etl_pipeline_spark.schemas import TAXI_ZONE


def build_date_dim(spark: SparkSession, start: str = "2023-01-01", end: str = "2023-12-31") -> DataFrame:
    """One row per day of [start, end] — replaces the MySQL stored
    procedure (create_datamart.sql:45-91) with pure Spark functions.

    dateID is days-since-start + 1, matching the stored procedure's
    autoincrement insert order. 'Weekday' is 1 for Sat/Sun else 0
    (sic — the reference column marks weekends; name kept for parity).
    """
    days = (
        spark.range(1)
        .select(
            F.explode(
                F.sequence(F.lit(start).cast("date"), F.lit(end).cast("date"))
            ).alias("date")
        )
    )
    return days.select(
        (F.datediff("date", F.lit(start).cast("date")) + 1).cast("int").alias("dateID"),
        F.col("date"),
        F.date_format("date", "yyyy-MM-dd").alias("dateStr"),
        F.dayofmonth("date").cast("int").alias("day"),
        F.month("date").cast("int").alias("month"),
        F.concat(F.lit("Q"), F.quarter("date").cast("string")).alias("quarter"),
        F.year("date").cast("int").alias("year"),
        F.dayofmonth("date").cast("int").alias("dayOfMonth"),
        F.date_format("date", "EEEE").alias("dayOfWeek"),
        F.weekofyear("date").cast("int").alias("weekOfYear"),
        F.when(F.dayofweek("date").isin(1, 7), F.lit(1)).otherwise(F.lit(0)).alias("Weekday"),
    )


def seed_vendor_dim(spark: SparkSession) -> DataFrame:
    """create_datamart.sql:5-13 seed rows."""
    return spark.createDataFrame(
        [(1, "Creative Mobile Technologies, LLC"), (2, "VeriFone Inc.")],
        "VendorID long, VendorName string",
    )


def seed_rate_dim(spark: SparkSession) -> DataFrame:
    """create_datamart.sql:93-106 seed rows."""
    rows = [
        (1, "Standard rate"),
        (2, "JFK"),
        (3, "Newark"),
        (4, "Nassau or Westchester"),
        (5, "Negotiated fare"),
        (6, "Group ride"),
        (99, "Unknown"),
    ]
    return spark.createDataFrame(rows, "RatecodeID int, RatecodeName string")


def seed_payment_dim(spark: SparkSession) -> DataFrame:
    """create_datamart.sql:110-123 seed rows (0 = Flex Fare trip)."""
    rows = [
        (0, "Flex Fare trip"),
        (1, "Credit card"),
        (2, "Cash"),
        (3, "No charge"),
        (4, "Dispute"),
        (5, "Unknown"),
        (6, "Voided trip"),
    ]
    return spark.createDataFrame(rows, "paymentID int, payment_type string")


def seed_type_dim(spark: SparkSession) -> DataFrame:
    """create_datamart.sql:125-133 seed rows."""
    return spark.createDataFrame(
        [(1, "Green"), (2, "Yellow")], "typeID int, typeName string"
    )


def zone_dim(spark: SparkSession, csv_path: str) -> DataFrame:
    """dim_pu_location / dim_do_location from taxi_zone.csv
    (create_datamart.sql:136-162; one dim, two role-playing joins)."""
    return read_csv(spark, csv_path, TAXI_ZONE)


def dim_candidates(trips: list[DataFrame], key: str) -> DataFrame:
    """Distinct key values across silver tables (gold.py:84-87 etc.),
    union by NAME (Q3 fix) and deduped. Sort is dropped — the
    reference's pre-insert ``.sort()`` (gold.py:87) orders rows into an
    unordered table, a no-op we don't pay a shuffle for."""
    out = None
    for df in trips:
        part = df.select(key).dropDuplicates()
        out = part if out is None else out.unionByName(part)
    return out.dropDuplicates()


def upsert_dim(
    existing: DataFrame,
    candidates: DataFrame,
    key: str,
    name_col: str,
    default_name: str,
    drop_sentinel: bool = True,
) -> DataFrame:
    """Return existing dim + rows for unseen keys with default names.

    Reference pattern J3+P17+P15+P5 (gold.py:77-123): append-only, no
    SCD — existing rows are never updated (Q5). ``drop_sentinel``
    removes key==0 rows (Q4) as gold.py:104 does; dim_payment callers
    pass False since 0 is a real seeded key.

    ``candidates`` is expected to be small (distinct keys); the
    left-anti join broadcasts ``existing`` when Catalyst sees its size.
    """
    new_keys = candidates.join(existing, on=key, how="left_anti")
    if drop_sentinel:
        new_keys = new_keys.filter(F.col(key) != 0)
    new_rows = new_keys.select(
        F.col(key), F.lit(default_name).alias(name_col)
    )
    return existing.unionByName(new_rows)
