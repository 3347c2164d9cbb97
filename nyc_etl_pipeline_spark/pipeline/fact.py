"""Gold layer: star-schema fact build + watermark incremental load.

Reference: assets/gold.py:256-347 (insert_fact_table) and :56-65
(get_latest_time_pickup_dw). Differences, all documented:

- union of green/yellow silver is by name (Q3 fix; the reference's
  positional union at gold.py:273 would throw on its own yellow schema
  — Q2).
- date-dim join keys: the reference derives (day, month, year) triples
  and joins on a composite key (gold.py:280-309). We join on a single
  ``to_date(ts)`` key — same matched set, one comparison, and the date
  dim is broadcast. The inner join drops trips outside the dim's year
  exactly like the reference (Q10 — its de-facto outlier filter).
- surrogate ID: ``monotonically_increasing_id`` stands in for the
  MySQL autoincrement (Q7 — it is only ever counted, never joined).
"""

from __future__ import annotations

import datetime

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Watermark default when the fact table is empty (gold.py:60).
WATERMARK_EPOCH = datetime.datetime(2000, 1, 1)

_MEASURES = [
    "passenger_count",
    "trip_distance",
    "trip_duration",
    "fare_amount",
    "tip_amount",
    "tolls_amount",
    "total_amount",
    "airport_fee",
    "total_surcharges",
]


def latest_pickup_watermark(fact: DataFrame | None, dim_date: DataFrame) -> datetime.datetime:
    """Max pickup date already in the warehouse, else 2000-01-01.

    Reference gold.py:56-65: join fact.date_puID -> dim_date.dateID and
    take max(date). The join is broadcast (dim_date = 365 rows); the
    aggregate is a partial/final max — no full shuffle.
    """
    if fact is None:
        return WATERMARK_EPOCH
    joined = fact.select("date_puID").join(
        F.broadcast(dim_date.select("dateID", "date")),
        fact["date_puID"] == dim_date["dateID"],
        "inner",
    )
    row = joined.agg(F.max("date").alias("mx")).first()
    if row is None or row["mx"] is None:
        return WATERMARK_EPOCH
    mx = row["mx"]
    if isinstance(mx, datetime.datetime):
        return mx
    return datetime.datetime.combine(mx, datetime.time())


def build_fact(
    trips: DataFrame,
    dim_date: DataFrame,
    dim_type: DataFrame,
    watermark: datetime.datetime | None = None,
) -> DataFrame:
    """Unified silver trips -> fact_nyc rows (FACT_NYC schema).

    ``trips`` should already be the by-name union of all taxi colors.
    Rows at or before ``watermark`` are excluded (P6, gold.py:278);
    rows whose pickup/dropoff date is missing from ``dim_date`` are
    dropped by the inner joins (Q10).
    """
    df = trips
    if watermark is not None:
        df = df.filter(F.col("pickup_datetime") > F.lit(watermark))

    pu = F.broadcast(
        dim_date.select(F.col("dateID").alias("date_puID"), F.col("date").alias("__pu_date"))
    )
    do = F.broadcast(
        dim_date.select(F.col("dateID").alias("date_doID"), F.col("date").alias("__do_date"))
    )
    df = (
        df.withColumn("__pu_date", F.to_date("pickup_datetime"))
        .withColumn("__do_date", F.to_date("dropoff_datetime"))
        .join(pu, on="__pu_date", how="inner")
        .join(do, on="__do_date", how="inner")
        .join(
            F.broadcast(dim_type),
            F.col("taxi_type") == F.col("typeName"),
            "inner",
        )
    )
    return df.select(
        F.monotonically_increasing_id().alias("ID"),
        "PULocationID",
        "DOLocationID",
        "typeID",
        "VendorID",
        "date_puID",
        "date_doID",
        F.col("RatecodeID").cast("int").alias("RatecodeID"),
        F.col("payment_type").cast("int").alias("paymentID"),
        F.col("passenger_count").cast("int").alias("passenger_count"),
        "trip_distance",
        F.col("trip_duration").cast("double").alias("trip_duration"),
        "fare_amount",
        "tip_amount",
        "tolls_amount",
        "total_amount",
        "airport_fee",
        "total_surcharges",
    ).na.fill(0)
