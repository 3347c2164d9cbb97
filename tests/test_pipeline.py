"""End-to-end + per-layer tests of the NYC pipeline semantics
(SURVEY §2 operator families S/P/J/U/A and quirks Q1-Q10)."""

import datetime

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.pipeline import (
    build_date_dim,
    build_fact,
    clean_trips,
    latest_pickup_watermark,
    monthly_report,
    seed_payment_dim,
    seed_rate_dim,
    seed_type_dim,
    seed_vendor_dim,
    upsert_dim,
    weekly_report,
    zone_dim,
)
from nyc_etl_pipeline_spark.schemas import TRIPS_SILVER


def test_clean_trips_green(spark, green_raw):
    out = clean_trips(green_raw, "Green")
    rows = out.collect()
    # 9 raw rows: -1 duplicate, -2 null datetimes => 6
    assert len(rows) == 6
    assert [(f.name, f.dataType) for f in out.schema.fields] == [
        (f.name, f.dataType) for f in TRIPS_SILVER.fields
    ]
    by_vendor = {r["VendorID"]: r for r in rows if r["VendorID"] in (1, 6)}
    assert by_vendor[1]["trip_duration"] == 30 * 60  # Q1: true seconds
    # null IDs coerced to 0 (Q4)
    nulls = [r for r in rows if r["RatecodeID"] == 0]
    assert len(nulls) == 1 and nulls[0]["passenger_count"] == 0 and nulls[0]["payment_type"] == 0
    # null surcharge component nulls the sum, then fillna -> 0
    cong_null = [r for r in rows if r["total_surcharges"] == 0.0]
    assert len(cong_null) >= 1
    # green airport_fee is lit 0.0
    assert all(r["airport_fee"] == 0.0 for r in rows)
    assert all(r["taxi_type"] == "Green" for r in rows)


def test_clean_trips_yellow_schema_matches_green(spark, green_raw, yellow_raw):
    g = clean_trips(green_raw, "Green")
    y = clean_trips(yellow_raw, "Yellow")
    # Q2 fix: identical schema -> unionByName works
    assert g.schema == y.schema
    u = g.unionByName(y)
    assert u.count() == 8
    yrows = {r["VendorID"]: r for r in y.collect()}
    assert yrows[1]["airport_fee"] == 1.25
    assert yrows[2]["airport_fee"] == 0.0  # null -> 0


def test_date_dim(spark):
    dd = build_date_dim(spark, "2023-01-01", "2023-12-31")
    rows = dd.collect()
    assert len(rows) == 365
    first = rows[0]
    assert first["dateID"] == 1 and first["dateStr"] == "2023-01-01"
    assert first["dayOfWeek"] == "Sunday" and first["Weekday"] == 1
    assert first["quarter"] == "Q1"
    jul4 = [r for r in rows if r["dateStr"] == "2023-07-04"][0]
    assert jul4["quarter"] == "Q3" and jul4["Weekday"] == 0
    assert jul4["weekOfYear"] == 27


def test_upsert_dim_adds_unseen_vendor_with_default(spark, green_raw, yellow_raw):
    g = clean_trips(green_raw, "Green")
    y = clean_trips(yellow_raw, "Yellow")
    from nyc_etl_pipeline_spark.pipeline.dims import dim_candidates

    cands = dim_candidates([g, y], "VendorID")
    dim = upsert_dim(seed_vendor_dim(spark), cands, "VendorID", "VendorName", "Unknown Vendor")
    got = {r["VendorID"]: r["VendorName"] for r in dim.collect()}
    assert got[1] == "Creative Mobile Technologies, LLC"  # Q5: never updated
    assert got[6] == "Unknown Vendor"  # new key, default name
    assert 0 not in got  # sentinel dropped (Q4)


def test_watermark_default_and_probe(spark, green_raw):
    dd = build_date_dim(spark, "2023-01-01", "2023-12-31")
    assert latest_pickup_watermark(None, dd) == datetime.datetime(2000, 1, 1)
    g = clean_trips(green_raw, "Green")
    fact = build_fact(g, dd, seed_type_dim(spark))
    wm = latest_pickup_watermark(fact, dd)
    assert wm.date() == datetime.date(2023, 3, 1)


def test_build_fact_drops_out_of_dim_dates(spark, green_raw):
    dd = build_date_dim(spark, "2023-01-01", "2023-12-31")
    g = clean_trips(green_raw, "Green")
    fact = build_fact(g, dd, seed_type_dim(spark))
    rows = fact.collect()
    # 6 silver rows, minus the 2008 trip (Q10 inner-join row loss)
    assert len(rows) == 5
    assert len({r["ID"] for r in rows}) == 5  # surrogate IDs unique


def test_build_fact_incremental_watermark(spark, green_raw):
    dd = build_date_dim(spark, "2023-01-01", "2023-12-31")
    g = clean_trips(green_raw, "Green")
    wm = datetime.datetime(2023, 2, 1)
    fact = build_fact(g, dd, seed_type_dim(spark), watermark=wm)
    dates = {r["date_puID"] for r in fact.collect()}
    # only Feb 10 + Mar 1 trips pass the watermark filter (P6)
    assert len(dates) == 2


def test_reports_end_to_end(spark, green_raw, yellow_raw, zone_csv):
    dd = build_date_dim(spark, "2023-01-01", "2023-12-31")
    trips = clean_trips(green_raw, "Green").unionByName(clean_trips(yellow_raw, "Yellow"))
    fact = build_fact(trips, dd, seed_type_dim(spark))
    zone = zone_dim(spark, zone_csv)
    vendors = upsert_dim(
        seed_vendor_dim(spark),
        trips.select("VendorID").dropDuplicates(),
        "VendorID",
        "VendorName",
        "Unknown Vendor",
    )
    m = monthly_report(
        fact, dd, zone, seed_type_dim(spark), vendors, seed_payment_dim(spark), seed_rate_dim(spark)
    )
    rows = m.collect()
    # 7 fact rows: the RatecodeID=0 row has no dim_rate entry -> dropped
    # by the inner join (Q4); the two Jan-05 vendor-2 green trips share
    # every grouping key -> one group of 2. Remaining rows are singleton
    # groups: 7 - 1 (Q4) - 1 (collapsed pair) = 5 report rows.
    assert len(rows) == 5
    assert sum(r["total_trips"] for r in rows) == 6
    jan = [r for r in rows if r["month_pu"] == 1 and r["typeName"] == "Green"]
    assert len(jan) == 1
    assert jan[0]["total_trips"] == 2
    assert round(jan[0]["avg_trip_duration"], 3) == 15.0  # minutes (Q1 fixed)

    w = weekly_report(
        fact, dd, zone, seed_type_dim(spark), vendors, seed_payment_dim(spark), seed_rate_dim(spark)
    )
    wrows = w.collect()
    assert len(wrows) == 5
    assert {r["dayOfWeek_pu"] for r in wrows} <= {
        "Monday",
        "Tuesday",
        "Wednesday",
        "Thursday",
        "Friday",
        "Saturday",
        "Sunday",
    }


def test_idempotent_partition_overwrite(spark, green_raw, tmp_path):
    """Q6 fix: re-writing a month replaces it instead of duplicating."""
    from nyc_etl_pipeline_spark.io import Warehouse

    wh = Warehouse(spark, str(tmp_path))
    g = clean_trips(green_raw, "Green").withColumn(
        "month", F.month("pickup_datetime")
    )
    wh.overwrite_partitions(g, "trips_silver", ["month"])
    n1 = wh.read("trips_silver").count()
    wh.overwrite_partitions(g.filter(F.col("month") == 1), "trips_silver", ["month"])
    n2 = wh.read("trips_silver").count()
    assert n1 == n2 == 6
