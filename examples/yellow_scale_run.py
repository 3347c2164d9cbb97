"""Yellow-taxi scale e2e: the reference's documented crash case.

Reference README.md:162 reports its platinum layer CRASHES on yellow
taxi volume (~3M rows/month; the repo's yellow files are absent —
.MISSING_LARGE_BLOBS). This script synthesizes 12 months of
real-schema yellow data at that shape with Spark itself (distributed
range -> column exprs, no driver materialization), then runs the full
Engine pipeline — silver, dims, fact, reports — and prints per-layer
runtimes and row counts.

The synthetic data deliberately carries the real files' pathologies:
NULL passenger_count/RatecodeID/congestion fields (TLC post-2019
files), out-of-year stray timestamps (2008/2022 rows observed in the
real green files), exact duplicate rows, store_and_fwd flags, and a
sentinel payment_type 0.

Usage:
    python examples/yellow_scale_run.py [rows_per_month] [n_months]
Defaults: 3_000_000 x 12 (the reference's crash shape).
"""

from __future__ import annotations

import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark import get_spark
from nyc_etl_pipeline_spark.engine import Engine


def synth_yellow_month(
    spark: SparkSession, year: int, month: int, n_rows: int, seed: int = 7
) -> DataFrame:
    """One month of YELLOW_RAW-schema rows, generated executor-side.

    Everything derives from a hash of (id, seed): deterministic,
    reproducible, no Python UDFs, no driver loop — generation is as
    distributed as the pipeline under test.
    """
    h = lambda k: F.abs(F.xxhash64(F.col("id"), F.lit(seed), F.lit(k)))  # noqa: E731
    month_start = F.to_timestamp(F.lit(f"{year}-{month:02d}-01"))
    next_month = F.add_months(F.to_date(month_start), 1).cast("timestamp")
    month_secs = next_month.cast("long") - month_start.cast("long")

    df = spark.range(n_rows)
    pickup = F.timestamp_seconds(month_start.cast("long") + h("pu") % month_secs)
    # ~0.02% strays far outside the dim year (real TLC files have them;
    # the date-dim inner join must drop these, not crash)
    pickup = F.when(h("stray") % 5000 == 0, F.to_timestamp(F.lit("2008-12-31 23:59:59"))).otherwise(
        pickup
    )
    duration_s = 60 + h("dur") % 5400  # 1-91 min
    fare = (F.lit(3.0) + (h("fare") % 7000) / 100.0).cast("double")
    tip = (h("tip") % 2000 / 100.0).cast("double")
    tolls = F.when(h("toll") % 20 == 0, F.lit(6.55)).otherwise(F.lit(0.0))
    extra = F.when(h("extra") % 2 == 0, F.lit(0.5)).otherwise(F.lit(0.0))
    congestion = F.when(h("cong") % 10 == 0, F.lit(None).cast("double")).otherwise(F.lit(2.5))
    airport = F.when(h("apt") % 50 == 0, F.lit(1.75)).otherwise(F.lit(0.0))
    return df.select(
        (1 + h("vendor") % 2).alias("VendorID"),
        pickup.alias("tpep_pickup_datetime"),
        F.timestamp_seconds(pickup.cast("long") + duration_s).alias("tpep_dropoff_datetime"),
        F.when(h("saf") % 100 == 0, F.lit("Y")).otherwise(F.lit("N")).alias("store_and_fwd_flag"),
        # ~3% NULL RatecodeID (real post-2019 files)
        F.when(h("rate_n") % 33 == 0, F.lit(None).cast("double"))
        .otherwise((1 + h("rate") % 6).cast("double"))
        .alias("RatecodeID"),
        (1 + h("pu_loc") % 265).alias("PULocationID"),
        (1 + h("do_loc") % 265).alias("DOLocationID"),
        F.when(h("pass_n") % 25 == 0, F.lit(None).cast("double"))
        .otherwise((1 + h("pass") % 4).cast("double"))
        .alias("passenger_count"),
        ((h("dist") % 3000) / 100.0).cast("double").alias("trip_distance"),
        fare.alias("fare_amount"),
        extra.alias("extra"),
        F.lit(0.5).alias("mta_tax"),
        tip.alias("tip_amount"),
        tolls.alias("tolls_amount"),
        F.lit(1.0).alias("improvement_surcharge"),
        (fare + extra + F.lit(0.5) + tip + tolls + F.lit(1.0)).alias("total_amount"),
        (h("pay") % 6).cast("double").alias("payment_type"),
        congestion.alias("congestion_surcharge"),
        airport.alias("airport_fee"),
    )


def synth_yellow_year(
    spark: SparkSession, out_dir: str, year: int, rows_per_month: int, months: int = 12
) -> None:
    os.makedirs(out_dir, exist_ok=True)
    for m in range(1, months + 1):
        df = synth_yellow_month(spark, year, m, rows_per_month)
        # ~0.1% exact duplicates appended (re-delivery artifacts)
        dups = df.limit(max(1, rows_per_month // 1000))
        df.unionAll(dups).write.mode("overwrite").parquet(
            os.path.join(out_dir, f"{year}-{m:02d}.parquet")
        )


def main() -> None:
    rows_per_month = int(sys.argv[1]) if len(sys.argv) > 1 else 3_000_000
    months = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    spark = get_spark(
        app_name="yellow-scale-e2e",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    work = tempfile.mkdtemp(prefix="yellow_scale_")
    raw_dir = os.path.join(work, "yellow_raw")
    wh = os.path.join(work, "wh")
    zone_csv = "/root/reference/data/taxi_zone.csv"
    try:
        t0 = time.perf_counter()
        synth_yellow_year(spark, raw_dir, 2023, rows_per_month, months)
        t_synth = time.perf_counter() - t0
        print(f"synth: {months} x {rows_per_month:,} rows in {t_synth:.1f}s")

        eng = Engine(spark, wh)
        times = {}
        for layer, fn in (
            ("silver", lambda: eng.run_silver(yellow_dir=raw_dir)),
            ("dims", lambda: eng.run_dims(zone_csv=zone_csv if os.path.exists(zone_csv) else None)),
            ("fact", lambda: eng.run_fact(incremental=True)),
            ("reports", lambda: eng.run_reports() if eng.wh.exists("dim_zone") else None),
        ):
            t0 = time.perf_counter()
            fn()
            times[layer] = time.perf_counter() - t0
            print(f"{layer}: {times[layer]:.1f}s")

        n_silver = eng.wh.read("trips_silver").count()
        n_fact = eng.wh.read("fact_nyc").count()
        print(f"trips_silver: {n_silver:,} rows")
        print(f"fact_nyc:     {n_fact:,} rows")
        for t in ("monthly_report", "weekly_report"):
            if eng.wh.exists(t):
                print(f"{t}: {eng.wh.read(t).count():,} rows")
        total = sum(times.values())
        print(
            f"TOTAL pipeline: {total:.1f}s over {months * rows_per_month:,} raw rows "
            f"({months * rows_per_month / max(total, 0.001) / 1e6:.2f}M rows/s)"
        )
        assert n_fact > 0.9 * months * rows_per_month, "fact lost too many rows"
    finally:
        shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
