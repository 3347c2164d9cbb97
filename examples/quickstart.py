"""Quickstart: the reference NYC pipeline, on this engine.

    python examples/quickstart.py [green_dir] [zone_csv] [warehouse]

Runs raw green taxi parquet through silver -> dims -> fact ->
monthly/weekly reports into a Parquet lakehouse, then answers a
question over the result via both the DataFrame API and SQL.
Defaults to the reference repo's bundled 2023 data.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark import get_spark
from nyc_etl_pipeline_spark.engine import Engine
from nyc_etl_pipeline_spark.sql import register_warehouse_views

green_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/reference/data/green_data"
zone_csv = sys.argv[2] if len(sys.argv) > 2 else "/root/reference/data/taxi_zone.csv"
warehouse = sys.argv[3] if len(sys.argv) > 3 else "/tmp/nyc_quickstart_wh"

spark = get_spark(app_name="nyc-quickstart")

eng = Engine(spark, warehouse)
eng.run_all(green_dir=green_dir, zone_csv=zone_csv)

monthly = eng.wh.read("monthly_report")
print("\nTop pickup boroughs by total fares (DataFrame API):")
(
    monthly.groupBy("PU_Borough")
    .agg(F.round(F.sum("total_fare_amount"), 0).alias("fares"))
    .orderBy(F.col("fares").desc())
    .show(7, truncate=False)
)

register_warehouse_views(spark, eng.wh)
print("Busiest weekdays (SQL):")
spark.sql(
    """
    SELECT dayOfWeek_pu, sum(total_trips) AS trips
    FROM weekly_report
    GROUP BY 1 ORDER BY trips DESC
    """
).show(7, truncate=False)
