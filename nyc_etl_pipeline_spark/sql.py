"""SQL surface: every engine capability reachable via spark.sql too.

Catalyst produces the same plan for equivalent DataFrame and SQL
declarations, so registering the lakehouse/testdata tables as views
gives the full query surface for free. Tests assert DataFrame/SQL
result equality for the flagship shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.schemas import TESTDATA

TESTDATA_TABLES = list(TESTDATA)


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    """One temp view per driver testdata table (ns-timestamp handling
    included via read_testdata)."""
    for name in TESTDATA_TABLES:
        read_testdata(spark, sf_dir, name).createOrReplaceTempView(name)


def register_warehouse_views(spark: SparkSession, warehouse) -> None:
    """Temp view per existing Parquet table in a Warehouse."""
    import os

    for entry in sorted(os.listdir(warehouse.root)):
        if os.path.isdir(warehouse.path(entry)):
            warehouse.read(entry).createOrReplaceTempView(entry)


# The flagship report expressed as SQL — same Catalyst plan as
# suite/relational.q01 (used by tests to pin DataFrame/SQL parity).
MONTHLY_SALES_REPORT_SQL = """
SELECT CAST(month(o_orderdate) AS INT)            AS order_month,
       r_name                                     AS region_name,
       n_name                                     AS nation_name,
       l_returnflag                               AS returnflag,
       floor((CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) / count(l_quantity)) * 1e3 + 0.5) / 1e3 AS avg_qty,
       floor(CAST(sum(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE) * 1e3 + 0.5) / 1e3 AS total_qty,
       floor((CAST(sum(CAST(l_extendedprice AS DECIMAL(28,6))) AS DOUBLE) / count(l_extendedprice)) * 1e3 + 0.5) / 1e3 AS avg_price,
       floor(CAST(sum(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6))) AS DOUBLE) * 1e3 + 0.5) / 1e3 AS revenue,
       count(*)                                   AS n_items
FROM lineitem
JOIN orders   ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation   ON c_nationkey = n_nationkey
JOIN region   ON n_regionkey = r_regionkey
GROUP BY 1, 2, 3, 4
"""


def monthly_sales_report_sql(spark: SparkSession, sf_dir: str) -> DataFrame:
    register_testdata_views(spark, sf_dir)
    return spark.sql(MONTHLY_SALES_REPORT_SQL)
