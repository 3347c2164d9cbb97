"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash -> CORRECTNESS_r{N}.json).

All implementations live in the ``nyc_etl_pipeline_spark`` package;
this module is the thin contract surface.
"""

from __future__ import annotations

import os
import sys
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nyc_etl_pipeline_spark import suite  # noqa: E402


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: the platinum
    monthly-report shape (star join + wide grouped aggregation)."""
    from nyc_etl_pipeline_spark.suite.relational import q01_monthly_sales_report

    return q01_monthly_sales_report(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-data-pipeline extensions). Each callable takes (spark, sf_dir)
    and returns a DataFrame with columns aliased identically to the
    oracle SQL."""
    return suite.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL equivalents. Keys absent here (LSH /
    SimHash candidates) are probabilistic-recall operators whose
    precision is exact but whose candidate sets aren't SQL-expressible;
    pytest asserts them against the exact oracle-checked variants."""
    return suite.oracle_sql()
