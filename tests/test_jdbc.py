"""S6/S9 JDBC source/sink exercised for REAL against embedded Apache
Derby — the one RDBMS whose JDBC driver ships inside the Spark
distribution itself (derby*.jar on the classpath, there for the Hive
metastore), so no external driver JAR is needed.

Reference parity: gold.py:36-54 reads MySQL dims / appends the fact;
platinum.py:31-59 writes reports to SQL Server. Same wrappers, same
options surface — only the URL differs.
"""

import pytest
from pyspark.sql import Row

from nyc_etl_pipeline_spark.io import jdbc_read, jdbc_write

DRIVER = "org.apache.derby.iapi.jdbc.AutoloadedDriver"


def _props():
    return {"driver": DRIVER}


@pytest.fixture()
def derby_url(tmp_path):
    return f"jdbc:derby:{tmp_path}/db;create=true"


def test_jdbc_write_then_read_roundtrip(spark, derby_url):
    dim = spark.createDataFrame(
        [Row(id=1, name="Creative Mobile"), Row(id=2, name="VeriFone"), Row(id=3, name=None)]
    )
    jdbc_write(dim, derby_url, "dim_vendor", _props(), mode="overwrite")
    back = jdbc_read(spark, derby_url, "dim_vendor", _props())
    rows = {r["id"]: r["name"] for r in back.collect()}
    assert rows == {1: "Creative Mobile", 2: "VeriFone", 3: None}


def test_jdbc_append_mode_accumulates(spark, derby_url):
    """Reference Q6: its JDBC fact sink was append-only, duplicating on
    re-run. The wrapper reproduces append semantics faithfully — the
    engine's fix is to not use append for re-runnable loads."""
    df = spark.createDataFrame([Row(k=1), Row(k=2)])
    jdbc_write(df, derby_url, "facts", _props(), mode="overwrite")
    jdbc_write(df, derby_url, "facts", _props(), mode="append")
    assert jdbc_read(spark, derby_url, "facts", _props()).count() == 4


def test_jdbc_read_partitioned(spark, derby_url):
    """Partitioned read options (SURVEY §3.2 flagged the reference's
    single-partition reads): numPartitions/partitionColumn split the
    scan into range predicates — the scale path for any non-tiny table."""
    df = spark.range(0, 100).selectExpr("id", "id * 2 as v")
    jdbc_write(df, derby_url, "wide", _props(), mode="overwrite")
    back = jdbc_read(
        spark,
        derby_url,
        "wide",
        {
            **_props(),
            "partitionColumn": "id",
            "lowerBound": "0",
            "upperBound": "100",
            "numPartitions": "4",
        },
    )
    assert back.rdd.getNumPartitions() == 4
    assert back.count() == 100
    assert back.agg({"v": "sum"}).collect()[0][0] == sum(i * 2 for i in range(100))
