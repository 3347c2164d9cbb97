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


# ---------------------------------------------------------------------------
# Dialect helpers (VERDICT r3 "missing" item 3): pure-logic tests for the
# MySQL / SQL Server specifics, plus quoting against the live Derby conn.
# ---------------------------------------------------------------------------


def test_dialect_resolution_and_drivers():
    from nyc_etl_pipeline_spark import jdbc_dialects as JD

    assert JD.dialect_for("jdbc:mysql://h/db").driver == "com.mysql.cj.jdbc.Driver"
    assert (
        JD.dialect_for("jdbc:sqlserver://h;databaseName=db").driver
        == "com.microsoft.sqlserver.jdbc.SQLServerDriver"
    )
    assert JD.dialect_for("jdbc:derby:/tmp/db").driver is None
    with pytest.raises(ValueError):
        JD.dialect_for("jdbc:oracle:thin:@h")


def test_dialect_identifier_quoting():
    from nyc_etl_pipeline_spark import jdbc_dialects as JD

    assert JD.quote_ident("jdbc:mysql://h/db", "weekly report") == "`weekly report`"
    assert JD.quote_ident("jdbc:mysql://h/db", "a`b") == "`a``b`"
    assert JD.quote_ident("jdbc:sqlserver://h", "weekly report") == "[weekly report]"
    assert JD.quote_ident("jdbc:sqlserver://h", "a]b") == "[a]]b]"
    assert JD.quote_ident("jdbc:derby:db", 'a"b') == '"a""b"'


def test_dialect_connection_and_overwrite_props():
    from nyc_etl_pipeline_spark import jdbc_dialects as JD

    p = JD.connection_props("jdbc:mysql://h/db", user="u", password="s", batchsize="5000")
    assert p["driver"] == "com.mysql.cj.jdbc.Driver" and p["batchsize"] == "5000"
    assert JD.overwrite_props("jdbc:sqlserver://h") == {"truncate": "true"}
    assert JD.overwrite_props("jdbc:derby:db") == {}  # no TRUNCATE on Derby


def test_quoted_identifier_roundtrip_on_derby(spark, derby_url):
    """A table name needing quoting, written and read back through the
    dialect helpers against a real JDBC connection."""
    from nyc_etl_pipeline_spark import jdbc_dialects as JD

    df = spark.createDataFrame([Row(k=1, v="x"), Row(k=2, v="y")])
    table = JD.quote_ident(derby_url, "Weekly Report")
    props = JD.connection_props(derby_url, driver=DRIVER)
    jdbc_write(df, derby_url, table, props, mode="overwrite")
    back = jdbc_read(spark, derby_url, table, props)
    assert {r["k"]: r["v"] for r in back.collect()} == {1: "x", 2: "y"}


def test_jdbc_streaming_sink_exactly_once_under_redelivery(spark, derby_url, sf_dir, tmp_path):
    """The foreachBatch JDBC sink must be idempotent under
    at-least-once redelivery: delivering the same (batch_id, data)
    twice — and replaying a crash between data write and commit
    marker — still yields exactly one committed copy per row."""
    from pyspark.sql import functions as F

    from nyc_etl_pipeline_spark.io import read_testdata
    from nyc_etl_pipeline_spark.streaming.sinks import (
        committed_view,
        jdbc_batch_writer,
    )

    agg = (
        read_testdata(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    props = _props()
    write = jdbc_batch_writer(derby_url, "evt_counts", props)

    write(agg, 0)
    write(agg, 0)  # clean redelivery: skipped via commit log
    n_once = committed_view(spark, derby_url, "evt_counts", props).count()
    assert n_once == agg.count()

    # crash window: data written, marker lost, batch redelivered
    from nyc_etl_pipeline_spark.io import jdbc_write

    jdbc_write(
        agg.withColumn("batch_id", F.lit(1).cast("bigint"))
        .withColumn("__attempt", F.lit("deadbeef" * 4)),
        derby_url, "evt_counts", props, mode="append",
    )  # orphan rows: data written under an attempt id that never got a marker
    write(agg, 1)  # redelivery commits under a fresh attempt id
    view = committed_view(spark, derby_url, "evt_counts", props)
    assert view.count() == 2 * agg.count()  # batches 0 and 1, once each
    assert view.groupBy("event_type", "batch_id").count().filter("count > 1").count() == 0


def test_jdbc_streaming_sink_via_real_stream(spark, derby_url, sf_dir, tmp_path):
    """Full writeStream integration: foreachBatch drives the
    exactly-once JDBC writer; a second run over the SAME checkpoint
    re-emits nothing new and the committed view stays stable."""
    from pyspark.sql import functions as F

    from nyc_etl_pipeline_spark.streaming.events import read_event_stream
    from nyc_etl_pipeline_spark.streaming.sinks import committed_view, jdbc_batch_writer

    props = _props()

    def run():
        agg = (
            read_event_stream(spark, sf_dir)
            .groupBy("event_type")
            .agg(F.count(F.lit(1)).alias("n"))
        )
        q = (
            agg.writeStream.outputMode("complete")
            .foreachBatch(jdbc_batch_writer(derby_url, "stream_counts", props))
            .option("checkpointLocation", str(tmp_path / "ck_jdbc"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()

    run()
    first = {
        (r["event_type"], r["n"])
        for r in committed_view(spark, derby_url, "stream_counts", props).collect()
    }
    run()  # same checkpoint: no new batches -> no new rows
    second = {
        (r["event_type"], r["n"])
        for r in committed_view(spark, derby_url, "stream_counts", props).collect()
    }
    assert first == second and len(first) == 5


def test_committed_view_preserves_identical_rows(spark, derby_url):
    """A batch may legitimately contain identical rows (e.g. a
    non-aggregated append sink). The attempt-tagged protocol must keep
    every copy of the committed attempt — the old full-row
    dropDuplicates would have collapsed them."""
    from nyc_etl_pipeline_spark.streaming.sinks import committed_view, jdbc_batch_writer

    props = _props()
    dupes = spark.createDataFrame([Row(k=1, v="a"), Row(k=1, v="a"), Row(k=2, v="b")])
    write = jdbc_batch_writer(derby_url, "raw_rows", props)
    write(dupes, 0)
    write(dupes, 0)  # redelivery: skipped
    view = committed_view(spark, derby_url, "raw_rows", props)
    assert view.count() == 3  # both identical (1,"a") rows survive
    assert "__attempt" not in view.columns


def test_missing_table_detection_is_narrow():
    """Only a missing TABLE may read as 'first batch, empty commit
    log'; connection/database errors must propagate (a transient JDBC
    failure read as an empty log would re-append a committed batch)."""
    from nyc_etl_pipeline_spark.streaming.sinks import _is_missing_table

    assert _is_missing_table(Exception("ERROR 42X05: Table/View 'T__COMMITS' does not exist."))
    assert _is_missing_table(Exception("[TABLE_OR_VIEW_NOT_FOUND] The table or view cannot be found"))
    assert _is_missing_table(Exception('relation "t__commits" does not exist'))
    assert _is_missing_table(Exception("Invalid object name 't__commits'"))
    assert not _is_missing_table(Exception("ERROR XJ004: Database 'db' not found."))
    assert not _is_missing_table(Exception("Connection refused: connect"))
    assert not _is_missing_table(Exception("ERROR 08006: A network protocol error was encountered"))
