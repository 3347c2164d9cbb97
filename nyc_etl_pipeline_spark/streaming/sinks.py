"""Idempotent streaming sinks for at-least-once delivery targets.

Spark's foreachBatch gives at-least-once semantics: after a failure,
the SAME (batch_id, data) pair can be delivered again. File sinks get
exactly-once from the checkpoint + commit-log protocol; an external
RDBMS does not — the sink itself must deduplicate redeliveries. The
standard pattern, implemented here, is a transaction-log table keyed
by (sink name, batch_id): a batch commits its marker row in the same
logical step as its data, and a redelivered batch_id is skipped
outright.

The reference appends to MySQL/SQL Server with no such guard
(gold.py:46-54 — its documented duplicate-on-rerun quirk Q6); this is
the streaming-grade fix for the same class of bug.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

COMMIT_LOG_SUFFIX = "__commits"


def _committed_batches(spark, url: str, log_table: str, sink: str, props: dict) -> set[int]:
    from nyc_etl_pipeline_spark.io import jdbc_read

    try:
        log = jdbc_read(spark, url, log_table, props)
    except Exception:  # noqa: BLE001 — first batch: log table doesn't exist yet
        return set()
    # filter driver-side: the log is one row per batch (tiny), and a
    # pushed-down string comparison would hit dialect collation traps
    # (e.g. Derby CLOB vs CHAR)
    return {
        r["batch_id"] for r in log.select("sink", "batch_id").collect() if r["sink"] == sink
    }


def jdbc_batch_writer(
    url: str,
    table: str,
    properties: dict[str, str],
    sink_name: str | None = None,
):
    """foreachBatch callback writing each micro-batch to a JDBC table
    EXACTLY ONCE under redelivery.

    Protocol per (sink, batch_id):
      1. if the commit log already holds the id -> skip (redelivery);
      2. append the batch rows tagged with batch_id;
      3. append the commit marker LAST.
    A crash between 2 and 3 leaves orphan rows tagged with an
    uncommitted batch_id; the redelivered batch then re-appends — so
    consumers read through `dedup_uncommitted` (or filter to committed
    batch_ids) for the exactly-once view. The marker, not the data
    write, is the commit point. Scale: the log table holds one row per
    batch — trivially small; the only non-append operation is the
    committed-set read, one tiny query per batch.

    Usage:
        q = (agg.writeStream.foreachBatch(jdbc_batch_writer(url, "t", props))
             .option("checkpointLocation", ck).trigger(availableNow=True).start())
    """
    sink = sink_name or table
    log_table = f"{table}{COMMIT_LOG_SUFFIX}"

    def write_batch(df: DataFrame, batch_id: int) -> None:
        from nyc_etl_pipeline_spark.io import jdbc_write

        spark = df.sparkSession
        if batch_id in _committed_batches(spark, url, log_table, sink, properties):
            return
        jdbc_write(
            df.withColumn("batch_id", F.lit(batch_id).cast("bigint")),
            url,
            table,
            properties,
            mode="append",
        )
        marker = spark.createDataFrame([(sink, batch_id)], "sink string, batch_id bigint")
        # bounded VARCHAR instead of the dialect's unbounded-text
        # default (Derby: CLOB) so the sink name stays comparable/
        # indexable in any dialect
        log_props = dict(properties)
        log_props.setdefault("createTableColumnTypes", "sink VARCHAR(128)")
        jdbc_write(marker, url, log_table, log_props, mode="append")

    return write_batch


def committed_view(spark, url: str, table: str, properties: dict[str, str], sink_name: str | None = None) -> DataFrame:
    """Exactly-once read view: rows of `table` whose batch_id has a
    commit marker (orphans from a crash between data and marker are
    excluded; their redelivered copies are included once)."""
    from nyc_etl_pipeline_spark.io import jdbc_read

    sink = sink_name or table
    log_table = f"{table}{COMMIT_LOG_SUFFIX}"
    data = jdbc_read(spark, url, table, properties)
    log = jdbc_read(spark, url, log_table, properties).filter(F.col("sink") == sink)
    committed = log.select(F.col("batch_id").alias("__cb")).distinct()
    joined = data.join(
        F.broadcast(committed), data.batch_id == F.col("__cb"), "left_semi"
    )
    # a marker commits exactly one delivery; if orphan rows from a
    # pre-marker crash coexist with the redelivered copy, they are
    # identical by construction — dropDuplicates restores one copy
    return joined.dropDuplicates()
