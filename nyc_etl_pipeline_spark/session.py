"""SparkSession factory.

The reference creates a fresh SparkSession *per pipeline layer* with
tiny fixed resources (reference assets/bronze.py:14-31 etc.). Here the
engine owns ONE long-lived session, configured for both local testing
(local[N], single JVM) and cluster scale (AQE, sane shuffle sizing,
Arrow for any pandas interchange).
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

_DEFAULT_SHUFFLE_PARTITIONS = 32


def get_spark(
    app_name: str = "nyc-etl-pipeline-spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) the engine's SparkSession.

    Local defaults: ``local[$SPARK_GRAFT_CPUS]`` (falls back to
    ``local[*]``), 32 shuffle partitions. On a real cluster, pass
    ``master=None`` with ``spark.master`` preset by spark-submit and a
    shuffle_partitions sized to ~2-3x total executor cores; AQE
    coalesces the excess at runtime.
    """
    if master is None:
        cpus = os.environ.get("SPARK_GRAFT_CPUS")
        master = f"local[{cpus}]" if cpus else "local[*]"
    if shuffle_partitions is None:
        shuffle_partitions = int(
            os.environ.get("SPARK_GRAFT_SHUFFLE_PARTITIONS", _DEFAULT_SHUFFLE_PARTITIONS)
        )

    # In local mode the driver JVM IS the executor — its heap is the
    # only memory knob. Spark's 1g default dies on any serious shuffle,
    # but a huge default would fail to launch (or invite the OOM
    # killer) on modest hosts/memory-capped containers — so default to
    # a safe 4g and let big local runs opt in via SPARK_GRAFT_DRIVER_MEM
    # (the 100k-doc stress runs used 48g). Must be set before the JVM
    # launches (no-op on getOrCreate reuse).
    driver_mem = os.environ.get("SPARK_GRAFT_DRIVER_MEM", "4g")

    builder = (
        SparkSession.builder.appName(app_name)
        .config("spark.driver.memory", driver_mem)
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        # AQE: runtime plan re-optimization — partition coalescing,
        # skew-join splitting, sort-merge->broadcast switch. Essential
        # at 100 TB where static stats mispredict.
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Arrow for any pandas interchange (pandas_udf, toPandas in
        # tests). The reference shipped rows Python->JVM one at a time
        # (no Arrow config anywhere — SURVEY §4).
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # UTC so timestamp semantics match the DuckDB oracle and are
        # stable across cluster nodes.
        .config("spark.sql.session.timeZone", "UTC")
        # Idempotent partition-level overwrite for lakehouse writes
        # (fixes reference quirk Q6: append-only non-idempotent sinks).
        .config("spark.sql.sources.partitionOverwriteMode", "dynamic")
        # Read parquet TIMESTAMP(NANOS) columns as raw nanosecond longs
        # (Spark has no ns timestamp type); io.read_testdata converts
        # to microsecond timestamps with integer division.
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
    )
    if master:
        builder = builder.master(master)
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)

    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
