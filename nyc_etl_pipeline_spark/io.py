"""Lakehouse IO: schema-validated reads, idempotent partitioned writes.

Replaces the reference's three side channels (MinIO object store,
MySQL datamart, SQL Server report DB — reference assets/bronze.py:34-45,
gold.py:36-54, platinum.py:31-59) with Parquet tables under a single
warehouse directory. JDBC remains available through the
``jdbc_read``/``jdbc_write`` wrappers — exercised end-to-end in
tests/test_jdbc.py against embedded Apache Derby (whose driver ships
inside the Spark distribution); for MySQL/SQL Server only the URL and
driver option change.
"""

from __future__ import annotations

import functools as _functools
import glob as _glob
import logging
import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import types as T

from nyc_etl_pipeline_spark import schemas

log = logging.getLogger(__name__)


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the suite's semantics depend on, applied
    defensively: the caller may hand us a session built without the
    engine's factory (e.g. the driver's own). UTC pins window/epoch
    alignment to the DuckDB oracle; nanosAsLong makes TIMESTAMP(NANOS)
    parquet readable at all (harmless when the data is MICROS)."""
    for k, v in (
        ("spark.sql.session.timeZone", "UTC"),
        ("spark.sql.legacy.parquet.nanosAsLong", "true"),
    ):
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception as exc:  # noqa: BLE001 — a locked conf shouldn't crash a read
            # Loud, not silent: semantics (UTC window alignment, NANOS
            # readability) depend on these. A swallowed failure here is
            # how config-dependent misreads stay invisible.
            log.warning("could not apply session conf %s=%s: %s", k, v, exc)


def _first_parquet_file(path: str) -> str | None:
    """Resolve a file / directory / glob path to one concrete parquet
    data file (for footer sniffing). Recurses into partitioned /
    nested layouts (Hive dirs like ``month=2024-01/part-*.parquet``);
    returns None when nothing is found — the caller falls back to a
    plain typed read and lets Spark's reader produce its (clearer)
    error for genuinely missing tables."""
    roots = sorted(_glob.glob(path)) if any(c in path for c in "*?[") else [path]
    for root in roots:
        if os.path.isfile(root):
            return root
        if os.path.isdir(root):
            files = sorted(_glob.glob(os.path.join(root, "*.parquet")))
            if not files:  # partitioned/nested layout Spark can still read
                files = sorted(_glob.glob(os.path.join(root, "**", "*.parquet"),
                                          recursive=True))
            if files:
                return files[0]
    return None


@_functools.lru_cache(maxsize=1024)
def _ts_unit_cached(resolved_file: str, column: str, mtime_ns: int) -> str | None:
    """Footer sniff, cached per (file, column, mtime): the suite
    constructs hundreds of reads per session over static fixture
    files, so each footer is opened once; the mtime key invalidates
    naturally if a fixture is rewritten mid-session."""
    import pyarrow.parquet as pq

    sch = pq.ParquetFile(resolved_file).schema
    try:
        col = sch.column(sch.names.index(column))
    except ValueError:
        return None
    lt = str(col.logical_type).lower()
    if "timestamp" not in lt:
        return None
    if "nano" in lt:
        return "nanos"
    if "milli" in lt:
        return "millis"
    return "micros"


def parquet_timestamp_unit(path: str, column: str) -> str | None:
    """Return the parquet logical-type time unit ('nanos' | 'micros' |
    'millis') of `column` at `path`, or None if the column is not a
    timestamp. Reads one file footer via pyarrow — no Spark job.

    `path` may be a single parquet file or a directory of them (one
    footer is representative: the driver writes homogeneous files).
    Exists because fixture regeneration silently flipped events.ts
    from TIMESTAMP(NANOS) to TIMESTAMP(MICROS) between rounds —
    hard-coding either unit corrupts every timestamp when the file
    drifts. Sniffing the footer makes the reader self-describing.
    """
    f = _first_parquet_file(path)
    if f is None:
        return None
    return _ts_unit_cached(f, column, os.stat(f).st_mtime_ns)


def read_testdata(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Read one driver testdata table with its declared schema.

    Passing an explicit schema (a) skips footer-merge schema inference
    across thousands of files at scale and (b) fails fast on drift.
    Column pruning/pushdown still reach the parquet scan.

    Timestamp columns are footer-sniffed per regeneration:
    TIMESTAMP(NANOS) is the one unit Spark cannot read natively — with
    spark.sql.legacy.parquet.nanosAsLong it arrives as a ns-since-epoch
    long, truncated to micros with integer `div` (not `/`, which would
    round through double and lose precision above 2^53 ns) — matching
    how DuckDB reads the same column. MICROS/MILLIS take the plain
    typed read. The events fixture has already drifted NANOS→MICROS
    between rounds; this handles ANY of the tables' timestamp columns
    drifting either way.
    """
    ensure_session_confs(spark)
    path = os.path.join(sf_dir, f"{name}.parquet")
    schema = schemas.TESTDATA.get(name)
    if schema is not None:
        ts_cols = [f.name for f in schema.fields if isinstance(f.dataType, T.TimestampType)]
        nanos_cols = {
            c for c in ts_cols if parquet_timestamp_unit(path, c) == "nanos"
        }
        if nanos_cols:
            from pyspark.sql import functions as F

            phys = T.StructType(
                [
                    T.StructField(
                        f.name,
                        T.LongType() if f.name in nanos_cols else f.dataType,
                    )
                    for f in schema.fields
                ]
            )
            df = spark.read.schema(phys).parquet(path)
            for c in nanos_cols:
                df = df.withColumn(c, F.timestamp_micros(F.expr(f"{c} div 1000")))
            return df.select(*[f.name for f in schema.fields])
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_parquet(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.parquet(path)


def read_csv(spark: SparkSession, path: str, schema: T.StructType) -> DataFrame:
    """Header CSV scan with explicit schema (no inferSchema job).

    Reference: pandas ``read_csv`` of taxi_zone.csv (raw.py:85-87).
    """
    return spark.read.option("header", True).schema(schema).csv(path)


def delta_available() -> bool:
    """True when the delta-spark package (and its JVM jars) can be
    loaded. The engine never requires it: plain parquet is the default
    table format, Delta is an optional upgrade for object-store roots
    where compact()'s rename-swap is not atomic."""
    try:
        import delta  # noqa: F401

        return True
    except ImportError:
        return False


class Warehouse:
    """Lakehouse rooted at one directory; one subdir per table.

    Writes partitioned by the given columns use dynamic partition
    overwrite (session conf ``partitionOverwriteMode=dynamic``), so
    re-running a month is idempotent — fixing reference quirk Q6
    (append-only JDBC sinks, duplicated rows on re-run).

    ``table_format`` defaults to parquet; ``"orc"`` uses Spark's
    built-in ORC reader/writer (same predicate pushdown + dynamic
    partition overwrite semantics). Pass ``"delta"`` (requires
    the optional delta-spark package — see ``delta_available``) for
    ACID commits: on object stores, parquet compact()'s rename-swap is
    not atomic, while a table format commits via its transaction log —
    that is the supported path for s3a roots. The session must be
    built with the Delta catalog extensions (delta-spark's
    ``configure_spark_with_delta_pip``)."""

    def __init__(self, spark: SparkSession, root: str, table_format: str = "parquet"):
        if table_format not in ("parquet", "orc", "delta"):
            raise ValueError(f"unsupported table format: {table_format}")
        if table_format == "delta" and not delta_available():
            raise ImportError(
                "table_format='delta' requires the delta-spark package "
                "(pip install delta-spark); plain parquet needs nothing"
            )
        self.spark = spark
        self.root = root
        self.table_format = table_format

    def path(self, table: str) -> str:
        return f"{self.root.rstrip('/')}/{table}"

    def _fs(self, path: str):
        """(hadoop Path, FileSystem) for any supported URI scheme —
        local path, file://, hdfs://, s3a://. One resolution point so
        every Warehouse filesystem op is object-store-capable."""
        jvm = self.spark._jvm
        hpath = jvm.org.apache.hadoop.fs.Path(path)
        return hpath, hpath.getFileSystem(self.spark._jsc.hadoopConfiguration())

    def exists(self, table: str) -> bool:
        hpath, fs = self._fs(self.path(table))
        return bool(fs.exists(hpath))

    def size_bytes(self, table: str) -> int:
        """On-disk bytes of a table (recursive), via the Hadoop FS API
        so it works on any supported URI scheme. Used to size shuffle
        partition counts to the data instead of a static conf."""
        hpath, fs = self._fs(self.path(table))
        return int(fs.getContentSummary(hpath).getLength())

    def read(self, table: str, schema: T.StructType | None = None) -> DataFrame:
        reader = self.spark.read.format(self.table_format)
        if schema is not None:
            reader = reader.schema(schema)
        return reader.load(self.path(table))

    def overwrite(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        """FULL-table overwrite. With partition_by, partitionOverwriteMode
        is forced to static here — the session default is dynamic (for
        overwrite_partitions), which would silently keep partitions
        absent from ``df`` and make the two methods behave identically
        despite their contracts differing (e.g. a full rebuild after an
        upstream month was deleted must drop that month)."""
        writer = df.write.format(self.table_format).mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by).option(
                "partitionOverwriteMode", "static"
            )
        writer.save(self.path(table))

    def overwrite_partitions(self, df: DataFrame, table: str, partition_by: list[str]) -> None:
        """Replace only the partitions present in ``df`` (idempotent
        incremental load). Requires the table to already exist.
        partitionOverwriteMode=dynamic is honored by both the parquet
        writer and Delta (>= 2.x)."""
        (
            df.write.format(self.table_format)
            .mode("overwrite")
            .partitionBy(*partition_by)
            .option("partitionOverwriteMode", "dynamic")
            .save(self.path(table))
        )

    def overwrite_bucketed(
        self,
        df: DataFrame,
        table: str,
        bucket_cols: list[str],
        n_buckets: int,
        sort_cols: list[str] | None = None,
    ) -> None:
        """Hash-clustered (bucketed) table write — the CO-LOCATION
        primitive for repeated large-large joins and aggregations: two
        tables bucketed by the same key with the same bucket count
        sort-merge-join with NO shuffle exchange on either side, and a
        groupBy on the bucket key aggregates without an exchange
        (plan-asserted in tests/test_io_formats.py). At 100 TB this is
        the difference between shuffling the fact table on every run
        and shuffling it ONCE at write time.

        Bucketed tables live in the session catalog (Spark's bucketBy
        requires saveAsTable) with their files at the warehouse path;
        read back via `read_table`. The catalog entry is NAMESPACED
        per warehouse root (``<table>__wh_<md5(root)[:8]>``): the
        session catalog is global, so two Warehouse instances with
        different roots writing the same bare table name would
        otherwise DROP and silently repoint each other's entry.
        Deployment note: cross-session bucket metadata needs a
        persistent catalog (Hive metastore / Unity-style); the file
        layout itself is plain parquet either way. `sort_cols`
        additionally sorts within buckets, upgrading the merge join's
        sort to a free pass-through."""
        writer = (
            df.write.format(self.table_format)
            .mode("overwrite")
            .option("path", self.path(table))
            .bucketBy(n_buckets, *bucket_cols)
        )
        if sort_cols:
            writer = writer.sortBy(*sort_cols)
        name = self._catalog_name(table)
        self.spark.sql(f"DROP TABLE IF EXISTS `{name}`")
        writer.saveAsTable(name)

    def _catalog_name(self, table: str) -> str:
        """Session-catalog identifier for this warehouse's `table` —
        bare names collide across Warehouse roots in the one global
        catalog, so suffix a digest of the root path."""
        import hashlib

        digest = hashlib.md5(str(self.root).encode()).hexdigest()[:8]
        return f"{table}__wh_{digest}"

    def read_table(self, table: str) -> DataFrame:
        """Catalog read — required for bucketed tables (a plain path
        read sees the files but not the bucket spec, so the co-location
        guarantee is silently lost)."""
        return self.spark.table(self._catalog_name(table))

    def partition_columns(self, table: str) -> list[str]:
        """Hive-style partition columns of a stored table, inferred
        from the directory layout (k=v levels), via the Hadoop FS API
        so any URI scheme works. Empty list for unpartitioned tables.
        Public: callers gating on layout invariants (e.g. compact
        preserving a maintainer's batch_id dirs) check this rather
        than reaching into internals (ADVICE r11)."""
        cols: list[str] = []
        hpath, fs = self._fs(self.path(table))
        cur = hpath
        while True:
            subdirs = [
                st.getPath()
                for st in fs.listStatus(cur)
                if st.isDirectory() and not st.getPath().getName().startswith((".", "_"))
            ]
            kv = [p for p in subdirs if "=" in p.getName()]
            if not kv:
                return cols
            keys = {p.getName().split("=", 1)[0] for p in kv}
            if len(keys) != 1:
                return cols
            cols.append(next(iter(keys)))
            cur = kv[0]

    def compact(self, table: str, target_file_mb: int = 128) -> int:
        """Small-file compaction: rewrite a table into ~target-sized
        files. Streaming/incremental writes accumulate small files;
        at scale, scan cost is dominated by file-open overhead long
        before data volume. Returns the actual post-compaction data
        file count (counted from the filesystem listing — for a
        Hive-partitioned table that is ~one file per partition value,
        which can exceed the size-derived repartition target).

        Durability: the compacted copy is fully written to a temporary
        sibling directory FIRST, then swapped over the table path with
        filesystem renames. At no point is the only copy of the data a
        set of non-fault-tolerant in-memory blocks (an earlier revision
        localCheckpoint'ed then overwrote in place — an executor loss
        mid-write would have lost the table permanently). If the
        process dies mid-swap, the data survives in either the table,
        the ``.compact-tmp`` or the ``.compact-old`` directory. Renames
        are atomic on HDFS/local FS; on object stores use a
        table-format commit — a Delta-format Warehouse compacts through
        OPTIMIZE's transactional commit below, never the rename-swap.
        """
        import math

        if self.table_format == "delta":
            from delta.tables import DeltaTable

            dt = DeltaTable.forPath(self.spark, self.path(table))
            dt.optimize().executeCompaction()
            return int(
                dt.detail().select("numFiles").first()["numFiles"]
            )

        path = self.path(table)
        hpath, fs = self._fs(path)
        size_b = fs.getContentSummary(hpath).getLength()
        n = max(1, math.ceil(size_b / (target_file_mb * 1024 * 1024)))
        tmp, old = f"{path}.compact-tmp", f"{path}.compact-old"
        # URI-agnostic filesystem ops via the Hadoop FS API
        jvm = self.spark._jvm
        for stale in (tmp, old):
            fs.delete(jvm.org.apache.hadoop.fs.Path(stale), True)
        # PRESERVE the partition layout: an unpartitioned rewrite would
        # turn k=v directories into plain data columns in root files,
        # after which overwrite_partitions() writes NEW k=v dirs while
        # the old rows still sit in the root — a replayed batch would
        # then double-count (breaking the streaming maintainers'
        # exactly-once-by-partition-rewrite contract).
        part_cols = self.partition_columns(table)
        df = self.spark.read.format(self.table_format).load(path)
        if part_cols:
            # hash-distribute by the partition cols so every partition
            # value lands in one task -> one compacted file per dir
            writer = df.repartition(n, *part_cols).write.format(self.table_format)
            writer = writer.partitionBy(*part_cols)
        else:
            writer = df.repartition(n).write.format(self.table_format)
        writer.save(tmp)
        if not fs.rename(hpath, jvm.org.apache.hadoop.fs.Path(old)):
            raise IOError(f"compact: could not move {path} aside")
        if not fs.rename(jvm.org.apache.hadoop.fs.Path(tmp), hpath):
            # put the original back — the failed swap must not lose it
            fs.rename(jvm.org.apache.hadoop.fs.Path(old), hpath)
            raise IOError(f"compact: could not swap compacted data into {path}")
        fs.delete(jvm.org.apache.hadoop.fs.Path(old), True)
        # Return the REAL post-swap data-file count, not the repartition
        # target n: for a partitioned table the partitionBy rewrite emits
        # roughly one file per partition value, so n would mislead any
        # caller sizing follow-up work off it (ADVICE r5).
        it = fs.listFiles(hpath, True)
        n_files = 0
        while it.hasNext():
            name = it.next().getPath().getName()
            if not name.startswith(("_", ".")):
                n_files += 1
        return n_files

    def append(self, df: DataFrame, table: str, partition_by: list[str] | None = None) -> None:
        writer = df.write.format(self.table_format).mode("append")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.save(self.path(table))


def jdbc_read(spark: SparkSession, url: str, table: str, properties: dict[str, str]) -> DataFrame:
    """Optional JDBC source (reference gold.py:36-44 read MySQL dims).

    Kept behind a thin wrapper: the core pipeline never requires an
    RDBMS. Partitioned reads (numPartitions/partitionColumn) should be
    set by callers for any non-tiny table — the reference read
    single-partition (SURVEY §3.2).
    """
    reader = spark.read.format("jdbc").option("url", url).option("dbtable", table)
    for k, v in properties.items():
        reader = reader.option(k, v)
    return reader.load()


def jdbc_write(df: DataFrame, url: str, table: str, properties: dict[str, str], mode: str = "append") -> None:
    """Optional JDBC sink (reference gold.py:46-54, platinum.py:31-59)."""
    writer = df.write.format("jdbc").option("url", url).option("dbtable", table).mode(mode)
    for k, v in properties.items():
        writer = writer.option(k, v)
    writer.save()
