"""Custom Python Data Source (Spark 4 extension point): deterministic
synthetic event generation.

Why it exists: scale-testing a 100 TB pipeline must not require
storing 100 TB of fixtures. This source materializes events on the
executors at read time — `n_partitions` input partitions, each
generating `rows_per_partition` rows, so a 1000-executor cluster
generates terabytes in parallel with zero input I/O. Every value is a
pure function of (seed, partition, row index) via md5, so any slice of
the data is reproducible on its own: retries, speculative tasks, and
re-runs all see identical rows (the same property the sampling/split
operators rely on — rand() would break all three).

Usage:
    spark.dataSource.register(SyntheticEventsDataSource)
    df = (spark.read.format("synthetic_events")
          .option("n_partitions", 64)
          .option("rows_per_partition", 100_000)
          .option("seed", "bench-v1")
          .load())

The schema matches the driver testdata `events` table (minus props),
so generated data drops into any events-suite operator.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from datetime import datetime, timedelta

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

EVENT_TYPES = ("click", "view", "purchase", "signup", "share")
_BASE_TS = datetime(2024, 1, 1)


def _h(seed: str, part: int, row: int, field: str) -> int:
    """Deterministic non-negative 60-bit int for one generated field."""
    key = f"{seed}\x1f{part}\x1f{row}\x1f{field}".encode()
    return int(hashlib.md5(key).hexdigest()[:15], 16)


class SyntheticEventsDataSource(DataSource):
    """spark.read.format("synthetic_events") — see module docstring."""

    @classmethod
    def name(cls) -> str:
        return "synthetic_events"

    def schema(self) -> str:
        return (
            "event_id bigint, ts timestamp, user_id bigint, "
            "event_type string, value double"
        )

    def reader(self, schema) -> "SyntheticEventsReader":
        return SyntheticEventsReader(self.options)


class SyntheticEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_partitions = int(options.get("n_partitions", 8))
        self.rows_per_partition = int(options.get("rows_per_partition", 1000))
        self.seed = str(options.get("seed", "v1"))
        self.n_users = int(options.get("n_users", 1000))
        self.span_days = int(options.get("span_days", 30))
        if self.n_partitions <= 0 or self.rows_per_partition <= 0:
            raise ValueError("n_partitions and rows_per_partition must be positive")

    def partitions(self) -> list[InputPartition]:
        # one InputPartition per generated slice: Spark schedules these
        # across executors exactly like file splits
        return [InputPartition(i) for i in range(self.n_partitions)]

    def read(self, partition: InputPartition) -> Iterator[tuple]:
        p = partition.value
        span_s = self.span_days * 86400
        for i in range(self.rows_per_partition):
            event_id = p * self.rows_per_partition + i
            ts = _BASE_TS + timedelta(
                seconds=_h(self.seed, p, i, "ts") % span_s,
                microseconds=_h(self.seed, p, i, "us") % 1_000_000,
            )
            user_id = _h(self.seed, p, i, "user") % self.n_users
            etype = EVENT_TYPES[_h(self.seed, p, i, "type") % len(EVENT_TYPES)]
            value = round((_h(self.seed, p, i, "val") % 10_000_000) / 100_000.0, 5)
            yield (event_id, ts, user_id, etype, value)
