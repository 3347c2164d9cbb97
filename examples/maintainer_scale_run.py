"""Streaming-maintainer scale probe: per-batch cost must stay FLAT
as the maintained table grows (VERDICT r8 item 7).

Synthesizes N events (default 10M, JVM-side xxhash64 expressions — no
storage, no Python loop) and feeds them through the foreachBatch
maintainers in B equal micro-batches, timing every batch write and the
final merged read:

  cms   sketch_maintainer / merged_sketch      (count-min partials)
  mart  mart_maintainer / merged_mart          (sum/cnt/min/max partials)
  mg    mg_maintainer / merged_mg_summary      (Misra-Gries candidates)

The exactly-once contract is idempotent (batch_id) partition
overwrite, so each batch's cost depends only on THAT batch plus its
partial-state size — never on how many batches already landed. A
rising per-batch trend here would mean a maintainer is accidentally
rescanning history (the bug class sinks.py exists to prevent).

Scale EVIDENCE, not correctness: stream-vs-batch parity is pinned in
tests/test_streaming_sinks.py; the oracle gate covers the operators.

Usage: python examples/maintainer_scale_run.py [n_events] [n_batches]
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark import get_spark
from nyc_etl_pipeline_spark.io import Warehouse
from nyc_etl_pipeline_spark.streaming.sinks import (
    mart_maintainer,
    merged_mart,
    merged_mg_summary,
    merged_sketch,
    mg_maintainer,
    sketch_maintainer,
)

N_TOKENS = 200_000  # zipf-ish head via pmod-of-pmod (heavy hitters exist)
SPAN_US = 30 * 86400 * 1_000_000


def synth_events(spark, n: int):
    base = F.lit("2024-01-01 00:00:00").cast("timestamp")
    raw = F.pmod(F.xxhash64("id", F.lit(5)), F.lit(N_TOKENS))
    # square-law skew: low ids soak up mass -> MG has real heavy hitters
    tok = (raw * raw / F.lit(N_TOKENS)).cast("bigint")
    return spark.range(n).select(
        F.col("id").alias("event_id"),
        F.timestamp_micros(
            F.unix_micros(base) + F.pmod(F.xxhash64("id", F.lit(1)), F.lit(SPAN_US))
        ).alias("ts"),
        F.element_at(
            F.array(*[F.lit(t) for t in ("click", "view", "purchase", "signup", "share")]),
            (F.pmod(F.xxhash64("id", F.lit(3)), F.lit(5)) + 1).cast("int"),
        ).alias("event_type"),
        (F.pmod(F.xxhash64("id", F.lit(4)), F.lit(10_000_000)) / 100_000.0).alias("value"),
        F.concat(F.lit("tok_"), tok).alias("token"),
    )


def run_maintainer(name, write_batch, merged_fn, batches) -> dict:
    per_batch = []
    for b, bdf in enumerate(batches):
        t0 = time.monotonic()
        write_batch(bdf, b)
        per_batch.append(round(time.monotonic() - t0, 2))
    t0 = time.monotonic()
    n_rows = merged_fn().count()
    merged_sec = round(time.monotonic() - t0, 2)
    rec = {
        "maintainer": name,
        "per_batch_sec": per_batch,
        "merged_sec": merged_sec,
        "merged_rows": n_rows,
        "flat": max(per_batch[1:]) <= 2.0 * per_batch[0] if len(per_batch) > 1 else True,
    }
    print(json.dumps(rec), flush=True)
    return rec


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    n_batches = int(sys.argv[2]) if len(sys.argv) > 2 else 10
    spark = get_spark(
        app_name="maintainer-scale-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    events = synth_events(spark, n)
    per = n // n_batches
    batches = [
        events.filter((F.col("event_id") >= b * per) & (F.col("event_id") < (b + 1) * per))
        for b in range(n_batches)
    ]
    root = tempfile.mkdtemp(prefix="maintainer_probe_")
    try:
        wh = Warehouse(spark, root)
        results = [
            run_maintainer(
                "cms",
                sketch_maintainer(wh, "cms_t"),
                lambda: merged_sketch(wh, "cms_t"),
                batches,
            ),
            run_maintainer(
                "mart",
                mart_maintainer(wh, "mart_t", ["event_type"], ["value"]),
                lambda: merged_mart(wh, "mart_t", ["event_type"], ["value"]),
                batches,
            ),
            run_maintainer(
                "mg",
                mg_maintainer(wh, "mg_t"),
                lambda: merged_mg_summary(wh, "mg_t"),
                batches,
            ),
        ]
        print(json.dumps({
            "probe": "maintainer_scale", "n_events": n, "n_batches": n_batches,
            "all_flat": all(r["flat"] for r in results),
        }), flush=True)
    finally:
        shutil.rmtree(root, ignore_errors=True)


if __name__ == "__main__":
    main()
