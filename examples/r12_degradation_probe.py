"""Diagnose the full-suite progressive slowdown (r12 baseline: late-order
queries run ~2.5-3x their isolated times; canary q10_rollup 0.94 s
isolated vs 6.29 s inside the 204-query bench).

Runs the suite once in bench order (1 run per query), recording per
query: elapsed, JVM code-cache / metaspace / USED heap, persistent-RDD
count (localCheckpoint RDDs and persist() caches both register there),
and storage memory — then prints a table to correlate the slowdown
with an accumulator.

Usage: SPARK_GRAFT_SF_DIR=... python examples/r12_degradation_probe.py
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from nyc_etl_pipeline_spark import get_spark, suite  # noqa: E402


def jvm_pools(spark):
    jvm = spark._jvm
    beans = jvm.java.lang.management.ManagementFactory.getMemoryPoolMXBeans()
    out = {}
    for i in range(beans.size()):
        b = beans.get(i)
        name = b.getName()
        u = b.getUsage()
        out[name] = u.getUsed() // (1024 * 1024)
    return out


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark(app_name="r12-degradation-probe",
                      extra_conf={"spark.ui.showConsoleProgress": "false"})
    from nyc_etl_pipeline_spark.io import read_testdata
    from nyc_etl_pipeline_spark.schemas import TESTDATA

    spark.range(1000).selectExpr("sum(id)").collect()
    for name in TESTDATA:
        read_testdata(spark, sf_dir, name).limit(1).count()

    sc = spark.sparkContext
    rows = []
    for spec in suite.all_specs():
        t0 = time.perf_counter()
        df = spec.fn(spark, sf_dir)
        df.write.format("noop").mode("overwrite").save()
        elapsed = time.perf_counter() - t0
        pools = jvm_pools(spark)
        code = sum(v for k, v in pools.items() if "CodeHeap" in k or "Code Cache" in k)
        meta = pools.get("Metaspace", 0)
        rt = sc._jvm.java.lang.Runtime.getRuntime()
        # USED heap (total-free): committed heap plateaus at -Xmx and
        # carries no correlation signal (ADVICE r12)
        heap_used = (rt.totalMemory() - rt.freeMemory()) // (1024 * 1024)
        n_rdd = sc._jsc.sc().getPersistentRDDs().size()
        sinfo = sc._jsc.sc().getRDDStorageInfo()
        stor_mb = sum(sinfo[i].memSize() for i in range(len(sinfo))) // (1024 * 1024)
        rows.append(
            {
                "q": spec.name,
                "sec": round(elapsed, 2),
                "codeMB": code,
                "metaMB": meta,
                "heapMB": heap_used,
                "nRDD": n_rdd,
                "storMB": stor_mb,
            }
        )
        print(json.dumps(rows[-1]))
    with open("/tmp/r12_degradation_probe.json", "w") as f:
        json.dump(rows, f)


if __name__ == "__main__":
    main()
