"""Round-12 diagnostic: WHERE does logreg's per-round cost at 10M
docs come from? The isolated-process probes read ~32 s/round for
logreg (dim 65) vs ~10-13 s/round for softmax (K=5, dim 65) — 3x
slower for 1/5 the arithmetic, with a healthy optimized plan (__e is
a single projection attribute, never re-inlined; verified via
optimizedPlan this session).

The suspect is the EXECUTION tier, not the plan: a whole-stage-
codegen'd Project+HashAggregate compiles to one generated method
whose size depends on expression count; HotSpot refuses to JIT
methods past -XX:DontCompileHugeMethods (8 KB bytecode), so there is
a width VALLEY — narrow enough to generate one huge method, too wide
for the JIT — where generated code runs as INTERPRETED BYTECODE.
Past spark.sql.codegen.hugeMethodLimit Spark itself abandons
whole-stage codegen and the interpreted-expression path (with its
per-expression JIT-able evaluate loops) takes over, which can be
FASTER than un-JIT-able generated code.

This probe measures the same cached-feature 1-round training call
with spark.sql.codegen.wholeStage on vs off, both ops, burn-in
before each timed pair. If logreg speeds up materially with codegen
OFF, the valley is confirmed and the fix is op-local (split the
aggregate, or pin the conf around the training loop).

Usage: python examples/r12_codegen_probe.py [n_docs]
Recommended: SPARK_GRAFT_DRIVER_MEM=48g SPARK_GRAFT_SHUFFLE_PARTITIONS=256
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from examples.corpus_scale_run import synth_docs
from nyc_etl_pipeline_spark import get_spark
from nyc_etl_pipeline_spark.operators import classify as CLS

DIM_BUCKETS = 64
K_CLASSES = 5


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    spark = get_spark(
        app_name="r12-codegen-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    docs = synth_docs(spark, n_docs)
    y_bin = F.array_contains(
        F.split(F.trim(F.col("text")), r"\s+"), "w3"
    ).cast("int")
    y_multi = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(7)), F.lit(K_CLASSES))

    def run(label: str, feats, train) -> None:
        feats = feats.persist()
        feats.count()
        for mode in ("true", "false", "true"):
            spark.conf.set("spark.sql.codegen.wholeStage", mode)
            for _ in range(2):  # burn: JIT tiering on the CURRENT path
                train(feats, 1)
            best = min(
                _timed(lambda: train(feats, 1)) for _ in range(2)
            )
            print(f"{label} wholeStage={mode}: {best:.1f}s", flush=True)
        spark.conf.set("spark.sql.codegen.wholeStage", "true")
        feats.unpersist()

    def _timed(fn) -> float:
        t0 = time.perf_counter()
        fn()
        return time.perf_counter() - t0

    run(
        f"logreg 1-round ({n_docs:,} docs)",
        CLS.hashed_tf_features(docs, n_buckets=DIM_BUCKETS, label=y_bin),
        lambda f, r: CLS.logreg_train_fixed(
            f, dim=DIM_BUCKETS + 1, n_rounds=r, lr=4.0
        ),
    )
    run(
        f"softmax 1-round (K={K_CLASSES}, {n_docs:,} docs)",
        CLS.hashed_tf_features(docs, n_buckets=DIM_BUCKETS, label=y_multi),
        lambda f, r: CLS.softmax_train_fixed(
            f, dim=DIM_BUCKETS + 1, n_classes=K_CLASSES, n_rounds=r, lr=2.0
        ),
    )


if __name__ == "__main__":
    main()
