"""Round-12 scale probe (VERDICT r11 item 2): the softmax/logreg
fixed-round training chain on the round-11 SQL-string execution path.

The r11 rework changed the per-round execution shape — weights ride a
one-row broadcast relation (round-invariant codegen) and the staging +
gradient aggregate are parsed JVM-side from SQL strings — but it was
only measured at gate scale (5k docs); logreg's 10M reading (267 s,
r8) predates it. This probe times the chain at 1M/10M docs and
decomposes per-round cost from one-off cost by training twice with
different round counts:

    t(n_rounds) = constant + n_rounds * round_cost
    round_cost  = (t(R2) - t(R1)) / (R2 - R1)

The claims under test: round_cost is FLAT in rounds (the generated
source is weight-invariant, so rounds 2..n reuse the codegen cache —
no per-round Janino recompile) and LINEAR in docs (each round is one
map-only projection + one mergeable corpus aggregate of K*dim sums).

Usage: python examples/r12_scaleup_run.py [n_docs] [op1,op2,...]
  ops: logreg, softmax
Recommended at 10M: SPARK_GRAFT_DRIVER_MEM=48g
SPARK_GRAFT_SHUFFLE_PARTITIONS=256.
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

DIM_BUCKETS = 64  # dim = 65 with the bias component — the r8 probe's shape
K_CLASSES = 5
R1, R2 = 1, 3


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(
        app_name="r12-scaleup-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    docs = synth_docs(spark, n_docs)
    # binary label for logreg; 5-class hash label for softmax (cost
    # shape is what's probed, not learnability)
    y_bin = F.array_contains(
        F.split(F.trim(F.col("text")), r"\s+"), "w3"
    ).cast("int")
    y_multi = F.pmod(F.xxhash64(F.col("doc_id"), F.lit(7)), F.lit(K_CLASSES))
    feats_bin = CLS.hashed_tf_features(docs, n_buckets=DIM_BUCKETS, label=y_bin)
    feats_multi = CLS.hashed_tf_features(
        docs, n_buckets=DIM_BUCKETS, label=y_multi
    )

    def decompose(label: str, train):
        # untimed warm-up: first-ever execution pays feature codegen,
        # JIT, and page-cache costs that are neither per-round nor
        # plan properties — without it t(R1) absorbs them and the
        # decomposition can even go negative
        train(1)
        t0 = time.perf_counter()
        train(R1)
        t1 = time.perf_counter() - t0
        t0 = time.perf_counter()
        train(R2)
        t2 = time.perf_counter() - t0
        per_round = (t2 - t1) / (R2 - R1)
        const = t1 - R1 * per_round
        print(
            f"{label}: t({R1})={t1:.1f}s t({R2})={t2:.1f}s -> "
            f"per-round {per_round:.1f}s, one-off {const:.1f}s",
            flush=True,
        )

    if only is None or "logreg" in only:
        decompose(
            f"logreg_train_fixed (dim {DIM_BUCKETS + 1}, {n_docs:,} docs)",
            lambda r: CLS.logreg_train_fixed(
                feats_bin, dim=DIM_BUCKETS + 1, n_rounds=r, lr=4.0
            ),
        )
    if only is None or "softmax" in only:
        decompose(
            f"softmax_train_fixed (K={K_CLASSES}, dim {DIM_BUCKETS + 1}, "
            f"{n_docs:,} docs)",
            lambda r: CLS.softmax_train_fixed(
                feats_multi,
                dim=DIM_BUCKETS + 1,
                n_classes=K_CLASSES,
                n_rounds=r,
                lr=2.0,
            ),
        )


if __name__ == "__main__":
    main()
