"""Round-11 scale probes (VERDICT r10 items 2 and 6):

1. sparse_cosine_pairs over a SCALING-VOCABULARY corpus with planted
   weighted-overlap pairs. synth_docs' fixed 2000-word vocab made
   every term's df ~n/33, so the r10 10M run exercised the postings
   bound but found 0 pairs at any max_df — pair-finding itself was
   degenerate. `synth_docs_heaps` fixes the df STRUCTURE instead of
   just the vocab size: per-doc tokens split into
     * 5 stop positions from a 20-word pool (df ~ n/4 — the cap
       fodder: max_df must drop these or the self-join is n^2),
     * 10 cohort positions from a 150-word pool per 50-doc cohort
       (df ~ 3.3, n-INDEPENDENT — retained mid-frequency mass that
       carries bounded candidate fan-out; sum df^2 linear in n),
     * 45 rare positions from a 100n-word pool (df ~ 1.45 — Heaps-law
       vocabulary growth: ~40n distinct retained terms, far past
       broadcast limits at 10M docs, exercising the
       vocab_broadcast=False window path).
   Pool sizes are DISK-budgeted: the postings self-join's shuffled
   survivor volume is (sum df^2 - sum df)/2 ~ 26n rows (~10 GB at
   10M docs) — the first cut (30-word cohort pool, 20n rare pool)
   was ~160n survivors and filled the 80 GB local-dir budget with
   shuffle spill at 10M ("No space left on device").
   Docs with id % 10 == 3 are PLANTED pairs: they share their base's
   (id-3) cohort tokens and 40 of 45 rare tokens — tf-idf cosine
   ~0.77-0.90 — while unrelated cohort-mates land ~0.05, so at
   threshold 0.6 the EXACT expected output is the planted-pair set
   and recall is directly countable.

2. exact substring dedup at 100M docs (10M was linear at 276.0 s;
   100M ~ 6B windows is where the duplicated-hash join and per-doc
   hit windows meet real memory pressure). Reuses synth_docs (v1) so
   the number extends BASELINE.md's 1M/10M series.

Usage: python examples/r11_scaleup_run.py [n_docs] [op1,op2,...]
  ops: sparse, substring
Recommended at 10M+: SPARK_GRAFT_DRIVER_MEM=48g
SPARK_GRAFT_SHUFFLE_PARTITIONS=256 (1024 at 100M).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from examples.corpus_scale_run import synth_docs
from nyc_etl_pipeline_spark import get_spark

STOP_T, MID_T, RARE_T = 5, 10, 45  # 60 tokens/doc
STOP_POOL = 20
COHORT = 50
COHORT_POOL = 150
RARE_POOL_PER_DOC = 100  # rare pool = 100n -> df ~ 1.45
PLANT_EVERY = 10        # id % 10 == 3 -> planted pair with id-3
PLANT_SHARED_RARE = 40  # of RARE_T rare positions copied from the base


def synth_docs_heaps(
    spark: SparkSession, n_docs: int, seed: int = 17
) -> DataFrame:
    """Deterministic corpus with Heaps-law vocabulary growth and
    planted weighted-overlap pairs (module docstring). JVM-side
    transform over sequences — generation runs at scan speed."""
    rare_pool = RARE_POOL_PER_DOC * n_docs
    planted = (F.col("id") % PLANT_EVERY == 3) & (F.col("id") >= 3)
    base = F.when(planted, F.col("id") - 3).otherwise(F.col("id"))
    d = spark.range(n_docs).withColumn("__base", base)
    cohort = F.floor(F.col("__base") / COHORT)
    stop = F.transform(
        F.sequence(F.lit(1), F.lit(STOP_T)),
        lambda i: F.concat(
            F.lit("s"),
            F.pmod(F.xxhash64(F.col("id"), i, F.lit(seed)), F.lit(STOP_POOL)),
        ),
    )
    mid = F.transform(
        F.sequence(F.lit(1), F.lit(MID_T)),
        lambda i: F.concat(
            F.lit("c"),
            cohort,
            F.lit("_"),
            F.pmod(
                F.xxhash64(F.col("__base"), i + 100, F.lit(seed)),
                F.lit(COHORT_POOL),
            ),
        ),
    )
    rare = F.transform(
        F.sequence(F.lit(1), F.lit(RARE_T)),
        lambda i: F.concat(
            F.lit("r"),
            F.pmod(
                F.xxhash64(
                    F.when(i <= PLANT_SHARED_RARE, F.col("__base")).otherwise(
                        F.col("id")
                    ),
                    i + 200,
                    F.lit(seed),
                ),
                F.lit(rare_pool),
            ),
        ),
    )
    return d.select(
        F.col("id").alias("doc_id"),
        F.array_join(F.concat(stop, mid, rare), " ").alias("text"),
    )


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(
        app_name="r11-scaleup-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )

    def timed(label: str, fn):
        t = time.perf_counter()
        out = fn()
        print(f"{label}: {out} in {time.perf_counter() - t:.1f}s", flush=True)

    if only is None or "sparse" in only:
        from nyc_etl_pipeline_spark.operators.retrieval import (
            sparse_cosine_pairs,
        )

        docs = synth_docs_heaps(spark, n_docs).persist()
        t0 = time.perf_counter()
        print(
            f"synth_heaps+persist: {docs.count():,} docs in "
            f"{time.perf_counter() - t0:.1f}s"
        )
        expected = len(range(3, n_docs, PLANT_EVERY))

        def run_sparse():
            # max_df=200 is n-INDEPENDENT by design: retained terms'
            # df (~3.3 cohort, ~1.45 rare) does not grow with n; the
            # stop terms (df ~ n/4) always exceed it. huge-vocab
            # window path: ~40n distinct retained terms at any n.
            pairs = sparse_cosine_pairs(
                docs, max_df=200, threshold=0.6, vocab_broadcast=False
            ).persist()
            total = pairs.count()
            planted = pairs.filter(
                (F.col("b_id") - F.col("a_id") == 3)
                & (F.col("b_id") % PLANT_EVERY == 3)
            ).count()
            pairs.unpersist()
            return (
                f"{total:,} pairs, {planted:,}/{expected:,} planted "
                f"recovered, {total - planted:,} non-planted"
            )

        timed(f"sparse_cosine_pairs (max_df=200, thr=0.6, window-df)", run_sparse)
        docs.unpersist()

    if only is None or "substring" in only:
        from nyc_etl_pipeline_spark.operators import dedup as D

        docs = synth_docs(spark, n_docs).persist()
        t0 = time.perf_counter()
        print(
            f"synth_v1+persist: {docs.count():,} docs in "
            f"{time.perf_counter() - t0:.1f}s"
        )
        timed(
            "substring_dedup_report (l=8)",
            lambda: "%s docs >50%% covered"
            % f"{D.substring_dedup_report(docs, l_tokens=8).filter('dup_ratio > 0.5').count():,}",
        )
        docs.unpersist()


if __name__ == "__main__":
    main()
