"""Round-10 scale-up probe: 10x runs for the round-9 operators that
were only measured at 1M docs (VERDICT r9 item 6), plus the first
volume run of the new exact-substring-dedup family.

Reuses corpus_scale_run's executor-side synthetic corpus (planted
exact dups + trailing-token near-dups) so numbers are comparable with
the 1M rows already in BASELINE.md:

  bloom_contamination   (r9: 24.2 s / 1M)
  sparse_cosine_pairs   (r9: 34.8 s / 1M)
  bigram_nll            (r9: 157.5 s / 1M)
  substring_dedup_report (new in r10 — covered-span SA semantics)

The question each row answers is the SCALING SHAPE: a 10x input that
costs ~10x is a linear operator a 1000-executor cluster divides; any
super-linear step is a design bug to hunt (that's how the Bloom
string-dictionary cliff was caught in r9).

Usage: python examples/r10_scaleup_run.py [n_docs] [op1,op2,...]
(SPARK_GRAFT_DRIVER_MEM=48g recommended at 10M — one local JVM holds
all executor state; at 10M also set
SPARK_GRAFT_SHUFFLE_PARTITIONS=256 — the 32-partition local default
puts ~17M rows in each shuffle partition of the token/window-scale
aggregates, which spills)
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

from pyspark.sql import functions as F

from examples.corpus_scale_run import synth_docs
from nyc_etl_pipeline_spark import get_spark


def main() -> None:
    n_docs = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
    only = set(sys.argv[2].split(",")) if len(sys.argv) > 2 else None
    spark = get_spark(
        app_name="r10-scaleup-probe",
        extra_conf={"spark.ui.showConsoleProgress": "false"},
    )
    from nyc_etl_pipeline_spark.operators import dedup as D
    from nyc_etl_pipeline_spark.operators.lm import bigram_nll_scores
    from nyc_etl_pipeline_spark.operators.retrieval import sparse_cosine_pairs

    docs = synth_docs(spark, n_docs).persist()
    t0 = time.perf_counter()
    print(f"synth+persist: {docs.count():,} docs in {time.perf_counter() - t0:.1f}s")

    def timed(label: str, fn):
        if only is not None and label.split(" ")[0] not in only:
            return
        t = time.perf_counter()
        out = fn()
        print(f"{label}: {out} in {time.perf_counter() - t:.1f}s", flush=True)

    # Parameters that are PROPORTIONS of the data must scale with it,
    # or the 10x run measures parameter saturation instead of the
    # operator (both found by the first fixed-parameter 10M run):
    #   * bloom m_bits sized to the benchmark slice (0.1% of docs,
    #     ~25 shingles/doc): a fixed 2^20 at 10M docs is ~4 bits per
    #     inserted key -> FP ~0.16/probe -> 98% of the corpus flagged;
    #   * sparse-cosine max_df is a document-frequency cap — a fixed
    #     1000 at 10M docs drops EVERY term (df grows with the corpus)
    #     and times an empty join.
    bench_keys = (n_docs // 1000) * 25
    m_bits = 1 << max(20, (bench_keys * 32).bit_length())
    max_df = max(1000, n_docs // 1000)
    timed(
        f"bloom_contamination (m_bits=2^{m_bits.bit_length() - 1})",
        lambda: "%s contaminated" % f"""{D.bloom_contamination_scores(
            docs.filter(F.col('doc_id') % 1000 != 0),
            docs.filter(F.col('doc_id') % 1000 == 0),
            m_bits=m_bits, k_hashes=4,
        ).filter('is_contaminated').count():,}""",
    )
    timed(
        f"sparse_cosine_pairs (max_df={max_df})",
        lambda: f"{sparse_cosine_pairs(docs, max_df=max_df, threshold=0.6).count():,} pairs",
    )
    timed(
        "substring_dedup_report (l=8)",
        lambda: "%s docs >50%% covered" % f"""{D.substring_dedup_report(
            docs, l_tokens=8
        ).filter('dup_ratio > 0.5').count():,}""",
    )
    timed(
        "bigram_nll",
        lambda: "avg nll %.4f" % bigram_nll_scores(docs).agg(F.avg("nll")).first()[0],
    )
    docs.unpersist()


if __name__ == "__main__":
    main()
