"""Model-evaluation metrics over (score, label) columns — the
measurement half of the classifier/retrieval stack (classify.py
trains, retrieval ranks; this scores the scorer).

Both metrics are formulated so the expensive part is integer
arithmetic and the single final division is the only float op:

  * ROC-AUC via the Mann-Whitney rank statistic with AVERAGE ranks
    for ties — bigint sums, exact for any tie structure;
  * calibration bins + ECE from exact counts and decimal-accumulated
    confidence sums.

Scale shape: one sort-shuffle per group for the rank window, one
group aggregate each — nothing pairwise (the naive AUC is the
all-pairs P(score_pos > score_neg); the rank identity removes the
quadratic join).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import dec_sum, round_half_up


def roc_auc(
    df: DataFrame,
    score_col: str,
    label_col: str,
    group_cols: list[str] | None = None,
) -> DataFrame:
    """Per-group ROC-AUC = P(score of a random positive > score of a
    random negative) + ½·P(equal), computed by the Mann-Whitney rank
    identity:

        AUC = (Σ_pos avgrank - n⁺(n⁺+1)/2) / (n⁺ n⁻)

    Ties get AVERAGE ranks — avgrank = rank_min + (tie_size - 1)/2 —
    kept in integers by doubling: 2·Σ avgrank = Σ (2·rank_min +
    tie_size - 1). Everything up to the last division is bigint, so
    the value is exact for any tie structure and any partitioning;
    groups with no positives or no negatives get NULL (AUC undefined).

    Returns (group..., n_pos, n_neg, auc rounded 6).
    """
    gcols = group_cols or []
    part = [F.col(c) for c in gcols]
    w_rank = W.partitionBy(*part).orderBy(F.col(score_col).asc())
    w_tie = W.partitionBy(*part, F.col(score_col))
    lab = F.col(label_col).cast("bigint")
    ranked = df.select(
        *gcols,
        lab.alias("__y"),
        F.rank().over(w_rank).cast("bigint").alias("__rmin"),
        F.count(F.lit(1)).over(w_tie).cast("bigint").alias("__tie"),
    )
    agg = ranked.groupBy(*gcols).agg(
        F.sum("__y").alias("n_pos"),
        (F.count(F.lit(1)) - F.sum("__y")).alias("n_neg"),
        F.sum(
            F.when(F.col("__y") == 1, 2 * F.col("__rmin") + F.col("__tie") - 1)
            .otherwise(0)
        ).alias("__2sumrank"),
    )
    auc = (
        F.col("__2sumrank") - F.col("n_pos") * (F.col("n_pos") + 1)
    ) / (2.0 * F.col("n_pos") * F.col("n_neg"))
    return agg.select(
        *gcols,
        F.col("n_pos").cast("bigint").alias("n_pos"),
        F.col("n_neg").cast("bigint").alias("n_neg"),
        F.when(
            (F.col("n_pos") > 0) & (F.col("n_neg") > 0), round_half_up(auc, 6)
        ).alias("auc"),
    )


def calibration_report(
    df: DataFrame,
    score_col: str,
    label_col: str,
    n_bins: int = 10,
) -> DataFrame:
    """Fixed-width calibration bins over a [0, 1] score: per bin the
    count, mean confidence (decimal-accumulated), and empirical
    accuracy; every row also carries the expected calibration error

        ECE = Σ_b (n_b / N) · |acc_b - conf_b|

    (the weighted reliability-diagram gap). Scores land in bin
    min(floor(score·B), B-1); counts and label sums are exact
    integers, confidences are DECIMAL(28,6) sums, so the only float
    division is per finalized bin. Returns one row per non-empty bin:
    (bin, n, conf, acc, ece), conf/acc/ece rounded 6.
    """
    lab = F.col(label_col).cast("bigint")
    bin_col = F.least(
        F.floor(F.col(score_col) * n_bins).cast("int"), F.lit(n_bins - 1)
    )
    per_bin = (
        df.select(bin_col.alias("bin"), F.col(score_col).alias("__s"), lab.alias("__y"))
        .groupBy("bin")
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n"),
            dec_sum("__s").alias("__s_sum"),
            F.sum("__y").cast("bigint").alias("__n_pos"),
        )
        .select(
            "bin",
            "n",
            (F.col("__s_sum") / F.col("n")).alias("__conf"),
            (F.col("__n_pos") / F.col("n")).alias("__acc"),
        )
    )
    totals = per_bin.agg(
        F.sum("n").alias("__N"),
        # Σ n_b·|acc-conf| accumulated in decimal so bin order can't
        # move the last ulp of the final division
        dec_sum(F.col("n") * F.abs(F.col("__acc") - F.col("__conf"))).alias("__gap"),
    )
    return per_bin.crossJoin(F.broadcast(totals)).select(
        F.col("bin").cast("bigint").alias("bin"),
        "n",
        round_half_up(F.col("__conf"), 6).alias("conf"),
        round_half_up(F.col("__acc"), 6).alias("acc"),
        round_half_up(F.col("__gap") / F.col("__N"), 6).alias("ece"),
    )
