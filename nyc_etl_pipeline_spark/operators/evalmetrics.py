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


def retrieval_eval(
    ranked: DataFrame,
    relevant: DataFrame,
    k: int = 10,
    query_col: str = "query_id",
    id_col: str = "doc_id",
    rank_col: str = "rank",
) -> DataFrame:
    """Ranked-retrieval quality per query: MRR, recall@k, nDCG@k —
    the retrieval counterpart of roc_auc (which scores pointwise
    scorers). `ranked` is (query, doc, rank) from any ranker
    (BM25, ANN, hybrid RRF); `relevant` is the (query, doc) ground
    truth.

        MRR    = 1 / rank of the first relevant hit (0 if none in top-k)
        recall = |relevant ∩ top-k| / |relevant|
        nDCG@k = Σ_hits 1/log2(rank+1)  /  Σ_{i=1..min(|rel|,k)} 1/log2(i+1)

    Determinism: counts and first-hit ranks are integers; the DCG and
    ideal-DCG sums are rank-ORDERED folds (the q113 discipline), so
    the single log2 per term is the documented 1-ulp libm residual
    and merge order cannot move a digit. Queries with no relevant
    docs get NULL recall/ndcg (undefined, not zero).

    Scale shape: one equi-join of the top-k slice against the truth
    set, two query-keyed aggregates; per-query fold size <= k.
    Returns (query, n_rel, hits_at_k, mrr, recall_at_k, ndcg_at_k),
    metrics rounded 6.
    """
    q, d, r = query_col, id_col, rank_col
    topk = ranked.filter(F.col(r) <= k).select(q, d, r)
    rel_n = relevant.groupBy(q).agg(F.count(F.lit(1)).cast("bigint").alias("n_rel"))
    hit_aggs = (
        topk.join(relevant.select(q, d), on=[q, d])
        .groupBy(q)
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("hits_at_k"),
            F.min(r).cast("bigint").alias("__first"),
            F.aggregate(
                F.sort_array(F.collect_list(F.col(r).cast("bigint"))),
                F.lit(0.0),
                lambda acc, rk: acc + (F.lit(1.0) / F.log2(rk.cast("double") + 1.0)),
            ).alias("__dcg"),
        )
    )
    m = F.least(F.col("n_rel"), F.lit(k)).cast("int")
    idcg = F.aggregate(
        F.sequence(F.lit(1), m),
        F.lit(0.0),
        lambda acc, i: acc + (F.lit(1.0) / F.log2(i.cast("double") + 1.0)),
    )
    base = ranked.select(q).dropDuplicates().join(rel_n, on=q, how="left").join(
        hit_aggs, on=q, how="left"
    )
    return base.select(
        q,
        F.coalesce("n_rel", F.lit(0)).cast("bigint").alias("n_rel"),
        F.coalesce("hits_at_k", F.lit(0)).cast("bigint").alias("hits_at_k"),
        round_half_up(
            F.when(F.col("__first").isNotNull(), F.lit(1.0) / F.col("__first"))
            .otherwise(F.lit(0.0)),
            6,
        ).alias("mrr"),
        F.when(
            F.coalesce("n_rel", F.lit(0)) > 0,
            round_half_up(F.coalesce("hits_at_k", F.lit(0)) / F.col("n_rel"), 6),
        ).alias("recall_at_k"),
        F.when(
            F.coalesce("n_rel", F.lit(0)) > 0,
            round_half_up(F.coalesce("__dcg", F.lit(0.0)) / idcg, 6),
        ).alias("ndcg_at_k"),
    )
