"""Data-quality profiling: per-column null/distinct statistics — the
cheap pre-flight a pipeline runs before committing a batch (deequ-style
checks, DataFrame-only).

One aggregate job per profile (all columns in a single pass via one
wide agg, reshaped to long) — NOT one job per column; at 100 TB a
per-column loop of scans is the difference between minutes and hours.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, approx_distinct: bool = False) -> DataFrame:
    """-> (column, n_rows, n_nulls, n_distinct) per column.

    approx_distinct=True swaps exact countDistinct for HLL
    (approx_count_distinct) — the right call at scale where a 2%
    estimate is worth avoiding a per-column shuffle.
    """
    aggs = [F.count(F.lit(1)).alias("__n")]
    for c in df.columns:
        aggs.append(F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"__nulls_{c}"))
        if approx_distinct:
            aggs.append(F.approx_count_distinct(c).alias(f"__dist_{c}"))
        else:
            aggs.append(F.countDistinct(c).alias(f"__dist_{c}"))
    wide = df.agg(*aggs)
    stacked = wide.select(
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(c).alias("column"),
                    F.col("__n").alias("n_rows"),
                    F.col(f"__nulls_{c}").cast("bigint").alias("n_nulls"),
                    F.col(f"__dist_{c}").cast("bigint").alias("n_distinct"),
                )
                for c in df.columns
            ])
        ).alias("s")
    )
    return stacked.select("s.column", "s.n_rows", "s.n_nulls", "s.n_distinct")
