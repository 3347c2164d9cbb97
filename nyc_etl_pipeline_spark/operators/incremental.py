"""Incremental aggregate maintenance: mergeable partial aggregates.

At 100 TB a mart is never recomputed from scratch when a new day of
data lands — the engine stores per-key partial states and merges the
delta batch's partials into them (the view-maintenance counterpart of
the reference's watermark-incremental fact load, gold.py:56-65, which
appends raw rows but recomputes aggregates downstream).

The state is the classic algebraic-aggregate decomposition
(sum, non-null count, min, max, row count): every one of these merges
by a plain re-aggregation over the SAME functions, so

    finalize(merge(partial(base), partial(delta))) == finalize(partial(base ∪ delta))

holds exactly — including avg, which is finalized as sum/count and is
NOT computed per-batch (per-batch averages don't merge). That identity
is what q120 oracle-checks: the Spark side takes the split/merge path,
the DuckDB oracle aggregates the full table directly, and the gate
hash-compares them.

Scale shape: each partial_aggregate is one map-side-combinable
hash aggregation; merge_partials is a union of already-tiny per-key
states followed by one more hash aggregation. The stored-state table
is O(distinct keys), so the recurring cost of maintaining the mart is
proportional to the DELTA, not to history.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import round_half_up


def partial_aggregate(df: DataFrame, keys: list[str], measures: list[str]) -> DataFrame:
    """Per-key mergeable state: n_rows plus (sum, cnt, min, max) per
    measure. Column names are the public contract — stored mart state
    keeps exactly these, so any future batch can merge against it."""
    aggs = [F.count(F.lit(1)).alias("n_rows")]
    for m in measures:
        # DECIMAL(28,6) accumulation makes the merge identity EXACT
        # for doubles too (not merely round-stable): any regrouping of
        # partials is integer arithmetic (functions.dec_sum rationale)
        aggs += [
            F.sum(F.col(m).cast("decimal(28,6)")).alias(f"sum_{m}"),
            F.count(m).alias(f"cnt_{m}"),
            F.min(m).alias(f"min_{m}"),
            F.max(m).alias(f"max_{m}"),
        ]
    return df.groupBy(*keys).agg(*aggs)


def merge_partials(parts: list[DataFrame], keys: list[str], measures: list[str]) -> DataFrame:
    """Merge any number of partial-state tables into one: sums and
    counts re-sum, mins re-min, maxes re-max. Associative and
    commutative — batch arrival order can never change the result."""
    unioned = reduce(lambda a, b: a.unionByName(b), parts)
    aggs = [F.sum("n_rows").alias("n_rows")]
    for m in measures:
        aggs += [
            F.sum(f"sum_{m}").alias(f"sum_{m}"),
            F.sum(f"cnt_{m}").alias(f"cnt_{m}"),
            F.min(f"min_{m}").alias(f"min_{m}"),
            F.max(f"max_{m}").alias(f"max_{m}"),
        ]
    return unioned.groupBy(*keys).agg(*aggs)


def finalize(partials: DataFrame, measures: list[str], digits: int = 3) -> DataFrame:
    """Derive the non-mergeable outputs (avg = sum/cnt) from the state.
    Sums and avgs are rounded with the cross-engine round_half_up so a
    DuckDB oracle computing the same expressions hash-matches."""
    out = partials
    for m in measures:
        s_dbl = F.col(f"sum_{m}").cast("double")
        out = out.withColumn(
            f"avg_{m}",
            round_half_up(s_dbl / F.col(f"cnt_{m}"), digits),
        ).withColumn(f"sum_{m}", round_half_up(s_dbl, digits))
    return out


def join_delta(
    a_old: DataFrame, da: DataFrame, b_old: DataFrame, db: DataFrame, on: list[str]
) -> DataFrame:
    """The DELTA of an inner join under insertions on both sides —
    textbook incremental-view-maintenance algebra:

        Δ(A ⋈ B) = (A_old ⋈ ΔB) ∪ (ΔA ⋈ B_old) ∪ (ΔA ⋈ ΔB)

    With disjoint deltas (ΔA ∩ A_old = ∅, same for B) the three terms
    are pairwise disjoint, so a plain union (no dedup) is exact:
    appending this delta to the stored join result maintains it
    without re-joining history. At 100 TB the three delta joins each
    have one DELTA-sized side — cost is proportional to the new
    batch, not to the accumulated tables (the big-side scan of
    A_old ⋈ ΔB broadcasts or bucket-joins the small ΔB).

    q156 proves the algebra the q120 way: Spark takes the
    old ∪ delta path, the oracle joins the COMPLETE tables — hash
    equality means no duplicated and no lost join rows.
    """
    return (
        a_old.join(db, on)
        .unionByName(da.join(b_old, on))
        .unionByName(da.join(db, on))
    )


def maintained_join(
    old_join: DataFrame,
    a_old: DataFrame,
    da: DataFrame,
    b_old: DataFrame,
    db: DataFrame,
    on: list[str],
) -> DataFrame:
    """old stored join result + `join_delta` = the join of the
    updated tables. The union matches columns BY NAME
    (unionByName) — the stored result needs the same column NAMES as
    the delta join's projection, in any order; a missing/renamed
    column fails fast rather than silently misaligning."""
    return old_join.unionByName(join_delta(a_old, da, b_old, db, on))
