"""Join operators Spark lacks natively: as-of join and small-dim range
join, composed from built-in DataFrame ops (SURVEY §7 custom-operator
preference: composition first, Pandas UDF only if semantics require).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F


def asof_join_backward(
    left: DataFrame,
    right: DataFrame,
    by: str,
    ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """For each left row, attach the most recent right row with
    right.ts <= left.ts within the same `by` group (backward, inclusive
    — pandas merge_asof / DuckDB ASOF JOIN semantics).

    Implementation: tag and union both sides, one window pass per `by`
    group carrying the last-seen right values forward, keep left rows.
    ONE shuffle on `by` total — versus a naive approach (per-left-row
    subquery or right-side re-join) that shuffles both inputs twice.
    Right rows sort before left rows at equal ts so ties are inclusive.
    """
    tagged_r = right.select(
        F.col(by),
        F.col(ts),
        F.lit(0).alias("__is_left"),
        *[F.col(c).alias(f"__r_{c}") for c in right_value_cols],
        F.col(ts).alias("__r_ts"),
    )
    tagged_l = left.withColumn("__is_left", F.lit(1))
    u = tagged_l.unionByName(tagged_r, allowMissingColumns=True)
    w = (
        W.partitionBy(by)
        .orderBy(F.col(ts), F.col("__is_left"))
        .rowsBetween(W.unboundedPreceding, 0)
    )
    carried = [F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__m_{c}") for c in right_value_cols]
    carried.append(F.last("__r_ts", ignorenulls=True).over(w).alias("__m_ts"))
    out = u.select("*", *carried).filter(F.col("__is_left") == 1)
    keep = [c for c in left.columns]
    return out.select(
        *keep,
        F.col("__m_ts").alias(f"asof_{ts}"),
        *[F.col(f"__m_{c}").alias(f"asof_{c}") for c in right_value_cols],
    )


def range_join_small(facts: DataFrame, ranges: DataFrame, value_col: str) -> DataFrame:
    """Join fact rows into [lo, hi) buckets from a SMALL range table.
    Non-equi joins have no hash strategy; broadcasting the range side
    turns this into a BroadcastNestedLoopJoin — linear in the fact
    side, fine for bounded range tables. For large range tables,
    bucketize both sides first (equi-join on bucket + residual filter).
    """
    cond = (F.col(value_col) >= ranges["lo"]) & (F.col(value_col) < ranges["hi"])
    return facts.join(F.broadcast(ranges), cond, "inner")


def interval_overlap_pairs(
    df: DataFrame,
    id_col: str,
    start_col: str,
    end_col: str,
    key_cols: list[str] | None = None,
    bucket_width: int = 600_000_000,
) -> DataFrame:
    """All pairs of OVERLAPPING intervals (strict: a.start < b.end AND
    b.start < a.end), a_id < b_id, with the exact overlap length —
    the interval-join problem `range_join_small` can't touch when both
    sides are large (its small side is broadcast).

    Scale shape — the standard interval-banding trick: each interval
    explodes into the fixed-width buckets it covers, candidates come
    from an equi-join on (key_cols..., bucket), and the exact overlap
    predicate filters them. Cost is sum-over-buckets of the bucket
    cross size instead of |A| x |B|; `bucket_width` (same units as the
    interval columns — default 600 s in microseconds) trades explode
    fan-out against bucket occupancy, exactly like LSH band width.

    `start_col`/`end_col` must be integer (e.g. `F.unix_micros`):
    integer in, integer overlap out — no float parity risk anywhere.
    Intervals spanning many buckets multiply the explode; cap or split
    pathological durations upstream.
    """
    keys = key_cols or []
    w = F.lit(bucket_width)
    # degenerate intervals are dropped explicitly: end < start would
    # feed Spark's sequence(hi, lo) a DESCENDING bucket list (phantom
    # candidates; DuckDB's generate_series yields nothing — an
    # engine-divergent trap), and end == start is the EMPTY interval,
    # which cannot overlap anything — keeping it would emit overlap=0
    # rows that contradict the strict-overlap contract.
    df = df.filter(F.col(end_col) > F.col(start_col))
    ex = df.select(
        F.col(id_col).alias("__iid"),
        *[F.col(k) for k in keys],
        F.col(start_col).alias("__s"),
        F.col(end_col).alias("__e"),
        F.explode(
            F.sequence(F.floor(F.col(start_col) / w), F.floor(F.col(end_col) / w))
        ).alias("__bucket"),
    )
    a = ex.select(
        F.col("__iid").alias("a_id"), *keys,
        F.col("__s").alias("__sa"), F.col("__e").alias("__ea"), "__bucket",
    )
    b = ex.select(
        F.col("__iid").alias("b_id"), *keys,
        F.col("__s").alias("__sb"), F.col("__e").alias("__eb"), "__bucket",
    )
    overlap = F.least("__ea", "__eb") - F.greatest("__sa", "__sb")
    return (
        a.join(b, on=[*keys, "__bucket"])
        .filter(F.col("a_id") < F.col("b_id"))
        .filter((F.col("__sa") < F.col("__eb")) & (F.col("__sb") < F.col("__ea")))
        .select("a_id", "b_id", *keys, overlap.alias("overlap"))
        .dropDuplicates(["a_id", "b_id"])
    )


def skyline_2d(df: DataFrame, x_col: str, y_col: str, buckets: int = 1024) -> DataFrame:
    """2D Pareto skyline: rows where no other row has x <= and y >=
    with at least one strict (x minimized, y maximized; negate a
    column to flip its direction). Duplicate (x, y) points do not
    dominate each other — all copies of a frontier point survive.

    Scale design (the naive form is an O(n^2) self-anti-join):
    1. GRID PRUNE — bucket x into a fixed grid (bounds from one tiny
       min/max agg). Any point in a strictly earlier bucket has
       strictly smaller x, so a point with y below the running
       strict-prefix bucket max is PROVABLY dominated and is dropped
       before any sort. The prefix max runs over <= `buckets` rows.
       Survivors are the frontier plus points tied with it inside
       their own bucket — typically a vanishing fraction.
    2. EXACT FINISH over survivors — per-x best y (one hash agg),
       then a single ordered pass: dominated iff a strictly-smaller x
       has best-y >= y, or the same x has best-y > y. The global
       window runs only on the pruned survivor set; if the data is so
       adversarial that pruning keeps everything (all one bucket),
       the sort is Spark's spillable external sort, not a buffer.

    NULL metrics are not part of the dominance order: rows with a
    NULL x or y are dropped up front (a NULL compares UNKNOWN against
    everything, so neither 'dominated' nor 'dominating' is decidable
    — SQL NOT-EXISTS would vacuously keep them, which is an artifact,
    not a frontier). Filter or impute before calling if NULL rows
    must be retained.
    """
    df = df.filter(F.col(x_col).isNotNull() & F.col(y_col).isNotNull())
    bounds = df.select(
        F.min(x_col).alias("lo"), F.max(x_col).alias("hi"), F.count(F.lit(1)).alias("n")
    ).collect()[0]
    if bounds["n"] == 0:
        return df
    lo, hi = float(bounds["lo"]), float(bounds["hi"])
    width = (hi - lo) / buckets or 1.0
    bucket = F.least(
        F.lit(buckets - 1), F.floor((F.col(x_col) - F.lit(lo)) / F.lit(width))
    ).cast("int")
    b = df.withColumn("__b", bucket)
    per_bucket = b.groupBy("__b").agg(F.max(y_col).alias("__bymax"))
    wprev = W.orderBy("__b").rowsBetween(W.unboundedPreceding, -1)
    prefix = per_bucket.withColumn("__prevmax", F.max("__bymax").over(wprev)).select(
        "__b", "__prevmax"
    )
    survivors = b.join(F.broadcast(prefix), on="__b").filter(
        F.col("__prevmax").isNull() | (F.col(y_col) > F.col("__prevmax"))
    )
    # exact finish on the pruned set
    per_x = survivors.groupBy(x_col).agg(F.max(y_col).alias("__xbest"))
    wx = W.orderBy(x_col).rowsBetween(W.unboundedPreceding, -1)
    ranked = per_x.withColumn("__strict", F.max("__xbest").over(wx))
    return (
        survivors.join(ranked, on=x_col)
        .filter(
            (F.col("__strict").isNull() | (F.col(y_col) > F.col("__strict")))
            & (F.col(y_col) >= F.col("__xbest"))
        )
        .drop("__b", "__prevmax", "__xbest", "__strict")
    )
