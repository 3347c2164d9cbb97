"""Time-series regularization: dense-grid gap filling with
forward fill — the operator family Spark has no built-in for (pandas
`resample`/`ffill` equivalents), expressed as a composition of
built-in DataFrame ops so Catalyst/Tungsten still run the whole plan
JVM-side (no UDF).

Shape: sparse per-entity observations -> one row per (entity, bucket)
for every bucket between that entity's first and last observation,
missing buckets carrying count 0 and the last previously-observed
value (gaps-and-islands forward fill via last(ignorenulls)).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import Window as W
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import round_half_up
from nyc_etl_pipeline_spark.functions import dec_avg

_UNITS = {"hour": "1 hour", "day": "1 day", "minute": "1 minute"}


def ewma_bounded(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    order_cols: list[str] | None = None,
    alpha: float = 0.5,
    lookback: int = 8,
    ndigits: int = 6,
) -> DataFrame:
    """Append `ewma`: exponentially-weighted moving average of
    `value_col` over the last `lookback` observations per entity,
    s_i = alpha*x_i + (1-alpha)*s_{i-1} folded left-to-right with the
    window's OLDEST value as the seed.

    Built as collect_list over a bounded window frame + a JVM
    `aggregate` fold — no UDF, no state store. The fold is evaluated
    in frame order, so any engine replaying the identical sequential
    recurrence (the DuckDB oracle uses list() OVER + list_reduce)
    produces bit-identical doubles; with alpha=0.5 every multiply is
    an exact halving, making the parity immune even to FMA-contraction
    differences.

    Scale: one shuffle on entity, per-entity window sort (spillable),
    frame bounded at `lookback` rows -> per-row cost O(lookback).
    `order_cols` must complete a total order within entity (pass the
    event id — equal timestamps otherwise make frame contents
    nondeterministic)."""
    order = [F.col(ts_col)] + [F.col(c) for c in (order_cols or [])]
    w = (
        W.partitionBy(entity_col)
        .orderBy(*order)
        .rowsBetween(-(lookback - 1), 0)
    )
    vals = F.collect_list(F.col(value_col).cast("double")).over(w)
    fold = F.aggregate(
        F.slice(vals, 2, F.size(vals) - 1),
        F.element_at(vals, 1),
        lambda acc, x: acc * (1.0 - alpha) + x * alpha,
    )
    return df.withColumn("ewma", round_half_up(fold, ndigits))


def gapfill(
    df: DataFrame,
    entity_col: str,
    ts_col: str,
    value_col: str,
    unit: str = "hour",
    ndigits: int = 3,
) -> DataFrame:
    """-> (entity, bucket, n_events, filled_avg): one row per `unit`
    bucket from each entity's first to last observation; empty buckets
    get n_events=0 and filled_avg forward-filled from the most recent
    observed bucket's mean.

    Scale shape (100 TB lens):
    - the raw-event aggregation is ONE shuffle keyed (entity, bucket)
      with full map-side partial aggregation;
    - the span agg rides the same data, keyed entity;
    - the dense grid is sequence()+explode on the AGGREGATED spans —
      grid size is hours-in-span per entity, never proportional to raw
      event count. A pathological entity spanning 10 years of hourly
      buckets is still only ~90k rows;
    - the fill is a per-entity window (last ignorenulls over an
      unbounded-preceding frame) — partitioned by entity, so skew
      follows entity time-span, not event volume.
    """
    if unit not in _UNITS:
        raise ValueError(f"unit must be one of {sorted(_UNITS)}, got {unit!r}")
    bucketed = df.groupBy(
        F.col(entity_col), F.date_trunc(unit, F.col(ts_col)).alias("bucket")
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        dec_avg(value_col).alias("__avg"),
    )
    spans = bucketed.groupBy(entity_col).agg(
        F.min("bucket").alias("__lo"), F.max("bucket").alias("__hi")
    )
    grid = spans.select(
        entity_col,
        F.explode(
            F.sequence("__lo", "__hi", F.expr(f"INTERVAL {_UNITS[unit]}"))
        ).alias("bucket"),
    )
    joined = grid.join(bucketed, on=[entity_col, "bucket"], how="left")
    w = W.partitionBy(entity_col).orderBy("bucket")
    return joined.select(
        entity_col,
        "bucket",
        F.coalesce(F.col("__n"), F.lit(0)).cast("bigint").alias("n_events"),
        round_half_up(
            F.last("__avg", ignorenulls=True).over(w), ndigits
        ).alias("filled_avg"),
    )


def rolling_median(
    part_col: str,
    order_col: str,
    value_col: str,
    preceding: int = 6,
) -> "Column":
    """Exact rolling median over a trailing row frame — the robust
    smoother for monitoring series (a mean-based rolling average
    chases every spike; the median ignores anything rarer than half
    the frame).

    Spark refuses `median`/`percentile` with a window frame
    (INVALID_WINDOW_SPEC_FOR_AGGREGATION_FUNC), so this collects the
    frame into an array (bounded: `preceding`+1 elements regardless
    of data size) and interpolates 1 + (n-1)*0.5 between the two
    middle ranks — the identical lower + frac*(upper-lower) form as
    `exact_percentiles_sorted` / DuckDB's windowed quantile_cont.
    Returns a pure window Column (bound to no particular DataFrame):
    select it on any frame carrying the three named columns.
    """
    w = (
        W.partitionBy(part_col)
        .orderBy(order_col)
        .rowsBetween(-preceding, W.currentRow)
    )
    arr = F.array_sort(F.collect_list(F.col(value_col).cast("double")).over(w))
    n = F.size(arr)
    pos = 1 + (n - 1) * F.lit(0.5)
    lo = F.floor(pos).cast("int")
    hi = F.ceil(pos).cast("int")
    lo_v = F.element_at(arr, lo)
    hi_v = F.element_at(arr, hi)
    return lo_v + (pos - F.floor(pos)) * (hi_v - lo_v)
