"""Slowly-changing-dimension (type 2) operators.

The reference's gold layer upserts dimensions type-1 style — new keys
are appended, changed attributes overwrite history (gold.py:150-240:
anti-join then insert). A warehouse that must answer "what was this
dimension value WHEN the fact happened" needs SCD type 2: one row per
(key, validity interval), closed by the next change.

Two forms:

- ``scd2_from_log``: derive the full interval history from an event
  log in one pass — the backfill/bootstrap form. Window functions
  only (lag to detect changes, lead to close intervals), partitioned
  by the business key: at 100 TB the shuffle is one exchange on the
  key, per-key state is a sort — no driver-side state, no iteration.
- ``scd2_merge``: the incremental form — merge one new snapshot batch
  into an existing SCD2 table (close changed rows, insert new
  versions, pass history through untouched). One shuffle on the key
  for the full-outer join; history rows never rewrite, so with the
  dimension partitioned/bucketed by key the merge touches only
  current rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_from_log(
    df: DataFrame,
    key_cols: list[str],
    attr_col: str,
    ts_col: str,
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Collapse an event log into SCD2 validity intervals.

    Consecutive rows with the same ``attr_col`` value per key merge
    into one interval; each change opens a new interval stamped
    ``valid_from`` = change time, closed by the next change's time
    (``valid_to`` null on the current interval). ``tie_cols`` breaks
    same-timestamp ordering deterministically (required for a stable
    oracle comparison).
    """
    order = [F.col(ts_col).asc()] + [F.col(c).asc() for c in (tie_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changes = (
        df.withColumn("__prev", F.lag(attr_col).over(w))
        .filter(F.col("__prev").isNull() | (F.col("__prev") != F.col(attr_col)))
        .drop("__prev")
    )
    # Same tie-broken order as the change-detection window: two retained
    # changes sharing a timestamp within a key would otherwise get a
    # nondeterministic lead() assignment.
    w2 = Window.partitionBy(*key_cols).orderBy(*order)
    return changes.select(
        *key_cols,
        F.col(attr_col),
        F.col(ts_col).alias("valid_from"),
        F.lead(ts_col).over(w2).alias("valid_to"),
    ).withColumn("is_current", F.col("valid_to").isNull())


def scd2_merge(
    dim: DataFrame,
    snapshot: DataFrame,
    key_cols: list[str],
    attr_cols: list[str],
    effective_ts,
) -> DataFrame:
    """Merge a snapshot batch (one row per key, current attribute
    values) into an SCD2 table with columns
    ``key_cols + attr_cols + [valid_from, valid_to, is_current]``.

    - unchanged keys: current row passes through;
    - changed keys: current row closes (valid_to = effective_ts),
      a new current row opens (valid_from = effective_ts);
    - new keys: a new current row opens;
    - keys absent from the snapshot: unchanged (absence is not a
      delete — feed an explicit tombstone attr for deletions);
    - history (closed) rows pass through untouched.
    """
    eff = F.lit(effective_ts).cast("timestamp")
    history = dim.filter(~F.col("is_current"))
    current = dim.filter(F.col("is_current"))

    snap = snapshot.select(
        *key_cols,
        *[F.col(c).alias(f"__new_{c}") for c in attr_cols],
        F.lit(True).alias("__in_snap"),
    )
    j = current.join(snap, on=key_cols, how="full_outer")

    changed = F.lit(False)
    for c in attr_cols:
        changed = changed | ~F.col(c).eqNullSafe(F.col(f"__new_{c}"))
    # presence markers survive all-null attribute values on either side
    has_cur = F.col("valid_from").isNotNull()
    has_new = F.col("__in_snap").isNotNull()

    kept_current = j.filter(has_cur & (~has_new | ~changed)).select(dim.columns)
    closed = (
        j.filter(has_cur & has_new & changed)
        .select(
            *key_cols,
            *attr_cols,
            F.col("valid_from"),
            eff.alias("valid_to"),
            F.lit(False).alias("is_current"),
        )
    )
    opened = (
        j.filter(has_new & (~has_cur | changed))
        .select(
            *key_cols,
            *[F.col(f"__new_{c}").alias(c) for c in attr_cols],
            eff.alias("valid_from"),
            F.lit(None).cast("timestamp").alias("valid_to"),
            F.lit(True).alias("is_current"),
        )
    )
    return history.unionByName(kept_current).unionByName(closed).unionByName(opened)


def cdc_snapshot(
    log: DataFrame,
    key_cols: list[str],
    ts_col: str,
    op_col: str,
    delete_op: str = "D",
    tie_cols: list[str] | None = None,
) -> DataFrame:
    """Apply a CDC change log to produce the current snapshot: per
    key, the latest row wins (insert/update carry the new image),
    and a key whose LATEST op is a delete is absent from the result.

    The missing piece between q91's latest-wins upsert (no deletes)
    and scd2 history: replaying a Debezium/binlog-style feed into a
    queryable table. One window over one key-partitioned exchange —
    the same shuffle a MERGE would pay, with no driver-side state.
    `tie_cols` break same-timestamp ties deterministically (feeds
    carry a log sequence number; default none = ts must be unique
    per key, as in an LSN-stamped log).
    """
    order = [F.col(ts_col).desc()] + [F.col(c).desc() for c in (tie_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    return (
        log.withColumn("__rn", F.row_number().over(w))
        .filter((F.col("__rn") == 1) & (F.col(op_col) != delete_op))
        .drop("__rn")
    )


def diff_tables(
    old: DataFrame, new: DataFrame, key_cols: list[str], compare_cols: list[str]
) -> DataFrame:
    """Data-diff audit between two versions of a table: ONE full-outer
    join on the key and ONE aggregate produce row-status counts
    (added / removed / changed / unchanged) plus per-column change
    counts — the validation step after a CDC apply or a backfill,
    at the cost of a single co-partitioned join (each side shuffles
    once on the key; no second scan for the per-column breakdown).

    NULL-safe comparison via eqNullSafe: NULL -> value and
    value -> NULL both count as changes, NULL -> NULL does not.

    PRECONDITION: key_cols uniquely identify a row on EACH side
    (the cdc_snapshot output contract). Duplicate keys fan out the
    full-outer join and silently inflate every count; callers diffing
    raw (pre-snapshot) data must dropDuplicates(key_cols) first.
    Returns long format (metric, n), integer-only.
    """
    o = old.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols],
        *[F.col(c).alias(f"__o_{c}") for c in compare_cols],
        F.lit(1).alias("__in_old"),
    )
    n = new.select(
        *[F.col(k).alias(f"__k_{k}") for k in key_cols],
        *[F.col(c).alias(f"__n_{c}") for c in compare_cols],
        F.lit(1).alias("__in_new"),
    )
    j = o.join(n, on=[f"__k_{k}" for k in key_cols], how="full_outer")
    both = F.col("__in_old").isNotNull() & F.col("__in_new").isNotNull()
    col_changed = {
        c: both & ~F.col(f"__o_{c}").eqNullSafe(F.col(f"__n_{c}")) for c in compare_cols
    }
    any_changed = F.lit(False)
    for c in compare_cols:
        any_changed = any_changed | col_changed[c]
    aggs = [
        F.count(F.when(F.col("__in_old").isNull(), 1)).alias("added"),
        F.count(F.when(F.col("__in_new").isNull(), 1)).alias("removed"),
        F.count(F.when(any_changed, 1)).alias("changed"),
        F.count(F.when(both & ~any_changed, 1)).alias("unchanged"),
    ] + [F.count(F.when(col_changed[c], 1)).alias(f"col_{c}") for c in compare_cols]
    wide = j.agg(*aggs)
    metrics = ["added", "removed", "changed", "unchanged"] + [
        f"col_{c}" for c in compare_cols
    ]
    return wide.select(
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(m).alias("metric"), F.col(m).alias("n"))
                    for m in metrics
                ]
            )
        ).alias("s")
    ).select("s.metric", "s.n")
