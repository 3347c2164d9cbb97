"""Deterministic sampling and dataset splitting for training-data
pipelines.

`sample()`/`split()` hash a stable key instead of using rand():
- reproducible across runs, executors, and retries (a rand()-based
  sample changes under task re-execution — silent train/test leakage
  on speculative retries);
- consistent across tables: sampling orders and lineitem by the same
  order key keeps referential integrity in the sample;
- no coordination: pure per-row projection, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_BUCKETS = 1_000_000


def _bucket(key_cols: list[str], salt: str) -> Column:
    return F.pmod(F.xxhash64(F.lit(salt), *[F.col(c) for c in key_cols]), F.lit(_BUCKETS))


def sample(df: DataFrame, key_cols: list[str], fraction: float, salt: str = "v1") -> DataFrame:
    """Deterministic ~fraction sample keyed on key_cols. Same key ->
    same in/out decision, always."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError(f"fraction must be in [0,1], got {fraction}")
    return df.filter(_bucket(key_cols, salt) < int(fraction * _BUCKETS))


def split(
    df: DataFrame, key_cols: list[str], weights: dict[str, float], salt: str = "v1"
) -> dict[str, DataFrame]:
    """Disjoint, exhaustive named splits (e.g. train/val/test).
    Weights must sum to 1. Each key lands in exactly one split,
    deterministically — adding rows later never moves existing keys
    between splits (stable assignment under dataset growth)."""
    total = sum(weights.values())
    if abs(total - 1.0) > 1e-9:
        raise ValueError(f"weights must sum to 1, got {total}")
    bucket = _bucket(key_cols, salt)
    out: dict[str, DataFrame] = {}
    lo = 0.0
    items = list(weights.items())
    for i, (name, w) in enumerate(items):
        hi = lo + w
        lo_b = int(lo * _BUCKETS)
        hi_b = _BUCKETS if i == len(items) - 1 else int(hi * _BUCKETS)
        out[name] = df.filter((bucket >= lo_b) & (bucket < hi_b))
        lo = hi
    return out
