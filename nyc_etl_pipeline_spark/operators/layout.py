"""Data-layout operators: multi-dimensional clustering (Z-order /
Morton curve) for data skipping.

At 100 TB, scan cost is dominated by how much data a filter can SKIP.
Parquet/ORC keep per-row-group min/max statistics; a table sorted by
one column skips beautifully on that column and not at all on any
other. Interleaving the bits of two (or more) columns' rank buckets
produces a key whose sort order keeps BOTH dimensions locally narrow
in every row group — the layout trick behind Delta/Iceberg OPTIMIZE
ZORDER BY, built here from plain Column expressions so it works on a
vanilla parquet Warehouse.

Everything is integer bit math (shiftleft/shiftright/&), deterministic
and reproducible in any engine — `sql_interleave_bits` emits the
identical DuckDB expression, so the key itself is oracle-checkable
(q122). The write path is `zorder_write`: bucket → interleave →
repartitionByRange on the key → sortWithinPartitions → write; range
partitioning keeps whole files disjoint in key space, the local sort
keeps row groups disjoint within a file.
"""

from __future__ import annotations

from functools import reduce
from operator import add

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def bucketize(col: Column, lo: Column, hi: Column, bits: int) -> Column:
    """Map an integer column with known [lo, hi] range onto
    [0, 2^bits): rank-free fixed-width bucketing — one multiply and
    one divide per row, no window, no shuffle. Integer arithmetic
    only, so both engines agree bit-for-bit."""
    span = hi - lo + F.lit(1)
    # explicit floor: Spark's double->bigint cast truncates but
    # DuckDB's ROUNDS — floor() first makes both engines identical
    # (exact for inputs < 2^53 / 2^bits).
    return F.floor((col - lo) * F.lit(1 << bits) / span).cast("bigint")


def sql_bucketize(col: str, lo: str, hi: str, bits: int) -> str:
    """DuckDB fragment computing the identical value as `bucketize`."""
    return (
        f"CAST(floor(({col} - ({lo})) * {1 << bits} "
        f"/ (({hi}) - ({lo}) + 1)) AS BIGINT)"
    )


def interleave_bits(x: Column, y: Column, bits: int = 16) -> Column:
    """Morton/Z-order interleave of the low `bits` bits of two
    non-negative integer columns: x's bit i lands at position 2i,
    y's at 2i+1. 2*bits <= 62 keeps the key in a signed 64-bit long."""
    if not 1 <= bits <= 31:
        raise ValueError("bits must be in [1, 31]")
    terms = []
    for i in range(bits):
        terms.append(F.shiftleft(F.shiftright(x, i).bitwiseAND(F.lit(1)), 2 * i))
        terms.append(F.shiftleft(F.shiftright(y, i).bitwiseAND(F.lit(1)), 2 * i + 1))
    return reduce(add, terms).cast("bigint")


def sql_interleave_bits(x: str, y: str, bits: int = 16) -> str:
    """DuckDB fragment computing the identical value as
    `interleave_bits` (generated from the same loop)."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return "CAST(" + " + ".join(terms) + " AS BIGINT)"


def zorder_key(
    df: DataFrame, c1: str, c2: str, bits: int = 16, key_col: str = "zkey"
) -> DataFrame:
    """Add a Z-order key over two integer columns. Column ranges are
    computed in one tiny aggregate and attached via a broadcast
    single-row cross join (the established scalar-broadcast pattern)
    — no second pass over the data, no driver round-trip."""
    stats = df.agg(
        F.min(c1).alias("__lo1"), F.max(c1).alias("__hi1"),
        F.min(c2).alias("__lo2"), F.max(c2).alias("__hi2"),
    )
    key = interleave_bits(
        bucketize(F.col(c1), F.col("__lo1"), F.col("__hi1"), bits),
        bucketize(F.col(c2), F.col("__lo2"), F.col("__hi2"), bits),
        bits,
    )
    return (
        df.crossJoin(F.broadcast(stats))
        .withColumn(key_col, key)
        .drop("__lo1", "__hi1", "__lo2", "__hi2")
    )


def zorder_write(
    df: DataFrame,
    path: str,
    c1: str,
    c2: str,
    bits: int = 16,
    n_files: int = 8,
) -> None:
    """Write `df` as parquet clustered on Z(c1, c2): range-partition
    by the key (disjoint key ranges per file) and sort within each
    partition (disjoint key ranges per row group). Filters on EITHER
    column can then skip most row groups via footer min/max stats —
    see tests/test_scale.py for the measured skipping contract."""
    keyed = zorder_key(df, c1, c2, bits)
    (
        keyed.repartitionByRange(n_files, "zkey")
        .sortWithinPartitions("zkey")
        .drop("zkey")
        .write.mode("overwrite")
        .parquet(path)
    )
