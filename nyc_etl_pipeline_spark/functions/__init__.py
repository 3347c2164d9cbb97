"""Shared scalar-function helpers.

round_half_up / sql_round_half_up: cross-engine deterministic rounding.
Spark's round() decides halves on the exact binary expansion
(BigDecimal HALF_UP) while DuckDB rounds the scaled double — they
disagree on values like 263856.5595. Both helpers compute the SAME
double expression floor(x * 10^d + 0.5) / 10^d, so engine results are
bit-identical by construction (floor is exact on doubles).

Contract bound: parity is guaranteed for |x * 10^d| < 2^53
(hypothesis-tested in tests/test_properties.py). Beyond that, doubles
can't hold sub-integer precision and Spark's BigDecimal floor diverges
from C floor — but "rounding to d digits" is meaningless there anyway.
All suite aggregates are orders of magnitude below the bound.

Literal-injection trap (VERDICT r5 item 4, root-caused round 6): when
HAND-WRITING a double constant into oracle SQL, DuckDB types a bare
numeric literal as DECIMAL; a 17-significant-digit literal whose
decimal mantissa exceeds 2^53 (e.g. -900719925.5546875 ->
DECIMAL(16,7) mantissa 9007199255546875 > 2^53) converts
decimal->double one ulp off the correctly-rounded strtod value.
Inject such values as CAST('<repr>' AS DOUBLE) (string literal) or a
bind parameter. Runtime columns read from parquet are unaffected —
the rounding arithmetic itself is bit-identical across engines.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def round_half_up(col: Column | str, digits: int = 3) -> Column:
    if isinstance(col, str):
        col = F.col(col)
    scale = float(10**digits)
    return F.floor(col * scale + F.lit(0.5)) / scale


def sql_round_half_up(expr: str, digits: int = 3) -> str:
    scale = float(10**digits)
    return f"floor(({expr}) * {scale} + 0.5) / {scale}"


def md5_long(col: Column | str, start: int = 1, nhex: int = 15) -> Column:
    """Deterministic NON-NEGATIVE bigint from md5 hex digits
    [start, start+nhex) of a string column (nhex <= 15 keeps the value
    under 2^60, so all downstream integer arithmetic stays in signed-64
    range with no sign-extension concerns).

    This is the engine's oracle-expressible hash: any engine with
    md5() can reproduce it exactly (`sql_md5_long` emits the DuckDB
    form; plain Python gets it via hashlib). Used wherever a hash
    value must be replicable outside Spark — shingle keys, MinHash
    bases, SimHash token bits — in place of xxhash64, which exists
    only in Spark. Verified bit-identical Spark/DuckDB/hashlib in
    tests/test_properties.py.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.conv(F.substring(F.md5(col), start, nhex), 16, 10).cast("bigint")


def sql_md5_long(expr: str, start: int = 1, nhex: int = 15) -> str:
    """DuckDB fragment computing the identical value as `md5_long`."""
    return f"CAST('0x' || substr(md5({expr}), {start}, {nhex}) AS BIGINT)"


def py_md5_long(s: str, start: int = 1, nhex: int = 15) -> int:
    """Plain-Python reference of `md5_long` (1-based `start`, to
    mirror SQL substring semantics)."""
    import hashlib

    return int(hashlib.md5(s.encode("utf-8")).hexdigest()[start - 1 : start - 1 + nhex], 16)


DEC_SUM_TYPE = "decimal(28,6)"


def dec_sum(col: Column | str) -> Column:
    """Order-independent SUM for oracle-gated money/measure columns.

    A double sum's value depends on partial-merge order, which varies
    with thread scheduling — a sum within ~1 ulp of a round_half_up
    boundary can flip between runs (observed once under concurrent
    load, ROUND_NOTES round 5). Accumulating DECIMAL(28,6) makes the
    sum exact integer arithmetic: any merge order yields the identical
    result, and Spark's and DuckDB's double->decimal value casts agree
    (verified over every fixture money column). The one-time 6-dp
    value rounding is deterministic per row — the opposite of the
    order-dependent last-ulp it replaces. Returns double so downstream
    round_half_up keeps its existing contract.

    Use for plain value sums; NOT for sums of transcendental
    intermediates (ln/exp chains keep their documented formulation).

    Cost note (measured, sf0.1 lineitem group-by): double sum 0.64 s,
    decimal sum 0.90 s, scaled-long sum (floor(x*1e6+0.5) as bigint)
    0.37 s. The scaled-long alternative is fastest but its accumulator
    caps |sum(x)| at ~9.2e12 before SILENT int64 wraparound — a 100 TB
    revenue column blows through that, so the engine pays the ~1.4x
    decimal aggregation cost for an accumulator with 22 integral
    digits. Revisit per-column only where the magnitude bound is
    provable.

    DECIMAL(18,6) input casts measured 2026-08-14 (VERDICT r5 item 5):
    NO win — persisted q43 shape at sf0.1, best-of-3: double 0.62 s /
    (28,6) 1.99 s / (18,6) 2.26 s. Spark's long-backed Decimal fast
    path only helps when the value STAYS at precision <= 18; sum() over
    decimal(18,6) widens its buffer to decimal(28,6), so every
    accumulator update is BigDecimal arithmetic either way and the
    narrower input cast just adds an extra representation hop. Keeping
    (28,6) end to end.
    """
    if isinstance(col, str):
        col = F.col(col)
    return F.sum(col.cast(DEC_SUM_TYPE)).cast("double")


def sql_dec_sum(expr: str) -> str:
    """DuckDB fragment computing the identical value as `dec_sum`."""
    return f"CAST(sum(CAST({expr} AS DECIMAL(28,6))) AS DOUBLE)"


def dec_avg(col: Column | str) -> Column:
    """Order-independent AVG companion of `dec_sum` (avg is internally
    a double sum with the same merge-order sensitivity). Null
    semantics match avg(): the count denominator ignores nulls."""
    if isinstance(col, str):
        col = F.col(col)
    return dec_sum(col) / F.count(col)


def sql_dec_avg(expr: str) -> str:
    return f"({sql_dec_sum(expr)} / count({expr}))"
