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
