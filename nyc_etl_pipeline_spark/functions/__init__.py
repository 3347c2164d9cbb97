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
