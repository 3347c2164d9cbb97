"""Physical-plan introspection helpers.

The engine's scale posture is enforced by asserting on plans, not
hoping: filters push into parquet scans, projections prune the read
schema, small dims broadcast, hot paths stay inside whole-stage
codegen. tests/test_plans.py pins these properties for the flagship
queries so a regression (e.g. a UDF sneaking into a hot path and
breaking codegen) fails CI, not the 100 TB run.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def explain_str(df: DataFrame, mode: str = "formatted") -> str:
    """The string df.explain(mode) prints, returned instead."""
    sc = df.sparkSession.sparkContext
    return sc._jvm.PythonSQLUtils.explainString(  # type: ignore[union-attr]
        df._jdf.queryExecution(), mode
    )


def scan_read_schemas(plan: str) -> list[str]:
    """ReadSchema lines of every parquet scan in a formatted plan."""
    return [ln.split("ReadSchema:", 1)[1].strip() for ln in plan.splitlines() if "ReadSchema:" in ln]


def has_broadcast_join(plan: str) -> bool:
    return "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan

def count_exchanges(plan: str) -> int:
    """Shuffle exchanges in the plan (each is a full network/disk
    round-trip of the data at scale)."""
    return sum(
        1
        for ln in plan.splitlines()
        if "Exchange" in ln and "BroadcastExchange" not in ln and "reused" not in ln.lower()
    )


def pushed_filters(plan: str) -> list[str]:
    return [
        ln.split("PushedFilters:", 1)[1].strip()
        for ln in plan.splitlines()
        if "PushedFilters:" in ln
    ]


def has_wholestage_codegen(df: DataFrame, execute: bool = True) -> bool:
    """True if the (final) plan contains codegen stages. Under AQE the
    physical plan only finalizes once an action runs on this exact
    DataFrame, so by default this executes it (tests only — results
    are small there)."""
    if execute and "isFinalPlan=false" in explain_str(df, "simple"):
        df.collect()
    # simple mode marks codegen stages "*(N) Op"
    return "*(" in explain_str(df, "simple")
