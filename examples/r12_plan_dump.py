"""Dump .explain("formatted") for every declared suite query to
plans/<tag>/<name>_<suffix>.txt (guide §1: capture the plan shape —
Exchange count, join strategy, PushedFilters/ReadSchema, codegen spans,
Python-boundary nodes — before and after each optimization).

Usage: python examples/r12_plan_dump.py <tag> <suffix> [only,names]
e.g.   python examples/r12_plan_dump.py r12 before
       python examples/r12_plan_dump.py r12 after q127_incremental_neardup

Construction of some specs executes bounded jobs (maintained-index
builds, trainer loops); that is the declared query's own contract and
is what the bench times too.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
os.environ.setdefault("SPARK_GRAFT_DRIVER_MEM", "16g")

from nyc_etl_pipeline_spark import get_spark, suite  # noqa: E402


def main() -> None:
    tag = sys.argv[1] if len(sys.argv) > 1 else "r12"
    suffix = sys.argv[2] if len(sys.argv) > 2 else "before"
    only = set(sys.argv[3].split(",")) if len(sys.argv) > 3 else None
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", tag
    )
    os.makedirs(out_dir, exist_ok=True)

    spark = get_spark(app_name="r12-plan-dump")
    summary = []
    for spec in suite.all_specs():
        if only is not None and spec.name not in only:
            continue
        try:
            df = spec.fn(spark, sf_dir)
            plan = df._jdf.queryExecution().explainString(
                spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                    "formatted"
                )
            )
        except Exception as exc:  # noqa: BLE001
            plan = f"ERROR: {exc}"
        with open(os.path.join(out_dir, f"{spec.name}_{suffix}.txt"), "w") as f:
            f.write(plan)
        # count only the numbered detail headers — formatted explain
        # lists every operator twice (tree + detail), so a bare \bExchange\b
        # count is exactly 2x the true node count (ADVICE r12)
        n_exch = len(re.findall(r"^\(\d+\) [\w$]*Exchange", plan, re.M))
        joins = sorted(set(re.findall(r"^\(\d+\) ([\w$]*Join[\w$]*)", plan, re.M)))
        pyn = len(re.findall(
            r"^\(\d+\) [\w$]*(?:BatchEvalPython|ArrowEvalPython|MapInPandas|"
            r"FlatMapGroupsInPandas|MapInArrow)",
            plan, re.M,
        ))
        summary.append((spec.name, n_exch, pyn, ",".join(joins)[:60]))
        print(f"{spec.name}: exchanges={n_exch} py_nodes={pyn} joins={joins}")
    print(f"wrote {len(summary)} plans to {out_dir}")


if __name__ == "__main__":
    main()
