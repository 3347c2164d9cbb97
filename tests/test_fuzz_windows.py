"""Differential window-function fuzzing vs DuckDB.

The suite's window queries (q09/q69/q84/q92) are hand-picked; this
generator emits seeded random window specs — partition col, total
order, ROWS/RANGE frames, ranking/offset/aggregate functions — as ONE
SQL text that runs verbatim on BOTH Spark SQL and DuckDB, then
cross-checks with the oracle canonicalizer. Frames are the most
bug-prone corner of any SQL engine pair (peer handling, frame
exclusion defaults, null ordering); random frames cover the lattice
curated queries never do.

Determinism rules (every mismatch is a real finding):
- ORDER BY covers every column the query touches (the fixture's
  nominal keys are NOT unique), so rows that tie are identical in all
  selected columns and any tie-break yields the same canonical output;
- aggregates only over integer columns (exact under any ordering);
- RANGE frames only with a single integer order column (numeric
  offsets are only legal there, identically, in both engines);
- no floats anywhere in window inputs.
"""

from __future__ import annotations

import random

import duckdb
import pytest

from nyc_etl_pipeline_spark.io import read_testdata
from tests.oracle_harness import compare

N_CASES = 100
FAIL_CAP = 5

# table -> (partition candidates, unique total-order chain,
#           integer value cols, integer range-order col)
WTABLES = {
    "orders": (
        ["o_orderstatus", "o_orderpriority"],
        ["o_orderkey"],
        ["o_custkey", "o_orderkey"],
        "o_custkey",
    ),
    "lineitem": (
        ["l_returnflag", "l_linestatus"],
        ["l_orderkey", "l_linenumber"],
        ["l_partkey", "l_suppkey"],
        "l_partkey",
    ),
}

RANKERS = ["row_number()", "rank()", "dense_rank()"]
AGGS = ["sum", "min", "max", "count"]


def gen_case(rng: random.Random) -> tuple[str, str]:
    table = rng.choice(list(WTABLES))
    parts, order_chain, ints, range_col = WTABLES[table]
    part = rng.choice(parts)
    val = rng.choice(ints)
    kind = rng.choice(["ranker", "offset", "rows_agg", "range_agg"])

    # total order over every touched column: rows that tie are fully
    # identical in the output, so any tie-break is canonicalized away
    chain = list(dict.fromkeys(order_chain + [val]))
    order = ", ".join(chain)
    if kind == "ranker":
        fn = rng.choice(RANKERS)
        over = f"PARTITION BY {part} ORDER BY {order}"
        out_cols = [part] + chain
    elif kind == "offset":
        k = rng.randint(1, 3)
        fn = f"{rng.choice(['lag', 'lead'])}({val}, {k})"
        over = f"PARTITION BY {part} ORDER BY {order}"
        out_cols = [part] + chain
    elif kind == "rows_agg":
        fn = f"{rng.choice(AGGS)}({val})"
        lo = rng.choice(["UNBOUNDED PRECEDING", f"{rng.randint(1, 5)} PRECEDING", "CURRENT ROW"])
        hi_opts = ["CURRENT ROW", f"{rng.randint(1, 5)} FOLLOWING", "UNBOUNDED FOLLOWING"]
        hi = rng.choice(hi_opts)
        over = f"PARTITION BY {part} ORDER BY {order} ROWS BETWEEN {lo} AND {hi}"
        out_cols = [part] + chain
    else:  # range_agg: single int order col, numeric offsets; peers
        # aggregate identically, so only (part, range_col, val) matter
        fn = f"{rng.choice(AGGS)}({val})"
        lo = rng.choice(["UNBOUNDED PRECEDING", f"{rng.randint(1, 100)} PRECEDING"])
        hi = rng.choice(["CURRENT ROW", f"{rng.randint(1, 100)} FOLLOWING"])
        over = f"PARTITION BY {part} ORDER BY {range_col} RANGE BETWEEN {lo} AND {hi}"
        out_cols = list(dict.fromkeys([part, range_col, val]))

    sql = (
        f"SELECT {', '.join(out_cols)}, CAST({fn} OVER ({over}) AS BIGINT) AS w "
        f"FROM {table}"
    )
    return table, sql


@pytest.fixture(scope="module")
def wviews(spark, sf_dir):
    for t in WTABLES:
        read_testdata(spark, sf_dir, t).createOrReplaceTempView(t)
    con = duckdb.connect()
    for t in WTABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    yield con
    con.close()


def test_fuzz_window_functions(spark, sf_dir, wviews):
    failures: list[str] = []
    for seed in range(N_CASES):
        rng = random.Random(1000 + seed)
        _, sql = gen_case(rng)
        try:
            sdf = spark.sql(sql)
            duck = wviews.sql(sql).df()
            problems = compare(f"wseed{seed}", sdf, duck)
        except Exception as exc:  # noqa: BLE001 — a crash on either side IS a finding
            failures.append(f"seed {seed}: CRASH {exc}\n  SQL: {sql}")
            if len(failures) >= FAIL_CAP:
                break
            continue
        if problems:
            failures.append(f"seed {seed}: {problems[:3]}\n  SQL: {sql}")
            if len(failures) >= FAIL_CAP:
                break
    assert not failures, "\n".join(failures)
