"""Property-based differential fuzzing vs DuckDB (VERDICT r4 item 4).

The 98 suite queries are hand-picked; this generator emits seeded
random filter/project/join/agg plans over the testdata schemas,
renders each plan BOTH as engine DataFrame operations and as ANSI SQL,
and cross-checks results with the oracle harness's canonicalizer. It
hunts the semantics bugs curated queries never hit: null propagation
through outer joins, filter/join interaction, distinct-vs-group
equivalence, empty-group aggregates, modulo/arith edge cases.

Determinism rules baked into the generator (so every mismatch is a
real bug, not a float artifact):
- no ORDER BY / LIMIT (the compare sorts rows);
- SUM/AVG only over integer-valued columns (exact under reordering);
- doubles only in MIN/MAX/COUNT (value selection, no arithmetic);
- string predicates are equality/IN only; all strings are ASCII so
  MIN/MAX byte order agrees;
- literal pools sampled from the actual fixture values via DuckDB,
  sorted, so the generator adapts to fixture drift deterministically.
"""

from __future__ import annotations

import random

import duckdb
import pytest
from pyspark.sql import DataFrame, functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from tests.oracle_harness import compare

N_CASES = 120
FAIL_CAP = 5  # stop collecting after this many failing seeds

# ---------------------------------------------------------------------------
# schema metadata: kind drives which predicates/aggregates may touch a column
# kinds: key (int, joinable), int, double, cat (low-card string), str, ts
# ---------------------------------------------------------------------------

TABLES: dict[str, dict[str, str]] = {
    "region": {"r_regionkey": "key", "r_name": "cat"},
    "nation": {"n_nationkey": "key", "n_name": "cat", "n_regionkey": "key"},
    "customer": {
        "c_custkey": "key", "c_name": "str", "c_nationkey": "key",
        "c_acctbal": "double", "c_mktsegment": "cat",
    },
    "supplier": {
        "s_suppkey": "key", "s_name": "str", "s_nationkey": "key",
        "s_acctbal": "double",
    },
    "part": {
        "p_partkey": "key", "p_name": "cat", "p_brand": "cat",
        "p_type": "cat", "p_size": "int", "p_retailprice": "double",
    },
    "orders": {
        "o_orderkey": "key", "o_custkey": "key", "o_orderstatus": "cat",
        "o_totalprice": "double", "o_orderdate": "ts", "o_orderpriority": "cat",
    },
    "lineitem": {
        "l_orderkey": "key", "l_partkey": "key", "l_suppkey": "key",
        "l_linenumber": "int", "l_quantity": "int", "l_extendedprice": "double",
        "l_discount": "double", "l_tax": "double", "l_returnflag": "cat",
        "l_linestatus": "cat", "l_shipdate": "ts",
    },
}

# FK edges (left_table, left_col, right_table, right_col)
EDGES = [
    ("nation", "n_regionkey", "region", "r_regionkey"),
    ("customer", "c_nationkey", "nation", "n_nationkey"),
    ("supplier", "s_nationkey", "nation", "n_nationkey"),
    ("orders", "o_custkey", "customer", "c_custkey"),
    ("lineitem", "l_orderkey", "orders", "o_orderkey"),
    ("lineitem", "l_partkey", "part", "p_partkey"),
    ("lineitem", "l_suppkey", "supplier", "s_suppkey"),
]

# integer-valued columns safe for SUM/AVG (exact float sums)
SUMMABLE = {"l_linenumber", "l_quantity", "p_size"}


@pytest.fixture(scope="module")
def pools(sf_dir):
    """Literal pools per (table, column), sampled deterministically
    from the fixture via DuckDB: 5 evenly-spaced distinct values."""
    con = duckdb.connect()
    out: dict[tuple[str, str], list] = {}
    for t, cols in TABLES.items():
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
        for c, kind in cols.items():
            vals = [
                r[0]
                for r in con.sql(
                    f"SELECT DISTINCT {c} FROM {t} WHERE {c} IS NOT NULL ORDER BY {c}"
                ).fetchall()
            ]
            if not vals:
                continue
            step = max(1, len(vals) // 5)
            out[(t, c)] = vals[::step][:5] or vals[:1]
    con.close()
    return out


def _sql_lit(v, kind: str) -> str:
    if kind == "ts":
        return f"TIMESTAMP '{v}'"
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    return repr(v)


def _spark_lit(v, kind: str):
    if kind == "ts":
        return F.lit(str(v)).cast("timestamp")
    return F.lit(v)


# ---------------------------------------------------------------------------
# generator: one seeded random plan -> (DataFrame builder, SQL string)
# ---------------------------------------------------------------------------

class Plan:
    def __init__(self):
        self.tables: list[str] = []
        self.joins: list[tuple] = []  # (right_table, left_col, right_col, how)
        self.pred_spark = None  # Column or None
        self.pred_sql: str | None = None
        self.select_spark: list = []
        self.select_sql: list[str] = []
        self.group_spark: list = []
        self.group_sql: list[str] = []
        self.distinct = False

    def columns(self) -> list[tuple[str, str, str]]:
        return [(t, c, k) for t in self.tables for c, k in TABLES[t].items()]


def gen_plan(rng: random.Random, pools) -> Plan:
    p = Plan()
    # 1. base table + up to 2 FK joins (either direction of an edge)
    p.tables = [rng.choice(list(TABLES))]
    for _ in range(rng.choice([0, 1, 1, 2])):
        frontier = [
            (lt, lc, rt, rc) for (lt, lc, rt, rc) in EDGES
            if (lt in p.tables) != (rt in p.tables)  # extend, don't cycle
        ]
        if not frontier:
            break
        lt, lc, rt, rc = rng.choice(frontier)
        if lt in p.tables:
            p.joins.append((rt, lc, rc, rng.choice(["inner", "inner", "left"])))
            p.tables.append(rt)
        else:
            p.joins.append((lt, rc, lc, rng.choice(["inner", "inner", "left"])))
            p.tables.append(lt)

    # 2. predicates (0-2, AND/OR)
    preds = []
    for _ in range(rng.choice([0, 1, 1, 2])):
        cands = [(t, c, k) for (t, c, k) in p.columns() if (t, c) in pools]
        t, c, k = rng.choice(cands)
        vals = pools[(t, c)]
        if k in ("key", "int"):
            op = rng.choice(["<", "<=", ">", ">=", "=", "<>"])
            v = rng.choice(vals)
            preds.append((_cmp_spark(c, op, _spark_lit(v, k)), f"{c} {op} {_sql_lit(v, k)}"))
        elif k == "double":
            op = rng.choice(["<", ">"])
            v = rng.choice(vals)
            preds.append((_cmp_spark(c, op, _spark_lit(v, k)), f"{c} {op} {_sql_lit(v, k)}"))
        elif k == "ts":
            op = rng.choice(["<", ">="])
            v = rng.choice(vals)
            preds.append((_cmp_spark(c, op, _spark_lit(v, k)), f"{c} {op} {_sql_lit(v, k)}"))
        elif k == "cat":
            if rng.random() < 0.5:
                v = rng.choice(vals)
                op = rng.choice(["=", "<>"])
                preds.append((_cmp_spark(c, op, _spark_lit(v, k)), f"{c} {op} {_sql_lit(v, k)}"))
            else:
                sub = rng.sample(vals, min(len(vals), rng.choice([2, 3])))
                preds.append((
                    F.col(c).isin(sub),
                    f"{c} IN ({', '.join(_sql_lit(v, k) for v in sub)})",
                ))
        else:  # str
            preds.append((F.col(c).isNotNull(), f"{c} IS NOT NULL"))
    if preds:
        conj = rng.choice([" AND ", " OR "]) if len(preds) > 1 else None
        sp, sq = preds[0]
        for sp2, sq2 in preds[1:]:
            sp = (sp & sp2) if conj == " AND " else (sp | sp2)
        p.pred_spark = sp
        p.pred_sql = (conj or "").join(s for _, s in preds) if conj else preds[0][1]

    # 3. shape: projection or aggregation
    cols = p.columns()
    if rng.random() < 0.5:
        # projection (optionally distinct, optionally one computed int col)
        k = rng.randint(2, min(4, len(cols)))
        chosen = rng.sample(cols, k)
        for i, (t, c, kind) in enumerate(chosen):
            p.select_spark.append(F.col(c).alias(f"c{i}"))
            p.select_sql.append(f"{c} AS c{i}")
        ints = [(t, c) for (t, c, kind) in cols if kind in ("key", "int")]
        if ints and rng.random() < 0.4:
            t, c = rng.choice(ints)
            expr = rng.choice(["mod", "add"])
            if expr == "mod":
                p.select_spark.append((F.col(c) % 7).alias("cx"))
                p.select_sql.append(f"{c} % 7 AS cx")
            else:
                p.select_spark.append((F.col(c) + 1).alias("cx"))
                p.select_sql.append(f"{c} + 1 AS cx")
        p.distinct = rng.random() < 0.4
    else:
        # aggregation: group by 0-2 low-cardinality cols
        gcands = [(t, c) for (t, c, kind) in cols if kind == "cat"] + [
            (t, c) for (t, c, kind) in cols if c.endswith("nationkey") or c == "p_size"
        ]
        for i, (t, c) in enumerate(rng.sample(gcands, rng.choice([0, 1, 1, 2])) if gcands else []):
            p.group_spark.append(F.col(c).alias(f"g{i}"))
            p.group_sql.append(f"{c} AS g{i}")
        aggs = []
        n_aggs = rng.randint(1, 3)
        acands = [(t, c, kind) for (t, c, kind) in cols]
        for i in range(n_aggs):
            t, c, kind = rng.choice(acands)
            choices = ["count", "min", "max", "cntd"]
            if c in SUMMABLE:
                choices += ["sum", "avg"]
            a = rng.choice(choices)
            if a == "count":
                aggs.append((F.count(F.lit(1)).alias(f"a{i}"), f"count(*) AS a{i}"))
            elif a == "min":
                aggs.append((F.min(c).alias(f"a{i}"), f"min({c}) AS a{i}"))
            elif a == "max":
                aggs.append((F.max(c).alias(f"a{i}"), f"max({c}) AS a{i}"))
            elif a == "cntd":
                aggs.append((
                    F.count_distinct(F.col(c)).alias(f"a{i}"),
                    f"CAST(count(DISTINCT {c}) AS BIGINT) AS a{i}",
                ))
            elif a == "sum":
                aggs.append((
                    F.sum(c).cast("double").alias(f"a{i}"),
                    f"CAST(sum({c}) AS DOUBLE) AS a{i}",
                ))
            else:  # avg — exact: integer-valued sum / exact count
                aggs.append((F.avg(c).alias(f"a{i}"), f"avg({c}) AS a{i}"))
        p.select_spark = aggs  # (col, sql) pairs, split in build/render
    return p


def _cmp_spark(c: str, op: str, lit):
    col = F.col(c)
    return {
        "<": col < lit, "<=": col <= lit, ">": col > lit,
        ">=": col >= lit, "=": col == lit, "<>": col != lit,
    }[op]


def build_spark(spark, sf_dir: str, p: Plan) -> DataFrame:
    df = read_testdata(spark, sf_dir, p.tables[0])
    for rt, lc, rc, how in p.joins:
        right = read_testdata(spark, sf_dir, rt)
        df = df.join(right, F.col(lc) == F.col(rc), how)
    if p.pred_spark is not None:
        df = df.filter(p.pred_spark)
    if p.group_spark or (p.select_spark and isinstance(p.select_spark[0], tuple)):
        agg_cols = [a for a, _ in p.select_spark]
        df = df.groupBy(*p.group_spark).agg(*agg_cols) if p.group_spark else df.agg(*agg_cols)
    else:
        df = df.select(*p.select_spark)
        if p.distinct:
            df = df.dropDuplicates()
    return df


def render_sql(p: Plan) -> str:
    base = p.tables[0]
    joins = "".join(
        f" {how.upper()} JOIN {rt} ON {lc} = {rc}" for rt, lc, rc, how in p.joins
    )
    where = f" WHERE {p.pred_sql}" if p.pred_sql else ""
    if p.group_sql or (p.select_sql == [] and p.select_spark and isinstance(p.select_spark[0], tuple)):
        sel = p.group_sql + [s for _, s in p.select_spark]
        group = (
            " GROUP BY " + ", ".join(str(i + 1) for i in range(len(p.group_sql)))
            if p.group_sql else ""
        )
        return f"SELECT {', '.join(sel)} FROM {base}{joins}{where}{group}"
    distinct = "DISTINCT " if p.distinct else ""
    return f"SELECT {distinct}{', '.join(p.select_sql)} FROM {base}{joins}{where}"


# ---------------------------------------------------------------------------


def test_fuzz_differential(spark, sf_dir, pools):
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    failures: list[str] = []
    nonempty = 0
    for seed in range(N_CASES):
        rng = random.Random(seed)
        p = gen_plan(rng, pools)
        sql = render_sql(p)
        try:
            sdf = build_spark(spark, sf_dir, p)
            duck = con.sql(sql).df()
            problems = compare(f"seed{seed}", sdf, duck)
        except Exception as exc:  # noqa: BLE001 — a crash on either side IS a finding
            failures.append(f"seed {seed}: CRASH {exc}\n  SQL: {sql}")
            if len(failures) >= FAIL_CAP:
                break
            continue
        if problems:
            failures.append(f"seed {seed}: {problems}\n  SQL: {sql}")
            if len(failures) >= FAIL_CAP:
                break
        if len(duck) > 0:
            nonempty += 1
    con.close()
    assert not failures, "\n".join(failures)
    # the generator must not be vacuous: most plans return rows
    assert nonempty >= N_CASES // 2, f"only {nonempty}/{N_CASES} plans returned rows"
