"""SCD type-2 operators: interval build from a log (gate query q78)
and incremental snapshot merge."""

from datetime import datetime

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators.scd import scd2_from_log, scd2_merge

T = datetime


def test_scd2_from_log_collapses_runs(spark):
    rows = [
        # user 1: a, a, b, a  -> three intervals
        (1, "a", T(2024, 1, 1)), (2, "a", T(2024, 1, 2)),
        (3, "b", T(2024, 1, 3)), (4, "a", T(2024, 1, 4)),
        # user 2: single run
        (5, "x", T(2024, 1, 1)), (6, "x", T(2024, 1, 5)),
    ]
    df = spark.createDataFrame(
        [(eid, attr, ts, uid) for (eid, attr, ts), uid in zip(rows, [1, 1, 1, 1, 2, 2])],
        "event_id long, plan string, ts timestamp, user_id long",
    )
    out = scd2_from_log(df, ["user_id"], "plan", "ts", tie_cols=["event_id"]).collect()
    by_user = {}
    for r in sorted(out, key=lambda r: (r["user_id"], r["valid_from"])):
        by_user.setdefault(r["user_id"], []).append(
            (r["plan"], r["valid_from"], r["valid_to"], r["is_current"])
        )
    assert by_user[1] == [
        ("a", T(2024, 1, 1), T(2024, 1, 3), False),
        ("b", T(2024, 1, 3), T(2024, 1, 4), False),
        ("a", T(2024, 1, 4), None, True),
    ]
    assert by_user[2] == [("x", T(2024, 1, 1), None, True)]


def test_scd2_intervals_tile_time_per_key(spark, sf_dir):
    """Structural invariants on real fixture data: per key, intervals
    are disjoint, contiguous (each valid_to = next valid_from), and
    exactly one is current."""
    e = read_testdata(spark, sf_dir, "events")
    iv = scd2_from_log(e, ["user_id"], "event_type", "ts", tie_cols=["event_id"])
    from pyspark.sql import Window as W

    w = W.partitionBy("user_id").orderBy("valid_from")
    chk = iv.select(
        "user_id", "valid_from", "valid_to", "is_current",
        F.lead("valid_from").over(w).alias("next_from"),
    )
    # contiguity: valid_to equals the next interval's valid_from
    bad = chk.filter(
        (F.col("valid_to").isNotNull()) & (F.col("valid_to") != F.col("next_from"))
    ).count()
    assert bad == 0
    cur_counts = iv.groupBy("user_id").agg(
        F.sum(F.col("is_current").cast("int")).alias("n_cur")
    )
    assert cur_counts.filter(F.col("n_cur") != 1).count() == 0


def _dim(spark, rows):
    return spark.createDataFrame(
        rows, "k long, plan string, valid_from timestamp, valid_to timestamp, is_current boolean"
    )


def test_scd2_merge_closes_opens_and_passes_through(spark):
    dim = _dim(
        spark,
        [
            (1, "a", T(2024, 1, 1), T(2024, 2, 1), False),  # history
            (1, "b", T(2024, 2, 1), None, True),            # will change to c
            (2, "x", T(2024, 1, 1), None, True),            # unchanged
            (3, "y", T(2024, 1, 1), None, True),            # absent from snapshot
        ],
    )
    snap = spark.createDataFrame(
        [(1, "c"), (2, "x"), (4, "new")], "k long, plan string"
    )
    out = scd2_merge(dim, snap, ["k"], ["plan"], T(2024, 3, 1))
    got = sorted(
        ((r["k"], r["plan"], r["valid_from"], r["valid_to"], r["is_current"]) for r in out.collect()),
    )
    assert got == sorted(
        [
            (1, "a", T(2024, 1, 1), T(2024, 2, 1), False),
            (1, "b", T(2024, 2, 1), T(2024, 3, 1), False),   # closed
            (1, "c", T(2024, 3, 1), None, True),             # opened
            (2, "x", T(2024, 1, 1), None, True),             # untouched
            (3, "y", T(2024, 1, 1), None, True),             # absent = no delete
            (4, "new", T(2024, 3, 1), None, True),           # new key
        ]
    )


def test_scd2_merge_is_idempotent(spark):
    dim = _dim(spark, [(1, "b", T(2024, 2, 1), None, True)])
    snap = spark.createDataFrame([(1, "c")], "k long, plan string")
    once = scd2_merge(dim, snap, ["k"], ["plan"], T(2024, 3, 1))
    twice = scd2_merge(once, snap, ["k"], ["plan"], T(2024, 3, 1))
    assert sorted(map(tuple, once.collect())) == sorted(map(tuple, twice.collect()))


def test_cdc_snapshot_applies_deletes_and_latest_wins(spark):
    """cdc_snapshot vs hand-computed truth: per key the latest row
    wins (ties broken by the sequence column), and a key whose latest
    op is a delete is absent — while an earlier delete followed by a
    re-insert survives."""
    from nyc_etl_pipeline_spark.operators.scd import cdc_snapshot

    rows = [
        # (seq, key, ts, op, val)
        (1, 1, 10.0, "I", "a"),
        (2, 1, 20.0, "U", "b"),     # key 1 -> b
        (3, 2, 10.0, "I", "x"),
        (4, 2, 30.0, "D", None),    # key 2 deleted
        (5, 3, 10.0, "I", "p"),
        (6, 3, 15.0, "D", None),
        (7, 3, 25.0, "I", "q"),     # key 3 re-inserted -> q
        (8, 4, 40.0, "U", "m"),
        (9, 4, 40.0, "U", "n"),     # same ts: seq 9 wins -> n
    ]
    log = spark.createDataFrame(
        rows, "seq long, k long, ts double, op string, v string"
    )
    snap = {
        r["k"]: r["v"]
        for r in cdc_snapshot(log, ["k"], "ts", "op", tie_cols=["seq"]).collect()
    }
    assert snap == {1: "b", 3: "q", 4: "n"}


def test_diff_tables_null_semantics(spark):
    """NULL->value and value->NULL are changes; NULL->NULL is not;
    added/removed/changed/unchanged partition the key universe."""
    from nyc_etl_pipeline_spark.operators.scd import diff_tables

    old = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "c"), (4, None), (5, "e")], ["k", "v"]
    )
    new = spark.createDataFrame(
        [(1, "a"), (2, "b2"), (3, None), (4, None), (6, "f")], ["k", "v"]
    )
    got = {r["metric"]: r["n"] for r in diff_tables(old, new, ["k"], ["v"]).collect()}
    assert got == {
        "added": 1,      # k=6
        "removed": 1,    # k=5
        "changed": 2,    # k=2 NULL->b2, k=3 c->NULL
        "unchanged": 2,  # k=1, k=4 (NULL->NULL)
        "col_v": 2,
    }
