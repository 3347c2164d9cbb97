"""Model-eval metrics: rank-statistic ROC-AUC (exact tie handling)
and calibration bins + ECE, against closed-form and brute-force
ground truth."""

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.operators.evalmetrics import calibration_report, roc_auc


def _auc(spark, rows):
    df = spark.createDataFrame(rows, "s double, y int")
    return roc_auc(df, "s", "y").collect()[0]


def test_auc_closed_forms(spark):
    # perfect separation
    assert _auc(spark, [(0.9, 1), (0.8, 1), (0.2, 0), (0.1, 0)])["auc"] == 1.0
    # perfectly wrong
    assert _auc(spark, [(0.1, 1), (0.2, 1), (0.8, 0), (0.9, 0)])["auc"] == 0.0
    # all scores tied -> 0.5 exactly (average ranks)
    assert _auc(spark, [(0.5, 1), (0.5, 0), (0.5, 1), (0.5, 0)])["auc"] == 0.5
    # single-class group -> NULL
    assert _auc(spark, [(0.3, 1), (0.7, 1)])["auc"] is None


def test_auc_matches_pairwise_bruteforce(spark):
    import random

    rng = random.Random(3)
    rows = [(round(rng.random(), 1), rng.randint(0, 1)) for _ in range(200)]
    rows.append((rows[0][0], 1 - rows[0][1]))  # guarantee both classes
    pos = [s for s, y in rows if y == 1]
    neg = [s for s, y in rows if y == 0]
    wins = sum((p > n_) + 0.5 * (p == n_) for p in pos for n_ in neg)
    import math

    want = math.floor(wins / (len(pos) * len(neg)) * 1e6 + 0.5) / 1e6
    assert _auc(spark, rows)["auc"] == want


def test_auc_per_group_independence(spark):
    rows = [("a", 0.9, 1), ("a", 0.1, 0), ("b", 0.1, 1), ("b", 0.9, 0)]
    df = spark.createDataFrame(rows, "g string, s double, y int")
    got = {r["g"]: r["auc"] for r in roc_auc(df, "s", "y", ["g"]).collect()}
    assert got == {"a": 1.0, "b": 0.0}


def test_calibration_hand_case(spark):
    # bin 9: two rows conf (0.9+0.95)/2=0.925, acc 1.0
    # bin 0: two rows conf (0.05+0.05)/2=0.05, acc 0.5
    rows = [(0.9, 1), (0.95, 1), (0.05, 1), (0.05, 0), (1.0, 1)]  # 1.0 clamps to bin 9
    df = spark.createDataFrame(rows, "s double, y int")
    got = {r["bin"]: r for r in calibration_report(df, "s", "y", n_bins=10).collect()}
    assert set(got) == {0, 9}
    assert got[9]["n"] == 3 and got[9]["acc"] == 1.0
    assert got[0]["n"] == 2 and got[0]["acc"] == 0.5 and got[0]["conf"] == 0.05
    # ECE = (3/5)*|1 - 0.95| + (2/5)*|0.5 - 0.05| = 0.03 + 0.18 = 0.21
    assert abs(got[0]["ece"] - 0.21) < 1e-9 and got[0]["ece"] == got[9]["ece"]
