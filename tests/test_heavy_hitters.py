"""Misra-Gries exact-heavy-hitter invariants beyond the q166 gate:
the gate fixture's tiny vocabulary never forces counter eviction, so
these tests drive the summary through heavy eviction (k_summary far
below the distinct count) and assert the two load-bearing theorems —
bounded summary size and the candidate-superset guarantee — plus
exactness of the final output against brute force."""

import random
from collections import Counter

import pytest
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.operators.sketches import (
    exact_heavy_hitters,
    mg_partial_summaries,
)


def _tokens_df(spark, toks, partitions=7):
    return spark.createDataFrame(
        [(t,) for t in toks], "token string"
    ).repartition(partitions)


def _brute(toks, k):
    n = len(toks)
    return {t: c for t, c in Counter(toks).items() if c * k > n}


@pytest.fixture(scope="module")
def zipf_tokens():
    rng = random.Random(166)
    # ~600 distinct, heavily skewed head — and k_summary=16 below keeps
    # per-partition summaries evicting constantly
    return [f"w{min(int(rng.paretovariate(1.1)), 600)}" for _ in range(20000)]


def test_matches_brute_force_under_eviction(spark, zipf_tokens):
    df = _tokens_df(spark, zipf_tokens)
    got = {
        r.token: r.cnt
        for r in exact_heavy_hitters(df, 16, k_summary=16).collect()
    }
    assert got == _brute(zipf_tokens, 16)


def test_summary_bounded_and_candidates_superset(spark, zipf_tokens):
    k_s = 16
    df = _tokens_df(spark, zipf_tokens)
    summ = mg_partial_summaries(df, "token", k_s)
    sizes = (
        summ.groupBy(F.spark_partition_id().alias("p"))
        .agg(
            F.count(F.lit(1)).alias("rows"),
            F.count("token").alias("cand_rows"),
            F.sum(F.when(F.col("token").isNull(), F.col("weight"))).alias(
                "part_n"
            ),
        )
        .collect()
    )
    # per partition: <= k_summary candidate rows + exactly 1 sentinel
    assert sizes and all(r["cand_rows"] <= k_s for r in sizes)
    assert all(r["rows"] == r["cand_rows"] + 1 for r in sizes)
    assert sum(r["part_n"] for r in sizes) == len(zipf_tokens)
    cands = {
        r.token
        for r in summ.filter(F.col("token").isNotNull())
        .select("token")
        .distinct()
        .collect()
    }
    heavy = set(_brute(zipf_tokens, k_s + 1))
    assert heavy <= cands


def test_all_distinct_yields_empty(spark):
    toks = [f"u{i}" for i in range(5000)]
    out = exact_heavy_hitters(_tokens_df(spark, toks), 10, k_summary=12)
    assert out.count() == 0


def test_single_dominant_token_exact(spark):
    toks = ["the"] * 900 + [f"u{i}" for i in range(900)]
    random.Random(7).shuffle(toks)
    got = {
        r.token: r.cnt
        for r in exact_heavy_hitters(
            _tokens_df(spark, toks), 3, k_summary=8
        ).collect()
    }
    assert got == {"the": 900}


def test_k_summary_below_threshold_rejected(spark):
    with pytest.raises(ValueError):
        exact_heavy_hitters(_tokens_df(spark, ["a"]), 10, k_summary=5)


def test_mg_merge_global_summary(spark, zipf_tokens):
    from nyc_etl_pipeline_spark.operators.sketches import mg_merge

    k_s = 16
    df = _tokens_df(spark, zipf_tokens)
    merged = mg_merge(mg_partial_summaries(df, "token", k_s), "token", k_s)
    rows = merged.collect()
    cands = {r.token: r.weight for r in rows if r.token is not None}
    sentinels = [r.weight for r in rows if r.token is None]
    assert sentinels == [len(zipf_tokens)]
    assert len(cands) <= k_s
    n = len(zipf_tokens)
    true = Counter(zipf_tokens)
    # merged-summary guarantee: freq > 2n/(k_s+1) => present, and no
    # weight ever exceeds the true count
    for t, c in true.items():
        if c * (k_s + 1) > 2 * n:
            assert t in cands, t
    for t, w in cands.items():
        assert w <= true[t]


def test_heavy_hitters_empty_input(spark):
    from pyspark.sql import types as T

    from nyc_etl_pipeline_spark.operators.sketches import exact_heavy_hitters

    empty = spark.createDataFrame(
        [], T.StructType([T.StructField("token", T.StringType())])
    )
    assert exact_heavy_hitters(empty, 10).count() == 0
