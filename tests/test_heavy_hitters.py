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
        .count()
        .collect()
    )
    assert sizes and all(r["count"] <= k_s for r in sizes)
    cands = {r.token for r in summ.select("token").distinct().collect()}
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
