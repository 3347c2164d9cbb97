"""Epoch-based scratch-cache hygiene (nyc_etl_pipeline_spark.hygiene).

The r12 degradation probe traced unreleased persist()/localCheckpoint()
scratch accumulating across the 204-query bench (persistent-RDD count
climbing monotonically; CacheManager silently warming the second
best-of-2 run of every leaking query). These tests pin the release
contract the operators now rely on.
"""

from __future__ import annotations

import pytest

from nyc_etl_pipeline_spark import hygiene as H


def _npersistent(spark) -> int:
    return spark.sparkContext._jsc.sc().getPersistentRDDs().size()


def _noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


@pytest.fixture(autouse=True)
def _clean_registry(spark):
    H.release_all()
    yield
    H.release_all()


def test_persist_released_after_keep_epochs(spark):
    # other test files legitimately leave persistent RDDs in the shared
    # session (e.g. the retrieval tf slot) -> assert DELTAS, not totals
    base = _npersistent(spark)
    H.new_epoch("qa")
    df = H.scratch_persist(spark.range(100).selectExpr("id", "id * 2 AS y"))
    _noop(df)
    assert _npersistent(spark) >= base + 1
    H.new_epoch("qb")
    assert _npersistent(spark) >= base + 1  # within KEEP_EPOCHS: still aided
    H.new_epoch("qc")
    assert _npersistent(spark) == base  # epoch distance 2: released
    # releasing a persist is value-safe: the frame recomputes
    assert df.count() == 100


def test_same_tag_shares_epoch(spark):
    """Back-to-back rebuilds of the SAME declared query (bench
    best-of-2) must not advance the epoch — run 2 keeps run 1's
    scratch (the disclosed warm-second-run semantics)."""
    base = _npersistent(spark)
    e1 = H.new_epoch("qx")
    df = H.scratch_persist(spark.range(50))
    _noop(df)
    assert H.new_epoch("qx") == e1
    assert _npersistent(spark) >= base + 1
    H.new_epoch("qy")
    H.new_epoch("qz")
    assert _npersistent(spark) == base


def test_checkpoint_blocks_released_only_after_materialization(spark):
    base = _npersistent(spark)
    H.new_epoch("q1")
    ck = H.scratch_checkpoint(spark.range(100).selectExpr("id * 3 AS z"))
    # never executed: epoch sweeps must NOT poison the plan
    H.new_epoch("q2")
    H.new_epoch("q3")
    H.new_epoch("q4")
    _noop(ck)  # late first action still works
    assert _npersistent(spark) >= base + 1
    H.new_epoch("q5")
    H.new_epoch("q6")
    H.new_epoch("q7")
    assert _npersistent(spark) == base


def test_release_checkpoint_now_drops_blocks(spark):
    base = _npersistent(spark)
    ck = spark.range(64).selectExpr("id AS n").localCheckpoint(eager=True)
    assert _npersistent(spark) >= base + 1
    H.release_checkpoint_now(ck)
    assert _npersistent(spark) == base


def test_iterative_operators_bound_inflight_checkpoints(spark, sf_dir):
    """kcore/label-prop/CC loops release round N-1's checkpoint as soon
    as round N's is materialized: after the caller's action plus two
    epochs, nothing lingers."""
    from nyc_etl_pipeline_spark.operators.graph import label_propagation

    H.release_all()
    edges = spark.createDataFrame(
        [(a, b) for a, b in [(1, 2), (2, 1), (2, 3), (3, 2), (4, 5), (5, 4)]],
        "src long, dst long",
    )
    base = _npersistent(spark)
    H.new_epoch("qlp")
    out = label_propagation(edges, n_rounds=3)
    _noop(out)
    assert out.count() == 5  # still re-executable within its epoch
    # in-flight state is bounded: final checkpoint + the persisted
    # edge table at most (edge persist is unpersisted by the operator)
    assert _npersistent(spark) <= base + 2
    H.new_epoch("qnext1")
    H.new_epoch("qnext2")
    assert _npersistent(spark) == base


def test_suite_builders_advance_epochs(spark, sf_dir):
    """The suite registry wraps every declared query's builder with a
    tagged epoch advance."""
    from nyc_etl_pipeline_spark import suite

    specs = {s.name: s for s in suite.all_specs()}
    before = H.new_epoch(None)
    specs["q17_exact_dedup"].fn(spark, sf_dir)
    specs["q17_exact_dedup"].fn(spark, sf_dir)  # same tag: one epoch
    mid = H.new_epoch(None)
    assert mid == before + 2  # exactly one epoch between the sentinels
