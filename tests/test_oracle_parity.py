"""Replicates the driver's correctness gate locally: every suite query
vs its DuckDB oracle at sf0.001 (fast; the driver runs sf0.01)."""

import pytest

from tests import oracle_harness


def test_all_queries_match_oracle(spark, sf_dir):
    results = oracle_harness.run(sf_dir)
    failed = {k: v for k, v in results.items() if v}
    assert not failed, f"oracle mismatches: {failed}"


def test_queries_and_oracles_are_wired():
    import __spark_entry__ as entry

    qs = entry.queries()
    os_ = entry.oracle_sql()
    assert len(qs) >= 27
    assert set(os_) <= set(qs)
    # probabilistic/sketch ops are the only ones allowed to skip the oracle
    no_oracle = set(qs) - set(os_)
    assert all(
        any(tag in n for tag in ("lsh", "simhash", "approx", "ivf")) for n in no_oracle
    ), no_oracle
