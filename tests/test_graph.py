"""Invariants for operators/graph.triangle_counts beyond the q114
oracle gate."""

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.operators.graph import triangle_counts


def _tc(spark, edges):
    df = spark.createDataFrame(edges, "src long, dst long")
    return {r.node: r for r in triangle_counts(df).collect()}


def test_k4_every_node_in_three_triangles(spark):
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    out = _tc(spark, k4)
    assert len(out) == 4
    for r in out.values():
        assert r.degree == 3 and r.triangles == 3 and r.clustering == 1.0


def test_path_graph_has_no_triangles(spark):
    out = _tc(spark, [(0, 1), (1, 2), (2, 3)])
    assert all(r.triangles == 0 and r.clustering == 0.0 for r in out.values())
    assert out[1].degree == 2


def test_direction_duplicates_and_self_loops_ignored(spark):
    # triangle 0-1-2 encoded with reversed/duplicate/self edges
    out = _tc(spark, [(0, 1), (1, 0), (1, 2), (2, 1), (0, 2), (2, 2)])
    assert all(r.triangles == 1 for r in out.values())


def test_degree_ordered_matches_naive_on_random_graph(spark):
    # deterministic pseudo-random graph; naive count via DataFrame
    # id-ordered 3-way join must agree with the degree-ordered
    # compact-forward result
    edges = [((i * 7919) % 37, (i * 104729) % 37) for i in range(200)]
    df = spark.createDataFrame(edges, "src long, dst long")
    got = triangle_counts(df)
    e = (
        df.select(
            F.least("src", "dst").alias("a"), F.greatest("src", "dst").alias("b")
        )
        .filter(F.col("a") != F.col("b"))
        .distinct()
    )
    e1, e2, e3 = e.alias("e1"), e.alias("e2"), e.alias("e3")
    naive_total = (
        e1.join(e2, F.col("e2.a") == F.col("e1.b"))
        .join(e3, (F.col("e3.a") == F.col("e1.a")) & (F.col("e3.b") == F.col("e2.b")))
        .count()
    )
    got_total = got.agg(F.sum("triangles")).first()[0]
    assert got_total == 3 * naive_total, (got_total, naive_total)
