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


# --- kcore_peel invariants (beyond the q162 oracle gate) ---


def _sym(edges):
    s = {(a, b) for a, b in edges if a != b}
    return list(s | {(b, a) for a, b in s})


def _kcore(spark, edges, k, rounds=10):
    from nyc_etl_pipeline_spark.operators.graph import kcore_peel

    df = spark.createDataFrame(_sym(edges), "src long, dst long")
    return {r.node: r.degree for r in kcore_peel(df, k, rounds).collect()}


def _brute_kcore(edges, k):
    """Reference peel: loop to convergence on plain Python sets."""
    adj = {}
    for a, b in _sym(edges):
        adj.setdefault(a, set()).add(b)
    while True:
        drop = [n for n, nb in adj.items() if len(nb) < k]
        if not drop:
            return {n: len(nb) for n, nb in adj.items()}
        for n in drop:
            for m in adj[n]:
                adj[m].discard(n)
            del adj[n]


def test_kcore_tree_vanishes_cycle_survives(spark):
    # a 4-cycle with a pendant path: 2-core = the cycle alone, found
    # only by CASCADING removal (5 is a leaf, then 4 becomes one)
    edges = [(0, 1), (1, 2), (2, 3), (3, 0), (0, 4), (4, 5)]
    out = _kcore(spark, edges, 2)
    assert out == {0: 2, 1: 2, 2: 2, 3: 2}


def test_kcore_k3_on_clique_plus_fringe(spark):
    # K4 clique + a triangle hanging off node 0: 3-core = the K4 only
    k4 = [(a, b) for a in range(4) for b in range(4) if a < b]
    fringe = [(0, 10), (0, 11), (10, 11)]
    out = _kcore(spark, k4 + fringe, 3)
    assert out == {0: 3, 1: 3, 2: 3, 3: 3}


def test_kcore_matches_brute_force_on_random_graph(spark):
    import random

    rng = random.Random(42)
    edges = {(rng.randrange(40), rng.randrange(40)) for _ in range(90)}
    for k in (2, 3, 4):
        assert _kcore(spark, list(edges), k) == _brute_kcore(edges, k)


def test_kcore_gate_graph_converges_within_rounds(spark, sf_dir):
    """The q162 fixed-round peel must have REACHED its fixpoint at the
    gate SF: one extra round changes nothing (so the output is the
    true k-core, not a truncated peel)."""
    from nyc_etl_pipeline_spark.operators.graph import kcore_peel
    from nyc_etl_pipeline_spark.suite.graphq import (
        KCORE_K,
        KCORE_ROUNDS,
        _kcore_edges,
    )

    edges = _kcore_edges(spark, sf_dir)
    at = {
        (r.node, r.degree)
        for r in kcore_peel(edges, KCORE_K, KCORE_ROUNDS).collect()
    }
    extra = {
        (r.node, r.degree)
        for r in kcore_peel(edges, KCORE_K, KCORE_ROUNDS + 1).collect()
    }
    assert at == extra
    assert at  # non-vacuous: the core is nonempty at gate SFs


# --- label_propagation invariants (beyond the q163 oracle gate) ---


def _lpa(spark, edges, rounds):
    from nyc_etl_pipeline_spark.operators.graph import label_propagation

    df = spark.createDataFrame(_sym(edges), "src long, dst long")
    return {r.node: r.label for r in label_propagation(df, rounds).collect()}


def _brute_lpa(edges, rounds):
    """Reference synchronous LPA: all nodes update simultaneously from
    the previous round's labels; argmax by (count desc, label asc)."""
    adj = {}
    for a, b in _sym(edges):
        adj.setdefault(a, set()).add(b)
    labels = {n: n for n in adj}
    for _ in range(rounds):
        new = {}
        for n, nb in adj.items():
            cnt = {}
            for m in nb:
                cnt[labels[m]] = cnt.get(labels[m], 0) + 1
            new[n] = min(cnt, key=lambda lb: (-cnt[lb], lb))
        labels = new
    return labels


def test_lpa_two_cliques_with_bridge(spark):
    # two K4s joined by one bridge: after a few rounds each clique
    # shares one label and the two labels differ
    c1 = [(a, b) for a in range(4) for b in range(4) if a < b]
    c2 = [(a + 10, b + 10) for a, b in c1]
    out = _lpa(spark, c1 + c2 + [(3, 10)], 5)
    left = {out[n] for n in range(4)}
    right = {out[n] for n in range(10, 14)}
    assert len(left) == 1 and len(right) == 1 and left != right


def test_lpa_matches_brute_force_sync_semantics(spark):
    import random

    rng = random.Random(7)
    edges = {(rng.randrange(30), rng.randrange(30)) for _ in range(70)}
    for rounds in (1, 3, 5):
        assert _lpa(spark, list(edges), rounds) == _brute_lpa(edges, rounds)


def test_lpa_tie_breaks_to_smallest_label(spark):
    # node 2 sees labels {0, 1} once each after round 1 setup: path
    # 0-2-1. Round 1: node 2's neighbors hold labels 0 and 1 -> tie
    # -> must pick 0.
    out = _lpa(spark, [(0, 2), (1, 2)], 1)
    assert out[2] == 0


def test_kcore_truncated_peel_matches_edge_list_semantics(spark):
    """A NON-converged peel (n_rounds smaller than the cascade) must
    match the per-round edge-list definition the oracle unrolls —
    including dropping survivors whose every neighbor was removed
    (degree 0 has no edge row). Long path + a clique: k=2 peels the
    path one leaf pair per round."""
    from nyc_etl_pipeline_spark.operators.graph import kcore_peel

    def brute_rounds(edges, k, rounds):
        adj = {}
        for a, b in _sym(edges):
            adj.setdefault(a, set()).add(b)
        for _ in range(rounds):
            drop = [n for n, nb in adj.items() if len(nb) < k]
            if not drop:
                break
            for n in drop:
                for m in adj[n]:
                    adj[m].discard(n)
                del adj[n]
            for n in [n for n, nb in adj.items() if not nb]:
                del adj[n]  # no edges -> no row in the edge list
        return {n: len(nb) for n, nb in adj.items()}

    k4 = [(100 + a, 100 + b) for a in range(4) for b in range(4) if a < b]
    path = [(i, i + 1) for i in range(8)]
    edges = k4 + path
    for rounds in (1, 2, 3, 10):
        df = spark.createDataFrame(_sym(edges), "src long, dst long")
        got = {r.node: r.degree for r in kcore_peel(df, 2, rounds).collect()}
        assert got == brute_rounds(edges, 2, rounds), rounds


# ---- Adamic-Adar link prediction -------------------------------------------

def _sym_df(spark, pairs):
    rows = sorted({(a, b) for a, b in pairs} | {(b, a) for a, b in pairs})
    return spark.createDataFrame(rows, "src long, dst long")


def test_adamic_adar_matches_python_brute_force(spark):
    import math
    import random

    from nyc_etl_pipeline_spark.operators.graph import adamic_adar_topk

    rng = random.Random(7)
    nodes = list(range(30))
    pairs = {tuple(sorted(rng.sample(nodes, 2))) for _ in range(120)}
    adj = {}
    for a, b in pairs:
        adj.setdefault(a, set()).add(b)
        adj.setdefault(b, set()).add(a)

    def brute():
        out = {}
        for u in nodes:
            for v in nodes:
                if u < v and v not in adj.get(u, set()):
                    common = adj.get(u, set()) & adj.get(v, set())
                    if common:
                        s = sum(1.0 / math.log(len(adj[z])) for z in sorted(common))
                        out[(u, v)] = (len(common), math.floor(s * 1e6 + 0.5) / 1e6)
        return out

    want = brute()
    got = {
        (r["u"], r["v"]): (r["n_common"], r["aa_score"])
        for r in adamic_adar_topk(_sym_df(spark, pairs), k=10_000).collect()
    }
    assert got == want


def test_adamic_adar_hub_cap_drops_hub_wedges(spark):
    """A hub connected to everyone manufactures a common neighbor for
    every pair; max_degree below its degree removes those wedges (and
    pairs whose ONLY common neighbor was the hub disappear)."""
    from nyc_etl_pipeline_spark.operators.graph import adamic_adar_topk

    hub_pairs = [(99, i) for i in range(10)]  # hub 99, degree 10
    chain = [(0, 1), (1, 2)]  # 0 and 2 share genuine neighbor 1
    edges = _sym_df(spark, hub_pairs + chain)
    uncapped = {(r["u"], r["v"]) for r in adamic_adar_topk(edges, k=1000).collect()}
    capped = {
        (r["u"], r["v"])
        for r in adamic_adar_topk(edges, k=1000, max_degree=5).collect()
    }
    assert (3, 4) in uncapped        # hub-only common neighbor
    assert (3, 4) not in capped      # gone under the cap
    assert (0, 2) in capped          # genuine wedge survives
