"""Extension operators: dedup / similarity / text analysis.

The probabilistic operators (MinHash-LSH, SimHash, vector LSH) have no
SQL oracle; these tests pin their contract instead: exact precision
(every returned pair truly exceeds the threshold) and recall measured
against the exact oracle-checked counterpart.
"""

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators import dedup as D
from nyc_etl_pipeline_spark.operators import similarity as SIM


def _docs(spark, sf_dir):
    return read_testdata(spark, sf_dir, "documents")


def test_minhash_lsh_recall_vs_exact(spark, sf_dir):
    exact = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in D.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.5).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"]): r["jaccard"]
        for r in D.minhash_lsh_pairs(
            _docs(spark, sf_dir), num_hashes=128, bands=32, threshold=0.5
        ).collect()
    }
    # precision is exact by construction (candidates re-verified):
    assert set(lsh) <= set(exact)
    for pair, j in lsh.items():
        assert j == exact[pair]
    # recall at j>=0.7 should be ~1 with 32 bands of 4 rows
    high = {p for p, j in exact.items() if j >= 0.7}
    assert high <= set(lsh), f"missed high-jaccard pairs: {high - set(lsh)}"


def test_simhash_finds_planted_neardups(spark, sf_dir):
    exact = {
        (r["a_id"], r["b_id"])
        for r in D.ngram_jaccard_pairs(_docs(spark, sf_dir), threshold=0.9).collect()
    }
    sim = {
        (r["a_id"], r["b_id"])
        for r in D.simhash_near_pairs(
            _docs(spark, sf_dir), max_hamming=7, n_blocks=8
        ).collect()
    }
    # ground-truth hamming from the signatures themselves (independent
    # of the block-trick join path)
    blocks = {
        r["doc_id"]: [r[f"__blk{b}"] for b in range(8)]
        for r in D.simhash_blocks(_docs(spark, sf_dir)).collect()
    }
    def hamming(a, b):
        return sum(bin(x ^ y).count("1") for x, y in zip(blocks[a], blocks[b]))

    # 1) pigeonhole recall GUARANTEE: every high-jaccard pair whose true
    # hamming is <= max_hamming must be returned (8 blocks, <=7 flips ->
    # at least one block agrees exactly)
    within = {p for p in exact if hamming(*p) <= 7}
    assert within <= sim, f"block trick missed guaranteed pairs: {within - sim}"
    # 2) hash quality: near-identical docs (~40 tokens, 1-token edits)
    # should mostly land within hamming 7 — a weaker, data-dependent
    # property of the vote hash, so bounded not exact
    assert len(within) >= 0.9 * len(exact), (
        f"only {len(within)}/{len(exact)} jaccard>=0.9 pairs within hamming 7"
    )


def test_simhash_block_guarantee_guard(spark, sf_dir):
    import pytest

    with pytest.raises(ValueError):
        D.simhash_near_pairs(_docs(spark, sf_dir), max_hamming=8, n_blocks=4)


def test_simhash_signature_is_deterministic(spark, sf_dir):
    a = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(_docs(spark, sf_dir)).collect()}
    b = {r["doc_id"]: r["simhash"] for r in D.simhash_signatures(_docs(spark, sf_dir)).collect()}
    assert a == b and len(a) == _docs(spark, sf_dir).count()


def test_vector_lsh_is_subset_of_exact(spark, sf_dir):
    emb = read_testdata(spark, sf_dir, "embeddings")
    exact = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in SIM.cosine_pairs(emb, threshold=0.4).collect()
    }
    lsh = {
        (r["a_id"], r["b_id"]): r["cosine"]
        for r in SIM.lsh_bucketed_pairs(emb, threshold=0.4, n_planes=6).collect()
    }
    assert set(lsh) <= set(exact)
    for pair, c in lsh.items():
        assert c == exact[pair]


def test_cosine_topk_self_is_excluded_and_ranked(spark, sf_dir):
    emb = read_testdata(spark, sf_dir, "embeddings")
    out = SIM.cosine_topk(emb, emb.filter(F.col("vec_id") < 3), k=4).collect()
    by_q = {}
    for r in out:
        assert r["neighbor_id"] != r["query_id"]
        by_q.setdefault(r["query_id"], []).append((r["rank"], r["cosine"]))
    for q, rows in by_q.items():
        rows.sort()
        assert [r[0] for r in rows] == [1, 2, 3, 4]
        cosines = [r[1] for r in rows]
        assert cosines == sorted(cosines, reverse=True)


def test_ivf_topk_recall_vs_exact(spark, sf_dir):
    emb = read_testdata(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 5)
    exact = {}
    for r in SIM.cosine_topk(emb, queries, k=5).collect():
        exact.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    ivf = {}
    for r in SIM.ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3).collect():
        ivf.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert set(ivf) == set(exact)
    # probing 3/8 cells must still recover most true neighbors
    hits = sum(len(ivf[q] & exact[q]) for q in exact)
    total = sum(len(v) for v in exact.values())
    assert hits / total >= 0.6, f"IVF recall {hits}/{total}"
    # determinism (seeded KMeans)
    again = {}
    for r in SIM.ivf_topk(emb, queries, k=5, n_lists=8, n_probe=3).collect():
        again.setdefault(r["query_id"], set()).add(r["neighbor_id"])
    assert again == ivf


def test_exact_dedup_counts(spark, sf_dir):
    d = _docs(spark, sf_dir)
    out = D.exact_dedup(d)
    total = out.agg(F.sum("n_copies")).first()[0]
    assert total == d.count()
    assert out.count() == d.select("text").distinct().count()


def test_chunk_windows_cover_every_char_with_overlap(spark):
    """Chunking invariants: chunks tile the doc with the configured
    overlap, every character appears in >= 1 chunk, reassembling
    stride-aligned prefixes reconstructs the document."""
    from pyspark.sql import functions as F

    from nyc_etl_pipeline_spark.operators.text import chunk_windows

    rows = [
        (1, "a" * 100),            # single short chunk
        (2, "b" * 500),            # exactly one window
        (3, "".join(chr(97 + i % 26) for i in range(1234))),  # multi-chunk
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = chunk_windows(df, size=500, stride=400).collect()
    by_doc = {}
    for r in sorted(out, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r)
    assert [len(by_doc[k]) for k in (1, 2, 3)] == [1, 1, 3]
    # doc 3: 1234 chars -> chunks at 0,400,800 (last clipped to 434)
    lens = [r["n_chunk_chars"] for r in by_doc[3]]
    assert lens == [500, 500, 434]
    # stride-aligned reconstruction: first `stride` chars of each chunk
    # + full last chunk == original text
    text = rows[2][1]
    rebuilt = "".join(r["chunk"][:400] for r in by_doc[3][:-1]) + by_doc[3][-1]["chunk"]
    assert rebuilt == text


def test_prefix_filter_equals_naive_jaccard(spark, sf_dir):
    """The ppjoin prefix filter must be LOSSLESS: identical (pair,
    score) output to the full inverted-index formulation at several
    thresholds, including one low enough that prefixes get long and
    one high enough that they shrink to a couple of shingles."""
    docs = _docs(spark, sf_dir)
    for t in (0.2, 0.5, 0.8):
        naive = {
            (r["a_id"], r["b_id"]): r["jaccard"]
            for r in D.ngram_jaccard_pairs(docs, threshold=t).collect()
        }
        pref = {
            (r["a_id"], r["b_id"]): r["jaccard"]
            for r in D.jaccard_prefix_filter_pairs(docs, threshold=t).collect()
        }
        assert pref == naive, f"t={t}: {set(naive) ^ set(pref)}"


def test_prefix_filter_exact_boundary_pair(spark):
    """Planted pair sitting EXACTLY at the threshold: |A|=|B|=5
    shingles, overlap 4 -> J = 4/6 = 0.666...; at t=2/3 the ceil in
    the prefix length lands on an exact integer boundary — the case
    the 1e-9 slack in pref_len exists for."""
    a = "w0 w1 w2 w3 w4 w5 w6"          # 5 3-gram shingles
    b = "w0 w1 w2 w3 w4 w5 x6"          # shares 4 of them
    df = spark.createDataFrame([(1, a), (2, b)], ["doc_id", "text"])
    got = D.jaccard_prefix_filter_pairs(df, threshold=2 / 3).collect()
    assert len(got) == 1 and got[0]["a_id"] == 1 and got[0]["b_id"] == 2
    assert abs(got[0]["jaccard"] - 0.667) < 1e-9


def test_jl_projection_onehot_and_norms(spark, sf_dir):
    from nyc_etl_pipeline_spark.operators.similarity import jl_project, jl_sign_matrix

    signs = jl_sign_matrix(64, 16)
    # one-hot e_i projects to column i of the sign matrix / 4 exactly
    # — pins the (i, j) orientation against silent transposition
    onehot = spark.createDataFrame(
        [(7, [1.0 if i == 7 else 0.0 for i in range(64)])], ["vec_id", "embedding"]
    )
    row = jl_project(onehot).collect()[0]
    for j in range(1, 17):
        assert row[f"jl_{j}"] == signs[j - 1][7] / 4.0
    # norm preservation: E||x'||^2 == ||x||^2; with d_out=16 the
    # per-vector distortion concentrates (sd ~ sqrt(2/16)) — every
    # fixture vector should land well inside [0.25, 2.2]
    emb = read_testdata(spark, sf_dir, "embeddings").limit(50)
    proj = jl_project(emb)
    ratios = (
        proj.join(emb, "vec_id")
        .select(
            (
                sum(F.col(f"jl_{j}") * F.col(f"jl_{j}") for j in range(1, 17))
                / F.aggregate(
                    "embedding",
                    F.lit(0.0),
                    lambda a, x: a + x.cast("double") * x.cast("double"),
                )
            ).alias("r")
        )
        .collect()
    )
    for r in ratios:
        assert 0.25 < r["r"] < 2.2


def test_feature_hashing_determinism_and_conservation(spark, sf_dir):
    """Bucket assignment is a pure function of the token (same token
    never lands in two buckets) and bucket totals conserve the corpus
    token count."""
    from pyspark.sql import functions as F

    from nyc_etl_pipeline_spark.functions import md5_long, py_md5_long
    from nyc_etl_pipeline_spark.operators.text import tokens
    from nyc_etl_pipeline_spark.suite.textops import HASH_BUCKETS, q155_feature_hashing

    prof = q155_feature_hashing(spark, sf_dir).collect()
    d = read_testdata(spark, sf_dir, "documents")
    total_tokens = d.select(F.explode(tokens(F.col("text"))).alias("t")).count()
    assert sum(r["total_count"] for r in prof) == total_tokens
    assert all(0 <= r["bucket"] < HASH_BUCKETS for r in prof)
    # cross-check one token's bucket against the plain-Python derivation
    one = (
        d.select(F.explode(tokens(F.col("text"))).alias("t"))
        .select("t", F.pmod(md5_long("t"), F.lit(HASH_BUCKETS)).alias("b"))
        .first()
    )
    assert one["b"] == py_md5_long(one["t"]) % HASH_BUCKETS


def test_source_overlap_planted_copy(spark):
    """Two sources sharing every shingle must report jaccard 1.0; a
    disjoint source pairs with overlap only where real shingles are
    shared (none here)."""
    from nyc_etl_pipeline_spark.operators import dedup as D
    from pyspark.sql import functions as F

    rows = [
        (1, "alpha beta gamma delta epsilon", "s1"),
        (2, "alpha beta gamma delta epsilon", "s2"),   # exact content copy
        (3, "zeta eta theta iota kappa", "s3"),        # disjoint
    ]
    df = spark.createDataFrame(rows, ["doc_id", "text", "source"])
    sh = D._shingle_table(df, "source", "text", 3).distinct()
    sizes = sh.groupBy("__id").count()
    a = sh.select(F.col("__id").alias("a"), "__sh")
    b = sh.select(F.col("__id").alias("b"), "__sh")
    pairs = {
        (r["a"], r["b"]): r["n"]
        for r in a.join(b, "__sh")
        .filter(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    n_shingles = {r["__id"]: r["count"] for r in sizes.collect()}
    assert pairs == {("s1", "s2"): n_shingles["s1"]}  # full overlap, s3 absent
    assert n_shingles["s1"] == n_shingles["s2"] == 3  # 5 tokens -> 3 shingles


# ---------------------------------------------------------------------------
# strip_boilerplate_lines (cross-doc line-level dedup)
# ---------------------------------------------------------------------------

def test_boilerplate_strip_removes_shared_lines_keeps_order(spark):
    banner = "SUBSCRIBE NOW"
    rows = [
        (1, f"alpha one\n{banner}\nalpha two"),
        (2, f"{banner}\nbeta only"),
        (3, f"gamma start\ngamma end\n{banner}"),
        (4, "delta unique\ndelta second"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.strip_boilerplate_lines(
        df, max_doc_freq=2).collect()}
    # banner is in 3 > 2 docs: stripped everywhere, order preserved
    assert out[1]["clean_text"] == "alpha one\nalpha two"
    assert out[2]["clean_text"] == "beta only"
    assert out[3]["clean_text"] == "gamma start\ngamma end"
    assert out[4]["clean_text"] == "delta unique\ndelta second"
    assert out[1]["n_lines"] == 3 and out[1]["n_kept"] == 2
    # raising the threshold keeps the banner
    kept_all = D.strip_boilerplate_lines(df, max_doc_freq=3)
    assert kept_all.filter(F.col("n_kept") != F.col("n_lines")).count() == 0


def test_boilerplate_strip_all_boiler_doc_survives_empty(spark):
    rows = [(i, "the common line") for i in range(1, 5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = D.strip_boilerplate_lines(df, max_doc_freq=2).collect()
    assert len(out) == 4  # edited, never dropped
    assert all(r["clean_text"] == "" and r["n_kept"] == 0 and r["n_lines"] == 1
               for r in out)


def test_boilerplate_strip_duplicate_line_within_one_doc_counts_once(spark):
    """df is DISTINCT-doc frequency: a line repeated inside a single
    doc is not boilerplate on its own."""
    rows = [
        (1, "refrain\nrefrain\nrefrain\nverse"),
        (2, "solo line"),
        (3, "other text"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in D.strip_boilerplate_lines(
        df, max_doc_freq=1).collect()}
    assert out[1]["clean_text"] == "refrain\nrefrain\nrefrain\nverse"


# ---- exact substring dedup (suffix-array-style covered spans) -------------

def _subdup_fixture(spark):
    # shared passage "a b c d" (l=4) between docs 1 and 2, at different
    # offsets; doc 3 repeats its own passage "p q r s" twice (intra-doc);
    # doc 4 is clean; doc 5 is shorter than l.
    rows = [
        (1, "x1 x2 a b c d y1 y2"),
        (2, "a b c d z1 z2 z3 z4"),
        (3, "p q r s m1 m2 p q r s"),
        (4, "u1 u2 u3 u4 u5 u6 u7 u8"),
        (5, "v1 v2"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_substring_spans_hand_case(spark):
    df = _subdup_fixture(spark)
    spans = {
        (r["doc_id"], r["span_start"], r["span_end"]): r["span_len"]
        for r in D.duplicated_substring_spans(df, l_tokens=4).collect()
    }
    # doc 1: tokens 3-6 covered (1-based, end exclusive -> 7)
    # doc 2: tokens 1-4 -> [1, 5)
    # doc 3: both copies: [1, 5) and [7, 11)
    assert spans == {
        (1, 3, 7): 4,
        (2, 1, 5): 4,
        (3, 1, 5): 4,
        (3, 7, 11): 4,
    }


def test_substring_report_hand_case(spark):
    df = _subdup_fixture(spark)
    got = {r["doc_id"]: r for r in D.substring_dedup_report(df, l_tokens=4).collect()}
    assert set(got) == {1, 2, 3, 4, 5}
    r1 = got[1]
    assert (r1["n_tokens"], r1["n_windows"], r1["n_dup_windows"]) == (8, 5, 1)
    assert (r1["n_spans"], r1["dup_tokens"], r1["longest_run"]) == (1, 4, 4)
    assert r1["dup_ratio"] == 0.5
    assert got[3]["n_spans"] == 2 and got[3]["dup_tokens"] == 8
    r4 = got[4]
    assert r4["n_windows"] == 5 and r4["n_dup_windows"] == 0 and r4["dup_ratio"] == 0.0
    r5 = got[5]
    assert r5["n_tokens"] == 2 and r5["n_windows"] == 0 and r5["dup_ratio"] == 0.0


def test_substring_spans_merge_overlapping_and_touching(spark):
    # "a b c d e" shared -> doc 1's windows at pos 1 and 2 overlap and
    # must merge into ONE [1, 6) span; and two duplicated passages that
    # touch end-to-start chain into one covered run.
    rows = [
        (1, "a b c d e t1 t2 a b c d e"),
        (2, "k1 a b c d e k2 k3 k4 k5"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    spans = sorted(
        (r["doc_id"], r["span_start"], r["span_end"])
        for r in D.duplicated_substring_spans(df, l_tokens=4).collect()
    )
    assert spans == [(1, 1, 6), (1, 8, 13), (2, 2, 7)]


def test_exact_substring_dedup_removes_covered_tokens(spark):
    df = _subdup_fixture(spark)
    got = {r["doc_id"]: r for r in D.exact_substring_dedup(df, l_tokens=4).collect()}
    assert got[1]["text_dedup"] == "x1 x2 y1 y2" and got[1]["removed_tokens"] == 4
    assert got[2]["text_dedup"] == "z1 z2 z3 z4"
    assert got[3]["text_dedup"] == "m1 m2" and got[3]["removed_tokens"] == 8
    assert got[4]["text_dedup"] == "u1 u2 u3 u4 u5 u6 u7 u8"
    assert got[5] ["removed_tokens"] == 0


def test_substring_dedup_min_occurrences_three(spark):
    # passage must appear >= 3 times to be flagged
    rows = [
        (1, "a b c d e1 e2 e3 e4"),
        (2, "a b c d f1 f2 f3 f4"),
        (3, "g1 g2 g3 g4 g5 g6 g7 g8"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    assert D.duplicated_substring_spans(df, l_tokens=4, min_occurrences=3).count() == 0
    assert D.duplicated_substring_spans(df, l_tokens=4, min_occurrences=2).count() == 2
