"""Fixed-round logistic regression (operators/classify.py): exact
pure-Python replay of the distributed recurrence, learnability on a
planted separable corpus, and feature-builder edges. The q171 gate
pins the recurrence against DuckDB; these pin that the trainer LEARNS
(the gate fixture's shared vocabulary carries no metadata signal, so
learnability must be proven on constructed data)."""

import math

import pytest
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators import classify as C


def _planted_docs(spark, n_per_class=60):
    """Two disjoint vocabularies -> linearly separable by any hashed
    bag-of-words: class 1 speaks {alpha beta gamma}, class 0 speaks
    {delta epsilon zeta}. Deterministic texts (no RNG)."""
    pos = [(i, f"alpha beta {'gamma ' * (i % 3 + 1)}alpha", 1) for i in range(n_per_class)]
    neg = [
        (n_per_class + i, f"delta epsilon {'zeta ' * (i % 3 + 1)}delta", 0)
        for i in range(n_per_class)
    ]
    return spark.createDataFrame(pos + neg, "doc_id long, text string, y_true int")


def test_logreg_learns_planted_separable_corpus(spark):
    docs = _planted_docs(spark)
    feats = C.hashed_tf_features(
        docs, n_buckets=32, label=F.col("y_true"), binary=True
    )
    w = C.logreg_train_fixed(feats, dim=33, n_rounds=8, lr=4.0)
    scored = C.logreg_score(feats, w, extra_cols=["y"]).collect()
    acc = sum((r["score"] >= 0.5) == (r["y"] == 1.0) for r in scored) / len(scored)
    assert acc == 1.0
    mean_pos = sum(r["score"] for r in scored if r["y"] == 1.0) / 60
    mean_neg = sum(r["score"] for r in scored if r["y"] == 0.0) / 60
    assert mean_pos - mean_neg > 0.5  # confident separation, not 50.1/49.9


def test_logreg_weights_match_pure_python_replay(spark, sf_dir):
    """Bit-exact driver-side replay of the whole distributed training
    run: collect the quantized feature table once, then run the same
    recurrence in plain Python — 6 dp quantized contributions, exact
    Fraction sum for the DECIMAL accumulation, identical association
    order for the update. Any drift in the Spark aggregation (merge
    order, decimal scale, fold direction) breaks this."""
    from fractions import Fraction

    docs = read_testdata(spark, sf_dir, "documents").limit(200)
    feats = C.hashed_tf_features(
        docs, n_buckets=8, label=(F.col("n_chars") % 2 == 0).cast("int")
    )
    dim, n_rounds, lr = 9, 3, 2.0
    w_spark = C.logreg_train_fixed(feats, dim=dim, n_rounds=n_rounds, lr=lr)

    rows = [(list(r["x"]), r["y"]) for r in feats.collect()]
    n = float(len(rows))
    w = [0.0] * dim
    for _ in range(n_rounds):
        sums = [Fraction(0)] * dim
        for x, y in rows:
            z = 0.0
            for i in range(dim):
                z = z + x[i] * w[i]
            s = 1.0 / (1.0 + math.exp(-z))
            for i in range(dim):
                c = math.floor(x[i] * (y - s) * 1000000.0 + 0.5) / 1000000.0
                # the DECIMAL(28,6) accumulation is exact: model it as
                # an exact integer sum of the 6 dp unscaled values
                sums[i] += Fraction(round(c * 1000000))
        grads = [float(s) / 1000000.0 / n for s in sums]
        w = [C.py_round6(w[i] + lr * grads[i]) for i in range(dim)]
    assert w == w_spark


def test_hashed_features_edges(spark):
    docs = spark.createDataFrame(
        [(1, "alpha alpha beta"), (2, ""), (3, "   ")],
        "doc_id long, text string",
    )
    got = {r["doc_id"]: list(r["x"]) for r in C.hashed_tf_features(docs, n_buckets=4).collect()}
    assert set(got) == {1, 2, 3}
    # empty/whitespace docs: all-zero features, bias still 1.0
    assert got[2] == [0.0] * 4 + [1.0] and got[3] == [0.0] * 4 + [1.0]
    # tf features sum to ~1 over buckets (3 tokens, each 1/3 or 2/3)
    assert abs(sum(got[1][:-1]) - 1.0) < 1e-5 and got[1][-1] == 1.0
    gotb = {
        r["doc_id"]: list(r["x"])
        for r in C.hashed_tf_features(docs, n_buckets=4, binary=True).collect()
    }
    assert all(v in (0.0, 1.0) for v in gotb[1])
    assert gotb[2] == [0.0] * 4 + [1.0]


def test_logreg_score_is_map_only(spark, sf_dir):
    """Scoring bakes the weights in as literals: the plan after the
    feature build must contain no Join and no extra Exchange beyond
    the feature aggregation itself."""
    docs = read_testdata(spark, sf_dir, "documents")
    feats = C.hashed_tf_features(docs, n_buckets=8)
    feat_plan = feats._jdf.queryExecution().executedPlan().toString()
    plan = C.logreg_score(feats, [0.1] * 9)._jdf.queryExecution().executedPlan().toString()
    # scoring itself adds NO shuffle and no join beyond the feature
    # build's own (count, pivot, meta equi-join) — the weights are
    # plan literals
    assert plan.count("Exchange") == feat_plan.count("Exchange")
    assert plan.count("Join") == feat_plan.count("Join")
    assert "BroadcastNestedLoopJoin" not in plan and "CartesianProduct" not in plan
    # count-then-pivot-then-join shape regression pin: the narrow
    # (doc, bucket) count's __b attribute and the meta join-back must
    # both exist — a revert to the single wide aggregate (the measured
    # 26x cliff) has neither
    assert "__b" in feat_plan and "Join" in feat_plan


def test_logreg_validates(spark):
    docs = spark.createDataFrame([(1, "a")], "doc_id long, text string")
    feats = C.hashed_tf_features(docs, n_buckets=2, label=F.lit(1))
    with pytest.raises(Exception):
        C.logreg_train_fixed(feats, dim=0, n_rounds=1)


def test_logreg_accumulation_paths_identical(spark, sf_dir):
    """The BIGINT micro-unit gradient accumulation (default) and the
    DECIMAL(28,6) path (exact_decimal=True, what the q171 oracle
    mirrors) must produce identical weights in range."""
    docs = read_testdata(spark, sf_dir, "documents").limit(300)
    feats = C.hashed_tf_features(
        docs, n_buckets=8, label=(F.col("n_chars") % 3 == 0).cast("int")
    )
    fast = C.logreg_train_fixed(feats, dim=9, n_rounds=3, lr=4.0)
    exact = C.logreg_train_fixed(feats, dim=9, n_rounds=3, lr=4.0, exact_decimal=True)
    assert fast == exact


# ---- softmax multiclass (q190 scaffolding) ---------------------------------

def _planted_3class(spark, n_per_class=40):
    """Three disjoint vocabularies -> separable 3-way problem."""
    rows = []
    vocab = {0: "alpha beta gamma", 1: "delta epsilon zeta", 2: "eta theta iota"}
    for k, words in vocab.items():
        for i in range(n_per_class):
            rows.append((k * n_per_class + i, f"{words} {words.split()[i % 3]}", k))
    return spark.createDataFrame(rows, "doc_id long, text string, y_true int")


def test_softmax_learns_planted_three_classes(spark):
    docs = _planted_3class(spark)
    feats = C.hashed_tf_features(
        docs, n_buckets=32, label=F.col("y_true"), binary=True
    )
    w = C.softmax_train_fixed(feats, dim=33, n_classes=3, n_rounds=8, lr=4.0)
    scored = C.softmax_score(feats, w, extra_cols=["y"]).collect()
    acc = sum(r["pred"] == int(r["y"]) for r in scored) / len(scored)
    assert acc == 1.0
    # probabilities are a distribution and confidently peaked
    for r in scored:
        ps = [r[f"p{k}"] for k in range(3)]
        assert abs(sum(ps) - 1.0) < 2e-6
        assert max(ps) > 0.5


def test_softmax_matches_pure_python_replay(spark):
    """The distributed recurrence must equal a sequential NumPy-free
    replay bit-for-bit (same quantization, same association order)."""
    import math

    docs = _planted_3class(spark, n_per_class=10)
    feats = C.hashed_tf_features(docs, n_buckets=8, label=F.col("y_true"))
    dim, K, rounds, lr = 9, 3, 3, 2.0
    w_engine = C.softmax_train_fixed(feats, dim=dim, n_classes=K,
                                     n_rounds=rounds, lr=lr)

    rows = feats.select("y", "x").collect()
    data = [(float(r["y"]), list(r["x"])) for r in rows]
    W = [[0.0] * dim for _ in range(K)]
    for _ in range(rounds):
        sums = [[0 for _ in range(dim)] for _ in range(K)]
        for y, x in data:
            zs = []
            for k in range(K):
                z = None
                for i in range(dim):
                    t = x[i] * W[k][i]
                    z = t if z is None else z + t
                zs.append(z)
            m = max(zs)
            es = [math.exp(z - m) for z in zs]
            denom = None
            for e in es:
                denom = e if denom is None else denom + e
            for k in range(K):
                err = (1.0 if y == k else 0.0) - es[k] / denom
                for i in range(dim):
                    sums[k][i] += math.floor(x[i] * err * 1000000.0 + 0.5)
            n = float(len(data))
        W = [
            [
                C.py_round6(W[k][i] + lr * ((sums[k][i] / 1000000.0) / n))
                for i in range(dim)
            ]
            for k in range(K)
        ]
    assert w_engine == W


def test_softmax_validates(spark):
    docs = _planted_3class(spark, n_per_class=5)
    feats = C.hashed_tf_features(docs, n_buckets=8, label=F.col("y_true"))
    with pytest.raises(ValueError):
        C.softmax_train_fixed(feats, dim=0, n_classes=3)
    with pytest.raises(ValueError):
        C.softmax_train_fixed(feats, dim=9, n_classes=1)
    with pytest.raises(ValueError):
        C.softmax_train_fixed(feats, dim=9, n_classes=3, n_rounds=0)


def test_softmax_reserved_name_collision_raises(spark):
    """A caller column colliding with the staging's reserved names
    must raise a ValueError NAMING the column — silently dropping it
    lost the data whenever the same column was requested via
    extra_cols (ADVICE r11)."""
    docs = _planted_3class(spark, n_per_class=5)
    feats = C.hashed_tf_features(docs, n_buckets=8, label=F.col("y_true"))
    w = C.softmax_train_fixed(feats, dim=9, n_classes=3, n_rounds=1)
    staged_clash = feats.withColumn("__m", F.lit(1))
    with pytest.raises(ValueError, match="__m"):
        C.softmax_score(staged_clash, w)
    wt_clash = feats.withColumn("__wt1", F.lit(1))
    with pytest.raises(ValueError, match="__wt1"):
        C.softmax_score(wt_clash, w, extra_cols=["__wt1"])


def test_train_preserves_caller_cache(spark):
    """The trainers only manage a cache THEY created: persist is not
    reference-counted, so the former unconditional finally-unpersist
    evicted a caller's pre-cached feature table and the next consumer
    re-paid the full feature build (r12 probe finding)."""
    from nyc_etl_pipeline_spark.operators.classify import (
        hashed_tf_features,
        logreg_train_fixed,
        softmax_train_fixed,
    )

    docs = spark.createDataFrame(
        [(i, f"w{i % 7} w{i % 3} w2") for i in range(200)],
        "doc_id bigint, text string",
    )
    feats = hashed_tf_features(
        docs, n_buckets=8, label=(F.col("doc_id") % 2 == 0).cast("int")
    )
    # caller-cached input: still cached after training
    cached = feats.persist()
    cached.count()
    logreg_train_fixed(cached, dim=9, n_rounds=1)
    lvl = cached.storageLevel
    assert lvl.useMemory or lvl.useDisk, "train evicted the caller's cache"
    softmax_train_fixed(
        cached.withColumn("y", F.col("doc_id") % 3),
        dim=9, n_classes=3, n_rounds=1, label_col="y",
    )
    lvl = cached.storageLevel
    assert lvl.useMemory or lvl.useDisk
    cached.unpersist()
    # unmanaged input: training leaves no cache entry behind
    logreg_train_fixed(feats, dim=9, n_rounds=1)
    lvl = feats.storageLevel
    assert not (lvl.useMemory or lvl.useDisk)
