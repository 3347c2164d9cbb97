"""Invariants of the composed curation pipeline (examples/
curation_pipeline.py): dedup actually deduplicates, decontamination
actually removes benchmark-overlapping docs, splits are disjoint and
exhaustive over the curated set, and redaction leaves no raw PII."""

import importlib.util
import os

from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators import dedup as D


def _load():
    spec = importlib.util.spec_from_file_location(
        "curation_pipeline",
        os.path.join(os.path.dirname(__file__), "..", "examples", "curation_pipeline.py"),
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def test_curation_pipeline_invariants(spark, sf_dir):
    mod = _load()
    docs = read_testdata(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    candidates = docs.filter(F.col("doc_id") % 17 != 0)
    splits = mod.curate(candidates, benchmark)

    frames = list(splits.values())
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    union = union.cache()
    n = union.count()
    assert n > 0

    # exact-dedup invariant: every surviving text digest is unique
    assert union.select(F.md5("text")).distinct().count() == n

    # near-dup invariant: no surviving pair above the Jaccard threshold
    pairs = D.ngram_jaccard_pairs(
        union, n=mod.NGRAM_N, threshold=mod.JACCARD_THRESHOLD
    )
    assert pairs.count() == 0

    # passage-gate invariant: no survivor is mostly duplicated
    # passages (frac vs the surviving subset <= frac vs the gated
    # superset <= cutoff, so the one-pass gate is sufficient)
    pstats = D.duplicated_passage_stats(union, k=mod.PASSAGE_K)
    assert pstats.filter(F.col("dup_frac") > mod.PASSAGE_DUP_CUTOFF).count() == 0

    # decontamination invariant: no survivor is contaminated
    contam = D.contamination_scores(
        union, benchmark, n=mod.NGRAM_N, threshold=mod.CONTAM_THRESHOLD
    )
    assert contam.filter(F.col("is_contaminated")).count() == 0

    # quality/language gates applied
    row = union.agg(
        F.min("quality").alias("qmin"),
        F.countDistinct("lang_pred").alias("nlang"),
    ).first()
    assert row["qmin"] >= mod.QUALITY_CUTOFF
    assert row["nlang"] == 1

    # splits disjoint + exhaustive
    ids = {
        name: {r["doc_id"] for r in df.select("doc_id").collect()}
        for name, df in splits.items()
    }
    assert sum(len(v) for v in ids.values()) == n
    assert not (ids["train"] & ids["val"]) and not (ids["train"] & ids["test"])

    # determinism: a second run assigns identical splits
    again = mod.curate(candidates, benchmark)
    assert {r["doc_id"] for r in again["val"].select("doc_id").collect()} == ids["val"]
    union.unpersist()


def test_curation_rebalance_and_chunking(spark, sf_dir):
    """Stages 7/10: the per-source cap bounds every source's share, and
    post-split chunking keeps every chunk inside its doc's split (no
    leakage by construction) while covering the full normalized text."""
    from pyspark.sql import functions as F

    import examples.curation_pipeline as mod
    from nyc_etl_pipeline_spark.io import read_testdata

    docs = read_testdata(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    candidates = docs.filter(F.col("doc_id") % 17 != 0)

    cap = 3
    splits = mod.curate(candidates, benchmark, per_source_cap=cap)
    union = splits["train"].unionByName(splits["val"]).unionByName(splits["test"])
    worst = union.groupBy("source").count().agg(F.max("count")).first()[0]
    assert worst <= cap

    chunks = mod.chunk_split(splits["train"], size=200, stride=150)
    train_ids = {r["doc_id"] for r in splits["train"].select("doc_id").collect()}
    chunk_rows = chunks.collect()
    assert {r["doc_id"] for r in chunk_rows} == train_ids  # same docs, no leakage
    # stride-aligned reconstruction covers the whole normalized text
    texts = {
        r["doc_id"]: r["text_norm"] for r in splits["train"].select("doc_id", "text_norm").collect()
    }
    by_doc = {}
    for r in sorted(chunk_rows, key=lambda r: (r["doc_id"], r["chunk_idx"])):
        by_doc.setdefault(r["doc_id"], []).append(r["chunk"])
    for did, parts in by_doc.items():
        rebuilt = "".join(p[:150] for p in parts[:-1]) + parts[-1]
        assert rebuilt == texts[did], did


def test_curation_weighted_downsample_and_nll_gate(spark, sf_dir):
    mod = _load()
    docs = read_testdata(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    candidates = docs.filter(F.col("doc_id") % 17 != 0)

    target = 100
    splits = mod.curate(candidates, benchmark, target_corpus_size=target)
    frames = list(splits.values())
    union = frames[0]
    for f in frames[1:]:
        union = union.unionByName(f)
    union = union.cache()
    n = union.count()
    assert 0 < n <= target
    # NLL gate: every survivor's score is within the cutoff
    assert union.filter(F.col("nll") > mod.NLL_CUTOFF).count() == 0
    # deterministic: the same curate call keeps the same documents
    again = mod.curate(candidates, benchmark, target_corpus_size=target)
    au = list(again.values())[0]
    for f in list(again.values())[1:]:
        au = au.unionByName(f)
    ids_a = {r.doc_id for r in union.select("doc_id").collect()}
    ids_b = {r.doc_id for r in au.select("doc_id").collect()}
    assert ids_a == ids_b


def test_curation_mixture_weighting(spark, sf_dir):
    mod = _load()
    docs = read_testdata(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    candidates = docs.filter(F.col("doc_id") % 17 != 0)
    weights = {f"src{i}": 1.0 for i in range(10)}  # drop src10..src19
    splits = mod.curate(
        candidates, benchmark, mixture_weights=weights, mixture_total=40
    )
    union = splits["train"]
    for name in ("val", "test"):
        union = union.unionByName(splits[name])
    srcs = {r["source"] for r in union.select("source").distinct().collect()}
    assert srcs and srcs <= set(weights)


def test_curation_mad_length_gate_drops_planted_giant(spark, sf_dir):
    """Stage 7b: a quality-passing English doc 100x the source's
    typical token count must be dropped by the median/MAD length
    bound, while the ordinary docs of the same source survive. The
    planted giant repeats normal-looking sentences, so it passes the
    quality/lang/NLL gates and ONLY the robust length gate can catch
    it. (Repeating unique-per-sentence filler words keeps its passage
    dup_frac at zero.)"""
    mod = _load()
    docs = read_testdata(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    base = docs.filter(F.col("doc_id") % 17 != 0)
    sent = " ".join(
        f"the data w{i} is a good and fast table for all work" for i in range(220)
    )
    giant = spark.createDataFrame(
        [(999_999, sent, "en", "src1", len(sent))],
        ["doc_id", "text", "lang", "source", "n_chars"],
    )
    splits = mod.curate(base.unionByName(giant), benchmark)
    union = None
    for f in splits.values():
        union = f if union is None else union.unionByName(f)
    ids = {r["doc_id"] for r in union.select("doc_id").collect()}
    assert 999_999 not in ids, "giant doc survived the MAD length gate"
    # the gate is targeted: src1's ordinary docs still present
    assert union.filter(F.col("source") == "src1").count() > 0


def test_curation_split_guard_no_residual_straddle(spark, sf_dir):
    """Stage 10 is leakage-safe at the GUARD threshold: pairs in the
    residual-similarity band (guard <= j < dedup threshold) survive
    dedup as distinct docs but must share a split."""
    from nyc_etl_pipeline_spark.operators import sampling as S

    mod = _load()
    docs = read_testdata(spark, sf_dir, "documents")
    bench = docs.filter(F.col("doc_id") % 17 == 0)
    cand = docs.filter(F.col("doc_id") % 17 != 0)
    splits = mod.curate(cand, bench)
    tagged = None
    for name, part in splits.items():
        t = part.select(F.lit(name).alias("split"), "doc_id")
        tagged = t if tagged is None else tagged.unionByName(t)
    survivors = tagged.select("doc_id")
    surv_docs = cand.join(survivors, "doc_id", "left_semi")
    guard_pairs = D.ngram_jaccard_pairs(
        surv_docs, n=mod.NGRAM_N, threshold=mod.SPLIT_GUARD_JACCARD
    )
    assert S.split_leakage_audit(guard_pairs, tagged).count() == 0
    # splits still partition the survivors
    assert tagged.count() == tagged.select("doc_id").distinct().count()


def test_curation_boilerplate_stage_keeps_banner_out_of_training_text(spark):
    """Stage 0b: a banner line shared by many docs is stripped BEFORE
    hashing. Without the stage, the banner-laden copy of a duplicated
    body is LONGER, so near-dup keep-best keeps it — chrome leaks into
    the training text. With the stage, the banner is gone from every
    survivor and exactly one copy of the shared body remains."""
    mod = _load()
    banner = "ALL RIGHTS RESERVED EXAMPLE CORP"
    body_a = "alpha writes about spark partitions and shuffles today"
    body_b = "totally different beta content with unique words galore"
    rows = [
        (1, f"{banner}\n{body_a}", "en", "src0"),
        (2, f"{body_a}", "en", "src0"),          # same body, no banner
        (3, f"{banner}\n{body_b}", "en", "src1"),
        (4, f"{banner}\nunique gamma line here", "en", "src1"),
    ]
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string"
    ).withColumn("n_chars", F.length("text").cast("bigint"))
    bench = docs.filter(F.lit(False))  # empty benchmark

    def survivors(**kw):
        splits = mod.curate(docs, bench, quality_cutoff=0.0, **kw)
        rows_out = []
        for part in splits.values():
            rows_out += part.select("doc_id", "text").collect()
        return {r["doc_id"]: r["text"] for r in rows_out}

    with_stage = survivors(boilerplate_max_df=2)
    without_stage = survivors()
    # with the stage: no survivor text carries the banner, and the
    # shared body survives exactly once
    assert all(banner not in t for t in with_stage.values())
    assert len({1, 2} & set(with_stage)) == 1
    # without it: docs 1/2 are near-dups and keep-best keeps the
    # LONGER, banner-laden copy — boilerplate lands in training text
    assert 1 in without_stage and 2 not in without_stage
    assert banner in without_stage[1]


def test_curation_classifier_gate_drops_offvocab_docs(spark):
    """Stage 5b behavioral pin: a seed slice of reference-vocabulary
    docs trains the classifier; unseeded docs from the SAME vocabulary
    must survive (the model generalizes past the literal seed ids)
    while junk-vocabulary docs are dropped — the heuristic stage-4
    gate cannot make this cut (both classes have ordinary lengths and
    stopword ratios)."""
    mod = _load()

    # every doc: en-marker prefix (passes the lang gate) + a 12-token
    # UNIQUE block (kills exact/near-dup and the passage gate: shared
    # shingle fraction ~0.2 << 0.5) + an 8-token class vocabulary
    # (the stable signal the classifier must find)
    ref_tail = "data table join scan merge sort group order"
    junk_tail = "zzq xvw qqj wzx vqk jzz kxv qwz"

    def mk(i, tail):
        uniq = " ".join(f"u{i}x{j}" for j in range(12))
        return f"the and is {uniq} {tail}"

    rows = []
    for i in range(30):  # seed slice: reference vocab, labeled source
        rows.append((i, mk(i, ref_tail), "en", "seed", 200))
    for i in range(30, 60):  # unseeded reference-vocab docs
        rows.append((i, mk(i, ref_tail), "en", "web", 200))
    for i in range(60, 75):  # junk vocabulary
        rows.append((i, mk(i, junk_tail), "en", "web", 200))
    docs = spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    )
    benchmark = spark.createDataFrame(
        [(999, "completely unrelated benchmark sentence here")],
        "doc_id long, text string",
    )

    def ids(splits):
        out = set()
        for df in splits.values():
            out |= {r["doc_id"] for r in df.select("doc_id").collect()}
        return out

    base = ids(mod.curate(docs, benchmark, quality_cutoff=0.0))
    assert {i for i in range(60, 75)} <= base  # junk survives without the gate

    gated = ids(
        mod.curate(
            docs,
            benchmark,
            quality_cutoff=0.0,
            classifier_seed=(F.col("source") == "seed").cast("int"),
            classifier_buckets=128,
        )
    )
    junk_kept = {i for i in gated if i >= 60}
    web_ref_kept = {i for i in gated if 30 <= i < 60}
    assert not junk_kept  # classifier drops every off-vocab doc
    assert len(web_ref_kept) >= 25  # and generalizes past the seed ids


def test_curation_bloom_decontamination_is_one_sided(spark, sf_dir):
    """bloom_m_bits switches stage 3 to the Bloom form: its survivor
    set must be a SUBSET of the exact form's (deterministic FPs can
    only over-drop, never leak a contaminated doc through), and with a
    roomy filter the two pipelines agree exactly."""
    mod = _load()
    docs = read_testdata(spark, sf_dir, "documents")
    benchmark = docs.filter(F.col("doc_id") % 17 == 0)
    candidates = docs.filter(F.col("doc_id") % 17 != 0)

    def ids(splits):
        frames = list(splits.values())
        u = frames[0]
        for f in frames[1:]:
            u = u.unionByName(f)
        return {r["doc_id"] for r in u.select("doc_id").collect()}

    exact_ids = ids(mod.curate(candidates, benchmark))
    bloom_ids = ids(mod.curate(candidates, benchmark, bloom_m_bits=1 << 16))
    assert bloom_ids <= exact_ids
    assert bloom_ids == exact_ids  # roomy filter: zero FPs on this corpus
