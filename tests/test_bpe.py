"""BPE tokenizer training/encoding: deterministic merges, encode
round-trip, distributed-vs-reference parity, driver-bound guard."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.io import read_testdata
from nyc_etl_pipeline_spark.operators import bpe


def test_bpe_learns_expected_merges_on_classic_corpus():
    # the textbook example: 'low' x5, 'lower' x2, 'newest' x6, 'widest' x3
    wf = [("low", 5), ("lower", 2), ("newest", 6), ("widest", 3)]
    merges = bpe.bpe_train_from_word_freqs(wf, n_merges=4)
    # 'es' appears 9x (newest+widest) — the uncontested first merge;
    # then 'es'+'t' (9), then 'est'+'</w>' (9).
    assert merges[0] == ("e", "s")
    assert merges[1] == ("es", "t")
    assert merges[2] == ("est", "</w>")


def test_bpe_overlapping_run_merges_left_to_right():
    """[x,x,x,x] under pair (x,x) must become [xx,xx] — the
    left-to-right non-overlap scan the q125 oracle reproduces with a
    sentinel-wrapped SQL replace(); a per-position merge would give
    three overlapping merges and wrong round-2 counts."""
    wf = [("xxxx", 3), ("xx", 5)]
    merges = bpe.bpe_train_from_word_freqs(wf, n_merges=2)
    # round 1: (x,x) counts 3*3 + 1*5 = 14, beats (x,</w>) at 8
    assert merges[0] == ("x", "x")
    # xxxx -> [xx,xx,</w>], xx -> [xx,</w>]: (xx,</w>) 8 beats (xx,xx) 3
    assert merges[1] == ("xx", "</w>")


def test_bpe_tie_break_is_deterministic():
    wf = [("ab", 3), ("cd", 3)]
    merges = bpe.bpe_train_from_word_freqs(wf, n_merges=1)
    # counts tie at 3 for ('a','b'), ('c','d'), ('b','</w>'), ('d','</w>')
    assert merges[0] == ("a", "b")  # lexicographically smallest pair


def test_bpe_encode_word_reconstructs_and_compresses():
    wf = [("hello", 10), ("help", 5)]
    merges = bpe.bpe_train_from_word_freqs(wf, n_merges=6)
    ranks = {p: i for i, p in enumerate(merges)}
    subs = bpe.bpe_encode_word("hello", ranks)
    assert "".join(subs) == "hello" + bpe.END_OF_WORD
    assert len(subs) < len("hello") + 1  # merges actually applied
    # unseen word still encodes (falls back toward characters)
    unseen = bpe.bpe_encode_word("help", ranks)
    assert "".join(unseen) == "help" + bpe.END_OF_WORD


def test_bpe_train_distributed_matches_reference(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    merges = bpe.bpe_train(docs, n_merges=12)
    # reference: same algorithm over a locally-computed freq table
    local = (
        docs.select(F.explode(F.split(F.trim("text"), r"\s+")).alias("w"))
        .groupBy("w").count().collect()
    )
    ref = bpe.bpe_train_from_word_freqs(
        sorted((r["w"], r["count"]) for r in local), 12
    )
    assert merges == ref
    enc = bpe.bpe_encode(docs, merges)
    row = enc.agg(
        F.sum("n_words").alias("w"), F.sum("n_subwords").alias("s")
    ).first()
    assert row["s"] >= row["w"]  # every word is >= 1 subword
    # 12 merges over a 30-ish-word vocab compress substantially
    assert row["s"] < row["w"] * 6


def test_bpe_train_guards_driver_memory(spark, sf_dir):
    docs = read_testdata(spark, sf_dir, "documents")
    with pytest.raises(ValueError, match="distinct words exceeds"):
        bpe.bpe_train(docs, n_merges=2, max_distinct_words=3)


def test_bpe_encode_tokenizes_like_canonical_tokens(spark):
    """bpe_encode must split words exactly like operators/text.tokens
    (trim = spaces only, split = \\s+), NOT Python str.split(): a
    leading tab yields a phantom empty token in the canonical
    convention (and in the oracle's string_split_regex twin), which
    encodes to exactly one subword ('</w>'). Round-6 review finding."""
    from nyc_etl_pipeline_spark.operators import bpe as B
    from nyc_etl_pipeline_spark.operators.text import tokens
    from pyspark.sql import functions as F

    docs = spark.createDataFrame(
        [(1, "\thello world"), (2, "  plain  "), (3, "")],
        "doc_id long, text string",
    )
    enc = {r["doc_id"]: r for r in B.bpe_encode(docs, [("l", "l")]).collect()}
    ntok = {
        r["doc_id"]: r["n"]
        for r in docs.select("doc_id", F.size(tokens(F.col("text"))).alias("n")).collect()
    }
    for did in (1, 2, 3):
        assert enc[did]["n_words"] == ntok[did], (did, enc[did], ntok[did])
    # doc 1: ['', 'hello', 'world'] -> '' encodes to ['</w>'] alone
    assert enc[1]["n_words"] == 3
    assert enc[1]["n_subwords"] == 1 + len("hello") + 1 - 1 + len("world") + 1  # '' + he(ll)o</w> merged l+l
