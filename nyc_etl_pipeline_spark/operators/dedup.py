"""Deduplication operators: exact, n-gram Jaccard (exact near-dup),
MinHash+LSH (approximate near-dup), SimHash.

Design for 100 TB:
- exact dedup is a hash group-by on the dedup key (one shuffle; at
  scale, group on a digest of the text rather than the text itself so
  shuffle rows stay small).
- n-gram Jaccard uses an inverted shingle index (explode -> self-join
  on shingle -> pair overlap counts). The hot-shingle blowup is capped
  with `max_doc_freq`: shingles appearing in more than that many docs
  carry almost no signal but quadratic join cost — standard trick from
  near-dup literature. With the cap off the result is exact (that is
  the oracle-checked configuration at test SF).
- MinHash banding turns all-pairs into per-bucket candidate pairs:
  cost ~ sum over buckets |bucket|^2, tunable by (bands, rows). The
  signature computation is one explode + group-by with k min-aggregates
  — all JVM-side; no Python in the loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.operators.text import tokens

MERSENNE31 = 2147483647  # 2^31 - 1


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One row per distinct text: canonical (min) id + copy count.

    At scale, group by md5(text) instead of text to keep shuffle keys
    at 16 bytes; collision probability is negligible at 2^64 docs.
    """
    return (
        df.groupBy(F.md5(F.col(text_col)).alias("text_hash"))
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def incremental_exact_dedup(
    new_docs: DataFrame,
    corpus: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Keep only new documents whose content digest is absent from the
    existing corpus AND unique within the batch (first-id wins) — the
    batch-vs-corpus dedup step of an incremental ingestion pipeline
    (the documents-table analogue of the NYC watermark pattern,
    reference gold.py:56-65 — dedup against what's already loaded).

    Both sides join on a 16-byte md5 digest: the corpus side can be a
    stored digest index rather than the raw text (at 100 TB you never
    re-ship document bodies through a shuffle to dedup them).
    """
    new_hashed = new_docs.withColumn("__h", F.md5(F.col(text_col)))
    corpus_hashes = corpus.select(F.md5(F.col(text_col)).alias("__h")).dropDuplicates()
    survivors = new_hashed.join(corpus_hashes, on="__h", how="left_anti")
    first_in_batch = survivors.groupBy("__h").agg(F.min(id_col).alias(id_col))
    return (
        survivors.join(first_in_batch, on=["__h", id_col], how="inner")
        .drop("__h")
    )


def word_shingles(text: Column, n: int = 3) -> Column:
    """Distinct contiguous n-grams of whitespace tokens, as strings."""
    toks = tokens(text)
    k = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(0), F.greatest(k - n, F.lit(-1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i + 1, n)),
    )
    return F.array_distinct(F.when(k >= n, grams).otherwise(F.array().cast("array<string>")))


def _shingle_table(df: DataFrame, id_col: str, text_col: str, n: int) -> DataFrame:
    """(doc, shingle-hash) inverted-index rows. Shingles are joined by
    xxhash64 rather than by string — 8-byte shuffle keys instead of
    ~20-40-byte strings; a cross-doc overlap miscount needs an xxhash64
    collision between two distinct shingles in the same pair
    (~n_shingles^2 / 2^64 — negligible at any realistic corpus)."""
    return df.select(
        F.col(id_col).alias("__id"),
        F.explode(word_shingles(F.col(text_col), n)).alias("__sh_str"),
    ).select("__id", F.xxhash64("__sh_str").alias("__sh"))


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_doc_freq: int | None = None,
) -> DataFrame:
    """Exact all-pairs n-gram Jaccard via inverted shingle index.

    Returns (a_id, b_id, jaccard) with a_id < b_id and
    jaccard >= threshold, jaccard rounded to 3.

    With max_doc_freq=None the result is exact. Setting it drops
    shingles shared by more than that many documents before the
    self-join — the standard scalability/recall trade for web-scale
    corpora (hot shingles are stopword-ish n-grams).
    """
    sh = _shingle_table(df, id_col, text_col, n)
    if max_doc_freq is not None:
        freq = sh.groupBy("__sh").agg(F.count(F.lit(1)).alias("__df"))
        sh = sh.join(freq.filter(F.col("__df") <= max_doc_freq), on="__sh", how="inner").select(
            "__id", "__sh"
        )
    # The shingle table feeds three subtrees (sizes + both join sides);
    # without persist Spark re-runs the explode+distinct generation 3x
    # (measured: 3x the query's total join cost). The ContextCleaner
    # drops the blocks once the result DataFrame is unreferenced.
    sh = sh.persist()
    sizes = sh.groupBy("__id").agg(F.count(F.lit(1)).alias("__n"))

    a = sh.select(F.col("__id").alias("a_id"), "__sh")
    b = sh.select(F.col("__id").alias("b_id"), "__sh")
    overlap = (
        a.join(b, on="__sh", how="inner")
        .filter(F.col("a_id") < F.col("b_id"))
        .groupBy("a_id", "b_id")
        .agg(F.count(F.lit(1)).alias("__ov"))
    )
    sa = sizes.select(F.col("__id").alias("a_id"), F.col("__n").alias("__na"))
    sb = sizes.select(F.col("__id").alias("b_id"), F.col("__n").alias("__nb"))
    jac = F.col("__ov") / (F.col("__na") + F.col("__nb") - F.col("__ov"))
    return (
        overlap.join(sa, on="a_id")
        .join(sb, on="b_id")
        .filter(jac >= threshold)
        .select("a_id", "b_id", F.round(jac, 3).alias("jaccard"))
    )


def _minhash_signature_cols(num_hashes: int) -> list[Column]:
    """k universal-hash min-aggregates over the base shingle hash h:
    mh_i = min((a_i * h + b_i) mod p). Constants derive from splitmix-
    style integer mixing of i — deterministic across runs/engines."""
    cols = []
    h = F.pmod(F.xxhash64("__sh"), F.lit(MERSENNE31))
    for i in range(num_hashes):
        a = (i * 2654435761 + 1) % MERSENNE31
        b = (i * 40503 + 2654435769) % MERSENNE31
        cols.append(F.min(F.pmod(a * h + b, F.lit(MERSENNE31))).alias(f"mh_{i}"))
    return cols


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
) -> DataFrame:
    """(id, mh_0..mh_{k-1}) MinHash signatures over word n-grams."""
    sh = _shingle_table(df, id_col, text_col, n)
    return sh.groupBy(F.col("__id").alias(id_col)).agg(*_minhash_signature_cols(num_hashes))


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 128,
    bands: int = 32,
    threshold: float = 0.5,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding, then EXACT Jaccard
    verification of the candidates.

    Probabilistic recall (a pair is a candidate iff some band matches
    exactly); precision is exact because candidates are re-verified
    against true n-gram Jaccard. Returns (a_id, b_id, jaccard).
    """
    rows = num_hashes // bands
    # shared by the signature build and the exact-verification join
    sh_cached = _shingle_table(df, id_col, text_col, n).persist()
    sig = sh_cached.groupBy(F.col("__id").alias(id_col)).agg(
        *_minhash_signature_cols(num_hashes)
    )
    band_cols = [
        F.xxhash64(*[F.col(f"mh_{b * rows + r}") for r in range(rows)]).alias(f"band_{b}")
        for b in range(bands)
    ]
    banded = sig.select(F.col(id_col).alias("__id"), *band_cols)
    melted = banded.select(
        "__id",
        F.explode(
            F.array(*[
                F.struct(F.lit(b).alias("band_idx"), F.col(f"band_{b}").alias("band_key"))
                for b in range(bands)
            ])
        ).alias("bk"),
    ).select("__id", "bk.band_idx", "bk.band_key")

    a = melted.select(F.col("__id").alias("a_id"), "band_idx", "band_key")
    b = melted.select(F.col("__id").alias("b_id"), "band_idx", "band_key")
    cands = (
        a.join(b, on=["band_idx", "band_key"], how="inner")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id")
        .dropDuplicates()
    )

    # exact verification: recompute Jaccard only for candidate pairs.
    # Shingle sets ride as per-doc arrays so each pair costs
    # O(|A|+|B|) via array_intersect — a row-level shingle join here
    # would cross |A|x|B| rows per pair and erase the LSH win.
    doc_arrays = sh_cached.groupBy("__id").agg(
        F.collect_set("__sh").alias("__arr"), F.count(F.lit(1)).alias("__n")
    )
    a_side = doc_arrays.select(
        F.col("__id").alias("a_id"), F.col("__arr").alias("__arr_a"), F.col("__n").alias("__na")
    )
    b_side = doc_arrays.select(
        F.col("__id").alias("b_id"), F.col("__arr").alias("__arr_b"), F.col("__n").alias("__nb")
    )
    ovc = F.size(F.array_intersect("__arr_a", "__arr_b"))
    jac = ovc / (F.col("__na") + F.col("__nb") - ovc)
    return (
        cands.join(a_side, on="a_id")
        .join(b_side, on="b_id")
        .filter(jac >= threshold)
        .select("a_id", "b_id", F.round(jac, 3).alias("jaccard"))
    )


def neardup_clusters(
    nodes: DataFrame, pairs: DataFrame, id_col: str = "doc_id"
) -> DataFrame:
    """Connected components over near-dup pairs: every document gets a
    cluster representative (the minimum doc id reachable through the
    pair graph) — the canonical-document selection step of a dedup
    pipeline. Singletons are their own representative.

    Iterative min-label propagation to fixpoint; near-dup components
    have tiny diameters so this converges in a few rounds. Each round
    localCheckpoints to truncate lineage (iterative plans otherwise
    grow unboundedly). For billion-edge graphs swap in the
    large-star/small-star formulation — same DataFrame-only shape.
    """
    edges = pairs.select(F.col("a_id").alias("src"), F.col("b_id").alias("dst")).unionByName(
        pairs.select(F.col("b_id").alias("src"), F.col("a_id").alias("dst"))
    )
    edges = edges.localCheckpoint()
    labels = nodes.select(F.col(id_col).alias("node"), F.col(id_col).alias("label")).localCheckpoint()
    while True:
        neighbor_min = (
            edges.join(labels, edges.dst == labels.node)
            .groupBy("src")
            .agg(F.min("label").alias("nmin"))
        )
        new_labels = (
            labels.join(neighbor_min, labels.node == neighbor_min.src, "left")
            .select(
                "node",
                F.least(F.col("label"), F.coalesce(F.col("nmin"), F.col("label"))).alias("label"),
            )
            .localCheckpoint()
        )
        changed = (
            labels.alias("o")
            .join(new_labels.alias("n"), on="node")
            .filter(F.col("o.label") != F.col("n.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("node").alias(id_col), F.col("label").alias("cluster_rep"))


def simhash_signatures(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", bits: int = 64
) -> DataFrame:
    """64-bit SimHash over whitespace tokens: per-bit vote sum of token
    hashes, sign -> bit. explode + groupBy with `bits` partial-agg sum
    columns — map-side combine keeps the shuffle at one row per doc.
    (shiftright/shiftleft take literal bit counts, hence the Python
    loop over bit positions rather than a higher-order lambda.)"""
    exploded = df.select(
        F.col(id_col).alias("__id"),
        F.explode(tokens(F.col(text_col))).alias("__tok"),
    ).withColumn("__h", F.xxhash64("__tok"))
    votes = [
        F.sum(
            F.when(F.shiftright(F.col("__h"), j).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
        ).alias(f"__v{j}")
        for j in range(bits)
    ]
    agg = exploded.groupBy("__id").agg(*votes)
    sig = None
    for j in range(bits):
        # two's-complement top bit: 1<<63 overflows signed 64-bit
        bit_val = (1 << j) if j < 63 else -(1 << 63)
        term = (
            F.when(F.col(f"__v{j}") > 0, F.lit(bit_val).cast("bigint"))
            .otherwise(F.lit(0).cast("bigint"))
        )
        sig = term if sig is None else sig.bitwiseOR(term)
    return agg.select(F.col("__id").alias(id_col), sig.alias("simhash"))


def simhash_near_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 7,
    n_blocks: int = 8,
) -> DataFrame:
    """Candidate pairs whose 64-bit SimHash differs in <= max_hamming
    bits, found by the block trick (a pair within Hamming distance
    n_blocks-1 must agree exactly on at least one of n_blocks blocks —
    pigeonhole), then verified with bit_count on the XOR.

    Default 8 blocks of 8 bits guarantees recall for max_hamming <= 7.
    """
    if max_hamming > n_blocks - 1:
        raise ValueError("block trick guarantees recall only for max_hamming <= n_blocks-1")
    width = 64 // n_blocks
    mask = (1 << width) - 1
    sig = simhash_signatures(df, id_col, text_col)
    blocks = sig.select(
        F.col(id_col).alias("__id"),
        "simhash",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("blk_idx"),
                    F.shiftright("simhash", b * width).bitwiseAND(F.lit(mask)).alias("blk_key"),
                )
                for b in range(n_blocks)
            ])
        ).alias("bk"),
    ).select("__id", "simhash", "bk.blk_idx", "bk.blk_key")
    a = blocks.select(F.col("__id").alias("a_id"), F.col("simhash").alias("__sig_a"), "blk_idx", "blk_key")
    b = blocks.select(F.col("__id").alias("b_id"), F.col("simhash").alias("__sig_b"), "blk_idx", "blk_key")
    hamming = F.bit_count(F.col("__sig_a").bitwiseXOR(F.col("__sig_b")))
    return (
        a.join(b, on=["blk_idx", "blk_key"], how="inner")
        .filter(F.col("a_id") < F.col("b_id"))
        .select("a_id", "b_id", hamming.alias("hamming"))
        .dropDuplicates()
        .filter(F.col("hamming") <= max_hamming)
    )
