"""Count-min sketch: fixed-size, mergeable frequency summaries.

At 100 TB the exact token-frequency table is itself huge; a CMS is a
d x w counter grid (here 4 x 256 = 1 KB of longs) that answers
"how often does token t occur?" with est >= true and
est <= true + eps*N (eps ~ e/w) at high probability. Two sketches
over different shards MERGE by cell-wise addition — the property that
lets every executor build a partial sketch map-side and a single
reduce produce the corpus sketch (the same algebraic-merge story as
operators/incremental.py, for a fixed-size summary).

Hashes are `md5_long` over a per-row salt prefix, so the whole sketch
— and any point estimate read from it — is bit-reproducible in DuckDB
(q124 gates estimates against exact counts).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from nyc_etl_pipeline_spark.functions import md5_long, sql_md5_long
from nyc_etl_pipeline_spark.hygiene import scratch_persist

CMS_DEPTH = 4
CMS_WIDTH = 256


def _check_depth(depth: int) -> None:
    """Shared guard: 4 x 7 hex chars is all one md5 digest provides;
    a deeper sketch would silently slice truncated (weak) hashes."""
    if depth > 4:
        raise ValueError("depth > 4 needs more digest bits than one md5 slice set")


def cms_bucket(token: Column, row_i: int, width: int) -> Column:
    """Row-i hash bucket of a token: a disjoint 7-hex-digit (28-bit)
    slice of ONE md5 digest, mod width. One digest yields all four
    row hashes — md5 is the dominant cost of building the sketch over
    a 100 TB token stream, and an earlier per-row salted-digest
    version measured 62 s for the 1M-doc probe vs ~16 s for this one
    (whole-stage codegen CSE computes the shared md5 once per token).
    Digest slices are independent uniform hashes for CMS purposes;
    depth is capped at 4 (4 x 7 hex chars <= the 32-char digest)."""
    return F.pmod(md5_long(token, start=1 + 7 * row_i, nhex=7), F.lit(width))


def sql_cms_bucket(token_expr: str, row_i: int, width: int) -> str:
    """DuckDB fragment computing the identical bucket as `cms_bucket`."""
    return f"({sql_md5_long(token_expr, 1 + 7 * row_i, 7)} % {width})"


def cms_build(
    tokens_df: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Build the sketch from a one-token-per-row table in ONE pass:
    each token explodes into `depth` (row_i, bucket) cells via inline
    (struct-array) expansion, then a single map-side-combinable
    group-by sums cells. Output: (row_i, bucket, cnt) — at most
    depth*width rows no matter the corpus size."""
    _check_depth(depth)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                cms_bucket(F.col(token_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    return (
        tokens_df.select(F.explode(cells).alias("c"))
        .groupBy(F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cms_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge partial sketches by cell-wise addition (associative,
    commutative — shard order can never change an estimate)."""
    from functools import reduce

    return (
        reduce(lambda a, b: a.unionByName(b), sketches)
        .groupBy("row_i", "bucket")
        .agg(F.sum("cnt").alias("cnt"))
    )


def cms_estimate(
    sketch: DataFrame,
    queries: DataFrame,
    token_col: str = "token",
    depth: int = CMS_DEPTH,
    width: int = CMS_WIDTH,
) -> DataFrame:
    """Point estimates for the query tokens: min over rows of the
    row's counter at that token's bucket. The query side re-computes
    each row's bucket, unpivots to (token, row_i, bucket), and joins
    the sketch on (row_i, bucket) — the sketch is depth*width rows, so
    Spark broadcasts it and the lookup never shuffles the queries."""
    _check_depth(depth)
    cells = F.array(
        *[
            F.struct(
                F.lit(i).alias("row_i"),
                cms_bucket(F.col(token_col), i, width).alias("bucket"),
            )
            for i in range(depth)
        ]
    )
    probes = queries.select(token_col, F.explode(cells).alias("c")).select(
        token_col, F.col("c.row_i").alias("row_i"), F.col("c.bucket").alias("bucket")
    )
    # LEFT join + coalesce 0: a sketch only stores touched cells, so a
    # never-seen token's empty cell means estimate 0 — an inner join
    # would silently drop the empty cell and OVERESTIMATE from the
    # remaining rows (or lose the token entirely if all cells are
    # empty), breaking the est >= true >= 0 contract from the wrong
    # side for absent tokens.
    return (
        probes.join(F.broadcast(sketch), on=["row_i", "bucket"], how="left")
        .groupBy(token_col)
        .agg(F.min(F.coalesce(F.col("cnt"), F.lit(0))).alias("cms_estimate"))
    )


# ---------------------------------------------------------------------------
# Fixed-grid histogram sketch: mergeable quantile estimation
# ---------------------------------------------------------------------------

def hist_build(
    df: DataFrame,
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Fixed-grid histogram sketch of a numeric column: (bin, cnt),
    at most n_bins rows regardless of input size. The scale-path
    companion to the exact sort-based percentiles (suite q58): exact
    quantiles need a full sort (or Spark's percentile agg, which
    buffers per-group values); this is ONE map-side-combinable
    aggregation producing a fixed-size summary whose quantile answers
    carry a <= one-bin-width error bound.

    Grid semantics: bin = clamp(floor((x - lo) / w), 0, n_bins - 1)
    with w = (hi - lo) / n_bins — out-of-range values saturate into
    the edge bins (the error bound then only holds for in-range
    data; pick the grid from domain knowledge, as any fixed-size
    histogram requires). Null values are dropped. Choose lo/hi/n_bins
    so w is a dyadic rational (e.g. 216.0) and the bin arithmetic is
    bit-identical on every IEEE-754 engine.

    Merge property: histograms over disjoint shards merge by
    cell-wise addition (hist_merge) — partials build map-side on
    every executor, one tiny reduce yields the global sketch, and a
    stored per-partition sketch table supports incremental
    maintenance exactly like operators/incremental.py.
    """
    w = (hi - lo) / n_bins
    x = F.col(value_col).cast("double")
    b = F.floor((x - F.lit(lo)) / F.lit(w)).cast("int")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    return (
        df.filter(x.isNotNull())
        .select(bin_.alias("bin"))
        .groupBy("bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_merge(sketches: list[DataFrame]) -> DataFrame:
    """Merge partial histograms by cell-wise addition (associative +
    commutative: shard order can never change a quantile answer)."""
    from functools import reduce

    return (
        reduce(lambda a, b: a.unionByName(b), sketches)
        .groupBy("bin")
        .agg(F.sum("cnt").alias("cnt"))
    )


def hist_quantiles(
    hist: DataFrame,
    pcts: list[int],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Quantile estimates from the cumulative histogram: for each
    integer percentile pct, the UPPER edge of the first bin whose
    cumulative count reaches k = ceil(pct * N / 100) — a conservative
    (upper-bounding) estimate within one bin width of the true
    order statistic for in-range data.

    All arithmetic after the bin ints is fixed-order double ops on
    dyadic constants, so the emitted estimates are bit-identical
    cross-engine (no transcendentals, no merge-order sensitivity —
    the cumulative sum is over the deterministic bin order). The
    window runs over <= n_bins rows (bounded by the grid, not the
    data), so the single-partition WindowExec is safe at any scale.

    N (the grand total) is computed as a second window over the SAME
    bounded bin table, not a separate .agg() branch — a lazy `hist`
    lineage consumed twice would recompute, i.e. scan the source
    twice (caught in the round-6 plan audit: 2 parquet scans, 7
    exchanges before; 1 scan after).
    """
    from pyspark.sql import Window as W

    w = (hi - lo) / n_bins
    cum = hist.select(
        "bin",
        F.sum("cnt").over(
            W.orderBy("bin").rowsBetween(W.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(
            W.orderBy("bin").rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("n_total"),
    )
    pdf = hist.sparkSession.createDataFrame([(p,) for p in pcts], "pct int")
    k = F.ceil((F.col("pct") * F.col("n_total")) / F.lit(100.0))
    return (
        F.broadcast(pdf)
        .join(cum, cum["cum"] >= k)
        .groupBy("pct")
        .agg(F.min("bin").alias("__bin"))
        .select(
            "pct",
            (F.lit(lo) + (F.col("__bin") + F.lit(1)) * F.lit(w)).alias("q_upper"),
        )
    )


def hist_build_by(
    df: DataFrame,
    group_cols: list[str],
    value_col: str,
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Per-group fixed-grid histogram: (group..., bin, cnt), at most
    n_bins rows PER GROUP. Same grid semantics as hist_build (clamped
    edge bins, nulls dropped, dyadic width for bit-identical bins)."""
    w = (hi - lo) / n_bins
    x = F.col(value_col).cast("double")
    b = F.floor((x - F.lit(lo)) / F.lit(w)).cast("int")
    bin_ = F.least(F.lit(n_bins - 1), F.greatest(F.lit(0), b))
    return (
        df.filter(x.isNotNull())
        .select(*group_cols, bin_.alias("bin"))
        .groupBy(*group_cols, "bin")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def hist_quantiles_by(
    hist: DataFrame,
    group_cols: list[str],
    pcts: list[int],
    lo: float,
    hi: float,
    n_bins: int,
) -> DataFrame:
    """Per-group quantile estimates from per-group cumulative
    histograms — the curation-pipeline form (e.g. per-source document
    length P95 to set cut thresholds). Windows partition by group and
    span <= n_bins rows per partition (bounded by the grid, never the
    data), so the sort inside each partition is O(n_bins log n_bins)
    regardless of corpus size; group count only widens parallelism.
    Same deterministic upper-edge arithmetic as hist_quantiles."""
    from pyspark.sql import Window as W

    w = (hi - lo) / n_bins
    cum = hist.select(
        *group_cols,
        "bin",
        F.sum("cnt").over(
            W.partitionBy(*group_cols).orderBy("bin")
            .rowsBetween(W.unboundedPreceding, 0)
        ).alias("cum"),
        F.sum("cnt").over(
            W.partitionBy(*group_cols).orderBy("bin")
            .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
        ).alias("n_total"),
    )
    pdf = hist.sparkSession.createDataFrame([(p,) for p in pcts], "pct int")
    k = F.ceil((F.col("pct") * F.col("n_total")) / F.lit(100.0))
    return (
        F.broadcast(pdf)
        .join(cum, cum["cum"] >= k)
        .groupBy(*group_cols, "pct")
        .agg(F.min("bin").alias("__bin"))
        .select(
            *group_cols,
            "pct",
            (F.lit(lo) + (F.col("__bin") + F.lit(1)) * F.lit(w)).alias("q_upper"),
        )
    )


# --------------------------------------------------------------------------
# Misra-Gries summaries -> exact heavy hitters in two bounded passes
# --------------------------------------------------------------------------


def mg_partial_summaries(
    tokens: DataFrame, col: str = "token", k_summary: int = 64
) -> DataFrame:
    """Per-partition Misra-Gries frequency summaries: at most
    `k_summary` (token, weight) rows per partition, built in ONE pass
    with memory bounded by k_summary counters plus a 32-Arrow-batch
    merge buffer — constant in partition size and distinct count.

    Each Arrow batch's value_counts merges into the running summary;
    when the summary exceeds k_summary entries, every weight drops by
    the (k_summary+1)-th largest and non-positive entries are evicted
    (the mergeable-summaries form of the MG decrement, Agarwal et al.
    2013). Guarantee: any token with partition frequency
    > n_p / (k_summary + 1) still holds a counter at partition end.
    By averaging, a token with GLOBAL frequency > n / (k_summary + 1)
    must exceed that ratio in at least one partition — so the UNION of
    partial summaries is a certified superset of every global heavy
    hitter at that threshold. This is the sketch the exact two-pass
    `exact_heavy_hitters` builds its candidate set from.

    Each partition also emits ONE sentinel row (token NULL, weight =
    its non-null token count): summing them gives exact n without a
    separate counting scan of a source too big to cache. Input NULLs
    are not tokens (value_counts drops them) and so can't collide
    with the sentinel.
    """
    def _reduce(buf, limit: int):
        # mergeable-summaries reduction: subtract the (limit+1)-th
        # largest weight from EVERY entry, evict the non-positive. The
        # top limit+1 entries each lose exactly `cut`, so each
        # reduction removes >= (limit+1)*cut total weight and the
        # per-item error across a partition stays <= n_p/(limit+1) no
        # matter how large the buffer was when the cut was taken.
        if len(buf) <= limit:
            return buf
        cut = buf.nlargest(limit + 1).iloc[-1]
        buf = buf - cut
        return buf[buf > 0]

    def gen(batches):
        # Arrow-native: value_counts per batch is C and only per-batch
        # DISTINCTS ever become pandas objects (the raw stream never
        # does); summaries merge associatively, so batches merge
        # hierarchically (32 at a time). Measured at 60M tokens: this
        # pass runs 9.6 s of which 6.7 s is the bare JVM->Python Arrow
        # transfer of the stream (a no-op mapInArrow) — the summary
        # work itself is ~1 s above the boundary floor, so further
        # tuning here is pointless; a JVM-native MG aggregate is the
        # only way under the floor.
        import pandas as pd
        import pyarrow as pa
        import pyarrow.compute as pc

        buf = pd.Series(dtype="int64")
        parts: list = []
        n_p = 0

        def _merge():
            nonlocal buf, parts
            buf = (
                pd.concat([buf, *parts]).groupby(level=0).sum()
                if parts
                else buf
            )
            parts = []
            buf = _reduce(buf, k_summary)

        for rb in batches:
            arr = rb.column(0)
            n_p += len(arr) - arr.null_count
            vc = pc.value_counts(arr)
            s = pd.Series(
                vc.field("counts").to_numpy(),
                index=vc.field("values").to_pandas(),
            )
            if arr.null_count:
                s = s[~s.index.isna()]
            parts.append(s)
            if len(parts) >= 32:
                _merge()
        _merge()
        yield pa.RecordBatch.from_arrays(
            [
                pa.array(list(buf.index) + [None], type=pa.string()),
                pa.array(
                    [int(x) for x in buf.values] + [n_p], type=pa.int64()
                ),
            ],
            names=[col, "weight"],
        )

    return tokens.select(col).mapInArrow(
        gen, schema=f"{col} string, weight long"
    )


def exact_heavy_hitters(
    tokens: DataFrame, k_threshold: int, col: str = "token",
    k_summary: int | None = None,
) -> DataFrame:
    """EXACT counts of every token whose frequency exceeds
    n / k_threshold, without ever materializing the full distinct-token
    frequency table.

    Pass 1 builds per-partition Misra-Gries summaries (bounded memory,
    no shuffle); their union — at most k_summary * partitions rows —
    is a certified candidate superset for k_summary >= k_threshold
    (see mg_partial_summaries), and its sentinel rows sum to exact n.
    Pass 2 broadcast-semi-joins the token stream against the
    candidates and aggregates ONLY matching rows, then keeps
    cnt * k_threshold > n (integer-exact — no float division at the
    decision boundary). Exactly TWO scans of the source and nothing
    cached: persisting the stream was measured SLOWER at 60M tokens
    than re-scanning it (cache deserialization beat by codegen), and
    a 100 TB stream doesn't fit cache anyway.

    When to use which (measured, 60M tokens / 377k distinct, Zipf):
    the naive full groupBy+HAVING runs 3.0 s, this path ~17 s (pass 1
    9.6 s — 6.7 s of it the bare Arrow boundary — plus the verify
    pass). Below the state wall the naive plan simply wins. The MG
    path is for the 10^9+-distinct regime, where the naive plan's
    per-partition hash state spills and the shuffle carries the FULL
    distinct table; here partial state is a hard k_summary bound, the
    shuffle is k_summary*partitions rows, and the verify shuffle only
    carries certified candidates.

    Output: (col, cnt) — exactly the rows the plain SQL
    `HAVING count(*) * k > n` query produces (the q166 oracle).
    NULL tokens are not counted (neither candidates nor n).
    """
    if k_summary is None:
        k_summary = 2 * k_threshold
    if k_summary < k_threshold:
        raise ValueError(
            "k_summary < k_threshold voids the MG superset guarantee"
        )
    toks = tokens.select(col)
    summ = mg_partial_summaries(toks, col, k_summary).transform(scratch_persist)
    # 0-partition input yields no sentinel rows at all -> sum is NULL
    n = (
        summ.filter(F.col(col).isNull()).agg(F.sum("weight")).first()[0]
        or 0
    )
    cands = summ.filter(F.col(col).isNotNull()).select(col).distinct()
    out = (
        toks.join(F.broadcast(cands), on=col)
        .groupBy(col)
        .agg(F.count(F.lit(1)).alias("cnt"))
        .filter(F.col("cnt") * F.lit(int(k_threshold)) > F.lit(int(n)))
    )
    return out


def mg_merge(summaries: DataFrame, col: str = "token", k_summary: int = 64) -> DataFrame:
    """Merge per-partition (or per-shard) Misra-Gries summaries into
    ONE global summary of at most `k_summary` rows, plus the merged
    sentinel (token NULL, weight = total n).

    MG summaries merge associatively: sum weights per token, then
    apply the same reduction — subtract the (k_summary+1)-th largest
    merged weight, evict the non-positive. The merged error bound is
    the sum of the inputs' bounds (Agarwal et al. 2013), so a token
    with global frequency > 2n/(k_summary+1) is guaranteed present
    with weight >= freq - 2n/(k_summary+1). This is the cross-shard /
    cross-day rollup companion of `cms_merge` and `hist_merge`: daily
    summaries stay tiny, and the season's summary is one merge away
    — no re-scan of the raw streams.

    The merged table is k_summary * shards rows at most — window-rank
    arithmetic on it is trivial at any corpus size.
    """
    cand = summaries.filter(F.col(col).isNotNull())
    merged = cand.groupBy(col).agg(F.sum("weight").alias("weight"))
    cut = (
        merged.orderBy(F.desc("weight"))
        .limit(k_summary + 1)
        .agg(F.when(F.count(F.lit(1)) > k_summary, F.min("weight")).otherwise(F.lit(0)).alias("cut"))
    )
    kept = (
        merged.crossJoin(F.broadcast(cut))
        .select(col, (F.col("weight") - F.col("cut")).alias("weight"))
        .filter(F.col("weight") > 0)
    )
    total = summaries.filter(F.col(col).isNull()).agg(
        F.lit(None).cast("string").alias(col),
        F.coalesce(F.sum("weight"), F.lit(0)).alias("weight"),
    )
    return kept.unionByName(total)
